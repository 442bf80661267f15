"""Shared test utilities: .mats dump parsing and golden comparison."""

from __future__ import annotations

import pathlib

import numpy as np

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


def parse_mats(path) -> dict:
    """Parse a ``.mats`` per-iteration dump into
    {'initial': {'A','L','R','B'}, 'iters': [{'L','R','B'}...], 'final': {...}}.

    Format produced by the reference's debug printing (``mat2d.c:50-59``):
    header lines like 'Initial matrix L', 'Iter=0', 'Matrix L', 'Final:'
    followed by 6-decimal rows. NOTE: the dumped R is the generated
    R_init orientation (k × items), not the transposed storage.
    """
    text = pathlib.Path(path).read_text()
    lines = [ln.rstrip() for ln in text.splitlines()]
    out = {"initial": {}, "iters": [], "final": {}}
    cur_section = None  # dict to write matrices into
    cur_name = None
    cur_rows = []

    def flush():
        nonlocal cur_name, cur_rows
        if cur_name is not None and cur_rows:
            cur_section[cur_name] = np.array(cur_rows, dtype=np.float64)
        cur_name, cur_rows = None, []

    for ln in lines:
        s = ln.strip()
        if not s:
            continue
        if s.startswith("Initial matrix "):
            flush()
            cur_section = out["initial"]
            cur_name = s.split()[-1]
        elif s.startswith("Iter="):
            flush()
            out["iters"].append({})
            cur_section = out["iters"][-1]
        elif s.startswith("Final"):
            flush()
            cur_section = out["final"]
        elif s.startswith("Matrix "):
            flush()
            cur_name = s.split()[-1]
        else:
            cur_rows.append([float(t) for t in s.split()])
    flush()
    return out


def read_golden(name: str) -> str:
    return (FIXTURES / f"{name}.out").read_text()


def assert_mats_close(actual: np.ndarray, dumped: np.ndarray, label: str):
    """Dumps are printed at 6 decimals; allow half-ulp-of-print slack."""
    np.testing.assert_allclose(actual, dumped, atol=5.1e-7, err_msg=label)

"""CLI surface (argument wiring, stdout contract) on the CPU backend."""

import io
import sys

import pytest

from recsys_tpu import cli

from helpers import FIXTURES


def _run_cli(argv, capsys):
    rc = cli.main(argv)
    out = capsys.readouterr().out
    return rc, out


def test_run_stdout_contract(capsys):
    rc, out = _run_cli(["run", str(FIXTURES / "inst0.in"), "--dtype", "float64"], capsys)
    assert rc == 0
    lines = out.splitlines()
    golden = open(FIXTURES / "inst0.out").read().splitlines()
    assert lines[: len(golden)] == golden
    assert lines[len(golden)].startswith("time : ")


def test_run_no_time(capsys):
    rc, out = _run_cli(
        ["run", str(FIXTURES / "inst0.in"), "--dtype", "float64", "--no-time"], capsys
    )
    assert rc == 0
    assert out == open(FIXTURES / "inst0.out").read()


def test_oracle_matches_golden(capsys):
    rc, out = _run_cli(["oracle", str(FIXTURES / "inst0.in"), "--no-time"], capsys)
    assert rc == 0
    assert out == open(FIXTURES / "inst0.out").read()


def test_oracle_dump_mats(tmp_path, capsys):
    dst = tmp_path / "o.mats"
    rc, _ = _run_cli(
        ["oracle", str(FIXTURES / "inst1.in"), "--dump-mats", str(dst), "--record", "0"],
        capsys,
    )
    assert rc == 0
    assert dst.read_text() == open(FIXTURES / "inst1.mats").read()


def test_generate_roundtrip(tmp_path, capsys):
    dst = tmp_path / "g.in"
    rc, _ = _run_cli(["generate", "inst20-30-4-1-5", str(dst), "--iters", "7"], capsys)
    assert rc == 0
    from recsys_tpu.io.parser import load_problem

    spec = load_problem(str(dst))
    assert (spec.users, spec.items, spec.features, spec.iters) == (20, 30, 4, 7)
    # Entries row-major sorted (the format invariant).
    import numpy as np

    assert np.all(np.diff(spec.rows) >= 0)


def test_run_with_checkpoint(tmp_path, capsys):
    ck = tmp_path / "ck.npz"
    rc, out = _run_cli(
        ["run", str(FIXTURES / "inst0.in"), "--dtype", "float64", "--no-time",
         "--checkpoint", str(ck), "--checkpoint-every", "2000"],
        capsys,
    )
    assert rc == 0
    assert out == open(FIXTURES / "inst0.out").read()
    from recsys_tpu.utils.checkpoint import load

    assert load(str(ck)).completed_iters == 5000


def test_bench_emits_json(capsys):
    rc, out = _run_cli(
        ["bench", str(FIXTURES / "inst0.in"), "--dtype", "float64", "--repeats", "1"],
        capsys,
    )
    assert rc == 0
    import json

    row = json.loads(out.splitlines()[-1])
    assert row["instance"] == "inst0.in" and row["updates_per_s"] > 0


def test_verbose_banner_on_stderr(capsys):
    rc = cli.main(["run", str(FIXTURES / "inst0.in"), "--dtype", "float64",
                   "--no-time", "--verbose"])
    captured = capsys.readouterr()
    assert rc == 0
    assert captured.out == open(FIXTURES / "inst0.out").read()  # stdout clean
    assert "dataset: 3x5 k=2 nnz=7" in captured.err

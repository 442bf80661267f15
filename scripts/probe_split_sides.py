#!/usr/bin/env python3
"""Per-side A/B of the 3xf32 split-gather on an f64 BELL instance.

The r3b f64 sweep showed the split's win is k-dependent (join cost
~0.18 ns per gathered element vs a ~4.5 ns/row rate win), but
gen-inst1000-80000 (k=20, the one bench row still below best-published)
defied the fit: both-sides split measured a wash there while same-k
instances gained 7-22%.  Its two sides are extreme opposites — the
u-side gathers from an 80001-row R table, the i-side from a 1001-row L
table — so this probe times all four per-side configs of the REAL
training program (300 iters) to find which side pays and which wins.

Run with JAX_ENABLE_X64=1 on the TPU attachment.

Also times the plain-f32 BELL step (PROBE_DTYPE=float32, split
configs collapse to "off") — chunking may lift f32 rows too if the
per-piece gathers fuse into their reductions.

Usage: [PROBE_DTYPE=float32] python scripts/probe_split_sides.py [instance] [iters] [cfg...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/..")

import numpy as np

from recsys_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

import recsys_tpu.ops.bell as bell
from recsys_tpu.io.parser import load_problem

INSTANCE = sys.argv[1] if len(sys.argv) > 1 else "gen-inst1000-80000-20-10-1000"
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 300
CONFIGS = sys.argv[3:] or ["off", "both", "u", "i"]
DTYPE = np.dtype(os.environ.get("PROBE_DTYPE", "float64"))

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests", "fixtures")
path = os.path.join(FIXTURES, f"{INSTANCE}.in")
if not os.path.exists(path):
    from recsys_tpu.io.generator import materialize_gen_fixture

    materialize_gen_fixture(INSTANCE, FIXTURES)
spec = load_problem(path)
print(
    f"devices: {jax.devices()}  {INSTANCE}: {spec.users}x{spec.items} "
    f"k={spec.features} nnz={spec.nnz}; timing {ITERS} iters",
    flush=True,
)

data = bell.make_bell_inputs(spec, dtype=DTYPE)
meta = data.meta
S_u = data.tables.ucols.shape[0]
S_i = data.tables.irows.shape[0]
print(f"slots: u-side {S_u} (table {spec.items + 1} rows), i-side {S_i} (table {spec.users + 1} rows)", flush=True)

from recsys_tpu.models.mf import init_factors

state = init_factors(spec.users, spec.items, spec.features)
L0, R0 = bell.pad_factors_for_bell(state, data, DTYPE)
tables = jax.tree.map(jnp.asarray, data.tables)
alpha2 = jnp.asarray(2.0 * spec.alpha, dtype=DTYPE)

_orig_delta = bell._delta_side
_orig_gate = bell._use_split_gather


def run_cfg(cfg: str) -> float:
    # bell_gd_step calls _delta_side u-side first, then i-side; the body
    # traces once under fori_loop, so a call counter identifies the side
    # at trace time.
    calls = {"n": 0}

    def gated_delta(F_own, F_other, cols_flat, vals_t, bounds, a2):
        side = "u" if calls["n"] % 2 == 0 else "i"
        calls["n"] += 1
        allow = cfg == "both" or cfg == side
        # Signature must track the real gate's (dtype, k, n_slots=None):
        # _delta_side passes the side's slot count as a third positional.
        bell._use_split_gather = (
            (lambda dt, k, n_slots=None: jnp.dtype(dt) == jnp.float64 and 3 * k <= 128)
            if allow
            else (lambda dt, k, n_slots=None: False)
        )
        try:
            return _orig_delta(F_own, F_other, cols_flat, vals_t, bounds, a2)
        finally:
            bell._use_split_gather = _orig_gate

    bell._delta_side = gated_delta
    try:

        def loop(L, R, tbl):
            def body(_, c):
                return bell.bell_gd_step(c[0], c[1], tbl, alpha2, meta)

            return jax.lax.fori_loop(0, ITERS, body, (L, R))

        fn = jax.jit(loop)
        t0 = time.perf_counter()
        Lp, Rp = fn(jnp.asarray(L0), jnp.asarray(R0), tables)
        chk = float(np.asarray(Lp[:1, :1]))
        first = time.perf_counter() - t0
        walls = []
        for rep in range(2):
            # Perturb an input so the runtime cannot memoize execution.
            Lp2 = jnp.asarray(L0) * (1.0 + 1e-15 * (rep + 1))
            t0 = time.perf_counter()
            La, Ra = fn(Lp2, jnp.asarray(R0), tables)
            np.asarray(La[:1, :1])
            walls.append(time.perf_counter() - t0)
        per = min(walls) / ITERS
        print(
            f"{cfg:5s}: {per * 1e3:.3f} ms/iter  (walls {min(walls):.2f}s, first {first:.1f}s, chk {chk:.6g})",
            flush=True,
        )
        return per
    finally:
        bell._delta_side = _orig_delta


for cfg in CONFIGS:
    run_cfg(cfg)

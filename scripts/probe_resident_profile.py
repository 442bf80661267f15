#!/usr/bin/env python3
"""True per-iteration cost of the ML100k resident kernel, by slope.

The attachment's dispatch overhead (~20-30 ms relay round-trip plus
host<->device transfers) swamps any single short run, so every number
here is a SLOPE: wall(iters=N2) - wall(iters=N1) over (N2 - N1), which
cancels dispatch, transfer, and output-fetch costs exactly (same
program shape, same operands, only the fori_loop trip count differs).

Variants isolate where the per-iteration time goes:
  prec=highest vs default   6-pass vs 1-pass MXU f32 emulation — if the
                            kernel were MXU-bound the ratio would be ~6x
  A=int8 vs f32             A-operand VMEM traffic
  matmul-only               the three dot_generals with the elementwise
                            update stripped (MXU+VMEM floor)
  strips                    grid/strip scheduling sensitivity

Usage: python scripts/probe_resident_profile.py [--n1 300] [--n2 3000]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/..")

import numpy as np

from recsys_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from recsys_tpu.io.parser import load_problem
from recsys_tpu.ops import pallas_dense as pd

ap = argparse.ArgumentParser()
ap.add_argument("--n1", type=int, default=300)
ap.add_argument("--n2", type=int, default=3000)
ap.add_argument("--instance", default="instML100k")
ap.add_argument("--strip", type=int, default=512)
ap.add_argument("--kernel", default="resident", choices=["resident", "stream"])
ap.add_argument("--variants", nargs="*", default=None)
args = ap.parse_args()
N1, N2 = args.n1, args.n2

spec = load_problem(f"tests/fixtures/{args.instance}.in")
Lt, Rt, (U, I, K) = pd.pad_factors_for_pallas(spec, strip=args.strip)
print(f"padded U={U} I={I} K={K}; slope over iters {N1}->{N2}", flush=True)

# A-storage variants materialize LAZILY (memoized): uploading all three
# dense forms through the relay costs ~175 MB of tunnel traffic at ML1M
# shape even when --variants selects one of them.
_A_cache = {}


def _A(dtype):
    if dtype not in _A_cache:
        _A_cache[dtype] = pd.device_dense_AT(spec, U, I, dtype=dtype)
    return _A_cache[dtype]


def A32():
    return _A(jnp.float32)


def A8():
    return _A(jnp.int8 if pd.vals_int8_exact(spec) else jnp.float32)


def Abf16():
    return _A(jnp.bfloat16)


def wall(fn, iters, rep):
    """min wall over 3 calls; each call perturbs Lt to defeat memoization."""
    walls = []
    for r in range(3):
        L0 = jnp.asarray(Lt) * (1.0 + 1e-7 * (r + 17 * rep))
        t0 = time.perf_counter()
        out = fn(L0, iters)
        float(np.asarray(out[0][:1, :1])[0, 0])
        walls.append(time.perf_counter() - t0)
    return min(walls)


def slope(name, fn):
    try:
        fn(jnp.asarray(Lt), N1)  # compile both shapes
        fn(jnp.asarray(Lt), N2)
        w1, w2 = wall(fn, N1, 0), wall(fn, N2, 1)
        per = (w2 - w1) / (N2 - N1)
        print(
            f"{name}: {per * 1e6:.1f} us/iter  "
            f"(walls {w1 * 1e3:.1f} / {w2 * 1e3:.1f} ms; overhead {w1 - per * N1:+.3f}s)",
            flush=True,
        )
        return per
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAILED — {type(e).__name__}: {str(e).splitlines()[0][:200]}", flush=True)
        return None


def train_fn(A_fn, precision, strip=None, top1=False):
    strip = strip or args.strip
    A = A_fn()
    if top1:
        kernel = pd.stream_train_top1 if args.kernel == "stream" else pd.resident_train_top1
        def f(L0, iters):
            return kernel(
                L0, jnp.asarray(Rt), A, iters=iters, alpha2=2.0 * spec.alpha,
                strip=strip, precision=precision, items_true=spec.items,
            )
        return f
    kernel = pd.stream_train if args.kernel == "stream" else pd.resident_train
    def f(L0, iters):
        return kernel(
            L0, jnp.asarray(Rt), A,
            iters=iters, alpha2=2.0 * spec.alpha, strip=strip, precision=precision,
        )
    return f


def matmul_only(precision):
    """Three chained dot_generals per iteration, no elementwise update:
    the MXU+VMEM floor of the resident kernel's per-iteration math
    (transposed-A orientation, matching the round-4 kernels)."""
    prec = jax.lax.Precision.HIGHEST if precision == "highest" else jax.lax.Precision.DEFAULT
    Rtj = jnp.asarray(Rt)
    A = A32()  # (I, U) transposed

    def body(_, carry):
        Ltc, acc = carry
        B = jax.lax.dot_general(Rtj, Ltc, (((0,), (0,)), ((), ())), precision=prec)  # I x U
        E = A - B
        dL = jax.lax.dot_general(Rtj, E, (((1,), (0,)), ((), ())), precision=prec)  # k x U
        dR = jax.lax.dot_general(Ltc, E, (((1,), (1,)), ((), ())), precision=prec)  # k x I
        return Ltc + 1e-20 * dL, acc + dR[:1, :1]

    def f(L0, iters):
        Lf, acc = jax.lax.fori_loop(0, iters, body, (L0, jnp.zeros((1, 1), jnp.float32)))
        return (Lf + acc[0, 0], Lf)

    return jax.jit(f, static_argnums=1)


VARIANTS = {
    "full prec=highest A=f32": lambda: train_fn(A32, "highest"),
    "full prec=highest A=bf16": lambda: train_fn(Abf16, "highest"),
    "full prec=bf16x3 A=int8": lambda: train_fn(A8, "bf16x3"),
    "full prec=bf16x3 A=bf16": lambda: train_fn(Abf16, "bf16x3"),
    "full prec=bf16x3 A=f32": lambda: train_fn(A32, "bf16x3"),
    "full prec=default A=f32": lambda: train_fn(A32, "default"),
    "full prec=highest A=int8": lambda: train_fn(A8, "highest"),
    "full prec=highest strip=x2": lambda: train_fn(A32, "highest", strip=2 * args.strip),
    "full+top1 prec=highest A=int8": lambda: train_fn(A8, "highest", top1=True),
    "matmul-only prec=highest": lambda: matmul_only("highest"),
    "matmul-only prec=default": lambda: matmul_only("default"),
}

names = args.variants or list(VARIANTS)
print(f"devices: {jax.devices()}", flush=True)
for name in names:
    slope(name, VARIANTS[name]())

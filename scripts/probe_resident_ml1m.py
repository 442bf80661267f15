"""Compile-probe: does the resident kernel fit gen-ML1M in VMEM?

HISTORICAL (round 2): written against the pre-K-major kernel signature;
the round-4 resident kernel takes K-major factors and TRANSPOSED A, so
this script no longer runs as-is.  Its committed conclusions (the
RESIDENT_VMEM_BUDGET calibration) stand on the old layout and are
re-validated by the round-4 TPU sweeps.

Chipless AOT compiles only (no device time): Mosaic raises its
scoped-vmem errors at compile, so this maps the feasible (A dtype,
strip, vmem limit) space while the chip is busy elsewhere.
"""
import functools
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
from recsys_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from recsys_tpu.ops import pallas_dense as pd

U, I_TRUE, K = 6040, 3952, 128


def try_compile(a_dtype, strip, limit_mb, iters=3000):
    I = -(-I_TRUE // strip) * strip
    L = jnp.zeros((U, K), jnp.float32)
    R = jnp.zeros((I, K), jnp.float32)
    A = jnp.zeros((U, I), a_dtype)
    old = pd.VMEM_LIMIT_BYTES
    pd.VMEM_LIMIT_BYTES = limit_mb * 1024 * 1024
    try:
        fn = functools.partial(
            pd.resident_train, iters=iters, alpha2=0.001, strip=strip,
            interpret=False, precision="highest",
        )
        jax.jit(fn).lower(L, R, A).compile()
        est = (A.dtype.itemsize * U * I + 4 * (2 * U * K + 2 * I * K + U * strip)) / 1e6
        print(f"OK  a={A.dtype.name} strip={strip} limit={limit_mb}MB (est {est:.0f} MB)", flush=True)
        return True
    except Exception as e:
        msg = str(e)
        for line in msg.split("\n"):
            if "vmem" in line.lower() or "exceeds" in line.lower() or "RESOURCE" in line:
                msg = line.strip()
                break
        print(f"FAIL a={jnp.dtype(a_dtype).name} strip={strip} limit={limit_mb}MB: {msg[:160]}", flush=True)
        return False
    finally:
        pd.VMEM_LIMIT_BYTES = old


for a_dtype in (jnp.bfloat16, jnp.float32):
    for strip in (256, 512):
        for limit in (100, 120, 127):
            if try_compile(a_dtype, strip, limit):
                break  # smallest working limit is enough per (dtype, strip)

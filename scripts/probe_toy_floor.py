"""Break down the ~0.5 s wall on toy instances (inst2, inst30-40).

Round 1 measured 0.04-0.09 s on these shapes; round 2 shows ~0.5 s.
Phases timed separately (all after a warm-up run so compiles are out):
  a) fused one-kernel run()            — what the bench times
  b) resident_train alone (no top-1)
  c) the same with iters=1             — fixed dispatch cost
  d) host prep (init_factors + pads)
Run on the real TPU:  python scripts/probe_toy_floor.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from recsys_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from recsys_tpu.config import RunConfig
from recsys_tpu.engine import trainer
from recsys_tpu.io.parser import load_problem
from recsys_tpu.ops import pallas_dense

FIX = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests", "fixtures")


def t(f, *a, **k):
    t0 = time.perf_counter()
    r = f(*a, **k)
    return time.perf_counter() - t0, r


def probe(name):
    spec = load_problem(os.path.join(FIX, f"{name}.in"))
    cfg = RunConfig(dtype="float32")
    print(f"== {name}: users={spec.users} items={spec.items} k={spec.features} iters={spec.iters}")
    trainer.run(spec, cfg)  # warm
    w, _ = t(trainer.run, spec, cfg)
    print(f"  run() fused        : {w:.4f}s")

    strip = 512 if spec.items * 8 > 4096 else 128
    Lt, Rt, (U, I, K) = pallas_dense.pad_factors_for_pallas(spec, strip=strip)
    A = pallas_dense.device_dense_AT(spec, U, I)
    for iters in (spec.iters, 1):
        def go():
            Lo, Ro = pallas_dense.resident_train(
                jnp.asarray(Lt), jnp.asarray(Rt), A, iters=iters,
                alpha2=2.0 * spec.alpha, strip=strip, precision="highest")
            np.asarray(Lo)
        go()  # warm
        w, _ = t(go)
        print(f"  resident_train it={iters:>6}: {w:.4f}s"
              + (f"  ({w / iters * 1e6:.2f} us/iter marginal base)" if iters > 1 else ""))
    w, _ = t(pallas_dense.pad_factors_for_pallas, spec, strip=strip)
    print(f"  host prep          : {w:.4f}s")


for name in sys.argv[1:] or ("inst2", "inst30-40-10-2-10", "inst500-500-20-2-100"):
    probe(name)

"""Break down trainer.run wall time for inst50000-5000 on TPU."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from recsys_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from recsys_tpu.config import RunConfig
from recsys_tpu.engine import trainer
from recsys_tpu.io.parser import load_problem
from recsys_tpu.models.mf import init_factors
from recsys_tpu.ops.bell import make_bell_inputs, pad_factors_for_bell

spec = load_problem("/root/repo/tests/fixtures/inst50000-5000-100-2-5.in")
cfg = RunConfig(dtype="float32")

def t(name, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{name}: {dt:.3f} s", flush=True)
    return out

# warm-up everything once
t("warm-up full run", lambda: trainer.run(spec, cfg))

t("load_problem", lambda: load_problem("/root/repo/tests/fixtures/inst50000-5000-100-2-5.in"))
t("init_factors", lambda: init_factors(spec.users, spec.items, spec.features))
data = t("make_bell_inputs", lambda: make_bell_inputs(spec, np.float32))
state = init_factors(spec.users, spec.items, spec.features)
t("pad_factors_for_bell", lambda: pad_factors_for_bell(state, data, np.float32))

st = t("factorize (2nd)", lambda: trainer.factorize(spec, cfg))
t("recommend (2nd)", lambda: trainer.recommend(st, spec, cfg))
t("full run (2nd)", lambda: trainer.run(spec, cfg))
t("full run (3rd)", lambda: trainer.run(spec, cfg))

# isolate the jitted training call with device-resident inputs
tables = jax.tree.map(jnp.asarray, data.tables)
L0, R0 = pad_factors_for_bell(state, data, np.float32)
alpha2 = jnp.float32(2.0 * spec.alpha)
Lj, Rj = jnp.asarray(L0), jnp.asarray(R0)
out = trainer._train_bell(Lj, Rj, tables, alpha2, spec.iters, data.meta)
jax.tree.map(np.asarray, out)
Lj, Rj = jnp.asarray(L0 + 1e-6), jnp.asarray(R0)
t0 = time.perf_counter()
out = trainer._train_bell(Lj, Rj, tables, alpha2, spec.iters, data.meta)
jax.tree.map(np.asarray, out)
print(f"_train_bell 3000 iters (warm, device inputs): {time.perf_counter()-t0:.3f} s", flush=True)

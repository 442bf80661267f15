"""Single-chip jitted training engine.

The whole factorization — all ``iters`` GD steps — is one XLA program:
a ``lax.fori_loop`` whose body is the masked-matmul (dense) or
gather/segment-sum (COO) step, jitted with donated factor buffers. This
replaces the reference's serial driver (``matFact.c:29-59``) and both
OpenMP drivers at once: intra-chip parallelism is XLA's job.

Path selection mirrors the spirit of the reference's reduce-side
heuristic (``matFact-omp.c:44``): pick the formulation by problem
shape — dense masked matmuls while A and M fit comfortably in HBM,
COO segment-sums beyond that.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from recsys_tpu.config import ProblemSpec, RunConfig
from recsys_tpu.models.mf import MFState, init_factors
from recsys_tpu.ops.coo import CooData, coo_gd_step, make_coo_inputs
from recsys_tpu.ops.dense import dense_gd_step, make_dense_inputs
from recsys_tpu.ops.topk import make_mask_blocks, pad_items, top1_blocked

# Dense A + M byte budget before switching to the COO formulation.
DENSE_BUDGET_BYTES = 2 << 30


def choose_path(spec: ProblemSpec, cfg: RunConfig) -> str:
    if cfg.path != "auto":
        return cfg.path
    itemsize = jnp.dtype(cfg.dtype).itemsize
    return "dense" if 2 * spec.users * spec.items * itemsize <= DENSE_BUDGET_BYTES else "coo"


@partial(jax.jit, static_argnames=("iters",), donate_argnums=(0, 1))
def _train_dense(L, R, A, M, alpha2, iters):
    def body(_, c):
        return dense_gd_step(c[0], c[1], A, M, alpha2)

    return jax.lax.fori_loop(0, iters, body, (L, R))


@partial(jax.jit, static_argnames=("iters", "users", "items"), donate_argnums=(0, 1))
def _train_coo(L, R, data: CooData, alpha2, iters, users, items):
    def body(_, c):
        return coo_gd_step(c[0], c[1], data, alpha2, users, items)

    return jax.lax.fori_loop(0, iters, body, (L, R))


@partial(jax.jit, static_argnames=("block_items",))
def _top1(L, R_padded, mask_blocks, block_items):
    return top1_blocked(L, R_padded, mask_blocks, block_items)


def _as_dtype(name: str):
    dt = jnp.dtype(name)
    if dt == jnp.float64 and not getattr(jax.config, "jax_enable_x64", False):
        raise ValueError(
            "dtype float64 requires x64 mode; set JAX_ENABLE_X64=1 (conformance "
            "mode runs on CPU — TPU has no native f64)"
        )
    return dt


def factorize(spec: ProblemSpec, cfg: RunConfig = RunConfig(), state: MFState | None = None) -> MFState:
    """Run the full GD loop on the default device; returns host factors."""
    dt = _as_dtype(cfg.dtype)
    if state is None:
        state = init_factors(spec.users, spec.items, spec.features)
    L0 = jnp.asarray(state.L, dtype=dt)
    R0 = jnp.asarray(state.R, dtype=dt)
    alpha2 = jnp.asarray(2.0 * spec.alpha, dtype=dt)

    path = choose_path(spec, cfg)
    if path == "dense":
        A, M = make_dense_inputs(spec, dtype=dt)
        L, R = _train_dense(L0, R0, jnp.asarray(A), jnp.asarray(M), alpha2, spec.iters)
    elif path == "coo":
        data = jax.tree.map(jnp.asarray, make_coo_inputs(spec, dtype=dt))
        L, R = _train_coo(L0, R0, data, alpha2, spec.iters, spec.users, spec.items)
    else:
        raise ValueError(f"unknown path {path!r}")
    return MFState(L=L, R=R)


def recommend(state: MFState, spec: ProblemSpec, cfg: RunConfig = RunConfig()) -> np.ndarray:
    """Top-1 unrated item per user (int32[users]), computed blockwise."""
    block = min(cfg.block_items, -(-spec.items // 128) * 128)
    block = max(block, 128)
    mask_blocks = make_mask_blocks(spec, block)
    R_pad = pad_items(np.asarray(state.R), spec.items, block)
    top1 = _top1(jnp.asarray(state.L), jnp.asarray(R_pad), jnp.asarray(mask_blocks), block)
    return np.asarray(top1)


def run(spec: ProblemSpec, cfg: RunConfig = RunConfig()) -> tuple[str, "np.ndarray"]:
    """Factorize + recommend; returns (stdout payload, top1 indices)."""
    from recsys_tpu.io.writers import format_recommendations

    state = factorize(spec, cfg)
    top1 = recommend(state, spec, cfg)
    return format_recommendations(top1, spec.rated_counts(), spec.items), top1

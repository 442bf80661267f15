"""Dense masked-matmul GD step — the MXU path.

The reference's hot loop (``matFact.c:41-53``) is a scalar gather /
rank-1-update / scatter over COO entries; every one of its parallel
backends (OMP atomics ``matFact-omp.c:85-107``, per-thread partials
``matFact-omp.c:60-122``, MPI delta-allreduce ``matFact-mpi.c:155-214``)
is machinery to parallelize that scalar loop safely. On TPU the same
full-batch update is expressed directly as three matmuls::

    E  = M ⊙ (A − L Rᵀ)          # (users × items), masked error
    L' = L + 2α · E R
    R' = R + 2α · Eᵀ L

which XLA tiles onto the MXU with no atomics, no reduction trees, and
no data-dependent control flow. This is the fastest path whenever the
dense A/M fit in HBM (covers every published instance except the
1000×1M and 1e6-user extremes, which use the COO path).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from recsys_tpu.config import ProblemSpec


def make_dense_inputs(spec: ProblemSpec, dtype=jnp.float32):
    """Host-side dense A (ratings, 0 elsewhere) and mask M in ``dtype``."""
    from recsys_tpu.utils.hostmem import hugepage_zeros

    dtype = jnp.dtype(dtype)
    a = hugepage_zeros((spec.users, spec.items), dtype)
    a[spec.rows, spec.cols] = spec.vals
    m = hugepage_zeros((spec.users, spec.items), dtype)
    m[spec.rows, spec.cols] = 1.0
    return a, m


def dense_gd_step(L, R, A, M, alpha2):
    """One GD step; ``alpha2 = 2 * alpha`` folded on host.

    Note R' reads the *old* L (the reference snapshots both factors
    before the entry loop, ``matFact.c:38-39``).
    """
    E = M * (A - L @ R.T)
    L_new = L + alpha2 * (E @ R)
    R_new = R + alpha2 * (E.T @ L)
    return L_new, R_new


def dense_gd_step_weighted(L, R, A, M, alpha2, w_l, w_r):
    """Sharded variant: per-shard base-weighting of the carried factors.

    Under the checkerboard mesh each L block is replicated along the
    items axis and each R block along the users axis; the per-iteration
    psum must count the base factor exactly once — the reference zeroes
    the aux matrix on non-root ranks for the same reason
    (``matFact-mpi.c:187-188``). ``w_l``/``w_r`` are 1.0 on the axis
    root shard and 0.0 elsewhere; the caller psums the result.
    """
    E = M * (A - L @ R.T)
    dL = w_l * L + alpha2 * (E @ R)
    dR = w_r * R + alpha2 * (E.T @ L)
    return dL, dR

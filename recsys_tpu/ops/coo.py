"""COO gather + sorted-segment-sum GD step — the sparse/huge path.

For instances whose dense A would not fit in HBM (the reference ran
1000×1,000,000 and 1,000,000×100 on its cluster), the update works on
the COO entries directly, like the reference's hot loop — but instead
of scalar scatter-adds guarded by atomics (``matFact-omp.c:97-107``) or
per-thread partial matrices (``matFact-omp.c:60-122``), it uses sorted
``segment_sum``s, which lower to efficient vectorized reductions on TPU.

Ownership-ordering insight carried over from the reference: its OMP
backend re-sorts entries column-major when reducing L so conflicting
updates are adjacent (``matFact-omp.c:44-48``). Here *both* sides get
sorted ownership for free: entries arrive row-sorted (format invariant)
for the L segment-sum, and a host-precomputed permutation re-sorts the
per-entry R gradients column-major for the R segment-sum, so both calls
run with ``indices_are_sorted=True``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from recsys_tpu.config import ProblemSpec


class CooData(NamedTuple):
    """Device-resident COO training data (all equal-length nnz arrays)."""

    rows: jnp.ndarray  # int32[nnz], non-decreasing
    cols: jnp.ndarray  # int32[nnz]
    vals: jnp.ndarray  # dtype[nnz]
    perm: jnp.ndarray  # int32[nnz], argsort by (col, row)
    cols_sorted: jnp.ndarray  # int32[nnz] == cols[perm], non-decreasing


def make_coo_inputs(spec: ProblemSpec, dtype=jnp.float32) -> CooData:
    perm = np.lexsort((spec.rows, spec.cols)).astype(np.int32)
    return CooData(
        rows=spec.rows.astype(np.int32),
        cols=spec.cols.astype(np.int32),
        vals=spec.vals.astype(dtype),
        perm=perm,
        cols_sorted=spec.cols[perm].astype(np.int32),
    )


def coo_gd_step(L, R, data: CooData, alpha2, users: int, items: int):
    """One full-batch GD step from COO entries.

    err_n = 2α (a_n − ⟨L[i_n], R[j_n]⟩);  ΔL = Σ_n err_n · R[j_n] into row i_n;
    ΔR likewise. Gradients read the pre-step factors (stable snapshot
    semantics, ``matFact.c:38-39``).
    """
    l = L[data.rows]  # (nnz, k) gather
    r = R[data.cols]
    err = alpha2 * (data.vals - jnp.sum(l * r, axis=-1))
    dL = jax.ops.segment_sum(
        err[:, None] * r, data.rows, num_segments=users, indices_are_sorted=True
    )
    g_r = (err[:, None] * l)[data.perm]
    dR = jax.ops.segment_sum(
        g_r, data.cols_sorted, num_segments=items, indices_are_sorted=True
    )
    return L + dL, R + dR

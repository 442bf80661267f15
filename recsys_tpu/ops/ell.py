"""Dual-ELL (padded row/column sparse) GD step — the fast sparse path.

The COO formulation's cost on TPU is dominated by its irregular pieces:
the raw row gathers and, above all, the ``segment_sum`` onto the large
factor table (measured ~7x the cost of everything else combined on
inst50000-5000). The reference hit the same wall as write contention and
solved it with per-thread replicas and ownership sorting
(``matFact-omp.c:42-124``); the TPU-native solution is to make the
reduction *dense*: pad every user's entry list to the maximum
entries-per-row P (classic ELLPACK) and, symmetrically, every item's
entry list to the maximum entries-per-column Q. Then

    Rg[u,p,:]  = R[cols[u,p]]                         (gather)
    err[u,p]   = valid[u,p] * 2α(vals[u,p] − ⟨L[u], Rg[u,p]⟩)
    ΔL[u,:]    = Σ_p err[u,p] · Rg[u,p,:]             (einsum, no scatter)
    errT[i,q]  = err.flat[slot[i,q]]                  (scalar gather via
                                                       host-built index)
    ΔR[i,:]    = Σ_q errT[i,q] · L[rowsT[i,q]]        (einsum, no scatter)

Every op is a dense gather or contraction the TPU vectorizes; padding
slots carry ``valid = 0`` and point at row/item 0, contributing exactly
zero. The format costs (P/mean_row + Q/mean_col) in redundant work, so
the engine only picks it when those ratios are modest (true for every
uniform-degree instance, including the 1-3-entries-per-row million-item
extremes); power-law instances fall back to COO/dense.

Reference semantics preserved: gradients read pre-step factors
(``matFact.c:38-39``); full-batch additive accumulation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from recsys_tpu.config import ProblemSpec


class EllData(NamedTuple):
    """Device-resident dual-ELL training data."""

    cols: jnp.ndarray  # int32[users, P]   item index per slot (0 pad)
    vals: jnp.ndarray  # dtype[users, P]   rating (0 pad)
    valid: jnp.ndarray  # dtype[users, P]  1.0 real / 0.0 pad
    rowsT: jnp.ndarray  # int32[items, Q]  user index per slot (0 pad)
    slotT: jnp.ndarray  # int32[items, Q]  flat index into (users*P) err
    validT: jnp.ndarray  # dtype[items, Q]


def ell_ratios(spec: ProblemSpec) -> tuple[float, float]:
    """(row, col) padding ratios P/mean and Q/mean; inf when a side is empty."""
    rc = np.bincount(spec.rows, minlength=spec.users)
    cc = np.bincount(spec.cols, minlength=spec.items)
    if spec.nnz == 0:
        return float("inf"), float("inf")
    row_ratio = rc.max() * spec.users / spec.nnz
    col_ratio = cc.max() * spec.items / spec.nnz
    return float(row_ratio), float(col_ratio)


def ell_slots(spec: ProblemSpec) -> int:
    """Total padded slot count users*P + items*Q (the per-k work unit)."""
    rc_max = int(np.bincount(spec.rows, minlength=spec.users).max()) if spec.nnz else 0
    cc_max = int(np.bincount(spec.cols, minlength=spec.items).max()) if spec.nnz else 0
    return spec.users * max(rc_max, 1) + spec.items * max(cc_max, 1)


def ell_fits(spec: ProblemSpec, max_overhead: float = 8.0, budget_bytes: int = 4 << 30) -> bool:
    """Is dual-ELL a good format for this instance?

    Requires bounded total padding (``slots <= max_overhead * nnz`` —
    power-law degree distributions and hyper-sparse huge-dimension
    instances fail this and stay on COO) and the gathered (n, slot, k)
    working set within the memory budget.
    """
    if spec.nnz == 0:
        return False
    slots = ell_slots(spec)
    mem = 4 * slots * (spec.features + 3)
    return slots <= max_overhead * spec.nnz and mem <= budget_bytes


def make_ell_inputs(spec: ProblemSpec, dtype=np.float32) -> EllData:
    """Host-side construction of the dual-ELL tables."""
    from recsys_tpu.ops.coo import require_row_major

    require_row_major(spec)  # slot_in_row below assumes sorted entries
    rc = np.bincount(spec.rows, minlength=spec.users)
    cc = np.bincount(spec.cols, minlength=spec.items)
    P = max(int(rc.max()), 1)
    Q = max(int(cc.max()), 1)

    # Row table: entries arrive row-major sorted, so each row's entries
    # are contiguous; slot index = position within the row.
    row_start = np.zeros(spec.users + 1, dtype=np.int64)
    np.cumsum(rc, out=row_start[1:])
    slot_in_row = np.arange(spec.nnz, dtype=np.int64) - row_start[spec.rows]

    cols = np.zeros((spec.users, P), dtype=np.int32)
    vals = np.zeros((spec.users, P), dtype=dtype)
    valid = np.zeros((spec.users, P), dtype=dtype)
    cols[spec.rows, slot_in_row] = spec.cols
    vals[spec.rows, slot_in_row] = spec.vals.astype(dtype)
    valid[spec.rows, slot_in_row] = 1.0

    # Column table: order entries col-major, slot = position within col.
    perm = np.lexsort((spec.rows, spec.cols))
    cols_s = spec.cols[perm]
    rows_s = spec.rows[perm]
    col_start = np.zeros(spec.items + 1, dtype=np.int64)
    np.cumsum(cc, out=col_start[1:])
    slot_in_col = np.arange(spec.nnz, dtype=np.int64) - col_start[cols_s]

    rowsT = np.zeros((spec.items, Q), dtype=np.int32)
    slotT = np.zeros((spec.items, Q), dtype=np.int32)
    validT = np.zeros((spec.items, Q), dtype=dtype)
    rowsT[cols_s, slot_in_col] = rows_s
    # err is computed in the row-ELL layout; this maps each (item, slot)
    # back to its flat (user * P + row_slot) position there.
    slotT[cols_s, slot_in_col] = (rows_s * P + slot_in_row[perm]).astype(np.int32)
    validT[cols_s, slot_in_col] = 1.0

    return EllData(cols=cols, vals=vals, valid=valid, rowsT=rowsT, slotT=slotT, validT=validT)


def ell_gd_step(L, R, data: EllData, alpha2):
    """One full-batch GD step in dual-ELL form."""
    Rg = R[data.cols]  # (users, P, k)
    pred = jnp.einsum("uk,upk->up", L, Rg)
    err = data.valid * (alpha2 * (data.vals - pred))
    dL = jnp.einsum("up,upk->uk", err, Rg)

    errT = err.reshape(-1)[data.slotT] * data.validT  # (items, Q)
    Lg = L[data.rowsT]  # (items, Q, k)
    dR = jnp.einsum("iq,iqk->ik", errT, Lg)
    return L + dL, R + dR

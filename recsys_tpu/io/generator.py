"""Instance generator — fixture tooling.

The reference ships 13 ``.in`` instances named
``inst<users>-<items>-<k>-<min_nz_per_row>-<max_nz_per_row>`` but five
large ones were dropped from the snapshot (``.MISSING_LARGE_BLOBS``).
This regenerates instances matching the naming convention so the
missing scales can be exercised and benchmarked. Values are MovieLens-
style ratings in {1..5}; entries are emitted row-major sorted, matching
the format invariant. Generation uses numpy's PRNG (the glibc contract
only governs factor init, not instance data).
"""

from __future__ import annotations

import numpy as np

from recsys_tpu.config import ProblemSpec


def generate_instance(
    users: int,
    items: int,
    features: int,
    min_nz_row: int,
    max_nz_row: int,
    iters: int = 100,
    alpha: float = 0.0001,
    seed: int = 42,
) -> ProblemSpec:
    rng = np.random.default_rng(seed)
    counts = rng.integers(min_nz_row, max_nz_row + 1, size=users)
    counts = np.minimum(counts, items)
    nnz = int(counts.sum())
    rows = np.repeat(np.arange(users, dtype=np.int64), counts)
    cols = np.empty(nnz, dtype=np.int64)
    off = 0
    for u in range(users):
        c = int(counts[u])
        if c > items // 2:
            cols[off : off + c] = np.sort(rng.choice(items, size=c, replace=False))
        else:
            # rejection sampling is far faster than choice for sparse rows
            picked = np.unique(rng.integers(0, items, size=2 * c + 8))
            while picked.size < c:
                picked = np.unique(
                    np.concatenate([picked, rng.integers(0, items, size=2 * c)])
                )
            cols[off : off + c] = np.sort(rng.permutation(picked)[:c])
        off += c
    vals = rng.integers(1, 6, size=nnz).astype(np.float64)
    return ProblemSpec(
        iters=iters,
        alpha=alpha,
        features=features,
        users=users,
        items=items,
        rows=rows.astype(np.int32),
        cols=cols.astype(np.int32),
        vals=vals,
    )


def parse_instance_name(name: str):
    """'inst<u>-<i>-<k>-<min>-<max>' -> dims tuple (ValueError otherwise)."""
    if not name.startswith("inst"):
        raise ValueError(name)
    parts = name[4:].split("-")
    if len(parts) != 5:
        raise ValueError(name)

    def num(tok: str) -> int:
        return int(float(tok))  # handles '1e6'

    return tuple(num(p) for p in parts)

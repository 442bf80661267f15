"""2-D device mesh construction with the balanced-grid heuristic.

The reference builds an r×c MPI cartesian grid shaped to the matrix
aspect ratio so per-rank L and R block footprints (and hence the two
per-iteration allreduce volumes) are balanced (``create_balanced_grid``,
``mpiutil.c:54-88``; worked example in report-mpi.pdf §4.1). Same goal
here, expressed directly as the objective: over all factor pairs
(pu, pi) of the device count, minimize the per-shard communication
footprint ``users/pu + items/pi``, which also degrades gracefully to a
1-D mesh for extreme aspect ratios (e.g. 1000×1M ⇒ nearly pure item
sharding, the analogue the reference reaches by prime-factor shuffling).

Axes are named 'u' (users) and 'i' (items); collectives address them by
name — the analogue of the reference's row/col communicators
(``mpiutil.c:97-103``).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

AXIS_USERS = "u"
AXIS_ITEMS = "i"


def balanced_grid(n_devices: int, users: int, items: int) -> tuple[int, int]:
    """Pick (pu, pi), pu*pi == n_devices, minimizing users/pu + items/pi."""
    best = None
    for pu in range(1, n_devices + 1):
        if n_devices % pu:
            continue
        pi = n_devices // pu
        cost = users / pu + items / pi
        if best is None or cost < best[0]:
            best = (cost, pu, pi)
    return best[1], best[2]


def make_mesh(users: int, items: int, shape: tuple[int, int] | None = None, devices=None) -> Mesh:
    """Build the ('u', 'i') mesh over the available (or given) devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = balanced_grid(n, users, items)
    pu, pi = shape
    if pu * pi != n:
        raise ValueError(f"mesh {shape} does not match device count {n}")
    arr = np.asarray(devices).reshape(pu, pi)
    return Mesh(arr, (AXIS_USERS, AXIS_ITEMS))

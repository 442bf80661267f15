"""Wall-clock timing (the reference's ``benchmark.h`` analogue).

The reference wraps main in CLOCK_MONOTONIC macros and prints
``msg : seconds`` (``benchmark.h:7-23``). Here a context-manager timer
with explicit device synchronization — on an async dispatch runtime a
timer without ``block_until_ready`` measures nothing.
"""

from __future__ import annotations

import time


class Timer:
    def __init__(self):
        self.seconds = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.seconds = time.perf_counter() - self._t0
        return False

    def line(self, msg: str = "time") -> str:
        """Reference-style 'time : <seconds>' line (benchmark.h:14-23)."""
        return f"{msg} : {self.seconds:.6f}"


def sync(*arrays):
    """Block until device work producing ``arrays`` is done."""
    for a in arrays:
        if hasattr(a, "block_until_ready"):
            a.block_until_ready()
    return arrays


# ---------------------------------------------------------------------
# Phase timing: per-stage walls (prep / upload / train / top1) for the
# bench's steady-state columns.  The reference times only the whole
# main (benchmark.h) — but its per-iteration cost IS its wall/iters
# because nothing else happens; here upload/compile/top-1 are one-shot
# costs that can dominate a 10-iteration extreme-shape wall, so the
# roofline needs the train phase isolated (VERDICT r3 weak #4).
#
# Collection is opt-in (the sweep runs ONE instrumented pass after its
# clean timed repeats): when no collector is active, ``phase`` yields a
# no-op sync and adds zero overhead to the hot path.  Inside a
# collector, the yielded callable forces completion of the device work
# producing its argument by a ONE-ELEMENT device->host transfer —
# ``block_until_ready`` does not reliably block through the remote TPU
# attachment (CLAUDE.md), a tiny transfer does.
# ---------------------------------------------------------------------

import contextlib

_COLLECTOR: dict | None = None


def _noop_sync(x=None):
    return x


def force_sync(x=None):
    """Force completion of the device computation producing ``x`` (any
    pytree) with ONE blocking device->host round trip: per-leaf
    one-element slices dispatch eagerly (async), a combined scalar sum
    is fetched once.  Per-leaf np.asarray would pay one relay RTT
    (~30 ms through the remote attachment) per leaf."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    leaves = [
        l
        for l in jax.tree.leaves(x)
        if hasattr(l, "block_until_ready") and getattr(l, "size", 1)
    ]
    if not leaves:
        return x
    acc = None
    for l in leaves:
        v = (l.reshape(-1)[0] if getattr(l, "shape", ()) else l).astype(jnp.float32)
        acc = v if acc is None else acc + v
    np.asarray(acc)
    return x


def sync_floor_seconds(samples: int = 5) -> float:
    """Measured cost of one force_sync round trip on already-complete
    data — the fixed overhead every phase's closing sync pays (relay
    RTT + tiny-program dispatch).  Subtract from phase walls to
    de-bias short phases."""
    import jax.numpy as jnp

    x = jnp.zeros((8,), jnp.float32) + 1.0
    force_sync(x)  # compile the slice/convert programs once
    best = float("inf")
    for _ in range(samples):
        t0 = time.perf_counter()
        force_sync(x)
        best = min(best, time.perf_counter() - t0)
    return best


@contextlib.contextmanager
def collect_phases(out: dict):
    """Collect named phase walls into ``out`` for the duration."""
    global _COLLECTOR
    prev = _COLLECTOR
    _COLLECTOR = out
    try:
        yield out
    finally:
        _COLLECTOR = prev


@contextlib.contextmanager
def phase(name: str):
    """Time one named stage.  Yields a sync callable the caller applies
    to the stage's result (no-op when collection is off).  Phases whose
    sync actually blocked on device data are recorded in the
    collector's ``_synced`` set, so consumers can subtract the per-sync
    round-trip floor from exactly those."""
    if _COLLECTOR is None:
        yield _noop_sync
        return
    collector = _COLLECTOR

    def psync(x=None):
        import jax

        if any(hasattr(l, "block_until_ready") for l in jax.tree.leaves(x)):
            collector.setdefault("_synced", set()).add(name)
            counts = collector.setdefault("_sync_counts", {})
            counts[name] = counts.get(name, 0) + 1
        return force_sync(x)

    t0 = time.perf_counter()
    try:
        yield psync
    finally:
        collector[name] = collector.get(name, 0.0) + time.perf_counter() - t0

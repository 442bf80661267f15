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

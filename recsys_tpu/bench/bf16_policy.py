"""Runtime acceptance policy for the single-pass bfloat16 speed mode.

The reference's only speed/accuracy knob is a compile-time flag that is
documented next to its definition (``matFact-omp.c:11-14``); this module is
the analogue for our one lossy mode.  bfloat16 is a speed tier whose claim
is argmax agreement with the exact-f64 golden; the bench enforces a 98%
floor when *rendering* rows (``bench/sweep.py::BF16_MIN_AGREEMENT``), but
``run``/``bench`` in the CLI must not silently emit sub-floor
recommendations either (round-4 review, weak #4).

``MEASURED`` pins the bench's committed per-instance agreements
(``bench_results.jsonl`` / BENCHMARKS.md, round 4) keyed by problem *shape
signature* so the generated and original fixture variants of one instance
share a verdict.  Unknown shapes get the generic warning: bf16 agreement is
instance-dependent and must be validated before its output is trusted.

In every case the superseding recommendation is the f32x3 tier
(``--dtype float32 --precision bf16x3``): byte-exact on every bench row and
faster than single-pass bf16 end-to-end on all quoted instances.
"""

from __future__ import annotations

import sys

from recsys_tpu.bench.sweep import BF16_MIN_AGREEMENT as FLOOR  # one floor, everywhere

# (users, items, features, iters) -> measured argmax agreement vs exact f64.
# Source: bench_results.jsonl round-4 sweep rows (rendered in BENCHMARKS.md).
MEASURED = {
    (500, 500, 20, 10000): 0.736,
    (1000, 1000, 100, 1000): 0.989,
    (200, 10000, 50, 1000): 0.990,
    (600, 10000, 10, 5000): 0.830,
    (943, 1682, 30, 3000): 0.9883,   # instML100k
    (6040, 3952, 30, 3000): 0.9669,  # (gen-)instML1M shape
}


def lookup(spec) -> float | None:
    """Measured bf16 agreement for this problem shape, or None if unbenched."""
    return MEASURED.get((spec.users, spec.items, spec.features, spec.iters))


def check(spec, strict: bool = False, file=None) -> bool:
    """Warn (stderr) about bf16 accuracy for ``spec``; False if refused.

    Returns True when the run may proceed.  With ``strict``, refuses any
    shape whose measured agreement is below ``FLOOR`` or that has no
    measured agreement at all.
    """
    file = sys.stderr if file is None else file
    agree = lookup(spec)
    hint = "use --dtype float32 --precision bf16x3 (byte-exact and faster on every bench row)"
    if agree is None:
        print(
            "warning: bfloat16 is a lossy speed mode with no measured argmax "
            f"agreement for this problem shape (floor: {FLOOR:.0%}); "
            "validate against --dtype float64 before trusting the output, or "
            + hint,
            file=file,
        )
        return not strict
    if agree < FLOOR:
        print(
            f"warning: bfloat16 measured only {agree:.2%} argmax agreement with "
            f"the exact-f64 output on this problem shape (acceptance floor: "
            f"{FLOOR:.0%}, see BENCHMARKS.md); " + hint,
            file=file,
        )
        return not strict
    print(
        f"note: bfloat16 speed mode — measured {agree:.2%} argmax agreement "
        f"with exact f64 on this problem shape (floor: {FLOOR:.0%})",
        file=file,
    )
    return True

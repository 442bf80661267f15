#!/usr/bin/env python3
"""Derive the gather-roofline ceilings from measured bench rows.

Round 4 established that the XLA row-gather "engine rate" is NOT a
hardware invariant: synthetic probes (probe_gather_rate.py,
probe_gather_tablesize.py) plateau at ~210-236 M f32 rows/s for
uniform-index gathers regardless of row width (k8 == k32 == k128),
index order, duplication, or table size (and DEGRADE to 21-74 M rows/s
for >=33 MB tables with random indices) — yet production BELL programs
sustain far more (gen-inst20000-10000 f32 trained at an implied
~450 M rows/s): XLA fuses the per-bucket gather into its consuming
reductions and the fused pipeline beats any standalone gather.

A "% of roofline" column therefore needs an explicit convention.  Ours:
the ceiling is the FASTEST SUSTAINED PRODUCTION OBSERVATION per dtype
(f64-split rows count as f32: they gather f32 rows).  This script
recomputes every BELL row's implied row rate from its steady-state
train wall and prints the per-dtype maxima that
bench/roofline.py::GATHER_ROWS_PER_S must dominate — rerun it after a
sweep and bump the constants if a new row beats the ceiling.

Usage: python scripts/calibrate_gather_ceiling.py [bench_results.jsonl]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/..")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURES = os.path.join(REPO, "tests", "fixtures")


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from recsys_tpu.io.parser import load_problem
    from recsys_tpu.ops.bell import _use_split_gather, bell_side_slots

    path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "bench_results.jsonl")
    rows = [json.loads(l) for l in open(path) if l.strip()]
    latest = {}
    for r in rows:
        latest[(r["instance"], r["dtype"])] = r

    specs = {}
    best = {}
    print(f"{'instance':30s} {'dtype':8s} {'train_s':>9s} {'rows/iter':>10s} {'M rows/s':>9s}  rate-dtype")
    for (name, dtype), r in sorted(latest.items()):
        if r.get("path") != "bell" or r.get("backend") == "cpu":
            continue
        from recsys_tpu.bench.sweep import effective_train_s
        wall = effective_train_s(r)
        if name not in specs:
            from recsys_tpu.io.generator import ensure_fixture

            fp = ensure_fixture(name, FIXTURES)
            specs[name] = load_problem(fp) if os.path.exists(fp) else None
        spec = specs[name]
        if spec is None:
            continue
        su, si = bell_side_slots(spec)
        k = spec.features
        # The side-level rate dtype: f64 sides that split gather f32 rows.
        def rate_dtype(side_slots):
            if dtype == "float64" and _use_split_gather("float64", k, side_slots):
                return "float32"
            return dtype if dtype in ("float32", "float64", "bfloat16") else "float32"

        du, di = rate_dtype(su), rate_dtype(si)
        rows_per_iter = su + si
        rate = rows_per_iter * spec.iters / wall
        # Attribute the whole wall to a single-dtype stream when the
        # sides agree (the common case); mixed-dtype rows are skipped
        # for calibration (their per-side attribution is ambiguous).
        if du == di:
            best[du] = max(best.get(du, 0.0), rate)
            tag = du
        else:
            tag = f"mixed({du}/{di})"
        print(f"{name:30s} {dtype:8s} {wall:9.3f} {rows_per_iter:10d} {rate / 1e6:9.0f}  {tag}")
    print("\nper-dtype max sustained (the ceiling GATHER_ROWS_PER_S must dominate):")
    for dt, v in sorted(best.items()):
        print(f"  {dt}: {v / 1e6:.0f} M rows/s")

    # --- F64 VPU elementwise ceiling (round 5) ---------------------------
    # The f64 BELL floor is gather + software-f64 VPU math per side
    # (roofline.py::bell_side_seconds, additive when the side is chunked,
    # max() when fused).  For each committed f64 row, find the VPU rate
    # that would put the row exactly AT its floor; F64_VPU_OPS_PER_S must
    # dominate the max (same best-sustained-production convention).
    from recsys_tpu.bench import roofline
    from recsys_tpu.config import RunConfig

    print("\nf64 rows: implied VPU rate (model == measured at this rate):")
    need = 0.0
    for (name, dtype), r in sorted(latest.items()):
        if dtype != "float64" or r.get("path") != "bell" or r.get("backend") == "cpu":
            continue
        spec = specs.get(name)
        wall = effective_train_s(r) if (r.get("train_s") or r.get("train_marginal_s")) else None
        if spec is None or not wall:
            continue
        saved = roofline.F64_VPU_OPS_PER_S
        lo, hi = 1e9, 1e13
        try:
            for _ in range(60):
                mid = (lo * hi) ** 0.5
                roofline.F64_VPU_OPS_PER_S = mid
                _, per_iter = roofline.train_cost_model(spec, RunConfig(dtype=dtype), "bell")
                if per_iter * spec.iters > wall:
                    lo = mid  # model still above the measurement: raise the rate
                else:
                    hi = mid
        finally:
            roofline.F64_VPU_OPS_PER_S = saved
        implied = (lo * hi) ** 0.5
        binding = implied < 1e12  # gather-bound rows imply "any rate" (capped)
        if binding:
            need = max(need, implied)
        print(f"  {name:30s} {implied / 1e9:8.1f} G op/s" + ("" if binding else "  (gather-bound)"))
    print(f"\nmax implied (F64_VPU_OPS_PER_S must dominate): {need / 1e9:.1f} G op/s "
          f"(current constant {roofline.F64_VPU_OPS_PER_S / 1e9:.0f})")


if __name__ == "__main__":
    main()

"""Benchmark sweep over the golden instances.

Successor of the reference's ``run-samples.sh`` (builds serial + both
OMP flavors, runs every ``samples/*.in`` at 1..16 threads and greps the
``time :`` line). Here one chip replaces the thread sweep; each instance
runs in the fastest conformant mode (auto-picked path) and optionally in
exact-f64 mode, and the result is compared against the reference's
published numbers (report-omp.pdf Table 2 / report-mpi.pdf Tables 1-3 —
transcribed in SURVEY.md §6).

One process sweeps ONE dtype (x64 mode is a process-global switch that
changes every compiled program, so f64 runs live in their own process);
rows accumulate in a JSONL file and --render merges them into the
markdown table.

Usage:
    python -m recsys_tpu.bench.sweep --dtype float32 --jsonl results.jsonl
        [--instances inst0,instML100k,...] [--repeats N]
    python -m recsys_tpu.bench.sweep --render results.jsonl --out BENCHMARKS.md
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# Published reference timings, seconds (SURVEY.md §6; report-omp.pdf
# Table 2 serial / best over all published parallel configs incl. MPI
# and hybrid). None = not published.
REFERENCE_S = {
    "inst0": (0.001, 0.001),
    "inst1": (0.063, 0.063),
    "inst2": (0.060, 0.060),
    "inst30-40-10-2-10": (0.421, 0.224),
    "inst1000-1000-100-2-30": (18.123, 2.922),
    "inst200-10000-50-100-300": (24.711, 3.043),
    "inst400-50000-30-200-500": (35.813, 3.38),
    "inst50000-5000-100-2-5": (156.984, 25.208),
    "inst500-500-20-2-100": (57.798, 6.46),
    "inst600-10000-10-40-400": (83.490, 11.717),
    "instML100k": (104.930, 13.922),
    "instML1M": (125.201, 8.60),
    # Cluster-only instances: the reference never published serial
    # numbers for these (they only ran at MPI 16-64 ranks,
    # report-mpi.pdf Table 1); best-published is the best across
    # Tables 1-3 (cluster MPI, local MPI, hybrid).
    "inst1000-1e6-1000-1-3": (None, 143.60),  # MPI-64 (211.80@16, 174.89@32)
    "inst1e6-100-700-1-3": (None, 70.34),  # MPI-64 (87.42@16, 86.32@32)
    "inst1000-80000-20-10-1000": (None, 19.04),
    "inst20000-10000-40-2-50": (None, 56.07),
    "inst60000-2000-200-10-20": (None, 11.05),
}

DEFAULT_INSTANCES = [
    "inst0",
    "inst1",
    "inst2",
    "inst30-40-10-2-10",
    "inst500-500-20-2-100",
    "inst1000-1000-100-2-30",
    "inst200-10000-50-100-300",
    "inst600-10000-10-40-400",
    "inst400-50000-30-200-500",
    "instML100k",
    "gen-instML1M",
    "inst50000-5000-100-2-5",
    # The reference's cluster-only extreme shapes (report-mpi.pdf
    # Table 1, MPI-16): the real 1000x1M k=1000 fixture and the 1M-user
    # gen-* analogue of the missing inst1e6-100-700-1-3 blob.
    "inst1000-1e6-1000-1-3",
    "gen-inst1e6-100-700-1-3",
    # The three orphan-golden shapes (outputs survive upstream, inputs
    # missing): gen-* analogues with iteration counts derived from the
    # published MPI-1 walls (GEN_SPECS, io/generator.py).
    "gen-inst1000-80000-20-10-1000",
    "gen-inst20000-10000-40-2-50",
    "gen-inst60000-2000-200-10-20",
]

# f64 exact mode: sparse instances run BELL at any size; instances whose
# f64 path is the dense masked-matmul are skipped above this cell count
# (software-emulated f64 matmuls).
F64_CELL_LIMIT = 4_000_000  # users*items

# bfloat16 acceptance floor: bf16 is a speed mode whose correctness
# claim is argmax agreement with the exact-f64 golden.  Rows measuring
# below this agreement are flagged in the table and must not be quoted
# as wins (README/STATUS policy); rows with no golden cannot be
# validated and bf16 should not be used for them.
BF16_MIN_AGREEMENT = 0.98


def _fixture_dir() -> str:
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(here, "tests", "fixtures")


def effective_train_s(r: dict):
    """The wall %roofline should divide by: the marginal (slope) train
    when the row has a TRUSTWORTHY one, else the single-call train
    phase, else the end-to-end wall.  Differencing two phase walls each
    carrying ~±ms of sync-floor noise is meaningless for short trains,
    so the marginal is trusted only when the train phase is >= 0.2 s
    and the slope explains at least half of it (a 'fixed cost' above
    50% of a full train is noise, not dispatch)."""
    t = r.get("train_s")
    m = r.get("train_marginal_s")
    if m and t and t >= 0.2 and m >= 0.5 * t:
        return m
    return t or r.get("wall_s")


def run_instance(name: str, dtype: str, repeats: int):
    from recsys_tpu.config import RunConfig
    from recsys_tpu.engine import trainer
    from recsys_tpu.io.parser import load_problem

    path = os.path.join(_fixture_dir(), f"{name}.in")
    spec = load_problem(path)
    # "f32x3" is the f32 mode with 3-pass split-product matmuls in the
    # fused dense kernels (RunConfig.precision="bf16x3"): a speed tier
    # between f32-highest and bf16, gated by the same agreement floor.
    cfg = (
        RunConfig(dtype="float32", precision="bf16x3")
        if dtype == "f32x3"
        else RunConfig(dtype=dtype)
    )
    out, _ = trainer.run(spec, cfg)  # warm-up compiles
    walls = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out, _ = trainer.run(spec, cfg)
        walls.append(time.perf_counter() - t0)
    golden_path = os.path.join(_fixture_dir(), f"{name}.out")
    agree = None
    exact = None
    if os.path.exists(golden_path) and os.path.getsize(golden_path):
        golden = open(golden_path).read()
        glines = golden.splitlines()
        olines = out.splitlines()
        agree = sum(x == y for x, y in zip(olines, glines)) / max(len(glines), 1)
        exact = out == golden
    wall = min(walls)
    # One more instrumented pass (warm, outside the timed repeats): the
    # per-stage walls separate the steady-state train time from one-shot
    # upload/top-1/prep costs — a 10-iteration extreme-shape wall is
    # upload-dominated and its end-to-end %roofline means nothing.
    from recsys_tpu.utils.timing import collect_phases, sync_floor_seconds

    # Two passes, per-phase min: the first pass pays one-shot compiles
    # of the tiny one-element sync programs (~1 s each through the
    # remote attachment) which would otherwise be charged to whatever
    # phase ran them.  Each phase's closing sync costs one relay round
    # trip (~30 ms here) — measure that floor and subtract it, or a
    # 10000-iteration small-instance train phase reads 2x its true
    # steady-state time.
    ph: dict = {}
    sync_counts: dict = {}
    for _ in range(2):
        p: dict = {}
        with collect_phases(p):
            trainer.run(spec, cfg)
        p.pop("_synced", set())
        for k, v in p.pop("_sync_counts", {}).items():
            sync_counts[k] = max(v, sync_counts.get(k, 0))
        ph = {k: min(v, ph.get(k, v)) for k, v in p.items()}
    # Host-routed instances sync host-resident arrays (no relay round
    # trip), so the TPU-measured floor must not be subtracted there.
    host_routed = (
        trainer.choose_path(spec, cfg) == "host"
        or trainer._sub_mxu_host_device(spec, cfg) is not None
    )
    floor = sync_floor_seconds() if sync_counts and not host_routed else 0.0
    ph = {
        k: max(v - floor * sync_counts.get(k, 0), 0.0) for k, v in ph.items()
    }
    train_s = ph.get("train")
    # Marginal (slope) per-iteration time: the train phase of a single
    # call still carries a per-call fixed attachment cost (~0.15-0.3 s
    # of dispatch/DMA-warm RTTs through the relay — measured: gen-ML1M
    # f32 train_s/iters reads 515 us/iter while the slope across
    # iteration counts is 417, and the probe intercepts name the same
    # fixed term, bench_logs/r5_probe_ml1m_stream.log).  Re-running the
    # train at a reduced iteration count and differencing cancels the
    # fixed term exactly (same program family, same operands) — the
    # methodology every probe_* script uses.  The fixed costs and sync
    # floors cancel in the difference.
    train_marginal_s = None
    if train_s is not None and spec.iters >= 100 and not host_routed:
        import dataclasses

        n1 = max(spec.iters // 3, 10)
        spec1 = dataclasses.replace(spec, iters=n1)
        best1 = None
        for _ in range(2):
            q: dict = {}
            with collect_phases(q):
                trainer.run(spec1, cfg)
            q.pop("_synced", set())
            cnts = q.pop("_sync_counts", {})
            t = q.get("train")
            if t is not None:
                t = max(t - floor * cnts.get("train", 0), 0.0)
                best1 = t if best1 is None else min(best1, t)
        if best1 is not None and 0 < best1 < train_s:
            train_marginal_s = (train_s - best1) / (spec.iters - n1) * spec.iters
    # XLA's per-program memory analysis, not runtime memory_stats: the
    # runtime figure is a process-lifetime high-water mark that would
    # attribute an earlier larger instance's peak to every later row.
    hbm_peak_mb = _program_hbm_mb(spec, cfg)
    vmem_mb = _resident_vmem_mb(spec, cfg)
    chosen = trainer.choose_path(spec, cfg)
    from recsys_tpu.bench.roofline import pct_of_roofline

    rl_model, rl_pct = pct_of_roofline(
        spec, cfg, chosen,
        effective_train_s(
            {"train_s": train_s, "train_marginal_s": train_marginal_s, "wall_s": wall}
        ),
    )
    import jax

    row = {
        "backend": jax.default_backend(),
        "hbm_peak_mb": hbm_peak_mb,
        "resident_vmem_est_mb": vmem_mb,
        "instance": name,
        "dtype": dtype,
        "path": chosen,
        "wall_s": round(wall, 4),
        "train_s": None if train_s is None else round(train_s, 4),
        "per_iter_ms": (
            None if train_s is None else round(1e3 * train_s / max(spec.iters, 1), 4)
        ),
        "train_marginal_s": (
            None if train_marginal_s is None else round(train_marginal_s, 4)
        ),
        "per_iter_marginal_ms": (
            None
            if train_marginal_s is None
            else round(1e3 * train_marginal_s / max(spec.iters, 1), 4)
        ),
        "prep_s": None if "prep" not in ph else round(ph["prep"], 4),
        "upload_s": None if "upload" not in ph else round(ph["upload"], 4),
        "top1_s": None if "top1" not in ph else round(ph["top1"], 4),
        "updates_per_s": round(spec.iters * spec.nnz / wall),
        "iters": spec.iters,
        "nnz": spec.nnz,
        "users": spec.users,
        "items": spec.items,
        "k": spec.features,
        "golden_exact": exact,
        "agreement": None if agree is None else round(agree, 4),
        "roofline_model": rl_model,
        "pct_roofline": rl_pct,
    }
    _clamp_sub_resolution_pct(row)
    if dtype in ("bfloat16", "f32x3"):
        # Reduced-pass speed tiers share the acceptance floor: quote a
        # row only if it reaches the agreement floor against the golden.
        row["bf16_below_floor"] = agree is None or agree < BF16_MIN_AGREEMENT
    return row


_DTYPE_ORDER = {"float32": 0, "f32x3": 1, "bfloat16": 2, "float64": 3}


def _row_order(r: dict):
    inst = r["instance"]
    try:
        i = DEFAULT_INSTANCES.index(inst)
    except ValueError:
        i = len(DEFAULT_INSTANCES)
    return (_DTYPE_ORDER.get(r["dtype"], 9), i, inst)


def format_markdown(rows: list[dict]) -> str:
    rows = sorted(rows, key=_row_order)
    lines = [
        "# recsys-tpu benchmark sweep (1 TPU chip)",
        "",
        "Reference numbers: report-omp.pdf Table 2 (serial, 1 Ryzen 1700X core) and the",
        "best published parallel config across all reference tables (SURVEY.md §6) —",
        "including 16-64-rank cluster MPI runs, so 'vs best published' compares one TPU",
        "chip against the reference's best at ANY scale.",
        "",
        "float64 rows are the exact-conformance mode (byte-identical output; f64 is",
        "software-emulated on TPU). float32/bfloat16 rows are the speed modes (argmax",
        "agreement reported). Sub-dispatch-floor problems (toy instances: tiny",
        "matrices, tiny iterations — path 'host') run the native sequential engine",
        "(native/recsys_native.c::rs_serial_gd, bit-identical trajectory to the",
        "reference binary) regardless of dtype; mid-size exact-f64 problems below",
        "the MXU regime route to the host CPU device, where the same HLO runs",
        "native f64 ~45x faster than TPU software emulation (engine/trainer.py).",
        "",
        "| instance | dtype | path | wall (s) | train (s) | per-iter (ms) | updates/s | vs serial | vs best published | golden | %roofline | HBM peak (MB) |",
        "|---|---|---|---|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        # gen-* instances are scale-equivalent regenerations of blobs
        # missing upstream; compare against the original's numbers.
        ref = REFERENCE_S.get(r["instance"]) or REFERENCE_S.get(
            r["instance"].removeprefix("gen-")
        )
        vs_serial = f"{ref[0] / r['wall_s']:.1f}x" if ref and ref[0] else "-"
        vs_best = f"{ref[1] / r['wall_s']:.1f}x" if ref and ref[1] else "-"
        if r["golden_exact"]:
            gold = "exact"
        elif r["agreement"] is not None:
            gold = f"{100 * r['agreement']:.2f}%"
        else:
            gold = "-"
        if r.get("bf16_below_floor"):
            gold += " BELOW-FLOOR"
        mem = r.get("hbm_peak_mb")
        vmem = r.get("resident_vmem_est_mb")
        memcol = "-" if mem is None else f"{mem:g}"
        if vmem is not None:
            memcol += f" (+{vmem:g} VMEM)"
        pct = r.get("pct_roofline")
        rlcol = "-" if pct is None else f"{pct:g}% {r.get('roofline_model', '')}"
        train = r.get("train_s")
        traincol = "-" if train is None else f"{train:g}"
        pit = r.get("per_iter_ms")
        if r.get("train_marginal_s") and effective_train_s(r) == r["train_marginal_s"]:
            pit = r.get("per_iter_marginal_ms")
        pitcol = "-" if pit is None else f"{pit:g}"
        pathcol = r["path"] + (" (cpu)" if r.get("backend") == "cpu" else "")
        lines.append(
            f"| {r['instance']} | {r['dtype']} | {pathcol} | {r['wall_s']} | "
            f"{traincol} | {pitcol} | "
            f"{r['updates_per_s']:.3g} | {vs_serial} | {vs_best} | {gold} | {rlcol} | {memcol} |"
        )
    lines += [
        "",
        "Notes:",
        "- 'train (s)' / 'per-iter (ms)' are the steady-state training phase",
        "  measured by an instrumented pass (utils/timing.py collect_phases):",
        "  upload, compile and top-1 are one-shot costs that dominate short",
        "  walls (the 10-iteration extreme shapes especially). Rows measured",
        "  before round 4 carry '-' there. Round-5+ rows also measure the",
        "  MARGINAL per-iteration time (slope across two iteration counts,",
        "  cancelling the attachment's ~0.15-0.3 s per-call fixed dispatch",
        "  cost exactly); the per-iter column and %roofline use the marginal",
        "  when present — the single-call train phase overstates short",
        "  steady states by that fixed term. A '~' before a row's model name",
        "  marks a percentage clamped to 100: its train phase sat below the",
        "  50 ms sync-floor measurement resolution, so the computed value",
        "  exceeded 100 by measurement error, not by beating the ceiling.",
        "- '%roofline' compares the measured TRAIN wall (end-to-end wall for",
        "  pre-round-4 rows — conservative) against the formulation's hardware",
        "  minimum, recomputed at render time with the current model",
        "  (bench/roofline.py): 'gather' rows price each BELL side separately",
        "  (slot count and the f64 split form are per-side) over the fused-",
        "  pipeline ceilings — the best sustained production observation per",
        "  dtype (scripts/calibrate_gather_ceiling.py; synthetic standalone",
        "  gathers measure LOWER than XLA's fused gather->reduce);",
        "  'gather+f64vpu' (exact-f64 BELL) adds the software-f64 VPU",
        "  elementwise term per side (~(4k+2) emulated ops per slot, (6k+2)",
        "  with the split-form join) at the calibrated 72 G op/s production",
        "  ceiling — additive with the gather when the side is chunked",
        "  (pieces serialize), max() when the side fuses whole (the VPU math",
        "  overlaps the gather engine; see roofline.bell_side_seconds);",
        "  'mxu' rows price",
        "  2*U*I*(128 + 2k) MAC-equivalents per iteration at the PADDED dims",
        "  of the engine's own kernel plan (the strip walk pads items to the",
        "  strip multiple, users to 128 — real systolic-array work; the plan",
        "  already ranks candidates by padding) — the prediction matmul pays",
        "  the full 128-lane contraction whatever k is, the two K-major",
        "  gradient matmuls cost their true k — over the MXU peak (197",
        "  TFLOP/s bf16; f32 at highest precision = 6 passes, bf16x3 = 3),",
        "  plus a 0.75 us fixed in-loop cost per iteration (bounded by the",
        "  smallest committed rows); the streamed kernel's per-iteration HBM",
        "  read of transposed A is double-buffered behind the MXU passes, so",
        "  the floor takes max(MXU, A-traffic). Calibration: the ML100k",
        "  1-pass row measures AT the padded 1-pass model (4.0 us/iter,",
        "  bench_logs/r5_probe_resident.log). 100% = speed of light for that",
        "  formulation. Host-routed and software-f64 dense rows have no model.",
        f"- bfloat16 policy: rows must reach {100 * BF16_MIN_AGREEMENT:.0f}% argmax agreement with the",
        "  exact-f64 golden; rows marked BELOW-FLOOR (or without a golden) fail",
        "  the floor and are excluded from headline claims — use float32 there.",
        "- inst600-10000 (~60% at k=10) and the streamed gen-ML1M f32 row",
        "  (~64%) are the dense shapes materially below the MXU model, and",
        "  their floors are profile-backed rather than modelled:",
        "  the slope probe (bench_logs/r5_probe_inst600.log) shows even the",
        "  1-pass kernel at 23.0 us/iter vs the 9.85 us padded-MXU model — VPU",
        "  elementwise work over the U*I error cells that k=10's thin MXU work",
        "  cannot hide (plus ~5.7 us/extra-pass of operand-split VPU work at",
        "  highest) — consistent across all three tiers and strip layouts, and",
        "  cheaper than every alternative measured (XLA dot_general chains run",
        "  82/39.8 us). gen-ML1M f32's streamed residual is the same class",
        "  (25M A/E cells per iteration; its fused-top1 predication penalty",
        "  was measured and removed in round 5 — 516 -> 455 us/iter,",
        "  bench_logs/r5_probe_ml1m_stream.log). The same per-cell work hides",
        "  inside the MXU passes on every other committed dense shape, so the",
        "  model keeps the honest MXU+floor form rather than a shape-fit",
        "  constant.",
        "- Single-pass bfloat16 rows sit lower on the %roofline column than the",
        "  6-pass f32 rows by construction: the model prices MXU passes only,",
        "  and the VPU/elementwise/scheduling work that is negligible next to 6",
        "  passes dominates at 1 pass.  The column compares like with like",
        "  within a tier; across tiers read the per-iter column.",
        "- `gen-*` rows are scale-equivalent regenerations of instances whose `.in`",
        "  blobs are missing upstream (see tests/fixtures/README.md); gen-instML1M",
        "  mirrors ML1M's shape/nnz/hyperparameters and is compared against the",
        "  original's published numbers.",
        "- bf16 single-pass matmuls help the VMEM-resident/streamed kernels",
        "  only; on the tiled kernel they measured slower than 6-pass f32",
        "  (A-traffic bound), so bfloat16 falls back to full precision there.",
        "  The fused kernels also *store* A compactly when exact (int8 for",
        "  half-star scales, bf16 when ratings round-trip) — that is how",
        "  ML1M-scale instances fit the one-kernel paths.",
        "- inst200-10000's golden is order-sensitive: even the numpy f64 oracle (and",
        "  hence any matrix-form engine) agrees 99.50%, not byte-exact — the last",
        "  0.5% of argmaxes depend on the serial C loop's floating-point summation",
        "  order. Every instance the reference reports as verification-grade",
        "  (SURVEY.md S0) is byte-exact here in f64 AND in fused-kernel f32.",
        "- The extreme-shape cluster instances run the BELL path: an iteration",
        "  touches O(nnz*k) cells, never items*k, and no scatter program is",
        "  compiled. inst1000-1e6's upstream golden was an empty file; round 5",
        "  minted it from the reference's own serial binary (two independent",
        "  builds agree byte-for-byte, tests/fixtures/README.md), so its rows",
        "  now carry output columns: f32 on TPU at 98.9% agreement, f64 on the",
        "  CPU backend byte-exact end-to-end through the production BELL path",
        "  (the 16 GB k=1000 f64 factor tables cannot fit the chip).",
        "  inst1e6-100's .in blob is missing upstream — its gen-* analogue",
        "  stands in, validated against the reference binary's own output.",
        "- 'HBM peak' is XLA's compile-time memory analysis of the training",
        "  program (arguments + temps + output; exact — it is what the compiler",
        "  reserves). '+VMEM' is the resident kernel's estimated on-chip working",
        "  set, which HBM numbers do not include.",
        "- Scaling (comm-volume model, projected ICI efficiency, CPU-mesh",
        "  measurements): spliced in below from docs/SCALING.md (regenerate",
        "  with `python -m recsys_tpu.bench.scaling`).",
        "- gen-inst60000-2000 exact-f64 (k=200) faulted the remote TPU worker",
        "  on five distinct HLOs across three rounds (every >=64 MB gather",
        "  piece size); the shipped 32 MB wide-f64 piece cap",
        "  (ops/bell.py::WIDE_F64_CHUNK_BYTES) is the isolated fix — its row",
        "  above is byte-exact on TPU and beats the reference's MPI-64 best.",
        "- Measurement provenance: rows are dedicated-process measurements",
        "  (min over repeats after a warm-up compile) through a REMOTE TPU",
        "  attachment whose fixed per-run overhead (upload + dispatch round",
        "  trips) varies by a factor of several with attachment state — e.g.",
        "  instML100k f32's end-to-end wall measured 0.143 / 0.197 / 0.158 s",
        "  across three windows of one day while its steady-state TRAIN phase",
        "  improved monotonically (0.085 s final). Walls are quoted as",
        "  measured (latest row wins); the train/per-iter columns are the",
        "  attachment-invariant signal. The reference's published numbers have",
        "  no such overhead (local process, wall ~= train).",
        "",
    ]
    return "\n".join(lines)


def main(argv=None):
    ap = argparse.ArgumentParser(prog="recsys-tpu-sweep")
    ap.add_argument("--dtype", default="float32", choices=["float32", "float64", "bfloat16", "f32x3"])
    ap.add_argument("--out", default=None, help="write a markdown table here")
    ap.add_argument("--jsonl", default=None, help="append JSONL rows here")
    ap.add_argument("--instances", default=None, help="comma-separated subset")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--f64-cell-limit", type=int, default=F64_CELL_LIMIT,
                    help="skip f64 rows above users*items cells")
    ap.add_argument("--render", default=None, help="render this JSONL to --out and exit")
    ap.add_argument("--backend", default=None,
                    help="force a JAX platform (e.g. cpu) — the env var alone "
                         "does not stick where an attachment plugin re-registers")
    args = ap.parse_args(argv)
    if args.backend:
        import jax

        jax.config.update("jax_platforms", args.backend)

    if args.render:
        rows = [json.loads(l) for l in open(args.render) if l.strip()]
        # Keep the latest row per (instance, dtype): refreshed runs
        # append.  The table is headlined "(1 TPU chip)", so a CPU-
        # backend row (fallback measurements; rows without a backend
        # field predate it and are all accelerator rows) never
        # displaces an accelerator row — it renders only when it is
        # the sole measurement, labeled via the path column.
        latest = {}
        for r in rows:
            key = (r["instance"], r["dtype"])
            cur = latest.get(key)
            if (
                cur is not None
                and r.get("backend") == "cpu"
                and cur.get("backend") != "cpu"
            ):
                continue
            latest[key] = r
        rows = list(latest.values())
        _recompute_roofline(rows)
        md = format_markdown(rows)
        # The scaling section (comm-volume model + CPU-mesh tables) lives
        # in docs/SCALING.md (regenerated by bench.scaling); splice it in
        # so BENCHMARKS.md carries the reference's scaling-table analogue.
        scaling_md = os.path.join(
            os.path.dirname(os.path.dirname(_fixture_dir())), "docs", "SCALING.md"
        )
        if os.path.exists(scaling_md):
            md += "\n" + open(scaling_md).read()
        if args.out:
            open(args.out, "w").write(md)
        else:
            print(md)
        return 0

    from recsys_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    if args.dtype == "float64":
        import jax

        jax.config.update("jax_enable_x64", True)

    names = args.instances.split(",") if args.instances else DEFAULT_INSTANCES
    # Materialize regenerable gen-* fixtures FIRST: the f64 feasibility
    # filter below reads the .in files.
    from recsys_tpu.io.generator import ensure_fixture

    for name in names:
        ensure_fixture(name, _fixture_dir())
    if args.dtype == "float64":
        names = [n for n in names if _f64_feasible(n, args.f64_cell_limit)]
    rows = []
    for name in names:
        if not os.path.exists(os.path.join(_fixture_dir(), f"{name}.in")):
            print(f"skip {name}: no .in fixture", file=sys.stderr)
            continue
        try:
            r = run_instance(name, args.dtype, args.repeats)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name} {args.dtype}: {e}", file=sys.stderr)
            continue
        rows.append(r)
        print(json.dumps(r), flush=True)
        if args.jsonl:
            with open(args.jsonl, "a") as f:
                f.write(json.dumps(r) + "\n")
        # Drop compiled programs and collect dead device buffers between
        # instances: a full sweep in ONE process otherwise accumulates
        # toward HBM (the 12 GB extreme shapes RESOURCE_EXHAUSTED after
        # ~10 earlier instances; each passes in a fresh process).  Shapes
        # never repeat across instances, so nothing reusable is lost —
        # the persistent compile cache covers re-runs.
        import gc

        import jax

        gc.collect()
        jax.clear_caches()
    if args.out:
        with open(args.out, "w") as f:
            f.write(format_markdown(rows))
    return 0


def _recompute_roofline(rows: list[dict]) -> None:
    """Refresh each row's %roofline with the CURRENT cost model at
    render time (the stored pct was computed with whatever model shipped
    when the row was measured — model fixes must reprice old rows or a
    corrected model would render stale percentages forever).  Uses the
    row's steady-state train wall when the row has one, its end-to-end
    wall otherwise (conservative).  Rows whose fixture cannot be loaded
    keep their stored value."""
    from recsys_tpu.config import RunConfig
    from recsys_tpu.io.parser import load_problem
    from recsys_tpu.bench.roofline import pct_of_roofline

    specs: dict = {}
    for r in rows:
        if r.get("backend") == "cpu":
            # The ceilings are TPU observations; a CPU-backend fallback
            # row gets no percentage rather than a nonsense one.
            r["roofline_model"], r["pct_roofline"] = None, None
            continue
        name = r["instance"]
        if name not in specs:
            from recsys_tpu.io.generator import ensure_fixture

            try:
                specs[name] = load_problem(ensure_fixture(name, _fixture_dir()))
            except OSError:
                specs[name] = None
        spec = specs[name]
        if spec is None:
            continue
        cfg = (
            RunConfig(dtype="float32", precision="bf16x3")
            if r["dtype"] == "f32x3"
            else RunConfig(dtype=r["dtype"])
        )
        model, pct = pct_of_roofline(
            spec, cfg, r["path"], effective_train_s(r),
        )
        r["roofline_model"], r["pct_roofline"] = model, pct
        _clamp_sub_resolution_pct(r)


# Train phases below this are at the sync-floor measurement's own
# resolution (~30 ms relay round trip, subtracted with +-few-ms error);
# a >100% percentage computed from one is a measurement artifact, not a
# ceiling breach, and is clamped to 100 with a '~' marker.  A >100% row
# ABOVE the floor stays visible raw — that is a real calibration breach
# the ceiling convention requires bumping (calibrate_gather_ceiling.py).
TRAIN_RESOLUTION_S = 0.05


def _clamp_sub_resolution_pct(r: dict) -> None:
    pct = r.get("pct_roofline")
    if pct is not None and pct > 100 and (effective_train_s(r) or 1.0) < TRAIN_RESOLUTION_S:
        r["pct_roofline"] = 100.0
        r["roofline_model"] = "~" + (r.get("roofline_model") or "")


def _program_hbm_mb(spec, cfg):
    """XLA's own memory analysis of the training program: arguments +
    temps + output, in MB.  Exact (it is what the compiler reserves),
    and available even where runtime memory_stats is not."""
    try:
        from recsys_tpu.engine import trainer

        ma = trainer.train_memory_analysis(spec, cfg)
        return None if ma is None else round(ma["total_bytes"] / 1e6, 1)
    except Exception:  # noqa: BLE001
        return None


def _resident_vmem_mb(spec, cfg):
    """Estimated VMEM working set when the run used a factor-resident
    Pallas kernel (the on-chip footprint HBM stats don't see), else
    None."""
    from recsys_tpu.engine import trainer
    from recsys_tpu.ops import pallas_dense

    if trainer.choose_path(spec, cfg) != "pallas":
        return None
    kind, a_dtype, strip = trainer._pallas_plan(  # the engine's own choice
        spec, precision=trainer.mxu_precision(cfg)
    )
    if kind == "tiled":
        return None
    import jax.numpy as jnp

    a_bytes = jnp.dtype(a_dtype).itemsize
    fn = (
        pallas_dense.resident_vmem_bytes
        if kind == "resident"
        else pallas_dense.stream_vmem_bytes
    )
    return round(fn(spec, strip=strip, a_bytes=a_bytes) / 1e6, 1)


def _f64_feasible(name: str, cell_limit: int) -> bool:
    """f64 rows run wherever the auto path avoids the dense form (BELL
    handles sparse instances at any size); dense-path instances are
    capped by the software-f64 matmul cell limit."""
    from recsys_tpu.config import RunConfig
    from recsys_tpu.engine import trainer
    from recsys_tpu.io.parser import load_problem

    path = os.path.join(_fixture_dir(), f"{name}.in")
    if not os.path.exists(path):
        print(f"skip {name}: no .in fixture (f64 filter)", file=sys.stderr)
        return False
    spec = load_problem(path)
    # Even sparse-path f64 needs both factor tables (plus the device
    # un-permute's gather copy) resident in f64: cap at half of HBM —
    # unless the run is forced onto the CPU backend, whose budget is
    # host RAM (the inst1000-1e6 f64 conformance row lives there: its
    # 16 GB of k=1000 factor tables can never fit the 16 GB chip, and
    # CLAUDE.md forbids HBM-edge probes through this attachment anyway).
    import jax

    # default_backend(), not the jax_platforms config: the config is only
    # 'cpu' when forced via --backend, while a CPU-only host (or any
    # environment where the attachment plugin re-registers platforms)
    # still resolves its actual backend here.
    on_cpu = jax.default_backend() == "cpu"
    factor_bytes = 2 * 2 * (spec.users + spec.items) * spec.features * 8
    if factor_bytes > (48 << 30 if on_cpu else 8 << 30):
        print(f"skip {name}: f64 factor tables exceed the backend budget",
              file=sys.stderr)
        return False
    if trainer.choose_path(spec, RunConfig(dtype="float64")) != "dense":
        return True
    ok = spec.users * spec.items <= cell_limit
    if not ok:
        print(f"skip {name}: dense-path f64 above the {cell_limit:,}-cell limit",
              file=sys.stderr)
    return ok


if __name__ == "__main__":
    sys.exit(main())

"""Per-path roofline models: what the hardware would allow per iteration.

The reference's reports derive per-process comm volume and speedup
ceilings by hand (report-mpi.pdf §4.1); SURVEY §7.4 asks for the chip
version — updates/s vs a roofline from bytes-touched over HBM bandwidth
(sparse paths) or FLOPs over MXU peak (dense paths).  Round 2 computed
these by hand once (STATUS.md: "~6x off gather roofline", "~4x over MXU
roofline"); this module makes them bench columns so efficiency
regressions are visible per row.

These are MODELS, not measurements: the byte/FLOP counts are the
minimum traffic/work the formulation must perform, and the peaks are
the chip's datasheet numbers (or, for gathers, the best rate any
measurement has ever sustained), so ``pct_roofline`` = (modelled
minimum wall) / (measured wall) — 100% means running at the hardware's
speed of light for that formulation.  Measured walls are END-TO-END
(upload + train + top-1 + download) unless the row carries a measured
``train_s`` (round 4+ rows do), which makes old-row percentages
conservative.

Peak constants (TPU v5e, one chip — the attachment hardware):
  HBM      ~819 GB/s
  MXU bf16 ~197 TFLOP/s; f32 at `highest` precision runs 6 bf16 passes
           per product (the fused kernels' configuration), so f32 peak
           is modelled at 197/6.  Software-emulated f64 has no
           meaningful peak — dense-f64 rows report no percentage.
  Gather   the sparse paths' real ceiling is XLA's row-gather engine,
           NOT HBM bytes: the synthetic probe (probe_gather_rate.py,
           2026-08-19, idle attachment) measured ~208 M rows/s for f32
           rows up to 512 B — independent of row width (k32 == k128),
           dtype (bf16/int8 identical), index order, and duplication —
           and ~120 M rows/s for f64 rows; only >=256-lane rows raise
           byte throughput (k512: 102 M rows/s = 209 GB/s).  Production
           BELL programs measured 192-261 M f32 rows/s across instances
           and attachment states (probe_bell_floor.py).
           ROUND-4 REFINEMENT (probe_gather_tablesize.py): the rate is
           a function of the SOURCE TABLE size — tables that fit the
           on-chip staging window gather much faster than HBM-resident
           ones.  Two round-3 rows exceeded 100% of the flat-rate model
           (gen-inst1000-80000 f32 116.5%, inst600-10000 f64 113.6%)
           and both gather one side from a sub-100 KB factor table;
           the per-side model below prices each side by its own table.
           In-kernel alternatives are unavailable: Mosaic cannot lower
           vector gathers (probe_mosaic_gather.py P1-P3 repro) and f64
           bitcast_convert_type crashes this toolchain's compiler, so
           the engine rate IS the sparse-path roofline.
"""

from __future__ import annotations

HBM_GBPS = 819.0
MXU_TFLOPS = {"bfloat16": 197.0, "float32": 197.0 / 6.0}
# HBM-resident-table engine rates (best sustained observation; see
# module docstring).  Used for tables larger than SMALL_TABLE_BYTES.
GATHER_ROWS_PER_S = {"float32": 260e6, "bfloat16": 260e6, "float64": 120e6}
# Small-source-table rates (probe_gather_tablesize.py): calibrated in
# round 4; see scripts/probe_gather_tablesize.py and the committed
# bench_logs/r4_probe_tablesize_*.log.  Provisional until the probe
# log lands: sized so the two >100% round-3 rows (which imply >=303 M
# f32 rows/s and >=136 M f64 rows/s sustained through one small-table
# side) sit below their side-decomposed roofline.
SMALL_TABLE_BYTES = 512 << 10
SMALL_TABLE_ROWS_PER_S = {"float32": 520e6, "bfloat16": 520e6, "float64": 240e6}
GATHER_BYTES_GBPS = 209.0  # wide-row cap: k512 f32 measured 102 M rows/s


def gather_row_seconds(
    k: int,
    dtype: str,
    side_slots: int | None = None,
    table_rows: int | None = None,
    allow_split: bool = True,
) -> float:
    """Seconds per gathered row for ONE side: the engine's row rate —
    stepped up when the side's source table is small enough to stage
    on-chip (``table_rows`` rows of the opposite factor table) — capped
    by the wide-row byte rate once padded rows exceed ~1 KB (all
    measured; probe_gather_rate.py, probe_gather_tablesize.py).  Row
    bytes use the 128-lane padded width the sparse paths actually
    gather.  f64 rows that the engine splits (ops/bell.py
    _use_split_gather: 3k <= 64 always, 3k <= 128 when the side's
    unsplit set is chunked) gather their exact 3xf32 split form — one
    f32 row per slot at the f32 rates; ``allow_split=False`` prices
    paths that never split (the COO formulation)."""
    from recsys_tpu.ops.bell import _use_split_gather

    es = 8 if dtype == "float64" else (2 if dtype == "bfloat16" else 4)
    kp = -(-k // 128) * 128
    rate_dtype = dtype
    if (
        allow_split
        and dtype == "float64"
        and _use_split_gather("float64", k, side_slots)
    ):
        es, kp = 4, -(-(3 * k) // 128) * 128
        rate_dtype = "float32"
    table = GATHER_ROWS_PER_S
    if table_rows is not None and table_rows * k * es <= SMALL_TABLE_BYTES:
        table = SMALL_TABLE_ROWS_PER_S
    rate = table.get(rate_dtype, table["float32"])
    return max(1.0 / rate, kp * es / (GATHER_BYTES_GBPS * 1e9))


def train_cost_model(spec, cfg, path: str):
    """(model, seconds_per_iteration) of the roofline-minimum iteration
    cost for this instance/path, or (None, None) when no device model
    applies (host-serial runs, software-f64 dense)."""
    es = 8 if cfg.dtype == "float64" else (2 if cfg.dtype == "bfloat16" else 4)
    k = spec.features
    if path == "bell":
        # Gather-engine-bound (measured, probe_gather_rate.py — NOT HBM
        # bytes: the engine delivers ~208 M f32 rows/s regardless of row
        # width, ~1/7 of what the HBM byte model would predict for k<=128).
        # Each side's fused gather-reduce fetches the OPPOSITE side's
        # factor rows once per occupied slot, so the sides are priced
        # independently: slot count, split gate, and source-table size
        # are all per-side (the sides can be extremely asymmetric —
        # gen-inst1000-80000's i-side reads a 1001-row table while its
        # u-side reads an 80001-row one).
        from recsys_tpu.ops.bell import bell_side_slots

        su, si = bell_side_slots(spec)
        per_iter = su * gather_row_seconds(
            k, cfg.dtype, su, table_rows=spec.items + 1
        ) + si * gather_row_seconds(k, cfg.dtype, si, table_rows=spec.users + 1)
        return "gather", per_iter
    if path == "coo":
        # Gather-engine-bound: two k-row gathers per entry per side
        # (L[row], R[col] for the prediction; the segment reduction's
        # write traffic is a second-order term at the engine's row
        # rate).  The COO formulation never splits f64 tables.
        per_iter = 2.0 * spec.nnz * (
            gather_row_seconds(k, cfg.dtype, table_rows=spec.users, allow_split=False)
            + gather_row_seconds(k, cfg.dtype, table_rows=spec.items, allow_split=False)
        )
        return "gather", per_iter
    if path in ("pallas", "dense"):
        if cfg.dtype == "float64":
            return None, None  # software-emulated: no datasheet peak
        # MXU-bound, with MXU lane occupancy priced in: the prediction
        # matmul contracts over k and therefore pays the systolic
        # array's full 128-lane contraction regardless of k (k=30 data
        # occupies 23% of every pred pass), while the two gradient
        # matmuls stream only K sublane rows (the K-major layout) and
        # cost their true k.  MAC-equivalents per iteration:
        #   pred: users*items*128;  dL + dR: 2 * users*items*k.
        kp = -(-k // 128) * 128
        flops_per_iter = 2.0 * spec.users * spec.items * (kp + 2 * k)
        peak = MXU_TFLOPS["bfloat16" if cfg.dtype == "bfloat16" else "float32"]
        if cfg.dtype == "float32" and getattr(cfg, "precision", "auto") == "bf16x3":
            peak = 197.0 / 3.0  # 3-pass split product (ops/pallas_dense._dot)
        return "mxu", flops_per_iter / (peak * 1e12)
    return None, None


def pct_of_roofline(spec, cfg, path: str, wall_s: float):
    """(model, percent) where percent = modelled-minimum wall over the
    measured wall (pass the steady-state train wall when available, the
    end-to-end wall otherwise); None when no model applies."""
    model, per_iter = train_cost_model(spec, cfg, path)
    if model is None or not wall_s:
        return None, None
    return model, round(100.0 * spec.iters * per_iter / wall_s, 1)

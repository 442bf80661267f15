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
the chip's datasheet numbers, so ``pct_roofline`` = (modelled minimum
wall) / (measured wall) — 100% means running at the hardware's speed of
light for that formulation.  Measured walls are END-TO-END (upload +
train + top-1 + download), which makes the percentage conservative.

Peak constants (TPU v5e, one chip — the attachment hardware):
  HBM      ~819 GB/s
  MXU bf16 ~197 TFLOP/s; f32 at `highest` precision runs 6 bf16 passes
           per product (the fused kernels' configuration), so f32 peak
           is modelled at 197/6.  Software-emulated f64 has no
           meaningful peak — dense-f64 rows report no percentage.
"""

from __future__ import annotations

import numpy as np

HBM_GBPS = 819.0
MXU_TFLOPS = {"bfloat16": 197.0, "float32": 197.0 / 6.0}


def train_cost_model(spec, cfg, path: str):
    """(model, seconds_per_iteration) of the roofline-minimum iteration
    cost for this instance/path, or (None, None) when no device model
    applies (host-serial runs, software-f64 dense)."""
    es = 8 if cfg.dtype == "float64" else (2 if cfg.dtype == "bfloat16" else 4)
    k = spec.features
    if path == "bell":
        # HBM-bound: both sides' fused gather-reduces.  Minimum traffic
        # per iteration: the gathered opposite-side rows (slots x k),
        # the rating and index tables (slots x (es + 4)), and the
        # own-side factor rows — read once for the prediction and
        # read-modify-written by the update (3 x nnz-rows x k).
        from recsys_tpu.ops.bell import bell_slot_ratio

        slots = 2.0 * spec.nnz * bell_slot_ratio(spec)
        nz_u = int(np.count_nonzero(np.bincount(spec.rows, minlength=spec.users)))
        nz_i = int(np.count_nonzero(np.bincount(spec.cols, minlength=spec.items)))
        bytes_per_iter = (
            slots * k * es + slots * (es + 4) + 3 * (nz_u + nz_i) * k * es
        )
        return "hbm", bytes_per_iter / (HBM_GBPS * 1e9)
    if path == "coo":
        # HBM-bound: two gathers of k-rows per entry per side plus the
        # segment-reduction write traffic (~one k-row per active row).
        bytes_per_iter = 4 * spec.nnz * k * es + 2 * (spec.users + spec.items) * k * es
        return "hbm", bytes_per_iter / (HBM_GBPS * 1e9)
    if path in ("pallas", "dense"):
        if cfg.dtype == "float64":
            return None, None  # software-emulated: no datasheet peak
        # MXU-bound: three users x items x k products per iteration
        # (prediction, dL, dR), 2 FLOPs per MAC.
        flops_per_iter = 6.0 * spec.users * spec.items * k
        peak = MXU_TFLOPS["bfloat16" if cfg.dtype == "bfloat16" else "float32"]
        return "mxu", flops_per_iter / (peak * 1e12)
    return None, None


def pct_of_roofline(spec, cfg, path: str, wall_s: float):
    """(model, percent) where percent = modelled-minimum wall over the
    measured end-to-end wall; None when no model applies."""
    model, per_iter = train_cost_model(spec, cfg, path)
    if model is None or not wall_s:
        return None, None
    return model, round(100.0 * spec.iters * per_iter / wall_s, 1)

from recsys_tpu.ops.bell import bell_gd_step, make_bell_inputs
from recsys_tpu.ops.coo import (
    coo_gd_step,
    coo_gd_step_cumsum,
    make_coo_inputs,
    make_coo_seg_inputs,
)
from recsys_tpu.ops.dense import dense_gd_step, make_dense_inputs
from recsys_tpu.ops.topk import top1_blocked

__all__ = [
    "dense_gd_step",
    "make_dense_inputs",
    "coo_gd_step",
    "coo_gd_step_cumsum",
    "make_coo_inputs",
    "make_coo_seg_inputs",
    "bell_gd_step",
    "make_bell_inputs",
    "top1_blocked",
]

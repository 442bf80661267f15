from recsys_tpu.models.mf import MFState, init_factors

__all__ = ["MFState", "init_factors"]

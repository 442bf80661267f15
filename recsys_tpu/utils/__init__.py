from recsys_tpu.utils.timing import Timer

__all__ = ["Timer"]

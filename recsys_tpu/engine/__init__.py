from recsys_tpu.engine.oracle import factorize_numpy, top1_numpy, run_oracle

__all__ = ["factorize_numpy", "top1_numpy", "run_oracle"]

from recsys_tpu.parallel.mesh import balanced_grid, make_mesh

__all__ = ["balanced_grid", "make_mesh"]

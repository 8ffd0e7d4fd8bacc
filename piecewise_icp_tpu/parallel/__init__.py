from .sharded import build_sharded_iteration, make_mesh

__all__ = ["build_sharded_iteration", "make_mesh"]

from .mesh import sharded_commit_root, make_mesh

__all__ = ["sharded_commit_root", "make_mesh"]

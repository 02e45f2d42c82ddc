from .mesh import make_mesh, sharded_commit_root
from .multihost import aggregate_tree, prove_leaves

__all__ = [
    "sharded_commit_root",
    "make_mesh",
    "prove_leaves",
    "aggregate_tree",
]

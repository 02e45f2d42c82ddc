"""Multi-chip sharding: row-sharded Merkle commitment over a device mesh.

The distributed layer the reference doesn't have (SURVEY.md §2.7): witness
rows shard across chips, Poseidon2 leaf hashing and Merkle sub-tree
compression run data-parallel per shard, and only the log2(n_devices) cap
digests cross the ICI (all_gather) before a tiny replicated tree-top.

This is the seed of the full multi-chip prover: NTT all-to-all butterflies
and FRI fold reductions follow the same shard_map pattern.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fields.monty31 import Monty31, U32
from ..ops.hashing import compress_pair, sponge_hash
from ..ops.poseidon2 import poseidon2_params


def make_mesh(n_devices: int | None = None, axis: str = "rows") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def _local_subtree_root(params, rows):
    """(H_local, W) rows -> (8,) local Merkle subtree root, fully on-device."""
    digests = sponge_hash(params, rows, 8, 8, jnp)
    h = digests.shape[0]
    while h > 1:
        digests = compress_pair(params, digests[0::2], digests[1::2], jnp)
        h //= 2
    return digests[0]


def sharded_commit_root(field: Monty31, matrix, mesh: Mesh, axis: str = "rows"):
    """Merkle root of a row-power-of-2 matrix, rows sharded over the mesh.

    Per-shard work (leaf sponge + subtree compress) is embarrassingly
    parallel; shard roots cross the interconnect once via all_gather and the
    log2(n_shards)-deep tree top is computed replicated.
    """
    params = poseidon2_params(field, 16)
    n_shards = mesh.devices.size

    def shard_fn(local_rows):
        root = _local_subtree_root(params, local_rows)
        roots = jax.lax.all_gather(root, axis)  # (n_shards, 8)
        h = n_shards
        while h > 1:
            roots = compress_pair(params, roots[0::2], roots[1::2], jnp)
            h //= 2
        return roots[0]

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=P(axis, None),
        out_specs=P(),
        check_vma=False,
    )
    return fn(matrix)

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


# ----- mesh-sharded PCS kernels (full prover integration) -----
#
# The commit round and FRI folds of `TwoAdicFriPcs` run as ONE jitted
# GSPMD program over the mesh: trace rows and codeword rows carry
# `with_sharding_constraint(P(axis, None))` annotations, and XLA inserts
# the collectives (all_to_all inside the NTT's global row mixing,
# all_gather up the Merkle tree top) — the scaling-book recipe, in
# contrast to the hand-written shard_map four-step NTT above which serves
# as the explicitly-scheduled alternative for the largest transforms.

_MESH_FN_CACHE: dict = {}


def _row_sharded(mesh: Mesh, axis: str, arr):
    """Constrain rows over the mesh axis when divisible; replicate tiny."""
    if arr.shape[0] % mesh.devices.size == 0:
        return jax.lax.with_sharding_constraint(
            arr, NamedSharding(mesh, P(axis, *([None] * (arr.ndim - 1))))
        )
    return arr


def mesh_round_commit_fn(
    field: Monty31,
    sig: tuple,
    log_blowup: int,
    mesh: Mesh,
    axis: str = "rows",
    salt_dims: tuple = (),
):
    """Mesh analog of `ops.jitk.round_commit_fn`: interpolation + LDE +
    Merkle for a whole commit round, rows sharded over the mesh.

    salt_dims: (height, width) per hiding salt matrix — salts skip
    interpolation/LDE and hash straight into the leaves (reference
    `MerkleTreeHidingMmcs`), row-sharded like everything else."""
    key = ("commit", id(mesh), field.name, sig, log_blowup, axis, salt_dims)
    fn = _MESH_FN_CACHE.get(key)
    if fn is not None:
        return fn
    from ..ops.jitk import _power_table  # reuse host twiddle tables
    from ..ops.ntt import bit_reverse_rows, intt, ntt

    p = field.P
    params = poseidon2_params(field, 16)
    pre = []
    for shift, log_n, w in sig:
        n = 1 << log_n
        unscale = (
            None
            if shift == 1
            else _power_table(field, pow(int(shift), p - 2, p), n)
        )
        gpow = _power_table(field, int(field.generator), n)
        pre.append((shift, log_n, w, unscale, gpow))

    def body(*all_mats):
        mats = all_mats[: len(pre)]
        salt_mats = all_mats[len(pre) :]
        coeffs_out = []
        ldes = []
        for (shift, log_n, w, unscale, gpow), evals in zip(pre, mats):
            n = 1 << log_n
            m = n << log_blowup
            evals = _row_sharded(mesh, axis, evals)
            coeffs = intt(field, evals, jnp)
            if unscale is not None:
                coeffs = field.monty_mul(
                    coeffs, jnp.asarray(unscale)[:, None], jnp
                )
            scaled = field.monty_mul(coeffs, jnp.asarray(gpow)[:, None], jnp)
            lde = ntt(field, jnp.pad(scaled, [(0, m - n), (0, 0)]), jnp)
            lde = bit_reverse_rows(lde, jnp)
            lde = _row_sharded(mesh, axis, lde)
            coeffs_out.append(coeffs)
            ldes.append(lde)
        by_height: dict[int, list] = {}
        for l in list(ldes) + [
            _row_sharded(mesh, axis, s) for s in salt_mats
        ]:
            by_height.setdefault(l.shape[0], []).append(l)

        def rows_digest(h):
            rows = jnp.concatenate(by_height[h], axis=1)
            return _row_sharded(mesh, axis, sponge_hash(params, rows, 8, 8, jnp))

        h = max(by_height)
        layer = rows_digest(h)
        layers = [layer]
        while h > 1:
            h //= 2
            layer = compress_pair(params, layer[0::2], layer[1::2], jnp)
            if h in by_height:
                layer = compress_pair(params, layer, rows_digest(h), jnp)
            layers.append(layer)
        return tuple(coeffs_out), tuple(ldes), tuple(layers)

    fn = jax.jit(body)
    _MESH_FN_CACHE[key] = fn
    return fn


def mesh_fold_fn(
    field: Monty31,
    d: int,
    log_size: int,
    shift: int,
    mesh: Mesh,
    axis: str = "rows",
):
    """Mesh analog of `ops.jitk.fri_fold_fn`: one radix-2 β-fold with the
    codeword rows sharded (bitrev pairing keeps pairs shard-local)."""
    key = ("fold", id(mesh), field.name, d, log_size, shift, axis)
    fn = _MESH_FN_CACHE.get(key)
    if fn is not None:
        return fn
    from ..fields.extension import ext_field
    from ..stark.fri_pcs import _fold_consts

    E = ext_field(field, d)
    _x, inv_2x = _fold_consts(field, log_size, shift)
    inv2 = field.monty_constant(pow(2, field.P - 2, field.P))

    def body(folded, beta):
        folded = _row_sharded(mesh, axis, folded)
        a = folded[0::2]
        b = folded[1::2]
        s = E.add(a, b, jnp)
        dd = E.sub(a, b, jnp)
        even = field.monty_mul(s, jnp.asarray(inv2), jnp)
        odd = E.mul_base(dd, jnp.asarray(inv_2x), jnp)
        out = E.add(
            even, E.mul(odd, jnp.broadcast_to(beta, odd.shape), jnp), jnp
        )
        return _row_sharded(mesh, axis, out)

    fn = jax.jit(body)
    _MESH_FN_CACHE[key] = fn
    return fn

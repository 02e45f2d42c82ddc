"""Sponge / compression wrappers over the batched Poseidon2 permutation.

TPU-native equivalent of the reference's upstream `p3-symmetric`
(SURVEY.md §2.6): `PaddingFreeSponge<P, W, R, OUT>` for leaf hashing and
`TruncatedPermutation<P, 2, CHUNK, W>` for 2-to-1 Merkle compression.
Everything is batched over a leading N dimension — one call hashes N rows.
"""

from __future__ import annotations

import numpy as np

from .poseidon2 import Poseidon2Params, permute
from ..fields.monty31 import U32


def sponge_hash(params: Poseidon2Params, rows, rate: int, out: int, xp):
    """PaddingFreeSponge: hash (N, L) rows -> (N, out) digests.

    Absorbs `rate`-element chunks by overwriting state[0:rate] and permuting;
    the final partial chunk overwrites only its own length (padding-free).
    """
    n, length = rows.shape
    width = params.width
    if xp is not np:
        from .poseidon2 import _use_pallas

        if _use_pallas():
            from .pallas_poseidon2 import sponge_pallas

            return sponge_pallas(params, rows, rate, out)
    state = xp.zeros((n, width), dtype=U32)
    n_full = length // rate
    if xp is not np and n_full > 1:
        # scan over full chunks: ONE permutation instance in the compiled
        # graph instead of length/rate of them (wide trace matrices absorb
        # 30-60 chunks; unrolling them dominated XLA compile time)
        from jax import lax

        full = rows[:, : n_full * rate].reshape(n, n_full, rate)
        full = xp.moveaxis(full, 1, 0)  # (n_full, n, rate)

        def absorb(st, chunk):
            st = st.at[:, :rate].set(chunk)
            return permute(params, st, xp), None

        state, _ = lax.scan(absorb, state, full)
        start = n_full * rate
        if start < length:
            chunk = rows[:, start:]
            state = state.at[:, : chunk.shape[1]].set(chunk)
            state = permute(params, state, xp)
        return state[:, :out]
    for start in range(0, length, rate):
        chunk = rows[:, start : start + rate]
        c = chunk.shape[1]
        if xp is np:
            state = state.copy()
            state[:, :c] = chunk
        else:
            state = state.at[:, :c].set(chunk)
        state = permute(params, state, xp)
    return state[:, :out]


def merkle_layers(params, leaf, xp, inject=None, unroll: int = 4):
    """All digest layers of a 2-to-1 Merkle tree over `leaf` (N, 8).

    inject: optional {height: digest rows (height, 8)} — when the chain
    reaches `height`, the level is re-compressed with the injected digest
    (mixed-height matrix batches).  Returns [leaf, ..., root layer].

    jnp path: levels with injections (and the first `unroll` levels) are
    emitted individually; the remaining pure 2-to-1 tail runs as ONE
    `lax.scan` over a fixed-size buffer (prefix-valid, zero-padded) — one
    compiled permutation instance instead of one per level.  The padded
    tail costs ~log2(N)/2^(unroll+1)·N extra permutations (~50% of true
    tree work at unroll=4); results are bit-identical."""
    inject = inject or {}
    layers = [leaf]
    layer = leaf
    h = layer.shape[0]
    emitted = 0
    while h > 1 and (
        xp is np
        or emitted < unroll
        or any(k < h for k in inject)
    ):
        h //= 2
        layer = compress_pair(params, layer[0::2], layer[1::2], xp)
        if h in inject:
            layer = compress_pair(params, layer, inject[h], xp)
        layers.append(layer)
        emitted += 1
    if h > 1:
        from jax import lax

        m = layer.shape[0]
        steps = m.bit_length() - 1

        def step(buf, _):
            c = compress_pair(params, buf[0::2], buf[1::2], xp)
            nb = xp.concatenate([c, xp.zeros_like(c)], axis=0)
            return nb, c

        _fin, cs = lax.scan(step, layer, None, length=steps)
        for j in range(steps):
            layers.append(cs[j][: m >> (j + 1)])
    return layers


def compress_pair(params: Poseidon2Params, left, right, xp):
    """TruncatedPermutation 2-to-1: (N, chunk) x (N, chunk) -> (N, chunk)."""
    chunk = left.shape[-1]
    width = params.width
    assert 2 * chunk <= width
    state = xp.concatenate(
        [left, right]
        + (
            [xp.zeros(left.shape[:-1] + (width - 2 * chunk,), dtype=U32)]
            if 2 * chunk < width
            else []
        ),
        axis=-1,
    )
    return permute(params, state, xp)[..., :chunk]

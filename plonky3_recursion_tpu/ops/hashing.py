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
    state = xp.zeros((n, width), dtype=U32)
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

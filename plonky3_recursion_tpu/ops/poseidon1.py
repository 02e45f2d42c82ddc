"""Classic Poseidon (Poseidon1) permutation over Monty31 fields.

TPU-native equivalent of the reference's upstream `p3-poseidon1`
(SURVEY.md §2.6) — the second hash family the recursion stack supports
(`poseidon1-circuit-air/`, hash-agnostic perm dispatch §2.1).  Classic
HADES structure: RF full rounds (S-box on every lane) + RP partial rounds
(lane 0 only), each round adding per-lane constants then applying a dense
MDS matrix.

Parameters derive deterministically like Poseidon2's (SHA-256 counter
mode); the MDS matrix is a Cauchy matrix 1/(x_i + y_j) over distinct
sampled points (always invertible/MDS over a prime field).
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

from ..fields.monty31 import Monty31, U32
from .poseidon2 import _field_elements_from_seed, _sbox_monty

_ROUND_NUMBERS = {
    # (field, width) -> (full, partial): classic Poseidon needs more partial
    ("koala_bear", 16): (8, 22),
    ("koala_bear", 24): (8, 22),
    ("baby_bear", 16): (8, 14),
    ("baby_bear", 24): (8, 22),
}


@dataclasses.dataclass(frozen=True)
class Poseidon1Params:
    field: Monty31
    width: int
    full_rounds: int
    partial_rounds: int
    rc: np.ndarray  # (full+partial, width) canonical (partial rows use col 0)
    mds: np.ndarray  # (width, width) canonical

    @functools.cached_property
    def mds_m(self) -> np.ndarray:
        return self.field.monty_array(self.mds)

    @functools.cached_property
    def rc_m(self) -> np.ndarray:
        return self.field.monty_array(self.rc)


@functools.lru_cache(maxsize=None)
def poseidon1_params(field: Monty31, width: int) -> Poseidon1Params:
    rf, rp = _ROUND_NUMBERS[(field.name, width)]
    tag = f"plonky3_recursion_tpu/poseidon1/{field.name}/w{width}"
    rc = _field_elements_from_seed(field, tag + "/rc", (rf + rp) * width).reshape(
        rf + rp, width
    )
    # Cauchy MDS: m[i][j] = 1/(x_i + y_j) with all x_i + y_j distinct nonzero
    attempt = 0
    p = field.P
    while True:
        pts = _field_elements_from_seed(field, f"{tag}/mds/{attempt}", 2 * width)
        xs, ys = [int(v) for v in pts[:width]], [int(v) for v in pts[width:]]
        sums = [(x + y) % p for x in xs for y in ys]
        if 0 not in sums and len(set(xs)) == width and len(set(ys)) == width:
            break
        attempt += 1
    mds = np.asarray(
        [[pow((x + y) % p, p - 2, p) for y in ys] for x in xs],
        dtype=np.uint64,
    ).astype(U32)
    return Poseidon1Params(field, width, rf, rp, rc, mds)


def _mds_apply(F: Monty31, state_m, mds_m, xp):
    """Dense matrix-vector product over Monty-form state: (..., w)."""
    # out_i = Σ_j mds[i][j]·s_j — per output lane a weighted mod-sum
    outs = []
    w = state_m.shape[-1]
    for i in range(w):
        acc = F.monty_mul(state_m[..., 0], mds_m[i, 0], xp)
        for j in range(1, w):
            acc = F.add(acc, F.monty_mul(state_m[..., j], mds_m[i, j], xp), xp)
        outs.append(acc)
    return xp.stack(outs, axis=-1)


def permute(params: Poseidon1Params, state, xp):
    """Classic Poseidon permutation, batched over leading dims."""
    F = params.field
    deg = F.sbox_degree
    rf2 = params.full_rounds // 2
    rp = params.partial_rounds
    mds_m = xp.asarray(params.mds_m)
    rc_m = xp.asarray(params.rc_m)
    sm = F.to_monty(state, xp)

    def full_round(sm, r):
        sm = F.add(sm, rc_m[r], xp)
        sm = _sbox_monty(F, sm, deg, xp)
        return _mds_apply(F, sm, mds_m, xp)

    def partial_round(sm, r):
        s0 = _sbox_monty(F, F.add(sm[..., 0], rc_m[r, 0], xp), deg, xp)
        if xp is np:
            sm = sm.copy()
            sm[..., 0] = s0
        else:
            sm = sm.at[..., 0].set(s0)
        return _mds_apply(F, sm, mds_m, xp)

    r = 0
    for _ in range(rf2):
        sm = full_round(sm, r)
        r += 1
    for _ in range(rp):
        sm = partial_round(sm, r)
        r += 1
    for _ in range(rf2):
        sm = full_round(sm, r)
        r += 1
    return F.from_monty(sm, xp)


def permute_with_rows(params: Poseidon1Params, states, xp):
    """Batched permutation capturing every round state: (N, w) ->
    (N, 1 + RF + RP, w); row 0 = input, last row = output (classic
    Poseidon has no initial linear layer)."""
    F = params.field
    deg = F.sbox_degree
    rf2 = params.full_rounds // 2
    mds_m = xp.asarray(params.mds_m)
    rc_m = xp.asarray(params.rc_m)
    rows = [states]
    sm = F.to_monty(states, xp)

    def emit(sm):
        rows.append(F.from_monty(sm, xp))

    r = 0
    for _ in range(rf2):
        sm = _mds_apply(
            F, _sbox_monty(F, F.add(sm, rc_m[r], xp), deg, xp), mds_m, xp
        )
        emit(sm)
        r += 1
    for _ in range(params.partial_rounds):
        s0 = _sbox_monty(F, F.add(sm[..., 0], rc_m[r, 0], xp), deg, xp)
        if xp is np:
            sm = sm.copy()
            sm[..., 0] = s0
        else:
            sm = sm.at[..., 0].set(s0)
        sm = _mds_apply(F, sm, mds_m, xp)
        emit(sm)
        r += 1
    for _ in range(rf2):
        sm = _mds_apply(
            F, _sbox_monty(F, F.add(sm, rc_m[r], xp), deg, xp), mds_m, xp
        )
        emit(sm)
        r += 1
    return xp.stack(rows, axis=1)


def permute_scalar(params: Poseidon1Params, state_ints):
    """Python-int reference for golden tests."""
    F = params.field
    p = F.P
    w = params.width
    deg = F.sbox_degree
    s = [int(x) % p for x in state_ints]

    def mds(s):
        return [
            sum(int(params.mds[i][j]) * s[j] for j in range(w)) % p
            for i in range(w)
        ]

    rf2 = params.full_rounds // 2
    r = 0
    for _ in range(rf2):
        s = mds([pow((x + int(params.rc[r][i])) % p, deg, p) for i, x in enumerate(s)])
        r += 1
    for _ in range(params.partial_rounds):
        s = mds([pow((s[0] + int(params.rc[r][0])) % p, deg, p)] + s[1:])
        r += 1
    for _ in range(rf2):
        s = mds([pow((x + int(params.rc[r][i])) % p, deg, p) for i, x in enumerate(s)])
        r += 1
    return s

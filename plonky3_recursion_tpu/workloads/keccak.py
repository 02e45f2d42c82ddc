"""Keccak-f[1600] AIR: the uni-stark base workload of `recursive_keccak`.

TPU-native equivalent of the reference's upstream `p3-keccak-air`
(SURVEY.md §2.6), redesigned bit-plane style: each permutation occupies 25
rows (one per round + an output row) of fully bit-valued columns —

  a[x][y][z]    1600 cols   state bits at the start of the round
  c[x][z]        320 cols   θ column parities (committed)
  a1[x][y][z]   1600 cols   state after θ  (committed)
  a2[x][y][z]   1600 cols   state after ρ/π/χ (committed; ι folds into
                            the gated transition)

Constraints (all degree ≤ 3):
  booleanity        a·(a−1) = 0, c·(c−1) = 0, a1·(a1−1) = 0
  θ parity          (s5−c)(s5−c−2)(s5−c−4) = 0,  s5 = Σ_y a[x][y][z]
  θ apply           (s3−a1)(s3−a1−2) = 0,
                    s3 = a[x][y][z] + c[x−1][z] + c[x+1][z−1]
  ρ/π/χ             a2[X][Y][z] = B ⊕ (¬B₁ ∧ B₂)   (B from rotated a1)
  ι + transition    sel_round·(next_a − a2 ⊕ rc_bit) = 0
                    (rc bits are preprocessed; only lane (0,0) has them)

Zero padding rows satisfy every ungated constraint, so blocks need no
power-of-two alignment.  Preprocessed per row: 64 ι round-constant bit
columns + the sel_round transition gate.
"""

from __future__ import annotations

import numpy as np

from ..fields.monty31 import U32
from ..stark.symbolic import Air, Var

ROUNDS = 24
ROWS_PER_PERM = ROUNDS + 1  # + output row

RC = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
    0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
    0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
    0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
    0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
    0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
    0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]

# rho rotation offsets r[x][y]
RHO = [
    [0, 36, 3, 41, 18],
    [1, 44, 10, 45, 2],
    [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56],
    [27, 20, 39, 8, 14],
]

# column layout
N_A = 1600
OFF_A = 0
OFF_C = N_A
OFF_A1 = OFF_C + 320
OFF_A2 = OFF_A1 + N_A
MAIN_WIDTH = OFF_A2 + N_A  # 5120
# preprocessed: 64 rc bits + sel_round
P_RC = 0
P_SEL = 64
PREP_WIDTH = 65


def _a_idx(x, y, z):
    return OFF_A + ((x * 5 + y) * 64 + z)


def _c_idx(x, z):
    return OFF_C + (x * 64 + z)


def _a1_idx(x, y, z):
    return OFF_A1 + ((x * 5 + y) * 64 + z)


def _a2_idx(x, y, z):
    return OFF_A2 + ((x * 5 + y) * 64 + z)


class KeccakAir(Air):
    width_main = MAIN_WIDTH
    width_prep = PREP_WIDTH
    num_publics = 0

    def eval(self, b):
        a = lambda x, y, z: b.main_local[_a_idx(x, y, z)]  # noqa: E731
        c = lambda x, z: b.main_local[_c_idx(x, z)]  # noqa: E731
        a1 = lambda x, y, z: b.main_local[_a1_idx(x, y, z)]  # noqa: E731
        a2 = lambda x, y, z: b.main_local[_a2_idx(x, y, z)]  # noqa: E731
        sel = Var("preprocessed", P_SEL, 0)
        for x in range(5):
            for z in range(64):
                # booleanity + θ parity for c
                cc = c(x, z)
                b.assert_zero(cc * (cc - 1))
                s5 = a(x, 0, z)
                for y in range(1, 5):
                    s5 = s5 + a(x, y, z)
                t = s5 - cc
                b.assert_zero(t * (t - 2) * (t - 4))
        for x in range(5):
            for y in range(5):
                for z in range(64):
                    av = a(x, y, z)
                    b.assert_zero(av * (av - 1))
                    v1 = a1(x, y, z)
                    b.assert_zero(v1 * (v1 - 1))
                    # θ apply: a1 = a ⊕ c[x−1][z] ⊕ c[x+1][z−1]
                    s3 = av + c((x - 1) % 5, z) + c((x + 1) % 5, (z - 1) % 64)
                    t = s3 - v1
                    b.assert_zero(t * (t - 2))
        # ρ/π: B[X][Y][z] = a1[x][y][(z - RHO[x][y]) % 64], (X,Y)=(y,2x+3y)
        def B(X, Y, z):
            # invert π: find (x,y) with y=X, (2x+3y)%5 == Y
            y = X
            x = ((Y - 3 * y) * 3) % 5  # 2x ≡ Y-3y → x ≡ 3(Y-3y) (2·3≡1 mod 5)
            return a1(x, y, (z - RHO[x][y]) % 64)

        for X in range(5):
            for Y in range(5):
                for z in range(64):
                    bb = B(X, Y, z)
                    b1 = B((X + 1) % 5, Y, z)
                    b2 = B((X + 2) % 5, Y, z)
                    andn = (1 - b1) * b2
                    chi = bb + andn - 2 * (bb * andn)
                    b.assert_zero(a2(X, Y, z) - chi)
        # ι + transition (gated): next_a = a2 ⊕ rc (lane (0,0) only)
        for x in range(5):
            for y in range(5):
                for z in range(64):
                    nxt = b.main_next[_a_idx(x, y, z)]
                    v2 = a2(x, y, z)
                    if x == 0 and y == 0:
                        rc = Var("preprocessed", P_RC + z, 0)
                        v2 = v2 + rc - 2 * (v2 * rc)
                    b.assert_zero(sel * (nxt - v2))


def _bits(lane: int) -> list:
    return [(lane >> z) & 1 for z in range(64)]


def keccak_f_rounds(state: list) -> list:
    """Python-int Keccak-f[1600]; returns per-round snapshots:
    [(a, c, a1, a2)] for each of the 24 rounds, plus the final state."""
    A = [row[:] for row in state]  # A[x][y] lanes
    M = (1 << 64) - 1

    def rot(v, n):
        return ((v << n) | (v >> (64 - n))) & M

    snaps = []
    for rnd in range(ROUNDS):
        a_snap = [row[:] for row in A]
        C = [A[x][0] ^ A[x][1] ^ A[x][2] ^ A[x][3] ^ A[x][4] for x in range(5)]
        D = [C[(x - 1) % 5] ^ rot(C[(x + 1) % 5], 1) for x in range(5)]
        A1 = [[A[x][y] ^ D[x] for y in range(5)] for x in range(5)]
        Bm = [[0] * 5 for _ in range(5)]
        for x in range(5):
            for y in range(5):
                Bm[y][(2 * x + 3 * y) % 5] = rot(A1[x][y], RHO[x][y])
        A2 = [
            [
                Bm[x][y] ^ ((~Bm[(x + 1) % 5][y]) & Bm[(x + 2) % 5][y] & M)
                for y in range(5)
            ]
            for x in range(5)
        ]
        snaps.append((a_snap, C, A1, A2))
        A = [row[:] for row in A2]
        A[0][0] ^= RC[rnd]
    return snaps, A


def keccak_f_trace(states: list) -> np.ndarray:
    """Trace rows for a list of input states (each 5x5 python-int lanes)."""
    rows = []
    for state in states:
        snaps, final = keccak_f_rounds(state)
        for a_s, C, A1, A2 in snaps:
            row = np.zeros(MAIN_WIDTH, dtype=U32)
            for x in range(5):
                for y in range(5):
                    row[
                        _a_idx(x, y, 0) : _a_idx(x, y, 0) + 64
                    ] = _bits(a_s[x][y])
                    row[
                        _a1_idx(x, y, 0) : _a1_idx(x, y, 0) + 64
                    ] = _bits(A1[x][y])
                    row[
                        _a2_idx(x, y, 0) : _a2_idx(x, y, 0) + 64
                    ] = _bits(A2[x][y])
                row[_c_idx(x, 0) : _c_idx(x, 0) + 64] = _bits(C[x])
            rows.append(row)
        # output row: final state only (c/a1/a2 stay zero? they must satisfy
        # the ungated constraints — fill them honestly from the final state)
        row = np.zeros(MAIN_WIDTH, dtype=U32)
        snaps2, _ = keccak_f_rounds(final)
        a_s, C, A1, A2 = snaps2[0]
        for x in range(5):
            for y in range(5):
                row[_a_idx(x, y, 0) : _a_idx(x, y, 0) + 64] = _bits(a_s[x][y])
                row[_a1_idx(x, y, 0) : _a1_idx(x, y, 0) + 64] = _bits(A1[x][y])
                row[_a2_idx(x, y, 0) : _a2_idx(x, y, 0) + 64] = _bits(A2[x][y])
            row[_c_idx(x, 0) : _c_idx(x, 0) + 64] = _bits(C[x])
        rows.append(row)
    trace = np.stack(rows)
    n = trace.shape[0]
    target = 1 << max((n - 1).bit_length(), 2)
    return np.pad(trace, [(0, target - n), (0, 0)])


def keccak_preprocessed(n_perms: int, height: int | None = None) -> np.ndarray:
    rows = n_perms * ROWS_PER_PERM
    if height is None:
        height = 1 << max((rows - 1).bit_length(), 2)
    prep = np.zeros((height, PREP_WIDTH), dtype=U32)
    for p in range(n_perms):
        base = p * ROWS_PER_PERM
        for rnd in range(ROUNDS):
            prep[base + rnd, P_RC : P_RC + 64] = _bits(RC[rnd])
            prep[base + rnd, P_SEL] = 1
    return prep

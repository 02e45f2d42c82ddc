"""Poseidon2 permutation NPO: circuit plugin + table AIR + trace builder.

TPU-native equivalent of the reference's Poseidon2 perm NPO + circuit AIR
(`circuit/src/ops/poseidon2_perm/`, `poseidon2-circuit-air/`;
SURVEY.md §2.1/§2.3), redesigned tall-and-narrow for the VPU: one trace row
per ROUND (16 state + 16 S-box main columns) instead of the reference's
wide one-row-per-permutation layout.  Heights are cheap on TPU and the
committed S-box columns keep every constraint at degree ≤ 3 (KoalaBear
x^3 S-box), so this table folds into the same qdeg=2 quotient as the
primitive chips.

Block layout per permutation (2 + RF + RP rows):
  row 0                raw input state          (bus receives 4 ext limbs)
  row 1                after the initial M_E    (sel_me transition)
  rows 2..             one row per round        (sel_ext / sel_int)
  last row             permutation output       (bus sends 4 ext limbs)

Constraints:
  sbox[j] = (state[j] + rc[j])^3                (ungated, degree 3)
  sel_me ·(next[j] − M_E(state)[j])             (degree 2)
  sel_ext·(next[j] − M_E(sbox)[j])              (degree 2)
  sel_int·(next[j] − (diag_j·L_j + Σ_k L_k)),   L = [sbox[0], state[1:]]

Bus: one set of 4 idx + 4 mult preprocessed columns serves both row-0
receives and last-row sends (zero elsewhere).
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

from ..fields.monty31 import U32
from ..ops.poseidon2 import (
    Poseidon2Params,
    permute,
    permute_with_rows,
    poseidon2_params,
)
from ..stark.lookups import Interaction, Lookup
from ..stark.symbolic import Air, Var
from .airs import BUS

WIDTH = 16
MAIN_WIDTH = 2 * WIDTH  # state | sbox
# preprocessed layout
P_RC = 0  # 16 cols of round constants
P_SEL_ME = 16  # initial external-linear-layer transition
P_SEL_EXT = 17  # external round transition
P_SEL_INT = 18  # internal round transition
P_IO_IDX = 19  # 4 cols: D-scaled bus indices (row0: inputs, last: outputs)
P_IO_MULT = 23  # 4 cols: signed multiplicities
PREP_WIDTH = 27


def _m4_exprs(c):
    x0, x1, x2, x3 = c
    return [
        2 * x0 + 3 * x1 + x2 + x3,
        x0 + 2 * x1 + 3 * x2 + x3,
        x0 + x1 + 2 * x2 + 3 * x3,
        3 * x0 + x1 + x2 + 2 * x3,
    ]


def _ext_layer_exprs(state):
    chunks = [_m4_exprs(state[i : i + 4]) for i in range(0, WIDTH, 4)]
    sums = []
    for j in range(4):
        s = chunks[0][j]
        for g in range(1, WIDTH // 4):
            s = s + chunks[g][j]
        sums.append(s)
    return [chunks[g][j] + sums[j] for g in range(WIDTH // 4) for j in range(4)]


class Poseidon2TableAir(Air):
    width_main = MAIN_WIDTH
    width_prep = PREP_WIDTH
    num_publics = 0

    def __init__(self, params: Poseidon2Params, d: int):
        assert params.field.sbox_degree == 3, (
            "row-per-round AIR requires a cubic S-box (KoalaBear); "
            "BabyBear needs a register-split S-box table (future work)"
        )
        assert params.width == WIDTH
        self.params = params
        self.d = d

    def cache_key(self):
        return (type(self).__name__, self.params.field.name, self.d)

    def eval(self, b):
        cur = b.main_local[:WIDTH]
        sb = b.main_local[WIDTH:]
        nxt = b.main_next[:WIDTH]
        rc = [Var("preprocessed", P_RC + j, 0) for j in range(WIDTH)]
        sel_me = Var("preprocessed", P_SEL_ME, 0)
        sel_ext = Var("preprocessed", P_SEL_EXT, 0)
        sel_int = Var("preprocessed", P_SEL_INT, 0)
        # S-box columns (ungated; padding rows satisfy 0 = 0^3)
        for j in range(WIDTH):
            t = cur[j] + rc[j]
            b.assert_zero(sb[j] - t * t * t)
        me_cur = _ext_layer_exprs(cur)
        me_sb = _ext_layer_exprs(sb)
        lanes = [sb[0]] + list(cur[1:])
        total = lanes[0]
        for x in lanes[1:]:
            total = total + x
        diag = self.params.diag
        out_int = [lanes[j] * int(diag[j]) + total for j in range(WIDTH)]
        for j in range(WIDTH):
            b.assert_zero(sel_me * (nxt[j] - me_cur[j]))
            b.assert_zero(sel_ext * (nxt[j] - me_sb[j]))
            b.assert_zero(sel_int * (nxt[j] - out_int[j]))

    def lookups(self):
        d = self.d
        assert 4 * d == WIDTH, "io tuple layout assumes D*4 == width"
        inters = []
        for j in range(4):
            inters.append(
                Interaction(
                    [Var("preprocessed", P_IO_IDX + j, 0)]
                    + [Var("main", 4 * j + k, 0) for k in range(d)],
                    Var("preprocessed", P_IO_MULT + j, 0),
                )
            )
        return [Lookup(BUS, inters)]


class Poseidon2Npo:
    """Circuit plugin + prover plugin for the Poseidon2 permutation NPO.

    I/O: 4 extension inputs -> 4 extension outputs (the D=4 view of the
    16-wide base permutation, `book/.../hashing.md:40-58`)."""

    def __init__(self, params: Poseidon2Params, d: int = 4):
        self.params = params
        self.d = d
        self.type_id = f"poseidon2_perm/{params.field.name}_d{d}_w{params.width}"

    # ----- circuit-side plugin API -----

    def num_outputs(self, config, inputs) -> int:
        assert len(inputs) == 4
        return 4

    def execute(self, config, input_values, private_data):
        state = np.concatenate(input_values).astype(U32)
        out = permute(self.params, state[None, :], np)[0]
        outs = [out[4 * j : 4 * j + 4] for j in range(4)]
        return outs, state

    def execute_batch(self, states: "np.ndarray"):
        """Vectorized executor: (k, 16) input states -> ((k, 4, 4) ext
        outputs, per-call records).  Uses the C++ permutation when the
        native library is available."""
        states = states.astype(U32)
        native = self._native_perm()
        if native is not None:
            outs = native.permute(states)
        else:
            outs = permute(self.params, states, np)
        return outs.reshape(-1, 4, self.d), [s for s in states]

    def _native_perm(self):
        if not hasattr(self, "_np_perm"):
            try:
                from ..native import NativePoseidon2

                self._np_perm = NativePoseidon2(self.params)
            except Exception:
                self._np_perm = None
        return self._np_perm

    # ----- prover-side plugin API -----

    @property
    def rows_per_perm(self) -> int:
        return 2 + self.params.full_rounds + self.params.partial_rounds

    def table_air(self) -> Poseidon2TableAir:
        return Poseidon2TableAir(self.params, self.d)

    def _rc_block(self) -> np.ndarray:
        """(rows_per_perm, WIDTH) round-constant pattern of one block."""
        rpp = self.rows_per_perm
        rf2 = self.params.full_rounds // 2
        rc = np.zeros((rpp, WIDTH), dtype=U32)
        r = 1  # row 0 = input (no rc), row 1 = after M_E
        for e in range(rf2):
            rc[r] = self.params.rc_ext[e]
            r += 1
        for i in range(self.params.partial_rounds):
            rc[r, 0] = self.params.rc_int[i]
            r += 1
        for e in range(rf2, self.params.full_rounds):
            rc[r] = self.params.rc_ext[e]
            r += 1
        assert r == rpp - 1  # last row applies no round
        # rc on row r is consumed by the transition LEAVING row r: the
        # post-M_E row (row 1) carries rc_ext[0], and so on.
        return rc

    def build_prep(self, calls, min_height: int) -> np.ndarray:
        F = self.params.field
        rpp = self.rows_per_perm
        rf2 = self.params.full_rounds // 2
        block = np.zeros((rpp, PREP_WIDTH), dtype=U32)
        block[:, P_RC : P_RC + WIDTH] = self._rc_block()
        block[0, P_SEL_ME] = 1
        r = 1
        for _ in range(rf2):
            block[r, P_SEL_EXT] = 1
            r += 1
        for _ in range(self.params.partial_rounds):
            block[r, P_SEL_INT] = 1
            r += 1
        for _ in range(rf2, self.params.full_rounds):
            block[r, P_SEL_EXT] = 1
            r += 1
        assert r == rpp - 1
        prep = np.zeros((len(calls) * rpp, PREP_WIDTH), dtype=U32)
        for ci, call in enumerate(calls):
            base = ci * rpp
            prep[base : base + rpp] = block
            for j in range(4):
                prep[base, P_IO_IDX + j] = call.inputs[j] * self.d
                prep[base, P_IO_MULT + j] = call.in_mults[j] % F.P
                prep[base + rpp - 1, P_IO_IDX + j] = call.outputs[j] * self.d
                prep[base + rpp - 1, P_IO_MULT + j] = call.out_mults[j] % F.P
        from .batch_prover import _pad_pow2

        return _pad_pow2(prep, min_height)

    def build_main(self, calls, records, min_height: int) -> np.ndarray:
        """Trace from runner records: records[i] = input state (16,) for
        call i, in call order."""
        from .batch_prover import _pad_pow2

        F = self.params.field
        if not records:
            return np.zeros((min_height, MAIN_WIDTH), dtype=U32)
        states = np.stack(records).astype(U32)
        rows = permute_with_rows(self.params, states, np)  # (n, rpp, 16)
        n_perms, rpp, w = rows.shape
        assert rpp == self.rows_per_perm
        flat = rows.reshape(n_perms * rpp, w)
        rc = np.tile(self._rc_block(), (n_perms, 1))
        t = F.add(flat, rc, np)
        sbox = F.mul(F.mul(t, t, np), t, np)
        return _pad_pow2(np.concatenate([flat, sbox], axis=1), min_height)


@functools.lru_cache(maxsize=None)
def koala_bear_poseidon2_npo() -> Poseidon2Npo:
    from ..fields import KOALA_BEAR

    return Poseidon2Npo(poseidon2_params(KOALA_BEAR, WIDTH), d=4)

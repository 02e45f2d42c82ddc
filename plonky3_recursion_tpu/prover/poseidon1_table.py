"""Poseidon1 (classic Poseidon) permutation NPO + table AIR.

TPU-native equivalent of the reference's `p3-poseidon1-circuit-air` +
Poseidon1 perm NPO (`circuit/src/ops/poseidon1_perm/`; SURVEY.md §2.1/
§2.3) in the same tall-and-narrow shape as the Poseidon2 table: one row per
round (16 state + 16 committed S-box columns), classic HADES transitions
with the dense MDS matrix folded into the constraints.

Block layout per permutation (1 + RF + RP rows — classic Poseidon has no
initial external linear layer):
  row 0        raw input (bus receives 4 ext limbs)
  rows 1..     one row per round (sel_full / sel_part)
  last row     output (bus sends 4 ext limbs)

Constraints (degree ≤ 3):
  sbox[j] = (state[j] + rc[j])^3           (ungated)
  sel_full·(next[i] − Σ_j mds[i][j]·sbox[j])
  sel_part·(next[i] − Σ_j mds[i][j]·L[j]),  L = [sbox[0], state[1:]]

Together with the Poseidon2 table this provides the reference's
hash-agnostic perm dispatch: the circuit challenger and MMCS gadget take
any NPO type id with the 4-ext-limb I/O shape (`PermConfig`,
`circuit/src/ops/perm.rs:19`).
"""

from __future__ import annotations

import functools

import numpy as np

from ..fields.monty31 import U32
from ..ops.poseidon1 import (
    Poseidon1Params,
    permute,
    permute_with_rows,
    poseidon1_params,
)
from ..stark.lookups import Interaction, Lookup
from ..stark.symbolic import Air, Var
from .airs import BUS

WIDTH = 16
MAIN_WIDTH = 2 * WIDTH
P_RC = 0
P_SEL_FULL = 16
P_SEL_PART = 17
P_IO_IDX = 18
P_IO_MULT = 22
PREP_WIDTH = 26


class Poseidon1TableAir(Air):
    width_main = MAIN_WIDTH
    width_prep = PREP_WIDTH
    num_publics = 0

    def __init__(self, params: Poseidon1Params, d: int):
        assert params.field.sbox_degree == 3, (
            "row-per-round AIR requires a cubic S-box"
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
        sel_full = Var("preprocessed", P_SEL_FULL, 0)
        sel_part = Var("preprocessed", P_SEL_PART, 0)
        for j in range(WIDTH):
            t = cur[j] + rc[j]
            b.assert_zero(sb[j] - t * t * t)
        mds = self.params.mds
        lanes = [sb[0]] + list(cur[1:])
        for i in range(WIDTH):
            full_i = None
            part_i = None
            for j in range(WIDTH):
                m = int(mds[i][j])
                tf = sb[j] * m
                tp = lanes[j] * m
                full_i = tf if full_i is None else full_i + tf
                part_i = tp if part_i is None else part_i + tp
            b.assert_zero(sel_full * (nxt[i] - full_i))
            b.assert_zero(sel_part * (nxt[i] - part_i))

    def lookups(self):
        d = self.d
        assert 4 * d == WIDTH
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


class Poseidon1Npo:
    """Circuit + prover plugin for the classic-Poseidon permutation NPO."""

    def __init__(self, params: Poseidon1Params, d: int = 4):
        self.params = params
        self.d = d
        self.type_id = f"poseidon1_perm/{params.field.name}_d{d}_w{params.width}"

    def num_outputs(self, config, inputs) -> int:
        assert len(inputs) == 4
        return 4

    def execute(self, config, input_values, private_data):
        state = np.concatenate(input_values).astype(U32)
        out = permute(self.params, state[None, :], np)[0]
        return [out[4 * j : 4 * j + 4] for j in range(4)], state

    def execute_batch(self, states: "np.ndarray"):
        """Vectorized executor: (k, 16) input states -> ((k, 4, 4) ext
        outputs, per-call records)."""
        outs = permute(self.params, states.astype(U32), np)
        return outs.reshape(-1, 4, self.d), [s for s in states]

    @property
    def rows_per_perm(self) -> int:
        return 1 + self.params.full_rounds + self.params.partial_rounds

    def table_air(self) -> Poseidon1TableAir:
        return Poseidon1TableAir(self.params, self.d)

    def _rc_block(self) -> np.ndarray:
        rpp = self.rows_per_perm
        rf2 = self.params.full_rounds // 2
        rc = np.zeros((rpp, WIDTH), dtype=U32)
        r = 0
        for e in range(rf2):
            rc[r] = self.params.rc[e]
            r += 1
        for i in range(self.params.partial_rounds):
            rc[r, 0] = self.params.rc[rf2 + i][0]
            r += 1
        for e in range(rf2):
            rc[r] = self.params.rc[rf2 + self.params.partial_rounds + e]
            r += 1
        assert r == rpp - 1
        return rc

    def build_prep(self, calls, min_height: int) -> np.ndarray:
        F = self.params.field
        rpp = self.rows_per_perm
        rf2 = self.params.full_rounds // 2
        block = np.zeros((rpp, PREP_WIDTH), dtype=U32)
        block[:, P_RC : P_RC + WIDTH] = self._rc_block()
        r = 0
        for _ in range(rf2):
            block[r, P_SEL_FULL] = 1
            r += 1
        for _ in range(self.params.partial_rounds):
            block[r, P_SEL_PART] = 1
            r += 1
        for _ in range(rf2):
            block[r, P_SEL_FULL] = 1
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
        from .batch_prover import _pad_pow2

        F = self.params.field
        if not records:
            return np.zeros((min_height, MAIN_WIDTH), dtype=U32)
        states = np.stack(records).astype(U32)
        rows = permute_with_rows(self.params, states, np)
        n_perms, rpp, w = rows.shape
        assert rpp == self.rows_per_perm
        flat = rows.reshape(n_perms * rpp, w)
        rc = np.tile(self._rc_block(), (n_perms, 1))
        t = F.add(flat, rc, np)
        sbox = F.mul(F.mul(t, t, np), t, np)
        return _pad_pow2(np.concatenate([flat, sbox], axis=1), min_height)


@functools.lru_cache(maxsize=None)
def koala_bear_poseidon1_npo() -> Poseidon1Npo:
    from ..fields import KOALA_BEAR

    return Poseidon1Npo(poseidon1_params(KOALA_BEAR, WIDTH), d=4)

"""Poseidon2 permutation NPO: chained circuit plugin + table AIR + traces.

TPU-native equivalent of the reference's Poseidon2 perm NPO + circuit AIR
(`circuit/src/ops/poseidon2_perm/`, `poseidon2-circuit-air/src/air.rs:26-70`,
`poseidon-circuit-cols/src/cols.rs:64-115`; SURVEY.md §2.1/§2.3), redesigned
tall-and-narrow for the VPU: one trace row per ROUND (width state + width
S-box-register main columns per register) instead of the reference's wide
one-row-per-permutation layout.  Heights are cheap on TPU and the committed
S-box columns keep every constraint at degree ≤ 3 (x³ directly; x⁷ via the
two-register split sb1 = t³, sb = sb1²·t — the reference's SBOX_REGISTERS
decomposition).

WIDTH-GENERIC: the same AIR serves the reference's preset family
(`public_types.rs`) — W16 (challenger/MMCS digests), W24 (wide sponges),
W32 (arity-4 compression) — for BabyBear and KoalaBear; the preprocessed
layout offsets are computed from the width.

Chaining (the reference's core circuit-size trick, rebuilt for the
row-per-round layout): consecutive perm calls on one CHAIN occupy adjacent
row blocks, and transition constraints between the last row of block i
(holding the permutation output state) and row 0 of block i+1 (the next
input state) carry sponge state / Merkle running digests **inside the
table**, so intermediate digests never touch the witness bus:

  * sponge chain   — gated per limb: next_in[l] == cur_out[l]
  * merkle chain   — direction bit B (value column) places the running
    digest left (B=0) or right (B=1): the sibling half is prover private
    data written straight into the trace, with NO circuit wires at all
  * index sum      — accumulator column S with S' = 2·S + B' across merkle
    rows reconstructs the leaf index from the direction bits; ONE lookup
    per path binds the final S to the circuit's expected index, replacing
    per-level bit wires (reference `mmcs_index_sum`, `cols.rs:100-115`)

Block layout per permutation (2 + RF + RP rows):
  row 0                raw input state    (bus receives CTL'd limbs; prep
                       flags select chaining/zero for the rest)
  row 1                after the initial M_E  (sel_me transition)
  rows 2..             one row per round      (sel_ext / sel_int)
  last row             permutation output     (bus sends CTL'd limbs + S)
"""

from __future__ import annotations

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

WIDTH = 16  # default (challenger/MMCS) config; the AIR is width-generic
WIDTH_EXT = 4
RATE_EXT = 2


def _sbox_registers(deg: int) -> int:
    if deg == 3:
        return 1
    if deg == 7:
        return 2
    raise ValueError(f"unsupported S-box degree {deg}")


class _Layout:
    """Per-width main/preprocessed column layout.

    Preprocessed per row: [rc × width | sel_me | sel_ext | sel_int |
    io_idx × width_ext | io_mult × width_ext | sum_idx | sum_mult |
    sponge × width_ext | merkle × rate_ext | macc | zerol × width_ext |
    mrow].  The limb CTL column pairs are DUAL-USE: row 0 receives the
    CTL'd input limbs, the last row sends the outputs — one lookup serves
    both directions (fewer LogUp aux columns)."""

    def __init__(self, width: int, d: int, n_sbox: int):
        self.width = width
        self.width_ext = width // d
        # capacity is always 8 base elements (the digest size); Merkle
        # 2-to-1 chaining always works on 8-element digest halves
        self.rate_ext = (width - 8) // d
        self.digest_limbs = 8 // d
        self.n_sbox = n_sbox
        self.col_b = (1 + n_sbox) * width
        self.col_s = self.col_b + 1
        # W32 additionally supports ARITY-4 Merkle chaining (reference
        # arity-4 paths over TruncatedPermutation<_,4,8,32>): a second
        # position bit B2 and the committed product BB = B·B2 make the
        # 4-way placement selectors degree-1
        self.arity4 = width == 32
        if self.arity4:
            self.col_b2 = self.col_s + 1
            self.col_bb = self.col_s + 2
            self.main_width = self.col_bb + 1
        else:
            self.main_width = self.col_s + 1
        o = width
        self.p_sel_me = o
        self.p_sel_ext = o + 1
        self.p_sel_int = o + 2
        o += 3
        self.p_io_idx = o
        o += self.width_ext
        self.p_io_mult = o
        o += self.width_ext
        self.p_sum_idx = o
        self.p_sum_mult = o + 1
        o += 2
        self.p_sponge = o
        o += self.width_ext
        self.p_merkle = o
        o += self.digest_limbs
        self.p_macc = o
        o += 1
        self.p_zerol = o
        o += self.width_ext
        self.p_mrow = o
        o += 1
        if self.arity4:
            self.p_merkle4 = o
            self.p_macc4 = o + 1
            o += 2
        self.prep_width = o


def _m4_exprs(c):
    x0, x1, x2, x3 = c
    return [
        2 * x0 + 3 * x1 + x2 + x3,
        x0 + 2 * x1 + 3 * x2 + x3,
        x0 + x1 + 2 * x2 + 3 * x3,
        3 * x0 + x1 + x2 + 2 * x3,
    ]


def _ext_layer_exprs(state, width: int):
    chunks = [_m4_exprs(state[i : i + 4]) for i in range(0, width, 4)]
    sums = []
    for j in range(4):
        s = chunks[0][j]
        for g in range(1, width // 4):
            s = s + chunks[g][j]
        sums.append(s)
    return [
        chunks[g][j] + sums[j] for g in range(width // 4) for j in range(4)
    ]


class Poseidon2TableAir(Air):
    num_publics = 0

    def __init__(self, params: Poseidon2Params, d: int):
        self.params = params
        self.d = d
        self.n_sbox = _sbox_registers(params.field.sbox_degree)
        self.L = _Layout(params.width, d, self.n_sbox)
        self.col_b = self.L.col_b
        self.col_s = self.L.col_s
        self.width_main = self.L.main_width
        self.width_prep = self.L.prep_width

    def cache_key(self):
        return (
            type(self).__name__,
            self.params.field.name,
            self.params.width,
            self.d,
            "v3",
        )

    def eval(self, b):
        d = self.d
        L = self.L
        width = L.width
        cur = b.main_local[:width]
        sb = b.main_local[self.n_sbox * width : (1 + self.n_sbox) * width]
        nxt = b.main_next[:width]
        bit = b.main_local[self.col_b]
        nxt_bit = b.main_next[self.col_b]
        s_acc = b.main_local[self.col_s]
        nxt_s = b.main_next[self.col_s]
        rc = [Var("preprocessed", j, 0) for j in range(width)]
        sel_me = Var("preprocessed", L.p_sel_me, 0)
        sel_ext = Var("preprocessed", L.p_sel_ext, 0)
        sel_int = Var("preprocessed", L.p_sel_int, 0)
        # --- permutation round structure ---
        if self.n_sbox == 1:
            for j in range(width):
                t = cur[j] + rc[j]
                b.assert_zero(sb[j] - t * t * t)
        else:
            # x⁷ register split: sb1 = t³ then sb = sb1²·t (degree ≤ 3)
            sb1 = b.main_local[width : 2 * width]
            for j in range(width):
                t = cur[j] + rc[j]
                b.assert_zero(sb1[j] - t * t * t)
                b.assert_zero(sb[j] - sb1[j] * sb1[j] * t)
        me_cur = _ext_layer_exprs(cur, width)
        me_sb = _ext_layer_exprs(sb, width)
        lanes = [sb[0]] + list(cur[1:])
        total = lanes[0]
        for x in lanes[1:]:
            total = total + x
        diag = self.params.diag
        out_int = [lanes[j] * int(diag[j]) + total for j in range(width)]
        for j in range(width):
            b.assert_zero(sel_me * (nxt[j] - me_cur[j]))
            b.assert_zero(sel_ext * (nxt[j] - me_sb[j]))
            b.assert_zero(sel_int * (nxt[j] - out_int[j]))
        # --- chaining constraints (cols.rs:64-115, air.rs:1030-1125) ---
        # Direction bit is prover-chosen at runtime: boolean-constrain it.
        b.assert_zero(bit * bit - bit)
        # S vanishes off merkle rows (padding included: zero prep).
        b.assert_zero((1 - Var("preprocessed", L.p_mrow, 0)) * s_acc)
        # S rides unchanged through the block's intra-block transitions.
        intra = sel_me + sel_ext + sel_int
        b.assert_zero(intra * (nxt_s - s_acc))
        # Across a block boundary into a merkle row: S' = 2·S + B'.
        # The chain's first merkle row follows a (forced-S=0) sponge row,
        # so the same constraint initializes S' = B'.
        b.assert_zero(
            Var("preprocessed", L.p_macc, 1) * (nxt_s - 2 * s_acc - nxt_bit)
        )
        # Sponge chaining: gated per limb on the NEXT row's prep flag.
        for l in range(L.width_ext):
            sc = Var("preprocessed", L.p_sponge + l, 1)
            for j in range(d):
                c = l * d + j
                b.assert_zero(sc * (nxt[c] - cur[c]))
            zg = Var("preprocessed", L.p_zerol + l, 0)
            for j in range(d):
                b.assert_zero(zg * cur[l * d + j])
        if L.arity4:
            b2 = b.main_local[L.col_b2]
            nxt_b2 = b.main_next[L.col_b2]
            bb = b.main_local[L.col_bb]
            nxt_bb = b.main_next[L.col_bb]
            b.assert_zero(b2 * b2 - b2)
            b.assert_zero(bb - bit * b2)
            m4g = Var("preprocessed", L.p_merkle4, 1)
            # position indicators from (B, B2, BB) — each degree 1
            inds = [
                 1 - nxt_bit - nxt_b2 + nxt_bb,
                 nxt_bit - nxt_bb,
                 nxt_b2 - nxt_bb,
                 nxt_bb,
            ]
            for q in range(4):
                for i in range(L.digest_limbs):
                    for j in range(d):
                        b.assert_zero(
                            m4g
                            * inds[q]
                            * (
                                nxt[(q * L.digest_limbs + i) * d + j]
                                - cur[i * d + j]
                            )
                        )
            # S' = 4·S + B' + 2·B2' across arity-4 block boundaries
            b.assert_zero(
                Var("preprocessed", L.p_macc4, 1)
                * (nxt_s - 4 * s_acc - nxt_bit - 2 * nxt_b2)
            )
        # Merkle chaining: running digest (rate limbs of cur output) goes
        # left (B'=0) or right (B'=1) in the next row's input; the other
        # half holds the private sibling (unconstrained here, bound by the
        # final root connect).
        for i in range(L.digest_limbs):
            mc = Var("preprocessed", L.p_merkle + i, 1)
            left = mc * (1 - nxt_bit)
            right = mc * nxt_bit
            for j in range(d):
                b.assert_zero(left * (nxt[i * d + j] - cur[i * d + j]))
                b.assert_zero(
                    right
                    * (nxt[(L.digest_limbs + i) * d + j] - cur[i * d + j])
                )

    def lookups(self):
        d = self.d
        L = self.L
        inters = []
        for l in range(L.width_ext):
            inters.append(
                Interaction(
                    [Var("preprocessed", L.p_io_idx + l, 0)]
                    + [Var("main", l * d + j, 0) for j in range(d)],
                    Var("preprocessed", L.p_io_mult + l, 0),
                )
            )
        inters.append(
            Interaction(
                [Var("preprocessed", L.p_sum_idx, 0), Var("main", self.col_s, 0)]
                + [0] * (d - 1),
                Var("preprocessed", L.p_sum_mult, 0),
            )
        )
        return [Lookup(BUS, inters)]


def chain_order(calls) -> list:
    """Row order of perm calls: chains contiguous, in first-appearance
    order, each chain's calls in op order.  The in-table chaining
    constraints bind ADJACENT row blocks, so a chain's blocks must be
    adjacent even when its calls interleave with other chains (e.g. the
    challenger's transcript-long chain vs per-query MMCS chains)."""
    first: dict = {}
    for c in calls:
        key = c.chain if c.chain is not None else ("solo", c.op_id)
        if key not in first:
            first[key] = c.op_id
    return sorted(
        calls,
        key=lambda c: (
            first[c.chain if c.chain is not None else ("solo", c.op_id)],
            c.op_id,
        ),
    )


class Poseidon2Npo:
    """Chained Poseidon2 permutation NPO (circuit plugin + prover plugin).

    Calls go through `CircuitBuilder.perm_call`; per-call records from the
    runner are (input state (width,), direction bit, index sum)."""

    chained = True

    def __init__(self, params: Poseidon2Params, d: int = 4):
        assert params.width % (4 * d) == 0 or params.width % d == 0
        self.params = params
        self.d = d
        self.L = _Layout(
            params.width, d, _sbox_registers(params.field.sbox_degree)
        )
        self.type_id = f"poseidon2_perm/{params.field.name}_d{d}_w{params.width}"

    # ----- circuit/runner plugin API -----

    def permute_states(self, states: np.ndarray) -> np.ndarray:
        states = states.astype(U32)
        native = self._native_perm()
        if native is not None:
            return native.permute(states)
        return permute(self.params, states, np)

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
        """(rows_per_perm, width) round-constant pattern of one block."""
        width = self.params.width
        rpp = self.rows_per_perm
        rf2 = self.params.full_rounds // 2
        rc = np.zeros((rpp, width), dtype=U32)
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
        return rc

    def build_prep(self, calls, min_height: int) -> np.ndarray:
        F = self.params.field
        d = self.d
        L = self.L
        rpp = self.rows_per_perm
        rf2 = self.params.full_rounds // 2
        block = np.zeros((rpp, L.prep_width), dtype=U32)
        block[:, : L.width] = self._rc_block()
        block[0, L.p_sel_me] = 1
        r = 1
        for _ in range(rf2):
            block[r, L.p_sel_ext] = 1
            r += 1
        for _ in range(self.params.partial_rounds):
            block[r, L.p_sel_int] = 1
            r += 1
        for _ in range(rf2, self.params.full_rounds):
            block[r, L.p_sel_ext] = 1
            r += 1
        assert r == rpp - 1
        ordered = chain_order(calls)
        prep = np.zeros((len(calls) * rpp, L.prep_width), dtype=U32)
        for ci, call in enumerate(ordered):
            base = ci * rpp
            last = base + rpp - 1
            prep[base : base + rpp] = block
            for l, wid in enumerate(call.inputs):
                if wid is not None:
                    prep[base, L.p_io_idx + l] = wid * d
                    prep[base, L.p_io_mult + l] = call.in_mults[l] % F.P
            if call.new_start:
                assert not call.merkle_path, "merkle rows never start chains"
                for l, wid in enumerate(call.inputs):
                    if wid is None:
                        prep[base, L.p_zerol + l] = 1
            elif call.merkle_path and getattr(call, "merkle_arity", 2) == 4:
                assert L.arity4, "arity-4 merkle rows need the W32 table"
                for i in range(L.digest_limbs):
                    assert call.inputs[i] is None, (
                        "merkle rows must not CTL the running-digest slot"
                    )
                prep[base, L.p_merkle4] = 1
                prep[base, L.p_macc4] = 1
            elif call.merkle_path:
                for i in range(L.digest_limbs):
                    assert call.inputs[i] is None, (
                        "merkle rows must not CTL the running-digest half"
                    )
                    prep[base, L.p_merkle + i] = 1
                prep[base, L.p_macc] = 1
            else:
                for l, wid in enumerate(call.inputs):
                    if wid is None:
                        prep[base, L.p_sponge + l] = 1
            if call.merkle_path:
                prep[base : base + rpp, L.p_mrow] = 1
            for l, wid in enumerate(call.outputs):
                if wid is not None:
                    prep[last, L.p_io_idx + l] = wid * d
                    prep[last, L.p_io_mult + l] = call.out_mults[l] % F.P
            if call.sum_out is not None:
                prep[last, L.p_sum_idx] = call.sum_out * d
                prep[last, L.p_sum_mult] = call.sum_mult % F.P
        from .batch_prover import _pad_pow2

        return _pad_pow2(prep, min_height)

    def build_main(self, calls, records, min_height: int) -> np.ndarray:
        """records[i] = (input state (width,), bit, sum) for ordered call i."""
        from .batch_prover import _pad_pow2

        F = self.params.field
        width = self.params.width
        n_sbox = _sbox_registers(F.sbox_degree)
        if not records:
            return np.zeros(
                (min_height, (1 + n_sbox) * width + 2), dtype=U32
            )
        ordered = chain_order(calls)
        rec_by_op = {c.op_id: r for c, r in zip(calls, records)}
        recs = [rec_by_op[c.op_id] for c in ordered]
        states = np.stack([r[0] for r in recs]).astype(U32)
        rpp = self.rows_per_perm
        n_perms = states.shape[0]
        native = self._native_perm()
        if native is not None:
            # one C++ pass emits state + S-box register columns directly
            body = native.table_rows(states, self._rc_block(), n_sbox)
            body = body.reshape(n_perms * rpp, (1 + n_sbox) * width)
        else:
            rows = permute_with_rows(self.params, states, np)  # (n, rpp, w)
            assert rows.shape[1] == rpp
            flat = rows.reshape(n_perms * rpp, width)
            rc = np.tile(self._rc_block(), (n_perms, 1))
            t = F.add(flat, rc, np)
            cube = F.mul(F.mul(t, t, np), t, np)
            if n_sbox == 1:
                sbox_blocks = [cube]
            else:
                sbox_blocks = [cube, F.mul(F.mul(cube, cube, np), t, np)]
            body = np.concatenate([flat] + sbox_blocks, axis=1)
        n_extra = 4 if self.L.arity4 else 2
        extra = np.zeros((n_perms * rpp, n_extra), dtype=U32)
        bits = np.asarray([r[1] for r in recs], dtype=U32)
        extra[::rpp, 0] = bits
        sums = np.asarray([int(r[2]) % F.P for r in recs], dtype=U32)
        extra[:, 1] = np.repeat(sums, rpp)
        if self.L.arity4:
            bit2 = np.asarray(
                [r[3] if len(r) > 3 else 0 for r in recs], dtype=U32
            )
            extra[::rpp, 2] = bit2
            extra[::rpp, 3] = bits * bit2
        return _pad_pow2(np.concatenate([body, extra], axis=1), min_height)


@functools.lru_cache(maxsize=None)
def poseidon2_npo_for(
    field_name: str, width: int = 16, d: int = 4
) -> Poseidon2Npo:
    """Per-field/width NPO (reference preset family, `public_types.rs`:
    W16 challenger/MMCS, W24 wide sponge, W32 arity-4 compression; d is
    the circuit extension degree — D1/D4 presets in the reference, any
    divisor of the 8-element digest here)."""
    from ..fields import BABY_BEAR, KOALA_BEAR

    field = {"koala_bear": KOALA_BEAR, "baby_bear": BABY_BEAR}[field_name]
    return Poseidon2Npo(poseidon2_params(field, width), d=d)


def koala_bear_poseidon2_npo() -> Poseidon2Npo:
    return poseidon2_npo_for("koala_bear")


def baby_bear_poseidon2_npo() -> Poseidon2Npo:
    return poseidon2_npo_for("baby_bear")


def _device_table_fn(npo: Poseidon2Npo, n_perms: int, min_height: int):
    """Cached jit: (states (n, width), extra (n·rpp, n_extra)) -> padded
    main table, fully on device (the host uploads only the input states)."""
    import jax
    import jax.numpy as jnp

    key = (npo.type_id, n_perms, min_height)
    fn = _DEVICE_TABLE_CACHE.get(key)
    if fn is not None:
        return fn
    F = npo.params.field
    width = npo.params.width
    n_sbox = _sbox_registers(F.sbox_degree)
    rpp = npo.rows_per_perm
    rc_tile = np.tile(npo._rc_block(), (n_perms, 1))
    n_rows = n_perms * rpp
    target = max(min_height, 1 << max(n_rows - 1, 0).bit_length())

    def body(states, extra):
        rows = permute_with_rows(npo.params, states, jnp)
        flat = rows.reshape(n_rows, width)
        t = F.add(flat, jnp.asarray(rc_tile), jnp)
        cube = F.mul(F.mul(t, t, jnp), t, jnp)
        blocks = [flat, cube]
        if n_sbox == 2:
            blocks.append(F.mul(F.mul(cube, cube, jnp), t, jnp))
        main = jnp.concatenate(blocks + [extra], axis=1)
        if target > n_rows:
            main = jnp.pad(main, [(0, target - n_rows), (0, 0)])
        return main

    fn = jax.jit(body)
    _DEVICE_TABLE_CACHE[key] = fn
    return fn


_DEVICE_TABLE_CACHE: dict = {}


def _poseidon2_build_main_device(self, calls, records, min_height: int):
    """Device-resident `build_main` (bit-identical; see _device_table_fn)."""
    F = self.params.field
    if not records:
        return self.build_main(calls, records, min_height)
    ordered = chain_order(calls)
    rec_by_op = {c.op_id: r for c, r in zip(calls, records)}
    recs = [rec_by_op[c.op_id] for c in ordered]
    states = np.stack([r[0] for r in recs]).astype(U32)
    rpp = self.rows_per_perm
    n_perms = states.shape[0]
    n_extra = 4 if self.L.arity4 else 2
    extra = np.zeros((n_perms * rpp, n_extra), dtype=U32)
    bits = np.asarray([r[1] for r in recs], dtype=U32)
    extra[::rpp, 0] = bits
    sums = np.asarray([int(r[2]) % F.P for r in recs], dtype=U32)
    extra[:, 1] = np.repeat(sums, rpp)
    if self.L.arity4:
        bit2 = np.asarray(
            [r[3] if len(r) > 3 else 0 for r in recs], dtype=U32
        )
        extra[::rpp, 2] = bit2
        extra[::rpp, 3] = bits * bit2
    return _device_table_fn(self, n_perms, min_height)(states, extra)


Poseidon2Npo.build_main_device = _poseidon2_build_main_device

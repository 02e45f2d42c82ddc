"""Poseidon2 permutation NPO: chained circuit plugin + table AIR + traces.

TPU-native equivalent of the reference's Poseidon2 perm NPO + circuit AIR
(`circuit/src/ops/poseidon2_perm/`, `poseidon2-circuit-air/src/air.rs:26-70`,
`poseidon-circuit-cols/src/cols.rs:64-115`; SURVEY.md §2.1/§2.3).

WIDE layout: ONE trace row per PERMUTATION — input state, the committed
post-state of every full round, and the committed S-box column(s) of every
partial round (the reference's `Poseidon2Cols` structure).  Round
constants are plain constants inside the constraints (no preprocessed RC
columns).  All constraints stay degree <= 3: a full round's post-state is
M_E applied to cubes of degree-1 expressions; x^7 fields commit one extra
S-box register per lane (sb = reg^2 * t with reg = t^3); partial-round
state rides through as degree-1 expressions referencing the committed
partial S-box columns, so only one (x^3) or two (x^7) columns per partial
round are committed.

This replaced a row-per-ROUND layout in round 4: heights fell ~30x (the
flagship recursion layer's Poseidon table goes 2^18 x 34 -> 2^13 x ~170),
cutting the dominant NTT/LDE and Merkle-leaf work of every commit, at the
price of a wider (still degree-3) constraint set.

WIDTH-GENERIC: the same AIR serves the reference's preset family
(`public_types.rs`) — W16 (challenger/MMCS digests), W24 (wide sponges),
W32 (arity-4 compression) — for BabyBear and KoalaBear.

Chaining (the reference's core circuit-size trick): consecutive perm
calls on one CHAIN occupy ADJACENT ROWS, and transition constraints
between row i (whose ending-round post block is the permutation output)
and row i+1 (whose input block is the next input state) carry sponge
state / Merkle running digests **inside the table**, so intermediate
digests never touch the witness bus:

  * sponge chain   — gated per limb: next_in[l] == cur_out[l]
  * merkle chain   — direction bit B (value column) places the running
    digest left (B=0) or right (B=1): the sibling half is prover private
    data written straight into the trace, with NO circuit wires at all
  * index sum      — accumulator column S with S' = 2·S + B' across merkle
    rows reconstructs the leaf index from the direction bits; ONE lookup
    per path binds the final S to the circuit's expected index, replacing
    per-level bit wires (reference `mmcs_index_sum`, `cols.rs:100-115`)

Padding rows repeat the permutation of the all-zero state (every
selector-free round constraint is honestly satisfied; all prep gates and
CTL multiplicities are zero there).
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
    """Committed S-box register columns per lane per round (beyond the
    full-round post block): x^3 needs none at degree 3; x^7 needs one."""
    if deg == 3:
        return 0
    if deg == 7:
        return 1
    raise ValueError(f"unsupported S-box degree {deg}")


class _Layout:
    """Wide per-permutation main/preprocessed column layout.

    Main row: [ input (W) | per begin-full-round: (reg (W) if x^7) post (W)
    | per partial round: (reg if x^7) ps | per end-full-round: ... |
    mmcs_bit | (mmcs_bit2 | mmcs_bb when W=32) | mmcs_index_sum ].

    Preprocessed per row: [in_idx x we | in_mult x we | out_idx x we |
    out_mult x we | sum_idx | sum_mult | sponge x we | merkle x dl |
    macc | zerol x we | mrow | (merkle4 | macc4 when W=32)].
    """

    def __init__(self, params: Poseidon2Params, d: int):
        width = params.width
        self.width = width
        self.width_ext = width // d
        # capacity is always 8 base elements (the digest size); Merkle
        # 2-to-1 chaining always works on 8-element digest halves
        self.rate_ext = (width - 8) // d
        self.digest_limbs = 8 // d
        self.n_reg = _sbox_registers(params.field.sbox_degree)
        rf2 = params.full_rounds // 2
        rp = params.partial_rounds
        o = width
        self.full_reg: list = []  # per full round: reg block offset or None
        self.full_post: list = []
        self.part_reg: list = []
        self.part_ps: list = []
        for _f in range(rf2):
            if self.n_reg:
                self.full_reg.append(o)
                o += width
            else:
                self.full_reg.append(None)
            self.full_post.append(o)
            o += width
        for _r in range(rp):
            if self.n_reg:
                self.part_reg.append(o)
                o += 1
            else:
                self.part_reg.append(None)
            self.part_ps.append(o)
            o += 1
        for _f in range(rf2):
            if self.n_reg:
                self.full_reg.append(o)
                o += width
            else:
                self.full_reg.append(None)
            self.full_post.append(o)
            o += width
        self.out_off = self.full_post[-1]
        self.col_b = o
        # W32 additionally supports ARITY-4 Merkle chaining (reference
        # arity-4 paths over TruncatedPermutation<_,4,8,32>): a second
        # position bit B2 and the committed product BB = B·B2 make the
        # 4-way placement selectors degree-1
        self.arity4 = width == 32
        if self.arity4:
            self.col_b2 = o + 1
            self.col_bb = o + 2
            self.col_s = o + 3
            self.main_width = o + 4
        else:
            self.col_s = o + 1
            self.main_width = o + 2
        # --- preprocessed ---
        we = self.width_ext
        p = 0
        self.p_in_idx = p
        p += we
        self.p_in_mult = p
        p += we
        self.p_out_idx = p
        p += we
        self.p_out_mult = p
        p += we
        self.p_sum_idx = p
        self.p_sum_mult = p + 1
        p += 2
        self.p_sponge = p
        p += we
        self.p_merkle = p
        p += self.digest_limbs
        self.p_macc = p
        p += 1
        self.p_zerol = p
        p += we
        self.p_mrow = p
        p += 1
        if self.arity4:
            self.p_merkle4 = p
            self.p_macc4 = p + 1
            p += 2
        self.prep_width = p


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
        self.L = _Layout(params, d)
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
            "v4wide",
        )

    def eval(self, b):
        d = self.d
        L = self.L
        P = self.params
        width = L.width
        deg = P.field.sbox_degree
        rf2 = P.full_rounds // 2
        rp = P.partial_rounds
        cur_in = [b.main_local[j] for j in range(width)]
        nxt_in = [b.main_next[j] for j in range(width)]
        bit = b.main_local[self.col_b]
        nxt_bit = b.main_next[self.col_b]
        s_acc = b.main_local[self.col_s]
        nxt_s = b.main_next[self.col_s]

        # --- permutation round structure (one row holds it all) ---
        def full_round(state, ridx, rf_idx):
            rc = P.rc_ext[rf_idx]
            sb = []
            for j in range(width):
                t = state[j] + int(rc[j])
                if deg == 3:
                    sb.append(t * t * t)
                else:
                    reg = b.main_local[L.full_reg[ridx] + j]
                    b.assert_zero(reg - t * t * t)
                    sb.append(reg * reg * t)
            me = _ext_layer_exprs(sb, width)
            post = [b.main_local[L.full_post[ridx] + j] for j in range(width)]
            for j in range(width):
                b.assert_zero(post[j] - me[j])
            return post

        def partial_round(state, ridx):
            t = state[0] + int(P.rc_int[ridx])
            ps = b.main_local[L.part_ps[ridx]]
            if deg == 3:
                b.assert_zero(ps - t * t * t)
            else:
                reg = b.main_local[L.part_reg[ridx]]
                b.assert_zero(reg - t * t * t)
                b.assert_zero(ps - reg * reg * t)
            lanes = [ps] + list(state[1:])
            total = lanes[0]
            for x in lanes[1:]:
                total = total + x
            diag = P.diag
            return [lanes[j] * int(diag[j]) + total for j in range(width)]

        state = _ext_layer_exprs(cur_in, width)  # initial M_E
        for f in range(rf2):
            state = full_round(state, f, f)
        for r in range(rp):
            state = partial_round(state, r)
        for f in range(rf2):
            state = full_round(state, rf2 + f, rf2 + f)
        out = state  # committed post block of the last full round

        # --- chaining constraints (cols.rs:64-115, air.rs:1030-1125) ---
        # Direction bit is prover-chosen at runtime: boolean-constrain it.
        b.assert_zero(bit * bit - bit)
        # S vanishes off merkle rows (padding included: zero prep).
        b.assert_zero((1 - Var("preprocessed", L.p_mrow, 0)) * s_acc)
        # Into a merkle row: S' = 2·S + B'.  The chain's first merkle row
        # follows a (forced-S=0) sponge row, so the same constraint
        # initializes S' = B'.
        b.assert_zero(
            Var("preprocessed", L.p_macc, 1) * (nxt_s - 2 * s_acc - nxt_bit)
        )
        # Sponge chaining: gated per limb on the NEXT row's prep flag.
        for l in range(L.width_ext):
            sc = Var("preprocessed", L.p_sponge + l, 1)
            for j in range(d):
                c = l * d + j
                b.assert_zero(sc * (nxt_in[c] - out[c]))
            zg = Var("preprocessed", L.p_zerol + l, 0)
            for j in range(d):
                b.assert_zero(zg * cur_in[l * d + j])
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
                                nxt_in[(q * L.digest_limbs + i) * d + j]
                                - out[i * d + j]
                            )
                        )
            # S' = 4·S + B' + 2·B2' across arity-4 merkle transitions
            b.assert_zero(
                Var("preprocessed", L.p_macc4, 1)
                * (nxt_s - 4 * s_acc - nxt_bit - 2 * nxt_b2)
            )
        # Merkle chaining: running digest (the output's digest half) goes
        # left (B'=0) or right (B'=1) in the next row's input; the other
        # half holds the private sibling (unconstrained here, bound by the
        # final root connect).
        for i in range(L.digest_limbs):
            mc = Var("preprocessed", L.p_merkle + i, 1)
            left = mc * (1 - nxt_bit)
            right = mc * nxt_bit
            for j in range(d):
                b.assert_zero(left * (nxt_in[i * d + j] - out[i * d + j]))
                b.assert_zero(
                    right
                    * (nxt_in[(L.digest_limbs + i) * d + j] - out[i * d + j])
                )

    def lookups(self):
        d = self.d
        L = self.L
        inters = []
        for l in range(L.width_ext):
            inters.append(
                Interaction(
                    [Var("preprocessed", L.p_in_idx + l, 0)]
                    + [Var("main", l * d + j, 0) for j in range(d)],
                    Var("preprocessed", L.p_in_mult + l, 0),
                )
            )
        for l in range(L.width_ext):
            inters.append(
                Interaction(
                    [Var("preprocessed", L.p_out_idx + l, 0)]
                    + [
                        Var("main", L.out_off + l * d + j, 0)
                        for j in range(d)
                    ],
                    Var("preprocessed", L.p_out_mult + l, 0),
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
    constraints bind ADJACENT rows, so a chain's rows must be adjacent
    even when its calls interleave with other chains (e.g. the
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
        self.L = _Layout(params, d)
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
        return 1

    def table_air(self) -> Poseidon2TableAir:
        return Poseidon2TableAir(self.params, self.d)

    def build_prep(self, calls, min_height: int) -> np.ndarray:
        F = self.params.field
        d = self.d
        L = self.L
        ordered = chain_order(calls)
        prep = np.zeros((len(calls), L.prep_width), dtype=U32)
        for ci, call in enumerate(ordered):
            row = prep[ci]
            for l, wid in enumerate(call.inputs):
                if wid is not None:
                    row[L.p_in_idx + l] = wid * d
                    row[L.p_in_mult + l] = call.in_mults[l] % F.P
            if call.new_start:
                assert not call.merkle_path, "merkle rows never start chains"
                for l, wid in enumerate(call.inputs):
                    if wid is None:
                        row[L.p_zerol + l] = 1
            elif call.merkle_path and getattr(call, "merkle_arity", 2) == 4:
                assert L.arity4, "arity-4 merkle rows need the W32 table"
                for i in range(L.digest_limbs):
                    assert call.inputs[i] is None, (
                        "merkle rows must not CTL the running-digest slot"
                    )
                row[L.p_merkle4] = 1
                row[L.p_macc4] = 1
            elif call.merkle_path:
                for i in range(L.digest_limbs):
                    assert call.inputs[i] is None, (
                        "merkle rows must not CTL the running-digest half"
                    )
                    row[L.p_merkle + i] = 1
                row[L.p_macc] = 1
            else:
                for l, wid in enumerate(call.inputs):
                    if wid is None:
                        row[L.p_sponge + l] = 1
            if call.merkle_path:
                row[L.p_mrow] = 1
            for l, wid in enumerate(call.outputs):
                if wid is not None:
                    row[L.p_out_idx + l] = wid * d
                    row[L.p_out_mult + l] = call.out_mults[l] % F.P
            if call.sum_out is not None:
                row[L.p_sum_idx] = call.sum_out * d
                row[L.p_sum_mult] = call.sum_mult % F.P
        from .batch_prover import _pad_pow2

        return _pad_pow2(prep, min_height)

    # ----- trace assembly -----

    def _perm_body(self, states, xp):
        """(n, W) input states -> (n, perm-column block) wide rows."""
        F = self.params.field
        P = self.params
        width = P.width
        deg = F.sbox_degree
        rf2 = P.full_rounds // 2
        rp = P.partial_rounds
        rows = permute_with_rows(P, states, xp)  # (n, 2+RF+RP, W)
        cols = [rows[:, 0]]

        def full_cols(ridx, row_before, row_after):
            rc = xp.asarray(
                np.asarray(P.rc_ext[ridx], dtype=U32).reshape(1, width)
            )
            if deg == 7:
                t = F.add(row_before, rc, xp)
                reg = F.mul(F.mul(t, t, xp), t, xp)
                cols.append(reg)
            cols.append(row_after)

        def part_cols(ridx, row_before):
            rc = U32(int(P.rc_int[ridx]) % F.P)
            t = F.add(row_before[:, :1], rc, xp)
            c3 = F.mul(F.mul(t, t, xp), t, xp)
            if deg == 7:
                cols.append(c3)
                cols.append(F.mul(F.mul(c3, c3, xp), t, xp))
            else:
                cols.append(c3)

        for f in range(rf2):
            full_cols(f, rows[:, 1 + f], rows[:, 2 + f])
        for r in range(rp):
            part_cols(r, rows[:, 1 + rf2 + r])
        for f in range(rf2):
            e = rf2 + f
            full_cols(e, rows[:, 1 + rf2 + rp + f], rows[:, 2 + rf2 + rp + f])
        return xp.concatenate(cols, axis=1)

    @functools.cached_property
    def _pad_row(self) -> np.ndarray:
        """Wide row for the all-zero input state (all extras zero): the
        padding pattern — satisfies every round constraint honestly."""
        body = self._perm_body(np.zeros((1, self.params.width), dtype=U32), np)
        n_extra = self.L.main_width - body.shape[1]
        return np.concatenate(
            [body, np.zeros((1, n_extra), dtype=U32)], axis=1
        )

    def _extras(self, recs) -> np.ndarray:
        F = self.params.field
        n = len(recs)
        n_extra = 4 if self.L.arity4 else 2
        extra = np.zeros((n, n_extra), dtype=U32)
        extra[:, -1] = np.asarray(
            [int(r[2]) % F.P for r in recs], dtype=U32
        )
        bits = np.asarray([r[1] for r in recs], dtype=U32)
        extra[:, 0] = bits
        if self.L.arity4:
            bit2 = np.asarray(
                [r[3] if len(r) > 3 else 0 for r in recs], dtype=U32
            )
            extra[:, 1] = bit2
            extra[:, 2] = bits * bit2
        return extra

    def _pad_main(self, body: np.ndarray, min_height: int):
        n = body.shape[0]
        target = max(min_height, 1 << max(n - 1, 0).bit_length())
        if target == n:
            return body
        pad = np.broadcast_to(self._pad_row, (target - n, self.L.main_width))
        return np.concatenate([body, pad], axis=0)

    def build_main(self, calls, records, min_height: int) -> np.ndarray:
        """records[i] = (input state (width,), bit, sum) for ordered call i."""
        if not records:
            return self._pad_main(
                np.zeros((0, self.L.main_width), dtype=U32), min_height
            )
        ordered = chain_order(calls)
        rec_by_op = {c.op_id: r for c, r in zip(calls, records)}
        recs = [rec_by_op[c.op_id] for c in ordered]
        states = np.stack([r[0] for r in recs]).astype(U32)
        body = self._perm_body(states, np)
        main = np.concatenate([body, self._extras(recs)], axis=1)
        return self._pad_main(main, min_height)


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
    """Cached jit: (states (n, width), extra (n, n_extra)) -> padded wide
    main table, fully on device (the host uploads only the input states)."""
    import jax
    import jax.numpy as jnp

    key = (npo.type_id, n_perms, min_height)
    fn = _DEVICE_TABLE_CACHE.get(key)
    if fn is not None:
        return fn
    target = max(min_height, 1 << max(n_perms - 1, 0).bit_length())
    pad_row = npo._pad_row

    def body(states, extra):
        wide = npo._perm_body(states, jnp)
        main = jnp.concatenate([wide, extra], axis=1)
        if target > n_perms:
            main = jnp.concatenate(
                [
                    main,
                    jnp.broadcast_to(
                        jnp.asarray(pad_row),
                        (target - n_perms, npo.L.main_width),
                    ),
                ],
                axis=0,
            )
        return main

    fn = jax.jit(body)
    _DEVICE_TABLE_CACHE[key] = fn
    return fn


_DEVICE_TABLE_CACHE: dict = {}


def _poseidon2_device_payload(self, calls, records):
    """Host arrays the device table builder consumes: (input states,
    extras) in chain order.  Rides the prover's single packed upload."""
    if not records:
        return ()
    ordered = chain_order(calls)
    rec_by_op = {c.op_id: r for c, r in zip(calls, records)}
    recs = [rec_by_op[c.op_id] for c in ordered]
    states = np.stack([r[0] for r in recs]).astype(U32)
    return (states, self._extras(recs))


def _poseidon2_payload_from_arrays(self, arrays, perm):
    """`device_payload` from the runner's array-form records: pure
    vectorized gathers (no per-op python)."""
    F = self.params.field
    states = arrays["states"][perm].astype(U32)
    n = states.shape[0]
    n_extra = 4 if self.L.arity4 else 2
    extra = np.zeros((n, n_extra), dtype=U32)
    extra[:, -1] = (arrays["sums"][perm] % F.P).astype(U32)
    bits = arrays["bits"][perm].astype(U32)
    extra[:, 0] = bits
    if self.L.arity4:
        bit2 = arrays["bits2"][perm].astype(U32)
        extra[:, 1] = bit2
        extra[:, 2] = bits * bit2
    return (states, extra)


def _poseidon2_build_main_device(
    self, calls, records, min_height: int, payload=None
):
    """Device-resident `build_main` (bit-identical; see _device_table_fn).
    payload: the device-resident (states, extras) pair from
    `device_payload`/`payload_from_arrays` (host arrays accepted too)."""
    if payload is None:
        if not records:
            return self.build_main(calls, records, min_height)
        payload = _poseidon2_device_payload(self, calls, records)
    states, extras = payload
    return _device_table_fn(self, int(states.shape[0]), min_height)(
        states, extras
    )


Poseidon2Npo.device_payload = _poseidon2_device_payload
Poseidon2Npo.payload_from_arrays = _poseidon2_payload_from_arrays
Poseidon2Npo.build_main_device = _poseidon2_build_main_device

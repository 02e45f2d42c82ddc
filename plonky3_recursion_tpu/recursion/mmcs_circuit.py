"""In-circuit MMCS verification: Merkle batch openings as CHAINED perm rows.

TPU-native equivalent of the reference's MMCS recursion module
(`recursion/src/pcs/mmcs.rs:319`, `circuit/src/ops/mmcs.rs:81`;
SURVEY.md §2.4), rebuilt on the chained Poseidon2 table
(`prover/poseidon2_table.py`): a whole Merkle path is ONE chain of
adjacent table row blocks —

  * leaf sponge rows absorb the opened values (only these touch the bus),
  * per-level compression rows carry the running digest in-table; the
    sibling digest and the direction bit are prover PRIVATE DATA written
    straight into the trace (no circuit wires at all),
  * roll-in rows inject shorter matrices' digests (hashed by their own
    side chains) through in-CTL limbs with direction pinned left,
  * the chain's final row exposes the root digest limbs (connected to the
    commitment) and the in-table index accumulator S, which is bound by a
    single lookup to the expected value reconstructed from the sampled
    index bits — replacing per-level direction-bit wires and selects
    (reference `mmcs_index_sum`, `poseidon-circuit-cols/src/cols.rs:100`).

Private data contract: for path tag T, the merkle compression row at
level L expects `runner.set_private_data((T, L), {"bit": b, "sibling":
(8,) base array})` — see `recursion.pack_npo_private`.
"""

from __future__ import annotations

from ..circuit.builder import CircuitBuilder


class MmcsGadget:
    WIDTH = 16
    RATE = 8
    DIGEST = 8
    LIMBS = 4
    RATE_LIMBS = 2
    DIGEST_LIMBS = 2

    D = 4

    def __init__(self, builder: CircuitBuilder, npo_type_id: str):
        self.b = builder
        self.npo = npo_type_id
        # width-generic sizing from the permutation plugin (reference
        # preset family; Goldilocks W8 carries capacity/digest 4, D=2)
        plugin, _cfg = builder.enabled_ops[npo_type_id]
        params = getattr(plugin, "params", None)
        if params is not None and getattr(plugin, "chained", False):
            d = getattr(plugin, "d", 4)
            cap = getattr(plugin, "capacity", 8)
            if type(self) is MmcsGadget:
                self.D = d
                self.WIDTH = params.width
                self.RATE = params.width - cap
                self.DIGEST = cap
                self.LIMBS = params.width // d
                self.RATE_LIMBS = self.RATE // d
                self.DIGEST_LIMBS = self.DIGEST // d
        # registered (tag, n_levels) pairs so the layer prover knows which
        # private-data keys to fill (one per compression level)
        self.private_paths: list = []
        self._root_cache: dict = {}

    # ----- sponge absorption (overwrite mode, matching ops.hashing) -----

    def _recompose(self, coeffs):
        """recompose 4 base-coeff wires -> ext wire; constant-folds when
        every coefficient is a circuit constant."""
        b = self.b
        from ..circuit.expr import CONST

        nodes = b.g.nodes
        if all(nodes[c].kind == CONST for c in coeffs):
            return b.const(tuple(nodes[c].value[0] for c in coeffs))
        return b.recompose_base_coeffs_to_ext(coeffs)

    def absorb(self, values: list, chain) -> None:
        """Absorb base-coeff wires into `chain` (PaddingFreeSponge
        overwrite discipline: per 8-value chunk overwrite the rate limbs,
        permute; untouched slots keep the previous permutation output)."""
        b = self.b
        first = b._chain_last.get(chain) is None
        n = len(values)
        assert n > 0
        for start in range(0, n, self.RATE):
            chunk = values[start : start + self.RATE]
            inputs = [None] * self.LIMBS
            d = self.D
            for l in range(self.RATE_LIMBS):
                cs = chunk[d * l : d * l + d]
                if not cs:
                    continue
                if len(cs) < d:
                    if first:
                        cs = cs + [b.zero] * (d - len(cs))
                    else:
                        prev_op = b._chain_last[chain]
                        old = b.decompose_ext_to_base_coeffs(
                            b.npo_out_wire(prev_op, l)
                        )
                        cs = cs + old[len(cs) :]
                inputs[l] = self._recompose(cs)
            b.perm_call(
                self.npo,
                inputs,
                [False] * self.LIMBS,
                new_start=first,
                chain=chain,
            )
            first = False

    def absorb_ext(self, ext_values: list, chain) -> None:
        """Absorb D-aligned extension wires (each fills one rate limb
        directly — zero arithmetic rows)."""
        b = self.b
        first = b._chain_last.get(chain) is None
        for start in range(0, len(ext_values), self.RATE_LIMBS):
            group = ext_values[start : start + self.RATE_LIMBS]
            inputs = [None] * self.LIMBS
            for l, t in enumerate(group):
                inputs[l] = t
            b.perm_call(
                self.npo,
                inputs,
                [False] * self.LIMBS,
                new_start=first,
                chain=chain,
            )
            first = False

    def _digest_of(self, values: list, as_ext: bool) -> tuple:
        """Side-chain sponge of `values`; returns (chain, last_op) with the
        digest living in the chain's final permutation output."""
        b = self.b
        chain = b.new_chain("mmcs_leaf")
        if as_ext:
            self.absorb_ext(values, chain)
        else:
            self.absorb(values, chain)
        return chain, b._chain_last[chain]

    # ----- batched Merkle-path verification -----

    def verify_batch(
        self,
        commitment: list[int],
        dims: list[tuple[int, int]],
        index_bits: list[int],
        opened_rows: list[list[int]],
        tag,
        ext_rows: bool = False,
    ):
        """In-circuit analog of MerkleMmcs.verify_batch on one chain.

        commitment: 8·2^cap base-coeff targets of the Merkle cap (the
        root when cap_height = 0; reference `MerkleCapTargets` /
        `select_cap_entry`, `recursion/src/pcs/mmcs.rs:289-376,545`) —
        the cap height is DERIVED from the commitment length, like the
        reference; dims: (height, width) per matrix (heights powers of
        two); index_bits: LSB-first bit targets of the opened index in the
        TALLEST matrix; opened_rows: per matrix the opened row's wires
        (base coeffs, or ext wires when ext_rows); tag: private-data key
        prefix for (bit, sibling) per compression level.
        """
        b = self.b
        heights = [h for h, _w in dims]
        max_h = max(heights)
        log_max = max_h.bit_length() - 1
        n_entries = len(commitment) // self.DIGEST
        assert n_entries * self.DIGEST == len(commitment)
        cap_h = n_entries.bit_length() - 1
        assert 1 << cap_h == n_entries and cap_h <= log_max
        path_levels = log_max - cap_h
        assert len(index_bits) >= log_max
        by_height: dict[int, list] = {}
        for (h, _w), row in zip(dims, opened_rows):
            by_height.setdefault(h, []).extend(row)

        chain = b.new_chain("mmcs_path")
        if ext_rows:
            self.absorb_ext(by_height[max_h], chain)
        else:
            self.absorb(by_height[max_h], chain)
        # row_bits[i] = index bit fed at merkle row i (None for roll-ins)
        row_bits: list = []
        h = max_h
        n_rows = 0
        for level in range(path_levels):
            b.perm_call(
                self.npo,
                [None] * self.LIMBS,
                [False] * self.LIMBS,
                new_start=False,
                merkle_path=True,
                chain=chain,
                tag=(tag, level),
            )
            n_rows += 1
            row_bits.append(index_bits[level])
            h //= 2
            if h in by_height:
                # inject the rolled-in height's digest (own side chain) on
                # the sibling half, direction pinned left (bit private=0,
                # enforced by the CTL'd right half + the S binding)
                _c, leaf_op = self._digest_of(by_height[h], ext_rows)
                inj = [
                    b.npo_out_wire(leaf_op, i) for i in range(self.RATE_LIMBS)
                ]
                b.perm_call(
                    self.npo,
                    [None, None] + inj,
                    [False] * self.LIMBS,
                    new_start=False,
                    merkle_path=True,
                    chain=chain,
                )
                n_rows += 1
                row_bits.append(None)
        self.private_paths.append((tag, path_levels))
        cap_bits = index_bits[path_levels:log_max]
        if n_rows == 0:
            # no path: the leaf digest is the cap entry (the root when
            # cap_height = 0)
            last_op = b._chain_last[chain]
            outs = [
                b.npo_out_wire(last_op, i) for i in range(self.RATE_LIMBS)
            ]
            self._connect_root(outs, commitment, cap_bits)
            return
        # rebuild the final row with root + S exposure: the LAST perm_call
        # above is the final row; expose its outputs and the index sum.
        last_op = b._chain_last[chain]
        call = b.npos[last_op]
        outs = [b.npo_out_wire(last_op, i) for i in range(self.RATE_LIMBS)]
        call.sum_out = b.g.npo_out(last_op, self.LIMBS)
        self._connect_root(outs, commitment, cap_bits)
        # expected index sum: S starts at the first merkle row's bit and
        # doubles (+bit) per row; roll-in rows contribute bit 0.
        expected = None
        for bit in row_bits:
            if expected is None:
                expected = bit if bit is not None else b.zero
            elif bit is None:
                expected = b.add(expected, expected)
            else:
                expected = b.mul_add(b.const(2), expected, bit)
        b.connect(call.sum_out, expected)

    def _connect_root(self, out_limbs: list, commitment: list, cap_bits=()):
        """Connect the chain's digest limbs to the commitment targets —
        with a Merkle cap, first multiplex the cap entry addressed by the
        top index bits (reference `select_cap_entry`,
        `recursion/src/pcs/mmcs.rs:545`); recomposes/selects are cached
        per (commitment, bits)."""
        b = self.b
        key = (tuple(commitment), tuple(cap_bits))
        roots = self._root_cache.get(key)
        if roots is None:
            dl = self.DIGEST_LIMBS
            dg = self.DIGEST
            d = self.D
            entries = [
                [
                    self._recompose(
                        commitment[e * dg + d * l : e * dg + d * l + d]
                    )
                    for l in range(dl)
                ]
                for e in range(len(commitment) // dg)
            ]
            # LSB-first halving: bit t picks within pairs at stride 2^t
            for bit in cap_bits:
                entries = [
                    [
                        b.select(bit, entries[2 * j + 1][l], entries[2 * j][l])
                        for l in range(dl)
                    ]
                    for j in range(len(entries) // 2)
                ]
            assert len(entries) == 1
            roots = entries[0]
            self._root_cache[key] = roots
        for o, r in zip(out_limbs, roots):
            b.connect(o, r)


class MmcsGadget4(MmcsGadget):
    """Arity-4 in-circuit MMCS over the W32 table (reference
    `verify_batch_circuit_arity4`, `circuit/src/ops/mmcs.rs:242-348` /
    `recursion/src/pcs/mmcs.rs:1251`): one chained W32 block per 4-to-1
    compression — HALF the perm rows of the arity-2 path — with the
    in-table index accumulator stepping S' = 4·S + digit per row.

    Mixed-height batches follow the native `arity4_schedule`
    (reference `arity4_path_schedule` + `add_arity4_compression_row`,
    `recursion/src/pcs/mmcs.rs:878-1060`):

      * a step-4 row consumes two index bits (digit = b + 2·b2; siblings
        private),
      * a step-2 BRIDGE row consumes one bit (digit = b; one private
        sibling, chunks 2,3 pinned to CTL zeros),
      * an INJECTION row compresses the shorter height's side-chain digest
        in at chunk 1 (CTL), direction private (0,0) — enforced by the
        placement-vs-CTL conflict and the S binding (digit = 0).
    """

    WIDTH = 32
    RATE = 24
    DIGEST = 8
    LIMBS = 8
    RATE_LIMBS = 6
    DIGEST_LIMBS = 2

    def verify_batch(
        self,
        commitment: list[int],
        dims: list[tuple[int, int]],
        index_bits: list[int],
        opened_rows: list[list[int]],
        tag,
        ext_rows: bool = False,
    ):
        from ..stark.merkle import arity4_schedule

        b = self.b
        heights = [h for h, _w in dims]
        max_h = max(heights)
        schedule = arity4_schedule(heights)
        by_height: dict[int, list] = {}
        for (h, _w), row in zip(dims, opened_rows):
            by_height.setdefault(h, []).extend(row)
        n_bits = sum(2 if s == 4 else 1 for s, _i in schedule)
        assert len(index_bits) >= n_bits
        chain = b.new_chain("mmcs4_path")
        if ext_rows:
            self.absorb_ext(by_height[max_h], chain)
        else:
            self.absorb(by_height[max_h], chain)
        zero = b.zero
        # digits[i] = base-4 digit expr of merkle row i (None: injection)
        digits: list = []
        c = 0
        lvl = 0  # private-data level counter (step rows only)
        for step, inject in schedule:
            if step == 4:
                inputs = [None] * self.LIMBS
                digit = b.add(
                    index_bits[c], b.mul(b.const(2), index_bits[c + 1])
                )
                c += 2
            else:
                inputs = [None] * 4 + [zero] * 4
                digit = index_bits[c]
                c += 1
            b.perm_call(
                self.npo,
                inputs,
                [False] * self.LIMBS,
                new_start=False,
                merkle_path=True,
                merkle_arity=4,
                chain=chain,
                tag=(tag, lvl),
            )
            digits.append(digit)
            lvl += 1
            if inject:
                _c, leaf_op = self._digest_of(by_height[inject], ext_rows)
                inj = [
                    b.npo_out_wire(leaf_op, i)
                    for i in range(self.DIGEST_LIMBS)
                ]
                b.perm_call(
                    self.npo,
                    [None, None] + inj + [zero] * 4,
                    [False] * self.LIMBS,
                    new_start=False,
                    merkle_path=True,
                    merkle_arity=4,
                    chain=chain,
                )
                digits.append(None)
        self.private_paths.append((tag, lvl))
        last_op = b._chain_last[chain]
        outs = [
            b.npo_out_wire(last_op, i) for i in range(self.DIGEST_LIMBS)
        ]
        if not digits:
            self._connect_root(outs, commitment)
            return
        call = b.npos[last_op]
        call.sum_out = b.g.npo_out(last_op, self.LIMBS)
        self._connect_root(outs, commitment)
        # expected S: base-4 positional accumulation over all merkle rows
        # (injection rows contribute digit 0)
        expected = None
        for dg in digits:
            if expected is None:
                expected = dg if dg is not None else b.zero
            elif dg is None:
                expected = b.mul(b.const(4), expected)
            else:
                expected = b.mul_add(b.const(4), expected, dg)
        b.connect(call.sum_out, expected)

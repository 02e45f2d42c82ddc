"""CircuitChallenger: in-circuit duplex-sponge Fiat–Shamir (chained).

TPU-native equivalent of the reference's `CircuitChallenger`
(`recursion/src/challenger/circuit.rs:33`; SURVEY.md §2.4), transcript
bit-exact with `stark.challenger.DuplexChallenger` by construction: same
overwrite-absorb discipline, same duplexing triggers, same front-of-buffer
sample order.

Chained redesign (vs the reference's D=4 path, which round-trips the full
state through the witness bus at ~70 primitive rows per duplexing,
`book/.../hashing.md:138-156`): the sponge state lives INSIDE the Poseidon2
table on one transcript-long chain.  A duplexing only pays for what
actually crosses the bus —

  * absorbed limbs: one CTL'd input limb per 4 observed coefficients
    (constant-folded for static observations; D-aligned extension
    observations pass their existing wire through with zero new rows),
  * untouched limbs and the capacity: chained in-table for free,
  * sampled values: the output limb wire itself (front-pop sampling makes
    extension samples D-aligned), decomposed lazily only when single
    coefficients are needed (sample_bits / unaligned samples).
"""

from __future__ import annotations

from ..circuit.builder import CircuitBuilder


class CircuitChallenger:
    WIDTH = 16
    RATE = 8
    LIMBS = 4
    RATE_LIMBS = 2

    def __init__(self, builder: CircuitBuilder, npo_type_id: str):
        self.b = builder
        self.npo = npo_type_id
        plugin, _cfg = builder.enabled_ops[npo_type_id]
        # width-generic duplex sized from the plugin's permutation
        # (reference preset family: rate = width − 8-element capacity)
        params = getattr(plugin, "params", None)
        self.D = getattr(plugin, "d", 4)
        if params is not None:
            d = self.D
            # capacity defaults to the 8-element digest of the Monty31
            # family; Goldilocks W8 carries capacity 4 (4-element digests)
            cap = getattr(plugin, "capacity", 8)
            self.WIDTH = params.width
            self.RATE = params.width - cap
            self.LIMBS = params.width // d
            self.RATE_LIMBS = self.RATE // d
        # full-width bit length of a sampled value (31 for Monty31
        # fields, 64 for Goldilocks)
        self.VALUE_BITS = builder.E.base.P.bit_length()
        # hash-agnostic dispatch (reference ChallengerPermConfig): plugins
        # without in-table chaining (e.g. the Poseidon1 table) fall back to
        # full bus round-trips per duplex
        self.chained = getattr(plugin, "chained", False)
        self._legacy_state = [builder.zero] * self.WIDTH
        self.chain = builder.new_chain("challenger")
        self._duplexed = False
        self._op: int | None = None  # op id of the last duplex call
        # input buffer: list of ("c", coeff_wire) 1 slot / ("e", ext_wire)
        # 4 slots, kept 4-aligned for "e" items
        self._in: list = []
        self._in_len = 0
        self._out_len = 0  # coeffs remaining in the output buffer
        self._out_coeffs: dict = {}  # limb -> 4 coeff wires (lazy)
        # transcript record for native replay (query-index derivation at
        # proof-packing time): ("o", coeff_eid) / ("s", count) /
        # ("i", bits, is_query_index)
        self.record: list = []

    # ----- internals -----

    def _recompose(self, coeffs):
        b = self.b
        from ..circuit.expr import CONST

        nodes = b.g.nodes
        if all(nodes[c].kind == CONST for c in coeffs):
            return b.const(tuple(nodes[c].value[0] for c in coeffs))
        return b.recompose_base_coeffs_to_ext(coeffs)

    def _limb_wire(self, l: int) -> int:
        if not self.chained:
            return self._legacy_out_ext[l]
        assert self._op is not None
        return self.b.npo_out_wire(self._op, l)

    def _limb_coeffs(self, l: int) -> list:
        cs = self._out_coeffs.get(l)
        if cs is None:
            cs = self.b.decompose_ext_to_base_coeffs(self._limb_wire(l))
            self._out_coeffs[l] = cs
        return cs

    def _duplex(self):
        if not self.chained:
            self._duplex_legacy()
            return
        b = self.b
        items, k = self._in, self._in_len
        self._in, self._in_len = [], 0
        first = not self._duplexed
        # expand items into per-slot coefficient view, remembering aligned
        # ext passthroughs
        slots: list = [None] * self.RATE  # coeff wires
        ext_at: dict = {}  # slot -> ext wire covering [slot, slot+4)
        pos = 0
        for kind, w in items:
            if kind == "e":
                ext_at[pos] = w
                pos += self.D
            else:
                slots[pos] = w
                pos += 1
        assert pos == k <= self.RATE
        inputs = [None] * self.LIMBS
        for l in range(self.RATE_LIMBS):
            lo = self.D * l
            if lo in ext_at:
                inputs[l] = ext_at[lo]
                continue
            if lo >= k:
                continue  # untouched limb: chains (or zeros on first)
            cs = []
            for j in range(self.D):
                s = lo + j
                if s < k:
                    assert slots[s] is not None, "unaligned ext item"
                    cs.append(slots[s])
                elif first:
                    cs.append(b.zero)
                else:
                    cs.append(self._limb_coeffs(l)[j])
            inputs[l] = self._recompose(cs)
        b.perm_call(
            self.npo,
            inputs,
            [False] * self.LIMBS,
            new_start=first,
            chain=self.chain,
        )
        self._op = b._chain_last[self.chain]
        self._duplexed = True
        self._out_coeffs = {}
        self._out_len = self.RATE

    def _duplex_legacy(self):
        """Full bus round-trip duplex for non-chained perm plugins
        (reference `duplexing_ext`, ~70 primitive rows per duplexing)."""
        b = self.b
        items, k = self._in, self._in_len
        self._in, self._in_len = [], 0
        # flatten items into coefficient wires
        coeffs: list = []
        for kind, w in items:
            if kind == "e":
                coeffs.extend(b.recompose_src[w])
            else:
                coeffs.append(w)
        state = list(self._legacy_state)
        state[: len(coeffs)] = coeffs
        d = self.D
        exts = [
            self._recompose(state[d * j : d * j + d])
            for j in range(self.LIMBS)
        ]
        outs = b.call_npo(self.npo, exts)
        out_coeffs: list = []
        for o in outs:
            out_coeffs.extend(b.decompose_ext_to_base_coeffs(o))
        self._legacy_state = out_coeffs
        self._duplexed = True
        self._out_coeffs = {
            l: out_coeffs[d * l : d * l + d] for l in range(self.LIMBS)
        }
        self._legacy_out_ext = outs
        self._out_len = self.RATE

    # ----- observe -----

    def observe(self, target: int):
        """Observe a base-embedded target."""
        self.record.append(("o", target))
        self._out_len = 0
        self._in.append(("c", target))
        self._in_len += 1
        if self._in_len == self.RATE:
            self._duplex()

    def observe_slice(self, targets):
        for t in targets:
            self.observe(t)

    def observe_coeffs(self, coeffs: list, ext: int | None = None):
        """Observe D base-coeff wires; when the buffer is D-aligned and the
        caller supplies the recomposed ext wire, it passes through as one
        absorb limb with zero extra rows."""
        if (
            ext is not None
            and self._in_len % self.D == 0
            and len(coeffs) == self.D
        ):
            for c in coeffs:
                self.record.append(("o", c))
            self._out_len = 0
            self._in.append(("e", ext))
            self._in_len += self.D
            if self._in_len == self.RATE:
                self._duplex()
        else:
            self.observe_slice(coeffs)

    def observe_ext(self, target: int):
        """Observe an extension wire coefficient-wise.  Aligned: free
        passthrough (the wire's recompose sources provide the replay
        record); unaligned: decompose."""
        src = getattr(self.b, "recompose_src", {}).get(target)
        if self._in_len % self.D == 0 and src is not None:
            self.observe_coeffs(src, ext=target)
        elif src is not None:
            self.observe_slice(src)
        else:
            for c in self.b.decompose_ext_to_base_coeffs(target):
                self.observe(c)

    # ----- sample -----

    def _sample_raw(self) -> int:
        if self._in_len or self._out_len == 0:
            self._duplex()
        pos = self.RATE - self._out_len
        self._out_len -= 1
        l, j = divmod(pos, self.D)
        return self._limb_coeffs(l)[j]

    def sample(self) -> int:
        self.record.append(("s", 1))
        return self._sample_raw()

    def sample_ext(self) -> int:
        d = self.D
        self.record.append(("s", d))
        if self._in_len or self._out_len == 0:
            self._duplex()
        pos = self.RATE - self._out_len
        if pos % d == 0 and self._out_len >= d:
            self._out_len -= d
            return self._limb_wire(pos // d)
        coeffs = [self._sample_raw() for _ in range(d)]
        return self.b.recompose_base_coeffs_to_ext(coeffs)

    def sample_bits(self, bits: int, is_index: bool = False) -> list[int]:
        """Sample, decompose the full field-width value, return the
        low-bit prefix targets (reference `circuit.rs:388-407`).
        `is_index` marks FRI query-index samples for the native
        transcript replay."""
        self.record.append(("i", bits, is_index))
        v = self._sample_raw()
        # canonical=True: without it a malicious prover could witness
        # v + p instead of v for ~1/128 of samples, flipping query-index
        # bits / PoW checks (see CircuitBuilder.assert_bits_canonical).
        all_bits = self.b.decompose_to_bits(
            v, self.VALUE_BITS, canonical=True
        )
        return all_bits[:bits]

    def check_pow_witness(self, witness: int, bits: int):
        """Observe witness; the low `bits` sampled bits must be zero
        (reference `circuit.rs:409-430`)."""
        self.observe(witness)
        for bit in self.sample_bits(bits):
            self.b.assert_zero(bit)

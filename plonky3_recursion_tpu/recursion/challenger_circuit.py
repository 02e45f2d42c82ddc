"""CircuitChallenger: in-circuit duplex-sponge Fiat–Shamir.

TPU-native equivalent of the reference's `CircuitChallenger`
(`recursion/src/challenger/circuit.rs:33`; SURVEY.md §2.4), transcript
bit-exact with `stark.challenger.DuplexChallenger` by construction: same
overwrite-absorb discipline, same duplexing triggers, same back-of-buffer
sample order.

State is held as 16 base-coefficient targets; each duplexing recomposes
them into 4 extension targets, runs the Poseidon2 permutation NPO (CTL-
verified against the Poseidon2 table), and decomposes the outputs back to
coefficients (~70 primitive rows per duplexing in the D=4 view, matching
`book/.../hashing.md:138-156`).
"""

from __future__ import annotations

from ..circuit.builder import CircuitBuilder


class CircuitChallenger:
    WIDTH = 16
    RATE = 8

    def __init__(self, builder: CircuitBuilder, npo_type_id: str):
        self.b = builder
        self.npo = npo_type_id
        self.state = [builder.zero] * self.WIDTH
        self.input_buffer: list[int] = []
        self.output_buffer: list[int] = []
        self._perms = 0

    def _duplex(self):
        b = self.b
        if self.input_buffer:
            for i, t in enumerate(self.input_buffer):
                self.state[i] = t
            self.input_buffer = []
        exts = [
            b.recompose_base_coeffs_to_ext(self.state[4 * j : 4 * j + 4])
            for j in range(4)
        ]
        outs = b.call_npo(self.npo, exts, tag=("challenger", self._perms))
        self._perms += 1
        coeffs: list[int] = []
        for o in outs:
            coeffs.extend(b.decompose_ext_to_base_coeffs(o))
        self.state = coeffs
        self.output_buffer = list(self.state[: self.RATE])

    def observe(self, target: int):
        """Observe a base-embedded target."""
        self.output_buffer = []
        self.input_buffer.append(target)
        if len(self.input_buffer) == self.RATE:
            self._duplex()

    def observe_slice(self, targets):
        for t in targets:
            self.observe(t)

    def observe_ext(self, target: int):
        for c in self.b.decompose_ext_to_base_coeffs(target):
            self.observe(c)

    def sample(self) -> int:
        if self.input_buffer or not self.output_buffer:
            self._duplex()
        return self.output_buffer.pop()

    def sample_ext(self) -> int:
        coeffs = [self.sample() for _ in range(self.b.E.D)]
        return self.b.recompose_base_coeffs_to_ext(coeffs)

    def sample_bits(self, bits: int) -> list[int]:
        """Sample, decompose the full 31-bit value, return the low-bit
        prefix targets (reference `circuit.rs:388-407`)."""
        v = self.sample()
        all_bits = self.b.decompose_to_bits(v, 31)
        return all_bits[:bits]

    def check_pow_witness(self, witness: int, bits: int):
        """Observe witness; the low `bits` sampled bits must be zero
        (reference `circuit.rs:409-430`)."""
        self.observe(witness)
        for bit in self.sample_bits(bits):
            self.b.assert_zero(bit)

"""In-circuit MMCS verification: Merkle batch openings as perm-NPO chains.

TPU-native equivalent of the reference's MMCS recursion module
(`recursion/src/pcs/mmcs.rs:319`, `circuit/src/ops/mmcs.rs:81`;
SURVEY.md §2.4): lowers `merkle.MerkleMmcs.verify_batch` into circuit ops —
leaf sponge absorption, per-level 2-to-1 compression with direction bits
selecting operand order, digest injection for shorter matrices, and a final
connect against the commitment targets.

Digests are 8 base-coefficient targets; permutation I/O goes through the
4-extension-limb view (recompose before each perm call).  Sibling digests
are private inputs supplied by the prover.
"""

from __future__ import annotations

from ..circuit.builder import CircuitBuilder


class MmcsGadget:
    WIDTH = 16
    RATE = 8
    DIGEST = 8

    def __init__(self, builder: CircuitBuilder, npo_type_id: str):
        self.b = builder
        self.npo = npo_type_id
        self._perms = 0

    def _perm(self, coeffs16):
        b = self.b
        exts = [
            b.recompose_base_coeffs_to_ext(coeffs16[4 * j : 4 * j + 4])
            for j in range(4)
        ]
        outs = b.call_npo(self.npo, exts, tag=("mmcs", self._perms))
        self._perms += 1
        out_coeffs = []
        for o in outs:
            out_coeffs.extend(b.decompose_ext_to_base_coeffs(o))
        return out_coeffs

    def sponge_hash(self, values: list[int]) -> list[int]:
        """PaddingFreeSponge over base-embedded targets -> 8 digest
        targets (mirrors ops.hashing.sponge_hash)."""
        b = self.b
        state = [b.zero] * self.WIDTH
        for start in range(0, len(values), self.RATE):
            chunk = values[start : start + self.RATE]
            for i, t in enumerate(chunk):
                state[i] = t
            state = self._perm(state)
        return state[: self.DIGEST]

    def compress(self, left: list[int], right: list[int]) -> list[int]:
        state = list(left) + list(right)
        return self._perm(state)[: self.DIGEST]

    def compress_ordered(self, node, sibling, bit):
        """compress with (node, sibling) swapped when bit == 1."""
        b = self.b
        left = [b.select(bit, s, n) for n, s in zip(node, sibling)]
        right = [b.select(bit, n, s) for n, s in zip(node, sibling)]
        return self.compress(left, right)

    def verify_batch(
        self,
        commitment: list[int],
        dims: list[tuple[int, int]],
        index_bits: list[int],
        opened_rows: list[list[int]],
        siblings: list[list[int]],
    ):
        """In-circuit analog of MerkleMmcs.verify_batch.

        dims: (height, width) per matrix (heights powers of two);
        index_bits: LSB-first bits of the opened index in the TALLEST
        matrix; siblings: one 8-target digest per level.
        """
        heights = [h for h, _w in dims]
        max_h = max(heights)
        log_max = max_h.bit_length() - 1
        assert len(index_bits) >= log_max
        assert len(siblings) == log_max
        by_height: dict[int, list] = {}
        for (h, _w), row in zip(dims, opened_rows):
            by_height.setdefault(h, []).extend(row)
        node = self.sponge_hash(by_height[max_h])
        h = max_h
        for level in range(log_max):
            node = self.compress_ordered(
                node, siblings[level], index_bits[level]
            )
            h //= 2
            if h in by_height:
                node = self.compress(node, self.sponge_hash(by_height[h]))
        for nc, cc in zip(node, commitment):
            self.b.connect(nc, cc)

"""Duplex-sponge Fiat–Shamir challenger + PoW grinding.

TPU-native equivalent of the reference's upstream `p3-challenger`
(`DuplexChallenger`, `GrindingChallenger`; SURVEY.md §2.6).  The transcript
is inherently sequential and tiny, so it runs on the host over numpy scalars
using the same Poseidon2 permutation code as the device kernels — identical
semantics by construction (`SURVEY.md §7.4` hard part #1).

Semantics (mirrors the reference's description in
`book/src/architecture_and_internals/hashing.md:60-95`):
  observe(v): clear output buffer; push v; duplex when input buffer reaches
              RATE (overwrite state[0:len], permute, refill output buffer).
  sample():   duplex first if input buffer non-empty or output buffer empty;
              pop from the FRONT of the output buffer (first sample is
              state[0]).  DIVERGENCE from the reference's `Vec::pop`
              back-pop: with front-pop, a sampled extension element's
              coefficients coincide with one D-aligned limb of the
              permutation output, so the recursive verifier's chained
              challenger reads sampled values as table output limbs with
              ZERO arithmetic rows.  The transcript is self-consistent
              (prover/verifier/circuit all front-pop); reference
              bit-exactness is already impossible (derived round
              constants, see ops/poseidon2.py), so the cheaper
              convention wins.
  sample_bits(b): sample, take the low b bits of the canonical value.
  grind(b):   find witness w so that observe(w); sample_bits(b) == 0 —
              searched in vectorized batches through the same permutation.

Extension elements are observed/sampled coefficient-wise
(observe_ext / sample_ext), matching `observe_algebra_element`.
"""

from __future__ import annotations

import numpy as np

from ..fields.extension import BinomialExtension
from ..fields.monty31 import Monty31, U32
from ..ops.poseidon2 import Poseidon2Params, permute, poseidon2_params


_PERM_CACHE: dict = {}


def _default_perm_fn(params):
    """C++ permutation when the native library builds; numpy otherwise.
    Both are bit-identical (tests/test_native.py)."""
    key = id(params)
    fn = _PERM_CACHE.get(key)
    if fn is None:
        try:
            from ..native import NativePoseidon2

            native = NativePoseidon2(params)
            fn = native.permute
        except Exception:
            fn = lambda s: permute(params, s, np)  # noqa: E731
        _PERM_CACHE[key] = fn
    return fn


class DuplexChallenger:
    WIDTH = 16
    RATE = 8

    def __init__(
        self,
        field: Monty31,
        params: Poseidon2Params | None = None,
        perm_fn=None,
    ):
        """perm_fn((1, WIDTH) array) -> (1, WIDTH): override to use another
        permutation family (hash-agnostic dispatch, reference `PermConfig`
        `circuit/src/ops/perm.rs:19`); defaults to Poseidon2."""
        self.field = field
        # default Poseidon2 transcripts may be continued ON DEVICE by the
        # fused FRI phase chain (fri_pcs); custom perms must stay on host
        self.is_default_poseidon2 = params is None and perm_fn is None
        self.params = params or poseidon2_params(field, self.WIDTH)
        # width-generic duplex (reference preset family): capacity is the
        # 8-element digest, so rate = width − 8 (W16→8, W24→16, W32→24)
        self.WIDTH = self.params.width
        self.RATE = self.params.width - 8
        self.perm_fn = perm_fn or _default_perm_fn(self.params)
        self.state = np.zeros(self.WIDTH, dtype=U32)
        self.input_buffer: list[int] = []
        self.output_buffer: list[int] = []

    def clone(self) -> "DuplexChallenger":
        c = DuplexChallenger(self.field, self.params, self.perm_fn)
        c.state = self.state.copy()
        c.input_buffer = list(self.input_buffer)
        c.output_buffer = list(self.output_buffer)
        return c

    def _duplex(self):
        buf = self.input_buffer
        if buf:
            self.state = self.state.copy()
            self.state[: len(buf)] = np.asarray(buf, dtype=U32)
        self.state = self.perm_fn(self.state[None, :])[0]
        self.output_buffer = [int(x) for x in self.state[: self.RATE]]
        self.input_buffer = []

    def observe(self, value: int):
        self.output_buffer = []
        self.input_buffer.append(int(value) % self.field.P)
        if len(self.input_buffer) == self.RATE:
            self._duplex()

    def observe_slice(self, values):
        for v in np.asarray(values).reshape(-1):
            self.observe(int(v))

    def observe_ext(self, coeffs):
        """Observe an extension element coefficient-wise."""
        self.observe_slice(coeffs)

    def sample(self) -> int:
        if self.input_buffer or not self.output_buffer:
            self._duplex()
        return self.output_buffer.pop(0)

    def sample_ext(self, ext: BinomialExtension) -> np.ndarray:
        return np.asarray([self.sample() for _ in range(ext.D)], dtype=U32)

    def sample_bits(self, bits: int) -> int:
        assert 0 < bits < 31
        return self.sample() & ((1 << bits) - 1)

    def sample_vec(self, n: int) -> np.ndarray:
        return np.asarray([self.sample() for _ in range(n)], dtype=U32)

    def _grind_device(self, bits: int, batch: int = 1 << 19) -> int:
        """One device call tries 512k candidates; smallest hit wins (same
        witness the host batch scan finds).  At the standard 15-bit query
        PoW a 64k batch missed ~14% of the time, paying a second device
        round-trip; 512k candidates cost ~1ms more compute and miss with
        probability ~1e-7."""
        from ..ops.jitk import grind_fn

        k = len(self.input_buffer)
        fn = grind_fn(self.field, k, bits, batch)
        prefix = np.asarray(
            self.input_buffer or [0], dtype=U32
        )[: max(k, 1)]
        start = 0
        while True:
            w, found = fn(self.state, prefix, np.uint32(start))
            if bool(found):
                w = int(w)
                assert self.check_witness(bits, w), "grind witness recheck"
                return w
            start += batch

    # ----- PoW grinding (GrindingChallenger) -----

    def check_witness(self, bits: int, witness: int) -> bool:
        self.observe(witness)
        return self.sample_bits(bits) == 0

    def grind(self, bits: int, batch: int = 4096) -> int:
        """Find a witness in vectorized batches (device when the default
        Poseidon2 transcript is in use, C++/host otherwise); mutates self
        like the reference's grind (observe + sample_bits consumed)."""
        if bits == 0:
            assert self.check_witness(bits, 0)
            return 0
        if self.is_default_poseidon2:
            try:
                return self._grind_device(bits)
            except Exception:
                pass
        k = len(self.input_buffer)
        base_state = self.state
        prefix = np.asarray(self.input_buffer, dtype=U32)
        mask = (1 << bits) - 1
        start = 0
        while True:
            cand = (
                np.arange(start, start + batch, dtype=np.uint64) % self.field.P
            ).astype(U32)
            states = np.broadcast_to(base_state, (batch, self.WIDTH)).copy()
            if k:
                states[:, :k] = prefix
            states[:, k] = cand
            out = self.perm_fn(states)
            # first sample pops the front of the output buffer: state[0]
            samples = out[:, 0].astype(np.uint32)
            hits = np.nonzero((samples & mask) == 0)[0]
            if hits.size:
                w = int(cand[hits[0]])
                assert self.check_witness(bits, w), "grind witness recheck"
                return w
            start += batch

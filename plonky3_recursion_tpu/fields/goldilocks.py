"""Goldilocks field (p = 2^64 − 2^32 + 1) on u32 limb pairs.

TPU-native equivalent of the reference's upstream `p3-goldilocks`
(SURVEY.md §2.6).  TPUs have no native 64-bit integer path worth using, so
elements are arrays with a trailing limb dimension of 2: (..., [lo, hi])
canonical u32.  All ops are elementwise u32 arithmetic that XLA fuses, with
the classic Goldilocks reduction identities  2^64 ≡ 2^32 − 1  and
2^96 ≡ −1 (mod p).

This provides the L0 arithmetic layer (add/sub/mul/inv/pow, two-adic
generators — two-adicity 32).  Wiring Goldilocks through the full prover
(D=2 extension, Poseidon2 W8) is scheduled for a later round.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

from .monty31 import U32

P_GOLDILOCKS = (1 << 64) - (1 << 32) + 1
EPS = (1 << 32) - 1  # 2^64 mod p


def _split(x64: int):
    return np.uint32(x64 & 0xFFFFFFFF), np.uint32(x64 >> 32)


def _mulhilo32(a, b, xp):
    """u32×u32 -> (hi, lo) (same limb trick as Monty31)."""
    al = a & U32(0xFFFF)
    ah = a >> U32(16)
    bl = b & U32(0xFFFF)
    bh = b >> U32(16)
    ll = al * bl
    lh = al * bh
    hl = ah * bl
    mid = (ll >> U32(16)) + (lh & U32(0xFFFF)) + (hl & U32(0xFFFF))
    lo = a * b
    hi = ah * bh + (lh >> U32(16)) + (hl >> U32(16)) + (mid >> U32(16))
    return hi, lo


def _add64(alo, ahi, blo, bhi, xp):
    """(lo, hi, carry_out) of 64-bit addition on u32 limbs."""
    lo = alo + blo
    c0 = (lo < alo).astype(U32)
    hi = ahi + bhi
    c1 = (hi < ahi).astype(U32)
    hi2 = hi + c0
    c2 = (hi2 < hi).astype(U32)
    return lo, hi2, c1 + c2


@dataclasses.dataclass(frozen=True)
class Goldilocks:
    name: str = "goldilocks"
    P: int = P_GOLDILOCKS
    two_adicity: int = 32

    @functools.cached_property
    def generator(self) -> int:
        from .monty31 import _find_generator

        return _find_generator(self.P)

    def two_adic_generator(self, bits: int) -> int:
        assert 0 <= bits <= self.two_adicity
        return pow(self.generator, (self.P - 1) >> bits, self.P)

    # ----- representation -----

    def from_ints(self, xs) -> np.ndarray:
        arr = np.asarray(xs, dtype=object).reshape(-1)
        out = np.zeros((arr.size, 2), dtype=U32)
        for i, v in enumerate(arr):
            v = int(v) % self.P
            out[i, 0] = v & 0xFFFFFFFF
            out[i, 1] = v >> 32
        return out.reshape(np.shape(xs) + (2,))

    def to_ints(self, a: np.ndarray):
        a = np.asarray(a, dtype=np.uint64)
        return (a[..., 0] + (a[..., 1] << np.uint64(32))).astype(object)

    def rand(self, rng: np.random.Generator, shape):
        vals = rng.integers(0, self.P, size=shape, dtype=np.uint64)
        out = np.zeros(tuple(shape) + (2,), dtype=U32)
        out[..., 0] = (vals & 0xFFFFFFFF).astype(U32)
        out[..., 1] = (vals >> np.uint64(32)).astype(U32)
        return out

    # ----- reduction helpers -----

    def _canon(self, lo, hi, xp):
        """Reduce a value < 2^64 to canonical [0, p): subtract p once if
        needed (p = 2^64 − 2^32 + 1; v ≥ p iff hi == 2^32−1 and lo ≥ 1...
        precisely v − p = v + 2^32 − 1 − 2^64)."""
        # v >= p  <=>  hi == 0xFFFFFFFF and lo >= 0xFFFFFFFF... not exactly:
        # p = [1, 0xFFFFFFFF] in (lo, hi) limbs.
        ge = (hi == U32(0xFFFFFFFF)) & (lo >= U32(1))
        # v - p = (lo - 1, hi - 0xFFFFFFFF) = (lo - 1, 0) when ge
        lo2 = xp.where(ge, lo - U32(1), lo)
        hi2 = xp.where(ge, U32(0) * hi, hi)
        return lo2, hi2

    def _reduce128(self, t0, t1, t2, t3, xp):
        """Reduce t = t0 + t1·2^32 + t2·2^64 + t3·2^96 (u32 limbs with
        values < 2^32) mod p, using 2^64 ≡ 2^32 − 1, 2^96 ≡ −1."""
        # low 64 bits
        lo, hi = t0, t1
        # + t2·(2^32 − 1) = t2·2^32 − t2
        # first: lo64 = (lo, hi) − t2
        borrow = (lo < t2).astype(U32)
        lo = lo - t2
        hi_after = hi - borrow
        under1 = (hi < borrow).astype(U32)  # borrow out of 64 bits
        hi = hi_after
        # + t2·2^32: hi += t2 (carry out)
        hi2 = hi + t2
        carry1 = (hi2 < hi).astype(U32)
        hi = hi2
        # − t3 (2^96 ≡ −1)
        borrow2 = (lo < t3).astype(U32)
        lo = lo - t3
        hi_after = hi - borrow2
        under2 = (hi < borrow2).astype(U32)
        hi = hi_after
        # net wrap: carry1 adds 2^64 ≡ EPS; under1+under2 subtract 2^64 ≡ −EPS
        # apply each adjustment as ±EPS with its own carry fix
        def add_eps(lo, hi, times, xp):
            add = times * U32(EPS)
            lo2 = lo + add
            c = (lo2 < lo).astype(U32)
            hi2 = hi + c
            c2 = (hi2 < hi).astype(U32)
            return lo2, hi2, c2

        def sub_eps(lo, hi, times, xp):
            sub = times * U32(EPS)
            b = (lo < sub).astype(U32)
            lo2 = lo - sub
            hi2 = hi - b
            b2 = (hi < b).astype(U32)
            return lo2, hi2, b2

        lo, hi, c_extra = add_eps(lo, hi, carry1, xp)
        # fold any new carry (rare) once more
        lo, hi, c2 = add_eps(lo, hi, c_extra, xp)
        lo, hi, b_extra = sub_eps(lo, hi, under1 + under2, xp)
        lo, hi, b2 = sub_eps(lo, hi, b_extra, xp)
        # a subtract wrap means v went negative by k·2^64: add EPS per wrap
        lo, hi, c3 = add_eps(lo, hi, b2 * U32(0), xp)  # b2 should be 0 now
        return self._canon(lo, hi, xp)

    # ----- field ops -----

    def add(self, a, b, xp):
        lo, hi, carry = _add64(a[..., 0], a[..., 1], b[..., 0], b[..., 1], xp)
        # + carry·2^64 ≡ + carry·EPS
        lo2 = lo + carry * U32(EPS)
        c = (lo2 < lo).astype(U32)
        hi2 = hi + c
        # carry out of hi here is impossible: a,b < p
        lo3, hi3 = self._canon(lo2, hi2, xp)
        return xp.stack([lo3, hi3], axis=-1)

    def neg(self, a, xp):
        is_zero = (a[..., 0] == U32(0)) & (a[..., 1] == U32(0))
        plo, phi = U32(1), U32(0xFFFFFFFF)
        borrow = (U32(1) <= a[..., 0]).astype(U32) * 0  # compute p - a
        lo = plo - a[..., 0]
        b0 = (plo < a[..., 0]).astype(U32)
        hi = phi - a[..., 1] - b0
        lo = xp.where(is_zero, U32(0) * lo, lo)
        hi = xp.where(is_zero, U32(0) * hi, hi)
        return xp.stack([lo, hi], axis=-1)

    def sub(self, a, b, xp):
        return self.add(a, self.neg(b, xp), xp)

    def mul(self, a, b, xp):
        a0, a1 = a[..., 0], a[..., 1]
        b0, b1 = b[..., 0], b[..., 1]
        h00, l00 = _mulhilo32(a0, b0, xp)
        h01, l01 = _mulhilo32(a0, b1, xp)
        h10, l10 = _mulhilo32(a1, b0, xp)
        h11, l11 = _mulhilo32(a1, b1, xp)
        # t0 = l00
        t0 = l00
        # t1 = h00 + l01 + l10 (collect carries into t2)
        t1 = h00 + l01
        c1 = (t1 < h00).astype(U32)
        t1b = t1 + l10
        c2 = (t1b < t1).astype(U32)
        t1 = t1b
        # t2 = h01 + h10 + l11 + carries
        t2 = h01 + h10
        d1 = (t2 < h01).astype(U32)
        t2b = t2 + l11
        d2 = (t2b < t2).astype(U32)
        t2c = t2b + c1 + c2
        d3 = (t2c < t2b).astype(U32)
        t2 = t2c
        # t3 = h11 + carries
        t3 = h11 + d1 + d2 + d3
        return xp.stack(list(self._reduce128(t0, t1, t2, t3, xp)), axis=-1)

    def pow_static(self, a, e: int, xp):
        if e == 0:
            out = xp.zeros_like(a)
            if xp is np:
                out = out.copy()
                out[..., 0] = 1
                return out
            return out.at[..., 0].set(1)
        acc = None
        base = a
        while e:
            if e & 1:
                acc = base if acc is None else self.mul(acc, base, xp)
            e >>= 1
            if e:
                base = self.mul(base, base, xp)
        return acc

    def inv(self, a, xp):
        return self.pow_static(a, self.P - 2, xp)


GOLDILOCKS = Goldilocks()

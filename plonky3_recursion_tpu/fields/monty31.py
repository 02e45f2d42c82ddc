"""31-bit prime fields on u32 lanes (BabyBear, KoalaBear).

TPU-native equivalent of the reference's `p3-field`/`p3-monty-31`/
`p3-baby-bear`/`p3-koala-bear` upstream crates (SURVEY.md §2.6): modular
arithmetic on uint32 vectors, designed so every op is an elementwise XLA/VPU
op that fuses into surrounding kernels.

Representation convention
-------------------------
* The persistent data format is **canonical**: uint32 values in [0, p).
  Traces, digests, proofs, transcripts are all canonical, so host (numpy),
  device (jnp) and C++ golden code interoperate with zero conversion.
* Montgomery form (R = 2^32) is an *internal kernel detail*:
  ``monty_mul(x, y) = x*y*R^-1 mod p``.  Multiplying a canonical value by a
  constant pre-scaled into Monty form (``c_m = c*R mod p``) yields the
  canonical product in ONE monty_mul — so twiddle tables, round constants and
  diagonal matrices are stored in Monty form and constant-muls are cheap.
  Variable*variable multiplication lifts one operand to Monty form first.

All functions take the array namespace ``xp`` (jnp on device, numpy on host)
so a single implementation serves both; uint32 ops wrap mod 2^32 in both.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

U32 = np.uint32
MASK16 = 0xFFFF

# u32 wraparound is load-bearing in every kernel here (Montgomery folds,
# borrow tricks); numpy's 0-d overflow warnings are pure noise for us.
np.seterr(over="ignore")


def _pow_mod(b: int, e: int, m: int) -> int:
    return pow(b, e, m)


def _find_generator(p: int) -> int:
    """Smallest generator of F_p^* (python ints, runs once at import)."""
    order = p - 1
    factors = []
    n = order
    d = 2
    while d * d <= n:
        if n % d == 0:
            factors.append(d)
            while n % d == 0:
                n //= d
        d += 1
    if n > 1:
        factors.append(n)
    g = 2
    while True:
        if all(_pow_mod(g, order // q, p) != 1 for q in factors):
            return g
        g += 1


@dataclasses.dataclass(frozen=True)
class Monty31:
    """A 31-bit prime field with Montgomery constants precomputed."""

    name: str
    P: int  # prime modulus
    two_adicity: int
    ext_w: int  # binomial W for the degree-4 extension x^4 = W
    sbox_degree: int  # Poseidon S-box degree (x^d permutation)

    @functools.cached_property
    def NP(self) -> int:
        """-P^-1 mod 2^32 (Montgomery magic)."""
        return (-pow(self.P, -1, 1 << 32)) % (1 << 32)

    @functools.cached_property
    def R(self) -> int:
        return (1 << 32) % self.P

    @functools.cached_property
    def R2(self) -> int:
        return (self.R * self.R) % self.P

    @functools.cached_property
    def generator(self) -> int:
        return _find_generator(self.P)

    def two_adic_generator(self, bits: int) -> int:
        """Generator of the order-2^bits subgroup (canonical int)."""
        assert 0 <= bits <= self.two_adicity, (bits, self.two_adicity)
        return _pow_mod(self.generator, (self.P - 1) >> bits, self.P)

    # ----- constant preparation (host-side python ints) -----

    def to_monty_int(self, x: int) -> int:
        return (x * self.R) % self.P

    def monty_constant(self, x: int, xp=np):
        """Scalar constant pre-scaled into Monty form as uint32."""
        return xp.uint32(self.to_monty_int(x % self.P))

    def monty_array(self, xs, xp=np):
        """Array of canonical ints -> Monty-form uint32 array."""
        arr = np.asarray(
            [(int(x) % self.P * self.R) % self.P for x in np.asarray(xs).reshape(-1)],
            dtype=np.uint64,
        ).astype(np.uint32).reshape(np.shape(xs))
        return xp.asarray(arr) if xp is not np else arr

    # ----- elementwise field ops over uint32 arrays -----

    def add(self, a, b, xp):
        s = a + b  # a,b < p < 2^31 so no u32 overflow; dtype stays u32
        return xp.where(s >= U32(self.P), s - U32(self.P), s)

    def sub(self, a, b, xp):
        d = a - b  # wraps mod 2^32
        return xp.where(a >= b, d, d + U32(self.P))

    def neg(self, a, xp):
        return xp.where(a == U32(0), a, (U32(self.P) - a).astype(U32))

    def double(self, a, xp):
        return self.add(a, a, xp)

    @staticmethod
    def _mulhilo(a, b, xp):
        """32x32 -> (hi, lo) unsigned product via 16-bit limbs (4 muls).

        Inputs must already be uint32 arrays/scalars; all intermediate ops
        preserve the dtype (no astype copies — they dominated host time).
        """
        al = a & U32(MASK16)
        ah = a >> U32(16)
        bl = b & U32(MASK16)
        bh = b >> U32(16)
        ll = al * bl
        lh = al * bh
        hl = ah * bl
        hh = ah * bh
        # carry chain for the middle 32 bits
        mid = (ll >> U32(16)) + (lh & U32(MASK16)) + (hl & U32(MASK16))
        lo = a * b
        hi = hh + (lh >> U32(16)) + (hl >> U32(16)) + (mid >> U32(16))
        return hi, lo

    def monty_mul(self, a, b, xp):
        """(a * b * R^-1) mod p, result in [0, p)."""
        hi, lo = self._mulhilo(a, b, xp)
        m = lo * U32(self.NP)
        mp_hi, _ = self._mulhilo(m, U32(self.P), xp)
        # t + m*p == 0 mod 2^32, so low word cancels; carry iff lo != 0.
        carry = (lo != U32(0)).astype(U32)
        u = hi + mp_hi + carry  # < 2p < 2^32
        return xp.where(u >= U32(self.P), u - U32(self.P), u)

    def to_monty(self, a, xp):
        return self.monty_mul(a, U32(self.R2), xp)

    def from_monty(self, a, xp):
        """monty_mul(a, 1): cheaper reduction (no initial widening mul)."""
        m = a * U32(self.NP)
        mp_hi, _ = self._mulhilo(m, U32(self.P), xp)
        carry = (a != U32(0)).astype(U32)
        u = mp_hi + carry
        return xp.where(u >= U32(self.P), u - U32(self.P), u)

    def mul(self, a, b, xp):
        """Canonical a * canonical b -> canonical (2 monty_muls)."""
        return self.monty_mul(self.to_monty(a, xp), b, xp)

    def mul_monty_const(self, a, c_m, xp):
        """Canonical a times constant stored in Monty form (1 monty_mul)."""
        return self.monty_mul(a, c_m, xp)

    def pow_static(self, a, e: int, xp):
        """a^e for a *python-int* exponent (unrolled square&multiply)."""
        if e == 0:
            return xp.full_like(a, U32(1))
        am = self.to_monty(a, xp)
        acc = None
        base = am
        ee = e
        while ee:
            if ee & 1:
                acc = base if acc is None else self.monty_mul(acc, base, xp)
            ee >>= 1
            if ee:
                base = self.monty_mul(base, base, xp)
        return self.from_monty(acc, xp)

    def inv(self, a, xp):
        """Fermat inverse a^(p-2); inv(0) = 0 (caller beware)."""
        return self.pow_static(a, self.P - 2, xp)

    # ----- misc -----

    def rand(self, rng: np.random.Generator, shape):
        return rng.integers(0, self.P, size=shape, dtype=np.uint64).astype(U32)


# Field instances. sbox_degree = smallest d >= 3 with gcd(d, p-1) == 1,
# matching the reference's Poseidon2 instantiations (BabyBear x^7, KoalaBear
# x^3; see SURVEY.md §2.6 row p3-poseidon2).
BABY_BEAR = Monty31(
    name="baby_bear",
    P=(1 << 31) - (1 << 27) + 1,  # 2013265921
    two_adicity=27,
    ext_w=11,
    sbox_degree=7,
)

KOALA_BEAR = Monty31(
    name="koala_bear",
    P=(1 << 31) - (1 << 24) + 1,  # 2130706433
    two_adicity=24,
    ext_w=3,
    sbox_degree=3,
)

FIELDS = {f.name: f for f in (BABY_BEAR, KOALA_BEAR)}

"""Binomial extension fields F_p[x]/(x^D - W) over Monty31 base fields.

TPU-native equivalent of the reference's `BinomialExtensionField<F, D>`
(SURVEY.md §2.6, `p3-field`).  Extension elements are arrays with a trailing
dimension of size D holding base-coefficient canonical u32 values — the same
"D-scaled" layout the reference uses for witness bus tuples
(`circuit/src/types.rs:400`, WitnessId scaled by D).

All ops are elementwise/unrolled over the trailing dim so XLA fuses them.
Multiplication: one operand is lifted to Monty form once, then D*D
monty_muls + W-reduction; W-scaled terms fold the constant W into the
reduction via a Monty-form W constant.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

from .monty31 import Monty31, U32


def _irreducibility_check(p: int, w: int, d: int) -> bool:
    """Lidl–Niederreiter 3.75 for x^d − w: irreducible over F_p iff every
    prime q | d divides p − 1 with w not a q-th power, and (when 4 | d)
    p ≡ 1 mod 4.  Notably rejects d = 6 over KoalaBear (3 ∤ p − 1, so
    EVERY element is a cube and x^6 − w always factors)."""
    if d == 1:
        return True
    q = 2
    dd = d
    primes = set()
    while dd > 1:
        while dd % q == 0:
            primes.add(q)
            dd //= q
        q += 1
    for q in primes:
        if (p - 1) % q != 0:
            return False
        if pow(w, (p - 1) // q, p) == 1:
            return False  # w is a q-th power
    if d % 4 == 0 and p % 4 != 1:
        return False
    return True


@dataclasses.dataclass(frozen=True)
class BinomialExtension:
    """Degree-D binomial extension of a Monty31 field, x^D = W."""

    base: Monty31
    D: int
    # per-degree W override: the field's default ext_w suits power-of-two
    # degrees; other degrees may need a different non-residue (BabyBear
    # D=6 uses W=22 — non-square AND non-cube)
    w_override: int | None = None

    def __post_init__(self):
        assert _irreducibility_check(self.base.P, self.W, self.D), (
            f"x^{self.D} - {self.W} reducible over {self.base.name}"
        )

    @property
    def W(self) -> int:
        return self.w_override or self.base.ext_w

    @functools.cached_property
    def w_monty(self) -> np.uint32:
        return self.base.monty_constant(self.W)

    @functools.cached_property
    def frob_consts(self) -> np.ndarray:
        """c^i for c = W^((p-1)/D): Frobenius x -> x * c (Monty form)."""
        p = self.base.P
        c = pow(self.W, (p - 1) // self.D, p)
        return self.base.monty_array([pow(c, i, p) for i in range(self.D)])

    # ----- construction -----

    def zeros(self, shape, xp):
        return xp.zeros(tuple(shape) + (self.D,), dtype=U32)

    def from_base(self, a, xp):
        """Embed base elements (shape S) as ext elements (shape S + (D,))."""
        out = xp.zeros(a.shape + (self.D,), dtype=U32)
        if xp is np:
            out[..., 0] = a
            return out
        return out.at[..., 0].set(a)

    def scalar(self, coeffs, xp):
        return xp.asarray(np.asarray(coeffs, dtype=np.uint64) % self.base.P).astype(U32)

    # ----- arithmetic (trailing dim D) -----

    def add(self, a, b, xp):
        return self.base.add(a, b, xp)

    def sub(self, a, b, xp):
        return self.base.sub(a, b, xp)

    def neg(self, a, xp):
        return self.base.neg(a, xp)

    def _mul_monty_rhs(self, a, b_m, xp):
        """a (canonical) * b_m (coeffs in Monty form) -> canonical.

        ONE broadcast monty_mul computes all D*D coefficient products at
        once; anti-diagonal sums c_k = Σ_{i+j=k} come from a shear-pad +
        D-term modular add tree, and x^D = W folds the overflow columns
        back.  ~25 array ops per ext mul instead of ~200 — the symbolic
        constraint evaluators trace tens of thousands of ext muls, and the
        per-op dispatch cost of the unrolled form dominated both tracing
        and XLA compile time.
        """
        F = self.base
        D = self.D
        if D == 1:
            return F.monty_mul(a, b_m, xp)
        # (..., D_i, D_j) all pairwise products in one op
        prod = F.monty_mul(a[..., :, None], b_m[..., None, :], xp)
        if xp is np:
            # host fast path: slice-accumulate into a preallocated buffer
            # (np.pad's per-call overhead dominated small host ext muls —
            # the Horner NPO executes thousands per witness generation)
            acc = np.zeros(prod.shape[:-2] + (2 * D - 1,), dtype=prod.dtype)
            for i in range(D):
                seg = acc[..., i : i + D]
                acc[..., i : i + D] = F.add(seg, prod[..., i, :], np)
            lo = acc[..., :D]
            hi_fold = F.monty_mul(acc[..., D:], self.w_monty, np)
            out = lo.copy()
            out[..., : D - 1] = F.add(lo[..., : D - 1], hi_fold, np)
            return out
        # shear: row i shifted right by i over width 2D-1, then mod-p sum
        pad_spec = [(0, 0)] * (prod.ndim - 2)
        sheared = [
            xp.pad(prod[..., i, :], pad_spec + [(i, D - 1 - i)])
            for i in range(D)
        ]
        acc = sheared[0]
        for t in sheared[1:]:
            acc = F.add(acc, t, xp)  # (..., 2D-1)
        lo = acc[..., :D]
        hi_fold = F.monty_mul(acc[..., D:], self.w_monty, xp)  # (..., D-1)
        hi = xp.pad(hi_fold, pad_spec + [(0, 1)])
        return F.add(lo, hi, xp)

    def mul(self, a, b, xp):
        b_m = self.base.to_monty(b, xp)
        return self._mul_monty_rhs(a, b_m, xp)

    def mul_base(self, a, s, xp):
        """Ext a times base-field s (canonical), broadcast over coeffs."""
        s_m = self.base.to_monty(s, xp)
        return self.base.monty_mul(a, s_m[..., None], xp)

    def square(self, a, xp):
        return self.mul(a, a, xp)

    def pow_static(self, a, e: int, xp):
        if e == 0:
            return self.from_base(xp.ones(a.shape[:-1], dtype=U32), xp)
        acc = None
        base = a
        while e:
            if e & 1:
                acc = base if acc is None else self.mul(acc, base, xp)
            e >>= 1
            if e:
                base = self.mul(base, base, xp)
        return acc

    def frobenius(self, a, k: int, xp):
        """a^(p^k): coeff_i *= (W^((p-1)/D))^(i*k)."""
        p = self.base.P
        c = pow(self.W, (p - 1) // self.D, p)
        consts = self.base.monty_array(
            [pow(c, (i * k) % (p - 1), p) for i in range(self.D)]
        )
        consts = xp.asarray(consts)
        return self.base.monty_mul(a, consts, xp)

    def inv(self, a, xp):
        """a^-1 via norm: a^-1 = (prod_{k=1}^{D-1} a^(p^k)) / Norm(a)."""
        conj = self.frobenius(a, 1, xp)
        for k in range(2, self.D):
            conj = self.mul(conj, self.frobenius(a, k, xp), xp)
        # norm = a * conj is in the base field (coefficient 0)
        norm = self.mul(a, conj, xp)[..., 0]
        return self.mul_base(conj, self.base.inv(norm, xp), xp)

    def rand(self, rng: np.random.Generator, shape):
        return self.base.rand(rng, tuple(shape) + (self.D,))


# degrees whose irreducible binomial needs a different W than the field
# default (checked by _irreducibility_check at construction)
_W_BY_DEGREE = {("baby_bear", 6): 22}


@functools.lru_cache(maxsize=None)
def ext_field(base: Monty31, d: int) -> BinomialExtension:
    return BinomialExtension(base, d, _W_BY_DEGREE.get((base.name, d)))


@dataclasses.dataclass(frozen=True)
class QuinticTrinomialExtension:
    """F_p[x]/(x^5 + x^2 − 1): the reference's KoalaBear quintic extension
    (`QuinticTrinomialExtensionField`, SURVEY.md §2.6 / §2.2
    `alu_quintic_trinomial`).  Same trailing-dim-D layout as the binomial
    extensions; reduction uses x^5 = 1 − x^2 iteratively for degrees 5..8.
    Inversion is a Fermat power (no cheap Frobenius for trinomials)."""

    base: Monty31
    D: int = 5

    def zeros(self, shape, xp):
        return xp.zeros(tuple(shape) + (self.D,), dtype=U32)

    def from_base(self, a, xp):
        out = xp.zeros(np.shape(a) + (self.D,), dtype=U32)
        if xp is np:
            out[..., 0] = a
            return out
        return out.at[..., 0].set(a)

    def add(self, a, b, xp):
        return self.base.add(a, b, xp)

    def sub(self, a, b, xp):
        return self.base.sub(a, b, xp)

    def neg(self, a, xp):
        return self.base.neg(a, xp)

    def mul(self, a, b, xp):
        F = self.base
        d = self.D
        b_m = F.to_monty(b, xp)
        # schoolbook: c_k for k in 0..8
        cols = []
        for k in range(2 * d - 1):
            acc = None
            for i in range(max(0, k - d + 1), min(d, k + 1)):
                t = F.monty_mul(a[..., i], b_m[..., k - i], xp)
                acc = t if acc is None else F.add(acc, t, xp)
            cols.append(acc)
        # reduce with x^{5+j} = x^j − x^{2+j}, descending k so the k=8 term
        # cascades into x^5 before x^5 itself is reduced
        for k in range(2 * d - 2, d - 1, -1):
            j = k - d
            v = cols[k]
            cols[j] = F.add(cols[j], v, xp)
            cols[2 + j] = F.sub(cols[2 + j], v, xp)
        return xp.stack(cols[:d], axis=-1)

    def mul_base(self, a, s, xp):
        s_m = self.base.to_monty(s, xp)
        return self.base.monty_mul(a, s_m[..., None], xp)

    def pow_static(self, a, e: int, xp):
        if e == 0:
            return self.from_base(xp.ones(np.shape(a)[:-1], dtype=U32), xp)
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
        p = self.base.P
        return self.pow_static(a, p**self.D - 2, xp)

    def rand(self, rng: np.random.Generator, shape):
        return self.base.rand(rng, tuple(shape) + (self.D,))

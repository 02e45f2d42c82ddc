"""Two-adic multiplicative coset domains + Lagrange selectors.

TPU-native equivalent of the reference's upstream `p3-commit`
(`TwoAdicMultiplicativeCoset`, `selectors_at_point`; SURVEY.md §2.6).
Pure host-side domain algebra producing cached numpy constant tables that
device kernels consume.

Selector convention (matches the reference's unnormalized selectors,
`RecursiveLagrangeSelectors` SURVEY.md §2.4): with x' = x / shift,
  Z_H(x)        = x'^n - 1
  is_first_row  = Z_H / (x' - 1)
  is_last_row   = Z_H / (x' - g^{-1})
  is_transition = x' - g^{-1}
  inv_vanishing = 1 / Z_H
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

from ..fields.extension import BinomialExtension
from ..fields.monty31 import Monty31, U32


@functools.lru_cache(maxsize=None)
def domain_points(field: Monty31, log_n: int, shift: int) -> np.ndarray:
    """[shift * w^i for i < 2^n] canonical, natural order (host table)."""
    p = field.P
    n = 1 << log_n
    w = field.two_adic_generator(log_n)
    pts = np.zeros(n, dtype=np.uint64)
    pts[0] = shift % p
    size = 1
    while size < n:
        factor = pow(w, size, p)
        pts[size : 2 * size] = pts[:size] * factor % p
        size *= 2
    return pts.astype(U32)


@dataclasses.dataclass(frozen=True)
class TwoAdicCoset:
    """The coset shift * <w> of size 2^log_n."""

    field: Monty31
    log_n: int
    shift: int  # canonical int

    @property
    def size(self) -> int:
        return 1 << self.log_n

    @property
    def gen(self) -> int:
        return self.field.two_adic_generator(self.log_n)

    def points(self) -> np.ndarray:
        return domain_points(self.field, self.log_n, self.shift)

    def next_point(self, x: int) -> int:
        return x * self.gen % self.field.P

    def selectors_at_point(self, E: BinomialExtension, zeta: np.ndarray, xp):
        """zeta: (D,) ext point off-domain. Returns dict of (D,) values."""
        F = self.field
        p = F.P
        n = self.size
        s_inv = pow(self.shift, p - 2, p)
        xs = E.mul_base(zeta, np.uint32(s_inv), xp)  # x'
        z_h = E.sub(
            E.pow_static(xs, n, xp),
            E.from_base(xp.asarray(np.uint32(1)), xp),
            xp,
        )
        one = E.from_base(xp.asarray(np.uint32(1)), xp)
        g_inv = E.from_base(
            xp.asarray(np.uint32(pow(self.gen, p - 2, p))), xp
        )
        first_den = E.sub(xs, one, xp)
        last_den = E.sub(xs, g_inv, xp)
        inv_z_h = E.inv(z_h, xp)
        return {
            "first": E.mul(z_h, E.inv(first_den, xp), xp),
            "last": E.mul(z_h, E.inv(last_den, xp), xp),
            "transition": last_den,
            "inv_vanishing": inv_z_h,
            "z_h": z_h,
        }


@functools.lru_cache(maxsize=None)
def lde_selectors(
    field: Monty31, log_n: int, log_expand: int, shift: int
) -> dict:
    """Selector arrays over the coset shift*K of size 2^(log_n+log_expand),
    natural order, for the trace domain H of size 2^log_n (shift 1).

    Returns base-field (M,) canonical arrays: first/last/transition and
    inv_vanishing.  Host-cached constants (periodic structure exploited:
    x^n cycles with period 2^log_expand).
    """
    p = field.P
    n = 1 << log_n
    m = n << log_expand
    pts = domain_points(field, log_n + log_expand, shift).astype(np.uint64)
    # x^n is periodic with period 2^log_expand
    head = pts[: 1 << log_expand]
    xn_head = np.asarray([pow(int(x), n, p) for x in head], dtype=np.uint64)
    xn = np.tile(xn_head, n)
    z_h = (xn + p - 1) % p
    g_inv = pow(field.two_adic_generator(log_n), p - 2, p)
    first_den = ((pts + p - 1) % p).astype(U32)
    last_den = ((pts + p - g_inv) % p).astype(U32)
    z_h32 = z_h.astype(U32)
    inv_z_h = np.tile(field.inv(z_h32[: 1 << log_expand], np), n)
    first = field.mul(z_h32, field.inv(first_den, np), np)
    last = field.mul(z_h32, field.inv(last_den, np), np)
    return {
        "first": first,
        "last": last,
        "transition": last_den,
        "inv_vanishing": inv_z_h,
    }


def periodic_lde(field, col, log_n: int, log_expand: int, xp=np):
    """Evaluate the periodic extension of `col` (length L power of two,
    canonical u32, period dividing 2^log_n) over the generator-shifted
    coset of size 2^(log_n+log_expand), natural order.

    c(x) = p(x^{n/L}) with p the degree<L interpolant of `col` on the
    size-L subgroup; on the coset the argument runs over the size
    L·2^log_expand coset with shift g^{n/L}, so one small LDE + tiling
    suffices (reference `verifier/periodic.rs` evaluates the same p).
    """
    from ..ops.ntt import _power_table, intt, ntt

    p = field.P
    col = np.asarray(col, dtype=U32)
    L = col.shape[0]
    n = 1 << log_n
    assert L & (L - 1) == 0 and L <= n
    step = n // L
    m2 = L << log_expand
    coeffs = intt(field, xp.asarray(col)[:, None], xp)
    gs = pow(int(field.generator), step, p)
    gpow = xp.asarray(_power_table(field, gs, L))
    scaled = field.monty_mul(coeffs, gpow[:, None], xp)
    evals = ntt(field, xp.pad(scaled, [(0, m2 - L), (0, 0)]), xp)[:, 0]
    return xp.tile(evals, (n << log_expand) // m2)


def periodic_at_point(field, ext, col, log_n: int, zeta, xp=np):
    """c(ζ) = p(ζ^{n/L}) as a (D,) extension value (the verifier-side
    evaluation; in-circuit this is exp_power_of_2 + a Horner chain)."""
    from ..ops.ntt import intt

    col = np.asarray(col, dtype=U32)
    L = col.shape[0]
    step = (1 << log_n) // L
    zs = np.asarray(zeta, dtype=U32)
    s = step
    while s > 1:
        zs = ext.mul(zs, zs, xp)
        s >>= 1
    coeffs = intt(field, col[:, None], xp)[:, 0]
    acc = np.zeros((ext.D,), dtype=U32)
    for c in reversed([int(x) for x in coeffs]):
        acc = ext.add(
            ext.mul(acc, zs, xp),
            ext.from_base(np.asarray([c], dtype=U32), xp)[0],
            xp,
        )
    return acc

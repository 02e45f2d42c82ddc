"""KoalaBear quintic trinomial extension x^5 + x^2 - 1 (SURVEY.md §2.6)."""

import numpy as np
import pytest

from plonky3_recursion_tpu.fields import KOALA_BEAR as F
from plonky3_recursion_tpu.fields.extension import QuinticTrinomialExtension

E = QuinticTrinomialExtension(F)


def test_mul_matches_polynomial(rng):
    a = E.rand(rng, (16,))
    b = E.rand(rng, (16,))
    got = E.mul(a, b, np)
    p = F.P
    for n in range(16):
        c = [0] * 9
        for i in range(5):
            for j in range(5):
                c[i + j] += int(a[n, i]) * int(b[n, j])
        for k in range(8, 4, -1):
            jj = k - 5
            c[jj] += c[k]
            c[2 + jj] -= c[k]
        assert [int(x) for x in got[n]] == [v % p for v in c[:5]]


def test_defining_relation():
    x = np.zeros((1, 5), dtype=np.uint32)
    x[0, 1] = 1
    s = E.add(E.pow_static(x, 5, np), E.pow_static(x, 2, np), np)
    s = E.sub(s, E.from_base(np.uint32([1]), np), np)
    assert not np.any(s)


def test_inverse_and_associativity(rng):
    a = E.rand(rng, (8,))
    b = E.rand(rng, (8,))
    c = E.rand(rng, (8,))
    assert np.array_equal(
        E.mul(E.mul(a, b, np), c, np), E.mul(a, E.mul(b, c, np), np)
    )
    one = E.mul(a, E.inv(a, np), np)
    want = E.from_base(np.ones(8, dtype=np.uint32), np)
    assert np.array_equal(one, want)

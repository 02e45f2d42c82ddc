"""Field arithmetic vs python-int ground truth (SURVEY.md §4: kernel-vs-
reference property tests, L0 exit criterion)."""

import numpy as np
import pytest

import jax.numpy as jnp

from plonky3_recursion_tpu.fields import BABY_BEAR, KOALA_BEAR, ext_field

FIELDS = [BABY_BEAR, KOALA_BEAR]
XPS = [np, jnp]


def ints(a):
    return np.asarray(a, dtype=np.uint64)


@pytest.mark.parametrize("F", FIELDS, ids=lambda f: f.name)
@pytest.mark.parametrize("xp", XPS, ids=["np", "jnp"])
def test_add_sub_neg(F, xp, rng):
    a = F.rand(rng, (257,))
    b = F.rand(rng, (257,))
    ax, bx = xp.asarray(a), xp.asarray(b)
    assert np.array_equal(np.asarray(F.add(ax, bx, xp)), (ints(a) + ints(b)) % F.P)
    assert np.array_equal(
        np.asarray(F.sub(ax, bx, xp)), (ints(a) + F.P - ints(b)) % F.P
    )
    assert np.array_equal(np.asarray(F.neg(ax, xp)), (F.P - ints(a)) % F.P)


@pytest.mark.parametrize("F", FIELDS, ids=lambda f: f.name)
@pytest.mark.parametrize("xp", XPS, ids=["np", "jnp"])
def test_mul(F, xp, rng):
    a = F.rand(rng, (513,))
    b = F.rand(rng, (513,))
    got = np.asarray(F.mul(xp.asarray(a), xp.asarray(b), xp))
    assert np.array_equal(got, (ints(a) * ints(b)) % F.P)
    # edge cases
    edge = np.array([0, 1, F.P - 1, F.P - 2, 2], dtype=np.uint32)
    got = np.asarray(F.mul(xp.asarray(edge), xp.asarray(edge[::-1].copy()), xp))
    assert np.array_equal(got, (ints(edge) * ints(edge[::-1])) % F.P)


@pytest.mark.parametrize("F", FIELDS, ids=lambda f: f.name)
def test_monty_roundtrip_and_const(F, rng):
    a = F.rand(rng, (100,))
    m = F.to_monty(a, np)
    assert np.array_equal(F.from_monty(m, np), a)
    c = 123456789 % F.P
    cm = F.monty_constant(c)
    got = F.mul_monty_const(a, cm, np)
    assert np.array_equal(got, (ints(a) * c) % F.P)


@pytest.mark.parametrize("F", FIELDS, ids=lambda f: f.name)
def test_inv_pow(F, rng):
    a = F.rand(rng, (64,))
    a[0] = 1
    inv = F.inv(a, np)
    assert np.array_equal(F.mul(a, inv, np), np.ones_like(a))
    assert np.array_equal(
        F.pow_static(a, 5, np), np.asarray([pow(int(x), 5, F.P) for x in a])
    )
    assert np.array_equal(F.pow_static(a, 0, np), np.ones_like(a))


@pytest.mark.parametrize("F", FIELDS, ids=lambda f: f.name)
def test_two_adic_generator(F):
    for bits in (1, 2, 10, F.two_adicity):
        g = F.two_adic_generator(bits)
        assert pow(g, 1 << bits, F.P) == 1
        assert pow(g, 1 << (bits - 1), F.P) != 1
    assert F.two_adic_generator(1) == F.P - 1


@pytest.mark.parametrize("F", FIELDS, ids=lambda f: f.name)
@pytest.mark.parametrize("D", [2, 4])
@pytest.mark.parametrize("xp", XPS, ids=["np", "jnp"])
def test_ext_mul_matches_poly(F, D, xp, rng):
    E = ext_field(F, D)
    a = E.rand(rng, (33,))
    b = E.rand(rng, (33,))
    got = np.asarray(E.mul(xp.asarray(a), xp.asarray(b), xp))
    # schoolbook with python ints
    P, W = F.P, E.W
    want = np.zeros_like(a)
    for n in range(a.shape[0]):
        c = [0] * (2 * D)
        for i in range(D):
            for j in range(D):
                c[i + j] += int(a[n, i]) * int(b[n, j])
        for k in range(D):
            want[n, k] = (c[k] + W * c[k + D]) % P
    assert np.array_equal(got, want)


@pytest.mark.parametrize("F", FIELDS, ids=lambda f: f.name)
@pytest.mark.parametrize("D", [2, 4])
def test_ext_inv_frobenius(F, D, rng):
    E = ext_field(F, D)
    a = E.rand(rng, (16,))
    inv = E.inv(a, np)
    one = E.from_base(np.ones((16,), dtype=np.uint32), np)
    assert np.array_equal(E.mul(a, inv, np), one)
    # frobenius is the p-power map
    fr = E.frobenius(a, 1, np)
    assert np.array_equal(fr, E.pow_static(a, F.P, np))


@pytest.mark.parametrize("F", FIELDS, ids=lambda f: f.name)
def test_ext_mul_base_and_associativity(F, rng):
    E = ext_field(F, 4)
    a = E.rand(rng, (8,))
    b = E.rand(rng, (8,))
    c = E.rand(rng, (8,))
    lhs = E.mul(E.mul(a, b, np), c, np)
    rhs = E.mul(a, E.mul(b, c, np), np)
    assert np.array_equal(lhs, rhs)
    s = F.rand(rng, (8,))
    got = E.mul_base(a, s, np)
    want = E.mul(a, E.from_base(s, np), np)
    assert np.array_equal(got, want)

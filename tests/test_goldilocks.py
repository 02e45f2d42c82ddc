"""Goldilocks u32-limb arithmetic vs python-int ground truth."""

import numpy as np
import pytest

import jax.numpy as jnp

from plonky3_recursion_tpu.fields.goldilocks import GOLDILOCKS as G


@pytest.mark.parametrize("xp", [np, jnp], ids=["np", "jnp"])
def test_add_sub_mul(xp, rng):
    a = G.rand(rng, (501,))
    b = G.rand(rng, (501,))
    ai, bi = G.to_ints(a), G.to_ints(b)
    got = G.to_ints(np.asarray(G.add(xp.asarray(a), xp.asarray(b), xp)))
    assert all(int(g) == (int(x) + int(y)) % G.P for g, x, y in zip(got, ai, bi))
    got = G.to_ints(np.asarray(G.sub(xp.asarray(a), xp.asarray(b), xp)))
    assert all(
        int(g) == (int(x) - int(y)) % G.P for g, x, y in zip(got, ai, bi)
    )
    got = G.to_ints(np.asarray(G.mul(xp.asarray(a), xp.asarray(b), xp)))
    assert all(
        int(g) == (int(x) * int(y)) % G.P for g, x, y in zip(got, ai, bi)
    )


def test_edge_values():
    edges = [0, 1, G.P - 1, G.P - 2, (1 << 32) - 1, 1 << 32, (1 << 63)]
    a = G.from_ints(edges)
    for i, x in enumerate(edges):
        for j, y in enumerate(edges):
            s = G.to_ints(G.add(a[i : i + 1], a[j : j + 1], np))[0]
            assert int(s) == (x + y) % G.P, (x, y)
            m = G.to_ints(G.mul(a[i : i + 1], a[j : j + 1], np))[0]
            assert int(m) == (x * y) % G.P, (x, y)
            d = G.to_ints(G.sub(a[i : i + 1], a[j : j + 1], np))[0]
            assert int(d) == (x - y) % G.P, (x, y)


def test_inv_and_two_adicity(rng):
    a = G.rand(rng, (16,))
    inv = G.inv(a, np)
    prod = G.to_ints(G.mul(a, inv, np))
    assert all(int(x) == 1 for x in prod)
    g = G.two_adic_generator(32)
    assert pow(g, 1 << 32, G.P) == 1
    assert pow(g, 1 << 31, G.P) != 1
    assert G.two_adic_generator(1) == G.P - 1

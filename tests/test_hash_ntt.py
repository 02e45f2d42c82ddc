"""Poseidon2 / sponge / NTT / Merkle / challenger unit tests (SURVEY.md §4
pyramid levels 1–3: scalar goldens, kernel-vs-reference, transcript rules)."""

import numpy as np
import pytest

import jax.numpy as jnp

from plonky3_recursion_tpu.fields import BABY_BEAR, KOALA_BEAR
from plonky3_recursion_tpu.ops import ntt as nttmod
from plonky3_recursion_tpu.ops.hashing import compress_pair, sponge_hash
from plonky3_recursion_tpu.ops.poseidon2 import (
    permute,
    permute_scalar,
    poseidon2_params,
)
from plonky3_recursion_tpu.stark.challenger import DuplexChallenger
from plonky3_recursion_tpu.stark.merkle import MerkleMmcs, flatten_ext_matrix

FIELDS = [BABY_BEAR, KOALA_BEAR]


@pytest.mark.parametrize("F", FIELDS, ids=lambda f: f.name)
@pytest.mark.parametrize("width", [16, 24])
def test_poseidon2_vs_scalar(F, width, rng):
    params = poseidon2_params(F, width)
    states = F.rand(rng, (5, width))
    got_np = permute(params, states, np)
    got_jnp = np.asarray(permute(params, jnp.asarray(states), jnp))
    assert np.array_equal(got_np, got_jnp)
    for i in range(states.shape[0]):
        want = permute_scalar(params, states[i])
        assert [int(x) for x in got_np[i]] == want


@pytest.mark.parametrize("F", FIELDS, ids=lambda f: f.name)
def test_poseidon2_bijective_smoke(F, rng):
    params = poseidon2_params(F, 16)
    a = F.rand(rng, (64, 16))
    outs = permute(params, a, np)
    assert len({tuple(r) for r in outs.tolist()}) == 64  # no collisions
    z = permute(params, np.zeros((1, 16), dtype=np.uint32), np)
    assert np.any(z != 0)


def test_sponge_and_compress(rng):
    F = KOALA_BEAR
    params = poseidon2_params(F, 16)
    rows = F.rand(rng, (4, 19))  # 19 cols -> chunks 8,8,3
    d = sponge_hash(params, rows, 8, 8, np)
    assert d.shape == (4, 8)
    # manual replay for row 0
    state = np.zeros((1, 16), dtype=np.uint32)
    for s in (0, 8, 16):
        chunk = rows[0:1, s : s + 8]
        state = state.copy()
        state[:, : chunk.shape[1]] = chunk
        state = permute(params, state, np)
    assert np.array_equal(d[0], state[0, :8])
    l = F.rand(rng, (3, 8))
    r = F.rand(rng, (3, 8))
    c = compress_pair(params, l, r, np)
    state = np.concatenate([l, r], axis=1)
    assert np.array_equal(c, permute(params, state, np)[:, :8])


@pytest.mark.parametrize("F", FIELDS, ids=lambda f: f.name)
@pytest.mark.parametrize("xp", [np, jnp], ids=["np", "jnp"])
def test_ntt_matches_naive(F, xp, rng):
    n = 16
    x = F.rand(rng, (n, 3))
    got = np.asarray(nttmod.ntt(F, xp.asarray(x), xp))
    w = F.two_adic_generator(4)
    p = F.P
    want = np.zeros_like(x)
    for k in range(n):
        for c in range(3):
            want[k, c] = sum(
                int(x[j, c]) * pow(w, j * k, p) for j in range(n)
            ) % p
    assert np.array_equal(got, want)


@pytest.mark.parametrize("F", FIELDS, ids=lambda f: f.name)
def test_intt_roundtrip(F, rng):
    x = F.rand(rng, (64, 5))
    y = nttmod.ntt(F, x, np)
    back = nttmod.intt(F, y, np)
    assert np.array_equal(back, x)


@pytest.mark.parametrize("F", FIELDS, ids=lambda f: f.name)
def test_coset_lde_consistency(F, rng):
    """LDE evals must match direct evaluation of the interpolant."""
    n, blow = 8, 1
    x = F.rand(rng, (n, 2))
    lde = nttmod.coset_lde(F, x, blow, np, bitrev_out=False)
    coeffs = nttmod.intt(F, x, np)
    p = F.P
    g = F.generator
    w = F.two_adic_generator(4)  # size-16 subgroup
    for i in range(n << blow):
        pt = g * pow(w, i, p) % p
        for c in range(2):
            want = sum(int(coeffs[j, c]) * pow(pt, j, p) for j in range(n)) % p
            assert int(lde[i, c]) == want
    # degree check: original evals live on the even-indexed subgroup points?
    # interpolate LDE back down: coefficients beyond n must vanish
    full_coeffs = nttmod.intt(F, nttmod.coset_lde(F, x, 2, np, shift=1, bitrev_out=False), np)
    assert np.all(full_coeffs[n:] == 0)
    assert np.array_equal(full_coeffs[:n], coeffs)


def test_bit_reverse_involution(rng):
    x = KOALA_BEAR.rand(rng, (32, 2))
    br = nttmod.bit_reverse_rows(x, np)
    assert np.array_equal(nttmod.bit_reverse_rows(br, np), x)
    assert not np.array_equal(br, x)


@pytest.mark.parametrize("F", FIELDS, ids=lambda f: f.name)
def test_merkle_commit_verify(F, rng):
    mmcs = MerkleMmcs(F)
    mats = [
        F.rand(rng, (16, 3)),
        F.rand(rng, (16, 5)),
        F.rand(rng, (4, 2)),
        F.rand(rng, (8, 1)),
    ]
    root, tree = mmcs.commit(mats)
    dims = [(m.shape[0], m.shape[1]) for m in mats]
    for index in (0, 7, 15):
        opened, path = mmcs.open_batch(index, tree)
        assert mmcs.verify_batch(root, dims, index, opened, path)
        # tamper: flip an opened value
        bad = [r.copy() for r in opened]
        bad[1][0] ^= 1
        assert not mmcs.verify_batch(root, dims, index, bad, path)
        # tamper: wrong index
        assert not mmcs.verify_batch(root, dims, index ^ 1, opened, path)


def test_merkle_jnp_matches_np(rng):
    F = KOALA_BEAR
    mmcs = MerkleMmcs(F)
    mats = [F.rand(rng, (8, 4)), F.rand(rng, (4, 2))]
    root_np, _ = mmcs.commit(mats, np)
    root_jnp, _ = mmcs.commit([jnp.asarray(m) for m in mats], jnp)
    assert np.array_equal(root_np, np.asarray(root_jnp))


def test_ext_flatten(rng):
    from plonky3_recursion_tpu.fields import ext_field

    E = ext_field(KOALA_BEAR, 4)
    m = E.rand(rng, (4, 3))
    flat = flatten_ext_matrix(m)
    assert flat.shape == (4, 12)
    assert np.array_equal(flat[:, 0:4], m[:, 0, :])


def test_challenger_duplex_rules():
    F = KOALA_BEAR
    ch = DuplexChallenger(F)
    # observe RATE elements triggers exactly one duplex
    for i in range(8):
        ch.observe(i + 1)
    assert ch.input_buffer == [] and len(ch.output_buffer) == 8
    params = poseidon2_params(F, 16)
    state = np.zeros((1, 16), dtype=np.uint32)
    state[0, :8] = np.arange(1, 9)
    want = permute(params, state, np)[0]
    assert np.array_equal(ch.state, want)
    # first sample pops the front: state[0] (front-pop convention, see
    # challenger.py docstring)
    assert ch.sample() == int(want[0])
    assert ch.sample() == int(want[1])
    # observing clears the output buffer
    ch.observe(99)
    assert ch.output_buffer == []
    # sample with partial input buffer duplexes with overwrite of 1 elem
    s2 = want.copy()
    s2[0] = 99
    want2 = permute(params, s2[None, :], np)[0]
    assert ch.sample() == int(want2[0])


def test_challenger_determinism_and_divergence():
    F = KOALA_BEAR
    a, b = DuplexChallenger(F), DuplexChallenger(F)
    for ch in (a, b):
        ch.observe_slice([5, 6, 7])
    assert a.sample() == b.sample()
    b.observe(1)
    a.observe(2)
    assert a.sample() != b.sample()


def test_grind():
    F = KOALA_BEAR
    ch = DuplexChallenger(F)
    ch.observe_slice([1, 2, 3])
    verifier = ch.clone()
    w = ch.grind(10, batch=512)
    assert verifier.check_witness(10, w)

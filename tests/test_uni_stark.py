"""End-to-end uni-stark tests (SURVEY.md §4: fibonacci/mul_air analog)."""

import dataclasses

import numpy as np
import pytest

from plonky3_recursion_tpu.stark.fri_pcs import FriParams
from plonky3_recursion_tpu.stark.symbolic import Air
from plonky3_recursion_tpu.stark.uni import (
    baby_bear_config,
    koala_bear_config,
    prove,
    verify,
)


class FibonacciAir(Air):
    """Rows (a, b); publics (a0, b0, final_b)."""

    width_main = 2
    num_publics = 3

    def eval(self, b):
        a, bb = b.main_local
        an, bn = b.main_next
        p0, p1, pf = b.public_values
        b.when_first_row().assert_eq(a, p0)
        b.when_first_row().assert_eq(bb, p1)
        b.when_transition().assert_eq(an, bb)
        b.when_transition().assert_eq(bn, a + bb)
        b.when_last_row().assert_eq(bb, pf)


class MulAir(Air):
    """Degree-3 constraint: c = a·b·a (exercises qdeg=2)."""

    width_main = 3
    num_publics = 0

    def eval(self, b):
        a, x, c = b.main_local
        b.assert_eq(a * x * a, c)


def fib_trace(F, n):
    rows = np.zeros((n, 2), dtype=np.uint32)
    a, bb = 0, 1
    for i in range(n):
        rows[i] = (a, bb)
        a, bb = bb, (a + bb) % F.P
    return rows, [0, 1, int(rows[-1, 1])]


@pytest.mark.parametrize(
    "mkconfig", [koala_bear_config, baby_bear_config], ids=["kb", "bb"]
)
def test_fibonacci_roundtrip(mkconfig):
    config = mkconfig()
    trace, publics = fib_trace(config.field, 32)
    proof = prove(config, FibonacciAir(), trace, publics)
    assert verify(config, FibonacciAir(), proof, publics)


def test_wrong_public_rejected():
    config = koala_bear_config()
    trace, publics = fib_trace(config.field, 16)
    proof = prove(config, FibonacciAir(), trace, publics)
    bad = list(publics)
    bad[2] = (bad[2] + 1) % config.field.P
    with pytest.raises(ValueError):
        verify(config, FibonacciAir(), proof, bad)


def test_tampered_openings_rejected():
    config = koala_bear_config()
    trace, publics = fib_trace(config.field, 16)
    proof = prove(config, FibonacciAir(), trace, publics)
    bad = dataclasses.replace(proof, trace_local=proof.trace_local ^ 1)
    with pytest.raises(ValueError):
        verify(config, FibonacciAir(), bad, publics)
    bad = dataclasses.replace(proof, trace_commit=proof.trace_commit ^ 1)
    with pytest.raises(ValueError):
        verify(config, FibonacciAir(), bad, publics)


def test_invalid_trace_rejected_at_verify():
    """An invalid trace still yields low-degree quotient chunks (they are
    interpolations by construction); soundness comes from the ζ consistency
    check, which must reject."""
    config = koala_bear_config()
    trace, publics = fib_trace(config.field, 16)
    trace[7, 1] ^= 5  # break the recurrence
    proof = prove(config, FibonacciAir(), trace, publics)
    with pytest.raises(ValueError, match="quotient/constraint mismatch"):
        verify(config, FibonacciAir(), proof, publics)


def test_degree3_air_and_jnp_quotient(rng):
    import jax.numpy as jnp

    config = koala_bear_config(FriParams.testing())
    F = config.field
    n = 16
    a = F.rand(rng, (n,))
    x = F.rand(rng, (n,))
    c = F.mul(F.mul(a, x, np), a, np)
    trace = np.stack([a, x, c], axis=1)
    proof = prove(config, MulAir(), trace, [])
    assert verify(config, MulAir(), proof, [])
    # jnp path produces an identical proof transcript
    proof2 = prove(config, MulAir(), trace, [], xp=jnp)
    assert np.array_equal(proof.trace_commit, proof2.trace_commit)
    assert np.array_equal(proof.quotient_commit, proof2.quotient_commit)
    assert np.array_equal(
        np.asarray(proof.fri.final_coeffs), np.asarray(proof2.fri.final_coeffs)
    )


class PrepMulAir(Air):
    """Main (x, y) with preprocessed multiplier k: y = k·x per row
    (reference `mul_air.rs` preprocessed workload)."""

    width_main = 2
    width_prep = 1
    num_publics = 1

    def eval(self, b):
        x, y = b.main_local
        (k,) = b.prep_local
        (p0,) = b.public_values
        b.assert_eq(y, k * x)
        b.when_first_row().assert_eq(x, p0)


def test_uni_with_preprocessed(rng):
    """prove_with_preprocessed / verify_with_preprocessed analog:
    preprocessed columns commit offline, open at [ζ, ζg], and bind
    through the verifying key."""
    from plonky3_recursion_tpu.stark.uni import setup_preprocessed

    config = koala_bear_config()
    F = config.field
    n = 16
    k = F.rand(rng, (n, 1))
    x = F.rand(rng, (n, 1))
    x[0, 0] = 777
    y = (x[:, 0].astype(np.uint64) * k[:, 0] % F.P).astype(np.uint32)
    trace = np.stack([x[:, 0], y], axis=1)
    prep_data = setup_preprocessed(config, k)
    proof = prove(config, PrepMulAir(), trace, [777], prep_data=prep_data)
    vk = prep_data.commitment
    assert verify(config, PrepMulAir(), proof, [777], prep_commitment=vk)
    # wrong verifying key rejected
    bad_vk = np.asarray(vk).copy()
    bad_vk[0] ^= 1
    with pytest.raises(ValueError, match="verifying key"):
        verify(config, PrepMulAir(), proof, [777], prep_commitment=bad_vk)
    # tampered prep opening rejected by FRI
    bad = dataclasses.replace(proof)
    pl = np.asarray(bad.prep_local).copy()
    pl[0, 0] ^= 1
    bad.prep_local = pl
    with pytest.raises(ValueError):
        verify(config, PrepMulAir(), bad, [777], prep_commitment=vk)
    # missing prep for a prep air rejected
    bad2 = dataclasses.replace(proof, prep_commit=None)
    with pytest.raises(ValueError, match="presence mismatch"):
        verify(config, PrepMulAir(), bad2, [777], prep_commitment=vk)
    # wrong public -> constraint check fails
    with pytest.raises(ValueError, match="quotient/constraint"):
        verify(config, PrepMulAir(), proof, [778], prep_commitment=vk)

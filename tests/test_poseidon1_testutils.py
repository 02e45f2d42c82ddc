"""Poseidon1 permutation + test-utils AIR harness."""

import numpy as np
import pytest

import jax.numpy as jnp

from plonky3_recursion_tpu.fields import BABY_BEAR, KOALA_BEAR
from plonky3_recursion_tpu.ops.poseidon1 import (
    permute,
    permute_scalar,
    poseidon1_params,
)
from plonky3_recursion_tpu.utils.test_utils import (
    assert_air_rejects,
    assert_air_satisfies,
    make_test_config,
)
from tests.test_uni_stark import FibonacciAir, fib_trace


@pytest.mark.parametrize("F", [KOALA_BEAR, BABY_BEAR], ids=lambda f: f.name)
def test_poseidon1_vs_scalar(F, rng):
    params = poseidon1_params(F, 16)
    states = F.rand(rng, (4, 16))
    got = permute(params, states, np)
    got_j = np.asarray(permute(params, jnp.asarray(states), jnp))
    assert np.array_equal(got, got_j)
    for i in range(4):
        assert [int(x) for x in got[i]] == permute_scalar(params, states[i])


def test_poseidon1_differs_from_zero_and_injective_smoke(rng):
    F = KOALA_BEAR
    params = poseidon1_params(F, 16)
    outs = permute(params, F.rand(rng, (32, 16)), np)
    assert len({tuple(r) for r in outs.tolist()}) == 32
    z = permute(params, np.zeros((1, 16), dtype=np.uint32), np)
    assert np.any(z != 0)


def test_air_satisfaction_harness():
    config = make_test_config("koala_bear")
    trace, publics = fib_trace(config.field, 16)
    assert_air_satisfies(config, FibonacciAir(), trace, publics)
    bad = trace.copy()
    bad[5, 0] ^= 3
    assert_air_rejects(config, FibonacciAir(), bad, publics)
    bad_pubs = list(publics)
    bad_pubs[2] ^= 1
    assert_air_rejects(config, FibonacciAir(), trace, bad_pubs)

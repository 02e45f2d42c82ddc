"""Pallas Poseidon2 kernel: bit-exact with the jnp permutation across
fields and widths (interpreter mode on CPU; the TPU compile path is
opt-in until profiled on hardware)."""

import numpy as np
import pytest

from plonky3_recursion_tpu.fields import BABY_BEAR, KOALA_BEAR
from plonky3_recursion_tpu.ops.pallas_poseidon2 import TILE, permute_pallas
from plonky3_recursion_tpu.ops.poseidon2 import permute, poseidon2_params


@pytest.mark.parametrize(
    "field,width",
    [
        (KOALA_BEAR, 16),
        (BABY_BEAR, 16),
        (KOALA_BEAR, 24),
        (KOALA_BEAR, 32),
        (BABY_BEAR, 24),
    ],
)
def test_pallas_matches_jnp(rng, field, width):
    p = poseidon2_params(field, width)
    # non-multiple-of-TILE batch exercises the padding path
    states = field.rand(rng, (TILE + 197, width))
    want = permute(p, states, np)
    got = np.asarray(permute_pallas(p, states, interpret=True))
    assert np.array_equal(want, got)


def test_pallas_small_batch(rng):
    p = poseidon2_params(KOALA_BEAR, 16)
    states = KOALA_BEAR.rand(rng, (3, 16))
    want = permute(p, states, np)
    got = np.asarray(permute_pallas(p, states, interpret=True))
    assert np.array_equal(want, got)

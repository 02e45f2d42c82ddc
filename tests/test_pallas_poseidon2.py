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


@pytest.mark.parametrize(
    "field,width,rate,length",
    [
        (KOALA_BEAR, 16, 8, 38),   # partial tail chunk (38 = 4*8 + 6)
        (KOALA_BEAR, 16, 8, 32),   # exact multiple of rate
        (BABY_BEAR, 16, 8, 19),
        (KOALA_BEAR, 32, 24, 50),  # arity-4 leaf digests (W32, rate 24)
    ],
)
def test_pallas_sponge_matches_host(rng, field, width, rate, length):
    from plonky3_recursion_tpu.ops.hashing import sponge_hash
    from plonky3_recursion_tpu.ops.pallas_poseidon2 import sponge_pallas

    p = poseidon2_params(field, width)
    rows = field.rand(rng, (TILE + 53, length))
    want = sponge_hash(p, rows, rate, 8, np)
    got = np.asarray(sponge_pallas(p, rows, rate, 8, interpret=True))
    assert np.array_equal(want, got)

"""Multi-device sharding: four-step NTT + sharded Merkle commit on the
virtual 8-device CPU mesh (SURVEY.md §2.7 distributed backend)."""

import numpy as np
import pytest

import jax

from plonky3_recursion_tpu.fields import KOALA_BEAR as F
from plonky3_recursion_tpu.ops.ntt import ntt
from plonky3_recursion_tpu.parallel.mesh import make_mesh, sharded_commit_root
from plonky3_recursion_tpu.parallel.ntt import sharded_ntt
from plonky3_recursion_tpu.stark.merkle import MerkleMmcs

needs_mesh = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@needs_mesh
@pytest.mark.slow
def test_sharded_ntt_matches_host(rng):
    mesh = make_mesh(8)
    for log_n in (9, 12):
        x = F.rand(rng, (1 << log_n,))
        got = np.asarray(sharded_ntt(F, x, mesh))
        want = ntt(F, x[:, None], np)[:, 0]
        assert np.array_equal(got, want), log_n


@needs_mesh
@pytest.mark.slow
def test_sharded_merkle_matches_host(rng):
    mesh = make_mesh(8)
    mat = F.rand(rng, (64, 8))
    root = np.asarray(sharded_commit_root(F, mat, mesh))
    want, _tree = MerkleMmcs(F).commit([mat])
    assert np.array_equal(root, want)

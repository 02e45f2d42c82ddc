"""Salted (hiding) commitments (reference MerkleTreeHidingMmcs / zk path)."""

import numpy as np
import pytest

from plonky3_recursion_tpu.fields import KOALA_BEAR, ext_field
from plonky3_recursion_tpu.stark.challenger import DuplexChallenger
from plonky3_recursion_tpu.stark.fri_pcs import FriParams, TwoAdicFriPcs


def make(hiding, seed=0, jit=False):
    E = ext_field(KOALA_BEAR, 4)
    return TwoAdicFriPcs(
        KOALA_BEAR,
        E,
        FriParams.testing(),
        use_jit=jit,
        hiding_salt_cols=4 if hiding else 0,
        salt_rng=np.random.default_rng(seed),
    ), E


@pytest.mark.parametrize("jit", [False, True], ids=["host", "jit"])
def test_hiding_roundtrip(jit, rng):
    pcs, E = make(True, jit=jit)
    mats = [(1, KOALA_BEAR.rand(rng, (32, 3))), (1, KOALA_BEAR.rand(rng, (8, 2)))]
    data = pcs.commit(mats)
    # tree has 2 data + 2 salt matrices (distinct heights 64, 16)
    assert len(data.tree.matrices) == 4
    pts = [[E.rand(rng, ())], [E.rand(rng, ())]]
    ch = DuplexChallenger(KOALA_BEAR)
    opened, proof = pcs.open([(data, pts)], ch)
    rv = [
        (
            data.commitment,
            [
                (m.log_n, list(zip(p, o)))
                for m, p, o in zip(data.matrices, pts, opened[0])
            ],
        )
    ]
    assert pcs.verify(rv, proof, DuplexChallenger(KOALA_BEAR))


def test_salts_change_commitment(rng):
    data_mats = [(1, KOALA_BEAR.rand(rng, (16, 2)))]
    pcs1, _ = make(True, seed=1)
    pcs2, _ = make(True, seed=2)
    c1 = pcs1.commit(data_mats).commitment
    c2 = pcs2.commit(data_mats).commitment
    assert not np.array_equal(c1, c2)  # same data, different commitment
    pcs3, _ = make(False)
    c3 = pcs3.commit(data_mats).commitment
    c4 = pcs3.commit(data_mats).commitment
    assert np.array_equal(c3, c4)  # non-hiding is deterministic


def test_tampered_salt_rejected(rng):
    pcs, E = make(True)
    mats = [(1, KOALA_BEAR.rand(rng, (16, 2)))]
    data = pcs.commit(mats)
    pts = [[E.rand(rng, ())]]
    ch = DuplexChallenger(KOALA_BEAR)
    opened, proof = pcs.open([(data, pts)], ch)
    rv = [
        (
            data.commitment,
            [(data.matrices[0].log_n, [(pts[0][0], opened[0][0][0])])],
        )
    ]
    # flip a salt value in a query opening -> leaf hash mismatch
    rows, sibs = proof.query_proofs[0].input_openings[0]
    rows[1] = np.asarray(rows[1]).copy()
    rows[1][0] ^= 1
    with pytest.raises(ValueError):
        pcs.verify(rv, proof, DuplexChallenger(KOALA_BEAR))

"""Merkle cap commitments (reference `MerkleTreeMmcs::new(hash, compress,
cap_height)` / `MerkleCap`, recursion-side `MerkleCapTargets` +
`select_cap_entry`, `recursion/src/pcs/fri/targets.rs:348`,
`recursion/src/pcs/mmcs.rs:289-376,545`): the commitment is the
2^cap_height digests at that depth, opening paths are cap_height levels
shorter, and the top index bits select the cap entry."""

import numpy as np
import pytest

from plonky3_recursion_tpu.circuit import CircuitBuilder
from plonky3_recursion_tpu.fields import KOALA_BEAR, ext_field
from plonky3_recursion_tpu.prover import BatchStarkProver, circuit_prover_data
from plonky3_recursion_tpu.stark.fri_pcs import FriParams, TwoAdicFriPcs
from plonky3_recursion_tpu.stark.merkle import MerkleMmcs
from plonky3_recursion_tpu.stark.uni import StarkConfig

E4 = ext_field(KOALA_BEAR, 4)


def test_native_cap_round_trip_and_tamper():
    rng = np.random.default_rng(0)
    mats = [KOALA_BEAR.rand(rng, (16, 3)), KOALA_BEAR.rand(rng, (4, 2))]
    dims = [(16, 3), (4, 2)]
    root = None
    for ch in (0, 1, 2):
        m = MerkleMmcs(KOALA_BEAR, cap_height=ch)
        com, tree = m.commit([x.copy() for x in mats])
        assert com.shape == ((1 << ch) * 8,)
        if ch == 0:
            root = com
        for idx in range(16):
            rows, sibs = m.open_batch(idx, tree)
            assert len(sibs) == 4 - ch
            assert m.verify_batch(com, dims, idx, rows, sibs)
            bad = [r.copy() for r in rows]
            bad[0][0] ^= 1
            assert not m.verify_batch(com, dims, idx, bad, sibs)
        # tampering the cap entry the index maps to is rejected
        bad_com = com.copy()
        bad_com[(3 >> (4 - ch)) * 8] ^= 1
        rows, sibs = m.open_batch(3, tree)
        assert not m.verify_batch(bad_com, dims, 3, rows, sibs)
    # the cap layer compresses to the cap-0 root
    from plonky3_recursion_tpu.ops.hashing import compress_pair
    from plonky3_recursion_tpu.ops.poseidon2 import poseidon2_params

    m1 = MerkleMmcs(KOALA_BEAR, cap_height=1)
    com1, _t = m1.commit([x.copy() for x in mats])
    p = poseidon2_params(KOALA_BEAR, 16)
    pair = com1.reshape(2, 8)
    assert np.array_equal(
        compress_pair(p, pair[0][None], pair[1][None], np)[0], root
    )


def test_cap_clamps_to_shallow_trees():
    """A cap taller than the tree clamps to the tree height (late FRI
    phase trees stay committable)."""
    rng = np.random.default_rng(1)
    m = MerkleMmcs(KOALA_BEAR, cap_height=3)
    com, tree = m.commit([KOALA_BEAR.rand(rng, (4, 2))])
    assert com.shape == (4 * 8,)  # clamped to cap_height 2
    rows, sibs = m.open_batch(2, tree)
    assert len(sibs) == 0
    assert m.verify_batch(com, [(4, 2)], 2, rows, sibs)


def _fib_proof(cfg, n=8):
    b = CircuitBuilder(E4)
    a = b.public_input()
    bb = b.public_input()
    res = b.public_input()
    for _ in range(n):
        a, bb = bb, b.add(a, bb)
    b.connect(bb, res)
    circuit = b.build()
    pdata = circuit_prover_data(cfg, circuit)
    x, y = 0, 1
    for _ in range(n):
        x, y = y, (x + y) % KOALA_BEAR.P
    r = circuit.runner()
    r.set_public_inputs([0, 1, y])
    traces = r.run()
    prover = BatchStarkProver(cfg)
    proof = prover.prove_all_tables(circuit, traces, pdata)
    return circuit, pdata, prover, proof


def test_batch_stark_with_caps_end_to_end():
    cfg = StarkConfig(
        KOALA_BEAR,
        E4,
        TwoAdicFriPcs(KOALA_BEAR, E4, FriParams.testing(), cap_height=2),
    )
    circuit, pdata, prover, proof = _fib_proof(cfg)
    assert len(np.asarray(proof.batch.trace_commit)) == 32
    assert prover.verify_all_tables(circuit, proof, pdata)
    from plonky3_recursion_tpu.utils.serde import validate_batch_proof

    validate_batch_proof(proof.batch, cfg)


@pytest.mark.slow
def test_recursion_layer_over_capped_inner():
    from plonky3_recursion_tpu.recursion.recursion import (
        RecursionInput,
        build_next_layer_prep,
        prove_next_layer,
    )

    cfg = StarkConfig(
        KOALA_BEAR,
        E4,
        TwoAdicFriPcs(KOALA_BEAR, E4, FriParams.testing(), cap_height=1),
    )
    circuit, pdata, prover, proof = _fib_proof(cfg)
    assert prover.verify_all_tables(circuit, proof, pdata)
    inner = RecursionInput(proof, circuit, pdata)
    prep = build_next_layer_prep(cfg, inner)
    layer = prove_next_layer(cfg, prep, inner.proof, debug_lookups=True)
    assert prover.verify_all_tables(prep.circuit, layer, prep.pdata)

"""ZK (hiding) proving: salted commitments + random masking round, and
recursive verification of a hiding proof.

Reference: `HidingFriPcs` salts + random polynomial round
(`recursion/src/pcs/mmcs.rs:729-839`, `fri/targets.rs:448-1012`;
SURVEY.md §2.6), `zk_hiding_mmcs.rs` / `fibonacci_batch_stark_prover_zk.rs`
integration tests.
"""

import numpy as np
import pytest

from plonky3_recursion_tpu.circuit import CircuitBuilder
from plonky3_recursion_tpu.fields import KOALA_BEAR, ext_field
from plonky3_recursion_tpu.prover import BatchStarkProver, circuit_prover_data
from plonky3_recursion_tpu.recursion.recursion import (
    RecursionInput,
    build_next_layer_prep,
    prove_next_layer,
)
from plonky3_recursion_tpu.stark.fri_pcs import FriParams
from plonky3_recursion_tpu.stark.uni import koala_bear_config
from plonky3_recursion_tpu.utils.serde import (
    batch_proof_from_bytes,
    batch_proof_to_bytes,
)

E4 = ext_field(KOALA_BEAR, 4)


def _zk_inner(n=8):
    config = koala_bear_config(FriParams.testing(), zk=True)
    b = CircuitBuilder(E4)
    a = b.public_input()
    bb = b.public_input()
    res = b.public_input()
    for _ in range(n):
        a, bb = bb, b.add(a, bb)
    b.connect(bb, res)
    circuit = b.build()
    pdata = circuit_prover_data(config, circuit)
    x, y = 0, 1
    for _ in range(n):
        x, y = y, (x + y) % KOALA_BEAR.P
    runner = circuit.runner()
    runner.set_public_inputs([0, 1, y])
    traces = runner.run()
    prover = BatchStarkProver(config)
    proof = prover.prove_all_tables(circuit, traces, pdata, debug_lookups=True)
    return config, circuit, pdata, proof


@pytest.fixture(scope="module")
def zk_proof():
    return _zk_inner()


def test_zk_proof_native_roundtrip(zk_proof):
    config, circuit, pdata, proof = zk_proof
    assert proof.batch.random_commit is not None
    assert np.asarray(proof.batch.random_opening).shape == (8, 4)
    prover = BatchStarkProver(config)
    assert prover.verify_all_tables(circuit, proof, pdata)
    # serde carries the random round
    rt = batch_proof_from_bytes(batch_proof_to_bytes(proof.batch))
    assert np.array_equal(rt.random_commit, proof.batch.random_commit)
    assert np.array_equal(rt.random_opening, proof.batch.random_opening)


def test_zk_proof_differs_between_runs():
    """Hiding: two proofs of the same statement have different commitments
    (salts + random round are fresh randomness)."""
    _c1, _ci1, _p1, proof1 = _zk_inner()
    _c2, _ci2, _p2, proof2 = _zk_inner()
    assert not np.array_equal(
        proof1.batch.trace_commit, proof2.batch.trace_commit
    )
    assert not np.array_equal(
        proof1.batch.random_commit, proof2.batch.random_commit
    )


def test_non_zk_proof_rejected_by_zk_verifier(zk_proof):
    config, circuit, pdata, proof = zk_proof
    stripped = batch_proof_from_bytes(batch_proof_to_bytes(proof.batch))
    stripped.random_commit = None
    stripped.random_opening = None
    prover = BatchStarkProver(config)
    import dataclasses

    bad = dataclasses.replace(proof, batch=stripped)
    with pytest.raises(ValueError, match="hiding"):
        prover.verify_all_tables(circuit, bad, pdata)


def test_zk_recursion_layer(zk_proof):
    """A salted proof (salt rows in every Merkle leaf + random round in
    the FRI batch) is recursively verified in-circuit and the layer proof
    (itself hiding) verifies natively — the reference's
    `zk_hiding_mmcs.rs` end-to-end."""
    config, circuit, pdata, proof = zk_proof
    inner = RecursionInput(proof, circuit, pdata)
    prep = build_next_layer_prep(config, inner)
    layer = prove_next_layer(config, prep, proof, debug_lookups=True)
    assert layer.batch.random_commit is not None
    prover = BatchStarkProver(config)
    assert prover.verify_all_tables(prep.circuit, layer, prep.pdata)

"""2-to-1 aggregation: one proof attesting two child proofs verify."""

import numpy as np
import pytest

from plonky3_recursion_tpu.prover import BatchStarkProver
from plonky3_recursion_tpu.recursion.aggregation import (
    build_aggregation_circuit,
    prove_aggregation_layer,
)
from tests.test_recursion import make_inner


def test_aggregation_layer():
    config, left = make_inner(n=8)
    _cfg2, right = make_inner(n=8)
    prep = build_aggregation_circuit(config, left, right)
    proof = prove_aggregation_layer(
        config, prep, left.proof, right.proof, debug_lookups=True
    )
    prover = BatchStarkProver(config)
    assert prover.verify_all_tables(prep.circuit, proof, prep.pdata)
    fp = prep.fingerprint()
    assert fp[0] > 0 and fp[3] > 0
    # tampering either child is rejected
    import copy

    bad = copy.deepcopy(right.proof)
    bad.batch.publics[1][4] = (bad.batch.publics[1][4] + 1) % config.field.P
    from plonky3_recursion_tpu.circuit import WitnessConflict

    with pytest.raises((WitnessConflict, ValueError)):
        prove_aggregation_layer(config, prep, left.proof, bad)


@pytest.mark.slow
def test_aggregation_with_different_shapes():
    """Children with DIFFERENT instance shapes in one aggregation circuit
    (reference `aggregation_different_shapes.rs`)."""
    config, left = make_inner(n=8)
    _cfg2, right = make_inner(n=48)  # bigger program -> taller tables
    assert [s.log_n for s in left.proof.batch.shapes] != [
        s.log_n for s in right.proof.batch.shapes
    ]
    prep = build_aggregation_circuit(config, left, right)
    proof = prove_aggregation_layer(
        config, prep, left.proof, right.proof, debug_lookups=True
    )
    prover = BatchStarkProver(config)
    assert prover.verify_all_tables(prep.circuit, proof, prep.pdata)


@pytest.mark.slow
def test_zk_aggregation():
    """Aggregating two ZK (hiding) children (reference
    `zk_aggregation.rs`): salted commitments + random masking rounds are
    verified in-circuit for both children."""
    from plonky3_recursion_tpu.circuit import CircuitBuilder
    from plonky3_recursion_tpu.fields import KOALA_BEAR, ext_field
    from plonky3_recursion_tpu.prover import circuit_prover_data
    from plonky3_recursion_tpu.recursion.recursion import RecursionInput
    from plonky3_recursion_tpu.stark.fri_pcs import FriParams
    from plonky3_recursion_tpu.stark.uni import koala_bear_config

    E4 = ext_field(KOALA_BEAR, 4)
    config = koala_bear_config(FriParams.testing(), zk=True)

    def zk_inner(n):
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
        r = circuit.runner()
        r.set_public_inputs([0, 1, y])
        prover = BatchStarkProver(config)
        proof = prover.prove_all_tables(circuit, r.run(), pdata)
        assert prover.verify_all_tables(circuit, proof, pdata)
        assert proof.batch.random_commit is not None
        return RecursionInput(proof, circuit, pdata)

    left = zk_inner(8)
    right = zk_inner(8)
    prep = build_aggregation_circuit(config, left, right)
    proof = prove_aggregation_layer(
        config, prep, left.proof, right.proof, debug_lookups=True
    )
    prover = BatchStarkProver(config)
    assert prover.verify_all_tables(prep.circuit, proof, prep.pdata)

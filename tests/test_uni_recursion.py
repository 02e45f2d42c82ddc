"""Uni-stark proof recursively verified into a batch proof
(the `recursive_keccak`-shaped RecursionInput::UniStark path)."""

import numpy as np
import pytest

from plonky3_recursion_tpu.prover import BatchStarkProver, circuit_prover_data
from plonky3_recursion_tpu.stark.fri_pcs import FriParams
from plonky3_recursion_tpu.stark.uni import koala_bear_config, prove, verify
from plonky3_recursion_tpu.recursion.uni_verifier import (
    build_uni_recursion_layer,
    prove_uni_recursively,
)
from tests.test_uni_stark import FibonacciAir, fib_trace


def test_uni_proof_recursion_layer():
    config = koala_bear_config(FriParams.testing())
    air = FibonacciAir()
    trace, publics = fib_trace(config.field, 16)
    uni_proof = prove(config, air, trace, publics)
    assert verify(config, air, uni_proof, publics)
    circuit, vcr = build_uni_recursion_layer(config, air, log_n=4)
    pdata = circuit_prover_data(config, circuit)
    layer = prove_uni_recursively(
        config, circuit, vcr, pdata, uni_proof, publics
    )
    prover = BatchStarkProver(config)
    assert prover.verify_all_tables(circuit, layer, pdata)
    # tampered uni proof rejected during witness generation
    import dataclasses

    from plonky3_recursion_tpu.circuit import WitnessConflict

    bad = dataclasses.replace(uni_proof, trace_local=uni_proof.trace_local ^ 1)
    with pytest.raises((WitnessConflict, ValueError)):
        prove_uni_recursively(config, circuit, vcr, pdata, bad, publics)
    # wrong publics rejected
    bad_pubs = list(publics)
    bad_pubs[2] = (bad_pubs[2] + 1) % config.field.P
    with pytest.raises((WitnessConflict, ValueError)):
        prove_uni_recursively(
            config, circuit, vcr, pdata, uni_proof, bad_pubs
        )


def test_uni_preprocessed_recursion_layer(rng):
    """Recursive verification of a uni proof WITH preprocessed columns
    (reference `mul_air.rs` `test_mul_verifier_circuit`): the verifying
    key is a public input of the layer circuit."""
    from plonky3_recursion_tpu.stark.uni import setup_preprocessed
    from tests.test_uni_stark import PrepMulAir

    config = koala_bear_config(FriParams.testing())
    F = config.field
    air = PrepMulAir()
    n = 16
    k = F.rand(rng, (n, 1))
    x = F.rand(rng, (n, 1))
    x[0, 0] = 777
    y = (x[:, 0].astype(np.uint64) * k[:, 0] % F.P).astype(np.uint32)
    trace = np.stack([x[:, 0], y], axis=1)
    prep_data = setup_preprocessed(config, k)
    uni_proof = prove(config, air, trace, [777], prep_data=prep_data)
    assert verify(
        config, air, uni_proof, [777],
        prep_commitment=prep_data.commitment,
    )
    circuit, vcr = build_uni_recursion_layer(config, air, log_n=4)
    pdata = circuit_prover_data(config, circuit)
    layer = prove_uni_recursively(
        config, circuit, vcr, pdata, uni_proof, [777]
    )
    prover = BatchStarkProver(config)
    assert prover.verify_all_tables(circuit, layer, pdata)
    # the vk appears among the layer's PUBLIC values (pinned statement)
    pubs = {int(r[0]) for r in np.asarray(layer.public_values)}
    assert int(prep_data.commitment[0]) in pubs
    # tampered prep opening in the inner proof is rejected
    import dataclasses

    from plonky3_recursion_tpu.circuit import WitnessConflict

    bad = dataclasses.replace(
        uni_proof, prep_local=np.asarray(uni_proof.prep_local) ^ 1
    )
    with pytest.raises((WitnessConflict, ValueError)):
        prove_uni_recursively(config, circuit, vcr, pdata, bad, [777])

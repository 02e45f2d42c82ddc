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

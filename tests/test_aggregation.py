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

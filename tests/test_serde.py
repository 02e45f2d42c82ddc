"""Proof serde round-trip + validation (SURVEY.md §5 checkpoint/resume)."""

import numpy as np
import pytest

from plonky3_recursion_tpu.prover import BatchStarkProver, circuit_prover_data
from plonky3_recursion_tpu.stark.fri_pcs import FriParams
from plonky3_recursion_tpu.stark.uni import koala_bear_config
from plonky3_recursion_tpu.utils.serde import (
    batch_proof_from_bytes,
    batch_proof_to_bytes,
    validate_batch_proof,
)
from tests.test_circuit_prover import fib_value, fibonacci_circuit


def test_proof_roundtrip_bytes():
    config = koala_bear_config(FriParams.testing())
    circuit = fibonacci_circuit(16)
    pdata = circuit_prover_data(config, circuit)
    r = circuit.runner()
    r.set_public_inputs([0, 1, fib_value(16)])
    prover = BatchStarkProver(config)
    proof = prover.prove_all_tables(circuit, r.run(), pdata)
    blob = batch_proof_to_bytes(proof.batch)
    assert isinstance(blob, bytes) and len(blob) > 1000
    back = batch_proof_from_bytes(blob)
    # the deserialized proof verifies
    import dataclasses

    proof2 = dataclasses.replace(proof, batch=back)
    assert prover.verify_all_tables(circuit, proof2, pdata)
    # determinism
    assert batch_proof_to_bytes(back) == blob


def test_validate_rejects_malformed():
    config = koala_bear_config(FriParams.testing())
    circuit = fibonacci_circuit(16)
    pdata = circuit_prover_data(config, circuit)
    r = circuit.runner()
    r.set_public_inputs([0, 1, fib_value(16)])
    prover = BatchStarkProver(config)
    proof = prover.prove_all_tables(circuit, r.run(), pdata)
    blob = bytearray(batch_proof_to_bytes(proof.batch))
    blob[0] ^= 1
    with pytest.raises(AssertionError):
        batch_proof_from_bytes(bytes(blob))
    # structural tamper: drop a quotient chunk
    proof.batch.quotient_chunks[0].pop()
    with pytest.raises(ValueError):
        validate_batch_proof(proof.batch)


def test_uni_proof_roundtrip_bytes(rng):
    """Uni-stark proofs (incl. preprocessed fields) roundtrip byte-exact."""
    import numpy as np

    from plonky3_recursion_tpu.stark.uni import (
        prove as uni_prove,
        setup_preprocessed,
        verify as uni_verify,
    )
    from plonky3_recursion_tpu.utils.serde import (
        uni_proof_from_bytes,
        uni_proof_to_bytes,
    )
    from tests.test_uni_stark import PrepMulAir

    config = koala_bear_config(FriParams.testing())
    F = config.field
    n = 16
    k = F.rand(rng, (n, 1))
    x = F.rand(rng, (n, 1))
    x[0, 0] = 9
    y = (x[:, 0].astype(np.uint64) * k[:, 0] % F.P).astype(np.uint32)
    trace = np.stack([x[:, 0], y], axis=1)
    prep_data = setup_preprocessed(config, k)
    proof = uni_prove(config, PrepMulAir(), trace, [9], prep_data=prep_data)
    blob = uni_proof_to_bytes(proof)
    back = uni_proof_from_bytes(blob)
    assert uni_verify(
        config, PrepMulAir(), back, [9],
        prep_commitment=prep_data.commitment,
    )
    assert uni_proof_to_bytes(back) == blob

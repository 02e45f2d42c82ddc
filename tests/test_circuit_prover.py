"""Circuit -> batch-stark proof end-to-end (SURVEY.md §7.3 minimum slice:
Fibonacci circuit -> Traces -> batch proof -> native verify)."""

import numpy as np
import pytest

from plonky3_recursion_tpu.circuit import CircuitBuilder
from plonky3_recursion_tpu.fields import KOALA_BEAR, ext_field
from plonky3_recursion_tpu.prover import BatchStarkProver, circuit_prover_data
from plonky3_recursion_tpu.stark.fri_pcs import FriParams
from plonky3_recursion_tpu.stark.uni import koala_bear_config

E4 = ext_field(KOALA_BEAR, 4)


def fibonacci_circuit(n: int):
    b = CircuitBuilder(E4)
    a = b.public_input()
    bb = b.public_input()
    res = b.public_input()
    for _ in range(n):
        a, bb = bb, b.add(a, bb)
    b.connect(bb, res)
    return b.build()


def fib_value(n: int):
    a, bb = 0, 1
    for _ in range(n):
        a, bb = bb, (a + bb) % KOALA_BEAR.P
    return bb


@pytest.fixture(scope="module")
def setup():
    config = koala_bear_config(FriParams.testing())
    circuit = fibonacci_circuit(64)
    pdata = circuit_prover_data(config, circuit)
    return config, circuit, pdata


def test_fibonacci_circuit_proof(setup):
    config, circuit, pdata = setup
    runner = circuit.runner()
    runner.set_public_inputs([0, 1, fib_value(64)])
    traces = runner.run()
    prover = BatchStarkProver(config)
    proof = prover.prove_all_tables(
        circuit, traces, pdata, debug_lookups=True
    )
    assert prover.verify_all_tables(circuit, proof, pdata)


def test_wrong_result_conflicts(setup):
    config, circuit, pdata = setup
    runner = circuit.runner()
    runner.set_public_inputs([0, 1, 12345])
    from plonky3_recursion_tpu.circuit import WitnessConflict

    with pytest.raises(WitnessConflict):
        runner.run()


def test_tampered_publics_rejected(setup):
    config, circuit, pdata = setup
    runner = circuit.runner()
    runner.set_public_inputs([0, 1, fib_value(64)])
    traces = runner.run()
    prover = BatchStarkProver(config)
    proof = prover.prove_all_tables(circuit, traces, pdata)
    # claim different publics post-hoc
    proof.public_values = proof.public_values.copy()
    proof.public_values[2, 0] ^= 1
    with pytest.raises(ValueError):
        prover.verify_all_tables(circuit, proof, pdata)


def test_tampered_terminal_rejected(setup):
    config, circuit, pdata = setup
    runner = circuit.runner()
    runner.set_public_inputs([0, 1, fib_value(64)])
    traces = runner.run()
    prover = BatchStarkProver(config)
    proof = prover.prove_all_tables(circuit, traces, pdata)
    i, t = proof.batch.lookup_terminals[1]
    proof.batch.lookup_terminals[1] = (i, np.asarray(t) ^ 1)
    with pytest.raises(ValueError):
        prover.verify_all_tables(circuit, proof, pdata)


def test_mixed_gadget_circuit_proof():
    """Circuit exercising mul/div/select/bits/ext recompose end-to-end."""
    config = koala_bear_config(FriParams.testing())
    b = CircuitBuilder(E4)
    x = b.public_input()
    y = b.public_input()
    q = b.div(b.mul(x, y), y)
    b.connect(q, x)  # (x*y)/y == x
    cond = b.public_input()
    b.assert_bool(cond)
    sel = b.select(cond, x, y)
    bits = b.decompose_to_bits(sel, 10)
    ext = b.recompose_base_coeffs_to_ext(
        [bits[0], bits[1], bits[2], bits[3]]
    )
    b.tag("ext", ext)
    circuit = b.build()
    pdata = circuit_prover_data(config, circuit)
    runner = circuit.runner()
    runner.set_public_inputs([700, 13, 1])
    traces = runner.run()
    prover = BatchStarkProver(config)
    proof = prover.prove_all_tables(circuit, traces, pdata, debug_lookups=True)
    assert prover.verify_all_tables(circuit, proof, pdata)

"""Packed Horner table: NPO execution, proof roundtrip, builder gadget.

Mirrors the reference's packed HornerAcc ALU coverage
(`circuit-prover/src/air/alu_air.rs:63-99` scheduling tests).
"""

import numpy as np

from plonky3_recursion_tpu.circuit import CircuitBuilder
from plonky3_recursion_tpu.fields import KOALA_BEAR, ext_field
from plonky3_recursion_tpu.prover import BatchStarkProver, circuit_prover_data
from plonky3_recursion_tpu.prover.horner_table import koala_bear_horner_npo
from plonky3_recursion_tpu.stark.fri_pcs import FriParams
from plonky3_recursion_tpu.stark.uni import koala_bear_config

E4 = ext_field(KOALA_BEAR, 4)
P = KOALA_BEAR.P


def _eval_poly(coeffs, x):
    """Ground truth Σ coeffs[i]·x^i in E4 via python ints."""
    acc = np.zeros(4, dtype=np.uint32)
    for c in reversed(coeffs):
        acc = E4.add(E4.mul(acc, x, np), np.asarray(c, dtype=np.uint32), np)
    return acc


def test_horner_eval_matches_ground_truth(rng):
    """Chains of every length 0..20 (exercising front-padding and
    multi-row bus chaining) against a python-int Horner."""
    for n in [0, 1, 2, 3, 7, 8, 9, 16, 20]:
        b = CircuitBuilder(E4)
        b.enable_horner(koala_bear_horner_npo())
        x_t = b.public_input()
        coeff_ts = [b.public_input() for _ in range(n)]
        b.tag("out", b.horner_eval(x_t, coeff_ts))
        circuit = b.build()
        x = KOALA_BEAR.rand(rng, (4,))
        coeffs = [KOALA_BEAR.rand(rng, (4,)) for _ in range(n)]
        r = circuit.runner()
        r.set_public_inputs([tuple(x)] + [tuple(c) for c in coeffs])
        traces = r.run()
        assert np.array_equal(traces.probe("out"), _eval_poly(coeffs, x)), n


def test_horner_npo_proof_roundtrip(rng):
    config = koala_bear_config(FriParams.testing())
    b = CircuitBuilder(E4)
    b.enable_horner(koala_bear_horner_npo())
    x_t = b.public_input()
    coeff_ts = [b.public_input() for _ in range(13)]
    out = b.horner_eval(x_t, coeff_ts)
    b.tag("out", out)
    # also consume the output downstream so out is bus-read
    b.tag("out2", b.mul(out, out))
    circuit = b.build()
    pdata = circuit_prover_data(config, circuit)
    x = KOALA_BEAR.rand(rng, (4,))
    coeffs = [KOALA_BEAR.rand(rng, (4,)) for _ in range(13)]
    r = circuit.runner()
    r.set_public_inputs([tuple(x)] + [tuple(c) for c in coeffs])
    traces = r.run()
    assert np.array_equal(traces.probe("out"), _eval_poly(coeffs, x))
    prover = BatchStarkProver(config)
    proof = prover.prove_all_tables(circuit, traces, pdata, debug_lookups=True)
    assert prover.verify_all_tables(circuit, proof, pdata)


def test_horner_short_chain_falls_back_to_alu():
    """len<3 chains must not allocate Horner rows (packing economics)."""
    b = CircuitBuilder(E4)
    b.enable_horner(koala_bear_horner_npo())
    x_t = b.public_input()
    b.tag("out", b.horner_eval(x_t, [b.public_input(), b.public_input()]))
    circuit = b.build()
    assert not circuit.npo_calls

"""Poseidon2 NPO: circuit execution + proven table with bus links
(SURVEY.md §4: npo_integration analog)."""

import numpy as np
import pytest

from plonky3_recursion_tpu.circuit import CircuitBuilder, WitnessConflict
from plonky3_recursion_tpu.fields import KOALA_BEAR, ext_field
from plonky3_recursion_tpu.ops.poseidon2 import permute, poseidon2_params
from plonky3_recursion_tpu.prover import BatchStarkProver, circuit_prover_data
from plonky3_recursion_tpu.prover.poseidon2_table import (
    koala_bear_poseidon2_npo,
)
from plonky3_recursion_tpu.stark.fri_pcs import FriParams
from plonky3_recursion_tpu.stark.uni import koala_bear_config

E4 = ext_field(KOALA_BEAR, 4)


def perm_circuit(n_perms=2):
    b = CircuitBuilder(E4)
    npo = koala_bear_poseidon2_npo()
    b.enable_op(npo)
    ins = [b.public_input() for _ in range(4)]
    outs = ins
    for i in range(n_perms):
        outs, _ = b.perm_call(
            npo.type_id, outs, [True] * 4, new_start=True, tag=f"perm{i}"
        )
    # consume outputs so they hit the bus: out0 + out1 tagged
    s = b.add(outs[0], outs[1])
    b.tag("s", s)
    for j, o in enumerate(outs):
        b.tag(f"out{j}", o)
    return b.build()


def native_chain(state16, n):
    params = poseidon2_params(KOALA_BEAR, 16)
    s = np.asarray(state16, dtype=np.uint32)
    for _ in range(n):
        s = permute(params, s[None, :], np)[0]
    return s


def test_npo_execution_matches_native(rng):
    circuit = perm_circuit(3)
    state = KOALA_BEAR.rand(rng, (16,))
    r = circuit.runner()
    r.set_public_inputs([tuple(state[4 * j : 4 * j + 4]) for j in range(4)])
    t = r.run()
    want = native_chain(state, 3)
    for j in range(4):
        assert np.array_equal(t.probe(f"out{j}"), want[4 * j : 4 * j + 4])


def test_npo_proof_roundtrip(rng):
    config = koala_bear_config(FriParams.testing())
    circuit = perm_circuit(2)
    pdata = circuit_prover_data(config, circuit)
    state = KOALA_BEAR.rand(rng, (16,))
    r = circuit.runner()
    r.set_public_inputs([tuple(state[4 * j : 4 * j + 4]) for j in range(4)])
    traces = r.run()
    prover = BatchStarkProver(config)
    proof = prover.prove_all_tables(circuit, traces, pdata, debug_lookups=True)
    assert prover.verify_all_tables(circuit, proof, pdata)
    # the Poseidon2 table is instance 3; its trace must participate in the
    # proof shape (wide layout: one row per perm, 2 perms -> padded 4)
    assert proof.batch.shapes[3].width_main == 166
    assert 1 << proof.batch.shapes[3].log_n == 4


def test_npo_tampered_trace_rejected(rng):
    """Corrupting a permutation output must break the proof (either the
    bus or the transition constraints)."""
    config = koala_bear_config(FriParams.testing())
    circuit = perm_circuit(1)
    pdata = circuit_prover_data(config, circuit)
    state = KOALA_BEAR.rand(rng, (16,))
    r = circuit.runner()
    r.set_public_inputs([tuple(state[4 * j : 4 * j + 4]) for j in range(4)])
    traces = r.run()
    # tamper with the recorded witness value of out0 before proving
    wid = circuit.tags["out0"]
    traces.witness[wid, 0] ^= 1
    prover = BatchStarkProver(config)
    with pytest.raises(ValueError):
        proof = prover.prove_all_tables(
            circuit, traces, pdata, debug_lookups=True
        )
        prover.verify_all_tables(circuit, proof, pdata)

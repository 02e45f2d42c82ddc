"""Poseidon1 NPO table + hash-agnostic challenger dispatch."""

import numpy as np
import pytest

from plonky3_recursion_tpu.circuit import CircuitBuilder
from plonky3_recursion_tpu.fields import KOALA_BEAR, ext_field
from plonky3_recursion_tpu.ops.poseidon1 import permute, poseidon1_params
from plonky3_recursion_tpu.prover import BatchStarkProver, circuit_prover_data
from plonky3_recursion_tpu.prover.poseidon1_table import (
    koala_bear_poseidon1_npo,
)
from plonky3_recursion_tpu.recursion.challenger_circuit import (
    CircuitChallenger,
)
from plonky3_recursion_tpu.stark.challenger import DuplexChallenger
from plonky3_recursion_tpu.stark.fri_pcs import FriParams
from plonky3_recursion_tpu.stark.uni import koala_bear_config

E4 = ext_field(KOALA_BEAR, 4)


def test_poseidon1_npo_proof_roundtrip(rng):
    config = koala_bear_config(FriParams.testing())
    b = CircuitBuilder(E4)
    npo = koala_bear_poseidon1_npo()
    b.enable_op(npo)
    ins = [b.public_input() for _ in range(4)]
    outs = b.call_npo(npo.type_id, ins, tag="p1")
    s = b.add(outs[0], outs[3])
    b.tag("s", s)
    for j, o in enumerate(outs):
        b.tag(f"o{j}", o)
    circuit = b.build()
    pdata = circuit_prover_data(config, circuit)
    state = KOALA_BEAR.rand(rng, (16,))
    r = circuit.runner()
    r.set_public_inputs([tuple(state[4 * j : 4 * j + 4]) for j in range(4)])
    traces = r.run()
    params = poseidon1_params(KOALA_BEAR, 16)
    want = permute(params, state[None, :], np)[0]
    for j in range(4):
        assert np.array_equal(
            traces.probe(f"o{j}"), want[4 * j : 4 * j + 4]
        )
    prover = BatchStarkProver(config)
    proof = prover.prove_all_tables(circuit, traces, pdata, debug_lookups=True)
    assert prover.verify_all_tables(circuit, proof, pdata)


def test_hash_agnostic_circuit_challenger(rng):
    """CircuitChallenger runs over the Poseidon1 NPO and matches a native
    Poseidon1-backed duplex challenger (reference PermConfig dispatch)."""
    params = poseidon1_params(KOALA_BEAR, 16)
    native = DuplexChallenger(
        KOALA_BEAR, perm_fn=lambda s: permute(params, s, np)
    )
    b = CircuitBuilder(E4)
    npo = koala_bear_poseidon1_npo()
    b.enable_op(npo)
    cc = CircuitChallenger(b, npo.type_id)
    vals = [int(x) for x in KOALA_BEAR.rand(rng, (11,))]
    for v in vals:
        native.observe(v)
        cc.observe(b.public_input())
    b.tag("s1", cc.sample())
    b.tag("s2", cc.sample_ext())
    circuit = b.build()
    r = circuit.runner()
    r.set_public_inputs(vals)
    t = r.run()
    assert int(t.probe("s1")[0]) == native.sample()
    assert np.array_equal(t.probe("s2"), native.sample_ext(E4))

"""BabyBear recursion pipeline: x⁷ register-split Poseidon2 table and a
full recursion layer (+ ZK variant — BASELINE config #5's shape).

Reference: `SBOX_REGISTERS` decomposition in the BabyBear presets
(`poseidon2-circuit-air/src/public_types.rs`),
`fibonacci_batch_stark_prover_zk.rs`.
"""

import numpy as np
import pytest

from plonky3_recursion_tpu.circuit import CircuitBuilder
from plonky3_recursion_tpu.fields import BABY_BEAR, ext_field
from plonky3_recursion_tpu.ops.poseidon2 import permute, poseidon2_params
from plonky3_recursion_tpu.prover import BatchStarkProver, circuit_prover_data
from plonky3_recursion_tpu.prover.poseidon2_table import (
    baby_bear_poseidon2_npo,
)
from plonky3_recursion_tpu.recursion.recursion import (
    RecursionInput,
    build_next_layer_prep,
    prove_next_layer,
)
from plonky3_recursion_tpu.stark.fri_pcs import FriParams
from plonky3_recursion_tpu.stark.uni import baby_bear_config

E4 = ext_field(BABY_BEAR, 4)


def test_babybear_poseidon2_npo_roundtrip(rng):
    """x⁷ S-box table: NPO executes the real permutation and the
    register-split AIR proves/verifies."""
    config = baby_bear_config(FriParams.testing())
    b = CircuitBuilder(E4)
    npo = baby_bear_poseidon2_npo()
    b.enable_op(npo)
    ins = [b.public_input() for _ in range(4)]
    outs, _ = b.perm_call(npo.type_id, ins, [True] * 4, new_start=True)
    for j, o in enumerate(outs):
        b.tag(f"o{j}", o)
    circuit = b.build()
    pdata = circuit_prover_data(config, circuit)
    state = BABY_BEAR.rand(rng, (16,))
    r = circuit.runner()
    r.set_public_inputs([tuple(state[4 * j : 4 * j + 4]) for j in range(4)])
    traces = r.run()
    want = permute(poseidon2_params(BABY_BEAR, 16), state[None, :], np)[0]
    for j in range(4):
        assert np.array_equal(traces.probe(f"o{j}"), want[4 * j : 4 * j + 4])
    prover = BatchStarkProver(config)
    proof = prover.prove_all_tables(circuit, traces, pdata, debug_lookups=True)
    assert prover.verify_all_tables(circuit, proof, pdata)


def _bb_inner(n=8, zk=False):
    config = baby_bear_config(FriParams.testing(), zk=zk)
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
        x, y = y, (x + y) % BABY_BEAR.P
    runner = circuit.runner()
    runner.set_public_inputs([0, 1, y])
    traces = runner.run()
    prover = BatchStarkProver(config)
    proof = prover.prove_all_tables(circuit, traces, pdata, debug_lookups=True)
    assert prover.verify_all_tables(circuit, proof, pdata)
    return config, RecursionInput(proof, circuit, pdata)


def test_babybear_recursion_layer():
    config, inner = _bb_inner()
    prep = build_next_layer_prep(config, inner)
    layer = prove_next_layer(config, prep, inner.proof, debug_lookups=True)
    prover = BatchStarkProver(config)
    assert prover.verify_all_tables(prep.circuit, layer, prep.pdata)


@pytest.mark.slow
def test_babybear_zk_recursion_layer():
    """ZK-enabled BabyBear recursion — BASELINE config #5's shape."""
    config, inner = _bb_inner(zk=True)
    assert inner.proof.batch.random_commit is not None
    prep = build_next_layer_prep(config, inner)
    layer = prove_next_layer(config, prep, inner.proof, debug_lookups=True)
    prover = BatchStarkProver(config)
    assert prover.verify_all_tables(prep.circuit, layer, prep.pdata)

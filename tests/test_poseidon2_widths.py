"""Width-generic Poseidon2 table: the reference preset family
(W16/W24/W32 per field, `public_types.rs`) through the circuit prover."""

import numpy as np
import pytest

from plonky3_recursion_tpu.circuit import CircuitBuilder
from plonky3_recursion_tpu.fields import BABY_BEAR, KOALA_BEAR, ext_field
from plonky3_recursion_tpu.ops.poseidon2 import permute, poseidon2_params
from plonky3_recursion_tpu.prover import BatchStarkProver, circuit_prover_data
from plonky3_recursion_tpu.prover.poseidon2_table import poseidon2_npo_for
from plonky3_recursion_tpu.stark.fri_pcs import FriParams
from plonky3_recursion_tpu.stark.uni import baby_bear_config, koala_bear_config


@pytest.mark.parametrize(
    "field,config_fn,width",
    [
        (KOALA_BEAR, koala_bear_config, 24),
        (KOALA_BEAR, koala_bear_config, 32),
        (BABY_BEAR, baby_bear_config, 24),
        (BABY_BEAR, baby_bear_config, 32),
    ],
    ids=["kb24", "kb32", "bb24", "bb32"],
)
def test_wide_perm_npo_roundtrip(rng, field, config_fn, width):
    config = config_fn(FriParams.testing())
    E4 = ext_field(field, 4)
    limbs = width // 4
    b = CircuitBuilder(E4)
    npo = poseidon2_npo_for(field.name, width)
    b.enable_op(npo)
    ins = [b.public_input() for _ in range(limbs)]
    outs, _ = b.perm_call(
        npo.type_id, ins, [True] * limbs, new_start=True
    )
    for j, o in enumerate(outs):
        b.tag(f"o{j}", o)
    circuit = b.build()
    pdata = circuit_prover_data(config, circuit)
    state = field.rand(rng, (width,))
    r = circuit.runner()
    r.set_public_inputs(
        [tuple(state[4 * j : 4 * j + 4]) for j in range(limbs)]
    )
    traces = r.run()
    want = permute(poseidon2_params(field, width), state[None, :], np)[0]
    for j in range(limbs):
        assert np.array_equal(traces.probe(f"o{j}"), want[4 * j : 4 * j + 4])
    prover = BatchStarkProver(config)
    proof = prover.prove_all_tables(circuit, traces, pdata, debug_lookups=True)
    assert prover.verify_all_tables(circuit, proof, pdata)

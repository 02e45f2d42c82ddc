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


def test_w24_challenger_native_circuit_match(rng):
    """Width-generic duplex: a W24 challenger (rate 16) on both sides —
    native DuplexChallenger(params=W24) and CircuitChallenger over the
    W24 table — produce identical transcripts (reference preset family:
    capacity is the 8-element digest, rate = width − 8)."""
    from plonky3_recursion_tpu.recursion.challenger_circuit import (
        CircuitChallenger,
    )
    from plonky3_recursion_tpu.stark.challenger import DuplexChallenger

    E4 = ext_field(KOALA_BEAR, 4)
    params24 = poseidon2_params(KOALA_BEAR, 24)
    native = DuplexChallenger(KOALA_BEAR, params=params24)
    assert native.RATE == 16 and native.WIDTH == 24
    assert not native.is_default_poseidon2

    b = CircuitBuilder(E4)
    npo = poseidon2_npo_for(KOALA_BEAR.name, 24)
    b.enable_op(npo)
    cc = CircuitChallenger(b, npo.type_id)
    assert cc.RATE == 16 and cc.LIMBS == 6 and cc.RATE_LIMBS == 4

    vals = [int(x) for x in KOALA_BEAR.rand(rng, (21,))]
    for v in vals:
        native.observe(v)
        cc.observe(b.public_input())
    s1 = native.sample()
    s2 = native.sample_ext(E4)
    b.tag("s1", cc.sample())
    b.tag("s2", cc.sample_ext())
    # cross a duplex boundary: rate-16 buffer drains then refills
    for v in vals[:3]:
        native.observe(v)
        cc.observe(b.public_input())
    s3 = native.sample_ext(E4)
    b.tag("s3", cc.sample_ext())
    circuit = b.build()
    r = circuit.runner()
    r.set_public_inputs(vals + vals[:3])
    t = r.run()
    assert int(t.probe("s1")[0]) == s1
    assert np.array_equal(t.probe("s2"), s2)
    assert np.array_equal(t.probe("s3"), s3)

"""Cross-hash recursion: the transcript challenger rides Poseidon1 while
Merkle paths stay Poseidon2 (reference `ChallengerPermConfig` — the
recursion pipeline is generic over the challenger's permutation;
`recursion/src/challenger/circuit.rs`, `public_types.rs` PermConfig).

The native prover/verifier use a Poseidon1-backed DuplexChallenger
(`StarkConfig.challenger_factory`), and the recursive verifier circuit
replays the transcript through the Poseidon1 NPO table
(`StarkConfig.challenger_npo`) — so a layer proof batches BOTH hash
tables (Poseidon2 for MMCS paths, Poseidon1 for the challenger).
"""

import numpy as np
import pytest

from plonky3_recursion_tpu.circuit import CircuitBuilder
from plonky3_recursion_tpu.fields import KOALA_BEAR, ext_field
from plonky3_recursion_tpu.ops.poseidon1 import permute, poseidon1_params
from plonky3_recursion_tpu.prover import BatchStarkProver, circuit_prover_data
from plonky3_recursion_tpu.prover.poseidon1_table import (
    koala_bear_poseidon1_npo,
)
from plonky3_recursion_tpu.stark.challenger import DuplexChallenger
from plonky3_recursion_tpu.stark.fri_pcs import FriParams, TwoAdicFriPcs
from plonky3_recursion_tpu.stark.uni import StarkConfig

E4 = ext_field(KOALA_BEAR, 4)


def poseidon1_challenger_config(params=None) -> StarkConfig:
    p1 = poseidon1_params(KOALA_BEAR, 16)
    return StarkConfig(
        KOALA_BEAR,
        E4,
        TwoAdicFriPcs(KOALA_BEAR, E4, params or FriParams.testing()),
        challenger_factory=lambda: DuplexChallenger(
            KOALA_BEAR, perm_fn=lambda s: permute(p1, s, np)
        ),
        challenger_npo=koala_bear_poseidon1_npo(),
    )


def _fib_proof(cfg, n=8):
    b = CircuitBuilder(E4)
    a = b.public_input()
    bb = b.public_input()
    res = b.public_input()
    for _ in range(n):
        a, bb = bb, b.add(a, bb)
    b.connect(bb, res)
    circuit = b.build()
    pdata = circuit_prover_data(cfg, circuit)
    x, y = 0, 1
    for _ in range(n):
        x, y = y, (x + y) % KOALA_BEAR.P
    r = circuit.runner()
    r.set_public_inputs([0, 1, y])
    traces = r.run()
    prover = BatchStarkProver(cfg)
    proof = prover.prove_all_tables(circuit, traces, pdata)
    return circuit, pdata, prover, proof


@pytest.mark.slow  # compile-heavy parity (fast-lane budget)
def test_poseidon1_challenger_base_proof():
    cfg = poseidon1_challenger_config()
    circuit, pdata, prover, proof = _fib_proof(cfg)
    assert prover.verify_all_tables(circuit, proof, pdata)
    # the transcript genuinely differs from the default Poseidon2 one
    from plonky3_recursion_tpu.stark.uni import koala_bear_config

    cfg2 = koala_bear_config(FriParams.testing())
    _c2, _p2, _pr2, proof2 = _fib_proof(cfg2)
    assert not np.array_equal(
        np.asarray(proof.batch.quotient_commit),
        np.asarray(proof2.batch.quotient_commit),
    )


@pytest.mark.slow
def test_cross_hash_recursion_layer():
    from plonky3_recursion_tpu.recursion.recursion import (
        RecursionInput,
        build_next_layer_prep,
        prove_next_layer,
    )

    cfg = poseidon1_challenger_config()
    circuit, pdata, prover, proof = _fib_proof(cfg)
    inner = RecursionInput(proof, circuit, pdata)
    prep = build_next_layer_prep(cfg, inner)
    # the layer batches BOTH permutation tables
    npo_types = {c.plugin.type_id for c in prep.circuit.npo_calls}
    assert any(t.startswith("poseidon1_perm/") for t in npo_types)
    assert any(t.startswith("poseidon2_perm/") for t in npo_types)
    layer = prove_next_layer(cfg, prep, proof, debug_lookups=True)
    assert prover.verify_all_tables(prep.circuit, layer, prep.pdata)


@pytest.mark.slow
def test_w24_challenger_recursion_layer():
    """Full layer with a WIDE (W24, rate-16) Poseidon2 challenger: the
    transcript replays through the W24 table while Merkle paths stay on
    the W16 table (width-generic ChallengerPermConfig)."""
    from plonky3_recursion_tpu.ops.poseidon2 import (
        permute as p2_permute,
        poseidon2_params,
    )
    from plonky3_recursion_tpu.prover.poseidon2_table import (
        poseidon2_npo_for,
    )
    from plonky3_recursion_tpu.recursion.recursion import (
        RecursionInput,
        build_next_layer_prep,
        prove_next_layer,
    )

    params24 = poseidon2_params(KOALA_BEAR, 24)
    cfg = StarkConfig(
        KOALA_BEAR,
        E4,
        TwoAdicFriPcs(KOALA_BEAR, E4, FriParams.testing()),
        challenger_factory=lambda: DuplexChallenger(
            KOALA_BEAR, params=params24
        ),
        challenger_npo=poseidon2_npo_for(KOALA_BEAR.name, 24),
    )
    circuit, pdata, prover, proof = _fib_proof(cfg)
    assert prover.verify_all_tables(circuit, proof, pdata)
    inner = RecursionInput(proof, circuit, pdata)
    prep = build_next_layer_prep(cfg, inner)
    npo_types = {c.plugin.type_id for c in prep.circuit.npo_calls}
    assert any(t.endswith("_w24") for t in npo_types)
    layer = prove_next_layer(cfg, prep, proof, debug_lookups=True)
    assert prover.verify_all_tables(prep.circuit, layer, prep.pdata)

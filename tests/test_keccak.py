"""Keccak-f[1600] AIR: spec vectors, constraint satisfaction, batch proof."""

import numpy as np
import pytest

from plonky3_recursion_tpu.stark.batch import (
    StarkInstance,
    commit_preprocessed,
    prove_batch,
    verify_batch,
)
from plonky3_recursion_tpu.utils.test_utils import (
    check_air_satisfies,
    make_test_config,
)
from plonky3_recursion_tpu.workloads.keccak import (
    ROWS_PER_PERM,
    KeccakAir,
    keccak_f_rounds,
    keccak_f_trace,
    keccak_preprocessed,
)


def test_keccak_f_known_vector():
    """Keccak-256("") through one permutation (standard digest)."""
    block = bytearray(200)
    block[0] = 0x01
    block[135] |= 0x80
    A = [[0] * 5 for _ in range(5)]
    for i in range(25):
        A[i % 5][i // 5] = int.from_bytes(block[8 * i : 8 * i + 8], "little")
    _snaps, out = keccak_f_rounds(A)
    digest = b"".join(
        out[i % 5][i // 5].to_bytes(8, "little") for i in range(25)
    )[:32]
    assert digest.hex() == (
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )


def test_keccak_air_satisfied(rng):
    config = make_test_config()
    states = [
        [[int(v) for v in rng.integers(0, 1 << 64, 5, dtype=np.uint64)]
         for _x in range(5)]
        for _ in range(2)
    ]
    states = [list(map(list, zip(*s))) for s in states]  # 5x5
    trace = keccak_f_trace(states)
    prep = keccak_preprocessed(2, trace.shape[0])
    assert check_air_satisfies(config, KeccakAir(), trace, (), prep)
    # corrupt one chi output bit -> constraint violation
    bad = trace.copy()
    from plonky3_recursion_tpu.workloads.keccak import _a2_idx

    bad[1, _a2_idx(2, 3, 17)] ^= 1
    assert not check_air_satisfies(config, KeccakAir(), bad, (), prep)
    # corrupt a state bit on a transition row
    bad = trace.copy()
    from plonky3_recursion_tpu.workloads.keccak import _a_idx

    bad[5, _a_idx(1, 1, 1)] ^= 1
    assert not check_air_satisfies(config, KeccakAir(), bad, (), prep)


@pytest.mark.slow
def test_keccak_batch_proof(rng):
    config = make_test_config()
    states = [[[0] * 5 for _ in range(5)]]
    trace = keccak_f_trace(states)
    prep = keccak_preprocessed(1, trace.shape[0])
    inst = StarkInstance(KeccakAir(), trace, [], preprocessed=prep)
    common = commit_preprocessed(config, [inst])
    proof = prove_batch(config, [inst], common)
    assert verify_batch(config, [(KeccakAir(), [])], proof, common)


@pytest.mark.slow
def test_keccak_recursion_layer(rng):
    """One full keccak recursion layer: prove Keccak-f[1600] (n=1) as a
    batch-stark proof, verify it IN-CIRCUIT (batch verifier over the
    symbolic KeccakAir constraints), prove the layer, verify natively,
    and reject a tampered inner commitment — the
    `recursive_keccak.rs` flagship flow (BASELINE.md keccak rows)."""
    from plonky3_recursion_tpu.circuit import WitnessConflict
    from plonky3_recursion_tpu.prover import (
        BatchStarkProver,
        circuit_prover_data,
    )
    from plonky3_recursion_tpu.recursion.batch_verifier import (
        build_batch_verifier_circuit,
    )

    config = make_test_config()
    states = [[[0] * 5 for _ in range(5)]]
    trace = keccak_f_trace(states)
    prep = keccak_preprocessed(1, trace.shape[0])
    inst = StarkInstance(KeccakAir(), trace, [], preprocessed=prep)
    common = commit_preprocessed(config, [inst])
    proof = prove_batch(config, [inst], common)
    assert verify_batch(config, [(KeccakAir(), [])], proof, common)

    vcr = build_batch_verifier_circuit(
        config, [(KeccakAir(), [])], proof.shapes, common
    )
    circuit = vcr.builder.build()
    pdata = circuit_prover_data(config, circuit)

    def run_layer(p):
        runner = circuit.runner()
        runner.set_public_inputs(vcr.pack_public_inputs(p))
        runner.set_private_inputs(vcr.pack_private_inputs(p))
        for key, data in vcr.pack_npo_private(p).items():
            runner.set_private_data(key, data)
        return runner.run()

    traces = run_layer(proof)
    prover = BatchStarkProver(config)
    layer = prover.prove_all_tables(circuit, traces, pdata)
    assert prover.verify_all_tables(circuit, layer, pdata)

    # tampered inner trace commitment must not satisfy the layer circuit
    import copy

    bad = copy.deepcopy(proof)
    bad.trace_commit = np.asarray(bad.trace_commit).copy()
    bad.trace_commit[0] = (int(bad.trace_commit[0]) + 1) % config.field.P
    with pytest.raises((WitnessConflict, ValueError)):
        run_layer(bad)

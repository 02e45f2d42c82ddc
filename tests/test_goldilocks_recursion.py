"""Goldilocks recursion: GL uni-stark proofs verified in-circuit.

Mirrors the reference's `recursion/tests/goldilocks.rs`: prove a GL
uni-stark natively (D=2 extension, Poseidon2 W8, 4-element digests),
lower its verifier into a circuit over GL (GoldilocksD2Width8 perm NPO,
GL challenger/MMCS gadgets), pack the proof, and check witness
satisfaction via `runner.run()` — exactly the reference test's
acceptance criterion (it also stops at runner.run()).
"""

import numpy as np
import pytest

from plonky3_recursion_tpu.circuit.runner import WitnessConflict
from plonky3_recursion_tpu.recursion.goldilocks import (
    GlSymFibAir,
    GlSymMulAir,
    GlUniProofView,
    build_gl_uni_verifier_circuit,
    run_gl_uni_verifier,
)
from plonky3_recursion_tpu.stark.goldilocks_stark import (
    GL,
    GlFibAir,
    GlMulAir,
    P_GOLDILOCKS,
    gl_prove,
    gl_verify,
    goldilocks_config,
)


def _fib_proof(n=8):
    config = goldilocks_config()
    air = GlFibAir()
    rows = []
    a, b = 0, 1
    for _ in range(n):
        rows.append((a, b))
        a, b = b, (a + b) % P_GOLDILOCKS
    trace = np.stack(
        [np.stack([GL.from_ints([x])[0], GL.from_ints([y])[0]]) for x, y in rows]
    )
    publics = [0, 1, rows[-1][1]]
    proof = gl_prove(config, air, trace, publics)
    assert gl_verify(config, air, proof, publics)
    return config, proof, publics


def test_goldilocks_fibonacci_recursive_verifier():
    """Reference `test_goldilocks_fibonacci_verifier` analog."""
    config, proof, publics = _fib_proof()
    circuit, vcr, _npo = build_gl_uni_verifier_circuit(
        config, GlSymFibAir(), proof.log_n
    )
    traces = run_gl_uni_verifier(circuit, vcr, proof, publics)
    assert traces is not None


def test_goldilocks_recursive_verifier_rejects_tampered_proof():
    config, proof, publics = _fib_proof()
    circuit, vcr, _npo = build_gl_uni_verifier_circuit(
        config, GlSymFibAir(), proof.log_n
    )
    # tamper a trace opening: the in-circuit FRI reduction must fail
    bad = GlUniProofView(proof, publics)
    bad.trace_local = bad.trace_local.copy()
    bad.trace_local[0, 0] = (int(bad.trace_local[0, 0]) + 1) % P_GOLDILOCKS
    runner = circuit.runner()
    runner.set_public_inputs(vcr.pack_public_inputs(bad))
    runner.set_private_inputs(vcr.pack_private_inputs(bad))
    for key, data in vcr.pack_npo_private(bad).items():
        runner.set_private_data(key, data)
    with pytest.raises((WitnessConflict, Exception)):
        runner.run()


def test_goldilocks_recursive_verifier_rejects_wrong_publics():
    config, proof, publics = _fib_proof()
    circuit, vcr, _npo = build_gl_uni_verifier_circuit(
        config, GlSymFibAir(), proof.log_n
    )
    bad_publics = list(publics)
    bad_publics[2] = (bad_publics[2] + 1) % P_GOLDILOCKS
    with pytest.raises(Exception):
        run_gl_uni_verifier(circuit, vcr, proof, bad_publics)


def test_goldilocks_mul_recursive_verifier_with_preprocessed():
    """Reference `test_goldilocks_mul_verifier_with_preprocessed` analog."""
    n = 8
    config = goldilocks_config()
    air = GlMulAir()
    rng = np.random.default_rng(7)
    k_ints = [int(x) for x in rng.integers(1, 1 << 60, n)]
    x_ints = [int(x) for x in rng.integers(1, 1 << 60, n)]
    x_ints[0] = 12345
    prep = np.stack([GL.from_ints([k]) for k in k_ints])  # (n, 1, 2)
    trace = np.stack(
        [
            np.stack(
                [
                    GL.from_ints([x])[0],
                    GL.from_ints([k * x % P_GOLDILOCKS])[0],
                ]
            )
            for k, x in zip(k_ints, x_ints)
        ]
    )
    publics = [x_ints[0]]
    proof = gl_prove(config, air, trace, publics, prep=prep)
    assert gl_verify(config, air, proof, publics)
    circuit, vcr, _npo = build_gl_uni_verifier_circuit(
        config, GlSymMulAir(), proof.log_n
    )
    traces = run_gl_uni_verifier(circuit, vcr, proof, publics)
    assert traces is not None

"""Aux subsystems: tracing spans, op-count profiling, verifier manifest
(SURVEY.md §5)."""

import numpy as np
import pytest

from plonky3_recursion_tpu.circuit import CircuitBuilder
from plonky3_recursion_tpu.fields import KOALA_BEAR, ext_field
from plonky3_recursion_tpu.prover import BatchStarkProver, circuit_prover_data
from plonky3_recursion_tpu.prover.manifest import VerifierManifest
from plonky3_recursion_tpu.stark.fri_pcs import FriParams
from plonky3_recursion_tpu.stark.uni import koala_bear_config
from plonky3_recursion_tpu.utils import tracing
from tests.test_circuit_prover import fib_value, fibonacci_circuit

E4 = ext_field(KOALA_BEAR, 4)


def test_tracing_spans():
    tracing.reset()
    tracing.enable(True)
    try:
        config = koala_bear_config(FriParams.testing())
        circuit = fibonacci_circuit(16)
        pdata = circuit_prover_data(config, circuit)
        r = circuit.runner()
        r.set_public_inputs([0, 1, fib_value(16)])
        traces = r.run()
        BatchStarkProver(config).prove_all_tables(circuit, traces, pdata)
        report = tracing.report()
        assert "runner.run" in report
        assert "prove_batch" in report
        assert "commit_traces" in report
        assert tracing.find_span("pcs_open") > 0
    finally:
        tracing.enable(False)
        tracing.reset()


def test_op_count_profiling():
    b = CircuitBuilder(E4)
    x = b.public_input()
    b.push_scope("layer1")
    y = b.mul(x, x)
    b.push_scope("inner")
    z = b.add(y, x)
    b.pop_scope()
    b.pop_scope()
    b.sub(z, x)
    report = b.dump_profile()
    assert "[PROFILING] layer1: total=1 mul=1" in report
    assert "[PROFILING] layer1/inner: total=1 add=1" in report
    assert "[PROFILING] <root>: total=1 sub=1" in report


def test_verifier_manifest():
    config = koala_bear_config(FriParams.testing())
    circuit = fibonacci_circuit(16)
    pdata = circuit_prover_data(config, circuit)
    r = circuit.runner()
    r.set_public_inputs([0, 1, fib_value(16)])
    proof = BatchStarkProver(config).prove_all_tables(
        circuit, r.run(), pdata
    )
    manifest = VerifierManifest.from_circuit(config, circuit, pdata)
    assert manifest.check(proof)
    # a proof with different shapes is rejected
    other = fibonacci_circuit(128)
    pdata2 = circuit_prover_data(config, other)
    r2 = other.runner()
    r2.set_public_inputs([0, 1, fib_value(128)])
    proof2 = BatchStarkProver(config).prove_all_tables(
        other, r2.run(), pdata2
    )
    with pytest.raises(ValueError, match="manifest"):
        manifest.check(proof2)


def test_manifest_circuit_free_verification():
    """Metadata-only verification (reference verify_all_tables rebuilding
    AIRs from proof metadata): the manifest alone — no compiled circuit —
    rebuilds every AIR, re-derives lookups, and binds publics."""
    import numpy as np

    config = koala_bear_config(FriParams.testing())
    circuit = fibonacci_circuit(16)
    pdata = circuit_prover_data(config, circuit)
    r = circuit.runner()
    r.set_public_inputs([0, 1, fib_value(16)])
    proof = BatchStarkProver(config).prove_all_tables(circuit, r.run(), pdata)
    manifest = VerifierManifest.from_circuit(config, circuit, pdata)
    assert manifest.verify_all_tables(config, proof)
    # tampered public values rejected by the terminal recomputation
    import copy

    bad = copy.deepcopy(proof)
    bad.public_values = np.asarray(bad.public_values).copy()
    bad.public_values[2, 0] = (int(bad.public_values[2, 0]) + 1) % config.field.P
    bad.batch.publics[1] = [int(x) for x in bad.public_values.reshape(-1)]
    with pytest.raises(ValueError):
        manifest.verify_all_tables(config, bad)


def test_manifest_with_npo_tables():
    """AIR reconstruction through the plugin registry for a proof that
    carries Poseidon2 + recompose + Horner tables (a recursion layer)."""
    from tests.test_recursion import make_inner
    from plonky3_recursion_tpu.recursion.recursion import (
        build_next_layer_prep,
        prove_next_layer,
    )

    config, inner = make_inner(n=8)
    prep = build_next_layer_prep(config, inner)
    layer = prove_next_layer(config, prep, inner.proof)
    manifest = VerifierManifest.from_circuit(config, prep.circuit, prep.pdata)
    assert len(manifest.npo_types) >= 2
    assert manifest.verify_all_tables(config, layer)

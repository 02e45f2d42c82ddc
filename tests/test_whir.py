"""WHIR PCS: native commit/prove/verify, adversarial rejection, and the
in-circuit verifier (reference `p3-whir`/`p3-sumcheck` +
`recursion/tests/whir_verifier.rs` analog)."""

import dataclasses

import numpy as np
import pytest

from plonky3_recursion_tpu.fields import KOALA_BEAR, ext_field
from plonky3_recursion_tpu.stark.challenger import DuplexChallenger
from plonky3_recursion_tpu.stark.fri_pcs import FriParams
from plonky3_recursion_tpu.stark.uni import koala_bear_config
from plonky3_recursion_tpu.stark.whir import Whir, WhirParams

F = KOALA_BEAR
E4 = ext_field(F, 4)

PARAMS = WhirParams(
    num_variables=8,
    log_inv_rate=2,
    folding_factor=2,
    final_num_variables=2,
    num_queries=12,
)


def _uni_eval(vec, z):
    acc = np.zeros(4, dtype=np.uint32)
    for a in range(len(vec) - 1, -1, -1):
        acc = E4.add(
            E4.mul(acc, z, np), E4.from_base(np.asarray(vec[a]), np), np
        )
    return acc


def _setup(rng, params=PARAMS):
    w = Whir(F, E4, params)
    vec = F.rand(rng, (1 << params.num_variables,))
    root, pdata = w.commit(vec)
    pts = [E4.rand(rng, ()) for _ in range(2)]
    vals, proof = w.prove(pdata, pts, DuplexChallenger(F))
    return w, vec, root, pts, vals, proof


def test_whir_roundtrip(rng):
    w, vec, root, pts, vals, proof = _setup(rng)
    for z, v in zip(pts, vals):
        assert np.array_equal(np.asarray(v), _uni_eval(vec, z))
    assert w.verify(root, pts, vals, proof, DuplexChallenger(F))


def test_whir_with_pow(rng):
    params = dataclasses.replace(PARAMS, query_pow_bits=4)
    w, _vec, root, pts, vals, proof = _setup(rng, params)
    assert w.verify(root, pts, vals, proof, DuplexChallenger(F))
    bad = dataclasses.replace(
        proof, pow_witnesses=[x + 1 for x in proof.pow_witnesses]
    )
    with pytest.raises(ValueError):
        w.verify(root, pts, vals, bad, DuplexChallenger(F))


def test_whir_rejects_tampering(rng):
    w, _vec, root, pts, vals, proof = _setup(rng)
    # wrong claimed value
    bad_vals = [np.asarray(vals[0]).copy(), vals[1]]
    bad_vals[0][0] = (int(bad_vals[0][0]) + 1) % F.P
    with pytest.raises(ValueError):
        w.verify(root, pts, bad_vals, proof, DuplexChallenger(F))
    # tampered final poly
    bad = dataclasses.replace(
        proof, final_poly=(proof.final_poly + 1) % F.P
    )
    with pytest.raises(ValueError):
        w.verify(root, pts, vals, bad, DuplexChallenger(F))
    # tampered sumcheck round poly
    sp = [list(c) for c in proof.sumcheck_polys]
    h0, hinf = sp[1][0]
    sp[1][0] = ((h0 + 1) % F.P, hinf)
    bad = dataclasses.replace(proof, sumcheck_polys=sp)
    with pytest.raises(ValueError):
        w.verify(root, pts, vals, bad, DuplexChallenger(F))
    # tampered intermediate commitment
    cm = [np.asarray(c).copy() for c in proof.commitments]
    cm[1][0] ^= 1
    bad = dataclasses.replace(proof, commitments=cm)
    with pytest.raises(ValueError):
        w.verify(root, pts, vals, bad, DuplexChallenger(F))


def test_whir_ext_vector(rng):
    """Extension-valued committed vector (round-0 leaves are ext rows)."""
    params = dataclasses.replace(PARAMS, num_variables=6)
    w = Whir(F, E4, params)
    vec = E4.rand(rng, (1 << 6,))
    root, pdata = w.commit(vec)
    pts = [E4.rand(rng, ())]
    vals, proof = w.prove(pdata, pts, DuplexChallenger(F))
    assert w.verify(root, pts, vals, proof, DuplexChallenger(F))


def test_whir_verifier_circuit(rng):
    """The in-circuit WHIR verifier accepts a native proof and the layer
    proof verifies — `recursion/tests/whir_verifier.rs` analog."""
    from plonky3_recursion_tpu.prover import (
        BatchStarkProver,
        circuit_prover_data,
    )
    from plonky3_recursion_tpu.recursion.whir_verifier import (
        _WhirView,
        build_whir_verifier_circuit,
    )

    config = koala_bear_config(FriParams.testing())
    w, _vec, root, pts, vals, proof = _setup(rng)
    vcr = build_whir_verifier_circuit(config, PARAMS, n_points=len(pts))
    circuit = vcr.builder.build()
    pdata = circuit_prover_data(config, circuit)
    view = _WhirView(root, pts, vals, proof)
    runner = circuit.runner()
    runner.set_public_inputs(vcr.pack_public_inputs(view))
    runner.set_private_inputs(vcr.pack_private_inputs(view))
    for key, data in vcr.pack_npo_private(view).items():
        runner.set_private_data(key, data)
    traces = runner.run()
    prover = BatchStarkProver(config)
    layer = prover.prove_all_tables(circuit, traces, pdata, debug_lookups=True)
    assert prover.verify_all_tables(circuit, layer, pdata)
    # a tampered claimed value cannot satisfy the circuit
    bad_vals = [np.asarray(vals[0]).copy(), vals[1]]
    bad_vals[0][0] = (int(bad_vals[0][0]) + 1) % F.P
    bad_view = _WhirView(root, pts, bad_vals, proof)
    from plonky3_recursion_tpu.circuit import WitnessConflict

    r2 = circuit.runner()
    r2.set_public_inputs(vcr.pack_public_inputs(bad_view))
    r2.set_private_inputs(vcr.pack_private_inputs(bad_view))
    for key, data in vcr.pack_npo_private(bad_view).items():
        r2.set_private_data(key, data)
    with pytest.raises((WitnessConflict, ValueError)):
        r2.run()


def test_whir_recursion_backend(rng):
    """WHIR plugged through `PcsRecursionBackend`: the layer prep/prove
    pipeline (`NextLayerPrep` + `prove_next_layer`) drives the WHIR
    verifier circuit exactly like the FRI backend drives its own —
    the VERDICT/SURVEY "WHIR as a pipeline PCS" plug-in point."""
    from plonky3_recursion_tpu.prover import (
        BatchStarkProver,
        circuit_prover_data,
    )
    from plonky3_recursion_tpu.recursion.backend import WhirRecursionBackend
    from plonky3_recursion_tpu.recursion.recursion import (
        NextLayerPrep,
        prove_next_layer,
    )
    from plonky3_recursion_tpu.recursion.whir_verifier import _WhirView

    config = koala_bear_config(FriParams.testing())
    w, _vec, root, pts, vals, proof = _setup(rng)
    backend = WhirRecursionBackend(PARAMS, n_points=len(pts))
    vcr = backend.build_verifier_circuit(config)
    circuit = vcr.builder.build()
    pdata = circuit_prover_data(config, circuit)
    prep = NextLayerPrep(circuit, vcr, pdata, backend)
    view = _WhirView(root, pts, vals, proof)
    layer = prove_next_layer(config, prep, view, debug_lookups=True)
    prover = BatchStarkProver(config)
    assert prover.verify_all_tables(circuit, layer, prep.pdata)
    # the backend's fingerprint key distinguishes WHIR shapes
    k1 = backend.fingerprint_key(config)
    k2 = WhirRecursionBackend(
        dataclasses.replace(PARAMS, num_queries=11), n_points=len(pts)
    ).fingerprint_key(config)
    assert k1 != k2 and k1[0] == "whir"

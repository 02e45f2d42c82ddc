"""THE milestone test: a batch-stark circuit proof recursively verified —
build verifier circuit -> run -> prove layer -> native verify
(SURVEY.md §7.3 minimum end-to-end slice)."""

import numpy as np
import pytest

from plonky3_recursion_tpu.circuit import CircuitBuilder, WitnessConflict
from plonky3_recursion_tpu.fields import KOALA_BEAR, ext_field
from plonky3_recursion_tpu.prover import BatchStarkProver, circuit_prover_data
from plonky3_recursion_tpu.recursion.recursion import (
    RecursionInput,
    build_and_prove_next_layer,
    build_next_layer_prep,
    prove_next_layer,
)
from plonky3_recursion_tpu.stark.fri_pcs import FriParams
from plonky3_recursion_tpu.stark.uni import koala_bear_config

E4 = ext_field(KOALA_BEAR, 4)


def make_inner(n=8):
    config = koala_bear_config(FriParams.testing())
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
        x, y = y, (x + y) % KOALA_BEAR.P
    runner = circuit.runner()
    runner.set_public_inputs([0, 1, y])
    traces = runner.run()
    prover = BatchStarkProver(config)
    proof = prover.prove_all_tables(circuit, traces, pdata, debug_lookups=True)
    assert prover.verify_all_tables(circuit, proof, pdata)
    return config, RecursionInput(proof, circuit, pdata)


@pytest.fixture(scope="module")
def layer1():
    config, inner = make_inner()
    prep = build_next_layer_prep(config, inner)
    return config, inner, prep


def test_recursion_layer_proves_and_verifies(layer1):
    config, inner, prep = layer1
    proof1 = prove_next_layer(config, prep, inner.proof, debug_lookups=True)
    prover = BatchStarkProver(config)
    assert prover.verify_all_tables(prep.circuit, proof1, prep.pdata)
    # the outer proof exposes the APP block (the inner publics' coeff-0
    # values) among its own public values, after the 8-element prep pin
    rows = [tuple(int(x) for x in r) for r in np.asarray(proof1.public_values)]
    needle = [
        (int(v), 0, 0, 0)
        for v in np.asarray(inner.proof.public_values)[:, 0]
    ]
    assert _contains_subsequence(rows, needle)
    # constant public width: pin (8) + app block
    assert len(rows) == 8 + len(needle)


def test_recursion_rejects_tampered_inner_proof(layer1):
    config, inner, prep = layer1
    import copy

    bad = copy.deepcopy(inner.proof)
    # tamper an opened trace value in the inner proof
    bad.batch.trace_openings[2] = (
        bad.batch.trace_openings[2][0] ^ 1,
        bad.batch.trace_openings[2][1],
    )
    with pytest.raises((WitnessConflict, ValueError)):
        prove_next_layer(config, prep, bad, debug_lookups=True)


def test_recursion_rejects_tampered_inner_publics(layer1):
    config, inner, prep = layer1
    import copy

    bad = copy.deepcopy(inner.proof)
    bad.batch.publics[1][0] = (bad.batch.publics[1][0] + 1) % KOALA_BEAR.P
    with pytest.raises((WitnessConflict, ValueError)):
        prove_next_layer(config, prep, bad, debug_lookups=True)


@pytest.mark.slow
def test_two_layer_chain_and_prep_cache():
    """Chain 2 recursion layers — layer 2 recursively verifies a proof that
    itself contains the Poseidon2 table — and check prep-cache behavior:
    same-fingerprint inners reuse the circuit + offline prep
    (reference `recursion.rs:295-342`, `recursive_fibonacci.rs:385-443`)."""
    from plonky3_recursion_tpu.recursion.recursion import (
        NextLayerPrepCache,
        inner_fingerprint,
    )

    config, inner = make_inner()
    cache = NextLayerPrepCache()
    layer1 = build_and_prove_next_layer(config, inner, cache=cache)
    prover = BatchStarkProver(config)
    assert prover.verify_all_tables(
        layer1.circuit, layer1.proof, layer1.prover_data
    )
    layer2 = build_and_prove_next_layer(config, layer1, cache=cache)
    assert prover.verify_all_tables(
        layer2.circuit, layer2.proof, layer2.prover_data
    )
    assert cache.misses == 2 and cache.hits == 0
    # app block propagates verbatim: layer2 re-exposes the same 3 fib
    # values after its 8-element prep pin, at constant public width
    l1 = np.asarray(layer1.proof.public_values)
    l2 = np.asarray(layer2.proof.public_values)
    assert l1.shape == l2.shape == (11, 4)
    assert np.array_equal(l1[8:], l2[8:])
    # circuit fixed point: keep building (no proving) until the verifier
    # circuit's fingerprint stabilizes — reached by layer 4, after which
    # the prep cache hits forever (reference `recursion.rs:295-342`)
    from plonky3_recursion_tpu.recursion.recursion import (
        RecursionInput,
        build_next_layer_prep,
    )

    inner = layer2
    fps = [inner_fingerprint(config, layer1), inner_fingerprint(config, layer2)]
    for _k in range(3, 6):
        prep = build_next_layer_prep(config, inner)
        d = prep.circuit.ext.D
        inner = RecursionInput(
            None,
            prep.circuit,
            prep.pdata,
            app_public_idx=[
                p * d for p in prep.vcr.app_public_positions
            ],
        )
        fps.append(inner_fingerprint(config, inner))
        if fps[-1] == fps[-2]:
            break
    assert fps[-1] == fps[-2], "no fixed point within 5 layers"
    assert cache.get_or_build(config, inner) is cache.get_or_build(
        config, inner
    )
    assert cache.hits >= 1


def _contains_subsequence(hay, needle):
    for i in range(len(hay) - len(needle) + 1):
        if hay[i : i + len(needle)] == needle:
            return True
    return False


@pytest.mark.slow
def test_standard_params_e2e():
    """Full pipeline at the reference's STANDARD params (blowup 4, 54
    queries, PoW 15, arity 4, final-poly 32) — catches params-sensitive
    bugs (e.g. phase-schedule roll-in capping) that testing params mask."""
    from plonky3_recursion_tpu.stark.fri_pcs import FriParams

    config = koala_bear_config(FriParams.standard())
    b = CircuitBuilder(E4)
    a = b.public_input()
    bb = b.public_input()
    res = b.public_input()
    for _ in range(64):
        a, bb = bb, b.add(a, bb)
    b.connect(bb, res)
    circuit = b.build()
    pdata = circuit_prover_data(config, circuit)
    x, y = 0, 1
    for _ in range(64):
        x, y = y, (x + y) % KOALA_BEAR.P
    runner = circuit.runner()
    runner.set_public_inputs([0, 1, y])
    traces = runner.run()
    prover = BatchStarkProver(config)
    proof = prover.prove_all_tables(circuit, traces, pdata, debug_lookups=True)
    assert prover.verify_all_tables(circuit, proof, pdata)
    # one full recursion layer at standard params
    inner = RecursionInput(proof, circuit, pdata)
    prep = build_next_layer_prep(config, inner)
    layer = prove_next_layer(config, prep, inner.proof)
    assert prover.verify_all_tables(prep.circuit, layer, prep.pdata)


def test_recursion_optimized_profile():
    """ConstraintProfile.RECURSION_OPTIMIZED shapes the layer: wider lane
    packing and K=16 packed Horner rows, proven and verified end-to-end
    (reference ProveNextLayerParams + ConstraintProfile)."""
    from plonky3_recursion_tpu.prover.constraint_profile import (
        ConstraintProfile,
    )
    from plonky3_recursion_tpu.recursion.recursion import (
        ProveNextLayerParams,
    )

    config, inner = make_inner(n=8)
    params = ProveNextLayerParams(
        profile=ConstraintProfile.RECURSION_OPTIMIZED
    )
    prep = build_next_layer_prep(config, inner, params)
    assert prep.pdata.packing.alu_lanes == 8
    assert any(
        "k16" in c.plugin.type_id for c in prep.circuit.npo_calls
    )
    layer = prove_next_layer(config, prep, inner.proof)
    prover = BatchStarkProver(config)
    assert prover.verify_all_tables(prep.circuit, layer, prep.pdata)


def test_pcs_recursion_backend_dispatch():
    """The recursion pipeline is generic over the PCS backend (reference
    PcsRecursionBackend, recursion.rs:170-217): an explicitly-passed FRI
    backend produces a layer identical to the default, and the prep-cache
    fingerprint includes the backend's PCS parameter key, so two configs
    differing only in FRI params never share cached prep."""
    from plonky3_recursion_tpu.recursion.backend import FriRecursionBackend
    from plonky3_recursion_tpu.recursion.recursion import (
        NextLayerPrepCache,
        inner_fingerprint,
    )

    config, inner = make_inner(n=8)
    backend = FriRecursionBackend()
    prep = build_next_layer_prep(config, inner, backend=backend)
    layer = prove_next_layer(config, prep, inner.proof)
    prover = BatchStarkProver(config)
    assert prover.verify_all_tables(prep.circuit, layer, prep.pdata)

    # the backend key distinguishes PCS configurations in the cache
    fp_default = inner_fingerprint(config, inner)
    fp_explicit = inner_fingerprint(config, inner, backend)
    assert fp_default == fp_explicit
    key = backend.fingerprint_key(config)
    assert key[0] == "fri" and len(key) == 10
    other = koala_bear_config(FriParams.standard(124))
    assert backend.fingerprint_key(other) != key

    cache = NextLayerPrepCache()
    p1 = cache.get_or_build(config, inner, backend=backend)
    p2 = cache.get_or_build(config, inner, backend=backend)
    assert p1 is p2 and cache.hits == 1


@pytest.mark.slow
def test_midrange_params_recursion_layer():
    """A third FRI-parameter point (blowup 1, final-poly 4, arity 1,
    commit PoW 1): exercises in-circuit FRI at a different final-poly
    degree and with per-phase commit grinding (reference
    `recursion/tests/fri.rs` degree-variant coverage)."""
    from plonky3_recursion_tpu.stark.fri_pcs import FriParams

    params = FriParams(
        log_blowup=1,
        log_final_poly_len=2,
        num_queries=6,
        commit_pow_bits=1,
        query_pow_bits=1,
        max_log_arity=1,
    )
    config = koala_bear_config(params)
    b = CircuitBuilder(E4)
    a = b.public_input()
    bb = b.public_input()
    res = b.public_input()
    for _ in range(16):
        a, bb = bb, b.add(a, bb)
    b.connect(bb, res)
    circuit = b.build()
    pdata = circuit_prover_data(config, circuit)
    x, y = 0, 1
    for _ in range(16):
        x, y = y, (x + y) % KOALA_BEAR.P
    runner = circuit.runner()
    runner.set_public_inputs([0, 1, y])
    prover = BatchStarkProver(config)
    proof = prover.prove_all_tables(circuit, runner.run(), pdata)
    assert prover.verify_all_tables(circuit, proof, pdata)
    inner = RecursionInput(proof, circuit, pdata)
    prep = build_next_layer_prep(config, inner)
    layer = prove_next_layer(config, prep, inner.proof, debug_lookups=True)
    assert prover.verify_all_tables(prep.circuit, layer, prep.pdata)


def test_layer_witness_native_matches_python(rng):
    """The C++ whole-schedule executor produces a bit-identical witness
    table to the pure-python level walk on a REAL recursion-layer circuit
    (chained perms + hints + recompose + packed Horner interleaved)."""
    config, inner = make_inner(16)
    proof = inner.proof
    prep = build_next_layer_prep(config, inner)

    def fill(r):
        r.set_public_inputs(prep.vcr.pack_public_inputs(proof.batch))
        r.set_private_inputs(prep.vcr.pack_private_inputs(proof.batch))
        prep.backend.set_private_data(r, prep.vcr, proof.batch)
        return r.run()

    r_native = prep.circuit.runner()
    assert r_native._native is not None, "native executor unavailable"
    t_native = fill(r_native)
    r_py = prep.circuit.runner()
    r_py._native = None
    t_py = fill(r_py)
    assert np.array_equal(t_native.witness, t_py.witness)
    # chained record arrays agree with the python dict records
    for tid, arrs in t_native.npo_arrays.items():
        if "states" not in arrs:
            continue
        recs_py = t_py.npo_records[tid]
        plan = prep.circuit._exec_plan_cache
        sbase = plan.chained_slots[tid]
        for op_id, sl in list(sbase.items())[:50]:
            st, bit, sm, bit2 = recs_py[op_id]
            assert np.array_equal(arrs["states"][sl], st)
            assert int(arrs["bits"][sl]) == int(bit)
            assert int(arrs["sums"][sl]) == int(sm)

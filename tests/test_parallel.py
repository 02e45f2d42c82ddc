"""Multi-device sharding: four-step NTT + sharded Merkle commit on the
virtual 8-device CPU mesh (SURVEY.md §2.7 distributed backend)."""

import numpy as np
import pytest

import jax

from plonky3_recursion_tpu.fields import KOALA_BEAR as F
from plonky3_recursion_tpu.ops.ntt import ntt
from plonky3_recursion_tpu.parallel.mesh import make_mesh, sharded_commit_root
from plonky3_recursion_tpu.parallel.ntt import sharded_ntt
from plonky3_recursion_tpu.stark.merkle import MerkleMmcs

needs_mesh = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@needs_mesh
@pytest.mark.slow
def test_sharded_ntt_matches_host(rng):
    mesh = make_mesh(8)
    for log_n in (9, 12):
        x = F.rand(rng, (1 << log_n,))
        got = np.asarray(sharded_ntt(F, x, mesh))
        want = ntt(F, x[:, None], np)[:, 0]
        assert np.array_equal(got, want), log_n


@needs_mesh
@pytest.mark.slow
def test_sharded_merkle_matches_host(rng):
    mesh = make_mesh(8)
    mat = F.rand(rng, (64, 8))
    root = np.asarray(sharded_commit_root(F, mat, mesh))
    want, _tree = MerkleMmcs(F).commit([mat])
    assert np.array_equal(root, want)


@needs_mesh
def test_mesh_commit_matches_host(rng):
    """mesh-sharded PCS commit == host commit (same root, coeffs, LDEs)."""
    from plonky3_recursion_tpu.fields import ext_field
    from plonky3_recursion_tpu.stark.fri_pcs import FriParams, TwoAdicFriPcs

    E4 = ext_field(F, 4)
    mesh = make_mesh(8)
    pcs_mesh = TwoAdicFriPcs(F, E4, FriParams.testing(), mesh=mesh)
    pcs_host = TwoAdicFriPcs(F, E4, FriParams.testing())
    mats = [(1, F.rand(rng, (64, 5))), (1, F.rand(rng, (32, 3)))]
    dm = pcs_mesh.commit(mats)
    dh = pcs_host.commit(mats)
    assert np.array_equal(dm.commitment, dh.commitment)
    for a, b in zip(dm.matrices, dh.matrices):
        assert np.array_equal(np.asarray(a.coeffs), np.asarray(b.coeffs))


@needs_mesh
def test_mesh_batch_stark_prove(rng):
    """A complete (tiny) batch-stark circuit proof produced through the
    mesh-sharded commit/NTT/fold path, natively verified."""
    from plonky3_recursion_tpu.circuit import CircuitBuilder
    from plonky3_recursion_tpu.fields import ext_field
    from plonky3_recursion_tpu.prover import (
        BatchStarkProver,
        circuit_prover_data,
    )
    from plonky3_recursion_tpu.stark.fri_pcs import FriParams, TwoAdicFriPcs
    from plonky3_recursion_tpu.stark.uni import StarkConfig

    E4 = ext_field(F, 4)
    mesh = make_mesh(8)
    config = StarkConfig(
        F, E4, TwoAdicFriPcs(F, E4, FriParams.testing(), mesh=mesh)
    )
    b = CircuitBuilder(E4)
    a = b.public_input()
    bb = b.public_input()
    res = b.public_input()
    for _ in range(24):
        a, bb = bb, b.add(a, bb)
    b.connect(bb, res)
    circuit = b.build()
    pdata = circuit_prover_data(config, circuit)
    x, y = 0, 1
    for _ in range(24):
        x, y = y, (x + y) % F.P
    r = circuit.runner()
    r.set_public_inputs([0, 1, y])
    traces = r.run()
    prover = BatchStarkProver(config)
    proof = prover.prove_all_tables(circuit, traces, pdata, debug_lookups=True)
    assert prover.verify_all_tables(circuit, proof, pdata)
    # the mesh proof is bit-identical to the host proof (determinism)
    host_cfg = StarkConfig(F, E4, TwoAdicFriPcs(F, E4, FriParams.testing()))
    host_pdata = circuit_prover_data(host_cfg, circuit)
    host_proof = BatchStarkProver(host_cfg).prove_all_tables(
        circuit, traces, host_pdata
    )
    assert np.array_equal(proof.batch.trace_commit, host_proof.batch.trace_commit)
    assert np.array_equal(
        np.asarray(proof.batch.fri.final_coeffs),
        np.asarray(host_proof.batch.fri.final_coeffs),
    )


@needs_mesh
def test_mesh_hiding_batch_stark_prove(rng):
    """ZK (hiding) proving through the mesh-sharded PCS: salted Merkle
    commitments + the random masking round, rows sharded over the mesh
    (the round-3 `mesh + hiding` hole)."""
    from plonky3_recursion_tpu.circuit import CircuitBuilder
    from plonky3_recursion_tpu.fields import ext_field
    from plonky3_recursion_tpu.prover import (
        BatchStarkProver,
        circuit_prover_data,
    )
    from plonky3_recursion_tpu.stark.fri_pcs import FriParams, TwoAdicFriPcs
    from plonky3_recursion_tpu.stark.uni import StarkConfig

    E4 = ext_field(F, 4)
    mesh = make_mesh(8)
    config = StarkConfig(
        F,
        E4,
        TwoAdicFriPcs(
            F,
            E4,
            FriParams.testing(),
            mesh=mesh,
            hiding_salt_cols=2 * E4.D,
            salt_rng=np.random.default_rng(7),
        ),
    )
    b = CircuitBuilder(E4)
    a = b.public_input()
    bb = b.public_input()
    res = b.public_input()
    for _ in range(24):
        a, bb = bb, b.add(a, bb)
    b.connect(bb, res)
    circuit = b.build()
    pdata = circuit_prover_data(config, circuit)
    x, y = 0, 1
    for _ in range(24):
        x, y = y, (x + y) % F.P
    r = circuit.runner()
    r.set_public_inputs([0, 1, y])
    prover = BatchStarkProver(config)
    proof = prover.prove_all_tables(circuit, r.run(), pdata)
    assert proof.batch.random_commit is not None
    assert prover.verify_all_tables(circuit, proof, pdata)

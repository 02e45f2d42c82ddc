"""Arity-4 MMCS: native W32 4-to-1 trees and the in-circuit chained path
(reference `circuit/src/ops/mmcs.rs:242-348`,
`recursion/tests/recursive_arity4_mmcs.rs` analog)."""

import numpy as np
import pytest

from plonky3_recursion_tpu.circuit import CircuitBuilder
from plonky3_recursion_tpu.fields import KOALA_BEAR as F, ext_field
from plonky3_recursion_tpu.prover import BatchStarkProver, circuit_prover_data
from plonky3_recursion_tpu.prover.poseidon2_table import poseidon2_npo_for
from plonky3_recursion_tpu.recursion.mmcs_circuit import MmcsGadget4
from plonky3_recursion_tpu.stark.fri_pcs import FriParams
from plonky3_recursion_tpu.stark.merkle import MerkleMmcs4
from plonky3_recursion_tpu.stark.uni import koala_bear_config

E4 = ext_field(F, 4)


def test_native_arity4_roundtrip(rng):
    m = MerkleMmcs4(F)
    mat = F.rand(rng, (256, 7))
    root, tree = m.commit([mat])
    for idx in (0, 100, 255):
        opened, sibs = m.open_batch(idx, tree)
        assert len(sibs) == 4  # log4(256)
        assert m.verify_batch(root, [(256, 7)], idx, opened, sibs)
        bad = [o.copy() for o in opened]
        bad[0][3] ^= 1
        assert not m.verify_batch(root, [(256, 7)], idx, bad, sibs)
        # wrong index rejected
        assert not m.verify_batch(
            root, [(256, 7)], idx ^ 3, opened, sibs
        )


def test_native_arity4_mixed_heights(rng):
    """Mixed-height arity-4 batches (reference
    `recursive_arity4_mmcs_round_trip_mixed_heights_with_injection`):
    injection levels and step-2 bridges per `arity4_schedule`."""
    from plonky3_recursion_tpu.stark.merkle import arity4_schedule

    assert arity4_schedule([64, 16]) == [(4, 16), (4, 0), (4, 0)]
    assert arity4_schedule([32, 16]) == [(2, 16), (4, 0), (4, 0)]
    assert arity4_schedule([16, 8, 1]) == [(2, 8), (4, 0), (2, 1)]
    assert arity4_schedule([8]) == [(4, 0), (2, 0)]

    m = MerkleMmcs4(F)
    for dims in ([(64, 3), (16, 2)], [(32, 2), (16, 3)], [(16, 2), (8, 2), (1, 3)]):
        mats = [F.rand(rng, d) for d in dims]
        root, tree = m.commit(mats)
        max_h = max(h for h, _w in dims)
        for idx in (0, 5, max_h - 1):
            opened, sibs = m.open_batch(idx, tree)
            assert m.verify_batch(root, dims, idx, opened, sibs)
            bad = [o.copy() for o in opened]
            bad[-1][0] ^= 1  # tamper an injected (shorter) matrix row
            assert not m.verify_batch(root, dims, idx, bad, sibs)
            assert not m.verify_batch(root, dims, idx ^ 1, opened, sibs)


def test_arity4_circuit_mixed_heights(rng):
    """In-circuit mixed-height arity-4 path: a bridge row + an injection
    row + a step-4 row in one chain, S bound to the index bits."""
    from plonky3_recursion_tpu.stark.merkle import arity4_schedule

    config = koala_bear_config(FriParams.testing())
    m = MerkleMmcs4(F)
    dims = [(8, 3), (4, 2)]
    mats = [F.rand(rng, d) for d in dims]
    root, tree = m.commit(mats)
    schedule = arity4_schedule([8, 4])
    assert schedule == [(2, 4), (4, 0)]
    idx = 5
    opened, sibs = m.open_batch(idx, tree)
    assert m.verify_batch(root, dims, idx, opened, sibs)

    b = CircuitBuilder(E4)
    npo = poseidon2_npo_for(F.name, 32)
    b.enable_op(npo)
    gad = MmcsGadget4(b, npo.type_id)
    commit_t = [b.public_input() for _ in range(8)]
    bit_ts = [b.public_input() for _ in range(3)]  # 1 bridge + 2 step-4
    for t in bit_ts:
        b.assert_bool(t)
    row_ts = [[b.private_input() for _ in range(w)] for _h, w in dims]
    gad.verify_batch(commit_t, dims, bit_ts, row_ts, tag="a4m")
    circuit = b.build()
    pdata = circuit_prover_data(config, circuit)

    def run(index, rows, priv_sibs):
        r = circuit.runner()
        r.set_public_inputs(
            [int(x) for x in root]
            + [(index >> i) & 1 for i in range(3)]
        )
        r.set_private_inputs([int(v) for row in rows for v in row])
        # level 0: bridge consumes bit 0; level 1: step-4 consumes bits 1,2
        r.set_private_data(
            ("a4m", 0),
            {
                "bits": (index & 1, 0),
                "siblings": np.asarray(priv_sibs[0], dtype=np.uint32),
            },
        )
        pos = (index >> 1) & 3
        r.set_private_data(
            ("a4m", 1),
            {
                "bits": (pos & 1, (pos >> 1) & 1),
                "siblings": np.asarray(priv_sibs[1], dtype=np.uint32),
            },
        )
        return r.run()

    traces = run(idx, opened, sibs)
    prover = BatchStarkProver(config)
    proof = prover.prove_all_tables(
        circuit, traces, pdata, debug_lookups=True
    )
    assert prover.verify_all_tables(circuit, proof, pdata)

    from plonky3_recursion_tpu.circuit import WitnessConflict

    with pytest.raises((WitnessConflict, ValueError)):
        run(idx ^ 1, opened, sibs)  # wrong index bits -> S binding fails
    bad = [list(opened[0]), list(opened[1])]
    bad[1][0] = int(bad[1][0]) ^ 1  # tamper the injected matrix's row
    with pytest.raises((WitnessConflict, ValueError)):
        run(idx, bad, sibs)


def test_arity4_circuit_path(rng):
    """In-circuit arity-4 path: 2 levels (16 rows) = TWO chained W32 perm
    blocks after the leaf sponge, with the base-4 index accumulator bound
    to the public index bits; proven and verified as a batch proof."""
    config = koala_bear_config(FriParams.testing())
    m = MerkleMmcs4(F)
    mat = F.rand(rng, (16, 5))
    root, tree = m.commit([mat])
    idx = 11
    opened, sibs = m.open_batch(idx, tree)
    assert m.verify_batch(root, [(16, 5)], idx, opened, sibs)

    b = CircuitBuilder(E4)
    npo = poseidon2_npo_for(F.name, 32)
    b.enable_op(npo)
    gad = MmcsGadget4(b, npo.type_id)
    commit_t = [b.public_input() for _ in range(8)]
    bit_ts = [b.public_input() for _ in range(4)]
    for t in bit_ts:
        b.assert_bool(t)
    row_t = [b.private_input() for _ in range(5)]
    gad.verify_batch(commit_t, [(16, 5)], bit_ts, [row_t], tag="a4")
    circuit = b.build()
    pdata = circuit_prover_data(config, circuit)

    runner = circuit.runner()
    runner.set_public_inputs(
        [int(x) for x in root]
        + [(idx >> i) & 1 for i in range(4)]
    )
    runner.set_private_inputs([int(v) for v in opened[0]])
    for level in range(2):
        pos = (idx >> (2 * level)) & 3
        runner.set_private_data(
            ("a4", level),
            {
                "bits": (pos & 1, (pos >> 1) & 1),
                "siblings": np.asarray(sibs[level], dtype=np.uint32),
            },
        )
    traces = runner.run()
    prover = BatchStarkProver(config)
    proof = prover.prove_all_tables(circuit, traces, pdata, debug_lookups=True)
    assert prover.verify_all_tables(circuit, proof, pdata)

    # wrong index bits -> the in-table accumulator binding fails
    from plonky3_recursion_tpu.circuit import WitnessConflict

    r2 = circuit.runner()
    bad_idx = idx ^ 1
    r2.set_public_inputs(
        [int(x) for x in root]
        + [(bad_idx >> i) & 1 for i in range(4)]
    )
    r2.set_private_inputs([int(v) for v in opened[0]])
    for level in range(2):
        pos = (idx >> (2 * level)) & 3
        r2.set_private_data(
            ("a4", level),
            {
                "bits": (pos & 1, (pos >> 1) & 1),
                "siblings": np.asarray(sibs[level], dtype=np.uint32),
            },
        )
    with pytest.raises((WitnessConflict, ValueError)):
        r2.run()

    # tampered leaf -> root connect fails
    r3 = circuit.runner()
    r3.set_public_inputs(
        [int(x) for x in root]
        + [(idx >> i) & 1 for i in range(4)]
    )
    bad_leaf = [int(v) for v in opened[0]]
    bad_leaf[0] ^= 1
    r3.set_private_inputs(bad_leaf)
    for level in range(2):
        pos = (idx >> (2 * level)) & 3
        r3.set_private_data(
            ("a4", level),
            {
                "bits": (pos & 1, (pos >> 1) & 1),
                "siblings": np.asarray(sibs[level], dtype=np.uint32),
            },
        )
    with pytest.raises((WitnessConflict, ValueError)):
        r3.run()


def test_arity4_bridge_b2_attack_rejected(rng):
    """A malicious prover setting b2=1 on a BRIDGE level (placing the
    running digest in a CTL-zero-pinned chunk and shifting the index
    accumulator) must fail — either by witness/CTL conflict or the S
    binding."""
    from plonky3_recursion_tpu.stark.merkle import arity4_schedule

    config = koala_bear_config(FriParams.testing())
    m = MerkleMmcs4(F)
    dims = [(8, 3), (4, 2)]
    mats = [F.rand(rng, d) for d in dims]
    root, tree = m.commit(mats)
    assert arity4_schedule([8, 4]) == [(2, 4), (4, 0)]
    idx = 5
    opened, sibs = m.open_batch(idx, tree)

    b = CircuitBuilder(E4)
    npo = poseidon2_npo_for(F.name, 32)
    b.enable_op(npo)
    gad = MmcsGadget4(b, npo.type_id)
    commit_t = [b.public_input() for _ in range(8)]
    bit_ts = [b.public_input() for _ in range(3)]
    for t in bit_ts:
        b.assert_bool(t)
    row_ts = [[b.private_input() for _ in range(w)] for _h, w in dims]
    gad.verify_batch(commit_t, dims, bit_ts, row_ts, tag="a4atk")
    circuit = b.build()
    pdata = circuit_prover_data(config, circuit)

    r = circuit.runner()
    r.set_public_inputs(
        [int(x) for x in root] + [(idx >> i) & 1 for i in range(3)]
    )
    r.set_private_inputs([int(v) for row in opened for v in row])
    # bridge level 0 with b2=1 (attack); level 1 honest
    r.set_private_data(
        ("a4atk", 0),
        {
            "bits": (idx & 1, 1),
            "siblings": np.asarray(sibs[0], dtype=np.uint32),
        },
    )
    pos = (idx >> 1) & 3
    r.set_private_data(
        ("a4atk", 1),
        {
            "bits": (pos & 1, (pos >> 1) & 1),
            "siblings": np.asarray(sibs[1], dtype=np.uint32),
        },
    )
    from plonky3_recursion_tpu.circuit import WitnessConflict

    failed = False
    try:
        traces = r.run()
        prover = BatchStarkProver(config)
        proof = prover.prove_all_tables(
            circuit, traces, pdata, debug_lookups=True
        )
        prover.verify_all_tables(circuit, proof, pdata)
    except (WitnessConflict, ValueError, AssertionError):
        failed = True
    assert failed, "b2=1 on a bridge level must not verify"

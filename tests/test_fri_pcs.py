"""FRI PCS integration tests (SURVEY.md §4: `recursion/tests/fri.rs` analog —
native commit/open/verify round-trips, tamper rejection)."""

import dataclasses

import numpy as np
import pytest

from plonky3_recursion_tpu.fields import BABY_BEAR, KOALA_BEAR, ext_field
from plonky3_recursion_tpu.stark.challenger import DuplexChallenger
from plonky3_recursion_tpu.stark.fri_pcs import FriParams, TwoAdicFriPcs

F = KOALA_BEAR
E4 = ext_field(KOALA_BEAR, 4)


def make_pcs(F, D=4, params=None):
    E = ext_field(F, D)
    return TwoAdicFriPcs(F, E, params or FriParams.testing()), E


def random_round(pcs, F, E, rng, shapes, n_points=1):
    mats = [(1, F.rand(rng, s)) for s in shapes]
    data = pcs.commit(mats)
    points = [
        [E.rand(rng, ()) for _ in range(n_points)] for _ in shapes
    ]
    return data, points


@pytest.mark.parametrize("F", [KOALA_BEAR, BABY_BEAR], ids=lambda f: f.name)
def test_single_matrix_roundtrip(F, rng):
    pcs, E = make_pcs(F)
    data, points = random_round(pcs, F, E, rng, [(16, 3)])
    ch = DuplexChallenger(F)
    opened, proof = pcs.open([(data, points)], ch)
    vch = DuplexChallenger(F)
    rounds_v = [
        (
            data.commitment,
            [
                (
                    m.log_n,
                    [(z, y) for z, y in zip(pts, vals)],
                )
                for m, pts, vals in zip(data.matrices, points, opened[0])
            ],
        )
    ]
    assert pcs.verify(rounds_v, proof, vch)


def test_mixed_heights_multi_round(rng):
    F = KOALA_BEAR
    pcs, E = make_pcs(F)
    d1, p1 = random_round(pcs, F, E, rng, [(32, 4), (8, 2)], n_points=2)
    d2, p2 = random_round(pcs, F, E, rng, [(16, 3)])
    ch = DuplexChallenger(F)
    opened, proof = pcs.open([(d1, p1), (d2, p2)], ch)

    def rounds_v():
        out = []
        for data, points, ov in [(d1, p1, opened[0]), (d2, p2, opened[1])]:
            out.append(
                (
                    data.commitment,
                    [
                        (m.log_n, list(zip(pts, vals)))
                        for m, pts, vals in zip(data.matrices, points, ov)
                    ],
                )
            )
        return out

    assert pcs.verify(rounds_v(), proof, DuplexChallenger(F))

    # tamper: claimed opened value
    rv = rounds_v()
    z, y = rv[0][1][0][1][0]
    y2 = y.copy()
    y2[0, 0] ^= 1
    rv[0][1][0][1][0] = (z, y2)
    with pytest.raises(ValueError):
        pcs.verify(rv, proof, DuplexChallenger(F))

    # tamper: final poly
    bad = dataclasses.replace(proof, final_coeffs=proof.final_coeffs ^ 1)
    with pytest.raises(ValueError):
        pcs.verify(rounds_v(), bad, DuplexChallenger(F))

    # tamper: commit digest
    bad_digests = [d.copy() for d in proof.commit_digests]
    bad_digests[0] = bad_digests[0] ^ 1
    bad = dataclasses.replace(proof, commit_digests=bad_digests)
    with pytest.raises(ValueError):
        pcs.verify(rounds_v(), bad, DuplexChallenger(F))

    # tamper: an input opening row
    import copy

    bad = copy.deepcopy(proof)
    bad.query_proofs[0].input_openings[0][0][0][0] ^= 1
    with pytest.raises(ValueError):
        pcs.verify(rounds_v(), bad, DuplexChallenger(F))


def test_pow_and_multiple_queries(rng):
    F = KOALA_BEAR
    params = FriParams(
        log_blowup=1,
        log_final_poly_len=1,
        num_queries=13,
        commit_pow_bits=2,
        query_pow_bits=4,
    )
    pcs, E = make_pcs(F, params=params)
    data, points = random_round(pcs, F, E, rng, [(64, 2)])
    ch = DuplexChallenger(F)
    opened, proof = pcs.open([(data, points)], ch)
    assert len(proof.commit_pow_witnesses) == len(proof.commit_digests)
    rv = [
        (
            data.commitment,
            [
                (m.log_n, list(zip(pts, vals)))
                for m, pts, vals in zip(data.matrices, points, opened[0])
            ],
        )
    ]
    assert pcs.verify(rv, proof, DuplexChallenger(F))
    # wrong pow witness rejected
    bad = dataclasses.replace(proof, pow_witness=proof.pow_witness + 1)
    with pytest.raises(ValueError):
        pcs.verify(rv, bad, DuplexChallenger(F))


def test_eval_at_point_matches_interpolation(rng):
    F = KOALA_BEAR
    pcs, E = make_pcs(F)
    evals = F.rand(rng, (8, 2))
    data = pcs.commit([(1, evals)])
    z = E.rand(rng, ())
    got = pcs.eval_at_point(data.matrices[0], z)
    # ground truth: Horner over interpolated coefficients with python ints
    from plonky3_recursion_tpu.ops.ntt import intt

    coeffs = intt(F, evals, np)
    for c in range(2):
        acc = E.zeros((), np)
        for i in range(7, -1, -1):
            acc = E.mul(acc, z, np)
            acc = E.add(acc, E.from_base(np.uint32(int(coeffs[i, c])), np), np)
        assert np.array_equal(got[c], acc)


def test_nonstandard_shift_commit(rng):
    """Quotient chunks commit with coset shifts != 1 — opening must still
    reproduce the interpolant."""
    F = KOALA_BEAR
    pcs, E = make_pcs(F)
    # build evals of a known poly on a shifted coset
    from plonky3_recursion_tpu.stark.domains import domain_points

    coeffs = [3, 5, 7, 11, 13, 17, 19, 23]
    shift = int(F.generator)
    pts = domain_points(F, 3, shift)
    evals = np.asarray(
        [[sum(c * pow(int(x), i, F.P) for i, c in enumerate(coeffs)) % F.P] for x in pts],
        dtype=np.uint32,
    )
    data = pcs.commit([(shift, evals)])
    z = E.rand(rng, ())
    got = pcs.eval_at_point(data.matrices[0], z)[0]
    acc = E.zeros((), np)
    for c in reversed(coeffs):
        acc = E.mul(acc, z, np)
        acc = E.add(acc, E.from_base(np.uint32(c), np), np)
    assert np.array_equal(got, acc)
    # and the full open/verify round-trip passes
    ch = DuplexChallenger(F)
    opened, proof = pcs.open([(data, [[z]])], ch)
    rv = [(data.commitment, [(3, [(z, opened[0][0][0])])])]
    assert pcs.verify(rv, proof, DuplexChallenger(F))


def test_overlong_final_poly_rejected(rng):
    """ADVICE r1 high #1: a final polynomial longer than
    2^log_final_poly_len can interpolate anything on the final fold
    domain — must be rejected before any transcript interaction
    (reference recursion/src/pcs/fri/verifier.rs:1511-1517)."""
    F = KOALA_BEAR
    params = FriParams(log_blowup=1, log_final_poly_len=1, num_queries=4)
    pcs, E = make_pcs(F, params=params)
    data, points = random_round(pcs, F, E, rng, [(16, 2)])
    ch = DuplexChallenger(F)
    opened, proof = pcs.open([(data, points)], ch)
    rv = [
        (
            data.commitment,
            [
                (m.log_n, list(zip(pts, vals)))
                for m, pts, vals in zip(data.matrices, points, opened[0])
            ],
        )
    ]
    assert pcs.verify(rv, proof, DuplexChallenger(F))
    # pad the final poly with an extra coefficient row
    fc = np.asarray(proof.final_coeffs)
    bad_fc = np.concatenate([fc, fc[:1]], axis=0)
    bad = dataclasses.replace(proof, final_coeffs=bad_fc)
    with pytest.raises(ValueError, match="final poly"):
        pcs.verify(rv, bad, DuplexChallenger(F))
    # non-canonical coefficient also rejected
    bad_fc2 = fc.copy()
    bad_fc2[0, 0] = F.P
    bad2 = dataclasses.replace(proof, final_coeffs=bad_fc2)
    with pytest.raises(ValueError, match="field range"):
        pcs.verify(rv, bad2, DuplexChallenger(F))


def test_matrix_below_final_fold_height_rejected(rng):
    """ADVICE r1 high #2: openings of a matrix whose LDE height is below
    the final fold height are never consumed by the fold chain — the
    verifier must reject such proof shapes outright (reference
    zero-constrains them, verifier.rs:1641-1645)."""
    F = KOALA_BEAR
    params = FriParams(log_blowup=1, log_final_poly_len=3, num_queries=4)
    pcs, E = make_pcs(F, params=params)
    # heights: 2^6 LDE (ok) + 2^3 LDE (below final fold height 2^4)
    mats = [(1, F.rand(rng, (32, 2))), (1, F.rand(rng, (4, 2)))]
    # prover-side guard fires
    data = pcs.commit(mats)
    points = [[E.rand(rng, ())] for _ in mats]
    with pytest.raises(AssertionError, match="final fold height"):
        pcs.open([(data, points)], DuplexChallenger(F))
    # verifier-side guard fires on a crafted proof shape, regardless of
    # what the prover produced
    big = pcs.commit([mats[0]])
    opened, proof = pcs.open([(big, [points[0]])], DuplexChallenger(F))
    z = points[1][0]
    forged_claim = E.rand(rng, (2,))  # arbitrary (w=2, D) claimed opening
    rv = [
        (big.commitment, [(5, list(zip([points[0][0]], opened[0][0])))]),
        (data.commitment, [(2, [(z, forged_claim)])]),
    ]
    with pytest.raises(ValueError, match="below FRI minimum"):
        pcs.verify(rv, proof, DuplexChallenger(F))


@pytest.mark.slow  # compile-heavy parity (fast-lane budget)
def test_jit_open_bit_identical_to_host():
    """The fused device open path (one call per stage) produces the SAME
    proof bytes as the host path."""
    from plonky3_recursion_tpu.circuit import CircuitBuilder
    from plonky3_recursion_tpu.prover import (
        BatchStarkProver,
        circuit_prover_data,
    )
    from plonky3_recursion_tpu.stark.uni import koala_bear_config
    from plonky3_recursion_tpu.utils.serde import batch_proof_to_bytes

    def run(use_jit, commit_pow):
        # commit_pow=0 exercises the fused device-transcript phase chain;
        # commit_pow>0 forces the per-phase host-sequenced path
        params = FriParams(
            log_blowup=2,
            log_final_poly_len=1,
            num_queries=5,
            commit_pow_bits=commit_pow,
            query_pow_bits=2,
            max_log_arity=2,
        )
        config = koala_bear_config(params, use_jit=use_jit)
        b = CircuitBuilder(E4)
        a = b.public_input()
        bb = b.public_input()
        res = b.public_input()
        for _ in range(48):
            a, bb = bb, b.add(a, bb)
        b.connect(bb, res)
        circuit = b.build()
        pdata = circuit_prover_data(config, circuit)
        x, y = 0, 1
        for _ in range(48):
            x, y = y, (x + y) % F.P
        r = circuit.runner()
        r.set_public_inputs([0, 1, y])
        prover = BatchStarkProver(config)
        proof = prover.prove_all_tables(circuit, r.run(), pdata)
        assert prover.verify_all_tables(circuit, proof, pdata)
        return batch_proof_to_bytes(proof.batch)

    assert run(False, 1) == run(True, 1)
    assert run(False, 0) == run(True, 0)


@pytest.mark.slow
def test_device_poseidon_proof_bit_identical(rng):
    """A proof of a Poseidon2-table circuit through the device path
    (device table build, fused perm columns, fused open, device transcript
    chain, device grind) is byte-identical to the host path."""
    from tests.test_poseidon2_npo import perm_circuit
    from plonky3_recursion_tpu.prover import (
        BatchStarkProver,
        circuit_prover_data,
    )
    from plonky3_recursion_tpu.stark.uni import koala_bear_config
    from plonky3_recursion_tpu.utils.serde import batch_proof_to_bytes

    state = KOALA_BEAR.rand(rng, (16,))

    def run(use_jit):
        config = koala_bear_config(FriParams.testing(), use_jit=use_jit)
        circuit = perm_circuit(2)
        pdata = circuit_prover_data(config, circuit)
        r = circuit.runner()
        r.set_public_inputs(
            [tuple(state[4 * j : 4 * j + 4]) for j in range(4)]
        )
        prover = BatchStarkProver(config)
        proof = prover.prove_all_tables(circuit, r.run(), pdata)
        assert prover.verify_all_tables(circuit, proof, pdata)
        return batch_proof_to_bytes(proof.batch)

    assert run(False) == run(True)

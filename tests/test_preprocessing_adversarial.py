"""Adversarial preprocessing / proof-shape tests for the batch verifier
(reference `recursion/tests/preprocessing.rs`: tampered common data,
short/long lookup vectors, extra permutation coefficients, wrong
publics — ~20 tests over a mixed-preprocessed batch)."""

import dataclasses

import numpy as np
import pytest

from plonky3_recursion_tpu.stark.batch import (
    commit_preprocessed,
    prove_batch,
    verify_batch,
)
from plonky3_recursion_tpu.stark.uni import koala_bear_config

from test_batch_stark import airs_lookups, make_instances


@pytest.fixture(scope="module")
def proven():
    """One mixed batch (sender / receiver-with-prep / fib) proof."""
    config = koala_bear_config()
    instances = make_instances(config.field)
    common = commit_preprocessed(config, instances)
    proof = prove_batch(config, instances, common, debug_lookups=True)
    assert verify_batch(config, airs_lookups(), proof, common)
    return config, instances, common, proof


def _reverify(config, proof, common):
    return verify_batch(config, airs_lookups(), proof, common)


def test_accepts_untampered_common(proven):
    config, _insts, common, proof = proven
    assert _reverify(config, proof, common)


def test_rejects_tampered_prep_commitment(proven):
    config, _insts, common, proof = proven
    bad = dataclasses.replace(proof)
    pc = np.asarray(bad.prep_commitment).copy()
    pc[0] ^= 1
    bad.prep_commitment = pc
    with pytest.raises(ValueError, match="preprocessed commitment"):
        _reverify(config, bad, common)


def test_rejects_tampered_common_side(proven):
    config, _insts, common, proof = proven
    bad_common = dataclasses.replace(common)
    pc = np.asarray(bad_common.prep_commitment).copy()
    pc[3] ^= 1
    bad_common.prep_commitment = pc
    with pytest.raises(ValueError, match="preprocessed commitment"):
        _reverify(config, proof, bad_common)


def test_rejects_missing_prep_commitment(proven):
    config, _insts, common, proof = proven
    bad = dataclasses.replace(proof, prep_commitment=None)
    with pytest.raises(ValueError, match="preprocessed commitment"):
        _reverify(config, bad, common)


def test_rejects_short_lookup_terminals(proven):
    """reference `test_batch_verifier_rejects_short_lookup_vector`."""
    config, _insts, common, proof = proven
    bad = dataclasses.replace(
        proof, lookup_terminals=proof.lookup_terminals[:-1]
    )
    with pytest.raises(ValueError, match="terminal layout"):
        _reverify(config, bad, common)


def test_rejects_long_lookup_terminals(proven):
    """reference `test_batch_verifier_rejects_long_lookup_vector`."""
    config, _insts, common, proof = proven
    extra = proof.lookup_terminals + [proof.lookup_terminals[-1]]
    bad = dataclasses.replace(proof, lookup_terminals=extra)
    with pytest.raises(ValueError, match="terminal layout"):
        _reverify(config, bad, common)


def test_rejects_misattributed_terminal(proven):
    """A terminal claimed for the wrong instance index."""
    config, _insts, common, proof = proven
    i, t = proof.lookup_terminals[0]
    bad = dataclasses.replace(
        proof,
        lookup_terminals=[(i + 2, t)] + proof.lookup_terminals[1:],
    )
    with pytest.raises(ValueError, match="terminal layout"):
        _reverify(config, bad, common)


def test_rejects_extra_perm_coefficients(proven):
    """reference `test_batch_verifier_rejects_extra_local_permutation_
    coefficients` — perm openings padded with an extra coefficient row."""
    config, _insts, common, proof = proven
    i, loc, nxt = proof.perm_openings[0]
    loc2 = np.concatenate([np.asarray(loc), np.asarray(loc)[:1]], axis=0)
    bad = dataclasses.replace(
        proof, perm_openings=[(i, loc2, nxt)] + proof.perm_openings[1:]
    )
    with pytest.raises((ValueError, AssertionError)):
        _reverify(config, bad, common)


def test_rejects_extra_next_perm_coefficients(proven):
    config, _insts, common, proof = proven
    i, loc, nxt = proof.perm_openings[0]
    nxt2 = np.concatenate([np.asarray(nxt), np.asarray(nxt)[:1]], axis=0)
    bad = dataclasses.replace(
        proof, perm_openings=[(i, loc, nxt2)] + proof.perm_openings[1:]
    )
    with pytest.raises((ValueError, AssertionError)):
        _reverify(config, bad, common)


def test_rejects_tampered_prep_opening(proven):
    """Tampered preprocessed opening row: the claimed values no longer
    match the offline commitment through FRI."""
    config, _insts, common, proof = proven
    i, loc, nxt = proof.prep_openings[0]
    loc2 = np.asarray(loc).copy()
    loc2[0, 0] ^= 1
    bad = dataclasses.replace(
        proof, prep_openings=[(i, loc2, nxt)] + proof.prep_openings[1:]
    )
    with pytest.raises(ValueError):
        _reverify(config, bad, common)


def test_rejects_swapped_prep_instances(proven):
    """Preprocessed openings attributed to the wrong instance."""
    config, _insts, common, proof = proven
    if len(proof.prep_openings) < 1:
        pytest.skip("needs a preprocessed instance")
    i, loc, nxt = proof.prep_openings[0]
    bad = dataclasses.replace(
        proof, prep_openings=[(i + 1, loc, nxt)] + proof.prep_openings[1:]
    )
    with pytest.raises((ValueError, KeyError, IndexError)):
        _reverify(config, bad, common)


def test_rejects_tampered_publics(proven):
    """reference `test_batch_verifier_wrong_public_values`."""
    config, _insts, common, proof = proven
    pubs = [list(p) for p in proof.publics]
    pubs[2][0] = (pubs[2][0] + 1) % config.field.P
    bad = dataclasses.replace(proof, publics=pubs)
    with pytest.raises(ValueError):
        _reverify(config, bad, common)


def test_rejects_tampered_shape_metadata(proven):
    """Instance shape metadata is transcript-bound: a lied log_n fails."""
    config, _insts, common, proof = proven
    shapes = list(proof.shapes)
    s0 = dataclasses.replace(shapes[2], log_n=shapes[2].log_n + 1)
    bad = dataclasses.replace(proof, shapes=[shapes[0], shapes[1], s0])
    with pytest.raises((ValueError, AssertionError, IndexError)):
        _reverify(config, bad, common)

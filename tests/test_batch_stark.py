"""Batch-stark + LogUp integration tests (SURVEY.md §4: multi-instance batch
proofs, lookup bus balance, adversarial lookup tests)."""

import numpy as np
import pytest

from plonky3_recursion_tpu.stark.batch import (
    StarkInstance,
    commit_preprocessed,
    prove_batch,
    verify_batch,
)
from plonky3_recursion_tpu.stark.fri_pcs import FriParams
from plonky3_recursion_tpu.stark.lookups import Interaction, Lookup
from plonky3_recursion_tpu.stark.symbolic import Air, Var
from plonky3_recursion_tpu.stark.uni import koala_bear_config


class SenderAir(Air):
    """Rows (idx, val): sends (idx, val) on the bus with mult +1."""

    width_main = 2
    num_publics = 0

    def eval(self, b):
        pass  # no native constraints; bus only


class ReceiverAir(Air):
    """Rows (idx, val) with preprocessed mult col; receives tuples."""

    width_main = 2
    width_prep = 1
    num_publics = 0

    def eval(self, b):
        pass


class FibAir(Air):
    width_main = 2
    num_publics = 3

    def eval(self, b):
        a, bb = b.main_local
        an, bn = b.main_next
        p0, p1, pf = b.public_values
        b.when_first_row().assert_eq(a, p0)
        b.when_first_row().assert_eq(bb, p1)
        b.when_transition().assert_eq(an, bb)
        b.when_transition().assert_eq(bn, a + bb)
        b.when_last_row().assert_eq(bb, pf)


def send_lookup(mult=1):
    return Lookup(
        "WitnessChecks",
        [Interaction([Var("main", 0, 0), Var("main", 1, 0)], mult)],
    )


def recv_lookup_prep_mult():
    # receive with multiplicity -prep[0]
    return Lookup(
        "WitnessChecks",
        [
            Interaction(
                [Var("main", 0, 0), Var("main", 1, 0)],
                0 - Var("preprocessed", 0, 0),
            )
        ],
    )


def make_instances(F, tamper=False):
    n = 8
    idx = np.arange(n, dtype=np.uint32)
    val = (idx * 7 + 3) % F.P
    sender = np.stack([idx, val], axis=1)
    perm = np.random.default_rng(5).permutation(n)
    receiver = sender[perm].copy()
    if tamper:
        receiver[3, 1] ^= 1
    prep = np.ones((n, 1), dtype=np.uint32)
    fib = np.zeros((16, 2), dtype=np.uint32)
    a, bb = 0, 1
    for i in range(16):
        fib[i] = (a, bb)
        a, bb = bb, (a + bb) % F.P
    return [
        StarkInstance(SenderAir(), sender, [], lookups=[send_lookup()]),
        StarkInstance(
            ReceiverAir(),
            receiver,
            [],
            preprocessed=prep,
            lookups=[recv_lookup_prep_mult()],
        ),
        StarkInstance(FibAir(), fib, [0, 1, int(fib[-1, 1])]),
    ]


def airs_lookups():
    return [
        (SenderAir(), [send_lookup()]),
        (ReceiverAir(), [recv_lookup_prep_mult()]),
        (FibAir(), []),
    ]


def test_batch_roundtrip_with_lookups():
    config = koala_bear_config()
    instances = make_instances(config.field)
    common = commit_preprocessed(config, instances)
    proof = prove_batch(config, instances, common, debug_lookups=True)
    assert verify_batch(config, airs_lookups(), proof, common)


def test_unbalanced_bus_rejected():
    config = koala_bear_config()
    instances = make_instances(config.field, tamper=True)
    common = commit_preprocessed(config, instances)
    with pytest.raises(ValueError, match="imbalance"):
        prove_batch(config, instances, common, debug_lookups=True)
    # without the debug check the proof is produced but the verifier's
    # balance check rejects it
    proof = prove_batch(config, instances, common)
    with pytest.raises(ValueError, match="imbalance"):
        verify_batch(config, airs_lookups(), proof, common)


def test_tampered_terminal_rejected():
    config = koala_bear_config()
    instances = make_instances(config.field)
    common = commit_preprocessed(config, instances)
    proof = prove_batch(config, instances, common)
    i, t = proof.lookup_terminals[0]
    proof.lookup_terminals[0] = (i, t ^ 1)
    with pytest.raises(ValueError):
        verify_batch(config, airs_lookups(), proof, common)


def test_tampered_fib_public_rejected():
    config = koala_bear_config()
    instances = make_instances(config.field)
    common = commit_preprocessed(config, instances)
    proof = prove_batch(config, instances, common)
    proof.publics[2][2] = (proof.publics[2][2] + 1) % config.field.P
    with pytest.raises(ValueError, match="quotient/constraint"):
        verify_batch(config, airs_lookups(), proof, common)


def test_batch_jnp_matches_np():
    import jax.numpy as jnp

    config = koala_bear_config(FriParams.testing())
    instances = make_instances(config.field)
    common = commit_preprocessed(config, instances)
    p1 = prove_batch(config, instances, common)
    common2 = commit_preprocessed(config, instances)
    p2 = prove_batch(config, instances, common2, xp=jnp)
    assert np.array_equal(p1.trace_commit, p2.trace_commit)
    assert np.array_equal(p1.perm_commit, p2.perm_commit)
    assert np.array_equal(p1.quotient_commit, p2.quotient_commit)
    assert np.array_equal(
        np.asarray(p1.fri.final_coeffs), np.asarray(p2.fri.final_coeffs)
    )


# ----- lookup kinds: local lookups + per-lookup terminals (reference
# p3-lookup `Kind::{Global(name), Local}`, SURVEY.md §2.6) -----


class PermPairAir(Air):
    """Rows (a, b) where column b is a permutation of column a — proven by
    a LOCAL lookup (send a / receive b on the same in-table bus)."""

    width_main = 2
    num_publics = 0

    def eval(self, b):
        pass


def local_perm_lookup():
    return Lookup(
        "LocalPerm",
        [
            Interaction([Var("main", 0, 0)], 1),
            Interaction([Var("main", 1, 0)], -1),
        ],
        kind="local",
    )


def make_local_instance(F, tamper=False):
    n = 8
    a = ((np.arange(n, dtype=np.uint32) * 11 + 5) % F.P).astype(np.uint32)
    bcol = a[np.random.default_rng(7).permutation(n)].copy()
    if tamper:
        bcol[2] ^= 1
    return StarkInstance(
        PermPairAir(),
        np.stack([a, bcol], axis=1),
        [],
        lookups=[local_perm_lookup()],
    )


def test_local_lookup_roundtrip():
    config = koala_bear_config()
    instances = make_instances(config.field) + [
        make_local_instance(config.field)
    ]
    als = airs_lookups() + [(PermPairAir(), [local_perm_lookup()])]
    common = commit_preprocessed(config, instances)
    proof = prove_batch(config, instances, common, debug_lookups=True)
    # local lookups carry NO terminal in the proof
    assert [i for i, _t in proof.lookup_terminals] == [0, 1]
    assert verify_batch(config, als, proof, common)


def test_local_lookup_imbalance_rejected():
    config = koala_bear_config()
    instances = make_instances(config.field) + [
        make_local_instance(config.field, tamper=True)
    ]
    als = airs_lookups() + [(PermPairAir(), [local_perm_lookup()])]
    common = commit_preprocessed(config, instances)
    # the local accumulator's last row is nonzero -> constraint fails
    proof = prove_batch(config, instances, common)
    with pytest.raises(ValueError, match="quotient/constraint"):
        verify_batch(config, als, proof, common)


def second_bus_send():
    return Lookup(
        "PairBus", [Interaction([Var("main", 0, 0)], 1)]
    )


def second_bus_recv():
    return Lookup(
        "PairBus", [Interaction([Var("main", 0, 0)], -1)]
    )


def test_per_lookup_terminals_two_buses():
    """A table with TWO global lookups gets two accumulators and two
    terminals; balance holds per bus name."""
    config = koala_bear_config()
    F = config.field
    instances = make_instances(F)
    # sender also sends col 0 on a second bus; fib receives it back
    n = 8
    idx = np.arange(n, dtype=np.uint32)
    echo = np.stack([idx, idx], axis=1)
    instances[0].lookups = [send_lookup(), second_bus_send()]
    instances.append(
        StarkInstance(PermPairAir(), echo, [], lookups=[second_bus_recv()])
    )
    als = airs_lookups() + [(PermPairAir(), [second_bus_recv()])]
    als[0] = (SenderAir(), [send_lookup(), second_bus_send()])
    common = commit_preprocessed(config, instances)
    proof = prove_batch(config, instances, common, debug_lookups=True)
    # flattened per-global-lookup terminals: inst 0 twice, inst 1, inst 3
    assert [i for i, _t in proof.lookup_terminals] == [0, 0, 1, 3]
    assert verify_batch(config, als, proof, common)
    # tamper ONE bus's terminal: per-name balance must reject it even if
    # the tampering would cancel under a single summed check
    t0 = proof.lookup_terminals[1][1].copy()
    t3 = proof.lookup_terminals[3][1].copy()
    proof.lookup_terminals[1] = (0, (t0 + 1) % F.P)
    proof.lookup_terminals[3] = (3, (t3 - 1) % F.P)
    with pytest.raises(ValueError):
        verify_batch(config, als, proof, common)


def test_three_interaction_lookup_odd_pair_batch():
    """Three interactions in one lookup: two pair-batched + one singleton
    aux column (odd batch tail), balanced across two tables."""
    config = koala_bear_config()
    F = config.field
    n = 8
    idx = np.arange(n, dtype=np.uint32)
    v1 = (idx * 3 + 1) % F.P
    v2 = (idx * 5 + 2) % F.P
    v3 = (idx * 7 + 4) % F.P
    sender = np.stack([v1, v2, v3], axis=1)
    receiver = sender[::-1].copy()

    class TripleAir(Air):
        width_main = 3
        num_publics = 0

        def eval(self, b):
            pass

    def triple_lookup(mult):
        return Lookup(
            "WitnessChecks",
            [
                Interaction([Var("main", c, 0)], mult)
                for c in range(3)
            ],
        )

    instances = [
        StarkInstance(TripleAir(), sender, [], lookups=[triple_lookup(1)]),
        StarkInstance(TripleAir(), receiver, [], lookups=[triple_lookup(-1)]),
    ]
    als = [
        (TripleAir(), [triple_lookup(1)]),
        (TripleAir(), [triple_lookup(-1)]),
    ]
    common = commit_preprocessed(config, instances)
    proof = prove_batch(config, instances, common, debug_lookups=True)
    # 3 interactions -> 2 aux cols + 1 acc = 3 perm cols
    assert proof.shapes[0].num_perm_cols == 3
    assert verify_batch(config, als, proof, common)
    # imbalance on the singleton-batched third interaction is caught
    bad_recv = receiver.copy()
    bad_recv[0, 2] ^= 1
    instances[1] = StarkInstance(
        TripleAir(), bad_recv, [], lookups=[triple_lookup(-1)]
    )
    common2 = commit_preprocessed(config, instances)
    proof2 = prove_batch(config, instances, common2)
    with pytest.raises(ValueError, match="imbalance"):
        verify_batch(config, als, proof2, common2)

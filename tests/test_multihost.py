"""Distributed aggregation tree: leaves proven in share-nothing worker
processes, shipped as serde bytes, folded 2-to-1 by the coordinator
(reference `book/src/advanced_topics/scaling.md:7-13`; the reference is
single-host — this is the multi-host layer it specifies but doesn't have).
"""

import numpy as np
import pytest

from plonky3_recursion_tpu.parallel.multihost import (
    aggregate_tree,
    fib_leaf_proof_bytes,
    fib_leaf_recursion_input,
    prove_leaves,
)
from plonky3_recursion_tpu.prover import BatchStarkProver
from plonky3_recursion_tpu.recursion.aggregation import AggregationPrepCache
from plonky3_recursion_tpu.stark.fri_pcs import FriParams
from plonky3_recursion_tpu.stark.uni import koala_bear_config


def test_serde_batch_stark_proof_roundtrip():
    from plonky3_recursion_tpu.utils.serde import (
        batch_stark_proof_from_bytes,
        batch_stark_proof_to_bytes,
    )

    config = koala_bear_config(FriParams.testing())
    raw = fib_leaf_proof_bytes(8)
    proof = batch_stark_proof_from_bytes(raw, config)
    assert batch_stark_proof_to_bytes(proof) == raw
    assert np.asarray(proof.public_values).ndim == 2
    # tampered bytes fail validation or digest checks downstream
    bad = bytearray(raw)
    bad[-1] ^= 1
    with pytest.raises(Exception):
        p = batch_stark_proof_from_bytes(bytes(bad), config)
        inp = fib_leaf_recursion_input(
            config, 8, batch_stark_proof_to_bytes(p)
        )
        BatchStarkProver(config).verify_all_tables(
            inp.circuit, p, inp.prover_data
        )


@pytest.mark.slow
def test_distributed_aggregation_tree():
    """4 leaves proven by 2 worker processes -> coordinator folds 4->2->1.

    Workers are full independent JAX runtimes (spawn); only proof bytes
    cross the process boundary.  The level-1 pairs share a fingerprint so
    the prep cache is hit once, and the root verifies natively."""
    config = koala_bear_config(FriParams.testing())
    tasks = [(8,), (8,), (8,), (8,)]
    blobs = prove_leaves(
        fib_leaf_proof_bytes,
        tasks,
        num_workers=2,
        env={"JAX_PLATFORMS": "cpu"},
    )
    assert len(blobs) == 4 and all(isinstance(b, bytes) for b in blobs)
    leaves = [fib_leaf_recursion_input(config, 8, b) for b in blobs]
    prover = BatchStarkProver(config)
    for leaf in leaves:
        assert prover.verify_all_tables(
            leaf.circuit, leaf.proof, leaf.prover_data
        )
    cache = AggregationPrepCache()
    root = aggregate_tree(config, leaves, cache=cache)
    assert cache.hits >= 1  # the second level-1 pair reuses the prep
    assert prover.verify_all_tables(
        root.circuit, root.proof, root.prover_data
    )


@pytest.mark.slow
def test_aggregate_tree_odd_carry():
    """3 leaves: the odd one is carried up and folded at the next level
    (local, no worker pool — exercises the tree shape logic)."""
    config = koala_bear_config(FriParams.testing())
    blobs = [fib_leaf_proof_bytes(8) for _ in range(3)]
    leaves = [fib_leaf_recursion_input(config, 8, b) for b in blobs]
    root = aggregate_tree(config, leaves)
    assert BatchStarkProver(config).verify_all_tables(
        root.circuit, root.proof, root.prover_data
    )

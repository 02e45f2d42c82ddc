"""Proof-level multi-host distribution: share-nothing workers + proof bytes.

TPU-native realization of the reference's scaling story
(`book/src/advanced_topics/scaling.md:7-13`): aggregation-tree leaves are
independent proofs ("naturally parallelizable"), so the right multi-host
decomposition is NOT sharding one proof's tensors over DCN — it is one
share-nothing JAX runtime per host, each proving whole leaves on its own
chips, with serialized proofs as the only inter-host traffic (a proof is
O(100 KB); a single LDE is O(100 MB)).  The reference stops at single-host
rayon (`p3-maybe-rayon`); this module is the layer it doesn't have.

Topology:

  * N workers, one per host (or per process for CPU testing), each a
    fresh Python process with its own JAX runtime and device set.
    Workers never talk to each other — no jax.distributed, no DCN
    collectives — so host failures are contained: a lost leaf is
    re-proven idempotently (proof boundaries are the checkpoint/resume
    points, SURVEY.md §5).
  * Proofs travel as `utils.serde` bytes (`batch_stark_proof_to_bytes`),
    the exact serde-everything discipline of the reference
    (`batch_stark_prover.rs:610-670`).
  * The coordinator validates each leaf, then folds the tree 2-to-1 with
    fingerprint-keyed `AggregationPrepCache` reuse — every level past the
    first hits the cache, so coordinator work per node is one runner.run
    + one batch prove, same as `build_and_prove_aggregation_layer`
    (`recursion.rs:899`).

Within one host, leaf proving still uses the whole local mesh (pass
`mesh=` through the worker's StarkConfig); across hosts this module
distributes tree NODES, matching the reference's "distribute tree nodes
across machines" guidance verbatim.
"""

from __future__ import annotations

import os
from concurrent.futures import ProcessPoolExecutor

import numpy as np


def _init_worker(env: dict | None):
    """Runs in the child before any task: pin the JAX platform/flags
    BEFORE the first `import jax` (spawn children import lazily)."""
    if env:
        os.environ.update(env)


def prove_leaves(
    worker_fn,
    tasks: list,
    num_workers: int = 2,
    env: dict | None = None,
    mp_context: str = "spawn",
) -> list:
    """Run `worker_fn(*task)` for every task across `num_workers`
    share-nothing processes; returns results in task order.

    `worker_fn` must be a module-level (picklable) callable returning
    proof bytes (or any picklable value).  `env` is applied in each child
    before JAX is imported — e.g. {"JAX_PLATFORMS": "cpu"} to keep test
    workers off the coordinator's TPU, or per-host device pinning on a
    pod.  Default context "spawn": children must not inherit the
    coordinator's initialized JAX runtime.
    """
    import multiprocessing as mp

    ctx = mp.get_context(mp_context)
    with ProcessPoolExecutor(
        max_workers=num_workers,
        mp_context=ctx,
        initializer=_init_worker,
        initargs=(env,),
    ) as pool:
        futs = [pool.submit(worker_fn, *t) for t in tasks]
        return [f.result() for f in futs]


def aggregate_tree(config, nodes: list, cache=None, xp=np):
    """Fold RecursionInput leaves 2-to-1 up to a single root
    (reference scaling.md tree recursion; odd node carried up a level).

    Returns the root RecursionInput; `cache` (AggregationPrepCache)
    makes every like-shaped pair after the first reuse circuit + offline
    preprocessed commitment."""
    from ..recursion.aggregation import (
        AggregationPrepCache,
        build_and_prove_aggregation_layer,
    )

    if not nodes:
        raise ValueError("empty aggregation tree")
    cache = cache if cache is not None else AggregationPrepCache()
    while len(nodes) > 1:
        level = [
            build_and_prove_aggregation_layer(
                config, nodes[i], nodes[i + 1], xp=xp, cache=cache
            )
            for i in range(0, len(nodes) - 1, 2)
        ]
        if len(nodes) % 2:
            level.append(nodes[-1])
        nodes = level
    return nodes[0]


# ---------------------------------------------------------------------------
# demo leaf payload (used by tests and examples/recursive_aggregation.py)
# ---------------------------------------------------------------------------


def fib_leaf_proof_bytes(n: int, start: tuple = (0, 1)) -> bytes:
    """Prove one Fibonacci(n) batch-stark leaf at testing params and
    return it as serde bytes — the canonical distributed-leaf payload
    (mirrors the reference's aggregation example leaves,
    `recursive_aggregation.rs`)."""
    from ..circuit import CircuitBuilder
    from ..fields import KOALA_BEAR, ext_field
    from ..prover import BatchStarkProver, circuit_prover_data
    from ..stark.fri_pcs import FriParams
    from ..stark.uni import koala_bear_config
    from ..utils.serde import batch_stark_proof_to_bytes

    config = koala_bear_config(FriParams.testing())
    E4 = ext_field(KOALA_BEAR, 4)
    b = CircuitBuilder(E4)
    a = b.public_input()
    bb = b.public_input()
    res = b.public_input()
    for _ in range(n):
        a, bb = bb, b.add(a, bb)
    b.connect(bb, res)
    circuit = b.build()
    pdata = circuit_prover_data(config, circuit)
    x, y = start
    for _ in range(n):
        x, y = y, (x + y) % KOALA_BEAR.P
    runner = circuit.runner()
    runner.set_public_inputs([start[0], start[1], y])
    traces = runner.run()
    proof = BatchStarkProver(config).prove_all_tables(circuit, traces, pdata)
    return batch_stark_proof_to_bytes(proof)


def fib_leaf_recursion_input(config, n: int, proof_bytes: bytes):
    """Coordinator side: rebuild the (witness-free) leaf circuit + prep
    and bind the deserialized proof — static data is derived locally, only
    proof bytes crossed the host boundary."""
    from ..circuit import CircuitBuilder
    from ..fields import KOALA_BEAR, ext_field
    from ..prover import circuit_prover_data
    from ..recursion.recursion import RecursionInput
    from ..utils.serde import batch_stark_proof_from_bytes

    E4 = ext_field(KOALA_BEAR, 4)
    b = CircuitBuilder(E4)
    a = b.public_input()
    bb = b.public_input()
    res = b.public_input()
    for _ in range(n):
        a, bb = bb, b.add(a, bb)
    b.connect(bb, res)
    circuit = b.build()
    pdata = circuit_prover_data(config, circuit)
    proof = batch_stark_proof_from_bytes(proof_bytes, config)
    return RecursionInput(proof, circuit, pdata)

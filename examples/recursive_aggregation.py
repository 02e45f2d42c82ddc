#!/usr/bin/env python
"""2-to-1 aggregation tree example (reference `recursive_aggregation.rs`).

Proves N leaf statements, then aggregates pairwise up a binary tree —
leaves are embarrassingly parallel across hosts; every level halves the
proof count (`book/src/advanced_topics/scaling.md`).

    python examples/recursive_aggregation.py --leaves 4 --cpu
    python examples/recursive_aggregation.py --leaves 4 --workers 2 --cpu

With --workers N the leaves are proven by N share-nothing worker
processes (one per host on a pod) and shipped back as serde bytes —
see `plonky3_recursion_tpu/parallel/multihost.py`.
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--leaves", type=int, default=2)
    ap.add_argument("--n", type=int, default=32)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument(
        "--workers",
        type=int,
        default=0,
        help="prove leaves in N share-nothing worker processes "
        "(0 = in-process)",
    )
    args = ap.parse_args()
    assert args.leaves & (args.leaves - 1) == 0, "leaves must be a power of 2"

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from plonky3_recursion_tpu.circuit import CircuitBuilder
    from plonky3_recursion_tpu.fields import KOALA_BEAR, ext_field
    from plonky3_recursion_tpu.prover import (
        BatchStarkProver,
        circuit_prover_data,
    )
    from plonky3_recursion_tpu.recursion.aggregation import (
        build_aggregation_circuit,
        prove_aggregation_layer,
    )
    from plonky3_recursion_tpu.recursion.recursion import RecursionInput
    from plonky3_recursion_tpu.stark.fri_pcs import FriParams
    from plonky3_recursion_tpu.stark.uni import koala_bear_config

    config = koala_bear_config(FriParams.testing())
    E4 = ext_field(KOALA_BEAR, 4)

    def leaf(seed):
        b = CircuitBuilder(E4)
        a = b.public_input()
        bb = b.public_input()
        res = b.public_input()
        for _ in range(args.n):
            a, bb = bb, b.add(a, bb)
        b.connect(bb, res)
        circuit = b.build()
        pdata = circuit_prover_data(config, circuit)
        x, y = seed, 1
        for _ in range(args.n):
            x, y = y, (x + y) % KOALA_BEAR.P
        r = circuit.runner()
        r.set_public_inputs([seed, 1, y])
        proof = BatchStarkProver(config).prove_all_tables(
            circuit, r.run(), pdata
        )
        return RecursionInput(proof, circuit, pdata)

    t0 = time.time()
    if args.workers:
        from plonky3_recursion_tpu.parallel.multihost import (
            fib_leaf_proof_bytes,
            fib_leaf_recursion_input,
            prove_leaves,
        )

        blobs = prove_leaves(
            fib_leaf_proof_bytes,
            [(args.n,) for _ in range(args.leaves)],
            num_workers=args.workers,
            env={"JAX_PLATFORMS": "cpu"} if args.cpu else None,
        )
        print(
            f"[leaves] {len(blobs)} proofs from {args.workers} workers, "
            f"{sum(len(b) for b in blobs)} proof bytes shipped"
        )
        level = [
            fib_leaf_recursion_input(config, args.n, b) for b in blobs
        ]
    else:
        level = [leaf(i) for i in range(args.leaves)]
    print(f"[leaves] {len(level)} proofs in {time.time()-t0:.1f}s")
    depth = 0
    prep_cache = {}
    while len(level) > 1:
        depth += 1
        nxt = []
        for i in range(0, len(level), 2):
            left, right = level[i], level[i + 1]
            key = ("prep", depth)
            if key not in prep_cache:
                prep_cache[key] = build_aggregation_circuit(
                    config, left, right
                )
            prep = prep_cache[key]
            t0 = time.time()
            proof = prove_aggregation_layer(
                config, prep, left.proof, right.proof
            )
            assert BatchStarkProver(config).verify_all_tables(
                prep.circuit, proof, prep.pdata
            )
            print(
                f"[level {depth}] pair {i//2}: {time.time()-t0:.1f}s "
                f"(fingerprint {prep.fingerprint()[:2]})"
            )
            nxt.append(RecursionInput(proof, prep.circuit, prep.pdata))
        level = nxt
    print("aggregation tree root proof verified OK")


if __name__ == "__main__":
    main()

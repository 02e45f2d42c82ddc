#!/usr/bin/env python
"""Recursive Fibonacci: base batch-stark proof + N recursion layers.

TPU-native equivalent of the reference's flagship example
(`recursion/examples/recursive_fibonacci.rs`; SURVEY.md §2.4 L7): builds
the Fibonacci circuit, proves it with the batch-stark prover, then chains
`--num-recursive-layers` layers of "this proof verifies", timing each.

    python examples/recursive_fibonacci.py --n 1000 --num-recursive-layers 1
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--field", default="koala-bear",
        choices=["koala-bear", "baby-bear"],
    )
    ap.add_argument("--n", type=int, default=1000)
    ap.add_argument("--num-recursive-layers", type=int, default=1)
    ap.add_argument("--log-blowup", type=int, default=1)
    ap.add_argument("--log-final-poly-len", type=int, default=0)
    ap.add_argument("--num-queries", type=int, default=8)
    ap.add_argument("--commit-pow-bits", type=int, default=0)
    ap.add_argument("--query-pow-bits", type=int, default=2)
    ap.add_argument("--security-level", type=int, default=None,
                    help="derive num_queries = (level - query_pow)/log_blowup")
    ap.add_argument("--max-log-arity", type=int, default=1,
                    help="FRI fold arity per phase (2^a)")
    ap.add_argument("--params", default=None,
                    choices=["testing", "standard"],
                    help="FRI parameter preset (overrides individual flags)")
    ap.add_argument("--zk", action="store_true",
                    help="hiding proofs: salted commitments + random round")
    ap.add_argument("--alu-lanes", type=int, default=4)
    ap.add_argument("--public-lanes", type=int, default=1)
    ap.add_argument("--horner-packed-steps", type=int, default=8)
    ap.add_argument("--recursion-optimized", action="store_true",
                    help="ConstraintProfile.RECURSION_OPTIMIZED layer shaping")
    ap.add_argument("--prep-cache", action="store_true",
                    help="reuse layer prep at the circuit fixed point")
    ap.add_argument("--jit", action="store_true", help="use device kernels")
    ap.add_argument("--cpu", action="store_true", help="force JAX cpu backend")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from plonky3_recursion_tpu.circuit import CircuitBuilder
    from plonky3_recursion_tpu.fields import KOALA_BEAR, ext_field
    from plonky3_recursion_tpu.prover import (
        BatchStarkProver,
        circuit_prover_data,
    )
    from plonky3_recursion_tpu.recursion.recursion import (
        RecursionInput,
        build_and_prove_next_layer,
    )
    from plonky3_recursion_tpu.stark.fri_pcs import FriParams
    from plonky3_recursion_tpu.stark.uni import koala_bear_config
    from plonky3_recursion_tpu.utils.serde import batch_proof_to_bytes

    nq = args.num_queries
    if args.security_level is not None:
        nq = (args.security_level - args.query_pow_bits) // args.log_blowup
    if args.params == "standard":
        params = FriParams.standard(args.security_level or 124)
    elif args.params == "testing":
        params = FriParams.testing()
    else:
        params = FriParams(
            log_blowup=args.log_blowup,
            log_final_poly_len=args.log_final_poly_len,
            num_queries=nq,
            commit_pow_bits=args.commit_pow_bits,
            query_pow_bits=args.query_pow_bits,
            max_log_arity=args.max_log_arity,
        )
    from plonky3_recursion_tpu.stark.uni import baby_bear_config

    cfg_fn = (
        koala_bear_config if args.field == "koala-bear" else baby_bear_config
    )
    config = cfg_fn(params, use_jit=args.jit, zk=args.zk)
    field = config.field
    E4 = ext_field(field, 4)

    b = CircuitBuilder(E4)
    a = b.public_input()
    bb = b.public_input()
    res = b.public_input()
    for _ in range(args.n):
        a, bb = bb, b.add(a, bb)
    b.connect(bb, res)
    t0 = time.time()
    circuit = b.build()
    print(f"[build] circuit: {len(circuit.alu_rows)} alu rows, "
          f"{circuit.witness_count} witnesses ({time.time()-t0:.2f}s)")
    pdata = circuit_prover_data(config, circuit)
    x, y = 0, 1
    for _ in range(args.n):
        x, y = y, (x + y) % field.P
    runner = circuit.runner()
    runner.set_public_inputs([0, 1, y])
    traces = runner.run()
    prover = BatchStarkProver(config)
    t0 = time.time()
    proof = prover.prove_all_tables(circuit, traces, pdata)
    print(f"[base] proved in {time.time()-t0:.2f}s, "
          f"proof {len(batch_proof_to_bytes(proof.batch))//1024} KiB")
    assert prover.verify_all_tables(circuit, proof, pdata)
    from plonky3_recursion_tpu.prover.batch_prover import TablePacking
    from plonky3_recursion_tpu.prover.constraint_profile import (
        ConstraintProfile,
    )
    from plonky3_recursion_tpu.recursion.recursion import (
        NextLayerPrepCache,
        ProveNextLayerParams,
    )

    lp = ProveNextLayerParams(
        packing=TablePacking(
            public_lanes=args.public_lanes, alu_lanes=args.alu_lanes
        )
        if not args.recursion_optimized
        else None,
        profile=ConstraintProfile.RECURSION_OPTIMIZED
        if args.recursion_optimized
        else ConstraintProfile.STANDARD,
        horner_k=args.horner_packed_steps,
    )
    cache = NextLayerPrepCache() if args.prep_cache else None
    layer = RecursionInput(proof, circuit, pdata)
    for i in range(args.num_recursive_layers):
        t0 = time.time()
        layer = build_and_prove_next_layer(
            config, layer, cache=cache, params=lp
        )
        dt = time.time() - t0
        assert BatchStarkProver(config).verify_all_tables(
            layer.circuit, layer.proof, layer.prover_data
        )
        print(
            f"[layer {i+1}] proved+verified in {dt:.2f}s "
            f"({len(layer.circuit.alu_rows)} alu rows, "
            f"{len(layer.circuit.npo_calls)} perms, "
            f"proof {len(batch_proof_to_bytes(layer.proof.batch))//1024} KiB)"
        )
    print("OK")


if __name__ == "__main__":
    main()

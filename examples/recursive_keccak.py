#!/usr/bin/env python
"""Recursive Keccak: base Keccak-f[1600] proof + recursion layer
(reference `recursive_keccak.rs`; SURVEY.md §2.4 L7).

    python examples/recursive_keccak.py --n 2 --num-recursive-layers 0 --cpu

The layer-1 verifier circuit for a keccak proof is ~455k ALU rows /
~10.7k Poseidon2 perms (the reference's recursion witnesses are the same
order, ~420-440k rows) — proving it on the host CPU path takes tens of
minutes; use the device path for real runs.
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2, help="number of permutations")
    ap.add_argument("--num-recursive-layers", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from plonky3_recursion_tpu.prover.batch_prover import (
        _airs,  # noqa: F401  (keccak flows through raw batch-stark)
    )
    from plonky3_recursion_tpu.recursion.batch_verifier import (
        build_batch_verifier_circuit,
    )
    from plonky3_recursion_tpu.prover import (
        BatchStarkProver,
        circuit_prover_data,
    )
    from plonky3_recursion_tpu.stark.batch import (
        StarkInstance,
        commit_preprocessed,
        prove_batch,
        verify_batch,
    )
    from plonky3_recursion_tpu.utils.test_utils import make_test_config
    from plonky3_recursion_tpu.workloads.keccak import (
        KeccakAir,
        keccak_f_trace,
        keccak_preprocessed,
    )

    config = make_test_config()
    rng = np.random.default_rng(0)
    states = [
        [
            [int(v) for v in rng.integers(0, 1 << 64, 5, dtype=np.uint64)]
            for _ in range(5)
        ]
        for _ in range(args.n)
    ]
    t0 = time.time()
    trace = keccak_f_trace(states)
    prep = keccak_preprocessed(args.n, trace.shape[0])
    print(
        f"[trace] {args.n} perms -> {trace.shape} in {time.time()-t0:.1f}s"
    )
    inst = StarkInstance(KeccakAir(), trace, [], preprocessed=prep)
    common = commit_preprocessed(config, [inst])
    t0 = time.time()
    proof = prove_batch(config, [inst], common)
    print(f"[base] keccak proof in {time.time()-t0:.1f}s")
    assert verify_batch(config, [(KeccakAir(), [])], proof, common)
    print("[base] verified")
    if args.num_recursive_layers > 0:
        from plonky3_recursion_tpu.stark.batch import InstanceShape

        vcr = build_batch_verifier_circuit(
            config, [(KeccakAir(), [])], proof.shapes, common
        )
        t0 = time.time()
        circuit = vcr.builder.build()
        print(
            f"[layer] verifier circuit: {len(circuit.alu_rows)} alu rows, "
            f"{len(circuit.npo_calls)} perms ({time.time()-t0:.1f}s)"
        )
        pdata = circuit_prover_data(config, circuit)
        runner = circuit.runner()
        runner.set_public_inputs(vcr.pack_public_inputs(proof))
        runner.set_private_inputs(vcr.pack_private_inputs(proof))
        for key, data in vcr.pack_npo_private(proof).items():
            runner.set_private_data(key, data)
        traces = runner.run()
        t0 = time.time()
        layer = BatchStarkProver(config).prove_all_tables(
            circuit, traces, pdata
        )
        print(f"[layer 1] proved in {time.time()-t0:.1f}s")
        assert BatchStarkProver(config).verify_all_tables(
            circuit, layer, pdata
        )
        print("[layer 1] verified")
    print("OK")


if __name__ == "__main__":
    main()

"""Keccak workload benchmark on the live device (BASELINE.md keccak rows).

Reference rows (Apple M4 Pro, 14 cores, `benchmark.md:51-55`):
  base uni-stark proof, 1,000 hashes   720 ms
  1st recursion layer                  663 ms
  2nd-3rd recursion layers             147 ms

Usage: python scripts/bench_keccak.py [--n 1000] [--layers 1] [--cpu]
Prints per-stage wall times; numbers land in STATUS.md.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1000)
    ap.add_argument("--layers", type=int, default=1)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    cache = ".jax_cache_cpu" if args.cpu else ".jax_cache"
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), cache),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from plonky3_recursion_tpu.prover import (
        BatchStarkProver,
        circuit_prover_data,
    )
    from plonky3_recursion_tpu.recursion.batch_verifier import (
        build_batch_verifier_circuit,
    )
    from plonky3_recursion_tpu.stark.batch import (
        StarkInstance,
        commit_preprocessed,
        prove_batch,
        verify_batch,
    )
    from plonky3_recursion_tpu.stark.fri_pcs import FriParams
    from plonky3_recursion_tpu.stark.uni import koala_bear_config
    from plonky3_recursion_tpu.workloads.keccak import (
        KeccakAir,
        keccak_f_trace,
        keccak_preprocessed,
    )

    config = koala_bear_config(
        FriParams.standard(124), use_jit=not args.cpu
    )
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
        f"[trace] {args.n} perms -> {trace.shape} in {time.time() - t0:.1f}s",
        flush=True,
    )
    inst = StarkInstance(KeccakAir(), trace, [], preprocessed=prep)
    common = commit_preprocessed(config, [inst])

    def prove_base():
        t0 = time.time()
        pf = prove_batch(config, [inst], common)
        return (time.time() - t0) * 1e3, pf

    _ms, proof = prove_base()  # warmup/compile
    base_ms, proof = prove_base()
    assert verify_batch(config, [(KeccakAir(), [])], proof, common)
    print(
        f"[base] keccak batch prove {base_ms:.1f} ms "
        f"(reference 720 ms, x{720.0 / base_ms:.3f})",
        flush=True,
    )

    if args.layers >= 1:
        # layer 1: the keccak (non-circuit) batch proof verified in-circuit
        t0 = time.time()
        vcr = build_batch_verifier_circuit(
            config, [(KeccakAir(), [])], proof.shapes, common
        )
        circuit = vcr.builder.build()
        print(
            f"[layer 1] circuit: {len(circuit.alu_rows)} alu rows, "
            f"{len(circuit.npo_calls)} perms ({time.time() - t0:.1f}s)",
            flush=True,
        )
        pdata = circuit_prover_data(config, circuit)

        def prove_layer1():
            runner = circuit.runner()
            t0 = time.time()
            runner.set_public_inputs(vcr.pack_public_inputs(proof))
            runner.set_private_inputs(vcr.pack_private_inputs(proof))
            for key, data in vcr.pack_npo_private(proof).items():
                runner.set_private_data(key, data)
            traces = runner.run()
            pf = BatchStarkProver(config).prove_all_tables(
                circuit, traces, pdata
            )
            return (time.time() - t0) * 1e3, pf

        _ms, layer = prove_layer1()  # warmup/compile
        layer_ms, layer = prove_layer1()
        assert BatchStarkProver(config).verify_all_tables(
            circuit, layer, pdata
        )
        print(
            f"[layer 1] prove {layer_ms:.1f} ms "
            f"(reference 663 ms, x{663.0 / layer_ms:.3f})",
            flush=True,
        )

    # layers 2+: standard circuit-proof recursion (reference 147 ms rows)
    if args.layers >= 2:
        from plonky3_recursion_tpu.recursion.recursion import (
            RecursionInput,
            build_next_layer_prep,
            prove_next_layer,
        )

        inner = RecursionInput(layer, circuit, pdata)
        for layer_i in range(2, args.layers + 1):
            prep = build_next_layer_prep(config, inner)
            prove_next_layer(config, prep, inner.proof)  # warmup
            t0 = time.time()
            nxt = prove_next_layer(config, prep, inner.proof)
            layer_ms = (time.time() - t0) * 1e3
            assert BatchStarkProver(config).verify_all_tables(
                prep.circuit, nxt, prep.pdata
            )
            print(
                f"[layer {layer_i}] prove {layer_ms:.1f} ms "
                f"(reference 147 ms, x{147.0 / layer_ms:.3f})",
                flush=True,
            )
            inner = RecursionInput(nxt, prep.circuit, prep.pdata)
    print("OK", flush=True)


if __name__ == "__main__":
    main()

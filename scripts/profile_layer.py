"""Span-profile one recursion layer at standard params on the live device.

Usage: python scripts/profile_layer.py [--n 10000]
Prints the hierarchical span tree for the base prove and the layer prove.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache"),
    )

    from plonky3_recursion_tpu.circuit import CircuitBuilder
    from plonky3_recursion_tpu.fields import KOALA_BEAR, ext_field
    from plonky3_recursion_tpu.prover import (
        BatchStarkProver,
        circuit_prover_data,
    )
    from plonky3_recursion_tpu.recursion.recursion import (
        RecursionInput,
        build_next_layer_prep,
        prove_next_layer,
    )
    from plonky3_recursion_tpu.stark.fri_pcs import FriParams
    from plonky3_recursion_tpu.stark.uni import koala_bear_config
    from plonky3_recursion_tpu.utils import tracing

    config = koala_bear_config(FriParams.standard(124), use_jit=True)
    E4 = ext_field(KOALA_BEAR, 4)
    b = CircuitBuilder(E4)
    a = b.public_input()
    bb = b.public_input()
    res = b.public_input()
    for _ in range(args.n):
        a, bb = bb, b.add(a, bb)
    b.connect(bb, res)
    circuit = b.build()
    pdata = circuit_prover_data(config, circuit)
    x, y = 0, 1
    for _ in range(args.n):
        x, y = y, (x + y) % KOALA_BEAR.P
    prover = BatchStarkProver(config)

    def run_base():
        runner = circuit.runner()
        runner.set_public_inputs([0, 1, y])
        traces = runner.run()
        return prover.prove_all_tables(circuit, traces, pdata)

    proof = run_base()  # warmup
    tracing.enable(True)
    tracing.reset()
    t0 = time.time()
    proof = run_base()
    print(f"== base prove: {(time.time()-t0)*1e3:.0f} ms ==", flush=True)
    tracing.report()
    inner = RecursionInput(proof, circuit, pdata)
    prep = build_next_layer_prep(config, inner)
    tracing.enable(False)
    prove_next_layer(config, prep, proof)  # warmup
    tracing.enable(True)
    tracing.reset()
    t0 = time.time()
    prove_next_layer(config, prep, proof)
    print(f"== layer prove: {(time.time()-t0)*1e3:.0f} ms ==", flush=True)
    tracing.report()


if __name__ == "__main__":
    main()

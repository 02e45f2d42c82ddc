#!/usr/bin/env python
"""Minimum end-to-end slice (SURVEY.md §7.3): Fibonacci circuit -> traces ->
batch-stark proof -> native verify.  CPU backend, quick."""

import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    from plonky3_recursion_tpu.circuit import CircuitBuilder
    from plonky3_recursion_tpu.fields import KOALA_BEAR, ext_field
    from plonky3_recursion_tpu.prover import (
        BatchStarkProver,
        circuit_prover_data,
    )
    from plonky3_recursion_tpu.stark.fri_pcs import FriParams
    from plonky3_recursion_tpu.stark.uni import koala_bear_config

    E4 = ext_field(KOALA_BEAR, 4)
    b = CircuitBuilder(E4)
    a = b.public_input()
    bb = b.public_input()
    res = b.public_input()
    n = 256
    for _ in range(n):
        a, bb = bb, b.add(a, bb)
    b.connect(bb, res)
    circuit = b.build()
    config = koala_bear_config(FriParams.testing())
    pdata = circuit_prover_data(config, circuit)
    x, y = 0, 1
    for _ in range(n):
        x, y = y, (x + y) % KOALA_BEAR.P
    runner = circuit.runner()
    runner.set_public_inputs([0, 1, y])
    traces = runner.run()
    prover = BatchStarkProver(config)
    t0 = time.time()
    proof = prover.prove_all_tables(circuit, traces, pdata, debug_lookups=True)
    print(f"proved fib-{n} in {time.time()-t0:.2f}s")
    assert prover.verify_all_tables(circuit, proof, pdata)
    print("verified OK")


if __name__ == "__main__":
    main()

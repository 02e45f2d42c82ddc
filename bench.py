"""Benchmark: Fibonacci batch-stark circuit proof (reference headline).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline: 42.6 ms — the reference's Fibonacci base batch-stark proof,
n=10,000, KoalaBear D=4, default params, Apple M4 Pro 14 cores
(BASELINE.md, `book/src/appendix/benchmark.md:57-58`).
`vs_baseline` is the speedup factor baseline_ms / measured_ms (>1 beats
the reference).
"""

import json
import os
import time

import numpy as np

BASELINE_MS = 42.6
N = 10_000


def _setup_jax_cache():
    import jax

    cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def main():
    _setup_jax_cache()
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
    for _ in range(N):
        a, bb = bb, b.add(a, bb)
    b.connect(bb, res)
    circuit = b.build()
    config = koala_bear_config(FriParams.standard(124), use_jit=True)
    pdata = circuit_prover_data(config, circuit)
    x, y = 0, 1
    for _ in range(N):
        x, y = y, (x + y) % KOALA_BEAR.P
    runner = circuit.runner()
    runner.set_public_inputs([0, 1, y])
    traces = runner.run()
    prover = BatchStarkProver(config)
    # one warmup (caches twiddle/selector tables), then the measured run
    prover.prove_all_tables(circuit, traces, pdata)
    runner2 = circuit.runner()
    runner2.set_public_inputs([0, 1, y])
    t0 = time.time()
    traces2 = runner2.run()
    proof = prover.prove_all_tables(circuit, traces2, pdata)
    ms = (time.time() - t0) * 1e3
    prover.verify_all_tables(circuit, proof, pdata)
    print(
        json.dumps(
            {
                "metric": "fib10k_batch_stark_prove",
                "value": round(ms, 1),
                "unit": "ms",
                "vs_baseline": round(BASELINE_MS / ms, 4),
            }
        )
    )


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Per-layer benchmark harness (reference `scripts/benchmark.sh` analog).

Runs the recursive Fibonacci pipeline N times, collects the tracing-span
durations per stage/layer, and prints min/mean/median/max CSV — the same
shape of output the reference greps out of its tracing-forest logs.

    python scripts/benchmark.py fibonacci 3 --n 256
"""

import argparse
import statistics
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workload", choices=["fibonacci"], nargs="?", default="fibonacci")
    ap.add_argument("runs", type=int, nargs="?", default=3)
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--layers", type=int, default=1)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

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

    config = koala_bear_config(FriParams.testing())
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

    stage_times: dict[str, list] = {}

    def record(stage, dt):
        stage_times.setdefault(stage, []).append(dt)

    preps = {}
    for run in range(args.runs):
        tracing.reset()
        tracing.enable(True)
        runner = circuit.runner()
        runner.set_public_inputs([0, 1, y])
        traces = runner.run()
        t0 = time.time()
        proof = prover.prove_all_tables(circuit, traces, pdata)
        record("base_proof", time.time() - t0)
        layer = RecursionInput(proof, circuit, pdata)
        for li in range(args.layers):
            key = ("prep", li)
            if key not in preps:
                preps[key] = build_next_layer_prep(config, layer)
            t0 = time.time()
            lproof = prove_next_layer(config, preps[key], layer.proof)
            record(f"layer_{li+1}", time.time() - t0)
            layer = RecursionInput(
                lproof, preps[key].circuit, preps[key].pdata
            )
        tracing.enable(False)

    print("stage,min_ms,mean_ms,median_ms,max_ms,runs")
    for stage, ts in stage_times.items():
        ms = [t * 1e3 for t in ts]
        print(
            f"{stage},{min(ms):.1f},{statistics.mean(ms):.1f},"
            f"{statistics.median(ms):.1f},{max(ms):.1f},{len(ms)}"
        )


if __name__ == "__main__":
    main()

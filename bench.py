"""Benchmark: one full recursion layer at STANDARD reference params.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Metric: `prove_next_layer` wall time — verify a Fibonacci (n=10,000)
batch-stark proof in-circuit and re-prove it, at the reference's example
defaults (log_blowup=2, 54 queries, max_log_arity=2, log_final_poly_len=5,
query_pow_bits=15; `recursive_fibonacci.rs:72-107`).

Baseline: 147 ms — the reference's Fibonacci 1st–2nd recursion layer on
an Apple M4 Pro 14 cores (BASELINE.md, `book/src/appendix/benchmark.md:59`).
`vs_baseline` is the speedup factor baseline_ms / measured_ms (>1 beats
the reference).

Secondary numbers (stderr): base-proof time vs its 42.6 ms baseline, and
Poseidon2 perms/s/chip (probed BEFORE the layer section so a throughput
number always lands in the tail).

Robustness contract: the driver runs this under an unknown external
timeout (observed killing at ~1430 s in rounds 2–3).  Exactly one JSON
line is emitted no matter how the process ends: on clean completion, on
the wall-clock watchdog (BENCH_DEADLINE_S, default 1250 s — below the
observed external kill, above the ~1100 s a warm layer measurement
needs including per-process jax tracing), on SIGTERM/
SIGINT from an external `timeout`, or on an exception after the first
milestone.  Best-so-far semantics: every completed milestone updates
_BEST; whichever exit path fires first prints it exactly once.
"""

import json
import os
import signal
import sys
import threading
import time

LAYER_BASELINE_MS = 147.0
BASE_BASELINE_MS = 42.6
N = 10_000

# ---- once-only best-so-far emission ---------------------------------------
_BEST: dict | None = None
_FINISHED = threading.Event()
_EMIT_LOCK = threading.Lock()
_EMITTED = False


def _set_best(metric: str, value_ms: float, baseline_ms: float) -> dict:
    global _BEST
    _BEST = {
        "metric": metric,
        "value": round(value_ms, 1),
        "unit": "ms",
        "vs_baseline": round(baseline_ms / value_ms, 4),
    }
    return _BEST


def _emit(tag: str) -> bool:
    """Print the best-so-far JSON line exactly once. Returns True if this
    call was the one that emitted."""
    global _EMITTED
    with _EMIT_LOCK:
        if _EMITTED or _BEST is None:
            return False
        _EMITTED = True
        log(f"[bench] emitting ({tag}): {_BEST['metric']}={_BEST['value']}ms")
        print(json.dumps(_BEST), flush=True)
        return True


def _start_watchdog():
    try:
        deadline = float(os.environ.get("BENCH_DEADLINE_S", "1250"))
    except (TypeError, ValueError):
        deadline = 1250.0

    def run():
        if _FINISHED.wait(deadline):
            return
        if _emit(f"deadline {deadline:.0f}s"):
            os._exit(0)
        if _EMITTED:
            return
        log(f"[bench] deadline {deadline:.0f}s hit with no milestone — abort")
        os._exit(4)

    threading.Thread(target=run, daemon=True).start()


def _on_signal(signum, frame):
    # External `timeout` sends SIGTERM before SIGKILL; flush the best
    # milestone so the driver still records a metric.
    if _emit(f"signal {signum}"):
        os._exit(0)
    os._exit(5)


signal.signal(signal.SIGTERM, _on_signal)
signal.signal(signal.SIGINT, _on_signal)


def _setup_jax_cache():
    import jax

    cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_T0 = time.time()


def log(msg):
    print(f"[{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def _probe_backend(timeout_s: float = 600.0):
    """Fail fast (instead of hanging forever) when the TPU tunnel is
    unreachable: device discovery runs under a watchdog."""
    done = threading.Event()

    def watchdog():
        if not done.wait(timeout_s):
            log(
                f"[bench] backend unreachable after {timeout_s:.0f}s "
                "(TPU tunnel down?) — aborting"
            )
            os._exit(3)

    t = threading.Thread(target=watchdog, daemon=True)
    t.start()
    import jax

    devs = jax.devices()
    done.set()
    log(f"[bench] backend: {devs}")


def _poseidon2_probe():
    """Poseidon2 W16 throughput (perms/s/chip) — stderr only, never fatal."""
    try:
        import jax
        import jax.numpy as jnp
        import numpy as _np

        from plonky3_recursion_tpu.fields import KOALA_BEAR
        from plonky3_recursion_tpu.ops.poseidon2 import (
            permute,
            poseidon2_params,
        )

        params16 = poseidon2_params(KOALA_BEAR, 16)
        batch = 1 << 21

        def sync(a):
            # block_until_ready does not actually block through the
            # remote-device tunnel; a download does
            return _np.asarray(a[:1, :1])

        states = jnp.zeros((batch, 16), dtype=jnp.uint32)
        fn = jax.jit(lambda s: permute(params16, s, jnp))
        sync(fn(states))
        t0 = time.time()
        sync(fn(states))
        dt = time.time() - t0
        perms_s = batch / dt
        # arithmetic-intensity context: ~2,576 field mul-adds per W16
        # permutation (see STATUS.md "MFU accounting")
        log(
            f"[perm] Poseidon2 W16 {perms_s / 1e6:.2f} M perms/s "
            f"(~{perms_s * 2576 / 1e9:.0f} Gop/s field mul-adds)"
        )
    except Exception as e:
        log(f"[perm] probe skipped: {e}")


def main():
    _start_watchdog()
    _setup_jax_cache()
    _probe_backend()
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

    config = koala_bear_config(FriParams.standard(124), use_jit=True)
    E4 = ext_field(KOALA_BEAR, 4)

    # ---- base: Fibonacci n=10,000 batch-stark proof ----
    b = CircuitBuilder(E4)
    a = b.public_input()
    bb = b.public_input()
    res = b.public_input()
    for _ in range(N):
        a, bb = bb, b.add(a, bb)
    b.connect(bb, res)
    circuit = b.build()
    pdata = circuit_prover_data(config, circuit)
    x, y = 0, 1
    for _ in range(N):
        x, y = y, (x + y) % KOALA_BEAR.P
    prover = BatchStarkProver(config)

    def run_base():
        runner = circuit.runner()
        runner.set_public_inputs([0, 1, y])
        t0 = time.time()
        traces = runner.run()
        proof = prover.prove_all_tables(circuit, traces, pdata)
        return (time.time() - t0) * 1e3, proof

    _ms, proof = run_base()  # warmup/compile
    base_ms, proof = run_base()
    prover.verify_all_tables(circuit, proof, pdata)
    _set_best("fib10k_batch_stark_prove", base_ms, BASE_BASELINE_MS)
    log(
        f"[base] fib10k batch prove {base_ms:.1f} ms "
        f"(reference {BASE_BASELINE_MS} ms, x{BASE_BASELINE_MS / base_ms:.3f})"
    )

    # ---- Poseidon2 throughput BEFORE the layer section ----
    _poseidon2_probe()

    # ---- layer: recursively verify + re-prove at standard params ----
    # Anything failing past this point still emits the base milestone.
    try:
        inner = RecursionInput(proof, circuit, pdata)
        t0 = time.time()
        prep = build_next_layer_prep(config, inner)
        log(
            f"[prep] layer circuit: {len(prep.circuit.alu_rows)} alu rows, "
            f"{len(prep.circuit.npo_calls)} perms "
            f"(built in {time.time() - t0:.1f}s)"
        )
        prove_next_layer(config, prep, proof)  # warmup/compile
        t0 = time.time()
        layer_proof = prove_next_layer(config, prep, proof)
        layer_ms = (time.time() - t0) * 1e3
        BatchStarkProver(config).verify_all_tables(
            prep.circuit, layer_proof, prep.pdata
        )
        _set_best("fib_recursion_layer", layer_ms, LAYER_BASELINE_MS)
        log(
            f"[layer] prove_next_layer {layer_ms:.1f} ms "
            f"(reference {LAYER_BASELINE_MS} ms, "
            f"x{LAYER_BASELINE_MS / layer_ms:.3f})"
        )
    except Exception as e:
        log(f"[layer] FAILED ({type(e).__name__}: {e}) — emitting base metric")

    # ---- aggregation: 2-to-1 layer (BASELINE.md aggregation rows) ----
    # stderr-only milestone; never displaces the layer metric.  Runs only
    # with comfortable headroom before the watchdog.
    try:
        deadline = float(os.environ.get("BENCH_DEADLINE_S", "1250"))
    except (TypeError, ValueError):
        deadline = 1250.0
    if time.time() - _T0 < deadline - 240:
        try:
            _aggregation_probe(config, E4)
        except Exception as e:
            log(f"[agg] skipped: {type(e).__name__}: {e}")
    else:
        log("[agg] skipped: not enough headroom before deadline")

    _FINISHED.set()
    _emit("finished")


def _aggregation_probe(config, E4):
    """2-to-1 aggregation: two small Fibonacci base proofs -> one
    aggregation layer (reference `recursive_aggregation.rs`; baselines
    14.1 ms base / 121 ms first layer, `benchmark.md:62-64`)."""
    from plonky3_recursion_tpu.circuit import CircuitBuilder
    from plonky3_recursion_tpu.fields import KOALA_BEAR
    from plonky3_recursion_tpu.prover import (
        BatchStarkProver,
        circuit_prover_data,
    )
    from plonky3_recursion_tpu.recursion.aggregation import (
        build_aggregation_circuit,
        prove_aggregation_layer,
    )
    from plonky3_recursion_tpu.recursion.recursion import RecursionInput

    n = 256
    b = CircuitBuilder(E4)
    a = b.public_input()
    bb = b.public_input()
    res = b.public_input()
    for _ in range(n):
        a, bb = bb, b.add(a, bb)
    b.connect(bb, res)
    circuit = b.build()
    pdata = circuit_prover_data(config, circuit)
    x, y = 0, 1
    for _ in range(n):
        x, y = y, (x + y) % KOALA_BEAR.P
    prover = BatchStarkProver(config)

    def base_proof():
        runner = circuit.runner()
        runner.set_public_inputs([0, 1, y])
        t0 = time.time()
        traces = runner.run()
        pf = prover.prove_all_tables(circuit, traces, pdata)
        return (time.time() - t0) * 1e3, pf

    _ms, p1 = base_proof()  # warmup/compile
    base_ms, p2 = base_proof()
    log(f"[agg] base batch prove {base_ms:.1f} ms (reference 14.1 ms)")
    left = RecursionInput(p1, circuit, pdata)
    right = RecursionInput(p2, circuit, pdata)
    prep = build_aggregation_circuit(config, left, right)
    log(
        f"[agg] aggregation circuit: {len(prep.circuit.alu_rows)} alu rows, "
        f"{len(prep.circuit.npo_calls)} perms"
    )
    prove_aggregation_layer(config, prep, p1, p2)  # warmup/compile
    t0 = time.time()
    layer = prove_aggregation_layer(config, prep, p1, p2)
    agg_ms = (time.time() - t0) * 1e3
    BatchStarkProver(config).verify_all_tables(
        prep.circuit, layer, prep.pdata
    )
    log(
        f"[agg] 2-to-1 aggregation layer {agg_ms:.1f} ms "
        f"(reference 121 ms, x{121.0 / agg_ms:.3f})"
    )


if __name__ == "__main__":
    main()

"""Microbenchmark the device NTT at the recursion layer's shapes.

Usage: python scripts/bench_ntt.py [--cpu]
Times are download-synced (a tiny reduction is pulled through the tunnel
after each run; block_until_ready does not block through the remote
device path).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache"),
    )
    import jax.numpy as jnp

    from plonky3_recursion_tpu.fields import KOALA_BEAR
    from plonky3_recursion_tpu.ops.ntt import ntt, ntt_tables

    F = KOALA_BEAR
    rng = __import__("numpy").random.default_rng(0)

    def timed(fn, *xs, reps=args.reps):
        out = fn(*xs)  # warm (compile)
        jax.device_get(jnp.sum(out))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*xs)
        jax.device_get(jnp.sum(out))
        return (time.perf_counter() - t0) / reps * 1e3

    np = __import__("numpy")
    for log_n, c, inverse in [
        (18, 34, True),   # trace INTT (Poseidon table)
        (20, 34, False),  # trace LDE NTT
        (18, 128, True),
        (20, 128, False),
        (16, 64, False),
        (20, 8, False),
    ]:
        n = 1 << log_n
        x = jnp.asarray(
            rng.integers(0, F.P, size=(n, c), dtype=np.uint32)
        )
        perm, stages = ntt_tables(F, log_n, inverse)
        perm_d = jnp.asarray(perm)
        stages_d = tuple(jnp.asarray(s) for s in stages)

        fn = jax.jit(
            lambda x, p, s: ntt(F, x, jnp, inverse=inverse, tables=(p, s))
        )
        ms = timed(fn, x, perm_d, stages_d)
        mb = n * c * 4 / 1e6
        # roofline: log_n passes of read+write over the (padded-to-128
        # lanes) buffer at ~820 GB/s
        print(
            f"ntt log_n={log_n} C={c:4d} inv={int(inverse)}: {ms:8.2f} ms"
            f"  ({mb:7.1f} MB logical, {n * 128 * 4 / 1e6:7.1f} MB padded)"
        )


if __name__ == "__main__":
    main()

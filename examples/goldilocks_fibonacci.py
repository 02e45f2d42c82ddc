"""Goldilocks uni-stark Fibonacci: native prove + verify over the 64-bit
field (reference `recursion/tests/goldilocks.rs` workload / `goldilocks()`
config: D=2 extension, Poseidon2 W8, 4-element digests).

    python examples/goldilocks_fibonacci.py --n 64
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64, help="trace height (pow 2)")
    args = ap.parse_args()

    from plonky3_recursion_tpu.stark.goldilocks_stark import (
        GL,
        P_GOLDILOCKS,
        GlFibAir,
        gl_prove,
        gl_verify,
        goldilocks_config,
    )

    n = args.n
    assert n & (n - 1) == 0, "--n must be a power of two"
    rows = []
    a, b = 0, 1
    for _ in range(n):
        rows.append((a, b))
        a, b = b, (a + b) % P_GOLDILOCKS
    trace = GL.from_ints([v for r in rows for v in r]).reshape(n, 2, 2)
    publics = [0, 1, rows[-1][1]]

    config = goldilocks_config()
    t0 = time.time()
    proof = gl_prove(config, GlFibAir(), trace, publics)
    t1 = time.time()
    assert gl_verify(config, GlFibAir(), proof, publics)
    t2 = time.time()
    print(
        f"goldilocks fib n={n}: proved in {t1 - t0:.2f}s, "
        f"verified in {t2 - t1:.2f}s "
        f"(fib(n) mod p = {publics[2]})"
    )
    print("OK")


if __name__ == "__main__":
    main()

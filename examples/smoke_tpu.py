#!/usr/bin/env python
"""Real-TPU smoke: one jitted kernel per subsystem on the actual chip.

Single-compile functions only (the remote-compile path is slow for large
graphs); verifies device results against host goldens.
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", ".jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    print("devices:", jax.devices())

    from plonky3_recursion_tpu.fields import KOALA_BEAR as F
    from plonky3_recursion_tpu.ops.ntt import coset_lde
    from plonky3_recursion_tpu.ops.poseidon2 import (
        permute,
        permute_scalar,
        poseidon2_params,
    )

    rng = np.random.default_rng(0)
    params = poseidon2_params(F, 16)
    states = F.rand(rng, (8192, 16))
    f = jax.jit(lambda s: permute(params, s, jnp))
    t0 = time.time()
    out = np.asarray(f(jnp.asarray(states)))
    print(f"poseidon2 compile+run: {time.time()-t0:.1f}s")
    t0 = time.time()
    for _ in range(5):
        out_d = f(jnp.asarray(states))
    out_d.block_until_ready()
    dt = (time.time() - t0) / 5
    print(f"poseidon2: {8192/dt:,.0f} perms/s (batch 8192, tunnel incl.)")
    assert [int(v) for v in out[3]] == permute_scalar(params, states[3])
    print("poseidon2 matches scalar golden")

    trace = F.rand(rng, (1024, 8))
    g = jax.jit(lambda x: coset_lde(F, x, 1, jnp))
    t0 = time.time()
    lde = np.asarray(g(jnp.asarray(trace)))
    print(f"coset LDE compile+run: {time.time()-t0:.1f}s -> {lde.shape}")
    from plonky3_recursion_tpu.ops.ntt import coset_lde as lde_host

    assert np.array_equal(lde, lde_host(F, trace, 1, np))
    print("LDE matches host")
    print("OK")


if __name__ == "__main__":
    main()

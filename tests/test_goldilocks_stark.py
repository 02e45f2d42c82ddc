"""Goldilocks native STARK pipeline (reference goldilocks() config +
goldilocks.rs Fibonacci workload: D=2 extension, Poseidon2 W8,
4-element digests)."""

import numpy as np
import pytest

from plonky3_recursion_tpu.stark.goldilocks_stark import (
    GL,
    GLE,
    GlFibAir,
    GlFriParams,
    GlFriPcs,
    P_GOLDILOCKS,
    gl_domain_points,
    gl_intt,
    gl_ntt,
    gl_permute,
    gl_prove,
    gl_verify,
    goldilocks_config,
)


def _fib_trace(n: int):
    rows = []
    a, b = 0, 1
    for _ in range(n):
        rows.append((a, b))
        a, b = b, (a + b) % P_GOLDILOCKS
    return GL.from_ints([v for r in rows for v in r]).reshape(n, 2, 2), rows


def test_gl_poseidon2_permutes():
    rng = np.random.default_rng(0)
    s = GL.rand(rng, (3, 8))
    out = gl_permute(s)
    assert out.shape == (3, 8, 2)
    # deterministic + injective-looking (distinct inputs -> distinct out)
    assert np.array_equal(out, gl_permute(s))
    assert not np.array_equal(out[0], out[1])
    # all outputs canonical
    ints = GL.to_ints(out)
    assert all(0 <= int(v) < P_GOLDILOCKS for v in ints.reshape(-1))


def test_gl_pcs_commit_open_verify_roundtrip():
    rng = np.random.default_rng(1)
    pcs = GlFriPcs(GlFriParams.testing())
    evals = GL.rand(rng, (16, 3))
    data = pcs.commit([(1, evals)])
    ch = goldilocks_config().challenger()
    zeta = np.stack([GL.rand(rng, ()), GL.rand(rng, ())])
    opened, fri = pcs.open([(data, [[zeta]])], ch)
    chv = goldilocks_config().challenger()
    rounds_v = [(data.commitment, [(4, [(zeta, opened[0][0][0])])])]
    assert pcs.verify(rounds_v, fri, chv)
    # claimed evaluation must match a direct coefficient evaluation
    want = pcs.eval_at_point(data.matrices[0], zeta)
    assert np.array_equal(np.asarray(opened[0][0][0]), np.asarray(want))
    # tampered claimed opening rejected
    bad = np.asarray(opened[0][0][0]).copy()
    bad[0, 0, 0] ^= 1
    chb = goldilocks_config().challenger()
    with pytest.raises(ValueError):
        pcs.verify([(data.commitment, [(4, [(zeta, bad)])])], fri, chb)


def test_gl_fibonacci_uni_stark():
    n = 16
    trace, rows = _fib_trace(n)
    publics = [0, 1, rows[-1][1]]
    config = goldilocks_config()
    proof = gl_prove(config, GlFibAir(), trace, publics)
    assert gl_verify(config, GlFibAir(), proof, publics)

    # wrong public input -> constraint check fails
    with pytest.raises(ValueError, match="quotient/constraint"):
        gl_verify(
            config, GlFibAir(), proof, [0, 1, (rows[-1][1] + 1) % P_GOLDILOCKS]
        )

    # tampered trace opening -> FRI/commitment rejects
    import dataclasses as dc

    bad = dc.replace(proof)
    tl = np.asarray(bad.trace_local).copy()
    tl[0, 0, 0] ^= 1
    bad.trace_local = tl
    with pytest.raises(ValueError):
        gl_verify(config, GlFibAir(), bad, publics)

    # tampered final poly -> rejected
    bad2 = dc.replace(proof)
    fc = np.asarray(bad2.fri.final_coeffs).copy()
    fc[0, 0, 0] ^= 1
    bad2 = dc.replace(
        proof, fri=dc.replace(proof.fri, final_coeffs=fc)
    )
    with pytest.raises(ValueError):
        gl_verify(config, GlFibAir(), bad2, publics)


def test_gl_fibonacci_larger_trace():
    n = 64
    trace, rows = _fib_trace(n)
    publics = [0, 1, rows[-1][1]]
    config = goldilocks_config()
    proof = gl_prove(config, GlFibAir(), trace, publics)
    assert gl_verify(config, GlFibAir(), proof, publics)


def test_gl_mul_air_with_preprocessed():
    """MulAir with a preprocessed multiplier column (reference
    `test_goldilocks_mul_verifier_with_preprocessed`)."""
    import dataclasses as dc

    from plonky3_recursion_tpu.stark.goldilocks_stark import GlMulAir

    rng = np.random.default_rng(5)
    n = 16
    k = GL.rand(rng, (n, 1))
    x = GL.rand(rng, (n, 1))
    x[0] = GL.from_ints(12345)
    y = GL.mul(k[:, 0], x[:, 0], np)[:, None, :]
    trace = np.concatenate([x[:, :, None, :], y[:, :, None, :]], axis=2)[
        :, 0
    ]  # (n, 2, 2)
    config = goldilocks_config()
    proof = gl_prove(config, GlMulAir(), trace, [12345], prep=k)
    from plonky3_recursion_tpu.stark.goldilocks_stark import gl_verify as gv

    assert gv(config, GlMulAir(), proof, [12345])
    # wrong public -> first-row constraint fails
    with pytest.raises(ValueError, match="quotient/constraint"):
        gv(config, GlMulAir(), proof, [12346])
    # tampered prep commitment -> transcript/FRI rejects
    bad = dc.replace(proof)
    pc = np.asarray(bad.prep_commit).copy()
    pc[0, 0] ^= 1
    bad.prep_commit = pc
    with pytest.raises(ValueError):
        gv(config, GlMulAir(), bad, [12345])
    # tampered prep opening -> rejected
    bad2 = dc.replace(proof)
    pl = np.asarray(bad2.prep_local).copy()
    pl[0, 0, 0] ^= 1
    bad2.prep_local = pl
    with pytest.raises(ValueError):
        gv(config, GlMulAir(), bad2, [12345])
    # a proof without prep is rejected for a prep air
    bad3 = dc.replace(proof, prep_commit=None)
    with pytest.raises(ValueError, match="presence mismatch"):
        gv(config, GlMulAir(), bad3, [12345])


def test_gl_ops_jnp_parity():
    """The GL kernels run identically under jnp (the TPU-native u32
    limb-pair layout compiles through XLA; CPU-jax parity here)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from plonky3_recursion_tpu.stark.goldilocks_stark import (
        gl_compress,
        gl_permute,
        gl_sponge_hash,
    )

    rng = np.random.default_rng(0)
    s = GL.rand(rng, (5, 8))
    assert np.array_equal(
        gl_permute(s, np), np.asarray(gl_permute(jnp.asarray(s), jnp))
    )
    m = GL.rand(rng, (16, 3))
    assert np.array_equal(gl_ntt(m, np), np.asarray(gl_ntt(jnp.asarray(m), jnp)))
    assert np.array_equal(
        gl_intt(m, np), np.asarray(gl_intt(jnp.asarray(m), jnp))
    )
    r = GL.rand(rng, (4, 10))
    assert np.array_equal(
        gl_sponge_hash(r, np), np.asarray(gl_sponge_hash(jnp.asarray(r), jnp))
    )
    le = GL.rand(rng, (4, 4))
    ri = GL.rand(rng, (4, 4))
    assert np.array_equal(
        gl_compress(le, ri, np),
        np.asarray(gl_compress(jnp.asarray(le), jnp.asarray(ri), jnp)),
    )

"""Pallas TPU kernel for the Poseidon2 permutation (opt-in).

SURVEY.md §7.1's per-kernel path: one fused VMEM-resident kernel runs ALL
rounds on a (width, TILE) block of states — no per-round HLO round-trips,
no scan carry materialization, u32 Monty arithmetic on the VPU (the same
`Monty31.monty_mul` 16-bit-limb formulation as the jnp path, which Mosaic
lowers to vector ops).

Layout: states arrive (n, width); the wrapper transposes to
(width, n_padded) so the LANE dimension (last, 128-multiple) runs along
the batch and the width-16/24/32 state sits in sublanes — each round is
then pure elementwise/lane-local work plus cross-sublane adds.

This kernel IS the default device permutation on TPU backends:
`ops.poseidon2.permute` dispatches here for jnp inputs on TPU (bit-exact
with the scan path, which CPU keeps).  It is also exercised in
interpreter mode on CPU for bit-exactness against `ops.poseidon2.permute`
(tests/test_pallas_poseidon2.py).

Reference: the permutation itself mirrors `ops/poseidon2.py` (initial
external layer, RF/2 external, RP internal, RF/2 external rounds).
"""

from __future__ import annotations

import numpy as np

from ..fields.monty31 import U32
from .poseidon2 import Poseidon2Params, _sbox_monty

TILE = 512  # batch columns per grid step (lane dim: 4×128)


def _round_body(F, width, deg):
    """Round functions over a (width, T) Monty-form block, xp=jnp."""
    import jax.numpy as jnp

    def m4_block(s):
        # s: (width, T); M4 per 4-row chunk + cross-chunk sums
        chunks = [s[i : i + 4] for i in range(0, width, 4)]
        outs = []
        for c in chunks:
            x0, x1, x2, x3 = c[0], c[1], c[2], c[3]
            t01 = F.add(x0, x1, jnp)
            t23 = F.add(x2, x3, jnp)
            t0123 = F.add(t01, t23, jnp)
            t01123 = F.add(t0123, x1, jnp)
            t01233 = F.add(t0123, x3, jnp)
            y3 = F.add(t01233, F.double(x0, jnp), jnp)
            y1 = F.add(t01123, F.double(x2, jnp), jnp)
            y0 = F.add(t01123, t01, jnp)
            y2 = F.add(t01233, t23, jnp)
            outs.append(jnp.stack([y0, y1, y2, y3]))
        acc = outs[0]
        for o in outs[1:]:
            acc = F.add(acc, o, jnp)
        return jnp.concatenate([F.add(o, acc, jnp) for o in outs], axis=0)

    def ext_round(sm, rc_col):
        sm = F.add(sm, rc_col, jnp)
        sm = _sbox_monty(F, sm, deg, jnp)
        return m4_block(sm)

    def int_round(sm, rc0, diag_col):
        s0 = _sbox_monty(F, F.add(sm[0], rc0, jnp), deg, jnp)
        sm = jnp.concatenate([s0[None], sm[1:]], axis=0)
        total = sm[0]
        for i in range(1, width):
            total = F.add(total, sm[i], jnp)
        dx = F.monty_mul(sm, diag_col, jnp)
        return F.add(dx, total[None, :], jnp)

    return m4_block, ext_round, int_round


_FN_CACHE: dict = {}


def _pallas_perm_fn(params: Poseidon2Params, interpret: bool):
    key = (params.field.name, params.width, interpret)
    cached = _FN_CACHE.get(key)
    if cached is not None:
        return cached
    fn = _build_pallas_perm_fn(params, interpret)
    _FN_CACHE[key] = fn
    return fn


def _build_pallas_perm_fn(params: Poseidon2Params, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    F = params.field
    width = params.width
    deg = F.sbox_degree
    rf = params.full_rounds
    rp = params.partial_rounds
    rf2 = rf // 2
    rc_ext_np = np.asarray(params.rc_ext_m)  # (RF, width)
    rc_int_np = np.asarray(F.monty_array(params.rc_int)).reshape(rp, 1)
    diag_np = np.asarray(params.diag_m).reshape(width, 1)
    m4_block, ext_round, int_round = _round_body(F, width, deg)

    def kernel(x_ref, rce_ref, rci_ref, diag_ref, o_ref):
        s = x_ref[:]  # (width, TILE) canonical
        s = m4_block(s)  # initial external layer (add-only: canonical ok)
        sm = F.to_monty(s, jnp)
        diag_col = diag_ref[:]  # (width, 1)
        for r in range(rf2):
            sm = ext_round(sm, rce_ref[r, :][:, None])
        for r in range(rp):
            sm = int_round(sm, rci_ref[r, 0], diag_col)
        for r in range(rf2, rf):
            sm = ext_round(sm, rce_ref[r, :][:, None])
        o_ref[:] = F.from_monty(sm, jnp)

    @jax.jit
    def run(xt):  # (width, n_pad) canonical u32
        n_pad = xt.shape[1]
        full = lambda shape: pl.BlockSpec(  # noqa: E731
            shape, lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((width, n_pad), jnp.uint32),
            grid=(n_pad // TILE,),
            in_specs=[
                pl.BlockSpec(
                    (width, TILE),
                    lambda i: (0, i),
                    memory_space=pltpu.VMEM,
                ),
                full((rf, width)),
                full((rp, 1)),
                full((width, 1)),
            ],
            out_specs=pl.BlockSpec(
                (width, TILE), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            interpret=interpret,
        )(
            xt,
            jnp.asarray(rc_ext_np),
            jnp.asarray(rc_int_np),
            jnp.asarray(diag_np),
        )

    return run


def permute_pallas(
    params: Poseidon2Params, states, interpret: bool = False
):
    """Poseidon2 on (n, width) canonical u32 via the Pallas kernel.

    interpret=True runs the Pallas interpreter (CPU correctness path);
    on TPU pass False.
    """
    import jax.numpy as jnp

    states = jnp.asarray(states, dtype=jnp.uint32)
    n, width = states.shape
    n_pad = max(TILE, ((n + TILE - 1) // TILE) * TILE)
    xt = jnp.zeros((width, n_pad), dtype=jnp.uint32)
    xt = xt.at[:, :n].set(states.T)
    out = _pallas_perm_fn(params, interpret)(xt)
    return out[:, :n].T


def permute_pallas_nd(params: Poseidon2Params, state):
    """(..., width) wrapper used by `ops.poseidon2.permute` on TPU."""
    lead = state.shape[:-1]
    flat = state.reshape(-1, params.width)
    return permute_pallas(params, flat).reshape(lead + (params.width,))


def _build_pallas_sponge_fn(
    params: Poseidon2Params, length: int, rate: int, out: int, interpret: bool
):
    """PaddingFreeSponge over (length,)-wide rows as ONE kernel: the duplex
    state lives in VMEM across every absorb, so leaf hashing reads the
    matrix block once and writes only the digests (the per-chunk permute
    formulation round-tripped the state through HBM per chunk)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    F = params.field
    width = params.width
    deg = F.sbox_degree
    rf = params.full_rounds
    rp = params.partial_rounds
    rf2 = rf // 2
    rc_ext_np = np.asarray(params.rc_ext_m)
    rc_int_np = np.asarray(F.monty_array(params.rc_int)).reshape(rp, 1)
    diag_np = np.asarray(params.diag_m).reshape(width, 1)
    m4_block, ext_round, int_round = _round_body(F, width, deg)

    def perm(s, rce_ref, rci_ref, diag_ref):
        import jax.numpy as jnp

        s = m4_block(s)
        sm = F.to_monty(s, jnp)
        diag_col = diag_ref[:]
        for r in range(rf2):
            sm = ext_round(sm, rce_ref[r, :][:, None])
        for r in range(rp):
            sm = int_round(sm, rci_ref[r, 0], diag_col)
        for r in range(rf2, rf):
            sm = ext_round(sm, rce_ref[r, :][:, None])
        return F.from_monty(sm, jnp)

    def kernel(x_ref, rce_ref, rci_ref, diag_ref, o_ref):
        state = jnp.zeros((width, TILE), dtype=jnp.uint32)
        for start in range(0, length, rate):
            c = min(rate, length - start)
            chunk = x_ref[start : start + c, :]
            state = jnp.concatenate([chunk, state[c:]], axis=0)
            state = perm(state, rce_ref, rci_ref, diag_ref)
        o_ref[:] = state[:out]

    @jax.jit
    def run(xt):  # (length, n_pad) canonical u32
        n_pad = xt.shape[1]
        full = lambda shape: pl.BlockSpec(  # noqa: E731
            shape, lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((out, n_pad), jnp.uint32),
            grid=(n_pad // TILE,),
            in_specs=[
                pl.BlockSpec(
                    (length, TILE),
                    lambda i: (0, i),
                    memory_space=pltpu.VMEM,
                ),
                full((rf, width)),
                full((rp, 1)),
                full((width, 1)),
            ],
            out_specs=pl.BlockSpec(
                (out, TILE), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            interpret=interpret,
        )(
            xt,
            jnp.asarray(rc_ext_np),
            jnp.asarray(rc_int_np),
            jnp.asarray(diag_np),
        )

    return run


def _pallas_sponge_fn(params, length, rate, out, interpret):
    key = ("sponge", params.field.name, params.width, length, rate, out, interpret)
    cached = _FN_CACHE.get(key)
    if cached is None:
        cached = _FN_CACHE[key] = _build_pallas_sponge_fn(
            params, length, rate, out, interpret
        )
    return cached


def sponge_pallas(
    params: Poseidon2Params, rows, rate: int, out: int, interpret: bool = False
):
    """PaddingFreeSponge on (n, L) canonical u32 rows -> (n, out) digests,
    bit-identical to `ops.hashing.sponge_hash`."""
    import jax.numpy as jnp

    rows = jnp.asarray(rows, dtype=jnp.uint32)
    n, length = rows.shape
    n_pad = max(TILE, ((n + TILE - 1) // TILE) * TILE)
    xt = jnp.zeros((length, n_pad), dtype=jnp.uint32)
    xt = xt.at[:, :n].set(rows.T)
    o = _pallas_sponge_fn(params, length, rate, out, interpret)(xt)
    return o[:, :n].T

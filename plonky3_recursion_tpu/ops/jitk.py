"""Jitted device kernels for the prover hot paths.

Each factory returns a `jax.jit`-compiled function cached per static shape
signature, so repeated proofs of the same circuit reuse compiled
executables.  Bodies use the same field kernels as the numpy host path —
results are bit-identical; only the execution engine changes.  All loops
over Merkle levels / sponge chunks / NTT stages have static trip counts, and
the Poseidon2 permutation scans over rounds, keeping compiled graphs small
(important for the remote-compile TPU path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.monty31 import Monty31, U32
from ..fields.extension import BinomialExtension
from .hashing import compress_pair, sponge_hash
from .ntt import _bitrev_perm, _power_table, bit_reverse_rows, intt, ntt
from .poseidon2 import poseidon2_params


@functools.lru_cache(maxsize=None)
def merkle_commit_fn(field: Monty31, shapes: tuple):
    """shapes: tuple of (height, width).  fn(*mats) -> tuple of digest
    layers (layer 0 = leaves, last = root layer)."""
    params = poseidon2_params(field, 16)
    heights = sorted({h for h, _w in shapes}, reverse=True)

    def fn(*mats):
        by_height: dict[int, list] = {}
        for (h, _w), m in zip(shapes, mats):
            by_height.setdefault(h, []).append(m)

        def rows_digest(h):
            rows = jnp.concatenate(by_height[h], axis=1)
            return sponge_hash(params, rows, 8, 8, jnp)

        h = heights[0]
        layer = rows_digest(h)
        layers = [layer]
        while h > 1:
            h //= 2
            layer = compress_pair(params, layer[0::2], layer[1::2], jnp)
            if h in by_height:
                layer = compress_pair(params, layer, rows_digest(h), jnp)
            layers.append(layer)
        return tuple(layers)

    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def lde_commit_fn(
    field: Monty31, log_n: int, width: int, log_blowup: int, shift: int
):
    """fn(evals (2^log_n, w)) -> (coeffs, bit-reversed LDE on g·K)."""
    n = 1 << log_n
    m = n << log_blowup
    p = field.P
    inv_s = pow(int(shift), p - 2, p)
    unscale = None if shift == 1 else _power_table(field, inv_s, n)
    gpow = _power_table(field, int(field.generator), n)

    def fn(evals):
        coeffs = intt(field, evals, jnp)
        if unscale is not None:
            coeffs = field.monty_mul(coeffs, jnp.asarray(unscale)[:, None], jnp)
        scaled = field.monty_mul(coeffs, jnp.asarray(gpow)[:, None], jnp)
        lde = ntt(field, jnp.pad(scaled, [(0, m - n), (0, 0)]), jnp)
        return coeffs, bit_reverse_rows(lde, jnp)

    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def round_commit_fn(field: Monty31, sig: tuple, log_blowup: int):
    """Fused whole-round commit: every matrix's interpolation + LDE + the
    full Merkle tree in ONE compiled graph (one device round-trip).

    sig: tuple of (shift, log_n, width).  fn(*evals) ->
    (coeffs tuple, ldes tuple (bitrev), layers tuple)."""
    p = field.P
    params = poseidon2_params(field, 16)
    pre = []
    for shift, log_n, w in sig:
        n = 1 << log_n
        unscale = (
            None
            if shift == 1
            else _power_table(field, pow(int(shift), p - 2, p), n)
        )
        gpow = _power_table(field, int(field.generator), n)
        pre.append((shift, log_n, w, unscale, gpow))

    def fn(*mats):
        coeffs_out = []
        ldes = []
        for (shift, log_n, w, unscale, gpow), evals in zip(pre, mats):
            n = 1 << log_n
            m = n << log_blowup
            coeffs = intt(field, evals, jnp)
            if unscale is not None:
                coeffs = field.monty_mul(
                    coeffs, jnp.asarray(unscale)[:, None], jnp
                )
            scaled = field.monty_mul(coeffs, jnp.asarray(gpow)[:, None], jnp)
            lde = ntt(field, jnp.pad(scaled, [(0, m - n), (0, 0)]), jnp)
            lde = bit_reverse_rows(lde, jnp)
            coeffs_out.append(coeffs)
            ldes.append(lde)
        # merkle over the LDEs (mixed heights)
        by_height: dict[int, list] = {}
        for l in ldes:
            by_height.setdefault(l.shape[0], []).append(l)

        def rows_digest(h):
            rows = jnp.concatenate(by_height[h], axis=1)
            return sponge_hash(params, rows, 8, 8, jnp)

        h = max(by_height)
        layer = rows_digest(h)
        layers = [layer]
        while h > 1:
            h //= 2
            layer = compress_pair(params, layer[0::2], layer[1::2], jnp)
            if h in by_height:
                layer = compress_pair(params, layer, rows_digest(h), jnp)
            layers.append(layer)
        return tuple(coeffs_out), tuple(ldes), tuple(layers)

    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def gather_rows_fn(n_rows: int, width: int, n_idx: int):
    """fn(mat (n, w), idx (nq,)) -> (nq, w) — one batched device gather."""

    def fn(mat, idx):
        return mat[idx]

    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def eval_at_point_fn(field: Monty31, d: int, log_n: int, width: int):
    """fn(coeffs (n, w), zeta (D,)) -> (w, D) p(ζ) per column."""
    from ..fields.extension import ext_field
    from ..utils import ext_powers, modsum

    E = ext_field(field, d)
    n = 1 << log_n

    def fn(coeffs, zeta):
        pows = ext_powers(E, zeta, n, jnp)
        outs = []
        for dd in range(d):
            pm = field.to_monty(pows[:, dd], jnp)
            prod = field.monty_mul(coeffs, pm[:, None], jnp)
            outs.append(modsum(field, prod, 0, jnp))
        return jnp.stack(outs, axis=-1)

    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def fri_reduce_fn(field: Monty31, d: int, log_h: int, width: int):
    """fn(lde (H, w) bitrev, z (D,), y_red (D,), apow (w, D)) ->
    Σ_c apow_c·p_c(x) − y_red, divided by (x − z), over all H rows."""
    from ..fields.extension import ext_field
    from ..stark.domains import domain_points
    from ..utils import reduce_matrix_ext

    E = ext_field(field, d)
    h = 1 << log_h
    x_br = domain_points(field, log_h, int(field.generator))[_bitrev_perm(h)]

    def fn(lde, z, y_red, apow):
        num_red = reduce_matrix_ext(field, E, lde, apow, jnp)
        xs = jnp.asarray(x_br)
        zx = E.sub(E.from_base(xs, jnp), jnp.broadcast_to(z, (h, d)), jnp)
        inv_zx = E.inv(zx, jnp)
        diff = E.sub(num_red, jnp.broadcast_to(y_red, (h, d)), jnp)
        return E.mul(diff, inv_zx, jnp)

    return jax.jit(fn)


_QUOTIENT_CACHE: dict = {}


def quotient_fn(key: tuple, make):
    """Compiled per-instance quotient evaluator, cached by a stable AIR/
    shape key.  `make()` builds the jitted fn on first use."""
    fn = _QUOTIENT_CACHE.get(key)
    if fn is None:
        fn = _QUOTIENT_CACHE[key] = jax.jit(make())
    return fn


_PERM_CACHE: dict = {}


def perm_cols_fn(key: tuple, make):
    fn = _PERM_CACHE.get(key)
    if fn is None:
        fn = _PERM_CACHE[key] = jax.jit(make())
    return fn


@functools.lru_cache(maxsize=None)
def fri_fold_fn(field: Monty31, d: int, log_size: int, shift: int):
    """One β-fold of an ext codeword in bitrev order: fn(folded (2^k, D),
    beta (D,)) -> (2^(k-1), D)."""
    from ..fields.extension import ext_field
    from ..stark.fri_pcs import _fold_consts

    E = ext_field(field, d)
    _x, inv_2x = _fold_consts(field, log_size, shift)
    inv2 = field.monty_constant(pow(2, field.P - 2, field.P))

    def fn(folded, beta):
        a = folded[0::2]
        b = folded[1::2]
        s = E.add(a, b, jnp)
        dd = E.sub(a, b, jnp)
        even = field.monty_mul(s, jnp.asarray(inv2), jnp)
        odd = E.mul_base(dd, jnp.asarray(inv_2x), jnp)
        return E.add(
            even, E.mul(odd, jnp.broadcast_to(beta, odd.shape), jnp), jnp
        )

    return jax.jit(fn)

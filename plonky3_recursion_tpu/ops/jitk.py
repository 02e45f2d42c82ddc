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


def merkle_layer_heights(shapes: tuple) -> list:
    """Digest-layer heights (leaf first) for a mixed-height commit."""
    hs = sorted({h for h, _w in shapes}, reverse=True)
    out = [hs[0]]
    h = hs[0]
    while h > 1:
        h //= 2
        out.append(h)
    return out


@functools.lru_cache(maxsize=None)
def merkle_commit_flat_fn(field: Monty31, shapes: tuple):
    """Like `merkle_commit_fn` but returns ONE device array: every digest
    layer concatenated (leaf layer first) — a single host download (or
    none: the query path gathers siblings straight off the device)."""
    inner = merkle_commit_fn(field, shapes)

    def fn(*mats):
        return jnp.concatenate(list(inner(*mats)), axis=0)

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
        # digest layers concatenated: stays DEVICE-RESIDENT (queries gather
        # siblings off the device; no bulk tree download)
        return tuple(coeffs_out), tuple(ldes), jnp.concatenate(layers, axis=0)

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


@functools.lru_cache(maxsize=None)
def eval_points_all_fn(field: Monty31, d: int, sig: tuple):
    """EVERY claimed opening of an `open` call in ONE device program.

    sig: per committed matrix (log_n, width, z_idxs tuple).
    fn(zs (nz, D), *coeffs) -> one (Σ widths·points, D) array — a single
    download replaces one call + one download per (matrix, point).
    """
    from ..fields.extension import ext_field
    from ..utils import ext_powers, modsum

    E = ext_field(field, d)

    def fn(zs, *coeffs_list):
        pow_cache: dict = {}
        outs = []
        for (log_n, w, z_idxs), coeffs in zip(sig, coeffs_list):
            n = 1 << log_n
            for zi in z_idxs:
                key = (zi, log_n)
                pows = pow_cache.get(key)
                if pows is None:
                    pows = ext_powers(E, zs[zi], n, jnp)
                    pow_cache[key] = pows
                cols = []
                for dd in range(d):
                    pm = field.to_monty(pows[:, dd], jnp)
                    prod = field.monty_mul(coeffs, pm[:, None], jnp)
                    cols.append(modsum(field, prod, 0, jnp))
                outs.append(jnp.stack(cols, axis=-1))  # (w, D)
        return jnp.concatenate(outs, axis=0)

    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def fri_reduce_all_fn(field: Monty31, d: int, sig: tuple):
    """Every per-height reduced-opening accumulator in ONE device program.

    sig: per (matrix, point) term (log_h, width, z_idx, apow_offset),
    heights descending overall.  fn(zs, y_reds (n_terms, D),
    apows (total, D), *ldes) -> tuple of per-distinct-height (H, D)
    accumulators (device-resident, feed the fold chain).
    """
    from ..fields.extension import ext_field
    from ..stark.domains import domain_points
    from ..utils import reduce_matrix_ext

    E = ext_field(field, d)
    heights = sorted({log_h for log_h, _w, _z, _o in sig}, reverse=True)

    def fn(zs, y_reds, apows, *ldes):
        acc: dict[int, object] = {}
        xs_cache: dict = {}
        for ti, ((log_h, w, zi, off), lde) in enumerate(zip(sig, ldes)):
            h = 1 << log_h
            xs = xs_cache.get(log_h)
            if xs is None:
                xs = jnp.asarray(
                    domain_points(field, log_h, int(field.generator))[
                        _bitrev_perm(h)
                    ]
                )
                xs_cache[log_h] = xs
            num_red = reduce_matrix_ext(
                field, E, lde, apows[off : off + w], jnp
            )
            zx = E.sub(
                E.from_base(xs, jnp),
                jnp.broadcast_to(zs[zi], (h, d)),
                jnp,
            )
            diff = E.sub(
                num_red, jnp.broadcast_to(y_reds[ti], (h, d)), jnp
            )
            term = E.mul(diff, E.inv(zx, jnp), jnp)
            acc[log_h] = (
                term if log_h not in acc else E.add(acc[log_h], term, jnp)
            )
        return tuple(acc[lh] for lh in heights)

    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def fri_phase_fold_fn(
    field: Monty31,
    d: int,
    log_size: int,
    arity: int,
    shift: int,
    has_rollin: bool,
):
    """One FRI phase's full fold: `arity` radix-2 β-folds (β, β², …) plus
    the optional roll-in add, fused into one device call."""
    from ..fields.extension import ext_field
    from ..stark.fri_pcs import _fold_consts

    E = ext_field(field, d)
    inv2 = field.monty_constant(pow(2, field.P - 2, field.P))
    consts = []
    s = shift
    for t in range(arity):
        _x, inv_2x = _fold_consts(field, log_size - t, s)
        consts.append(inv_2x)
        s = s * s % field.P

    def fn(folded, beta, *rollin):
        beta_t = beta
        for t in range(arity):
            a = folded[0::2]
            b = folded[1::2]
            ssum = E.add(a, b, jnp)
            dd = E.sub(a, b, jnp)
            even = field.monty_mul(ssum, jnp.asarray(inv2), jnp)
            odd = E.mul_base(dd, jnp.asarray(consts[t]), jnp)
            folded = E.add(
                even,
                E.mul(odd, jnp.broadcast_to(beta_t, odd.shape), jnp),
                jnp,
            )
            beta_t = E.mul(beta_t, beta_t, jnp)
        if has_rollin:
            folded = E.add(folded, rollin[0], jnp)
        return folded

    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def gather_rows_concat_fn(sig: tuple, n_idx: int):
    """Batched query-row gathers for MANY matrices in ONE device program.

    sig: tuple of (height, width) per matrix.  fn(idx (n_mats, n_idx),
    *mats) -> (n_idx, Σ widths) concatenation — one download for every
    opened row of a round."""

    def fn(idx, *mats):
        outs = []
        for mi, ((h, w), m) in enumerate(zip(sig, mats)):
            outs.append(m[idx[mi]])
        return jnp.concatenate(outs, axis=1)

    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def sibling_gather_fn(n_idx: int, width: int = 8):
    """fn(flat_layers (L, 8), idx (n_idx,)) -> (n_idx, 8): every Merkle
    sibling digest of a tree's query set in one gather."""

    def fn(flat, idx):
        return flat[idx]

    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def sibling_gather_all_fn(counts: tuple):
    """Every tree's sibling gathers in ONE device call: fn(idx0, flat0,
    idx1, flat1, ...) -> (Σ counts, 8) concatenation (one download)."""

    def fn(*args):
        outs = []
        for i in range(0, len(args), 2):
            idx, flat = args[i], args[i + 1]
            outs.append(flat[idx])
        return jnp.concatenate(outs, axis=0)

    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def fri_phase_chain_fn(
    field: Monty31,
    d: int,
    log_max: int,
    schedule: tuple,
    rollin_flags: tuple,
    start_shift: int,
):
    """The ENTIRE FRI commit phase as one device program, transcript
    included: per phase, Merkle-commit the folded codeword, absorb the
    root into the duplex state (overwrite + permute — exactly the host
    DuplexChallenger discipline), sample β from the permuted rate, run the
    phase's radix-2 folds, and add the roll-in.  Eliminates one
    host<->device round-trip per phase; the host challenger state is
    synced once from the returned final state.  Only valid when
    commit_pow_bits == 0 (grinding forces host sequencing).

    fn(state (16,), folded (2^log_max, D), *rollins) ->
      (final_state, final_folded, roots (n_phases, 8),
       (phase rows...), (phase layer flats...))
    """
    from ..fields.extension import ext_field
    from ..stark.fri_pcs import _fold_consts

    E = ext_field(field, d)
    params = poseidon2_params(field, 16)
    inv2 = field.monty_constant(pow(2, field.P - 2, field.P))
    # per-phase fold constants
    consts = []
    shift = start_shift
    log_size = log_max
    for a in schedule:
        per = []
        s = shift
        for t in range(a):
            _x, inv_2x = _fold_consts(field, log_size - t, s)
            per.append(inv_2x)
            s = s * s % field.P
        consts.append(per)
        shift = s
        log_size -= a

    def fn(state, folded, *rollins):
        from .poseidon2 import permute

        roots = []
        rows_out = []
        flats_out = []
        ri = 0
        ls = log_max
        for ph, a in enumerate(schedule):
            group = 1 << a
            rows = folded.reshape((1 << ls) >> a, group * d)
            # single-matrix Merkle tree
            layer = sponge_hash(params, rows, 8, 8, jnp)
            layers = [layer]
            h = layer.shape[0]
            while h > 1:
                layer = compress_pair(params, layer[0::2], layer[1::2], jnp)
                layers.append(layer)
                h //= 2
            root = layers[-1][0]
            roots.append(root)
            rows_out.append(rows)
            flats_out.append(jnp.concatenate(layers, axis=0))
            # duplex: overwrite rate slots with the root, permute, β = rate[:D]
            state = state.at[:8].set(root)
            state = permute(params, state[None, :], jnp)[0]
            beta_t = state[:d]
            # phase folds
            for t in range(a):
                aa = folded[0::2]
                bb = folded[1::2]
                ssum = E.add(aa, bb, jnp)
                dd = E.sub(aa, bb, jnp)
                even = field.monty_mul(ssum, jnp.asarray(inv2), jnp)
                odd = E.mul_base(dd, jnp.asarray(consts[ph][t]), jnp)
                folded = E.add(
                    even,
                    E.mul(odd, jnp.broadcast_to(beta_t, odd.shape), jnp),
                    jnp,
                )
                beta_t = E.mul(beta_t, beta_t, jnp)
            ls -= a
            if rollin_flags[ph]:
                folded = E.add(folded, rollins[ri], jnp)
                ri += 1
        return (
            state,
            folded,
            jnp.stack(roots),
            tuple(rows_out),
            tuple(flats_out),
        )

    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def grind_fn(field: Monty31, k: int, bits: int, batch: int):
    """Vectorized PoW grind on device: try `batch` witness candidates in
    one call, return the smallest hit (or `batch` when none).

    k: current input-buffer length (prefix overwrites state[:k], the
    candidate goes at slot k — exactly the host duplex discipline)."""
    params = poseidon2_params(field, 16)
    mask = (1 << bits) - 1

    def fn(state, prefix, start):
        from .poseidon2 import permute

        cand = (
            (start.astype(jnp.uint32) + jnp.arange(batch, dtype=jnp.uint32))
            % field.P
        )
        states = jnp.broadcast_to(state, (batch, 16))
        if k:
            states = states.at[:, :k].set(
                jnp.broadcast_to(prefix, (batch, k))
            )
        states = states.at[:, k].set(cand)
        out = permute(params, states, jnp)
        hit = (out[:, 0] & mask) == 0
        idx = jnp.argmax(hit)
        return jnp.where(hit[idx], cand[idx], jnp.uint32(0)), hit[idx]

    return jax.jit(fn)

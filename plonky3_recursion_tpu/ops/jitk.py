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
from .hashing import compress_pair, merkle_layers, sponge_hash
from .ntt import (
    _bitrev_perm,
    _power_table,
    bit_reverse_rows,
    intt,
    ntt,
    ntt_bitrev,
    ntt_tables,
)
from .poseidon2 import poseidon2_params

# ----- device-resident constant tables -----
#
# Twiddle tables, bit-reversal permutations, power tables and selector
# columns are ~n-element arrays.  Embedding them as HLO literals (the
# obvious `jnp.asarray(const)` inside a jit body) made every fused prover
# program tens of MB of HLO and pushed XLA compile times to minutes per
# program.  Instead each factory uploads its tables ONCE (cached below) and
# passes them through the jit boundary as runtime arguments.

_DEV_CONSTS: dict = {}


def mesh_row_sharder(mesh, axis: str = "rows", min_rows_per_dev: int = 32):
    """Row-sharding annotator for jit bodies: identity when mesh is None;
    otherwise constrains axis 0 over the mesh.  Only tensors with at least
    `min_rows_per_dev` rows per device are sharded — small intermediates
    stay replicated, so GSPMD doesn't pepper the program with tiny
    collectives (measured: sharding everything divisible made the fused
    layer program emit >10k sub-group collectives, pathological compile
    times, and CPU-mesh rendezvous timeouts; the large NTT/Merkle/
    quotient tensors carry all the actual scaling work)."""
    if mesh is None:
        return lambda arr: arr
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_dev = mesh.devices.size
    min_rows = n_dev * min_rows_per_dev

    def shard(arr):
        if arr.shape[0] < min_rows or arr.shape[0] % n_dev:
            return arr
        return jax.lax.with_sharding_constraint(
            arr,
            NamedSharding(mesh, P(axis, *([None] * (arr.ndim - 1)))),
        )

    return shard


def _dev(arr: np.ndarray):
    got = _DEV_CONSTS.get(id(arr))
    if got is None:
        got = jax.device_put(np.ascontiguousarray(arr))
        _DEV_CONSTS[id(arr)] = got
        _DEV_CONSTS[("keep", id(arr))] = arr  # pin: ids must stay unique
    return got


def _dev_ntt(field: Monty31, log_n: int, inverse: bool):
    """NTT stage tables (bitrev perm + per-stage twiddles), device-resident
    and shared across every program transforming this size.  The unrolled
    reshape-based stages are used — a scan-over-stages gather formulation
    compiled marginally faster but ran ~50x slower (row gathers of wide
    matrices are a slow path on TPU; reshape/concat stages stream at
    memory speed)."""
    perm, stages = ntt_tables(field, log_n, inverse)
    return (_dev(perm), tuple(_dev(s) for s in stages))


def _dev_bitrev(n: int):
    return _dev(_bitrev_perm(n))


def _use_pallas_ntt(log_n: int) -> bool:
    """Big device NTTs run the VMEM-resident Pallas kernel on real TPU
    backends (bit-identical; ~10x the staged XLA path, which pays
    log2(N) HBM passes over a lane-padded buffer).  CPU backends (tests,
    mesh dryruns) keep the portable path.  Disable with
    P3_NO_PALLAS_NTT=1."""
    import os

    if log_n < 14 or os.environ.get("P3_NO_PALLAS_NTT"):
        return False
    from .poseidon2 import _use_pallas

    return _use_pallas()


def _dev_ntt_auto(
    field: Monty31, log_n: int, inverse: bool, allow_pallas: bool = True
):
    """`_dev_ntt`, but selects the Pallas-kernel table format (a dict —
    `ntt`/`ntt_bitrev` dispatch on it) for large transforms on TPU.
    allow_pallas=False forces the portable path (mesh/GSPMD programs:
    pallas_call does not partition under sharding constraints)."""
    if not allow_pallas or not _use_pallas_ntt(log_n):
        return _dev_ntt(field, log_n, inverse)
    from .pallas_ntt import pallas_ntt_tables

    tabs = pallas_ntt_tables(field, log_n, inverse)
    return {
        k: (tuple(_dev(a) for a in v) if isinstance(v, tuple) else _dev(v))
        for k, v in tabs.items()
    }


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

        leaf = rows_digest(heights[0])
        inject = {h: rows_digest(h) for h in heights[1:]}
        return tuple(merkle_layers(params, leaf, jnp, inject))

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

    def fn(evals, consts):
        unscale_d, gpow_d, intt_t, ntt_t, br = consts
        coeffs = intt(field, evals, jnp, tables=intt_t)
        if unscale_d is not None:
            coeffs = field.monty_mul(coeffs, unscale_d[:, None], jnp)
        scaled = field.monty_mul(coeffs, gpow_d[:, None], jnp)
        lde = ntt_bitrev(
            field,
            jnp.pad(scaled, [(0, m - n), (0, 0)]),
            jnp,
            tables=ntt_t,
            br=br,
        )
        return coeffs, lde

    jfn = jax.jit(fn)
    consts = (
        None if unscale is None else _dev(unscale),
        _dev(gpow),
        _dev_ntt_auto(field, log_n, True),
        _dev_ntt_auto(field, log_n + log_blowup, False),
        _dev_bitrev(m),
    )
    return lambda evals: jfn(evals, consts)


@functools.lru_cache(maxsize=None)
def round_commit_fn(
    field: Monty31,
    sig: tuple,
    log_blowup: int,
    mesh=None,
    mesh_axis: str = "rows",
):
    """Fused whole-round commit: every matrix's interpolation + LDE + the
    full Merkle tree in ONE compiled graph (one device round-trip).

    sig: tuple of (shift, log_n, width).  fn(*evals) ->
    (coeffs tuple, ldes tuple (bitrev), layers tuple).

    mesh: rows of every LDE/digest layer carry sharding constraints over
    the mesh axis — GSPMD turns the same graph into the multi-chip commit
    (NTT all_to_alls + Merkle all_gathers inserted by XLA)."""
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
        pre.append(
            (
                log_n,
                (
                    None if unscale is None else _dev(unscale),
                    _dev(gpow),
                    _dev_ntt_auto(field, log_n, True, mesh is None),
                    _dev_ntt_auto(
                        field, log_n + log_blowup, False, mesh is None
                    ),
                    _dev_bitrev(n << log_blowup),
                ),
            )
        )
    all_consts = tuple(c for _ln, c in pre)
    shard = mesh_row_sharder(mesh, mesh_axis)

    def fn(consts, *mats):
        coeffs_out = []
        ldes = []
        for ((log_n, _c), evals, cc) in zip(pre, mats, consts):
            unscale_d, gpow_d, intt_t, ntt_t, br = cc
            n = 1 << log_n
            m = n << log_blowup
            coeffs = intt(field, shard(evals), jnp, tables=intt_t)
            if unscale_d is not None:
                coeffs = field.monty_mul(coeffs, unscale_d[:, None], jnp)
            scaled = field.monty_mul(coeffs, gpow_d[:, None], jnp)
            lde = ntt_bitrev(
                field,
                jnp.pad(scaled, [(0, m - n), (0, 0)]),
                jnp,
                tables=ntt_t,
                br=br,
            )
            coeffs_out.append(coeffs)
            ldes.append(shard(lde))
        # merkle over the LDEs (mixed heights)
        by_height: dict[int, list] = {}
        for l in ldes:
            by_height.setdefault(l.shape[0], []).append(l)

        def rows_digest(h):
            rows = jnp.concatenate(by_height[h], axis=1)
            return shard(sponge_hash(params, rows, 8, 8, jnp))

        hs = sorted(by_height, reverse=True)
        leaf = rows_digest(hs[0])
        inject = {h: rows_digest(h) for h in hs[1:]}
        layers = merkle_layers(params, leaf, jnp, inject)
        # digest layers concatenated: stays DEVICE-RESIDENT (queries gather
        # siblings off the device; no bulk tree download)
        return tuple(coeffs_out), tuple(ldes), jnp.concatenate(layers, axis=0)

    jfn = jax.jit(fn)
    return lambda *mats: jfn(all_consts, *mats)


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

    def fn(lde, z, y_red, apow, xs):
        num_red = reduce_matrix_ext(field, E, lde, apow, jnp)
        zx = E.sub(E.from_base(xs, jnp), jnp.broadcast_to(z, (h, d)), jnp)
        inv_zx = E.inv(zx, jnp)
        diff = E.sub(num_red, jnp.broadcast_to(y_red, (h, d)), jnp)
        return E.mul(diff, inv_zx, jnp)

    jfn = jax.jit(fn)
    xs_d = _dev(x_br)
    return lambda lde, z, y_red, apow: jfn(lde, z, y_red, apow, xs_d)


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

    def fn(folded, beta, inv_2x_d):
        a = folded[0::2]
        b = folded[1::2]
        s = E.add(a, b, jnp)
        dd = E.sub(a, b, jnp)
        even = field.monty_mul(s, jnp.asarray(inv2), jnp)
        odd = E.mul_base(dd, inv_2x_d, jnp)
        return E.add(
            even, E.mul(odd, jnp.broadcast_to(beta, odd.shape), jnp), jnp
        )

    jfn = jax.jit(fn)
    inv_2x_d = _dev(inv_2x)
    return lambda folded, beta: jfn(folded, beta, inv_2x_d)


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
    xs_by_h = {
        log_h: _dev(
            domain_points(field, log_h, int(field.generator))[
                _bitrev_perm(1 << log_h)
            ]
        )
        for log_h in heights
    }

    def fn(zs, y_reds, apows, xs_map, *ldes):
        acc: dict[int, object] = {}
        for ti, ((log_h, w, zi, off), lde) in enumerate(zip(sig, ldes)):
            h = 1 << log_h
            xs = xs_map[str(log_h)]
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

    jfn = jax.jit(fn)
    xs_map = {str(lh): xs for lh, xs in xs_by_h.items()}
    return lambda zs, y_reds, apows, *ldes: jfn(
        zs, y_reds, apows, xs_map, *ldes
    )


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
        consts.append(_dev(inv_2x))
        s = s * s % field.P
    consts = tuple(consts)

    def fn(folded, beta, consts_d, *rollin):
        beta_t = beta
        for t in range(arity):
            a = folded[0::2]
            b = folded[1::2]
            ssum = E.add(a, b, jnp)
            dd = E.sub(a, b, jnp)
            even = field.monty_mul(ssum, jnp.asarray(inv2), jnp)
            odd = E.mul_base(dd, consts_d[t], jnp)
            folded = E.add(
                even,
                E.mul(odd, jnp.broadcast_to(beta_t, odd.shape), jnp),
                jnp,
            )
            beta_t = E.mul(beta_t, beta_t, jnp)
        if has_rollin:
            folded = E.add(folded, rollin[0], jnp)
        return folded

    jfn = jax.jit(fn)
    return lambda folded, beta, *rollin: jfn(folded, beta, consts, *rollin)


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
    # per-phase fold constants (device-resident args, not HLO literals)
    consts_d = []
    shift = start_shift
    log_size = log_max
    for a in schedule:
        per = []
        s = shift
        for t in range(a):
            _x, inv_2x = _fold_consts(field, log_size - t, s)
            per.append(_dev(inv_2x))
            s = s * s % field.P
        consts_d.append(tuple(per))
        shift = s
        log_size -= a
    consts_d = tuple(consts_d)

    def fn(state, folded, consts, *rollins):
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
            layers = merkle_layers(
                params, sponge_hash(params, rows, 8, 8, jnp), jnp
            )
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
                odd = E.mul_base(dd, consts[ph][t], jnp)
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

    jfn = jax.jit(fn)
    return lambda state, folded, *rollins: jfn(
        state, folded, consts_d, *rollins
    )


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

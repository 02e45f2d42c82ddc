"""Radix-2 NTT / inverse NTT / coset LDE over Monty31 fields.

TPU-native equivalent of the reference's upstream `p3-dft`
(`Radix2DitParallel`; SURVEY.md §2.6).  Batched column-wise transforms:
arrays are (N, C) row-major trace matrices, the transform runs down axis 0
independently for each of the C columns — C carries the vector parallelism.

Layout conventions (shared with the FRI PCS):
* `ntt`/`intt` consume and produce NATURAL order.
* Committed LDE evaluations are stored in BIT-REVERSED row order
  (`bit_reverse_rows`), so FRI's fold partners (x, -x) sit adjacent — same
  convention the reference inherits from `p3-fri`/`p3-matrix`.

All butterflies are one monty_mul (twiddles pre-scaled to Monty form) plus a
field add/sub; a full transform is log2(N) fused elementwise stages.
"""

from __future__ import annotations

import functools

import numpy as np

from ..fields.monty31 import Monty31, U32


@functools.lru_cache(maxsize=None)
def _bitrev_perm(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros_like(idx)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


def bit_reverse_rows(x, xp, perm=None):
    """perm: optional pre-uploaded bitrev permutation (a traced/device array
    inside jit bodies — large index literals embedded in HLO slow XLA's
    compile dramatically on the TPU path, so jitted callers pass it in)."""
    if perm is None:
        perm = _bitrev_perm(x.shape[0])
        if xp is not np:
            perm = xp.asarray(perm)
    return x[perm]


@functools.lru_cache(maxsize=None)
def _stage_twiddles(field: Monty31, log_n: int, inverse: bool) -> tuple:
    """Monty-form twiddle tables per DIT stage (natural-order output).

    Stage s (s=1..log_n) combines blocks of size 2^s; twiddles are
    w_{2^s}^j, j in [0, 2^(s-1)), with w the 2^s-th root (or its inverse).
    """
    p = field.P
    out = []
    for s in range(1, log_n + 1):
        m = 1 << s
        w = field.two_adic_generator(s)
        if inverse:
            w = pow(w, p - 2, p)
        tw = [1] * (m // 2)
        for j in range(1, m // 2):
            tw[j] = tw[j - 1] * w % p
        out.append(field.monty_array(tw))
    return tuple(out)


def ntt_tables(field: Monty31, log_n: int, inverse: bool) -> tuple:
    """Host-side constant tables one `ntt` call needs: (bitrev perm,
    per-stage twiddles).  Jitted callers upload these once (see
    `ops.jitk._dev`) and pass them through the jit boundary as runtime
    args — embedding ~n-element literals per NTT instance made XLA
    compiles of the fused prover programs minutes-long."""
    return (
        _bitrev_perm(1 << log_n),
        _stage_twiddles(field, log_n, inverse),
    )


@functools.lru_cache(maxsize=None)
def ntt_scan_tables(field: Monty31, log_n: int, inverse: bool) -> tuple:
    """Uniform-shape stage tables for the SCANNED device NTT: every DIT
    stage becomes gather(a) / gather(b) → butterfly → gather(out), so the
    whole transform is ONE `lax.scan` body for XLA to compile instead of
    log2(n) distinct unrolled stages.  Returns (bitrev_perm (n,),
    a_idx (L, n/2), b_idx (L, n/2), inv_perm (L, n), tw (L, n/2))."""
    n = 1 << log_n
    stages = _stage_twiddles(field, log_n, inverse)
    a_idx = np.empty((log_n, n // 2), dtype=np.int32)
    b_idx = np.empty((log_n, n // 2), dtype=np.int32)
    inv_perm = np.empty((log_n, n), dtype=np.int32)
    tw = np.empty((log_n, n // 2), dtype=np.uint32)
    for s in range(1, log_n + 1):
        m = 1 << s
        half = m // 2
        blocks = n // m
        j = np.arange(half, dtype=np.int32)
        blk = np.arange(blocks, dtype=np.int32)[:, None]
        p = (blk * m + j).reshape(-1)  # (n/2,)
        rank = (blk * half + j).reshape(-1)
        a_idx[s - 1] = p
        b_idx[s - 1] = p + half
        inv = np.empty(n, dtype=np.int32)
        inv[p] = rank
        inv[p + half] = n // 2 + rank
        inv_perm[s - 1] = inv
        tw[s - 1] = np.tile(stages[s - 1], blocks)
    return _bitrev_perm(n), a_idx, b_idx, inv_perm, tw


def ntt_scanned(field: Monty31, x, xp, tables):
    """Bit-identical to `ntt` but with all stages in one lax.scan (jnp
    only); `tables` from `ntt_scan_tables`, passed through the jit
    boundary as runtime args."""
    from jax import lax

    n = x.shape[0]
    perm, a_idx, b_idx, inv_perm, tw = tables
    if n == 1:
        return x
    x = x[perm]
    trailing = (1,) * (x.ndim - 1)

    def stage(xc, inp):
        ai, bi, ip, tws = inp
        a = xc[ai]
        b = xc[bi]
        t = field.monty_mul(b, tws.reshape((n // 2,) + trailing), xp)
        out = xp.concatenate(
            [field.add(a, t, xp), field.sub(a, t, xp)], axis=0
        )
        return out[ip], None

    x, _ = lax.scan(stage, x, (a_idx, b_idx, inv_perm, tw))
    return x


def ntt_scanned_inv_scale(field: Monty31, x, xp):
    n = x.shape[0]
    n_inv_m = field.monty_constant(pow(n, field.P - 2, field.P))
    return field.monty_mul(x, xp.asarray(n_inv_m), xp)


def ntt(field: Monty31, x, xp, inverse: bool = False, tables=None):
    """In-order radix-2 DIT NTT down axis 0 of (N, ...) canonical u32.

    `tables` may be a dict (from `ops.pallas_ntt.pallas_ntt_tables`,
    pre-built for this (log_n, inverse)): the transform then runs as the
    VMEM-resident Pallas kernel (TPU only; bit-identical)."""
    n = x.shape[0]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n, "NTT length must be a power of two"
    if n == 1:
        return x
    if isinstance(tables, dict):
        from .pallas_ntt import ntt_pallas

        return ntt_pallas(field, x, inverse=inverse, tables=tables)
    if tables is not None and len(tables) == 5:
        x = ntt_scanned(field, x, xp, tables)
        if inverse:
            x = ntt_scanned_inv_scale(field, x, xp)
        return x
    if tables is None:
        perm, stages = ntt_tables(field, log_n, inverse)
        if xp is not np:
            perm = xp.asarray(perm)
            stages = tuple(xp.asarray(s) for s in stages)
    else:
        perm, stages = tables
    x = bit_reverse_rows(x, xp, perm)
    trailing = x.shape[1:]
    for s in range(1, log_n + 1):
        m = 1 << s
        half = m // 2
        tw = stages[s - 1]  # (half,)
        blocks = x.reshape((n // m, m) + trailing)
        a = blocks[:, :half]
        b = blocks[:, half:]
        tw_b = tw.reshape((1, half) + (1,) * len(trailing))
        t = field.monty_mul(b, tw_b, xp)
        x = xp.concatenate(
            [field.add(a, t, xp), field.sub(a, t, xp)], axis=1
        ).reshape((n,) + trailing)
    if inverse:
        n_inv_m = field.monty_constant(pow(n, field.P - 2, field.P))
        x = field.monty_mul(x, xp.asarray(n_inv_m), xp)
    return x


def intt(field: Monty31, x, xp, tables=None):
    return ntt(field, x, xp, inverse=True, tables=tables)


def ntt_bitrev(field: Monty31, x, xp, tables=None, br=None):
    """Forward NTT with BIT-REVERSED row output (commitment layout).

    With Pallas (dict) tables the bitrev is composed into the kernel's
    output gather for free; otherwise it is the usual extra gather pass
    (`br`: optional pre-uploaded bitrev permutation)."""
    if isinstance(tables, dict):
        from .pallas_ntt import ntt_pallas

        return ntt_pallas(field, x, tables=tables, out_order="bitrev")
    return bit_reverse_rows(ntt(field, x, xp, tables=tables), xp, br)


@functools.lru_cache(maxsize=None)
def _power_table(field: Monty31, base: int, n: int) -> np.ndarray:
    """[base^0, ..., base^(n-1)] in Monty form."""
    p = field.P
    vals = [1] * n
    for i in range(1, n):
        vals[i] = vals[i - 1] * base % p
    return field.monty_array(vals)


def coset_lde(
    field: Monty31,
    evals,
    log_blowup: int,
    xp,
    shift: int | None = None,
    bitrev_out: bool = True,
):
    """Low-degree extend evals on H (natural order) to the coset shift*K.

    evals: (N, C) values of a degree-<N polynomial on the size-N subgroup.
    Returns (N << log_blowup, C) evaluations on shift*K (K the larger
    subgroup), bit-reversed row order by default (commitment layout).
    `shift` defaults to the field's multiplicative generator, matching the
    reference's quotient/LDE domains (`TwoAdicMultiplicativeCoset`).
    """
    n = evals.shape[0]
    m = n << log_blowup
    if shift is None:
        shift = field.generator
    coeffs = intt(field, evals, xp)
    # scale coefficient i by shift^i, then zero-pad to m
    pows = xp.asarray(_power_table(field, shift % field.P, n))
    shaped = pows.reshape((n,) + (1,) * (evals.ndim - 1))
    coeffs = field.monty_mul(coeffs, shaped, xp)
    pad = [(0, m - n)] + [(0, 0)] * (evals.ndim - 1)
    coeffs = xp.pad(coeffs, pad)
    out = ntt(field, coeffs, xp)
    if bitrev_out:
        out = bit_reverse_rows(out, xp)
    return out


def eval_coeffs_at_point(field_ext, coeffs, point, xp):
    """Horner-evaluate column coefficient vectors at an extension point.

    coeffs: (N, C) base-field coefficients; point: (D,) extension element.
    Returns (C, D).
    """
    n = coeffs.shape[0]
    E = field_ext
    acc = E.zeros((coeffs.shape[1],), xp)
    for i in range(n - 1, -1, -1):
        acc = E.mul(acc, xp.broadcast_to(point, acc.shape), xp)
        acc = E.add(acc, E.from_base(coeffs[i], xp), xp)
    return acc

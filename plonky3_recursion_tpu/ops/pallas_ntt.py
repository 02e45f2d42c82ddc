"""Pallas TPU kernel for large batched NTTs over Monty31 fields.

The XLA radix-2 path in `ops/ntt.py` pays log2(N) full HBM passes over a
lane-PADDED buffer (a (N, C) u32 array pads C up to 128 lanes — measured
537 MB physical for a (2^20, 34) logical 143 MB matrix) and lands ~40x
off the memory roofline.  This kernel runs the whole transform
VMEM-resident instead: each batch column is DMA'd into VMEM once, every
butterfly stage happens on-chip, and the result is written back once.

Formulation: decimation-in-time, so the bit-reversal lands on the INPUT
side where it is one cheap SUBLANE gather on the (N, C) layout (the
mirrored decimation-in-frequency design needs the permutation on the
output in the (C, N) layout — a LANE gather, measured 50+ ms at 2^20,
5x the kernel itself).  Per column of length L = R*128:

  input gather arranges block view V[rho][sigma] =
      a[(128*rev_R(rho) + rev_7(sigma)) * 2^P + rev_P(b)]
  1. DIT NTT of length R down the SUBLANE axis (bitrev rows in, natural
     out) — sublane slice/concat stages for block >= 16, roll+select
     butterflies for the first three
  2. elementwise twiddle T[k2][sigma] = w_L^(rev_7(sigma) * k2)  (Monty
     form; the inverse transform folds the global 1/N scale in here)
  3. in-VMEM transpose -> (128, R): rows sigma = rev_7(j1), DIT-ready
  4. DIT NTT of length 128 down the sublane axis
  output block [k1][k2] is flat-NATURAL order — no output gather at all.

Columns longer than LMAX split into 2^P independent sub-NTTs handled by
the same gather (sub-NTT b takes every 2^P-th element); P XLA
"post-split" DIT stages afterwards are pure lane-sliced elementwise
passes over the compact (C, N) layout (free-view reshapes only).

Batched over columns via the Pallas grid; all twiddle/permutation tables
are passed as runtime arrays (never HLO literals — see ops/ntt.py
`ntt_tables` for why) and stay VMEM-resident across grid steps.

Bit-identical to `ops.ntt.ntt` (the DFT is unique; tests pin equality).
Reference capability: upstream `p3-dft` Radix2DitParallel (SURVEY.md
§2.6); the kernel design is TPU-native (VMEM residency, sublane
butterflies, lane-batched columns).
"""

from __future__ import annotations

import functools

import numpy as np

from ..fields.monty31 import Monty31
from .ntt import _bitrev_perm

LANES = 128
LOG_LANES = 7
LOG_LMAX = 18  # per-column VMEM budget: 2^18 u32 = 1 MB blocks
# below this the XLA path is fine and the kernel's fixed costs dominate
LOG_MIN = 13


def _powers(base: int, n: int, p: int) -> np.ndarray:
    """[1, base, ..., base^(n-1)] mod p as u64 (doubling concat)."""
    pw = np.ones(1, dtype=np.uint64)
    b = np.uint64(base % p)
    while len(pw) < n:
        pw = np.concatenate(
            [pw, (pw * (int(pw[-1]) * int(b) % p)) % np.uint64(p)]
        )
    return pw[:n]


def _dit_stage_tw(order_root: int, length: int, p: int) -> np.ndarray:
    """(length, log2(length)) per-row DIT stage twiddles.

    Stage s has block m = 2^(s+1); row r gets w_m^((r % m) mod (m/2)) —
    the same table serves the sliced form (rows [0, m/2) of a stage
    column are w_m^0..w_m^(m/2-1)) and the roll+select form (every row's
    b-multiplier)."""
    log_len = length.bit_length() - 1
    out = np.ones((length, log_len), dtype=np.uint64)
    rows = np.arange(length)
    for s in range(log_len):
        m = 2 << s
        half = m // 2
        wm = pow(order_root, length // m, p)
        out[:, s] = _powers(wm, half, p)[(rows % m) % half]
    return out


@functools.lru_cache(maxsize=None)
def pallas_ntt_tables(
    field: Monty31, log_n: int, inverse: bool, log_lmax: int = LOG_LMAX
) -> dict:
    """Host-side constant tables for `ntt_pallas` at length 2^log_n.

    Returned as a dict of numpy arrays (a pytree): jitted callers upload
    once and pass through the jit boundary as runtime args.  log_lmax
    caps the per-column kernel length (tests lower it to exercise the
    XLA post-split stages at small N).
    """
    p = field.P
    n = 1 << log_n
    log_l = min(log_n, log_lmax)
    post = log_n - log_l  # number of XLA post-split stages
    l = 1 << log_l
    r = l >> LOG_LANES
    log_r = log_l - LOG_LANES
    assert log_r >= 3, "ntt_pallas needs N >= 2^13 per sub-NTT"

    def root(order_log: int) -> int:
        w = field.two_adic_generator(order_log)
        return pow(w, p - 2, p) if inverse else w

    w_l = root(log_l)
    w_r = pow(w_l, LANES, p)
    w_128 = pow(w_l, r, p)

    w1 = field.monty_array(_dit_stage_tw(w_r, r, p))
    w4 = field.monty_array(_dit_stage_tw(w_128, LANES, p))

    # --- T: cross twiddle (R, 128): w_L^(rev_7(sigma) * k2) [* 1/N] ---
    rev_128 = _bitrev_perm(LANES).astype(np.int64)
    # T[k2][sigma] = (w_L^(k2))^(rev_7(sigma)), built column-by-column:
    # col sigma = base^(rev_7(sigma)) where base[k2] = w_L^(k2).
    base = _powers(w_l, r, p)
    scale = pow(n, p - 2, p) if inverse else 1
    t = np.empty((r, LANES), dtype=np.uint64)
    # exponentiate the whole base vector by rev_7(sigma) via repeated
    # squaring over the 7 exponent bits (vectorized u64 modmuls)
    sq = [base]
    for _ in range(LOG_LANES - 1):
        prev = sq[-1]
        sq.append((prev * prev) % np.uint64(p))
    for sigma in range(LANES):
        e = int(rev_128[sigma])
        col = np.full(r, scale, dtype=np.uint64)
        for bpos in range(LOG_LANES):
            if (e >> bpos) & 1:
                col = (col * sq[bpos]) % np.uint64(p)
        t[:, sigma] = col
    t_m = field.monty_array(t)

    # --- post-split stage twiddles: stage s merges blocks of 2^(s+1)*L ---
    post_tw = []
    for s in range(post):
        m = (2 * l) << s
        wm = root(log_l + s + 1)
        post_tw.append(
            field.monty_array(_powers(wm, m // 2, p)).reshape(1, 1, m // 2)
        )

    # --- input row permutation (applied on the (N, C) layout) ---
    rev_r = _bitrev_perm(r).astype(np.int64)
    q = np.arange(n, dtype=np.int64)
    sigma = q & (LANES - 1)
    rho = (q >> LOG_LANES) & (r - 1)
    b = q >> log_l
    if post:
        rev_post = _bitrev_perm(1 << post).astype(np.int64)
        piece = rev_post[b]
    else:
        piece = np.zeros_like(q)
    in_perm = (
        ((rev_r[rho] * LANES + rev_128[sigma]) << post) + piece
    ).astype(np.int32)

    return {
        "pre_gather": in_perm,
        "w1": w1,
        "w4": w4,
        "t": t_m,
        "post_tw": tuple(post_tw),
        "br": _bitrev_perm(n).astype(np.int32),
    }


def _sublane_dit_ntt(F, x, wref, log_len, jnp):
    """DIT NTT down the sublane axis of (len, lanes) u32 in VMEM.

    Rows arrive in bit-reversed order, leave natural.  wref: (len,
    n_stages) per-row stage twiddles (Monty form, `_dit_stage_tw`).
    """
    from jax import lax

    length, lanes = x.shape
    for s in range(log_len):
        m = 2 << s
        half = m // 2
        if half >= 8:
            x3 = x.reshape(length // m, m, lanes)
            a = x3[:, :half, :]
            b = x3[:, half:, :]
            tw = wref[:half, s : s + 1].reshape(1, half, 1)
            t = F.monty_mul(b, tw, jnp)
            x = jnp.concatenate(
                [F.add(a, t, jnp), F.sub(a, t, jnp)], axis=1
            ).reshape(length, lanes)
        else:
            from jax.experimental.pallas import tpu as pltpu

            up = pltpu.roll(x, shift=length - half, axis=0)
            down = pltpu.roll(x, shift=half, axis=0)
            rid = lax.broadcasted_iota(jnp.uint32, (length, 1), 0)
            is_a = (rid & jnp.uint32(m - 1)) < jnp.uint32(half)
            bvals = jnp.where(is_a, up, x)
            avals = jnp.where(is_a, x, down)
            t = F.monty_mul(bvals, wref[:, s : s + 1], jnp)
            x = jnp.where(
                is_a, F.add(avals, t, jnp), F.sub(avals, t, jnp)
            )
    return x


_FN_CACHE: dict = {}


def _build_kernel_fn(field: Monty31, log_l: int, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    F = field
    l = 1 << log_l
    r = l >> LOG_LANES
    log_r = log_l - LOG_LANES

    def kernel(x_ref, w1_ref, w4_ref, t_ref, o_ref):
        x = x_ref[0]  # (R, 128): rows rev(j2), lanes rev(j1)
        x = _sublane_dit_ntt(F, x, w1_ref, log_r, jnp)  # rows k2
        x = F.monty_mul(x, t_ref[:], jnp)
        x = x.T  # (128, R): rows rev(j1) — DIT-ready
        x = _sublane_dit_ntt(F, x, w4_ref, LOG_LANES, jnp)  # rows k1
        o_ref[0] = x  # flat [k1][k2] = natural order

    @jax.jit
    def run(xb, w1, w4, t):  # xb: (B, R, 128) gathered blocks
        b = xb.shape[0]
        const = lambda shape: pl.BlockSpec(  # noqa: E731
            shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((b, LANES, r), jnp.uint32),
            grid=(b,),
            in_specs=[
                pl.BlockSpec(
                    (1, r, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
                ),
                const((r, log_r)),
                const((LANES, LOG_LANES)),
                const((r, LANES)),
            ],
            out_specs=pl.BlockSpec(
                (1, LANES, r), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            interpret=interpret,
        )(xb, w1, w4, t)

    return run


def _kernel_fn(field: Monty31, log_l: int, interpret: bool):
    key = (field.name, log_l, interpret)
    fn = _FN_CACHE.get(key)
    if fn is None:
        fn = _FN_CACHE[key] = _build_kernel_fn(field, log_l, interpret)
    return fn


def ntt_pallas(
    field: Monty31,
    x,
    inverse: bool = False,
    tables=None,
    out_order: str = "natural",
    interpret: bool = False,
):
    """NTT down axis 0 of (N, C) u32 via the VMEM-resident kernel.

    Bit-identical to `ops.ntt.ntt(field, x, jnp, inverse)` when
    out_order == "natural"; out_order == "bitrev" applies the commitment
    layout's `bit_reverse_rows` as one extra sublane gather.
    """
    import jax.numpy as jnp

    n, c = x.shape
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    if tables is None:
        tables = pallas_ntt_tables(field, log_n, inverse)
        tables = {
            k: (
                tuple(jnp.asarray(a) for a in v)
                if isinstance(v, tuple)
                else jnp.asarray(v)
            )
            for k, v in tables.items()
        }
    post = len(tables["post_tw"])
    log_l = log_n - post
    r = (1 << log_l) >> LOG_LANES

    # input bitrev/deal gather: one sublane gather on the (N, C) layout
    xg = x[tables["pre_gather"]]
    xt = xg.T  # (C, N) compact
    xb = xt.reshape(c << post, r, LANES)
    out = _kernel_fn(field, log_l, interpret)(
        xb, tables["w1"], tables["w4"], tables["t"]
    )
    xt = out.reshape(c, n)  # per-piece natural, pieces on lane blocks

    # post-split DIT stages: pure lane-sliced elementwise passes
    for s in range(post):
        m = (2 << s) << log_l
        x3 = xt.reshape(c, n // m, m)
        a = x3[:, :, : m // 2]
        b = x3[:, :, m // 2 :]
        t = field.monty_mul(b, tables["post_tw"][s], jnp)
        xt = jnp.concatenate(
            [field.add(a, t, jnp), field.sub(a, t, jnp)], axis=2
        ).reshape(c, n)

    out = xt.T
    if out_order == "bitrev":
        out = out[tables["br"]]
    return out

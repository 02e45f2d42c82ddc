"""Shared small helpers (modular reductions, ext power tables)."""

from __future__ import annotations

import numpy as np

from ..fields.monty31 import Monty31, U32


def modsum(field: Monty31, a, axis: int, xp):
    """Modular sum reduction via a log-depth tree of field adds."""
    a = xp.moveaxis(a, axis, 0)
    n = a.shape[0]
    # pad to a power of two with zeros
    m = 1 << max(n - 1, 0).bit_length() if n > 1 else 1
    if m != n:
        pad = [(0, m - n)] + [(0, 0)] * (a.ndim - 1)
        a = xp.pad(a, pad)
    while a.shape[0] > 1:
        half = a.shape[0] // 2
        a = field.add(a[:half], a[half:], xp)
    return a[0]


def ext_powers(E, zeta, n: int, xp):
    """[zeta^0 .. zeta^(n-1)] as (n, D) via log-doubling."""
    one = E.from_base(xp.asarray(np.uint32(1)), xp)
    arr = one[None, :]
    f = xp.asarray(zeta)[None, :]
    while arr.shape[0] < n:
        nxt = E.mul(arr, xp.broadcast_to(f, arr.shape), xp)
        arr = xp.concatenate([arr, nxt], axis=0)
        f = E.mul(f, f, xp)
    return arr[:n]


def reduce_matrix_ext(field: Monty31, E, mat, weights, xp):
    """Σ_c mat[:, c] * weights[c]  -> (H, D) ext, mat (H, w) base.

    weights: (w, D) ext.  Column-weighted modular reduction, one base
    multiply + tree-sum per extension coefficient.
    """
    outs = []
    for d in range(E.D):
        w_m = field.to_monty(weights[:, d], xp)
        prod = field.monty_mul(mat, w_m[None, :], xp)
        outs.append(modsum(field, prod, 1, xp))
    return xp.stack(outs, axis=-1)

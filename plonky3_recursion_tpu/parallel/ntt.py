"""Distributed four-step NTT over a device mesh.

The multi-chip NTT design from SURVEY.md §2.7/§5: decompose a length-N
transform as an (N1, N2) matrix — local column NTTs, twiddle scaling,
transpose (the one cross-chip exchange, `all_to_all` over ICI), local row
NTTs.  Each device holds N/n_devices rows; compute is two local NTT sweeps
and the only communication is the transpose.

Four-step identity (w = w_N, natural order in/out):
  X[k1 + N1·k2] = Σ_{j2} w_{N2}^{j2·k2} · ( w_N^{j2·k1} · Σ_{j1}
                  w_{N1}^{j1·k1} x[j1·N2 + j2] )
i.e. view x as (N1, N2) row-major; NTT each column (length N1); multiply
entry (k1, j2) by w_N^{j2·k1}; NTT each row (length N2); read out
transposed.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fields.monty31 import Monty31, U32
from ..ops.ntt import ntt


def _twiddle_block(field: Monty31, log_n: int, n1: int, n2: int) -> np.ndarray:
    """w_N^{k1·j2} for k1 < n1, j2 < n2, in Monty form."""
    p = field.P
    w = field.two_adic_generator(log_n)
    rows = []
    cur = 1
    for k1 in range(n1):
        row = [1] * n2
        for j2 in range(1, n2):
            row[j2] = row[j2 - 1] * cur % p
        rows.append(row)
        cur = cur * w % p
    return field.monty_array(rows)


def sharded_ntt(field: Monty31, x, mesh: Mesh, axis: str = "rows"):
    """Length-N NTT of a 1-D canonical u32 vector, rows sharded over the
    mesh.  Returns natural-order result (replicating the host `ntt`)."""
    n = x.shape[0]
    log_n = n.bit_length() - 1
    n_dev = mesh.devices.size
    n1 = n_dev  # columns-per-device view: (n1, n2) row-major
    n2 = n // n1
    tw = _twiddle_block(field, log_n, n1, n2)

    assert n1 == n_dev and n2 % n_dev == 0, "needs n >= n_devices^2"

    def fn(x_shard, tw_shard):
        # x_shard: (1, n2) — this device's row of the (n1, n2) view.
        # transpose shards: device d ends with all n1 rows of its column
        # chunk d (one all_to_all over the ICI)
        cols = jax.lax.all_to_all(
            x_shard.reshape(n_dev, n2 // n_dev), axis, 0, 0
        )  # (n1, n2/n_dev): row s = source s's row, our column chunk
        # local length-n1 NTTs down each held column
        cols = ntt(field, cols, jnp)
        # twiddle: entry (k1, j2) *= w^{k1·j2}; tw_shard holds our columns
        cols = field.monty_mul(cols, tw_shard, jnp)
        # transpose back: device d ends with row k1=d, all columns
        rows = jax.lax.all_to_all(cols, axis, 0, 0).reshape(1, n2)
        # local length-n2 NTT along the row
        return ntt(field, rows.T, jnp).T

    shard = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(axis, None), P(None, axis)),
        out_specs=P(axis, None),
        check_vma=False,
    )
    out = shard(
        jnp.asarray(x).reshape(n1, n2), jnp.asarray(tw)
    )  # (n1, n2): out[k1, k2] = X[k1 + n1·k2]
    # natural order: X[k] with k = k1 + n1·k2 -> transpose then flatten
    return jnp.transpose(out).reshape(n)

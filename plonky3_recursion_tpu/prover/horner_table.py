"""HornerAcc NPO: K-step packed polynomial-evaluation rows.

TPU-native equivalent of the reference's packed HornerAcc ALU lanes
(`circuit-prover/src/air/alu_air.rs:63-99`; SURVEY.md §2.2 #22): a Horner
chain  acc ← acc·b + c  packs K steps into ONE table row with in-row
intermediate registers, instead of one MULADD ALU row per step.  The
recursive verifier's dominant row consumers — per-query FRI batch-opening
reductions Σ αᵏ·row[k], constraint α-folds, and final-polynomial
evaluation — all become Horner chains here.

Where the reference packs Horner chains onto ALU lane 0 with scheduling
(`compute_schedule`), this build gives Horner its own dynamic table: rows
are uniform (no lane-0 special casing), every constraint is degree 2, and
partial chains are padded IN FRONT with zero coefficients (a Horner chain
starting from acc=0 is invariant under leading zeros), so no per-step
selectors are needed.

Row layout (single lane):
  main: [acc (D) | b (D) | c_1..c_K (K·D) | r_1..r_K (K·D)]
  prep: [acc_idx, acc_mult, b_idx, b_mult, out_idx, out_mult,
         (c_idx, c_mult) × K]
Constraints (binomial-extension products, x^D = W):
  r_1 = acc·b + c_1;  r_j = r_{j-1}·b + c_j          (degree 2)
Bus: receives acc, b and each c_j; sends out = r_K.
Multi-row chains pass the running accumulator between rows through the
witness bus (row i's out = row i+1's acc).
"""

from __future__ import annotations

import functools

import numpy as np

from ..fields.monty31 import U32
from ..stark.lookups import Interaction, Lookup
from ..stark.symbolic import Air, Var
from .airs import BUS


class HornerAir(Air):
    num_publics = 0

    def __init__(self, d: int, w_binomial: int, k: int):
        self.d = d
        self.w = w_binomial
        self.k = k
        self.width_main = d * (2 + 2 * k)
        self.width_prep = 6 + 2 * k

    def cache_key(self):
        return (type(self).__name__, self.d, self.w, self.k)

    def _slot(self, b, s: int):
        return [Var("main", s * self.d + j, 0) for j in range(self.d)]

    def _conv(self, a, b):
        d = self.d
        cols = []
        for kk in range(2 * d - 1):
            acc = None
            for i in range(max(0, kk - d + 1), min(d, kk + 1)):
                t = a[i] * b[kk - i]
                acc = t if acc is None else acc + t
            cols.append(acc)
        out = []
        for kk in range(d):
            v = cols[kk]
            if kk + d <= 2 * d - 2:
                v = v + cols[kk + d] * self.w
            out.append(v)
        return out

    def eval(self, b):
        d, k = self.d, self.k
        acc = self._slot(b, 0)
        mult = self._slot(b, 1)
        prev = acc
        for j in range(k):
            c = self._slot(b, 2 + j)
            r = self._slot(b, 2 + k + j)
            prod = self._conv(prev, mult)
            for jj in range(d):
                b.assert_zero(prod[jj] + c[jj] - r[jj])
            prev = r

    def lookups(self):
        d, k = self.d, self.k
        inters = []
        # acc, b, out
        for pidx, s in ((0, 0), (2, 1), (4, 2 + 2 * k - 1)):
            inters.append(
                Interaction(
                    [Var("preprocessed", pidx, 0)]
                    + [Var("main", s * d + j, 0) for j in range(d)],
                    Var("preprocessed", pidx + 1, 0),
                )
            )
        for j in range(k):
            inters.append(
                Interaction(
                    [Var("preprocessed", 6 + 2 * j, 0)]
                    + [Var("main", (2 + j) * d + jj, 0) for jj in range(d)],
                    Var("preprocessed", 7 + 2 * j, 0),
                )
            )
        return [Lookup(BUS, inters)]


class HornerNpo:
    """Circuit + prover plugin.  Calls have uniform arity: inputs =
    [acc, b, c_1..c_K] (the builder pads short chunks in front with the
    zero constant)."""

    def __init__(self, field, d: int, k: int = 8):
        from ..fields import ext_field

        self.field = field
        self.d = d
        self.k = k
        self.E = ext_field(field, d)  # D=1 is a valid (trivial) extension
        self.type_id = f"horner/{field.name}_d{d}_k{k}"

    # ----- circuit/runner plugin API -----

    def num_outputs(self, config, inputs) -> int:
        return 1

    def _steps(self, ins: np.ndarray):
        """ins: (n, (2+K)·D) → (acc, b, cs, rs) with rs: (n, K, D)."""
        E, d, k = self.E, self.d, self.k
        n = ins.shape[0]
        cols = ins.reshape(n, 2 + k, d)
        acc, b = cols[:, 0], cols[:, 1]
        rs = np.zeros((n, k, d), dtype=U32)
        cur = acc
        for j in range(k):
            cur = E.add(E.mul(cur, b, np), cols[:, 2 + j], np)
            rs[:, j] = cur
        return acc, b, cols[:, 2:], rs

    def execute_batch(self, ins: np.ndarray):
        _acc, _b, _cs, rs = self._steps(ins.astype(U32))
        n = ins.shape[0]
        outs = rs[:, -1].reshape(n, 1, self.d)
        records = [ins[i].astype(U32).copy() for i in range(n)]
        return outs, records

    # ----- prover-side plugin API -----

    def table_air(self) -> HornerAir:
        w = self.E.W if self.d > 1 else 0
        return HornerAir(self.d, w, self.k)

    def build_prep(self, calls, min_height: int) -> np.ndarray:
        from .batch_prover import _pad_pow2

        F, d, k = self.field, self.d, self.k
        prep = np.zeros((len(calls), 6 + 2 * k), dtype=U32)
        for i, call in enumerate(calls):
            wids = call.inputs
            prep[i, 0] = wids[0] * d
            prep[i, 1] = call.in_mults[0] % F.P
            prep[i, 2] = wids[1] * d
            prep[i, 3] = call.in_mults[1] % F.P
            prep[i, 4] = call.outputs[0] * d
            prep[i, 5] = call.out_mults[0] % F.P
            for j in range(k):
                prep[i, 6 + 2 * j] = wids[2 + j] * d
                prep[i, 7 + 2 * j] = call.in_mults[2 + j] % F.P
        return _pad_pow2(prep, min_height)

    def build_main(self, calls, records, min_height: int) -> np.ndarray:
        from .batch_prover import _pad_pow2

        d, k = self.d, self.k
        if not records:
            return np.zeros((min_height, d * (2 + 2 * k)), dtype=U32)
        ins = np.stack(records).astype(U32)  # (n, (2+K)·D)
        _acc, _b, _cs, rs = self._steps(ins)
        main = np.concatenate([ins, rs.reshape(len(records), k * d)], axis=1)
        return _pad_pow2(main, min_height)

    def build_main_from_wit(self, circuit, calls, wit_dev, min_height: int):
        """Device build: gather the (2+K)·D input coefficients from the
        uploaded witness, run the K mul-add chain on device."""
        import jax
        import jax.numpy as jnp

        from ..circuit.runner import _exec_plan
        from ..ops.jitk import _dev

        plan = _exec_plan(circuit)
        if not hasattr(plan, "npo_main_fns"):
            plan.npo_main_fns = {}
        key = (self.type_id, min_height)
        fn = plan.npo_main_fns.get(key)
        if fn is None:
            E, d, k = self.E, self.d, self.k
            idx = np.asarray(
                [[w for w in c.inputs] for c in calls], dtype=np.int32
            ).reshape(len(calls), 2 + k)
            idx_d = _dev(idx)
            n = len(calls)
            target = max(
                min_height, 1 << max(n - 1, 0).bit_length() if n > 1 else 1
            )

            def body(wit, idx_t):
                cols = wit[idx_t.reshape(-1)].reshape(n, 2 + k, d)
                acc, b = cols[:, 0], cols[:, 1]
                rs = []
                cur = acc
                for j in range(k):
                    cur = E.add(
                        E.mul(cur, b, jnp), cols[:, 2 + j], jnp
                    )
                    rs.append(cur)
                main = jnp.concatenate(
                    [cols.reshape(n, (2 + k) * d)]
                    + [r.reshape(n, d) for r in rs],
                    axis=1,
                )
                return jnp.pad(main, [(0, target - n), (0, 0)])

            jfn = jax.jit(body)
            fn = plan.npo_main_fns[key] = lambda w: jfn(w, idx_d)
        return fn(wit_dev)


@functools.lru_cache(maxsize=None)
def horner_npo_for(field_name: str, k: int = 8, d: int = 4) -> HornerNpo:
    from ..fields import FIELDS

    return HornerNpo(FIELDS[field_name], d, k=k)


def koala_bear_horner_npo(k: int = 8) -> HornerNpo:
    return horner_npo_for("koala_bear", k)

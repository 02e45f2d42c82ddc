"""Recompose NPO: the zero-constraint BF→EF packing table.

TPU-native equivalent of the reference's recompose table
(`circuit/src/ops/recompose.rs:1-70,381`,
`circuit-prover/src/air/recompose_air.rs`; SURVEY.md §2.1 #14 / §2.2 #30):
packing D base-embedded witnesses into one extension witness costs ONE
table row with ZERO local AIR constraints — correctness is enforced
entirely by WitnessChecks bus consistency:

  * output send/receive `(out_idx, v_0..v_{D-1})` binds the packed value,
  * per-coefficient receive `(c_idx_j, v_j, 0..0)` binds coefficient j to
    the witness at `c_idx_j` AND asserts that witness is base-embedded
    (the bus tuple carries the full D coefficients of the slot).

This replaces the D-mul_add ALU gadget the builder otherwise emits
(`recompose_base_coeffs_to_ext`), the single largest ALU-row consumer in
recursive verifier circuits (every private opening crosses the BF→EF
bridge).  Rows are lane-packed like the other primitive chips.
"""

from __future__ import annotations

import functools

import numpy as np

from ..fields.monty31 import U32
from ..stark.lookups import Interaction, Lookup
from ..stark.symbolic import Air, Var
from .airs import BUS


class RecomposeAir(Air):
    """Main: D value cols per lane.  Prep per lane:
    [out_idx, out_mult, (c_idx, c_mult) × D].  Zero constraints."""

    num_publics = 0

    def __init__(self, d: int, lanes: int = 1):
        self.d = d
        self.lanes = lanes
        self.width_main = d * lanes
        self.width_prep = (2 + 2 * d) * lanes

    def eval(self, b):
        pass

    def cache_key(self):
        return (type(self).__name__, self.d, self.lanes)

    def lookups(self):
        d = self.d
        inters = []
        for l in range(self.lanes):
            mbase = l * d
            pbase = l * (2 + 2 * d)
            inters.append(
                Interaction(
                    [Var("preprocessed", pbase, 0)]
                    + [Var("main", mbase + j, 0) for j in range(d)],
                    Var("preprocessed", pbase + 1, 0),
                )
            )
            for j in range(d):
                inters.append(
                    Interaction(
                        [
                            Var("preprocessed", pbase + 2 + 2 * j, 0),
                            Var("main", mbase + j, 0),
                        ]
                        + [0] * (d - 1),
                        Var("preprocessed", pbase + 3 + 2 * j, 0),
                    )
                )
        return [Lookup(BUS, inters)]


class RecomposeNpo:
    """Circuit + prover plugin for the recompose table."""

    def __init__(self, field, d: int, lanes: int = 4):
        self.field = field
        self.d = d
        self.lanes = lanes
        self.type_id = f"recompose/{field.name}_d{d}"

    # ----- circuit/runner plugin API -----

    def num_outputs(self, config, inputs) -> int:
        return 1

    def execute_batch(self, ins: np.ndarray):
        """ins: (k, D·D) — the D inputs' full coefficient vectors,
        concatenated.  Output value = (in_0[0], in_1[0], .., in_{D-1}[0])."""
        d = self.d
        k = ins.shape[0]
        vals = ins.reshape(k, d, d)[:, :, 0]  # (k, D) coeff-0s
        outs = vals.reshape(k, 1, d)
        records = [vals[i].copy() for i in range(k)]
        return outs, records

    # ----- prover-side plugin API -----

    def table_air(self) -> RecomposeAir:
        return RecomposeAir(self.d, self.lanes)

    def build_prep(self, calls, min_height: int) -> np.ndarray:
        from .batch_prover import _lane_pack

        F = self.field
        d = self.d
        w = 2 + 2 * d
        prep = np.zeros((len(calls), w), dtype=U32)
        for i, call in enumerate(calls):
            prep[i, 0] = call.outputs[0] * d
            prep[i, 1] = call.out_mults[0] % F.P
            for j, wid in enumerate(call.inputs):
                prep[i, 2 + 2 * j] = wid * d
                prep[i, 3 + 2 * j] = call.in_mults[j] % F.P
        return _lane_pack(prep, self.lanes, min_height)

    def build_main(self, calls, records, min_height: int) -> np.ndarray:
        from .batch_prover import _lane_pack

        d = self.d
        if not records:
            return np.zeros((min_height, d * self.lanes), dtype=U32)
        main = np.stack(records).astype(U32)  # (k, D)
        return _lane_pack(main, self.lanes, min_height)

    def build_main_from_wit(self, circuit, calls, wit_dev, min_height: int):
        """Device build: the table rows are coeff-0 gathers of the input
        witness cells — derived from the uploaded witness alone."""
        import jax
        import jax.numpy as jnp

        from ..circuit.runner import _exec_plan
        from ..ops.jitk import _dev
        from .batch_prover import device_lane_pack

        plan = _exec_plan(circuit)
        if not hasattr(plan, "npo_main_fns"):
            plan.npo_main_fns = {}
        key = (self.type_id, min_height)
        fn = plan.npo_main_fns.get(key)
        if fn is None:
            d = self.d
            idx = np.asarray(
                [[w for w in c.inputs] for c in calls], dtype=np.int32
            ).reshape(len(calls), d)
            idx_d = _dev(idx)
            n = len(calls)

            def body(wit, idx_t):
                vals = wit[idx_t.reshape(-1)].reshape(n, d, d)[:, :, 0]
                return device_lane_pack(jnp, vals, self.lanes, min_height)

            jfn = jax.jit(body)
            fn = plan.npo_main_fns[key] = lambda w: jfn(w, idx_d)
        return fn(wit_dev)


@functools.lru_cache(maxsize=None)
def recompose_npo_for(
    field_name: str, lanes: int = 4, d: int = 4
) -> RecomposeNpo:
    from ..fields import FIELDS

    return RecomposeNpo(FIELDS[field_name], d, lanes=lanes)


def koala_bear_recompose_npo(lanes: int = 4) -> RecomposeNpo:
    return recompose_npo_for("koala_bear", lanes)

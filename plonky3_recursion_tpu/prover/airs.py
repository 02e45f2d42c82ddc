"""Primitive-chip AIRs: ConstAir, PublicAir, AluAir.

TPU-native equivalent of the reference's `p3-circuit-prover` AIR layer
(`circuit-prover/src/air/{const_air,public_air,alu_air}.rs`;
SURVEY.md §2.2).  Layouts:

  ConstAir   main: 1 zero col              prep: [mult, idx, v_0..v_{D-1}]
  PublicAir  main: D value cols / lane     prep: [mult, idx] / lane
  AluAir     main: 4·D cols (a|b|c|out)/ln prep: [idx_a, idx_b, idx_c,
             idx_out, mult_a, mult_b, mult_c, mult_out,
             sel_add, sel_mul, sel_muladd, sel_bool] / lane

ConstAir keeps the constant VALUES in its preprocessed columns (reference
`const_air.rs:1-100` and `book/.../lookups.md` "Both the index and the
value are fully preprocessed"): the constant table is part of the circuit
identity, bound by the offline preprocessed commitment rather than by
per-proof data.  This is what makes verifier-circuit fixed points possible
— the outer circuit never needs the inner circuit's constant values.
Public has no constraints either — its soundness is the WitnessChecks bus
plus native terminal recomputation from the claimed public inputs.
AluAir constrains, per selector, with extension multiplication expanded to
the binomial convolution over the D base coefficient columns (x^D = W, so
all constraints stay degree ≤ 3 after selector gating).

Bus convention: idx columns carry WitnessId·D (D-scaled, reference
`circuit/src/types.rs:400`); every chip interaction is the (1+D)-tuple
(idx, v_0..v_{D-1}) on the "WitnessChecks" bus.
"""

from __future__ import annotations

import numpy as np

from ..fields.monty31 import U32
from ..stark.lookups import Interaction, Lookup
from ..stark.symbolic import Air, Var

BUS = "WitnessChecks"

# AluAir preprocessed column indices
P_IDX_A, P_IDX_B, P_IDX_C, P_IDX_OUT = 0, 1, 2, 3
P_MULT_A, P_MULT_B, P_MULT_C, P_MULT_OUT = 4, 5, 6, 7
P_SEL_ADD, P_SEL_MUL, P_SEL_MULADD, P_SEL_BOOL = 8, 9, 10, 11
ALU_PREP_WIDTH = 12


class ConstAir(Air):
    """Fully-preprocessed constant chip: per lane [mult, idx, v_0..v_{D-1}]
    preprocessed columns; the interaction tuple (idx, v…) reads preprocessed
    variables only, so the bus send is bound by the offline prep commitment.
    The main matrix is one committed zero column (the batch layout needs a
    main matrix per instance)."""

    num_publics = 0

    def __init__(self, d: int, lanes: int = 1):
        self.d = d
        self.lanes = lanes
        self.width_main = 1
        self.width_prep = (2 + d) * lanes

    def eval(self, b):
        pass

    def cache_key(self):
        return (type(self).__name__, self.d, self.lanes)

    def lookups(self):
        d = self.d
        inters = []
        for l in range(self.lanes):
            base = (2 + d) * l
            inters.append(
                Interaction(
                    [Var("preprocessed", base + 1, 0)]
                    + [
                        Var("preprocessed", base + 2 + j, 0)
                        for j in range(d)
                    ],
                    Var("preprocessed", base, 0),
                )
            )
        return [Lookup(BUS, inters)]


class PublicAir(Air):
    """Lane-packed value-send chip: `lanes` logical rows per trace row,
    each lane D value cols (main) + [mult, idx] (prep)."""

    num_publics = 0

    def __init__(self, d: int, lanes: int = 1):
        self.d = d
        self.lanes = lanes
        self.width_main = d * lanes
        self.width_prep = 2 * lanes

    def eval(self, b):
        pass

    def cache_key(self):
        return (type(self).__name__, self.d, self.lanes)

    def lookups(self):
        d = self.d
        inters = []
        for l in range(self.lanes):
            inters.append(
                Interaction(
                    [Var("preprocessed", 2 * l + 1, 0)]
                    + [Var("main", l * d + j, 0) for j in range(d)],
                    Var("preprocessed", 2 * l, 0),
                )
            )
        return [Lookup(BUS, inters)]


class AluAir(Air):
    num_publics = 0

    def __init__(
        self, d: int, w_binomial: int, lanes: int = 1, quintic: bool = False
    ):
        """quintic=True selects the trinomial ext-mul reduction
        x^5 = 1 − x^2 (reference `AluExtMulKind::QuinticTrinomial`,
        `circuit-prover/src/air/alu_air.rs:109`); otherwise the binomial
        x^D = W reduction."""
        assert not quintic or d == 5
        self.d = d
        self.w = w_binomial
        self.lanes = lanes
        self.quintic = quintic
        self.width_main = 4 * d * lanes
        self.width_prep = ALU_PREP_WIDTH * lanes

    def cache_key(self):
        return (type(self).__name__, self.d, self.w, self.lanes, self.quintic)

    def _slot(self, s: int, lane: int = 0):
        base = lane * 4 * self.d
        return [
            Var("main", base + s * self.d + j, 0) for j in range(self.d)
        ]

    def _conv(self, a, b):
        """Extension product coefficients (degree-2 exprs)."""
        d = self.d
        cols = []
        for k in range(2 * d - 1):
            acc = None
            for i in range(max(0, k - d + 1), min(d, k + 1)):
                t = a[i] * b[k - i]
                acc = t if acc is None else acc + t
            cols.append(acc)
        if self.quintic:
            # x^{5+j} = x^j − x^{2+j}, descending so the x^8 term cascades
            cols = list(cols)
            for k in range(2 * d - 2, d - 1, -1):
                j = k - d
                v = cols[k]
                cols[j] = cols[j] + v
                cols[2 + j] = cols[2 + j] - v
            return cols[:d]
        out = []
        for k in range(d):
            v = cols[k]
            if k + d < len(cols) + 1 and k + d <= 2 * d - 2:
                v = v + cols[k + d] * self.w
            out.append(v)
        return out

    def eval(self, b):
        d = self.d
        for lane in range(self.lanes):
            pbase = lane * ALU_PREP_WIDTH
            a = self._slot(0, lane)
            bb = self._slot(1, lane)
            c = self._slot(2, lane)
            out = self._slot(3, lane)
            sel_add = Var("preprocessed", pbase + P_SEL_ADD, 0)
            sel_mul = Var("preprocessed", pbase + P_SEL_MUL, 0)
            sel_muladd = Var("preprocessed", pbase + P_SEL_MULADD, 0)
            sel_bool = Var("preprocessed", pbase + P_SEL_BOOL, 0)
            prod = self._conv(a, bb)
            sq = self._conv(a, a)
            for j in range(d):
                b.assert_zero(sel_add * (a[j] + bb[j] - out[j]))
                b.assert_zero(sel_mul * (prod[j] - out[j]))
                b.assert_zero(sel_muladd * (prod[j] + c[j] - out[j]))
                b.assert_zero(sel_bool * (sq[j] - a[j]))

    def lookups(self):
        d = self.d
        inters = []
        for lane in range(self.lanes):
            pbase = lane * ALU_PREP_WIDTH
            mbase = lane * 4 * d
            for s, (pidx, pmult) in enumerate(
                [
                    (P_IDX_A, P_MULT_A),
                    (P_IDX_B, P_MULT_B),
                    (P_IDX_C, P_MULT_C),
                    (P_IDX_OUT, P_MULT_OUT),
                ]
            ):
                inters.append(
                    Interaction(
                        [Var("preprocessed", pbase + pidx, 0)]
                        + [Var("main", mbase + s * d + j, 0) for j in range(d)],
                        Var("preprocessed", pbase + pmult, 0),
                    )
                )
        return [Lookup(BUS, inters)]

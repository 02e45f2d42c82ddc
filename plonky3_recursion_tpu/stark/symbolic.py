"""Symbolic AIR constraints: expression DAG + evaluation backends.

TPU-native equivalent of the reference's upstream `p3-air` /
`p3-uni-stark::SymbolicExpression` (SURVEY.md §2.6): AIRs author their
constraints once against a symbolic builder; the same DAG is then

  * batch-evaluated over all LDE rows on device (quotient computation),
  * point-evaluated at ζ with opened values (native verification),
  * compiled into circuit ops by the recursion layer
    (`recursion/symbolic_compiler.py`, mirroring
    `circuit/src/symbolic/compiler.rs:24` in the reference).

Values during evaluation are ('base', (..., )) or ('ext', (..., D)) canonical
u32 arrays; mixing promotes to ext.  Row selectors are the reference's
unnormalized Lagrange selectors (is_first_row = Z_H(x)/(x/s - 1) etc.,
`RecursiveLagrangeSelectors` in SURVEY.md §2.4).
"""

from __future__ import annotations

import dataclasses
import itertools
from typing import Any

import numpy as np

from ..fields.extension import BinomialExtension
from ..fields.monty31 import Monty31, U32

# ----- expression DAG -----

_ids = itertools.count()


class SExpr:
    __slots__ = ("eid",)

    def __init__(self):
        self.eid = next(_ids)

    def __add__(self, o):
        return Bin("add", self, _lift(o))

    __radd__ = __add__

    def __sub__(self, o):
        return Bin("sub", self, _lift(o))

    def __rsub__(self, o):
        return Bin("sub", _lift(o), self)

    def __mul__(self, o):
        return Bin("mul", self, _lift(o))

    __rmul__ = __mul__

    def __neg__(self):
        return Bin("sub", Const(0), self)


def _lift(x) -> "SExpr":
    if isinstance(x, SExpr):
        return x
    if isinstance(x, (int, np.integer)):
        return Const(int(x))
    raise TypeError(type(x))


class Var(SExpr):
    __slots__ = ("segment", "col", "offset", "is_ext")

    def __init__(self, segment: str, col: int, offset: int, is_ext: bool = False):
        super().__init__()
        assert segment in ("preprocessed", "main", "perm", "periodic")
        assert offset in (0, 1)
        self.segment, self.col, self.offset, self.is_ext = (
            segment,
            col,
            offset,
            is_ext,
        )


class Public(SExpr):
    __slots__ = ("idx",)

    def __init__(self, idx: int):
        super().__init__()
        self.idx = idx


class Challenge(SExpr):
    """Extension-valued Fiat–Shamir challenge (LogUp α/β etc.)."""

    __slots__ = ("idx",)

    def __init__(self, idx: int):
        super().__init__()
        self.idx = idx


class Terminal(SExpr):
    """Extension-valued per-proof constant (LogUp expected_cumulated)."""

    __slots__ = ("idx",)

    def __init__(self, idx: int):
        super().__init__()
        self.idx = idx


class Const(SExpr):
    __slots__ = ("value",)

    def __init__(self, value: int):
        super().__init__()
        self.value = value


class RowSel(SExpr):
    __slots__ = ("kind",)

    def __init__(self, kind: str):
        super().__init__()
        assert kind in ("first", "last", "transition")
        self.kind = kind


class Bin(SExpr):
    __slots__ = ("op", "a", "b")

    def __init__(self, op: str, a: SExpr, b: SExpr):
        super().__init__()
        self.op, self.a, self.b = op, a, b


# ----- builder -----


@dataclasses.dataclass
class AirBuilder:
    """Collects an AIR's constraints symbolically."""

    width_main: int
    width_prep: int = 0
    num_publics: int = 0
    num_perm_ext: int = 0  # extension-valued permutation (LogUp) columns
    num_challenges: int = 0
    num_periodic: int = 0

    def __post_init__(self):
        self.constraints: list[SExpr] = []
        self.periodic = [
            Var("periodic", c, 0) for c in range(self.num_periodic)
        ]
        self.main_local = [Var("main", c, 0) for c in range(self.width_main)]
        self.main_next = [Var("main", c, 1) for c in range(self.width_main)]
        self.prep_local = [Var("preprocessed", c, 0) for c in range(self.width_prep)]
        self.prep_next = [Var("preprocessed", c, 1) for c in range(self.width_prep)]
        self.perm_local = [
            Var("perm", c, 0, is_ext=True) for c in range(self.num_perm_ext)
        ]
        self.perm_next = [
            Var("perm", c, 1, is_ext=True) for c in range(self.num_perm_ext)
        ]
        self.public_values = [Public(i) for i in range(self.num_publics)]
        self.challenges = [Challenge(i) for i in range(self.num_challenges)]
        self.is_first_row = RowSel("first")
        self.is_last_row = RowSel("last")
        self.is_transition = RowSel("transition")

    def assert_zero(self, e):
        self.constraints.append(_lift(e))

    def assert_eq(self, a, b):
        self.assert_zero(_lift(a) - _lift(b))

    def when(self, sel):
        builder = self

        class _When:
            def assert_zero(self, e):
                builder.assert_zero(sel * _lift(e))

            def assert_eq(self, a, b):
                self.assert_zero(_lift(a) - _lift(b))

        return _When()

    def when_first_row(self):
        return self.when(self.is_first_row)

    def when_last_row(self):
        return self.when(self.is_last_row)

    def when_transition(self):
        return self.when(self.is_transition)


class Air:
    """Base class for AIRs: subclasses define widths and eval(builder)."""

    width_main: int
    width_prep: int = 0
    num_publics: int = 0

    def periodic_columns(self) -> list:
        """Verifier-recomputable periodic columns (reference
        `verifier/periodic.rs`): each a power-of-two-length canonical u32
        array whose values repeat every `len` rows.  Evaluated natively
        (and in-circuit) at ζ instead of being committed — free width for
        round-constant-style patterns."""
        return []

    def cache_key(self) -> tuple:
        """Stable identity for compiled-kernel caches (override when the
        constraint set depends on more than the widths)."""
        return (
            type(self).__name__,
            self.width_main,
            self.width_prep,
            self.num_publics,
        )

    def eval(self, builder: AirBuilder):
        raise NotImplementedError

    def build(
        self, num_perm_ext: int = 0, num_challenges: int = 0
    ) -> AirBuilder:
        b = AirBuilder(
            self.width_main,
            self.width_prep,
            self.num_publics,
            num_perm_ext,
            num_challenges,
            num_periodic=len(self.periodic_columns()),
        )
        self.eval(b)
        return b


def constraint_degree(e: SExpr, cache: dict | None = None) -> int:
    if cache is None:
        cache = {}
    if e.eid in cache:
        return cache[e.eid]
    if isinstance(e, (Var, RowSel)):
        d = 1
    elif isinstance(e, (Const, Public, Challenge, Terminal)):
        d = 0
    elif isinstance(e, Bin):
        da, db = constraint_degree(e.a, cache), constraint_degree(e.b, cache)
        d = da + db if e.op == "mul" else max(da, db)
    else:
        raise TypeError(type(e))
    cache[e.eid] = d
    return d


def max_constraint_degree(constraints: list[SExpr]) -> int:
    cache: dict = {}
    return max((constraint_degree(c, cache) for c in constraints), default=0)


def log_quotient_degree(constraints: list[SExpr]) -> int:
    # quotient deg multiple = next_pow2(max_deg - 1), at least 1 chunk
    d = max(max_constraint_degree(constraints) - 1, 1)
    return (d - 1).bit_length()


# ----- evaluation -----


class Evaluator:
    """Evaluates constraint DAGs given bindings for leaves.

    Bindings supply, for each leaf class, arrays:
      main/preprocessed: offset -> ('base', (..., width)) during LDE
                         evaluation, or ('ext', (..., width, D)) when
                         evaluating at ζ with opened extension values
      perm:              offset -> (..., width, D) ext
      publics:           per-index base scalars (broadcastable)
      challenges:        per-index (D,) ext
      row selectors:     kind -> ('base'|'ext', array)
    Works with N = LDE height (device quotient eval) or scalars (at-ζ eval).
    """

    def __init__(self, field: Monty31, ext: BinomialExtension, xp):
        self.F, self.E, self.xp = field, ext, xp

    def _promote(self, a, b):
        (ka, va), (kb, vb) = a, b
        if ka == kb:
            return ka, va, vb
        if ka == "base":
            return "ext", self.E.from_base(va, self.xp), vb
        return "ext", va, self.E.from_base(vb, self.xp)

    def run(self, exprs: list[SExpr], bindings: dict) -> list[tuple[str, Any]]:
        F, E, xp = self.F, self.E, self.xp
        cache: dict[int, tuple[str, Any]] = {}

        def ev(e: SExpr):
            got = cache.get(e.eid)
            if got is not None:
                return got
            if isinstance(e, Const):
                v = ("base", xp.asarray(np.uint32(e.value % F.P)))
            elif isinstance(e, Public):
                v = ("base", bindings["publics"][e.idx])
            elif isinstance(e, Challenge):
                v = ("ext", bindings["challenges"][e.idx])
            elif isinstance(e, Terminal):
                v = ("ext", bindings["terminals"][e.idx])
            elif isinstance(e, RowSel):
                v = bindings["sels"][e.kind]
            elif isinstance(e, Var):
                if e.segment == "perm":
                    v = ("ext", bindings["perm"][e.offset][..., e.col, :])
                else:
                    kind, arr = bindings[e.segment][e.offset]
                    v = (
                        ("ext", arr[..., e.col, :])
                        if kind == "ext"
                        else ("base", arr[..., e.col])
                    )
            elif isinstance(e, Bin):
                kind, va, vb = self._promote(ev(e.a), ev(e.b))
                alg = E if kind == "ext" else F
                if e.op == "add":
                    v = (kind, alg.add(va, vb, xp))
                elif e.op == "sub":
                    v = (kind, alg.sub(va, vb, xp))
                else:
                    v = (kind, alg.mul(va, vb, xp))
            else:
                raise TypeError(type(e))
            cache[e.eid] = v
            return v

        return [ev(c) for c in exprs]

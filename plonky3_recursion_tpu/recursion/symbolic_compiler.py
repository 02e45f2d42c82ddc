"""Symbolic-AIR → circuit compiler.

TPU-native equivalent of the reference's `SymbolicCompiler`
(`circuit/src/symbolic/compiler.rs:24`; SURVEY.md §2.1): walks the
`stark.symbolic` constraint DAG with a memo cache and emits circuit ops,
resolving Var/Public/Challenge/Terminal/RowSel leaves to caller-provided
targets.  In-circuit every value is an extension target, so the base/ext
promotion of the native evaluator disappears.
"""

from __future__ import annotations

from ..stark.symbolic import (
    Bin,
    Challenge,
    Const,
    Public,
    RowSel,
    SExpr,
    Terminal,
    Var,
)


def compile_exprs(builder, exprs: list[SExpr], bindings: dict) -> list[int]:
    """bindings:
    main/preprocessed/perm: offset -> list of targets
    publics / challenges / terminals: list of targets
    sels: kind -> target
    """
    cache: dict[int, int] = {}

    def ev(e: SExpr) -> int:
        got = cache.get(e.eid)
        if got is not None:
            return got
        if isinstance(e, Const):
            t = builder.const(e.value)
        elif isinstance(e, Public):
            t = bindings["publics"][e.idx]
        elif isinstance(e, Challenge):
            t = bindings["challenges"][e.idx]
        elif isinstance(e, Terminal):
            t = bindings["terminals"][e.idx]
        elif isinstance(e, RowSel):
            t = bindings["sels"][e.kind]
        elif isinstance(e, Var):
            t = bindings[e.segment][e.offset][e.col]
        elif isinstance(e, Bin):
            a, b = ev(e.a), ev(e.b)
            if e.op == "add":
                t = builder.add(a, b)
            elif e.op == "sub":
                t = builder.sub(a, b)
            else:
                t = builder.mul(a, b)
        else:
            raise TypeError(type(e))
        cache[e.eid] = t
        return t

    return [ev(e) for e in exprs]


def fold_constraints_circuit(builder, exprs, bindings, alpha_target) -> int:
    """Σ α^i·C_i as a circuit target (Horner over the constraint list:
    acc = acc·α + C_{n-1-i}, avoiding explicit power targets)."""
    vals = compile_exprs(builder, exprs, bindings)
    acc = builder.zero
    for v in reversed(vals):
        acc = builder.mul_add(acc, alpha_target, v)
    return acc

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

    def leaf(e: SExpr):
        if isinstance(e, Const):
            return builder.const(e.value)
        if isinstance(e, Public):
            return bindings["publics"][e.idx]
        if isinstance(e, Challenge):
            return bindings["challenges"][e.idx]
        if isinstance(e, Terminal):
            return bindings["terminals"][e.idx]
        if isinstance(e, RowSel):
            return bindings["sels"][e.kind]
        if isinstance(e, Var):
            return bindings[e.segment][e.offset][e.col]
        raise TypeError(type(e))

    def ev(root: SExpr) -> int:
        # iterative post-order walk — deep Horner/fold chains exceed
        # Python's recursion limit (the reference deliberately walks
        # iteratively too, `circuit/src/symbolic/compiler.rs:24-47`)
        stack = [(root, False)]
        while stack:
            e, ready = stack.pop()
            if e.eid in cache:
                continue
            if not isinstance(e, Bin):
                cache[e.eid] = leaf(e)
                continue
            if not ready:
                stack.append((e, True))
                stack.append((e.a, False))
                stack.append((e.b, False))
                continue
            a, b = cache[e.a.eid], cache[e.b.eid]
            if e.op == "add":
                t = builder.add(a, b)
            elif e.op == "sub":
                t = builder.sub(a, b)
            else:
                t = builder.mul(a, b)
            cache[e.eid] = t
        return cache[root.eid]

    return [ev(e) for e in exprs]


def fold_constraints_circuit(builder, exprs, bindings, alpha_target) -> int:
    """Σ α^i·C_i as a circuit target (Horner over the constraint list;
    packed K-step table rows when a Horner NPO is enabled)."""
    vals = compile_exprs(builder, exprs, bindings)
    return builder.horner_eval(alpha_target, vals)

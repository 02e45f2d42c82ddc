"""Circuit expression graph with CSE (reference `p3-circuit` expr layer).

TPU-native redesign of the reference's `Expr`/`ExpressionGraph`/
`ExpressionBuilder` (`circuit/src/expr.rs:12`,
`circuit/src/builder/expression_builder.rs:190`; SURVEY.md §2.1):
an append-only node list over extension-field values with constant pooling
and binary-op CSE keyed on (op, operands).  Public inputs are NOT deduped
(each occupies its own bus slot, matching the reference).

Node kinds: CONST / PUBLIC / PRIVATE (hint) / ADD / SUB / MUL / DIV /
BOOL / MULADD / NPO_OUT.  Values are D-coefficient tuples of canonical ints.
"""

from __future__ import annotations

import dataclasses

CONST = 0
PUBLIC = 1
PRIVATE = 2
ADD = 3
SUB = 4
MUL = 5
DIV = 6
BOOL = 7  # boolean check (value preserved, constrains v^2 = v)
MULADD = 8  # a*b + c
NPO_OUT = 9  # output anchor of a non-primitive op

_ARITY = {ADD: 2, SUB: 2, MUL: 2, DIV: 2, BOOL: 1, MULADD: 3}


@dataclasses.dataclass
class Node:
    kind: int
    operands: tuple  # ExprIds
    value: tuple | None = None  # const value (D ints)
    meta: int = 0  # public position / private index / npo (op_id, out_idx)


class ExprGraph:
    def __init__(self, d: int, debug: bool = False):
        self.d = d
        self.nodes: list[Node] = []
        self.const_pool: dict[tuple, int] = {}
        self.cse_pool: dict[tuple, int] = {}
        self.num_publics = 0
        self.num_privates = 0
        # allocation log (reference AllocationLog, feature `debugging`):
        # per node, the scope path + label active at creation
        self.debug = debug
        self.alloc_log: list = []
        self.scope_provider = None  # set by CircuitBuilder
        # ExprId 0 is always const zero (reference ExprId::ZERO)
        self.const(tuple([0] * d))

    def _push(self, node: Node) -> int:
        self.nodes.append(node)
        if self.debug:
            scope = self.scope_provider() if self.scope_provider else ""
            self.alloc_log.append((len(self.nodes) - 1, node.kind, scope))
        return len(self.nodes) - 1

    def const(self, value: tuple) -> int:
        value = tuple(int(v) for v in value)
        assert len(value) == self.d
        got = self.const_pool.get(value)
        if got is not None:
            return got
        eid = self._push(Node(CONST, (), value=value))
        self.const_pool[value] = eid
        return eid

    def public(self) -> int:
        eid = self._push(Node(PUBLIC, (), meta=self.num_publics))
        self.num_publics += 1
        return eid

    def private(self) -> int:
        eid = self._push(Node(PRIVATE, (), meta=self.num_privates))
        self.num_privates += 1
        return eid

    def op(self, kind: int, *operands: int) -> int:
        assert len(operands) == _ARITY[kind], (kind, operands)
        key = (kind,) + operands
        got = self.cse_pool.get(key)
        if got is not None:
            return got
        eid = self._push(Node(kind, operands))
        self.cse_pool[key] = eid
        return eid

    def npo_out(self, op_id: int, out_idx: int) -> int:
        return self._push(Node(NPO_OUT, (), meta=(op_id, out_idx)))

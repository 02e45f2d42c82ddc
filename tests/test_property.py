"""Property-based IR invariants (hypothesis).

Mirrors the reference's proptest suites over the expression graph and ID
types (`circuit/src/expr.rs:300-391`, `circuit/src/types.rs:554-621`;
SURVEY.md §4 "Property tests"): CSE never merges publics, constant pooling
is by value, operand IDs precede node IDs (append-only topology), the
connect-DSU aliases exactly the connected classes, and witness execution
respects the aliasing (agreeing duplicate writes pass, disagreeing ones
raise WitnessConflict).
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from plonky3_recursion_tpu.circuit import CircuitBuilder
from plonky3_recursion_tpu.circuit.expr import (
    ADD,
    CONST,
    MUL,
    MULADD,
    PUBLIC,
    SUB,
)
from plonky3_recursion_tpu.circuit.runner import WitnessConflict
from plonky3_recursion_tpu.fields import KOALA_BEAR, ext_field

E4 = ext_field(KOALA_BEAR, 4)
P = KOALA_BEAR.P

# ops the random-DAG strategy draws from: (builder method, arity)
_OPS = [("add", 2), ("sub", 2), ("mul", 2), ("mul_add", 3)]


def _rand_dag(draw, n_publics, n_consts, n_ops):
    """Build a random DAG; returns (builder, eids, replay) where replay is
    [(kind, operand_positions)] for ground-truth evaluation."""
    b = CircuitBuilder(E4)
    eids = []
    replay = []
    for _ in range(n_publics):
        eids.append(b.public_input())
        replay.append(("public", ()))
    for _ in range(n_consts):
        v = draw(st.integers(0, P - 1))
        eids.append(b.const(v))
        replay.append(("const", (v,)))
    for _ in range(n_ops):
        name, arity = draw(st.sampled_from(_OPS))
        args = tuple(
            draw(st.integers(0, len(eids) - 1)) for _ in range(arity)
        )
        eids.append(getattr(b, name)(*[eids[a] for a in args]))
        replay.append((name, args))
    return b, eids, replay


@settings(max_examples=30, deadline=None)
@given(st.data())
def test_cse_same_key_same_id(data):
    """Identical (op, operands) pairs always return the SAME ExprId, and
    the graph stays append-only: every operand id < its node id."""
    b, eids, replay = _rand_dag(
        data.draw,
        n_publics=data.draw(st.integers(1, 4)),
        n_consts=data.draw(st.integers(1, 4)),
        n_ops=data.draw(st.integers(1, 30)),
    )
    # replaying every op yields the identical ExprId (CSE hit, no new node)
    n_nodes = len(b.g.nodes)
    for i, (kind, args) in enumerate(replay):
        if kind in ("public", "const"):
            continue
        again = getattr(b, kind)(*[eids[a] for a in args])
        assert again == eids[i]
    assert len(b.g.nodes) == n_nodes, "CSE replay must not append nodes"
    for eid, node in enumerate(b.g.nodes):
        for o in node.operands:
            assert o < eid, "operand ids must precede the node id"


@settings(max_examples=20, deadline=None)
@given(n=st.integers(1, 20))
def test_publics_never_deduped(n):
    """Every public_input() call allocates a fresh node with a fresh
    position — publics are never CSE-merged (reference expression_builder
    pools consts and binary ops ONLY)."""
    b = CircuitBuilder(E4)
    ids = [b.public_input() for _ in range(n)]
    assert len(set(ids)) == n
    metas = [b.g.nodes[e].meta for e in ids]
    assert metas == list(range(n))
    assert all(b.g.nodes[e].kind == PUBLIC for e in ids)


@settings(max_examples=30, deadline=None)
@given(vals=st.lists(st.integers(0, P - 1), min_size=1, max_size=20))
def test_const_pooling_by_value(vals):
    """const() pools by value: equal values share one node, distinct
    values get distinct nodes."""
    b = CircuitBuilder(E4)
    ids = [b.const(v) for v in vals]
    by_val = {}
    for v, e in zip(vals, ids):
        if v in by_val:
            assert by_val[v] == e
        else:
            by_val[v] = e
    assert len(set(ids)) == len(set(vals))


def _eval_replay(replay, pub_vals):
    """Ground-truth evaluation over python ints (coefficient 0 only —
    base-embedded values)."""
    out = []
    pi = 0
    for kind, args in replay:
        if kind == "public":
            out.append(pub_vals[pi] % P)
            pi += 1
        elif kind == "const":
            out.append(args[0] % P)
        elif kind == "add":
            out.append((out[args[0]] + out[args[1]]) % P)
        elif kind == "sub":
            out.append((out[args[0]] - out[args[1]]) % P)
        elif kind == "mul":
            out.append(out[args[0]] * out[args[1]] % P)
        else:  # mul_add
            out.append(
                (out[args[0]] * out[args[1]] + out[args[2]]) % P
            )
    return out


@settings(max_examples=25, deadline=None)
@given(st.data())
def test_connect_dsu_aliases_exact_classes(data):
    """connect(a, b) makes a and b share ONE witness id; ids differ across
    DSU classes (checked against an independent union-find), and execution
    agrees with ground truth on every tagged value."""
    n_publics = data.draw(st.integers(2, 4))
    n_ops = data.draw(st.integers(2, 25))
    b, eids, replay = _rand_dag(
        data.draw, n_publics=n_publics, n_consts=2, n_ops=n_ops
    )
    pub_vals = [
        data.draw(st.integers(0, P - 1)) for _ in range(n_publics)
    ]
    truth = _eval_replay(replay, pub_vals)
    # connect pairs that agree on value (so execution stays satisfiable)
    by_val: dict = {}
    for i, v in enumerate(truth):
        by_val.setdefault(v, []).append(i)
    candidates = [g for g in by_val.values() if len(g) > 1]
    parent = list(range(len(eids)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    n_connects = data.draw(st.integers(0, 3))
    for _ in range(min(n_connects, len(candidates))):
        grp = data.draw(st.sampled_from(candidates))
        i = data.draw(st.sampled_from(grp))
        j = data.draw(st.sampled_from(grp))
        b.connect(eids[i], eids[j])
        parent[find(i)] = find(j)
    for i in range(len(eids)):
        b.tag(f"t{i}", eids[i])
    circuit = b.build()
    wid = [circuit.tags[f"t{i}"] for i in range(len(eids))]
    for i in range(len(eids)):
        for j in range(i + 1, len(eids)):
            # NOTE: CSE may merge i/j into one expr node (same id) and the
            # optimizer may alias further classes only via connects/BOOL
            if eids[i] == eids[j] or find(i) == find(j):
                assert wid[i] == wid[j], (i, j)
    r = circuit.runner()
    r.set_public_inputs(pub_vals)
    traces = r.run()
    for i in range(len(eids)):
        got = traces.probe(f"t{i}")
        assert int(got[0]) == truth[i], i
        assert all(int(x) == 0 for x in got[1:])


@settings(max_examples=15, deadline=None)
@given(st.data())
def test_connect_disagreeing_values_conflict(data):
    """Connecting two wires that must carry DIFFERENT values makes the
    runner raise WitnessConflict (the runtime face of the free equality
    constraint)."""
    a_v = data.draw(st.integers(0, P - 1))
    delta = data.draw(st.integers(1, P - 1))
    b_v = (a_v + delta) % P
    b = CircuitBuilder(E4)
    pa = b.public_input()
    pb = b.public_input()
    b.connect(pa, pb)
    circuit = b.build()
    r = circuit.runner()
    with pytest.raises((WitnessConflict, ValueError)):
        r.set_public_inputs([a_v, b_v])
        r.run()


@settings(max_examples=20, deadline=None)
@given(st.data())
def test_witness_ids_dense_and_unique(data):
    """Witness ids form a dense range [0, witness_count) and unconnected
    leaves never share a wid (allocator uniqueness, reference
    `types.rs:554-621`)."""
    n_publics = data.draw(st.integers(1, 6))
    b, eids, replay = _rand_dag(
        data.draw, n_publics=n_publics, n_consts=3,
        n_ops=data.draw(st.integers(1, 15)),
    )
    for i in range(len(eids)):
        b.tag(f"t{i}", eids[i])
    c = b.build()
    wids = [c.tags[f"t{i}"] for i in range(len(eids))]
    assert all(0 <= w < c.witness_count for w in wids)
    pub_wids = c.public_rows
    assert len(set(pub_wids)) == len(pub_wids), "publics share no slots"
    # every wid in the circuit's tables is in range
    for row in c.alu_rows:
        for w in (row.a, row.b, row.c, row.out):
            assert 0 <= w < c.witness_count

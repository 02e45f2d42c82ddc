"""Circuit compilation: connect-DSU lowering, scheduling, bus analysis.

TPU-native redesign of the reference's lowerer + optimizer
(`circuit/src/builder/compiler/`; SURVEY.md §2.1):

* `connect` pairs are resolved with a union-find so connected expressions
  share one witness slot ("free" equality, reference ConnectDsu).
* Each witness class has exactly one CREATOR (priority: const > public >
  npo output > alu by node order > private); other defining rows demote to
  CHECK rows (write-once bus: duplicate writes must agree — reference
  footnote `construction.md:189`).
* Rows are scheduled into topological LEVELS (longest path over the
  creator-dependency graph) so the runner executes each level as one
  vectorized gather-compute-scatter — the TPU-native answer to the
  reference's linear `execute_all` walk.
* Bus multiplicity analysis: per witness, one sender with mult = T−1 over
  T total touches, every other touch receives with −1 (LogUp bus balance,
  `book/.../lookups.md`).  CSE at the expression layer subsumes the
  reference's ALU-dedup pass; MulAdd fusion exists as the MULADD node.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .expr import (
    ADD,
    BOOL,
    CONST,
    DIV,
    MUL,
    MULADD,
    NPO_OUT,
    PRIVATE,
    PUBLIC,
    SUB,
)

# ALU row kinds in the compiled circuit / AluAir selectors
K_ADD = 0
K_MUL = 1
K_MULADD = 2
K_BOOL = 3

SLOT_A, SLOT_B, SLOT_C, SLOT_OUT = 0, 1, 2, 3
SOLVE_OUT, SOLVE_A, SOLVE_CHECK = 0, 1, 2


@dataclasses.dataclass
class AluRow:
    kind: int
    a: int
    b: int
    c: int
    out: int
    solve: int
    level: int = -1
    # per-slot bus multiplicities (python ints, signed), filled by analysis
    mults: tuple = (0, 0, 0, 0)
    node: int = -1  # originating ExprId (debug)

    def slots(self):
        if self.kind == K_BOOL:
            return [(SLOT_A, self.a)]
        if self.kind == K_MULADD:
            return [
                (SLOT_A, self.a),
                (SLOT_B, self.b),
                (SLOT_C, self.c),
                (SLOT_OUT, self.out),
            ]
        return [(SLOT_A, self.a), (SLOT_B, self.b), (SLOT_OUT, self.out)]


@dataclasses.dataclass
class HintOp:
    fn: object
    inputs: list  # wids
    outputs: list  # wids
    level: int = -1
    kind: str = ""
    meta: int = 0


@dataclasses.dataclass
class NpoInstance:
    plugin: object
    config: object
    inputs: list  # wids (None = chained / private slot)
    outputs: list  # wids (None = output not exposed)
    op_id: int
    tag: object = None
    level: int = -1
    new_start: bool = True
    merkle_path: bool = False
    merkle_arity: int = 2
    chain: object = None
    prev_op: int | None = None
    sum_out: int | None = None  # wid of the bound mmcs_index_sum
    sum_mult: int = 0


@dataclasses.dataclass
class Circuit:
    """Compiled static circuit spec (reference `Circuit`,
    `circuit/src/circuit.rs:153`)."""

    ext: object
    witness_count: int
    const_rows: list  # [(wid, value_tuple, mult)]
    public_rows: list  # position -> wid
    public_mults: list
    private_rows: list  # all private positions -> wid
    external_private_rows: list  # prover-supplied privates, input order
    alu_rows: list  # list[AluRow]
    hint_ops: list  # list[HintOp]
    npo_calls: list  # list[NpoInstance]
    num_levels: int
    tags: dict
    enabled_ops: dict
    read_counts: np.ndarray

    def runner(self):
        from .runner import CircuitRunner

        return CircuitRunner(self)


class _Dsu:
    def __init__(self, n):
        self.p = list(range(n))

    def find(self, x):
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)


def compile_circuit(builder) -> Circuit:
    g = builder.g
    n_nodes = len(g.nodes)
    dsu = _Dsu(n_nodes)
    # BOOL nodes alias their operand (assertion-only, no new value)
    for eid, node in enumerate(g.nodes):
        if node.kind == BOOL:
            dsu.union(eid, node.operands[0])
    for a, b in builder.connects:
        dsu.union(a, b)

    # ----- MulAdd fusion (reference optimizer pass, 3-phase a·b+c
    # detection, `circuit/src/builder/compiler/optimizer/fuse_mul_add.rs`):
    # an ADD node fed by a MUL node whose class is used NOWHERE else
    # lowers as one MULADD row; the MUL's witness class is never
    # allocated.  Runs pre-wid-assignment so no dead slots exist.
    ARITH = (ADD, SUB, MUL, DIV, MULADD)
    class_nodes: dict[int, list[int]] = {}
    for eid in range(n_nodes):
        class_nodes.setdefault(dsu.find(eid), []).append(eid)
    root_uses: dict[int, int] = {}
    add_operand_use: dict[int, tuple] = {}  # mul root -> (add eid, other op)

    def _ruse(e):
        r = dsu.find(e)
        root_uses[r] = root_uses.get(r, 0) + 1

    for eid, node in enumerate(g.nodes):
        if node.kind in ARITH:
            for o in node.operands:
                _ruse(o)
        elif node.kind == BOOL:
            _ruse(node.operands[0])
    for h in builder.hints:
        for e in h.inputs + h.outputs:
            _ruse(e)
    for c in builder.npos:
        for e in list(c.inputs) + list(c.outputs) + [c.sum_out]:
            if e is not None:
                _ruse(e)
    for e in builder.tags.values():
        _ruse(e)
    for eid, node in enumerate(g.nodes):
        if node.kind == ADD:
            for pos, o in enumerate(node.operands):
                add_operand_use.setdefault(dsu.find(o), []).append(
                    (eid, node.operands[1 - pos])
                )
    dead_mul: set[int] = set()  # MUL eids lowered into their consumer
    fused_add: dict[int, tuple] = {}  # ADD eid -> (mul eid, other operand)
    for eid, node in enumerate(g.nodes):
        if node.kind != MUL:
            continue
        r = dsu.find(eid)
        if len(class_nodes[r]) != 1 or root_uses.get(r, 0) != 1:
            continue
        consumers = add_operand_use.get(r, [])
        if len(consumers) != 1:
            continue
        add_eid, other = consumers[0]
        if add_eid in fused_add:
            continue  # both operands of one ADD are single-use MULs
        dead_mul.add(eid)
        fused_add[add_eid] = (eid, other)

    # witness ids per class, in order of class-root first appearance
    # (fused-away MUL classes get no witness slot)
    wid_of_root: dict[int, int] = {}
    wid_of_node: list[int] = [-1] * n_nodes
    for eid in range(n_nodes):
        if eid in dead_mul:
            continue
        root = dsu.find(eid)
        if root not in wid_of_root:
            wid_of_root[root] = len(wid_of_root)
        wid_of_node[eid] = wid_of_root[root]
    witness_count = len(wid_of_root)

    # choose creators per class: const > public > npo_out > alu > private
    PRI = {CONST: 0, PUBLIC: 1, NPO_OUT: 2, ADD: 3, SUB: 3, MUL: 3, DIV: 3, MULADD: 3, PRIVATE: 4, BOOL: 5}
    creator_node: dict[int, int] = {}
    for eid, node in enumerate(g.nodes):
        if eid in dead_mul:
            continue
        w = wid_of_node[eid]
        cur = creator_node.get(w)
        if cur is None or (PRI[node.kind], eid) < (PRI[g.nodes[cur].kind], cur):
            creator_node[w] = eid
    # consistency: two different consts merged -> contradiction
    const_val: dict[int, tuple] = {}
    for eid, node in enumerate(g.nodes):
        if node.kind == CONST:
            w = wid_of_node[eid]
            if w in const_val and const_val[w] != node.value:
                raise ValueError("connect() merged two distinct constants")
            const_val[w] = node.value

    # build rows
    const_rows = []  # (wid, value)
    seen_const_wid = set()
    public_rows: list[int] = [0] * g.num_publics
    private_rows: dict[int, int] = {}  # private index -> wid
    alu_rows: list[AluRow] = []
    for eid, node in enumerate(g.nodes):
        if eid in dead_mul:
            continue
        w = wid_of_node[eid]
        is_creator = creator_node[w] == eid
        k = node.kind
        if k == CONST:
            if is_creator and w not in seen_const_wid:
                seen_const_wid.add(w)
                const_rows.append((w, node.value))
        elif k == PUBLIC:
            public_rows[node.meta] = w
        elif k == PRIVATE:
            private_rows[node.meta] = w
        elif k == ADD and eid in fused_add:
            m_eid, other = fused_add[eid]
            m = g.nodes[m_eid]
            row = AluRow(
                K_MULADD,
                wid_of_node[m.operands[0]],
                wid_of_node[m.operands[1]],
                wid_of_node[other],
                w,
                SOLVE_OUT if is_creator else SOLVE_CHECK,
                node=eid,
            )
            alu_rows.append(row)
        elif k in (ADD, MUL, MULADD):
            ops = [wid_of_node[o] for o in node.operands]
            kind = {ADD: K_ADD, MUL: K_MUL, MULADD: K_MULADD}[k]
            row = AluRow(
                kind,
                ops[0],
                ops[1],
                ops[2] if k == MULADD else 0,
                w,
                SOLVE_OUT if is_creator else SOLVE_CHECK,
                node=eid,
            )
            alu_rows.append(row)
        elif k in (SUB, DIV):
            # s = a - b  ->  ADD(a=s, b=b, out=a); q = a/b -> MUL(q, b, a)
            a_w = wid_of_node[node.operands[0]]
            b_w = wid_of_node[node.operands[1]]
            kind = K_ADD if k == SUB else K_MUL
            row = AluRow(
                kind,
                w,
                b_w,
                0,
                a_w,
                SOLVE_A if is_creator else SOLVE_CHECK,
                node=eid,
            )
            alu_rows.append(row)
        elif k == BOOL:
            alu_rows.append(
                AluRow(K_BOOL, w, 0, 0, 0, SOLVE_CHECK, node=eid)
            )
        elif k == NPO_OUT:
            pass  # handled via NpoInstance
        else:
            raise ValueError(k)

    # hints and NPOs over witness ids
    hint_ops = [
        HintOp(
            h.fn,
            [wid_of_node[e] for e in h.inputs],
            [wid_of_node[e] for e in h.outputs],
            kind=h.kind,
            meta=h.meta,
        )
        for h in builder.hints
    ]
    npo_calls = [
        NpoInstance(
            c.plugin,
            c.config,
            [None if e is None else wid_of_node[e] for e in c.inputs],
            [None if e is None else wid_of_node[e] for e in c.outputs],
            c.op_id,
            c.tag,
            new_start=c.new_start,
            merkle_path=c.merkle_path,
            merkle_arity=c.merkle_arity,
            chain=c.chain,
            prev_op=c.prev_op,
            sum_out=None if c.sum_out is None else wid_of_node[c.sum_out],
        )
        for c in builder.npos
    ]

    # external privates tracked at NODE level: a prover-supplied private may
    # share a witness class with hint/NPO outputs (e.g. a commit-phase
    # digest connected to an in-circuit recomputed Merkle root); the
    # external input is still the level-0 creator and the later writer
    # becomes a runtime consistency check.
    hint_out_nodes = {e for h in builder.hints for e in h.outputs}
    external_private_rows = [
        wid_of_node[eid]
        for eid, node in enumerate(g.nodes)
        if node.kind == PRIVATE and eid not in hint_out_nodes
    ]

    # ----- level scheduling (longest path over creator dependencies) -----
    level_of_wid = np.full(witness_count, -1, dtype=np.int64)
    for w, _v in const_rows:
        level_of_wid[w] = 0
    for w in public_rows:
        level_of_wid[w] = 0
    for w in external_private_rows:
        level_of_wid[w] = 0

    # iterate until fixpoint (simple worklist; circuits are DAGs by
    # construction, cyclic connects raise after no progress)
    pending_alu = [
        r for r in alu_rows if r.solve in (SOLVE_OUT, SOLVE_A)
    ]
    pending_hints = list(hint_ops)
    pending_npos = list(npo_calls)
    npo_by_op = {c.op_id: c for c in npo_calls}
    progress = True
    while (pending_alu or pending_hints or pending_npos) and progress:
        progress = False
        next_alu = []
        for r in pending_alu:
            deps = [w for s, w in r.slots() if s != _solve_slot(r)]
            if all(level_of_wid[w] >= 0 for w in deps):
                lvl = 1 + max((level_of_wid[w] for w in deps), default=0)
                r.level = lvl
                tgt = _solve_wid(r)
                if level_of_wid[tgt] < 0 or level_of_wid[tgt] > lvl:
                    level_of_wid[tgt] = lvl
                progress = True
            else:
                next_alu.append(r)
        pending_alu = next_alu
        next_h = []
        for h in pending_hints:
            if all(level_of_wid[w] >= 0 for w in h.inputs):
                h.level = 1 + max(
                    (int(level_of_wid[w]) for w in h.inputs), default=0
                )
                for w in h.outputs:
                    if level_of_wid[w] < 0:
                        level_of_wid[w] = h.level
                progress = True
            else:
                next_h.append(h)
        pending_hints = next_h
        next_n = []
        for c in pending_npos:
            in_wids = [w for w in c.inputs if w is not None]
            prev = npo_by_op.get(c.prev_op) if c.prev_op is not None else None
            prev_ready = prev is None or prev.level >= 0
            if prev_ready and all(level_of_wid[w] >= 0 for w in in_wids):
                deps = [int(level_of_wid[w]) for w in in_wids]
                if prev is not None:
                    deps.append(prev.level)
                c.level = 1 + max(deps, default=0)
                for w in c.outputs + [c.sum_out]:
                    if w is not None and level_of_wid[w] < 0:
                        level_of_wid[w] = c.level
                progress = True
            else:
                next_n.append(c)
        pending_npos = next_n
    if pending_alu or pending_hints or pending_npos:
        raise ValueError(
            "cyclic or underdetermined circuit: "
            f"{len(pending_alu)} alu / {len(pending_hints)} hints / "
            f"{len(pending_npos)} npos unscheduled"
        )
    # check rows run after all their operands exist
    for r in alu_rows:
        if r.solve == SOLVE_CHECK:
            deps = [w for _s, w in r.slots()]
            if any(level_of_wid[w] < 0 for w in deps):
                raise ValueError("check row references undefined witness")
            r.level = 1 + max(int(level_of_wid[w]) for w in deps)
    num_levels = 1 + max(
        [r.level for r in alu_rows]
        + [h.level for h in hint_ops]
        + [c.level for c in npo_calls]
        + [0]
    )

    # ----- bus multiplicity analysis -----
    touches: list[list] = [[] for _ in range(witness_count)]
    for ci, (w, _v) in enumerate(const_rows):
        touches[w].append(("const", ci, 0))
    for pos, w in enumerate(public_rows):
        touches[w].append(("public", pos, 0))
    for ri, r in enumerate(alu_rows):
        for s, w in r.slots():
            touches[w].append(("alu", ri, s))
    for ni, c in enumerate(npo_calls):
        for pos, w in enumerate(c.inputs):
            if w is not None:
                touches[w].append(("npo_in", ni, pos))
        for pos, w in enumerate(c.outputs):
            if w is not None:
                touches[w].append(("npo_out", ni, pos))
        if c.sum_out is not None:
            touches[c.sum_out].append(("npo_out", ni, len(c.outputs)))

    def sender_priority(t, r_solve_slot):
        kind = t[0]
        if kind == "const":
            return 0
        if kind == "public":
            return 1
        if kind == "npo_out":
            return 2
        if kind == "alu":
            ri, s = t[1], t[2]
            return 3 if s == _solve_slot(alu_rows[ri]) else 5
        return 6  # npo_in last

    alu_mults = [[0, 0, 0, 0] for _ in alu_rows]
    const_mults = [0] * len(const_rows)
    public_mults = [0] * len(public_rows)
    read_counts = np.zeros(witness_count, dtype=np.int64)
    npo_in_mult: dict[tuple, int] = {}
    npo_out_mult: dict[tuple, int] = {}
    for w, ts in enumerate(touches):
        if not ts:
            continue
        sender = min(ts, key=lambda t: (sender_priority(t, None),))
        t_count = len(ts)
        read_counts[w] = t_count - 1
        for t in ts:
            mult = (t_count - 1) if t is sender else -1
            kind, i, s = t
            if kind == "alu":
                alu_mults[i][s] += mult
            elif kind == "const":
                const_mults[i] += mult
            elif kind == "public":
                public_mults[i] += mult
            elif kind == "npo_in":
                npo_in_mult[(i, s)] = npo_in_mult.get((i, s), 0) + mult
            elif kind == "npo_out":
                npo_out_mult[(i, s)] = npo_out_mult.get((i, s), 0) + mult
    for ri, r in enumerate(alu_rows):
        r.mults = tuple(alu_mults[ri])
    for ni, c in enumerate(npo_calls):
        c.in_mults = [
            npo_in_mult.get((ni, pos), 0) for pos in range(len(c.inputs))
        ]
        c.out_mults = [
            npo_out_mult.get((ni, pos), 0) for pos in range(len(c.outputs))
        ]
        c.sum_mult = npo_out_mult.get((ni, len(c.outputs)), 0)

    const_rows = [
        (w, v, const_mults[i]) for i, (w, v) in enumerate(const_rows)
    ]
    tags = {name: wid_of_node[e] for name, e in builder.tags.items()}
    return Circuit(
        ext=builder.E,
        witness_count=witness_count,
        const_rows=const_rows,
        public_rows=public_rows,
        public_mults=public_mults,
        private_rows=[w for _i, w in sorted(private_rows.items())],
        external_private_rows=external_private_rows,
        alu_rows=alu_rows,
        hint_ops=hint_ops,
        npo_calls=npo_calls,
        num_levels=num_levels,
        tags=tags,
        enabled_ops=dict(builder.enabled_ops),
        read_counts=read_counts,
    )


def _solve_slot(r: AluRow) -> int:
    if r.solve == SOLVE_OUT:
        return SLOT_OUT
    if r.solve == SOLVE_A:
        return SLOT_A
    return -1


def _solve_wid(r: AluRow) -> int:
    return r.out if r.solve == SOLVE_OUT else r.a

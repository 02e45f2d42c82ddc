"""Batch-stark verifier circuit: the full native verifier lowered to ops.

TPU-native equivalent of the reference's `verify_p3_batch_proof_circuit` /
`verify_batch_circuit` (`recursion/src/verifier/batch_stark.rs:167,323`)
plus its FRI verifier circuit (`recursion/src/pcs/fri/verifier.rs:1371`)
and input builders (`recursion/src/public_inputs.rs`); SURVEY.md §2.4.

The circuit replays, against `stark.batch.verify_batch` bit-for-bit:
instance-binding observations, challenge derivation (LogUp α/β pairs, the
constraint-fold α, ζ) through the in-circuit challenger, per-instance
constraint evaluation at ζ via the symbolic compiler with
`folded == Q(ζ)·Z_H(ζ)`, lookup terminal-sum zero check, and the whole FRI
verification: per-query reduced openings with in-circuit MMCS paths,
β-fold chain with pair-position selects, per-height roll-ins, and the
final-polynomial Horner check.  Query index bits come from in-circuit
`sample_bits`.

Value visibility: the outer circuit exposes ONLY (a) the inner circuit's
offline preprocessed commitment — the identity pin, 8 targets — and (b)
the inner's APP public block (the propagated application statement).
Everything else — trace/perm/quotient commitments, lookup terminals,
opened values, FRI query data, Merkle siblings — is PRIVATE witness data:
it is jointly constrained by the in-circuit transcript replay (challenges
are derived in-circuit, so Fiat-Shamir binds the private commitments) and
the in-circuit MMCS/FRI checks.  This keeps the outer public-input count
CONSTANT across recursion layers, which together with the value-free
circuit structure gives the verifier-circuit fixed point (the reference
reaches the same effect by proving primitive tables with empty per-table
public values, `batch_stark_prover.rs:1495-1520`, and passing
`table_public_inputs: vec![]` when chaining, `recursion.rs:136`).
Allocation and proof-packing can never drift: every allocated target
carries an extractor closure, and `pack_*` simply runs the closures
against the inner proof.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..circuit.builder import CircuitBuilder
from ..fields.monty31 import U32
from ..stark.batch import BatchProof, CommonData
from ..stark.lookups import add_lookup_constraints, num_perm_cols
from ..stark.symbolic import AirBuilder
from ..stark.uni import StarkConfig
from .challenger_circuit import CircuitChallenger
from .mmcs_circuit import MmcsGadget
from .symbolic_compiler import fold_constraints_circuit


@dataclasses.dataclass
class VerifierCircuitResult:
    """Compiled verifier circuit + input packing (reference
    `VerifierCircuitResult`, `recursion.rs:143`)."""

    builder: CircuitBuilder
    public_extractors: list
    private_extractors: list
    # native transcript replay data (query-index derivation at pack time)
    config: object = None
    record: list = dataclasses.field(default_factory=list)
    src: dict = dataclasses.field(default_factory=dict)
    npo_specs: list = dataclasses.field(default_factory=list)
    # positions of the propagated APP block within THIS circuit's own
    # public-input layout (feed as app_public_idx when recursing on it)
    app_public_positions: list = dataclasses.field(default_factory=list)

    def pack_public_inputs(self, proof: BatchProof) -> list:
        return [f(proof) for f in self.public_extractors]

    def pack_private_inputs(self, proof: BatchProof) -> list:
        return [f(proof) for f in self.private_extractors]

    def query_indices(self, proof: BatchProof) -> list:
        """Native replay of the circuit's transcript record -> the FRI
        query indices of `proof` (needed to supply merkle direction bits
        as NPO private data).

        Fast path: a proof produced in-process carries the prover's own
        sampled indices (`FriProof.query_indices` — derived data, never
        serialized), skipping the replay entirely; deserialized proofs
        fall back to the full replay.  The indices only feed PRIVATE data
        (direction bits / siblings), so a wrong value cannot forge a
        proof — the in-circuit sample_bits re-derives and constrains them."""
        cached = getattr(proof.fri, "query_indices", None)
        if cached is not None:
            return list(cached)
        nodes = self.builder.g.nodes
        from ..circuit.expr import CONST

        ch = self.config.challenger()
        indices = []
        for ev in self.record:
            if ev[0] == "o":
                eid = ev[1]
                node = nodes[eid]
                if node.kind == CONST:
                    v = int(node.value[0])
                else:
                    kind, i = self.src[eid]
                    f = (
                        self.public_extractors[i]
                        if kind == "pub"
                        else self.private_extractors[i]
                    )
                    v = int(f(proof))
                ch.observe(v)
            elif ev[0] == "s":
                for _ in range(ev[1]):
                    ch.sample()
            else:  # ("i", bits, is_index)
                v = ch.sample()
                if ev[2]:
                    indices.append(v & ((1 << ev[1]) - 1))
        return indices

    def pack_npo_private(self, proof: BatchProof) -> dict:
        """Per-tag NPO private data: merkle direction bits + sibling
        digests for every in-circuit MMCS path (reference
        `set_fri_mmcs_private_data`, `recursion/src/pcs/mmcs.rs:653`)."""
        from ..utils.tracing import span

        with span("query_indices_replay"):
            indices = self.query_indices(proof)
        out = {}
        for spec in self.npo_specs:
            if spec[0] == "in":
                _k, tag, q, ri, log_max, rlm = spec
                idx = indices[q] >> (log_max - rlm)
                _rows, sibs = proof.fri.query_proofs[q].input_openings[ri]
            else:  # ("ph", tag, q, ph, shift, levels)
                _k, tag, q, ph, shift, _levels = spec
                idx = indices[q] >> shift
                _row, sibs = proof.fri.query_proofs[q].commit_steps[ph]
            # with Merkle caps the native path is cap_height levels
            # shorter; the circuit's chain length matches len(sibs)
            for lv in range(len(sibs)):
                out[(tag, lv)] = {
                    "bit": (idx >> lv) & 1,
                    "sibling": np.asarray(sibs[lv], dtype=U32),
                }
        return out


class _Alloc:
    def __init__(self, builder: CircuitBuilder):
        self.b = builder
        self.pub: list = []
        self.priv: list = []
        self.src: dict = {}  # eid -> ("pub"|"priv", index)
        self.npo_specs: list = []

    def public(self, extract):
        t = self.b.public_input()
        self.src[t] = ("pub", len(self.pub))
        self.pub.append(extract)
        return t

    def private(self, extract):
        t = self.b.private_input()
        self.src[t] = ("priv", len(self.priv))
        self.priv.append(extract)
        return t

    def public_vec(self, n, extract_i):
        return [self.public(_bind(extract_i, i)) for i in range(n)]

    def private_vec(self, n, extract_i):
        return [self.private(_bind(extract_i, i)) for i in range(n)]


def _bind(f, *args):
    # keeps trailing call-args open so vec-index binding composes
    return lambda pf, *rest: f(pf, *args, *rest)


def build_batch_verifier_circuit(
    config: StarkConfig,
    airs_lookups: list,
    shapes: list,
    common: CommonData,
    builder: CircuitBuilder | None = None,
    npo_type_id: str | None = None,
    terminal_checks: list | None = None,
    tag_ns: str = "",
    app_public_idx: list | None = None,
    horner_k: int = 8,
) -> VerifierCircuitResult:
    """Lower `verify_batch(config, airs_lookups, proof, common)` into a
    circuit for proofs with the given instance shapes.

    terminal_checks: optional [(inst_idx, rows)] where each row is
    (mult_int, idx_int, value_spec); value_spec is a D-tuple of ints
    (static constants) or ("public", flat_index) referencing the inner
    public values.  The circuit recomputes those instances' LogUp terminals
    from first principles and connects them to the claimed terminals —
    the in-circuit analog of the native verifier's Public terminal
    recomputation (which binds the claimed public inputs to the bus).

    app_public_idx: flat indices (into the concatenated inner publics) of
    the APP block — the propagated application statement.  Those targets
    are PUBLIC inputs of the outer circuit (re-exposed verbatim); all
    other inner publics are private witnesses, bound through the inner
    Public-table terminal recomputation.  None = every inner public is app
    (the base layer).
    """
    F, E = config.field, config.ext
    P = config.pcs.params
    p = F.P
    d = E.D
    if builder is None:
        builder = CircuitBuilder(E)
        from ..prover.horner_table import horner_npo_for
        from ..prover.poseidon2_table import poseidon2_npo_for
        from ..prover.recompose_table import recompose_npo_for

        npo = poseidon2_npo_for(F.name, d=d)
        builder.enable_op(npo)
        builder.enable_recompose(recompose_npo_for(F.name, d=d))
        builder.enable_horner(horner_npo_for(F.name, horner_k, d=d))
        npo_type_id = npo.type_id
    b = builder
    al = _Alloc(b)
    # cross-hash (reference ChallengerPermConfig): the transcript replay
    # may ride a different permutation table than the Merkle paths
    ch_npo_id = npo_type_id
    ch_npo = getattr(config, "challenger_npo", None)
    if ch_npo is not None:
        if ch_npo.type_id not in b.enabled_ops:
            b.enable_op(ch_npo)
        ch_npo_id = ch_npo.type_id
    ch = CircuitChallenger(b, ch_npo_id)
    mmcs = MmcsGadget(b, npo_type_id)

    names = sorted({lk.name for _a, lks in airs_lookups for lk in lks})
    challenge_idx = {nm: 2 * i for i, nm in enumerate(names)}
    builders = []
    for (air, lks), s in zip(airs_lookups, shapes):
        ab = AirBuilder(
            air.width_main,
            s.width_prep,
            s.num_publics,
            num_perm_ext=num_perm_cols(lks),
            num_challenges=2 * len(names),
        )
        air.eval(ab)
        add_lookup_constraints(ab, lks, challenge_idx)
        builders.append(ab)

    # ----- transcript: instance binding -----
    ch.observe(b.const(len(shapes)))
    for s in shapes:
        for v in (
            s.log_n,
            s.width_main,
            s.width_prep,
            s.num_publics,
            1 << s.log_quotient_degree,
        ):
            ch.observe(b.const(v))
    # the inner circuit's offline preprocessed commitment: the outer
    # circuit's identity pin for the inner.  A PUBLIC input (reference
    # `StarkVerifierInputs` slot 3, `public_inputs.rs:328-343`) so the
    # circuit structure stays independent of the inner commitment value —
    # the prerequisite for verifier-circuit fixed points across layers.
    # Merkle caps: each commitment is 8·2^cap targets (cap clamped per
    # tree height, matching the native MMCS; reference MerkleCapTargets)
    cap_cfg = getattr(config.pcs, "cap_height", 0)

    def _cap_len(log_h: int) -> int:
        return 8 << min(cap_cfg, log_h)

    max_lm = max(s.log_n for s in shapes) + P.log_blowup
    prep_commit_t = None
    if common.prep_commitment is not None:
        prep_lm = (
            max(shapes[i].log_n for i, _l, _w in common.prep_shapes)
            + P.log_blowup
        )
        prep_commit_t = al.public_vec(
            _cap_len(prep_lm),
            lambda pf, i: int(np.asarray(pf.prep_commitment)[i]),
        )
        ch.observe_slice(prep_commit_t)
    # ZK (hiding) inner proofs: the random masking round's commitment is
    # observed between prep and trace, mirroring prove_batch
    zk = config.pcs.hiding_salt_cols > 0
    random_commit_t = None
    if zk:
        random_commit_t = al.private_vec(
            _cap_len(max_lm),
            lambda pf, i: int(np.asarray(pf.random_commit)[i]),
        )
        ch.observe_slice(random_commit_t)
    trace_commit = al.private_vec(
        _cap_len(max_lm), lambda pf, i: int(pf.trace_commit[i])
    )
    ch.observe_slice(trace_commit)
    inner_publics = []
    app_positions = []  # positions of app targets in the OUTER public layout
    flat_i = 0
    for ii, s in enumerate(shapes):
        ptargets = []
        for i in range(s.num_publics):
            extract = _bind(
                lambda pf, ii, i: int(pf.publics[ii][i]), ii, i
            )
            if app_public_idx is None or flat_i in app_public_idx:
                app_positions.append(len(al.pub))
                ptargets.append(al.public(extract))
            else:
                ptargets.append(al.private(extract))
            flat_i += 1
        inner_publics.append(ptargets)
        ch.observe_slice(ptargets)
    challenges = {}
    for nm in names:
        a_t = ch.sample_ext()
        b_t = ch.sample_ext()
        challenges[nm] = (a_t, b_t)
    has_perm = any(lks for _a, lks in airs_lookups)
    term_targets: dict[int, int] = {}
    if has_perm:
        perm_lm = (
            max(
                shapes[i].log_n
                for i, (_a, lks) in enumerate(airs_lookups)
                if lks
            )
            + P.log_blowup
        )
        perm_commit = al.private_vec(
            _cap_len(perm_lm), lambda pf, i: int(pf.perm_commit[i])
        )
        ch.observe_slice(perm_commit)
        # one terminal per (instance, GLOBAL lookup), flattened in
        # instance order — mirrors the native proof layout
        flat_gl = [
            (i, lk)
            for i, (_a, lks) in enumerate(airs_lookups)
            for lk in lks
            if lk.kind == "global"
        ]
        flat_tts = []
        for k, (ii, _lk) in enumerate(flat_gl):
            coeffs = al.private_vec(
                d,
                _bind(
                    lambda pf, k, j: int(
                        np.asarray(pf.lookup_terminals[k][1]).reshape(-1)[j]
                    ),
                    k,
                ),
            )
            ch.observe_slice(coeffs)
            tt = b.recompose_base_coeffs_to_ext(coeffs)
            flat_tts.append(tt)
            term_targets.setdefault(ii, []).append(tt)
    alpha = ch.sample_ext()
    quotient_commit = al.private_vec(
        _cap_len(max_lm), lambda pf, i: int(pf.quotient_commit[i])
    )
    ch.observe_slice(quotient_commit)
    zeta = ch.sample_ext()

    # ----- lookup terminal sums == 0, per bus name -----
    if term_targets:
        by_name: dict[str, list] = {}
        for (_ii, lk), tt in zip(flat_gl, flat_tts):
            by_name.setdefault(lk.name, []).append(tt)
        for tts in by_name.values():
            b.assert_zero(b.add_many(tts))

    # ----- native-terminal recomputation for static/public tables -----
    flat_publics = [t for ts in inner_publics for t in ts]
    for inst_idx, rows in terminal_checks or []:
        a_t, b_t = challenges["WitnessChecks"]
        acc = b.zero
        for mult, idx, value_spec in rows:
            if mult % p == 0:
                continue
            if value_spec and value_spec[0] == "public":
                vals = [
                    flat_publics[value_spec[1] + j] for j in range(d)
                ]
            else:
                vals = [b.const(int(v)) for v in value_spec]
            # idx + Σ_j v_j·α^{1+j} as one Horner chain
            comp = b.horner_eval(a_t, [b.const(idx)] + vals)
            acc = b.add(acc, b.div(b.const(mult % p), b.sub(b_t, comp)))
        # static tables carry the single WitnessChecks bus terminal
        b.connect(acc, term_targets[inst_idx][0])

    # ----- allocate opened values (private) -----
    def tr_open(pf, ii, which, c, j):
        return int(np.asarray(pf.trace_openings[ii][which])[c, j])

    trace_opens = []  # [inst][offset][col] ext targets
    for ii, s in enumerate(shapes):
        per = []
        for which in (0, 1):
            cols = []
            for c in range(s.width_main):
                coeffs = al.private_vec(
                    d, _bind(tr_open, ii, which, c)
                )
                cols.append(b.recompose_base_coeffs_to_ext(coeffs))
            per.append(cols)
        trace_opens.append(per)

    prep_order = [i for i, _l, _w2 in common.prep_shapes]

    def prep_open(pf, k, which, c, j):
        return int(np.asarray(pf.prep_openings[k][1 + which])[c, j])

    prep_opens: dict[int, list] = {}
    for k, ii in enumerate(prep_order):
        per = []
        for which in (0, 1):
            cols = []
            for c in range(shapes[ii].width_prep):
                coeffs = al.private_vec(d, _bind(prep_open, k, which, c))
                cols.append(b.recompose_base_coeffs_to_ext(coeffs))
            per.append(cols)
        prep_opens[ii] = per

    perm_order = [i for i, (_a, lks) in enumerate(airs_lookups) if lks]

    def perm_open(pf, k, which, c, j):
        return int(np.asarray(pf.perm_openings[k][1 + which])[c, j])

    perm_opens_flat: dict[int, list] = {}
    for k, ii in enumerate(perm_order):
        per = []
        npc = shapes[ii].num_perm_cols
        for which in (0, 1):
            cols = []
            for c in range(npc * d):
                coeffs = al.private_vec(d, _bind(perm_open, k, which, c))
                cols.append(b.recompose_base_coeffs_to_ext(coeffs))
            per.append(cols)
        perm_opens_flat[ii] = per

    def q_open(pf, ii, ci, c, j):
        return int(np.asarray(pf.quotient_chunks[ii][ci])[c, j])

    q_opens = []  # [inst][chunk][col] ext targets
    for ii, s in enumerate(shapes):
        chunks = []
        for ci in range(1 << s.log_quotient_degree):
            cols = []
            for c in range(d):
                coeffs = al.private_vec(d, _bind(q_open, ii, ci, c))
                cols.append(b.recompose_base_coeffs_to_ext(coeffs))
            chunks.append(cols)
        q_opens.append(chunks)

    # ----- per-instance constraint check at ζ -----
    basis = [
        b.const(tuple(1 if j == k else 0 for j in range(d))) for k in range(d)
    ]
    for ii, ((air, lks), s, ab) in enumerate(
        zip(airs_lookups, shapes, builders)
    ):
        n = 1 << s.log_n
        g_inv = b.const(pow(F.two_adic_generator(s.log_n), p - 2, p))
        zeta_n = b.exp_power_of_2(zeta, s.log_n)
        z_h = b.sub(zeta_n, b.one())
        first = b.div(z_h, b.sub(zeta, b.one()))
        transition = b.sub(zeta, g_inv)
        last = b.div(z_h, transition)
        # perm recompose from flattened base-coefficient columns
        perm_local_next = [[], []]
        if ii in perm_opens_flat:
            for which in (0, 1):
                flat = perm_opens_flat[ii][which]
                for cc in range(s.num_perm_cols):
                    acc = b.zero
                    for k in range(d):
                        acc = b.mul_add(flat[cc * d + k], basis[k], acc)
                    perm_local_next[which].append(acc)
        bindings = {
            "main": {0: trace_opens[ii][0], 1: trace_opens[ii][1]},
            "periodic": {0: _periodic_targets(b, F, air, s.log_n, zeta)},
            "preprocessed": {
                0: prep_opens.get(ii, [[], []])[0],
                1: prep_opens.get(ii, [[], []])[1],
            },
            "perm": {0: perm_local_next[0], 1: perm_local_next[1]},
            "publics": inner_publics[ii],
            "challenges": [
                challenges[nm][j] for nm in names for j in (0, 1)
            ],
            "terminals": term_targets.get(ii, []),
            "sels": {"first": first, "last": last, "transition": transition},
        }
        folded = fold_constraints_circuit(b, ab.constraints, bindings, alpha)
        # recompose Q(ζ) from chunks (native denominators)
        lq = s.log_quotient_degree
        qdeg = 1 << lq
        wq = F.two_adic_generator(s.log_n + lq)
        u_n = pow(wq, n, p)
        s_n = pow(int(F.generator), n, p)
        q_zeta = b.zero
        for ci in range(qdeg):
            q_i = b.zero
            for k in range(d):
                q_i = b.mul_add(q_opens[ii][ci][k], basis[k], q_i)
            w_t = b.one()
            den = 1
            for j in range(qdeg):
                if j == ci:
                    continue
                cj = s_n * pow(u_n, j, p) % p
                w_t = b.mul(w_t, b.sub(zeta_n, b.const(cj)))
                den = den * (s_n * (pow(u_n, ci, p) - pow(u_n, j, p)) % p) % p
            w_t = b.mul(w_t, b.const(pow(den, p - 2, p)))
            q_zeta = b.mul_add(q_i, w_t, q_zeta)
        b.connect(folded, b.mul(q_zeta, z_h))

    # ----- FRI verification -----
    # round structure mirrors verify_batch's rounds_v
    rounds = []  # (commit_targets, [(log_n, [(point, [col ext targets])])], dims, extractors)
    zgs = {}
    for s in shapes:
        if s.log_n not in zgs:
            zgs[s.log_n] = b.mul(
                zeta, b.const(F.two_adic_generator(s.log_n))
            )
    if zk:

        def rnd_open(pf, c, j):
            return int(np.asarray(pf.random_opening)[c, j])

        random_opens = []
        for c in range(2 * d):
            coeffs = al.private_vec(d, _bind(rnd_open, c))
            random_opens.append(b.recompose_base_coeffs_to_ext(coeffs))
        rounds.append(
            (
                "random",
                random_commit_t,
                [(max(s.log_n for s in shapes), [(zeta, random_opens)])],
            )
        )
    trace_mats = []
    for ii, s in enumerate(shapes):
        trace_mats.append(
            (
                s.log_n,
                [
                    (zeta, trace_opens[ii][0]),
                    (zgs[s.log_n], trace_opens[ii][1]),
                ],
            )
        )
    rounds.append(("trace", trace_commit, trace_mats))
    if common.prep_commitment is not None:
        prep_mats = []
        for k, ii in enumerate(prep_order):
            s = shapes[ii]
            prep_mats.append(
                (
                    s.log_n,
                    [
                        (zeta, prep_opens[ii][0]),
                        (zgs[s.log_n], prep_opens[ii][1]),
                    ],
                )
            )
        rounds.append(("prep", prep_commit_t, prep_mats))
    if has_perm:
        perm_mats = []
        for k, ii in enumerate(perm_order):
            s = shapes[ii]
            perm_mats.append(
                (
                    s.log_n,
                    [
                        (zeta, perm_opens_flat[ii][0]),
                        (zgs[s.log_n], perm_opens_flat[ii][1]),
                    ],
                )
            )
        rounds.append(("perm", perm_commit, perm_mats))
    q_mats = []
    for ii, s in enumerate(shapes):
        for ci in range(1 << s.log_quotient_degree):
            q_mats.append((s.log_n, [(zeta, q_opens[ii][ci])]))
    rounds.append(("quotient", quotient_commit, q_mats))

    _verify_fri_circuit(config, b, al, ch, mmcs, rounds, P, tag_ns=tag_ns)

    return VerifierCircuitResult(
        b,
        al.pub,
        al.priv,
        config=config,
        record=ch.record,
        src=al.src,
        npo_specs=al.npo_specs,
        app_public_positions=app_positions,
    )


def _periodic_targets(b, F, air, log_n: int, zeta: int) -> list:
    """In-circuit c(ζ) = p(ζ^{n/L}) per periodic column: one
    exp_power_of_2 chain + a (packed) Horner over CONSTANT interpolant
    coefficients (reference `verifier/periodic.rs:1-30`)."""
    from ..ops.ntt import intt
    from ..fields.monty31 import U32 as _U32

    targets = []
    for col in air.periodic_columns():
        col = np.asarray(col, dtype=_U32)
        L = col.shape[0]
        step = (1 << log_n) // L
        zs = (
            b.exp_power_of_2(zeta, step.bit_length() - 1)
            if step > 1
            else zeta
        )
        coeffs = intt(F, col[:, None], np)[:, 0]
        targets.append(
            b.horner_eval(zs, [b.const(int(c)) for c in coeffs])
        )
    return targets


def _verify_fri_circuit(config, b, al, ch, mmcs, rounds, P, tag_ns: str = ""):
    """In-circuit mirror of `TwoAdicFriPcs.verify` (fri_pcs.py)."""
    F, E = config.field, config.ext
    p = F.P
    d = E.D

    # 1-2. observe opened values, sample alpha (matches fri_pcs order)
    for _name, _ct, mats in rounds:
        for _log_n, pts in mats:
            for _z, cols in pts:
                for t in cols:
                    ch.observe_ext(t)
    alpha = ch.sample_ext()

    # block-start powers of alpha: each (round, matrix, point) block of w
    # columns is reduced by ONE Horner chain and scaled by α^k (k = global
    # column offset).  Only the block-start powers are materialized —
    # α^w for the distinct widths via square-and-multiply, then a running
    # product — instead of the full α^0..α^{total_cols-1} chain.
    _apow_cache: dict[int, int] = {}

    def _alpha_pow(n: int) -> int:
        t = _apow_cache.get(n)
        if t is None:
            if n == 0:
                t = b.one()
            elif n == 1:
                t = alpha
            else:
                half = _alpha_pow(n // 2)
                t = b.mul(half, half)
                if n % 2:
                    t = b.mul(t, alpha)
            _apow_cache[n] = t
        return t
    # 3. commit phases (variable arity schedule, derived like the prover)
    from ..stark.fri_pcs import fri_phase_schedule

    heights = [
        log_n + P.log_blowup for _n, _c, mats in rounds for log_n, _p2 in mats
    ]
    log_max = max(heights)
    log_final = P.log_final_poly_len + P.log_blowup
    # Static soundness check (mirrors TwoAdicFriPcs.verify): any matrix
    # below the final fold height would have its reduced openings silently
    # dropped by the fold chain — unconstrained claimed values.  Heights
    # are circuit-shape constants, so this is a build-time rejection.
    if min(heights) < log_final:
        raise ValueError(
            "proof shape has a matrix below the FRI final fold height; "
            "its openings would be unconstrained in-circuit"
        )
    schedule = fri_phase_schedule(P, log_max, tuple(set(heights)))
    offsets = []
    _off = 0
    for _a in schedule:
        offsets.append(_off)
        _off += _a
    num_phases = len(schedule)

    def phase_digest(pf, ph, i):
        return int(pf.fri.commit_digests[ph][i])

    cap_cfg = getattr(config.pcs, "cap_height", 0)
    betas = []
    phase_commits = []
    for ph in range(num_phases):
        ph_log_h = log_max - offsets[ph] - schedule[ph]
        dig = al.private_vec(
            mmcs.DIGEST << min(cap_cfg, ph_log_h), _bind(phase_digest, ph)
        )
        phase_commits.append(dig)
        ch.observe_slice(dig)
        if P.commit_pow_bits:
            w = al.private(
                _bind(lambda pf, ph: int(pf.fri.commit_pow_witnesses[ph]), ph)
            )
            ch.check_pow_witness(w, P.commit_pow_bits)
        betas.append(ch.sample_ext())
    final_len = 1 << P.log_final_poly_len

    def final_coeff(pf, i, j):
        return int(np.asarray(pf.fri.final_coeffs)[i, j])

    final_coeffs = []
    for i in range(final_len):
        coeffs = al.private_vec(d, _bind(final_coeff, i))
        t = b.recompose_base_coeffs_to_ext(coeffs)
        final_coeffs.append(t)
        for c in coeffs:
            ch.observe(c)
    if P.query_pow_bits:
        w = al.private(lambda pf: int(pf.fri.pow_witness))
        ch.check_pow_witness(w, P.query_pow_bits)

    # precompute y_red per (round, matrix, point) — shared across queries.
    # y_red = α^k · Σ_c cols[c]·α^c: one packed Horner chain per block plus
    # a scale by the block-start power (reference HornerAcc usage in
    # `open_input`, fri/verifier.rs:1068).
    y_reds = []
    k = 0
    for _name, _ct, mats in rounds:
        for log_n, pts in mats:
            for z, cols in pts:
                ak = _alpha_pow(k)
                acc = b.mul(b.horner_eval(alpha, list(cols)), ak)
                y_reds.append((log_n, z, acc, ak, len(cols)))
                k += len(cols)

    round_log_max = [
        max(log_n + P.log_blowup for log_n, _p2 in mats)
        for _n, _c, mats in rounds
    ]
    inv2 = b.const(pow(2, p - 2, p))

    # per-query verification
    for q in range(P.num_queries):
        bits = ch.sample_bits(log_max, is_index=True)

        def x_from_bits(log_h, shift_int, bit_targets):
            """shift · ω^{rev(idx)} from LSB-first bit targets."""
            wgen = F.two_adic_generator(log_h)
            x = b.const(shift_int)
            m = len(bit_targets)
            for bi, bit in enumerate(bit_targets):
                factor = pow(wgen, 1 << (m - 1 - bi), p)
                x = b.mul(x, b.select(bit, b.const(factor), b.one()))
            return x

        # input openings + MMCS per round
        def open_row(pf, q, ri, mi, c):
            rows, _sibs = pf.fri.query_proofs[q].input_openings[ri]
            return int(np.asarray(rows[mi])[c])

        acc: dict[int, int] = {}
        yi = 0
        for ri, (_name, commit_t, mats) in enumerate(rounds):
            rlm = round_log_max[ri]
            rbits = bits[log_max - rlm :] if rlm < log_max else bits
            opened_rows = []
            dims = []
            for mi, (log_n, pts) in enumerate(mats):
                w = len(pts[0][1])
                row = al.private_vec(w, _bind(open_row, q, ri, mi))
                opened_rows.append(row)
                dims.append((1 << (log_n + P.log_blowup), w))
            # hiding commitments: salt rows are hashed into the Merkle
            # leaves (and so must enter the in-circuit path check) but are
            # NOT polynomial data — they never join the α-reduction
            for si, (sh, sw) in enumerate(
                config.pcs.salt_dims([h for h, _w in dims])
            ):
                row = al.private_vec(
                    sw, _bind(open_row, q, ri, len(mats) + si)
                )
                opened_rows.append(row)
                dims.append((sh, sw))
            tag = ("mmcsp", tag_ns, q, ri)
            al.npo_specs.append(("in", tag, q, ri, log_max, rlm))
            mmcs.verify_batch(commit_t, dims, rbits, opened_rows, tag)
            for mi, (log_n, pts) in enumerate(mats):
                log_h = log_n + P.log_blowup
                hbits = bits[log_max - log_h :] if log_h < log_max else bits
                x = x_from_bits(log_h, int(F.generator), hbits)
                # one Horner reduction of the opened row, shared by every
                # opening point of this matrix (the row is z-independent)
                h_row = b.horner_eval(alpha, list(opened_rows[mi]))
                for z, _cols in pts:
                    _ln, _z, y_red, ak, w = y_reds[yi]
                    yi += 1
                    p_red = b.mul(h_row, ak)
                    term = b.div(b.sub(p_red, y_red), b.sub(x, z))
                    acc[log_h] = (
                        term
                        if log_h not in acc
                        else b.add(acc[log_h], term)
                    )
        # fold chain (variable arity)
        folded = acc[log_max]
        log_size = log_max
        shift = int(F.generator)

        def pair_coeff(pf, q, ph, i):
            row, _s = pf.fri.query_proofs[q].commit_steps[ph]
            return int(np.asarray(row)[i])

        for ph, ar in enumerate(schedule):
            off = offsets[ph]
            group = 1 << ar
            row_flat = al.private_vec(group * d, _bind(pair_coeff, q, ph))
            vals = [
                b.recompose_base_coeffs_to_ext(row_flat[j * d : (j + 1) * d])
                for j in range(group)
            ]
            levels = log_size - ar
            row_bits = bits[off + ar :]
            tag = ("mmcsc", tag_ns, q, ph)
            al.npo_specs.append(("ph", tag, q, ph, off + ar, levels))
            mmcs.verify_batch(
                phase_commits[ph],
                [(1 << levels, group * d)],
                row_bits,
                [row_flat],
                tag,
            )
            # own-position check: select vals[pos] with pos = bits[off:off+ar]
            sel = list(vals)
            for t in range(ar):
                bit = bits[off + t]
                sel = [
                    b.select(bit, sel[2 * j + 1], sel[2 * j])
                    for j in range(len(sel) // 2)
                ]
            b.connect(sel[0], folded)
            # fold the whole row through `ar` radix-2 sub-levels
            beta_t = betas[ph]
            sub_shift = shift
            for t in range(ar):
                m_bits = log_size - t - 1  # pair-index bit length
                wgen = F.two_adic_generator(log_size - t)
                new_vals = []
                for j2 in range(1 << (ar - t - 1)):
                    # pair x: constant part from the static local index j2,
                    # dynamic part from the shared high bits
                    exp_const = 0
                    for bpos in range(ar - t - 1):
                        if (j2 >> bpos) & 1:
                            exp_const += 1 << (m_bits - 1 - bpos)
                    x = b.const(sub_shift * pow(wgen, exp_const, p) % p)
                    for db, bit in enumerate(bits[off + ar :]):
                        qpos = ar - t - 1 + db
                        factor = pow(wgen, 1 << (m_bits - 1 - qpos), p)
                        x = b.mul(x, b.select(bit, b.const(factor), b.one()))
                    va, vb = vals[2 * j2], vals[2 * j2 + 1]
                    even = b.mul(b.add(va, vb), inv2)
                    odd = b.div(b.sub(va, vb), b.mul(b.const(2), x))
                    new_vals.append(b.mul_add(beta_t, odd, even))
                vals = new_vals
                beta_t = b.mul(beta_t, beta_t)
                sub_shift = sub_shift * sub_shift % p
            folded = vals[0]
            shift = sub_shift
            log_size -= ar
            if log_size in acc:
                folded = b.add(folded, acc[log_size])
        # final poly check (packed Horner)
        x_fin = x_from_bits(log_size, shift, bits[_off:])
        expect = b.horner_eval(x_fin, final_coeffs)
        b.connect(expect, folded)

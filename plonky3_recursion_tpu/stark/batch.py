"""Batch-stark: many AIR instances in ONE proof, with LogUp lookups.

TPU-native equivalent of the reference's upstream `p3-batch-stark`
(`prove_batch`, `verify_batch`, `StarkInstance`, `ProverData`, `CommonData`,
`BatchTranscript`; SURVEY.md §2.6).  All instance traces share one Merkle
commitment; preprocessed columns are committed offline once (`CommonData`);
LogUp permutation columns commit in their own round; all quotient chunks
commit together; a single FRI batch opens everything.

Transcript order (instance binding first, mirroring the reference verifier's
observation order, `recursion/src/verifier/batch_stark.rs:522-600`):
  1. observe instance count; per instance: log_n, main width, prep width,
     #publics, #quotient chunks
  2. observe preprocessed commitment (when any instance has one)
  3. observe trace commitment; per instance observe public values
  4. per lookup name (sorted): sample α_L, β_L
  5. observe permutation commitment; per instance observe its lookup
     terminals (expected_cumulated, extension coeffs), one per GLOBAL
     lookup in lookup order
  6. sample α; observe quotient commitment; sample ζ
  7. PCS open rounds in fixed order: trace, preprocessed, permutation,
     quotient — trace/prep/perm at [ζ, ζ·g_i] per instance, chunks at [ζ]

Lookups follow the reference's per-lookup LookupData layout: each lookup
owns an accumulator column + aux columns; GLOBAL lookups carry one
terminal each (balanced per name over all tables), LOCAL lookups close
in-table (accumulator pinned to 0 on the last row, reference p3-lookup
`Kind::Local`).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..fields.monty31 import U32
from ..ops.ntt import _power_table, intt, ntt
from .domains import (
    TwoAdicCoset,
    lde_selectors,
    periodic_at_point,
    periodic_lde,
)
from .lookups import (
    Lookup,
    add_lookup_constraints,
    check_lookups_balance,
    generate_perm_columns,
    global_lookups,
    num_perm_cols,
)
from .merkle import flatten_ext_matrix
from .symbolic import Air, AirBuilder, Evaluator, log_quotient_degree
from .uni import StarkConfig, _fold_constraints, recompose_quotient
from .fri_pcs import FriProof


@dataclasses.dataclass
class StarkInstance:
    air: Air
    trace: np.ndarray  # (n, w) canonical
    publics: list
    preprocessed: np.ndarray | None = None  # (n, wp)
    lookups: list[Lookup] = dataclasses.field(default_factory=list)


@dataclasses.dataclass
class CommonData:
    """Offline-committed preprocessed data shared by prover and verifier."""

    prep_commitment: np.ndarray | None
    prep_shapes: list  # per participating instance (inst_idx, log_n, width)
    prep_data: object | None = None  # PcsProverData (prover side only)


@dataclasses.dataclass
class InstanceShape:
    log_n: int
    width_main: int
    width_prep: int
    num_publics: int
    num_perm_cols: int
    log_quotient_degree: int


@dataclasses.dataclass
class BatchProof:
    shapes: list  # list[InstanceShape]
    trace_commit: np.ndarray
    perm_commit: np.ndarray | None
    quotient_commit: np.ndarray
    # openings, per instance where applicable
    trace_openings: list  # [(local (w,D), next (w,D))]
    prep_openings: list  # [(inst_idx, local, next)]
    perm_openings: list  # [(inst_idx, local (C*D,D), next)]
    quotient_chunks: list  # [inst][chunk] = (D, D)
    lookup_terminals: list  # [(inst_idx, (D,))]
    publics: list
    fri: FriProof
    # the circuit's offline preprocessed commitment (circuit identity;
    # reference carries it via `BatchStarkProof.stark_common`).  In the
    # proof so recursion extractors can feed it as a PUBLIC input of the
    # outer circuit without baking the value into the circuit structure.
    prep_commitment: np.ndarray | None = None
    # ZK (hiding) proofs: the random masking round's commitment and its
    # claimed opening at ζ (reference HidingFriPcs random polynomial)
    random_commit: np.ndarray | None = None
    random_opening: np.ndarray | None = None  # (2·D, D)


def _instance_builder(inst: StarkInstance, challenge_idx: dict[str, int]):
    nper = num_perm_cols(inst.lookups)
    b = AirBuilder(
        inst.air.width_main,
        inst.preprocessed.shape[1] if inst.preprocessed is not None else 0,
        len(inst.publics),
        num_perm_ext=nper,
        num_challenges=2 * len(challenge_idx),
        num_periodic=len(inst.air.periodic_columns()),
    )
    inst.air.eval(b)
    add_lookup_constraints(b, inst.lookups, challenge_idx)
    return b


def commit_preprocessed(config: StarkConfig, instances, xp=np) -> CommonData:
    mats = []
    shapes = []
    for i, inst in enumerate(instances):
        if inst.preprocessed is not None:
            n = inst.preprocessed.shape[0]
            mats.append((1, np.asarray(inst.preprocessed, dtype=U32)))
            shapes.append((i, n.bit_length() - 1, inst.preprocessed.shape[1]))
    if not mats:
        return CommonData(None, [], None)
    data = config.pcs.commit(mats, xp)
    return CommonData(data.commitment, shapes, data)


def _bind_instances(ch, instances_shapes):
    ch.observe(len(instances_shapes))
    for s in instances_shapes:
        ch.observe(s.log_n)
        ch.observe(s.width_main)
        ch.observe(s.width_prep)
        ch.observe(s.num_publics)
        ch.observe(1 << s.log_quotient_degree)


def _lookup_names(instances) -> list[str]:
    names = sorted({lk.name for inst in instances for lk in inst.lookups})
    return names


from ..utils.gcpause import gc_paused_fn


@gc_paused_fn
def prove_batch(
    config: StarkConfig,
    instances: list[StarkInstance],
    common: CommonData | None = None,
    xp=np,
    debug_lookups: bool = False,
) -> BatchProof:
    F, E, pcs = config.field, config.ext, config.pcs
    if common is None:
        common = commit_preprocessed(config, instances, xp)
    from .fused import fused_eligible, fused_prove_batch

    if fused_eligible(config, common):
        # whole-prove fusion: the entire prove (transcript included) as
        # ONE device program — bit-identical proofs (stark/fused.py)
        return fused_prove_batch(
            config, instances, common, debug_lookups=debug_lookups
        )
    names = _lookup_names(instances)
    challenge_idx = {nm: 2 * i for i, nm in enumerate(names)}
    builders = [_instance_builder(inst, challenge_idx) for inst in instances]
    shapes = [
        InstanceShape(
            log_n=inst.trace.shape[0].bit_length() - 1,
            width_main=inst.trace.shape[1],
            width_prep=(
                inst.preprocessed.shape[1] if inst.preprocessed is not None else 0
            ),
            num_publics=len(inst.publics),
            num_perm_cols=num_perm_cols(inst.lookups),
            log_quotient_degree=log_quotient_degree(b.constraints),
        )
        for inst, b in zip(instances, builders)
    ]
    ch = config.challenger()
    _bind_instances(ch, shapes)
    if common.prep_commitment is not None:
        ch.observe_slice(common.prep_commitment)
    # ZK: random masking round (reference HidingFriPcs random polynomial,
    # SURVEY.md §2.4 round order random/trace/quotient/prep/perm).  A
    # uniformly random committed matrix joins the FRI batch with its own
    # α-weights, masking the revealed reduced-opening combinations; the
    # salted MMCS (hiding_salt_cols on the pcs) hides the leaf rows.
    random_data = None
    if pcs.hiding_salt_cols:
        max_ln = max(s.log_n for s in shapes)
        rmat = F.rand(pcs.salt_rng, (1 << max_ln, 2 * E.D))
        random_data = pcs.commit([(1, rmat)], xp)
        ch.observe_slice(random_data.commitment)
    from ..utils.tracing import span

    with span("commit_traces"):
        # device-resident traces pass straight through (no host round-trip)
        trace_data = pcs.commit(
            [
                (
                    1,
                    inst.trace
                    if not isinstance(inst.trace, np.ndarray)
                    else np.asarray(inst.trace, dtype=U32),
                )
                for inst in instances
            ],
            xp,
        )
    ch.observe_slice(trace_data.commitment)
    for inst in instances:
        ch.observe_slice(np.asarray(inst.publics, dtype=U32))
    challenges = {}
    for nm in names:
        a = ch.sample_ext(E)
        b2 = ch.sample_ext(E)
        challenges[nm] = (a, b2)
    # permutation columns
    from ..utils.tracing import span as _span

    perm_mats = []  # (inst_idx, (n, C, D))
    terminals = []
    _perm_span = _span("perm_cols")
    _perm_span.__enter__()
    for i, inst in enumerate(instances):
        if not inst.lookups:
            continue
        n = inst.trace.shape[0]
        tb = {
            "main": {
                0: ("base", xp.asarray(inst.trace)),
                1: ("base", xp.roll(xp.asarray(inst.trace), -1, axis=0)),
            },
            "preprocessed": {
                0: (
                    "base",
                    xp.asarray(inst.preprocessed)
                    if inst.preprocessed is not None
                    else None,
                ),
            },
            "perm": {},
            "publics": [xp.asarray(np.uint32(int(x) % F.P)) for x in inst.publics],
            "challenges": [],
            "terminals": [],
            "sels": {},
        }
        if pcs.use_jit or pcs.mesh is not None:
            continue  # jit/mesh instances run in one fused call below
        perm, terms = generate_perm_columns(
            F, E, inst.lookups, tb, n, challenges, xp
        )
        perm_mats.append((i, np.asarray(perm)))
        terminals.append((i, [np.asarray(t) for t in terms]))
    if pcs.use_jit or pcs.mesh is not None:
        # ONE device program for EVERY instance's permutation columns
        # (rows sharded over the mesh when one is configured)
        with_lk = [
            (i, inst) for i, inst in enumerate(instances) if inst.lookups
        ]
        for (i, _inst), (perm, terms) in zip(
            with_lk, _perm_cols_all_jit(config, with_lk, names, challenges)
        ):
            perm_mats.append((i, perm))  # device-resident
            terminals.append((i, [np.asarray(t) for t in terms]))
    _perm_span.__exit__(None, None, None)
    if debug_lookups and terminals:
        check_lookups_balance(
            [
                (lk.name, t)
                for i, ts in terminals
                for lk, t in zip(global_lookups(instances[i].lookups), ts)
            ],
            E,
        )
    perm_data = None
    if perm_mats:
        with _span("commit_perm"):
            perm_data = pcs.commit(
                [(1, flatten_ext_matrix(pm)) for _i, pm in perm_mats], xp
            )
        ch.observe_slice(perm_data.commitment)
        for _i, ts in terminals:
            for t in ts:
                ch.observe_slice(np.asarray(t))
    alpha = ch.sample_ext(E)
    # quotient per instance
    chunk_mats = []
    chunk_meta = []  # (inst_idx, chunk_idx)
    _q_span = _span("quotient_eval")
    _q_span.__enter__()
    for i, (inst, b, s) in enumerate(zip(instances, builders, shapes)):
        lq = s.log_quotient_degree
        n = 1 << s.log_n
        m = n << lq
        if pcs.use_jit or pcs.mesh is not None:
            pm = next((pm for j, pm in perm_mats if j == i), None)
            terms = next((ts for j, ts in terminals if j == i), None)
            q = _quotient_jit(
                config, inst, b, s, names, challenges, alpha, pm, terms
            )
            qdeg = 1 << lq
            wq = F.two_adic_generator(s.log_n + lq)
            for ci in range(qdeg):
                shift = F.generator * pow(wq, ci, F.P) % F.P
                chunk_mats.append((shift, q[ci::qdeg]))
                chunk_meta.append((i, ci))
            continue
        gpow = xp.asarray(_power_table(F, F.generator, n))

        def to_coset(mat):
            coeffs = intt(F, xp.asarray(mat), xp)
            scaled = F.monty_mul(coeffs, gpow[:, None], xp)
            return ntt(F, xp.pad(scaled, [(0, m - n), (0, 0)]), xp)

        lde_main = to_coset(inst.trace)
        pcols = inst.air.periodic_columns()
        bindings = {
            "main": {
                0: ("base", lde_main),
                1: ("base", xp.roll(lde_main, -(1 << lq), axis=0)),
            },
            "periodic": {
                0: (
                    "base",
                    xp.stack(
                        [
                            periodic_lde(F, c, s.log_n, lq, xp)
                            for c in pcols
                        ],
                        axis=1,
                    ),
                )
            }
            if pcols
            else {},
            "preprocessed": {},
            "perm": {},
            "publics": [
                xp.asarray(np.uint32(int(x) % F.P)) for x in inst.publics
            ],
            "challenges": [
                xp.asarray(challenges[nm][j]) for nm in names for j in (0, 1)
            ],
            "terminals": [],
            "sels": {
                k: ("base", xp.asarray(v))
                for k, v in lde_selectors(F, s.log_n, lq, F.generator).items()
            },
        }
        if inst.preprocessed is not None:
            lde_prep = to_coset(inst.preprocessed)
            bindings["preprocessed"] = {
                0: ("base", lde_prep),
                1: ("base", xp.roll(lde_prep, -(1 << lq), axis=0)),
            }
        pm = next((pm for j, pm in perm_mats if j == i), None)
        if pm is not None:
            flat = flatten_ext_matrix(pm)
            lde_perm = to_coset(flat).reshape(m, s.num_perm_cols, E.D)
            bindings["perm"] = {
                0: lde_perm,
                1: xp.roll(lde_perm, -(1 << lq), axis=0),
            }
            terms = next(ts for j, ts in terminals if j == i)
            bindings["terminals"] = [
                xp.broadcast_to(xp.asarray(t), (E.D,)) for t in terms
            ]
        ev = Evaluator(F, E, xp)
        folded = _fold_constraints(E, b, ev, bindings, alpha, xp)
        q = E.mul_base(
            folded, xp.asarray(bindings["sels"]["inv_vanishing"][1]), xp
        )
        q = np.asarray(q)
        qdeg = 1 << lq
        wq = F.two_adic_generator(s.log_n + lq)
        for ci in range(qdeg):
            shift = F.generator * pow(wq, ci, F.P) % F.P
            chunk_mats.append((shift, q[ci::qdeg]))
            chunk_meta.append((i, ci))
    _q_span.__exit__(None, None, None)
    with span("commit_quotient"):
        q_data = pcs.commit(chunk_mats, xp)
    ch.observe_slice(q_data.commitment)
    zeta = ch.sample_ext(E)
    # open rounds: trace, prep, perm, quotient
    def zg(log_n):
        return E.mul_base(zeta, np.uint32(F.two_adic_generator(log_n)), np)

    rounds = []
    if random_data is not None:
        rounds.append((random_data, [[zeta]]))
    rounds.append((trace_data, [[zeta, zg(s.log_n)] for s in shapes]))
    if common.prep_data is not None:
        rounds.append(
            (
                common.prep_data,
                [[zeta, zg(ln)] for _i, ln, _w in common.prep_shapes],
            )
        )
    if perm_data is not None:
        rounds.append(
            (
                perm_data,
                [[zeta, zg(shapes[i].log_n)] for i, _pm in perm_mats],
            )
        )
    rounds.append((q_data, [[zeta]] * len(chunk_mats)))
    with span("pcs_open"):
        opened, fri_proof = pcs.open(rounds, ch, xp)
    ri = 0
    random_opening = None
    if random_data is not None:
        random_opening = opened[0][0][0]
        ri = 1
    trace_openings = [
        (opened[ri][i][0], opened[ri][i][1]) for i in range(len(instances))
    ]
    ri += 1
    prep_openings = []
    if common.prep_data is not None:
        for k, (i, _ln, _w) in enumerate(common.prep_shapes):
            prep_openings.append((i, opened[ri][k][0], opened[ri][k][1]))
        ri += 1
    perm_openings = []
    if perm_data is not None:
        for k, (i, _pm) in enumerate(perm_mats):
            perm_openings.append((i, opened[ri][k][0], opened[ri][k][1]))
        ri += 1
    qchunks: list[list] = [[] for _ in instances]
    for k, (i, ci) in enumerate(chunk_meta):
        qchunks[i].append(opened[ri][k][0])
    return BatchProof(
        shapes=shapes,
        trace_commit=trace_data.commitment,
        perm_commit=perm_data.commitment if perm_data else None,
        quotient_commit=q_data.commitment,
        trace_openings=trace_openings,
        prep_openings=prep_openings,
        perm_openings=perm_openings,
        quotient_chunks=qchunks,
        lookup_terminals=[
            (i, np.asarray(t)) for i, ts in terminals for t in ts
        ],
        publics=[list(inst.publics) for inst in instances],
        fri=fri_proof,
        prep_commitment=(
            None
            if common.prep_commitment is None
            else np.asarray(common.prep_commitment, dtype=U32)
        ),
        random_commit=(
            np.asarray(random_data.commitment) if random_data else None
        ),
        random_opening=(
            np.asarray(random_opening) if random_opening is not None else None
        ),
    )


def verify_batch(
    config: StarkConfig,
    airs_lookups: list[tuple[Air, list[Lookup]]],
    proof: BatchProof,
    common: CommonData | None = None,
) -> bool:
    F, E, pcs = config.field, config.ext, config.pcs
    p = F.P
    from ..utils.serde import validate_batch_proof

    validate_batch_proof(proof, config)
    want_prep = common.prep_commitment if common is not None else None
    if (proof.prep_commitment is None) != (want_prep is None) or (
        want_prep is not None
        and not np.array_equal(
            np.asarray(proof.prep_commitment, dtype=U32),
            np.asarray(want_prep, dtype=U32),
        )
    ):
        raise ValueError(
            "proof's preprocessed commitment does not match common data"
        )
    names = sorted({lk.name for _a, lks in airs_lookups for lk in lks})
    challenge_idx = {nm: 2 * i for i, nm in enumerate(names)}
    shapes = proof.shapes
    if len(shapes) != len(airs_lookups):
        raise ValueError("instance count mismatch")
    builders = []
    for (air, lks), s in zip(airs_lookups, shapes):
        b = AirBuilder(
            air.width_main,
            s.width_prep,
            s.num_publics,
            num_perm_ext=num_perm_cols(lks),
            num_challenges=2 * len(names),
            num_periodic=len(air.periodic_columns()),
        )
        air.eval(b)
        add_lookup_constraints(b, lks, challenge_idx)
        builders.append(b)
        if air.width_main != s.width_main:
            raise ValueError("main width mismatch")
        if log_quotient_degree(b.constraints) != s.log_quotient_degree:
            raise ValueError("quotient degree mismatch")
        if num_perm_cols(lks) != s.num_perm_cols:
            raise ValueError("perm width mismatch")
    zk = pcs.hiding_salt_cols > 0
    if zk != (proof.random_commit is not None) or zk != (
        proof.random_opening is not None
    ):
        raise ValueError("proof hiding mode does not match config")
    ch = config.challenger()
    _bind_instances(ch, shapes)
    prep_commitment = common.prep_commitment if common else None
    if prep_commitment is not None:
        ch.observe_slice(prep_commitment)
    if zk:
        ch.observe_slice(proof.random_commit)
    ch.observe_slice(proof.trace_commit)
    for pubs in proof.publics:
        ch.observe_slice(np.asarray(pubs, dtype=U32))
    challenges = {}
    for nm in names:
        a = ch.sample_ext(E)
        b2 = ch.sample_ext(E)
        challenges[nm] = (a, b2)
    # terminals arrive flattened [(inst_idx, (D,)), …] — one entry per
    # GLOBAL lookup of each instance, in instance order; enforce that
    # exact shape before consuming them
    expect_seq = [
        i
        for i, (_a, lks) in enumerate(airs_lookups)
        for _lk in global_lookups(lks)
    ]
    if [i for i, _t in proof.lookup_terminals] != expect_seq:
        raise ValueError("lookup terminal layout mismatch")
    terms_by_inst: dict[int, list] = {}
    for i, t in proof.lookup_terminals:
        terms_by_inst.setdefault(i, []).append(np.asarray(t, dtype=U32))
    if proof.perm_commit is not None:
        ch.observe_slice(proof.perm_commit)
        for _i, t in proof.lookup_terminals:
            ch.observe_slice(np.asarray(t))
    alpha = ch.sample_ext(E)
    ch.observe_slice(proof.quotient_commit)
    zeta = ch.sample_ext(E)
    # per-name bus balance (reference per-lookup terminals)
    if proof.lookup_terminals:
        check_lookups_balance(
            [
                (lk.name, t)
                for i, ts in terms_by_inst.items()
                for lk, t in zip(global_lookups(airs_lookups[i][1]), ts)
            ],
            E,
        )
    # per-instance constraint check at ζ
    prep_by_inst = {i: (l, nx) for i, l, nx in proof.prep_openings}
    perm_by_inst = {i: (l, nx) for i, l, nx in proof.perm_openings}
    for i, ((air, lks), s, b) in enumerate(zip(airs_lookups, shapes, builders)):
        dom = TwoAdicCoset(F, s.log_n, 1)
        sels = dom.selectors_at_point(E, zeta, np)
        loc, nxt = proof.trace_openings[i]
        pcols = air.periodic_columns()
        bindings = {
            "main": {
                0: ("ext", np.asarray(loc, dtype=U32)),
                1: ("ext", np.asarray(nxt, dtype=U32)),
            },
            "periodic": {
                0: (
                    "ext",
                    np.stack(
                        [
                            periodic_at_point(F, E, c, s.log_n, zeta)
                            for c in pcols
                        ]
                    ),
                )
            }
            if pcols
            else {},
            "preprocessed": {},
            "perm": {},
            "publics": [np.uint32(int(x) % p) for x in proof.publics[i]],
            "challenges": [
                np.asarray(challenges[nm][j]) for nm in names for j in (0, 1)
            ],
            "terminals": [],
            "sels": {
                "first": ("ext", sels["first"]),
                "last": ("ext", sels["last"]),
                "transition": ("ext", sels["transition"]),
            },
        }
        if i in prep_by_inst:
            pl, pn = prep_by_inst[i]
            bindings["preprocessed"] = {
                0: ("ext", np.asarray(pl, dtype=U32)),
                1: ("ext", np.asarray(pn, dtype=U32)),
            }
        if i in perm_by_inst:
            pl, pn = perm_by_inst[i]
            bindings["perm"] = {
                0: _recompose_rows(E, np.asarray(pl), s.num_perm_cols),
                1: _recompose_rows(E, np.asarray(pn), s.num_perm_cols),
            }
            bindings["terminals"] = terms_by_inst.get(i, [])
        ev = Evaluator(F, E, np)
        folded = _fold_constraints(E, b, ev, bindings, alpha, np)
        lhs = E.mul(folded, sels["inv_vanishing"], np)
        q_zeta = recompose_quotient(
            config, s.log_n, s.log_quotient_degree, zeta, proof.quotient_chunks[i]
        )
        if not np.array_equal(lhs, q_zeta):
            raise ValueError(f"quotient/constraint mismatch at zeta (inst {i})")
    # PCS verification
    def zg(log_n):
        return E.mul_base(zeta, np.uint32(F.two_adic_generator(log_n)), np)

    rounds_v = []
    if zk:
        rounds_v.append(
            (
                proof.random_commit,
                [
                    (
                        max(s.log_n for s in shapes),
                        [(zeta, np.asarray(proof.random_opening))],
                    )
                ],
            )
        )
    rounds_v.append(
        (
            proof.trace_commit,
            [
                (
                    s.log_n,
                    [
                        (zeta, np.asarray(proof.trace_openings[i][0])),
                        (zg(s.log_n), np.asarray(proof.trace_openings[i][1])),
                    ],
                )
                for i, s in enumerate(shapes)
            ],
        )
    )
    if prep_commitment is not None:
        rounds_v.append(
            (
                prep_commitment,
                [
                    (
                        shapes[i].log_n,
                        [
                            (zeta, np.asarray(l)),
                            (zg(shapes[i].log_n), np.asarray(nx)),
                        ],
                    )
                    for i, l, nx in proof.prep_openings
                ],
            )
        )
    if proof.perm_commit is not None:
        rounds_v.append(
            (
                proof.perm_commit,
                [
                    (
                        shapes[i].log_n,
                        [
                            (zeta, np.asarray(l)),
                            (zg(shapes[i].log_n), np.asarray(nx)),
                        ],
                    )
                    for i, l, nx in proof.perm_openings
                ],
            )
        )
    qround = []
    for i, s in enumerate(shapes):
        for ci in range(1 << s.log_quotient_degree):
            qround.append(
                (s.log_n, [(zeta, np.asarray(proof.quotient_chunks[i][ci]))])
            )
    rounds_v.append((proof.quotient_commit, qround))
    pcs.verify(rounds_v, proof.fri, ch)
    return True


def _recompose_rows(E, flat_opened: np.ndarray, num_cols: int) -> np.ndarray:
    """(C·D, D) flattened base-coefficient openings -> (C, D) ext values."""
    out = np.zeros((num_cols, E.D), dtype=U32)
    for c in range(num_cols):
        acc = None
        for d in range(E.D):
            basis = np.zeros((E.D,), dtype=U32)
            basis[d] = 1
            term = E.mul(flat_opened[c * E.D + d], basis, np)
            acc = term if acc is None else E.add(acc, term, np)
        out[c] = acc
    return out


def _perm_cols_all_jit(config, with_lk, names, challenges):
    """Every instance's permutation columns + terminal in ONE compiled
    device program (cached per batch shape signature)."""
    import jax.numpy as jnp

    from ..ops.jitk import perm_cols_fn

    F, E = config.field, config.ext
    mesh = config.pcs.mesh
    shapes = []
    for _i, inst in with_lk:
        n, w = inst.trace.shape
        wp = (
            inst.preprocessed.shape[1]
            if inst.preprocessed is not None
            else 0
        )
        shapes.append((n, w, wp, inst.air.cache_key(), inst.lookups))
    key = (
        "perm_all",
        tuple((n, w, wp, ck) for n, w, wp, ck, _l in shapes),
        tuple(names),
        None if mesh is None else ("mesh", id(mesh), config.pcs.mesh_axis),
    )

    def make():
        def _shard(x):
            if mesh is None:
                return x
            from ..parallel.mesh import _row_sharded

            return _row_sharded(mesh, config.pcs.mesh_axis, x)

        def fn(chal, *args):
            chal_map = {
                nm: (chal[2 * k], chal[2 * k + 1])
                for k, nm in enumerate(names)
            }
            outs = []
            for (n, _w, wp, _ck, lookups), trace, prep in zip(
                shapes, args[::2], args[1::2]
            ):
                trace = _shard(trace)
                prep = _shard(prep)
                tb = {
                    "main": {
                        0: ("base", trace),
                        1: ("base", jnp.roll(trace, -1, axis=0)),
                    },
                    "preprocessed": {
                        0: ("base", prep),
                        1: ("base", jnp.roll(prep, -1, axis=0)),
                    }
                    if wp
                    else {},
                    "perm": {},
                    "publics": [],
                    "challenges": [],
                    "terminals": [],
                    "sels": {},
                }
                perm, terms = generate_perm_columns(
                    F, E, lookups, tb, n, chal_map, jnp
                )
                outs.append((_shard(perm), terms))
            return tuple(outs)

        return fn

    fn = perm_cols_fn(key, make)
    chal = np.stack(
        [challenges[nm][j] for nm in names for j in (0, 1)]
    ).astype(U32)
    args = []
    for _i, inst in with_lk:
        n = inst.trace.shape[0]
        prep = (
            inst.preprocessed
            if inst.preprocessed is not None
            else np.zeros((n, 0), dtype=U32)
        )
        args.extend([inst.trace, prep])
    if mesh is not None:
        with mesh:
            return fn(chal, *args)
    return fn(chal, *args)


def _quotient_jit(config, inst, builder, shape, names, challenges, alpha, pm, terms):
    """Device quotient evaluation, compiled per instance shape."""
    import jax.numpy as jnp

    from ..ops.jitk import quotient_fn

    F, E = config.field, config.ext
    mesh = config.pcs.mesh
    s = shape
    lq = s.log_quotient_degree
    n = 1 << s.log_n
    m = n << lq
    wp = inst.preprocessed.shape[1] if inst.preprocessed is not None else 0
    npc = s.num_perm_cols if pm is not None else 0
    n_terms = len(terms) if terms is not None else 0
    n_pub = len(inst.publics)
    key = (
        "quot",
        inst.air.cache_key(),
        s.log_n,
        lq,
        wp,
        npc,
        n_terms,
        n_pub,
        tuple(names),
        None if mesh is None else ("mesh", id(mesh), config.pcs.mesh_axis),
    )
    gpow = _power_table(F, F.generator, n)
    sels = lde_selectors(F, s.log_n, lq, F.generator)
    from ..ops.jitk import _dev, _dev_ntt, _dev_ntt_auto

    # Pallas NTT tables only off-mesh (the kernel is per-device; the mesh
    # path keeps the shardable staged NTT so GSPMD can insert collectives)
    dn = _dev_ntt if mesh is not None else _dev_ntt_auto
    consts_d = {
        "gpow": _dev(gpow),
        "intt_t": dn(F, s.log_n, True),
        "ntt_t": dn(F, s.log_n + lq, False),
        "sels": {k: _dev(np.ascontiguousarray(v)) for k, v in sels.items()},
    }

    def make():
        def _shard(x):
            if mesh is None:
                return x
            from ..parallel.mesh import _row_sharded

            return _row_sharded(mesh, config.pcs.mesh_axis, x)

        def to_coset(mat, cd):
            coeffs = intt(F, _shard(mat), jnp, tables=cd["intt_t"])
            scaled = F.monty_mul(coeffs, cd["gpow"][:, None], jnp)
            return _shard(ntt(
                F, jnp.pad(scaled, [(0, m - n), (0, 0)]), jnp,
                tables=cd["ntt_t"],
            ))

        def fn(trace, prep, perm_flat, pubs, chal, term_arr, alpha_arr, cd):
            lde_main = to_coset(trace, cd)
            pcols = inst.air.periodic_columns()
            bindings = {
                "main": {
                    0: ("base", lde_main),
                    1: ("base", jnp.roll(lde_main, -(1 << lq), axis=0)),
                },
                "periodic": {
                    0: (
                        "base",
                        jnp.stack(
                            [
                                periodic_lde(F, c, s.log_n, lq, jnp)
                                for c in pcols
                            ],
                            axis=1,
                        ),
                    )
                }
                if pcols
                else {},
                "preprocessed": {},
                "perm": {},
                "publics": [pubs[k] for k in range(n_pub)],
                "challenges": [chal[k] for k in range(2 * len(names))],
                "terminals": [term_arr[g] for g in range(n_terms)],
                "sels": {
                    k: ("base", v) for k, v in cd["sels"].items()
                },
            }
            if wp:
                lde_prep = to_coset(prep, cd)
                bindings["preprocessed"] = {
                    0: ("base", lde_prep),
                    1: ("base", jnp.roll(lde_prep, -(1 << lq), axis=0)),
                }
            if npc:
                lde_perm = to_coset(perm_flat, cd).reshape(m, npc, E.D)
                bindings["perm"] = {
                    0: lde_perm,
                    1: jnp.roll(lde_perm, -(1 << lq), axis=0),
                }
            ev = Evaluator(F, E, jnp)
            folded = _fold_constraints(E, builder, ev, bindings, alpha_arr, jnp)
            return E.mul_base(folded, cd["sels"]["inv_vanishing"], jnp)

        return fn

    fn = quotient_fn(key, make)
    prep = (
        inst.preprocessed
        if inst.preprocessed is not None
        else np.zeros((n, 0), dtype=U32)
    )
    perm_flat = (
        flatten_ext_matrix(pm) if pm is not None else np.zeros((n, 0), dtype=U32)
    )
    pubs = np.asarray(
        [int(x) % F.P for x in inst.publics] or [0], dtype=U32
    )[: max(n_pub, 1)]
    chal = np.stack(
        [challenges[nm][j] for nm in names for j in (0, 1)]
    ).astype(U32) if names else np.zeros((0, E.D), dtype=U32)
    term_arr = (
        np.stack([np.asarray(t, dtype=U32) for t in terms])
        if n_terms
        else np.zeros((1, E.D), dtype=U32)
    )
    # stays device-resident: the quotient chunks are committed (and only
    # committed) on device, so downloading here would round-trip ~MBs per
    # instance through the interconnect for nothing
    if mesh is not None:
        with mesh:
            return fn(
                inst.trace,
                prep,
                perm_flat,
                pubs,
                chal,
                term_arr,
                np.asarray(alpha, dtype=U32),
                consts_d,
            )
    return fn(
        inst.trace,
        prep,
        perm_flat,
        pubs,
        chal,
        term_arr,
        np.asarray(alpha, dtype=U32),
        consts_d,
    )

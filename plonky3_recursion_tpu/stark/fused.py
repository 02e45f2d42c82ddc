"""Whole-prove fusion: the ENTIRE batch-stark prove as ONE device program.

TPU-native redesign of the reference's prove hot path
(`p3-batch-stark::prove_batch`, SURVEY.md §2.6/§3.2).  The staged prover
(`batch.prove_batch`) runs one device program per protocol stage and syncs
the Fiat–Shamir transcript on the host between them — ~20 device calls per
proof, each paying the host↔device round-trip (~100 ms through the remote
TPU tunnel, the dominant wall-clock cost of a recursion layer).

Here the transcript itself runs ON DEVICE: `DeviceChallenger` is a traced
duplex sponge with exactly the host `DuplexChallenger`'s semantics
(overwrite-absorb, rate-8 duplexing, front-pop sampling, PoW grinding), so
commits, challenge sampling, permutation columns, quotient evaluation, the
FRI commit phase, the PoW grind, query-index sampling and every query
gather compose into ONE jitted program.  The host packs inputs, launches
one program, downloads ONE flat array, and unpacks the proof.  Proofs are
bit-identical to the staged path (tests/test_fused_prove.py).

Eligible when: use_jit, no hiding salts, cap_height == 0,
commit_pow_bits == 0, default Poseidon2 W16 challenger.  Everything else
falls back to the staged path.  A configured mesh stays eligible: every
row-major intermediate (LDEs, digest layers, permutation columns, quotient
cosets, FRI codewords) carries a row-sharding constraint over the mesh
axis, so the SAME single program runs GSPMD multi-chip — XLA inserts the
NTT all_to_alls and Merkle all_gathers (scale-out no longer reintroduces
the ~20-call staged tunnel cost).
"""

from __future__ import annotations

import functools

import numpy as np

from ..fields.monty31 import Monty31, U32
from ..ops.ntt import _power_table, intt, ntt, ntt_bitrev, bit_reverse_rows
from ..ops.poseidon2 import poseidon2_params
from .domains import lde_selectors, periodic_lde
from .fri_pcs import FriProof, QueryProof, fri_phase_schedule
from .lookups import generate_perm_columns, num_perm_cols
from .merkle import flatten_ext_matrix
from .symbolic import Evaluator, log_quotient_degree
from .uni import _fold_constraints

DIGEST = 8
RATE = 8
WIDTH = 16
GRIND_BATCH = 1 << 21


class DeviceChallenger:
    """Traced duplex challenger used INSIDE jit bodies.

    Mirrors `stark.challenger.DuplexChallenger` (W16/R8 Poseidon2) exactly:
    observe clears the output buffer and pushes into the input buffer,
    duplexing (overwrite state[:len], permute, refill outputs) at rate;
    sample duplexes when the input buffer is non-empty or outputs are dry
    and pops the FRONT of the output buffer.  Buffer LENGTHS are static
    Python ints (the observation schedule is circuit-shaped), values are
    traced scalars — so the whole transcript traces into one XLA program.
    """

    def __init__(self, field: Monty31, jnp):
        self.F = field
        self.jnp = jnp
        self.params = poseidon2_params(field, WIDTH)
        self.state = jnp.zeros((WIDTH,), dtype=jnp.uint32)
        self.inbuf: list = []
        self.outbuf: list = []

    def _permute1(self, state):
        from ..ops.poseidon2 import permute

        return permute(self.params, state[None, :], self.jnp)[0]

    def _duplex(self):
        st = self.state
        if self.inbuf:
            for i, v in enumerate(self.inbuf):
                st = st.at[i].set(v)
        self.state = self._permute1(st)
        self.outbuf = [self.state[i] for i in range(RATE)]
        self.inbuf = []

    def observe(self, v):
        self.outbuf = []
        self.inbuf.append(v)
        if len(self.inbuf) == RATE:
            self._duplex()

    def observe_flat(self, arr):
        """Observe a 1-D traced array of static length n (streams exactly
        like n scalar observes; full rate-8 chunks run as one lax.scan)."""
        import jax

        jnp = self.jnp
        arr = arr.reshape(-1)
        n = int(arr.shape[0])
        if n == 0:
            return
        self.outbuf = []
        i = 0
        # scalar pushes until the input buffer hits a chunk boundary
        head = (-len(self.inbuf)) % RATE if self.inbuf else 0
        head = min(head, n)
        for j in range(head):
            self.observe(arr[j])
        i = head
        m = (n - i) // RATE
        if m > 1:
            chunks = arr[i : i + m * RATE].reshape(m, RATE).astype(jnp.uint32)

            def body(st, chunk):
                st = jax.lax.dynamic_update_slice(st, chunk, (0,))
                return self._permute1(st), None

            self.state, _ = jax.lax.scan(body, self.state, chunks)
            self.outbuf = [self.state[k] for k in range(RATE)]
            self.inbuf = []
            i += m * RATE
        elif m == 1:
            for j in range(RATE):
                self.observe(arr[i + j])
            i += RATE
        for j in range(i, n):
            self.observe(arr[j])

    def sample(self):
        if self.inbuf or not self.outbuf:
            self._duplex()
        return self.outbuf.pop(0)

    def sample_ext(self, d: int):
        return self.jnp.stack([self.sample() for _ in range(d)])

    def sample_bits(self, bits: int):
        return self.sample() & self.jnp.uint32((1 << bits) - 1)

    def grind(self, bits: int, batch: int = GRIND_BATCH):
        """In-program PoW: try `batch` candidates, take the first hit
        (same witness the host/device grind finds), then consume it
        through the transcript (observe + sample_bits) exactly like
        `GrindingChallenger::grind`.  Returns (witness, ok, check)."""
        from ..ops.poseidon2 import permute

        jnp = self.jnp
        mask = jnp.uint32((1 << bits) - 1)
        k = len(self.inbuf)
        cand = jnp.arange(batch, dtype=jnp.uint32) % jnp.uint32(self.F.P)
        states = jnp.broadcast_to(self.state, (batch, WIDTH))
        for i, v in enumerate(self.inbuf):
            states = states.at[:, i].set(v)
        states = states.at[:, k].set(cand)
        out = permute(self.params, states, jnp)
        hit = (out[:, 0] & mask) == 0
        idx = jnp.argmax(hit)
        w, ok = cand[idx], hit[idx]
        self.observe(w)
        check = self.sample_bits(bits)  # must be 0 on a real hit
        return w, ok, check


# ---------------------------------------------------------------------------
# program factory (cached per batch structure)
# ---------------------------------------------------------------------------

_FUSED_CACHE: dict = {}


def _layer_heights(h: int) -> list:
    out = [h]
    while h > 1:
        h //= 2
        out.append(h)
    return out


def _layer_offsets(h: int) -> list:
    offs, off = [], 0
    for lh in _layer_heights(h):
        offs.append(off)
        off += lh
    return offs


def fused_eligible(config, common) -> bool:
    pcs = config.pcs
    if not getattr(pcs, "use_jit", False) or not getattr(
        pcs, "fuse_full", False
    ):
        return False
    if pcs.hiding_salt_cols or pcs.cap_height != 0:
        return False
    if pcs.params.commit_pow_bits != 0:
        return False
    ch = config.challenger()
    if not getattr(ch, "is_default_poseidon2", False) or ch.WIDTH != WIDTH:
        return False
    # offline prep committed with a non-flat (host) tree can't be gathered
    if common.prep_data is not None and common.prep_data.tree.dev_flat is None:
        return False
    return True


def fused_prove_batch(config, instances, common, debug_lookups=False):
    """Drop-in for the staged `prove_batch` body under `fused_eligible`.

    Proof content is bit-identical to the staged path; the difference is
    purely execution shape (one device program, one download)."""
    import jax
    import jax.numpy as jnp

    from ..ops.jitk import _dev, _dev_bitrev, _dev_ntt, _dev_ntt_auto
    from ..utils import ext_powers, modsum, reduce_matrix_ext
    from ..utils.tracing import span
    from .batch import (
        BatchProof,
        InstanceShape,
        _bind_instances,
        _instance_builder,
        _lookup_names,
    )
    from .fri_pcs import _fold_consts
    from .lookups import check_lookups_balance, global_lookups

    F, E, pcs = config.field, config.ext, config.pcs
    P = pcs.params
    d = E.D
    lb = P.log_blowup
    names = _lookup_names(instances)
    challenge_idx = {nm: 2 * i for i, nm in enumerate(names)}
    builders = [_instance_builder(inst, challenge_idx) for inst in instances]
    shapes = [
        InstanceShape(
            log_n=inst.trace.shape[0].bit_length() - 1,
            width_main=inst.trace.shape[1],
            width_prep=(
                inst.preprocessed.shape[1]
                if inst.preprocessed is not None
                else 0
            ),
            num_publics=len(inst.publics),
            num_perm_cols=num_perm_cols(inst.lookups),
            log_quotient_degree=log_quotient_degree(b.constraints),
        )
        for inst, b in zip(instances, builders)
    ]
    with_lk = [(i, inst) for i, inst in enumerate(instances) if inst.lookups]
    has_prep_round = common.prep_data is not None

    # ---- static transcript prefix: instance binding ----
    class _Rec:
        def __init__(self):
            self.vals = []

        def observe(self, v):
            self.vals.append(int(v) % F.P)

    rec = _Rec()
    _bind_instances(rec, shapes)
    bind_arr = np.asarray(rec.vals, dtype=U32)

    # ---- static shape tables ----
    # chunk meta: (inst, chunk_idx, shift) in commit order
    chunk_meta = []
    for i, s in enumerate(shapes):
        lq = s.log_quotient_degree
        wq = F.two_adic_generator(s.log_n + lq)
        for ci in range(1 << lq):
            shift = F.generator * pow(wq, ci, F.P) % F.P
            chunk_meta.append((i, ci, shift))

    # open rounds (static structure):  [(round_kind, [(log_n, width, pts)])]
    # pts entries: "z" (ζ) or ("zg", log_n)
    rounds_sig = []
    rounds_sig.append(
        (
            "trace",
            [
                (s.log_n, s.width_main, ("z", ("zg", s.log_n)))
                for s in shapes
            ],
        )
    )
    if has_prep_round:
        rounds_sig.append(
            (
                "prep",
                [
                    (ln, w, ("z", ("zg", ln)))
                    for _i, ln, w in common.prep_shapes
                ],
            )
        )
    if with_lk:
        rounds_sig.append(
            (
                "perm",
                [
                    (
                        shapes[i].log_n,
                        shapes[i].num_perm_cols * d,
                        ("z", ("zg", shapes[i].log_n)),
                    )
                    for i, _inst in with_lk
                ],
            )
        )
    rounds_sig.append(
        ("quotient", [(shapes[i].log_n, d, ("z",)) for i, _c, _s in chunk_meta])
    )

    # z-point dedup (static): index per distinct point key
    z_keys: list = []

    def z_idx_of(key):
        if key not in z_keys:
            z_keys.append(key)
        return z_keys.index(key)

    esig = []  # (log_n, width, z_idx tuple) per matrix, rounds order
    for _kind, mats in rounds_sig:
        for ln, w, pts in mats:
            esig.append((ln, w, tuple(z_idx_of(k) for k in pts)))
    total_cols = sum(w * len(zi) for _ln, w, zi in esig)

    # reduced-opening terms: (log_h, width, z_idx, apow_offset) rounds order
    rsig = []
    k_off = 0
    for ln, w, zis in esig:
        for zi in zis:
            rsig.append((ln + lb, w, zi, k_off))
            k_off += w
    acc_heights = sorted({lh for lh, _w, _z, _o in rsig}, reverse=True)
    log_max = acc_heights[0]
    log_final = P.log_final_poly_len + P.log_blowup
    assert min(acc_heights) >= log_final
    schedule = fri_phase_schedule(P, log_max, tuple(acc_heights))
    offsets = []
    off = 0
    for a in schedule:
        offsets.append(off)
        off += a
    # post-schedule coset shift of the final codeword
    final_shift = F.generator
    for a in schedule:
        for _t in range(a):
            final_shift = final_shift * final_shift % F.P

    nq = P.num_queries
    pow_bits = P.query_pow_bits

    # per-round tree heights (for gathers): matrices are the bitrev LDEs
    round_mat_logh = [
        [ln + lb for ln, _w, _p in mats] for _k, mats in rounds_sig
    ]
    round_max_logh = [max(hs) for hs in round_mat_logh]

    key = (
        "fused",
        F.name,
        d,
        pcs.mesh,
        pcs.mesh_axis,
        getattr(E, "W", 0),
        tuple(
            (
                inst.air.cache_key(),
                s.log_n,
                s.width_main,
                s.width_prep,
                s.num_publics,
                s.log_quotient_degree,
                s.num_perm_cols,
            )
            for inst, s in zip(instances, shapes)
        ),
        tuple(names),
        tuple((ln, w) for _i, ln, w in common.prep_shapes),
        has_prep_round,
        (P.log_blowup, P.log_final_poly_len, P.max_log_arity, nq, pow_bits),
    )

    cached = _FUSED_CACHE.get(key)
    if cached is None:
        from ..ops.jitk import mesh_row_sharder

        shard = mesh_row_sharder(pcs.mesh, pcs.mesh_axis)
        # ---- device-resident constant tables ----
        consts: dict = {"bind": _dev(bind_arr)}
        # per-commit-round interpolation/LDE tables, keyed by (shift, log_n)
        lde_tabs: dict = {}

        def lde_tab(shift, log_n):
            tk = (int(shift), log_n)
            if tk not in lde_tabs:
                n = 1 << log_n
                unscale = (
                    None
                    if shift == 1
                    else _dev(_power_table(F, pow(int(shift), F.P - 2, F.P), n))
                )
                lde_tabs[tk] = (
                    unscale,
                    _dev(_power_table(F, int(F.generator), n)),
                    _dev_ntt_auto(F, log_n, True, pcs.mesh is None),
                    _dev_ntt_auto(F, log_n + lb, False, pcs.mesh is None),
                    _dev_bitrev(n << lb),
                )
            return tk

        trace_tabs = tuple(lde_tab(1, s.log_n) for s in shapes)
        perm_tabs = tuple(lde_tab(1, shapes[i].log_n) for i, _ in with_lk)
        chunk_tabs = tuple(
            lde_tab(shift, shapes[i].log_n) for i, _c, shift in chunk_meta
        )
        # quotient eval tables per instance
        quot_tabs = []
        for i, s in enumerate(shapes):
            lq = s.log_quotient_degree
            n = 1 << s.log_n
            sels = lde_selectors(F, s.log_n, lq, F.generator)
            quot_tabs.append(
                {
                    "gpow": _dev(_power_table(F, F.generator, n)),
                    "intt_t": _dev_ntt_auto(
                        F, s.log_n, True, pcs.mesh is None
                    ),
                    "ntt_t": _dev_ntt_auto(
                        F, s.log_n + lq, False, pcs.mesh is None
                    ),
                    "sels": {
                        kk: _dev(np.ascontiguousarray(v))
                        for kk, v in sels.items()
                    },
                }
            )
        consts["lde"] = lde_tabs
        consts["quot"] = tuple(quot_tabs)
        # reduced-opening domain points per height (bitrev order)
        from ..ops.ntt import _bitrev_perm
        from .domains import domain_points

        consts["xs"] = {
            str(lh): _dev(
                domain_points(F, lh, int(F.generator))[_bitrev_perm(1 << lh)]
            )
            for lh in acc_heights
        }
        # per-phase fold constants
        fold_consts = []
        shift = F.generator
        ls = log_max
        for a in schedule:
            per = []
            s_ = shift
            for t in range(a):
                _x, inv_2x = _fold_consts(F, ls - t, s_)
                per.append(_dev(inv_2x))
                s_ = s_ * s_ % F.P
            fold_consts.append(tuple(per))
            shift = s_
            ls -= a
        consts["fold"] = tuple(fold_consts)
        consts["inv2"] = _dev(
            np.asarray(
                F.monty_constant(pow(2, F.P - 2, F.P)), dtype=U32
            ).reshape(())
        )
        # final-poly interpolation tables
        consts["final"] = (
            _dev_bitrev(1 << log_final),
            _dev_ntt(F, log_final, True),
            None
            if final_shift == 1
            else _dev(
                _power_table(
                    F, pow(int(final_shift), F.P - 2, F.P), 1 << log_final
                )
            ),
        )
        params16 = poseidon2_params(F, WIDTH)
        prep_offsets_static = None
        if has_prep_round:
            prep_offsets_static, off_ = [], 0
            for lh_ in common.prep_data.tree.layer_heights:
                prep_offsets_static.append(off_)
                off_ += lh_

        def commit_round(consts_t, ldes_in, tabs, jnp):
            """intt+LDE+bitrev per matrix + one mixed-height Merkle tree.
            Returns (coeffs list, ldes list, layers list, root)."""
            from ..ops.hashing import merkle_layers, sponge_hash

            coeffs_out, ldes = [], []
            for evals, tk in zip(ldes_in, tabs):
                unscale_d, gpow_d, intt_t, ntt_t, br = (
                    consts_t["lde"][tk]
                )
                shift_, log_n = tk
                n = 1 << log_n
                m = n << lb
                coeffs = intt(F, shard(evals), jnp, tables=intt_t)
                if unscale_d is not None:
                    coeffs = F.monty_mul(coeffs, unscale_d[:, None], jnp)
                scaled = F.monty_mul(coeffs, gpow_d[:, None], jnp)
                lde = ntt_bitrev(
                    F,
                    jnp.pad(scaled, [(0, m - n), (0, 0)]),
                    jnp,
                    tables=ntt_t,
                    br=br,
                )
                coeffs_out.append(coeffs)
                ldes.append(shard(lde))
            by_height: dict = {}
            for l in ldes:
                by_height.setdefault(int(l.shape[0]), []).append(l)

            def rows_digest(h):
                return shard(
                    sponge_hash(
                        params16,
                        jnp.concatenate(by_height[h], axis=1),
                        RATE,
                        DIGEST,
                        jnp,
                    )
                )

            hs = sorted(by_height, reverse=True)
            leaf = rows_digest(hs[0])
            inject = {h: rows_digest(h) for h in hs[1:]}
            layers = merkle_layers(params16, leaf, jnp, inject)
            return coeffs_out, ldes, layers, layers[-1][0]

        def eval_cols(coeffs, z_pows, jnp):
            """p(ζ) for all columns from coefficient matrix: (w, D)."""
            cols = []
            for dd in range(d):
                pm = F.to_monty(z_pows[:, dd], jnp)
                prod = F.monty_mul(coeffs, pm[:, None], jnp)
                cols.append(modsum(F, prod, 0, jnp))
            return jnp.stack(cols, axis=-1)

        n_prep_mats = len(common.prep_shapes)

        def fn(consts_t, prep_commit, pubs_flat, prep_args, *traces):
            ch = DeviceChallenger(F, jnp)
            ch.observe_flat(consts_t["bind"])
            if prep_commit is not None:
                ch.observe_flat(prep_commit)
            # ---- trace commit ----
            tr_coeffs, tr_ldes, tr_layers, tr_root = commit_round(
                consts_t, list(traces), trace_tabs, jnp
            )
            ch.observe_flat(tr_root)
            ch.observe_flat(pubs_flat)
            challenges = {}
            for nm in names:
                a_ = ch.sample_ext(d)
                b_ = ch.sample_ext(d)
                challenges[nm] = (a_, b_)
            # ---- permutation columns ----
            perm_mats, terminals = [], []
            for i, inst in with_lk:
                s = shapes[i]
                n = 1 << s.log_n
                prep_m = (
                    prep_args["inst_prep"][i]
                    if s.width_prep
                    else jnp.zeros((n, 0), dtype=jnp.uint32)
                )
                tb = {
                    "main": {
                        0: ("base", traces[i]),
                        1: ("base", jnp.roll(traces[i], -1, axis=0)),
                    },
                    "preprocessed": {
                        0: ("base", prep_m),
                        1: ("base", jnp.roll(prep_m, -1, axis=0)),
                    }
                    if s.width_prep
                    else {},
                    "perm": {},
                    "publics": [],
                    "challenges": [],
                    "terminals": [],
                    "sels": {},
                }
                perm, terms = generate_perm_columns(
                    F, E, inst.lookups, tb, n, challenges, jnp
                )
                perm_mats.append((i, shard(perm)))
                terminals.append((i, terms))
            perm_root = None
            pm_coeffs = pm_ldes = pm_layers = None
            if perm_mats:
                flats = [flatten_ext_matrix(pm) for _i, pm in perm_mats]
                pm_coeffs, pm_ldes, pm_layers, perm_root = commit_round(
                    consts_t, flats, perm_tabs, jnp
                )
                ch.observe_flat(perm_root)
                for _i, terms in terminals:
                    for t in terms:
                        ch.observe_flat(t)
            alpha = ch.sample_ext(d)
            # ---- quotient eval + commit ----
            chunk_evs = []
            for i, (inst, b, s) in enumerate(
                zip(instances, builders, shapes)
            ):
                lq = s.log_quotient_degree
                n = 1 << s.log_n
                m = n << lq
                cd = consts_t["quot"][i]

                def to_coset(mat):
                    coeffs = intt(F, mat, jnp, tables=cd["intt_t"])
                    return coset_of(coeffs)

                def coset_of(coeffs):
                    # coefficients -> evals on the quotient coset g·K_m
                    scaled = F.monty_mul(coeffs, cd["gpow"][:, None], jnp)
                    return shard(
                        ntt(
                            F,
                            jnp.pad(scaled, [(0, m - n), (0, 0)]),
                            jnp,
                            tables=cd["ntt_t"],
                        )
                    )

                # the trace commit already interpolated this matrix
                # (shift 1): reuse its coefficients, skipping the INTT
                lde_main = coset_of(tr_coeffs[i])
                pcols = inst.air.periodic_columns()
                pub_off = sum(sh.num_publics for sh in shapes[:i])
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
                    "publics": [
                        pubs_flat[pub_off + k]
                        for k in range(s.num_publics)
                    ],
                    "challenges": [
                        challenges[nm][j] for nm in names for j in (0, 1)
                    ],
                    "terminals": [],
                    "sels": {
                        kk: ("base", v) for kk, v in cd["sels"].items()
                    },
                }
                if s.width_prep:
                    # offline prep commit already holds the coefficients
                    pk = next(
                        (
                            k
                            for k, (pi, _l, _w) in enumerate(
                                common.prep_shapes
                            )
                            if pi == i
                        ),
                        None,
                    )
                    lde_prep = (
                        coset_of(prep_args["prep_coeffs"][pk])
                        if pk is not None and has_prep_round
                        else to_coset(prep_args["inst_prep"][i])
                    )
                    bindings["preprocessed"] = {
                        0: ("base", lde_prep),
                        1: ("base", jnp.roll(lde_prep, -(1 << lq), axis=0)),
                    }
                pm = next((p for j, p in perm_mats if j == i), None)
                if pm is not None:
                    # perm commit already interpolated: reuse coefficients
                    wk = next(
                        k for k, (j, _inst) in enumerate(with_lk) if j == i
                    )
                    lde_perm = coset_of(pm_coeffs[wk]).reshape(
                        m, s.num_perm_cols, d
                    )
                    bindings["perm"] = {
                        0: lde_perm,
                        1: jnp.roll(lde_perm, -(1 << lq), axis=0),
                    }
                    terms = next(ts for j, ts in terminals if j == i)
                    bindings["terminals"] = [
                        jnp.broadcast_to(t, (d,)) for t in terms
                    ]
                ev = Evaluator(F, E, jnp)
                folded_c = _fold_constraints(E, b, ev, bindings, alpha, jnp)
                q = E.mul_base(
                    folded_c, cd["sels"]["inv_vanishing"], jnp
                )
                qdeg = 1 << lq
                for ci in range(qdeg):
                    chunk_evs.append(q[ci::qdeg])
            q_coeffs, q_ldes, q_layers, q_root = commit_round(
                consts_t, chunk_evs, chunk_tabs, jnp
            )
            ch.observe_flat(q_root)
            zeta = ch.sample_ext(d)
            # ---- open: claimed evaluations ----
            zs = []
            for zk in z_keys:
                if zk == "z":
                    zs.append(zeta)
                else:
                    _tag, ln = zk
                    zs.append(
                        E.mul_base(
                            zeta, jnp.uint32(F.two_adic_generator(ln)), jnp
                        )
                    )
            all_coeffs = (
                list(tr_coeffs)
                + (list(prep_args["prep_coeffs"]) if has_prep_round else [])
                + (list(pm_coeffs) if perm_mats else [])
                + list(q_coeffs)
            )
            all_ldes = (
                list(tr_ldes)
                + (list(prep_args["prep_ldes"]) if has_prep_round else [])
                + (list(pm_ldes) if perm_mats else [])
                + list(q_ldes)
            )
            pow_cache: dict = {}
            opened_flat = []
            for (ln, w, zis), coeffs in zip(esig, all_coeffs):
                n = 1 << ln
                for zi in zis:
                    pk = (zi, ln)
                    if pk not in pow_cache:
                        pow_cache[pk] = ext_powers(E, zs[zi], n, jnp)
                    opened_flat.append(
                        eval_cols(coeffs, pow_cache[pk], jnp)
                    )
            opened_flat = jnp.concatenate(opened_flat, axis=0)
            ch.observe_flat(opened_flat.reshape(-1))
            fri_alpha = ch.sample_ext(d)
            apows = ext_powers(E, fri_alpha, total_cols, jnp)
            # ---- reduced openings per height ----
            acc: dict = {}
            ti = 0
            pos = 0
            lde_i = 0
            for (ln, w, zis), lde in zip(esig, all_ldes):
                log_h = ln + lb
                h = 1 << log_h
                xs = consts_t["xs"][str(log_h)]
                for zi in zis:
                    y = opened_flat[pos : pos + w]  # (w, D)
                    pos += w
                    apow = apows[ti : ti + w]
                    ti += w
                    y_red = modsum(F, E.mul(y, apow, jnp), 0, jnp)
                    num_red = reduce_matrix_ext(F, E, lde, apow, jnp)
                    zx = E.sub(
                        E.from_base(xs, jnp),
                        jnp.broadcast_to(zs[zi], (h, d)),
                        jnp,
                    )
                    diff = E.sub(
                        num_red, jnp.broadcast_to(y_red, (h, d)), jnp
                    )
                    term = E.mul(diff, E.inv(zx, jnp), jnp)
                    acc[log_h] = (
                        term
                        if log_h not in acc
                        else E.add(acc[log_h], term, jnp)
                    )
                lde_i += 1
            # ---- FRI commit phase chain ----
            from ..ops.hashing import merkle_layers, sponge_hash

            folded = acc[log_max]
            phase_roots = []
            phase_rows_mats = []
            phase_layerss = []
            ls = log_max
            for ph, a in enumerate(schedule):
                group = 1 << a
                rows = folded.reshape((1 << ls) >> a, group * d)
                layers = merkle_layers(
                    params16,
                    sponge_hash(params16, rows, RATE, DIGEST, jnp),
                    jnp,
                )
                root = layers[-1][0]
                phase_roots.append(root)
                phase_rows_mats.append(rows)
                phase_layerss.append(layers)
                ch.observe_flat(root)
                beta = ch.sample_ext(d)
                beta_t = beta
                for t in range(a):
                    aa = folded[0::2]
                    bb = folded[1::2]
                    ssum = E.add(aa, bb, jnp)
                    dd_ = E.sub(aa, bb, jnp)
                    even = F.monty_mul(ssum, consts_t["inv2"], jnp)
                    odd = E.mul_base(dd_, consts_t["fold"][ph][t], jnp)
                    folded = shard(
                        E.add(
                            even,
                            E.mul(
                                odd, jnp.broadcast_to(beta_t, odd.shape), jnp
                            ),
                            jnp,
                        )
                    )
                    beta_t = E.mul(beta_t, beta_t, jnp)
                ls -= a
                if ls in acc:
                    folded = E.add(folded, acc[ls], jnp)
            # ---- final polynomial ----
            br_f, intt_f, unscale_f = consts_t["final"]
            fin_evals = bit_reverse_rows(folded, jnp, br_f)
            fc = intt(F, fin_evals, jnp, tables=intt_f)
            if unscale_f is not None:
                fc = F.monty_mul(fc, unscale_f[:, None], jnp)
            final_coeffs = fc[: 1 << P.log_final_poly_len]
            final_tail = fc[1 << P.log_final_poly_len :]
            ch.observe_flat(final_coeffs.reshape(-1))
            # ---- PoW grind + query indices ----
            if pow_bits:
                pow_w, pow_hit, pow_check = ch.grind(pow_bits)
                pow_ok = pow_hit.astype(jnp.uint32)
            else:
                # staged path never touches the challenger when bits == 0
                pow_w = jnp.uint32(0)
                pow_ok = jnp.uint32(1)
                pow_check = jnp.uint32(0)
            indices = jnp.stack(
                [ch.sample_bits(log_max) for _ in range(nq)]
            )
            idx_i32 = indices.astype(jnp.int32)
            # ---- query row gathers (per round, concat widths) ----
            round_trees = [("trace", tr_ldes, tr_layers)]
            if has_prep_round:
                round_trees.append(
                    ("prep", prep_args["prep_ldes"], None)
                )
            if perm_mats:
                round_trees.append(("perm", pm_ldes, pm_layers))
            round_trees.append(("quot", q_ldes, q_layers))
            row_gathers = []
            for (_kind, ldes, _lay), loghs in zip(
                round_trees, round_mat_logh
            ):
                per = []
                for lde, lh in zip(ldes, loghs):
                    mi = jax.lax.shift_right_logical(
                        idx_i32, jnp.int32(log_max - lh)
                    )
                    per.append(lde[mi])
                row_gathers.append(jnp.concatenate(per, axis=1))
            phase_row_gathers = []
            for ph, a in enumerate(schedule):
                sh = offsets[ph] + a
                mi = jax.lax.shift_right_logical(idx_i32, jnp.int32(sh))
                phase_row_gathers.append(phase_rows_mats[ph][mi])
            # ---- sibling gathers ----
            sib_gathers = []
            # rounds: trace, prep(arg flat), perm, quot — then phases
            job_list = []
            for (kind, ldes, lay), rlm in zip(round_trees, round_max_logh):
                if kind == "prep":
                    flat = prep_args["prep_flat"]
                    offs = prep_offsets_static
                else:
                    flat = jnp.concatenate(lay, axis=0)
                    offs = _layer_offsets(1 << rlm)
                job_list.append((flat, offs, log_max - rlm, rlm))
            for ph, a in enumerate(schedule):
                log_h = log_max - offsets[ph] - a
                flat = jnp.concatenate(phase_layerss[ph], axis=0)
                job_list.append(
                    (flat, _layer_offsets(1 << log_h), offsets[ph] + a, log_h)
                )
            for flat, offs, shift_, levels in job_list:
                if levels == 0:
                    continue
                node = jax.lax.shift_right_logical(
                    idx_i32, jnp.int32(shift_)
                )  # (nq,)
                per_level = []
                for l in range(levels):
                    il = jax.lax.shift_right_logical(node, jnp.int32(l))
                    per_level.append(jnp.int32(offs[l]) + (il ^ 1))
                sib_idx = jnp.stack(per_level, axis=1).reshape(-1)
                sib_gathers.append(flat[sib_idx])
            # ---- flatten every output into ONE u32 array ----
            pieces = [
                tr_root,
                q_root,
                opened_flat.reshape(-1),
                final_coeffs.reshape(-1),
                final_tail.reshape(-1),
                jnp.stack(phase_roots).reshape(-1)
                if phase_roots
                else jnp.zeros((0,), jnp.uint32),
                indices,
                pow_w.reshape(1),
                pow_ok.reshape(1),
                pow_check.reshape(1),
            ]
            if perm_root is not None:
                pieces.append(perm_root)
            for _i, terms in terminals:
                for t in terms:
                    pieces.append(t.reshape(-1))
            for rg in row_gathers:
                pieces.append(rg.reshape(-1))
            for prg in phase_row_gathers:
                pieces.append(prg.reshape(-1))
            for sg in sib_gathers:
                pieces.append(sg.reshape(-1))
            return jnp.concatenate(
                [p.astype(jnp.uint32) for p in pieces]
            )

        jfn = jax.jit(fn, static_argnums=())
        cached = (jfn, consts)
        _FUSED_CACHE[key] = cached
    jfn, consts = cached

    # ---- pack runtime args ----
    import jax.numpy as jnp

    pubs_flat = np.asarray(
        [int(x) % F.P for inst in instances for x in inst.publics],
        dtype=U32,
    )
    if pubs_flat.size == 0:
        pubs_flat = np.zeros((0,), dtype=U32)
    inst_prep = {}
    for i, inst in enumerate(instances):
        if inst.preprocessed is not None:
            inst_prep[i] = inst.preprocessed
    prep_args = {"inst_prep": inst_prep}
    if has_prep_round:
        pd = common.prep_data
        prep_args["prep_coeffs"] = [m.coeffs for m in pd.matrices]
        prep_args["prep_ldes"] = list(pd.tree.matrices)
        prep_args["prep_flat"] = pd.tree.dev_flat
    prep_commit = (
        np.asarray(common.prep_commitment, dtype=U32)
        if common.prep_commitment is not None
        else None
    )
    import os as _os

    if _os.environ.get("FUSED_PROFILE"):
        # split arg-sync / execute / download (diagnosis only: the args
        # include async uploads + the device-built NPO tables)
        import jax as _jax

        targs = [inst.trace for inst in instances]
        with span("fused_prove.arg_sync"):
            _jax.block_until_ready(
                [t for t in targs if not isinstance(t, np.ndarray)]
            )
            _jax.block_until_ready(prep_args)
        with span("fused_prove.execute"):
            out_dev = jfn(consts, prep_commit, pubs_flat, prep_args, *targs)
            out_dev.block_until_ready()
        with span("fused_prove.download"):
            out_flat = np.asarray(out_dev)
    else:
        with span("fused_prove.device"):
            out_flat = np.asarray(
                jfn(consts, prep_commit, pubs_flat, prep_args, *[
                    inst.trace for inst in instances
                ])
            )

    # ---- unpack ----
    pos = 0

    def take(n):
        nonlocal pos
        seg = out_flat[pos : pos + n]
        pos += n
        return seg

    trace_root = take(DIGEST)
    q_root = take(DIGEST)
    opened_arr = take(total_cols * d).reshape(total_cols, d)
    final_coeffs = take((1 << P.log_final_poly_len) * d).reshape(-1, d)
    final_tail = take(
        ((1 << log_final) - (1 << P.log_final_poly_len)) * d
    ).reshape(-1, d)
    assert np.all(final_tail == 0), "FRI final poly exceeds degree bound"
    phase_roots = take(len(schedule) * DIGEST).reshape(len(schedule), DIGEST)
    indices = [int(x) for x in take(nq)]
    pow_witness = int(take(1)[0])
    pow_ok = bool(take(1)[0])
    pow_check = int(take(1)[0])
    if pow_bits:
        assert pow_ok and pow_check == 0, (
            "in-program PoW grind missed (p ~ e^-64) — rerun"
        )
    perm_root = take(DIGEST) if with_lk else None
    terminals_np = []
    for i, inst in with_lk:
        # one terminal per GLOBAL lookup (locals close in-table)
        terms = [take(d) for _lk in global_lookups(inst.lookups)]
        terminals_np.append((i, terms))
    row_rows = []
    for (kind, mats) in rounds_sig:
        w_tot = sum(w for _ln, w, _p in mats)
        row_rows.append(take(nq * w_tot).reshape(nq, w_tot))
    phase_rows = []
    for ph, a in enumerate(schedule):
        w = (1 << a) * d
        phase_rows.append(take(nq * w).reshape(nq, w))
    sib_per_job = []
    for (kind, mats), rlm in zip(rounds_sig, round_max_logh):
        levels = rlm
        sib_per_job.append(
            take(nq * levels * DIGEST).reshape(nq, levels, DIGEST)
        )
    for ph, a in enumerate(schedule):
        levels = log_max - offsets[ph] - a
        sib_per_job.append(
            take(nq * levels * DIGEST).reshape(nq, levels, DIGEST)
        )
    assert pos == out_flat.shape[0], (pos, out_flat.shape)

    # ---- rebuild the staged-path structures ----
    # opened values nested [round][mat][point] = (w, D)
    opened = []
    p2 = 0
    for _kind, mats in rounds_sig:
        round_vals = []
        for ln, w, pts in mats:
            vals = []
            for _z in pts:
                vals.append(opened_arr[p2 : p2 + w])
                p2 += w
            round_vals.append(vals)
        opened.append(round_vals)

    if debug_lookups and terminals_np:
        check_lookups_balance(
            [
                (lk.name, t)
                for i, ts in terminals_np
                for lk, t in zip(
                    global_lookups(instances[i].lookups), ts
                )
            ],
            E,
        )

    # per-round per-matrix per-query opened rows
    input_rows = []
    for (kind, mats), rows_cat in zip(rounds_sig, row_rows):
        per_mat = []
        off = 0
        for _ln, w, _p in mats:
            # width here is the LDE width == matrix width
            per_mat.append(rows_cat[:, off : off + w])
            off += w
        input_rows.append(per_mat)

    query_proofs = []
    n_rounds = len(rounds_sig)
    for q in range(nq):
        input_openings = []
        for ri in range(n_rounds):
            opened_rows = [
                input_rows[ri][mi][q]
                for mi in range(len(rounds_sig[ri][1]))
            ]
            sibs = list(sib_per_job[ri][q])
            input_openings.append((opened_rows, sibs))
        commit_steps = []
        for ph, _a in enumerate(schedule):
            commit_steps.append(
                (phase_rows[ph][q], list(sib_per_job[n_rounds + ph][q]))
            )
        query_proofs.append(QueryProof(input_openings, commit_steps))

    fri_proof = FriProof(
        [phase_roots[ph] for ph in range(len(schedule))],
        [],
        final_coeffs,
        pow_witness,
        query_proofs,
        query_indices=indices,
    )

    # round order: trace, prep?, perm?, quotient
    ri = 0
    trace_openings = [
        (opened[ri][i][0], opened[ri][i][1]) for i in range(len(instances))
    ]
    ri += 1
    prep_openings = []
    if has_prep_round:
        for k, (i, _ln, _w) in enumerate(common.prep_shapes):
            prep_openings.append((i, opened[ri][k][0], opened[ri][k][1]))
        ri += 1
    perm_openings = []
    if with_lk:
        for k, (i, _inst) in enumerate(with_lk):
            perm_openings.append((i, opened[ri][k][0], opened[ri][k][1]))
        ri += 1
    qchunks: list[list] = [[] for _ in instances]
    for k, (i, _ci, _s) in enumerate(chunk_meta):
        qchunks[i].append(opened[ri][k][0])

    return BatchProof(
        shapes=shapes,
        trace_commit=trace_root,
        perm_commit=perm_root,
        quotient_commit=q_root,
        trace_openings=trace_openings,
        prep_openings=prep_openings,
        perm_openings=perm_openings,
        quotient_chunks=qchunks,
        lookup_terminals=[
            (i, np.asarray(t)) for i, ts in terminals_np for t in ts
        ],
        publics=[list(inst.publics) for inst in instances],
        fri=fri_proof,
        prep_commitment=(
            None
            if common.prep_commitment is None
            else np.asarray(common.prep_commitment, dtype=U32)
        ),
    )

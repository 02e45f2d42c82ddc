"""Uni-stark verifier circuit: single-AIR proofs verified recursively.

TPU-native equivalent of the reference's `verify_p3_uni_proof_circuit`
(`recursion/src/verifier/stark.rs:61`; SURVEY.md §2.4) — the recursion
entry for uni-stark workloads (e.g. the Keccak base proof in
`recursive_keccak`).  Mirrors `stark.uni.verify` exactly: transcript
(log_n, trace commitment, publics, α, quotient commitment, ζ), constraint
fold at ζ via the symbolic compiler, quotient recomposition, then the same
in-circuit FRI verification as the batch path.
"""

from __future__ import annotations

import numpy as np

from ..circuit.builder import CircuitBuilder
from ..stark.symbolic import Air
from ..stark.uni import StarkConfig, UniProof
from .batch_verifier import VerifierCircuitResult, _Alloc, _bind, _verify_fri_circuit
from .challenger_circuit import CircuitChallenger
from .mmcs_circuit import MmcsGadget
from .symbolic_compiler import fold_constraints_circuit


def build_uni_verifier_circuit(
    config: StarkConfig,
    air: Air,
    log_n: int,
    builder: CircuitBuilder | None = None,
    npo_type_id: str | None = None,
    tag_ns: str = "",
) -> VerifierCircuitResult:
    F, E = config.field, config.ext
    P = config.pcs.params
    p = F.P
    d = E.D
    if builder is None:
        builder = CircuitBuilder(E)
        from ..prover.poseidon2_table import poseidon2_npo_for

        npo = poseidon2_npo_for(F.name, d=d)
        builder.enable_op(npo)
        npo_type_id = npo.type_id
    b = builder
    al = _Alloc(b)
    ch_npo_id = npo_type_id
    ch_npo = getattr(config, "challenger_npo", None)
    if ch_npo is not None:
        if ch_npo.type_id not in b.enabled_ops:
            b.enable_op(ch_npo)
        ch_npo_id = ch_npo.type_id
    ch = CircuitChallenger(b, ch_npo_id)
    mmcs = MmcsGadget(b, npo_type_id)

    ab = air.build()
    from ..stark.symbolic import log_quotient_degree

    lq = log_quotient_degree(ab.constraints)
    qdeg = 1 << lq
    n = 1 << log_n

    # Merkle caps: commitments are digest·2^cap targets (clamped per
    # tree); digest length follows the MMCS permutation (8 for the
    # Monty31 W16 family, 4 for Goldilocks W8)
    cap_cfg = getattr(config.pcs, "cap_height", 0)
    cap_len = mmcs.DIGEST << min(cap_cfg, log_n + P.log_blowup)
    ch.observe(b.const(log_n))
    # preprocessed verifying key: a PUBLIC input of the layer circuit
    # (reference mul_air.rs: `verifier_inputs.preprocessed_commit`)
    wp = getattr(air, "width_prep", 0)
    prep_commit = None
    if wp:
        prep_commit = al.public_vec(
            cap_len, lambda pf, i: int(pf.prep_commit[i])
        )
        ch.observe_slice(prep_commit)
    trace_commit = al.public_vec(
        cap_len, lambda pf, i: int(pf.trace_commit[i])
    )
    ch.observe_slice(trace_commit)
    app_pos_base = len(al.pub)
    publics = al.public_vec(
        air.num_publics, lambda pf, i: int(pf.publics[i])
    )
    app_positions = list(range(app_pos_base, len(al.pub)))
    ch.observe_slice(publics)
    alpha = ch.sample_ext()
    quotient_commit = al.public_vec(
        cap_len, lambda pf, i: int(pf.quotient_commit[i])
    )
    ch.observe_slice(quotient_commit)
    zeta = ch.sample_ext()

    def tr_open(pf, which, c, j):
        arr = pf.trace_local if which == 0 else pf.trace_next
        return int(np.asarray(arr)[c, j])

    trace_opens = []
    for which in (0, 1):
        cols = []
        for c in range(air.width_main):
            coeffs = al.private_vec(d, _bind(tr_open, which, c))
            cols.append(b.recompose_base_coeffs_to_ext(coeffs))
        trace_opens.append(cols)

    prep_opens = [[], []]
    if wp:

        def pr_open(pf, which, c, j):
            arr = pf.prep_local if which == 0 else pf.prep_next
            return int(np.asarray(arr)[c, j])

        for which in (0, 1):
            for c in range(wp):
                coeffs = al.private_vec(d, _bind(pr_open, which, c))
                prep_opens[which].append(
                    b.recompose_base_coeffs_to_ext(coeffs)
                )

    def q_open(pf, ci, c, j):
        return int(np.asarray(pf.quotient_chunks[ci])[c, j])

    q_opens = []
    for ci in range(qdeg):
        cols = []
        for c in range(d):
            coeffs = al.private_vec(d, _bind(q_open, ci, c))
            cols.append(b.recompose_base_coeffs_to_ext(coeffs))
        q_opens.append(cols)

    # constraint check at ζ
    g_inv = b.const(pow(F.two_adic_generator(log_n), p - 2, p))
    zeta_n = b.exp_power_of_2(zeta, log_n)
    z_h = b.sub(zeta_n, b.one())
    first = b.div(z_h, b.sub(zeta, b.one()))
    transition = b.sub(zeta, g_inv)
    last = b.div(z_h, transition)
    from .batch_verifier import _periodic_targets

    bindings = {
        "main": {0: trace_opens[0], 1: trace_opens[1]},
        "periodic": {0: _periodic_targets(b, F, air, log_n, zeta)},
        "preprocessed": {0: prep_opens[0], 1: prep_opens[1]},
        "perm": {0: [], 1: []},
        "publics": publics,
        "challenges": [],
        "terminals": [],
        "sels": {"first": first, "last": last, "transition": transition},
    }
    folded = fold_constraints_circuit(b, ab.constraints, bindings, alpha)
    basis = [
        b.const(tuple(1 if j == k else 0 for j in range(d))) for k in range(d)
    ]
    wq = F.two_adic_generator(log_n + lq)
    u_n = pow(wq, n, p)
    s_n = pow(int(F.generator), n, p)
    q_zeta = b.zero
    for ci in range(qdeg):
        q_i = b.zero
        for k in range(d):
            q_i = b.mul_add(q_opens[ci][k], basis[k], q_i)
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

    zg = b.mul(zeta, b.const(F.two_adic_generator(log_n)))
    rounds = [
        (
            "trace",
            trace_commit,
            [(log_n, [(zeta, trace_opens[0]), (zg, trace_opens[1])])],
        ),
    ]
    if wp:
        rounds.append(
            (
                "prep",
                prep_commit,
                [(log_n, [(zeta, prep_opens[0]), (zg, prep_opens[1])])],
            )
        )
    rounds.append(
        (
            "quotient",
            quotient_commit,
            [(log_n, [(zeta, q_opens[ci])]) for ci in range(qdeg)],
        )
    )
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


def build_uni_recursion_layer(config: StarkConfig, air: Air, log_n: int):
    """Circuit proving 'a uni-stark proof of `air` at height 2^log_n
    verifies' — returns (compiled circuit, VerifierCircuitResult)."""
    vcr = build_uni_verifier_circuit(config, air, log_n)
    return vcr.builder.build(), vcr


class _UniProofView:
    """Adapter: UniProof exposing `publics` for the extractor closures."""

    def __init__(self, proof: UniProof, publics):
        self.trace_commit = proof.trace_commit
        self.quotient_commit = proof.quotient_commit
        self.trace_local = proof.trace_local
        self.trace_next = proof.trace_next
        self.quotient_chunks = proof.quotient_chunks
        self.fri = proof.fri
        self.publics = list(publics)
        self.prep_commit = proof.prep_commit
        self.prep_local = proof.prep_local
        self.prep_next = proof.prep_next


def prove_uni_recursively(
    config: StarkConfig,
    circuit,
    vcr: VerifierCircuitResult,
    pdata,
    proof: UniProof,
    publics,
    xp=np,
):
    from ..prover.batch_prover import BatchStarkProver

    view = _UniProofView(proof, publics)
    runner = circuit.runner()
    runner.set_public_inputs(vcr.pack_public_inputs(view))
    runner.set_private_inputs(vcr.pack_private_inputs(view))
    for key, data in vcr.pack_npo_private(view).items():
        runner.set_private_data(key, data)
    traces = runner.run()
    return BatchStarkProver(config).prove_all_tables(circuit, traces, pdata)

"""Uni-stark: single-AIR STARK prove/verify over the FRI PCS.

TPU-native equivalent of the reference's upstream `p3-uni-stark`
(`prove`, `verify`, `StarkConfig`; SURVEY.md §2.6).  The batch-stark engine
(`batch.py`) generalizes this to many instances + LogUp; uni-stark stays as
the reference-parity entry point for single AIRs (e.g. the Keccak workload)
and as the simplest end-to-end protocol exercise.

Transcript order (mirrored by verify and the recursion circuit):
  1. observe log_degree (as a field element)
  2. observe trace commitment, then public values
  3. sample α (constraint-folding challenge)
  4. observe quotient commitment
  5. sample ζ (out-of-domain point)
  6. PCS open: trace at [ζ, ζ·g_n]; quotient chunks at [ζ]  (fri_pcs order)

Quotient math: constraints folded with α-powers, divided by Z_H on the
quotient coset g·K of size n·2^lq, split into 2^lq chunks by row stride
(chunk i lives on sub-coset shift g·w_M^i); the verifier recomposes
  Q(ζ) = Σ_i Q_i(ζ) · Π_{j≠i} Z_j(ζ)/Z_j(D_i)
with the denominators computed natively (cf. reference
`recursion/src/verifier/quotient.rs:62` which moves the same O(N²) work
out of circuit).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..fields.extension import BinomialExtension
from ..fields.monty31 import Monty31, U32
from ..ops.ntt import _power_table, intt, ntt
from ..utils import ext_powers
from .challenger import DuplexChallenger
from .domains import (
    TwoAdicCoset,
    lde_selectors,
    periodic_at_point,
    periodic_lde,
)
from .fri_pcs import FriParams, FriProof, TwoAdicFriPcs
from .symbolic import Air, Evaluator, log_quotient_degree


@dataclasses.dataclass(frozen=True)
class StarkConfig:
    field: Monty31
    ext: BinomialExtension  # challenge field
    pcs: TwoAdicFriPcs
    # Cross-hash support (reference `ChallengerPermConfig`): a factory for
    # the native transcript challenger (None = default Poseidon2 W16
    # duplex) plus the NPO whose table replays that permutation in the
    # recursive verifier circuit (None = the default Poseidon2 NPO).
    challenger_factory: object = None
    challenger_npo: object = None

    def challenger(self) -> DuplexChallenger:
        if self.challenger_factory is not None:
            return self.challenger_factory()
        return DuplexChallenger(self.field)


def koala_bear_config(
    params: FriParams | None = None,
    use_jit: bool = False,
    zk: bool = False,
    cap_height: int = 0,
) -> StarkConfig:
    """zk=True enables hiding proofs (reference `HidingFriPcs`,
    SURVEY.md §2.6): salted Merkle commitments plus a random masking
    round in the FRI batch (`prove_batch`).  cap_height commits to Merkle
    caps instead of roots (reference `MerkleTreeMmcs::new(..., cap_height)`
    / example `--cap-height` flag)."""
    from ..fields import KOALA_BEAR, ext_field

    E = ext_field(KOALA_BEAR, 4)
    return StarkConfig(
        KOALA_BEAR,
        E,
        TwoAdicFriPcs(
            KOALA_BEAR,
            E,
            params or FriParams.testing(),
            use_jit=use_jit,
            hiding_salt_cols=2 * E.D if zk else 0,
            cap_height=cap_height,
        ),
    )


def koala_bear_quintic_config(
    params: FriParams | None = None,
) -> StarkConfig:
    """KoalaBear with the quintic trinomial challenge field x^5 + x^2 − 1
    (reference `--quintic` configs; `AluExtMulKind::QuinticTrinomial`).
    Host execution path (jit kernels are keyed to binomial extensions)."""
    from ..fields import KOALA_BEAR, koala_bear_quintic

    E = koala_bear_quintic()
    return StarkConfig(
        KOALA_BEAR, E, TwoAdicFriPcs(KOALA_BEAR, E, params or FriParams.testing())
    )


def baby_bear_config(
    params: FriParams | None = None,
    use_jit: bool = False,
    zk: bool = False,
    cap_height: int = 0,
) -> StarkConfig:
    from ..fields import BABY_BEAR, ext_field

    E = ext_field(BABY_BEAR, 4)
    return StarkConfig(
        BABY_BEAR,
        E,
        TwoAdicFriPcs(
            BABY_BEAR,
            E,
            params or FriParams.testing(),
            use_jit=use_jit,
            hiding_salt_cols=2 * E.D if zk else 0,
            cap_height=cap_height,
        ),
    )


@dataclasses.dataclass
class UniProof:
    log_n: int
    trace_commit: np.ndarray
    quotient_commit: np.ndarray
    trace_local: np.ndarray  # (w, D)
    trace_next: np.ndarray  # (w, D)
    quotient_chunks: list  # 2^lq entries of (D, D)
    fri: FriProof
    # preprocessed columns (reference `prove_with_preprocessed` /
    # `verify_with_preprocessed`, exercised by `mul_air.rs`)
    prep_commit: np.ndarray | None = None
    prep_local: np.ndarray | None = None  # (wp, D)
    prep_next: np.ndarray | None = None


def setup_preprocessed(config: StarkConfig, prep: np.ndarray, xp=np):
    """Offline-commit a preprocessed matrix (reference
    `p3_uni_stark::setup_preprocessed`): returns the PCS prover data —
    its `.commitment` is the verifying key the verifier pins."""
    return config.pcs.commit([(1, np.asarray(prep, dtype=U32))], xp)


def _fold_constraints(E, builder, evaluator, bindings, alpha, xp):
    """Σ α^i · C_i as an ext value/array."""
    vals = evaluator.run(builder.constraints, bindings)
    apow = ext_powers(E, xp.asarray(alpha), len(vals), xp)
    acc = None
    for i, (kind, v) in enumerate(vals):
        ai = apow[i]
        if kind == "base":
            term = E.mul_base(
                xp.broadcast_to(ai, v.shape + (E.D,)), v, xp
            )
        else:
            term = E.mul(v, xp.broadcast_to(ai, v.shape), xp)
        acc = term if acc is None else E.add(acc, term, xp)
    return acc


def quotient_values(
    config: StarkConfig, air: Air, trace, publics, alpha, xp, prep=None
):
    """Evaluate the α-folded constraint quotient on the quotient coset.

    Returns (lq, q_evals (M, D)) with M = n·2^lq, natural order.
    """
    F, E = config.field, config.ext
    n, w = trace.shape
    log_n = n.bit_length() - 1
    builder = air.build()
    lq = log_quotient_degree(builder.constraints)
    m = n << lq

    def to_coset(mat):
        coeffs = intt(F, xp.asarray(mat), xp)
        gpow = xp.asarray(_power_table(F, F.generator, n))
        scaled = F.monty_mul(coeffs, gpow[:, None], xp)
        return ntt(F, xp.pad(scaled, [(0, m - n), (0, 0)]), xp)

    lde_q = to_coset(trace)
    nxt = xp.roll(lde_q, -(1 << lq), axis=0)  # p(w_n·x): roll by stride
    prep_binding = {}
    if prep is not None:
        lde_p = to_coset(prep)
        prep_binding = {
            0: ("base", lde_p),
            1: ("base", xp.roll(lde_p, -(1 << lq), axis=0)),
        }
    sels = lde_selectors(F, log_n, lq, F.generator)
    pcols = air.periodic_columns()
    bindings = {
        "main": {0: ("base", lde_q), 1: ("base", nxt)},
        "periodic": {
            0: (
                "base",
                xp.stack(
                    [periodic_lde(F, c, log_n, lq, xp) for c in pcols],
                    axis=1,
                ),
            )
        }
        if pcols
        else {},
        "preprocessed": prep_binding,
        "perm": {},
        "publics": [xp.asarray(np.uint32(int(p) % F.P)) for p in publics],
        "challenges": [],
        "sels": {k: ("base", xp.asarray(v)) for k, v in sels.items()},
    }
    ev = Evaluator(F, E, xp)
    folded = _fold_constraints(E, builder, ev, bindings, alpha, xp)
    q = E.mul_base(folded, xp.asarray(sels["inv_vanishing"]), xp)
    return lq, q


def prove(
    config: StarkConfig,
    air: Air,
    trace: np.ndarray,
    publics,
    xp=np,
    prep_data=None,
) -> UniProof:
    """prep_data: offline `setup_preprocessed` result when the AIR has
    preprocessed columns (reference `prove_with_preprocessed`)."""
    F, E, pcs = config.field, config.ext, config.pcs
    n, w = trace.shape
    log_n = n.bit_length() - 1
    assert (getattr(air, "width_prep", 0) > 0) == (prep_data is not None)
    ch = config.challenger()
    ch.observe(log_n)
    if prep_data is not None:
        ch.observe_slice(prep_data.commitment)
    trace_data = pcs.commit([(1, np.asarray(trace))], xp)
    ch.observe_slice(trace_data.commitment)
    ch.observe_slice(np.asarray(publics, dtype=U32))
    alpha = ch.sample_ext(E)
    # original-domain prep evals recovered from the committed coefficients
    prep_evals = (
        ntt(F, xp.asarray(prep_data.matrices[0].coeffs), xp)
        if prep_data is not None
        else None
    )
    lq, q = quotient_values(
        config, air, trace, publics, alpha, xp, prep=prep_evals
    )
    qdeg = 1 << lq
    m = n << lq
    wq = F.two_adic_generator(log_n + lq)
    chunk_mats = []
    q = np.asarray(q)
    for i in range(qdeg):
        shift = F.generator * pow(wq, i, F.P) % F.P
        chunk_mats.append((shift, q[i::qdeg]))  # (n, D) base matrix
    q_data = pcs.commit(chunk_mats, xp)
    ch.observe_slice(q_data.commitment)
    zeta = ch.sample_ext(E)
    g_n = F.two_adic_generator(log_n)
    zeta_next = E.mul_base(zeta, np.uint32(g_n), np)
    rounds = [(trace_data, [[zeta, zeta_next]])]
    if prep_data is not None:
        rounds.append((prep_data, [[zeta, zeta_next]]))
    rounds.append((q_data, [[zeta]] * qdeg))
    opened, fri_proof = pcs.open(rounds, ch, xp)
    qi = 2 if prep_data is not None else 1
    return UniProof(
        log_n=log_n,
        trace_commit=trace_data.commitment,
        quotient_commit=q_data.commitment,
        trace_local=opened[0][0][0],
        trace_next=opened[0][0][1],
        quotient_chunks=[opened[qi][i][0] for i in range(qdeg)],
        fri=fri_proof,
        prep_commit=(
            np.asarray(prep_data.commitment) if prep_data else None
        ),
        prep_local=opened[1][0][0] if prep_data else None,
        prep_next=opened[1][0][1] if prep_data else None,
    )


def verify(
    config: StarkConfig,
    air: Air,
    proof: UniProof,
    publics,
    prep_commitment=None,
) -> bool:
    """prep_commitment: the verifying key from `setup_preprocessed`
    (required iff the AIR has preprocessed columns; reference
    `verify_with_preprocessed`)."""
    F, E, pcs = config.field, config.ext, config.pcs
    p = F.P
    log_n = proof.log_n
    n = 1 << log_n
    builder = air.build()
    lq = log_quotient_degree(builder.constraints)
    qdeg = 1 << lq
    if len(proof.quotient_chunks) != qdeg:
        raise ValueError("wrong number of quotient chunks")
    if np.asarray(proof.trace_local).shape != (air.width_main, E.D):
        raise ValueError("wrong trace opening shape")
    if np.asarray(proof.trace_next).shape != (air.width_main, E.D):
        raise ValueError("wrong trace_next opening shape")
    for c in proof.quotient_chunks:
        if np.asarray(c).shape != (E.D, E.D):
            raise ValueError("wrong quotient chunk shape")
    wp = getattr(air, "width_prep", 0)
    if (wp > 0) != (proof.prep_commit is not None):
        raise ValueError("preprocessed commitment presence mismatch")
    if wp:
        if prep_commitment is None or not np.array_equal(
            np.asarray(proof.prep_commit, dtype=U32),
            np.asarray(prep_commitment, dtype=U32),
        ):
            raise ValueError(
                "preprocessed commitment does not match verifying key"
            )
        if np.asarray(proof.prep_local).shape != (wp, E.D):
            raise ValueError("wrong prep opening shape")
        if np.asarray(proof.prep_next).shape != (wp, E.D):
            raise ValueError("wrong prep_next opening shape")
    ch = config.challenger()
    ch.observe(log_n)
    if wp:
        ch.observe_slice(proof.prep_commit)
    ch.observe_slice(proof.trace_commit)
    ch.observe_slice(np.asarray(publics, dtype=U32))
    alpha = ch.sample_ext(E)
    ch.observe_slice(proof.quotient_commit)
    zeta = ch.sample_ext(E)
    g_n = F.two_adic_generator(log_n)
    zeta_next = E.mul_base(zeta, np.uint32(g_n), np)
    # constraint fold at ζ
    domain = TwoAdicCoset(F, log_n, 1)
    sels = domain.selectors_at_point(E, zeta, np)
    pcols = air.periodic_columns()
    bindings = {
        "main": {
            0: ("ext", np.asarray(proof.trace_local, dtype=U32)),
            1: ("ext", np.asarray(proof.trace_next, dtype=U32)),
        },
        "periodic": {
            0: (
                "ext",
                np.stack(
                    [
                        periodic_at_point(F, E, c, log_n, zeta)
                        for c in pcols
                    ]
                ),
            )
        }
        if pcols
        else {},
        "preprocessed": {
            0: ("ext", np.asarray(proof.prep_local, dtype=U32)),
            1: ("ext", np.asarray(proof.prep_next, dtype=U32)),
        }
        if wp
        else {},
        "perm": {},
        "publics": [np.uint32(int(x) % p) for x in publics],
        "challenges": [],
        "sels": {
            "first": ("ext", sels["first"]),
            "last": ("ext", sels["last"]),
            "transition": ("ext", sels["transition"]),
        },
    }
    ev = Evaluator(F, E, np)
    folded = _fold_constraints(E, builder, ev, bindings, alpha, np)
    lhs = E.mul(folded, sels["inv_vanishing"], np)
    # recompose Q(ζ) from chunks
    q_zeta = recompose_quotient(config, log_n, lq, zeta, proof.quotient_chunks)
    if not np.array_equal(lhs, q_zeta):
        raise ValueError("quotient/constraint mismatch at zeta")
    # PCS verification binds openings to commitments
    rounds_v = [
        (
            proof.trace_commit,
            [
                (
                    log_n,
                    [
                        (zeta, np.asarray(proof.trace_local)),
                        (zeta_next, np.asarray(proof.trace_next)),
                    ],
                )
            ],
        ),
    ]
    if wp:
        rounds_v.append(
            (
                proof.prep_commit,
                [
                    (
                        log_n,
                        [
                            (zeta, np.asarray(proof.prep_local)),
                            (zeta_next, np.asarray(proof.prep_next)),
                        ],
                    )
                ],
            )
        )
    rounds_v.append(
        (
            proof.quotient_commit,
            [
                (log_n, [(zeta, np.asarray(proof.quotient_chunks[i]))])
                for i in range(qdeg)
            ],
        )
    )
    pcs.verify(rounds_v, proof.fri, ch)
    return True


def recompose_quotient(
    config: StarkConfig, log_n: int, lq: int, zeta, chunks
) -> np.ndarray:
    """Q(ζ) = Σ_i Q_i(ζ)·W_i(ζ): chunk i on sub-coset shift g·u^i of the
    size-n subgroup (u = w_M, M = n·2^lq);  W_i(ζ) =
    Π_{j≠i}(ζ^n − s^n u^{jn}) / Π_{j≠i} s^n(u^{in} − u^{jn})."""
    F, E = config.field, config.ext
    p = F.P
    n = 1 << log_n
    qdeg = 1 << lq
    wq = F.two_adic_generator(log_n + lq)
    u_n = pow(wq, n, p)  # primitive 2^lq-th root
    s_n = pow(F.generator, n, p)
    zeta_n = E.pow_static(np.asarray(zeta, dtype=U32), n, np)
    total = None
    for i in range(qdeg):
        # chunk value from its D flattened base-coefficient openings
        opened = np.asarray(chunks[i], dtype=U32)  # (D, D)
        q_i = None
        for d in range(E.D):
            basis = np.zeros((E.D,), dtype=U32)
            basis[d] = 1
            term = E.mul(opened[d], basis, np)
            q_i = term if q_i is None else E.add(q_i, term, np)
        num = None
        den = 1
        for j in range(qdeg):
            if j == i:
                continue
            zj = E.sub(
                zeta_n,
                E.from_base(np.uint32(s_n * pow(u_n, j, p) % p), np),
                np,
            )
            num = zj if num is None else E.mul(num, zj, np)
            den = den * (s_n * (pow(u_n, i, p) - pow(u_n, j, p)) % p) % p
        if num is None:  # qdeg == 1
            w_i = E.from_base(np.uint32(1), np)
        else:
            w_i = E.mul_base(num, np.uint32(pow(den, p - 2, p)), np)
        term = E.mul(q_i, w_i, np)
        total = term if total is None else E.add(total, term, np)
    return total

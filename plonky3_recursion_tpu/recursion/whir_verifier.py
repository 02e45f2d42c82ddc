"""In-circuit WHIR verifier: the native `stark.whir.Whir.verify` replayed
over circuit targets.

TPU-native analog of the reference's WHIR verifier circuit
(`recursion/src/pcs/whir/verifier.rs:64`, `sumcheck.rs`, `gadgets.rs`;
SURVEY.md §2.4 #49): sumcheck claim updates from compact [h(0), h(∞)]
round polys, STIR query MMCS paths through the chained Poseidon2 table,
affine-butterfly leaf folds with index-bit-derived domain points, the
final clear polynomial checked by packed Horner, and the terminal
  claim == Σ_c γ-weighted Π((1-r_j) + r_j·u^{2^j}) · fold(final_poly, r)
identity.  Value visibility: the initial commitment and the opened
(point, value) claims are PUBLIC; everything else is private witness
bound by the in-circuit transcript.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..circuit.builder import CircuitBuilder
from ..fields.monty31 import U32
from ..stark.challenger import DuplexChallenger
from ..stark.uni import StarkConfig
from ..stark.whir import WhirParams, WhirProof
from .batch_verifier import _Alloc, _bind
from .challenger_circuit import CircuitChallenger
from .mmcs_circuit import MmcsGadget


@dataclasses.dataclass
class WhirVerifierCircuitResult:
    builder: CircuitBuilder
    public_extractors: list
    private_extractors: list
    config: object
    params: WhirParams
    npo_specs: list
    n_points: int
    base_leaf0: bool

    def pack_public_inputs(self, view) -> list:
        return [f(view) for f in self.public_extractors]

    def pack_private_inputs(self, view) -> list:
        return [f(view) for f in self.private_extractors]

    def pack_npo_private(self, view) -> dict:
        rows = _replay_rows(
            self.config, self.params, view, self.base_leaf0
        )
        out = {}
        for kind, tag, chunk, q, levels in self.npo_specs:
            row = rows[(chunk, q)]
            _leaf, path = (
                view.proof.query_openings[chunk][q]
            )
            for lv in range(levels):
                out[(tag, lv)] = {
                    "bit": (row >> lv) & 1,
                    "sibling": np.asarray(path[lv], dtype=U32),
                }
        return out


class _WhirView:
    """Extractor view: proof + the public statement."""

    def __init__(self, commitment, points, values, proof: WhirProof):
        self.commitment = np.asarray(commitment, dtype=U32)
        self.points = [np.asarray(z, dtype=U32) for z in points]
        self.values = [np.asarray(y, dtype=U32) for y in values]
        self.proof = proof


def _replay_rows(config, P: WhirParams, view: _WhirView, base_leaf0):
    """Native transcript replay collecting every sampled query row."""
    F, E = config.field, config.ext
    ch = DuplexChallenger(F)
    proof = view.proof
    k = P.folding_factor
    ch.observe_slice(np.asarray(proof.commitments[0]))
    for z, y in zip(view.points, view.values):
        ch.observe_slice(z)
        ch.observe_slice(y)
    ch.sample_ext(E)
    ch.observe_slice(np.asarray(proof.ood_answers[0][0], dtype=U32))
    ch.sample_ext(E)
    rows = {}

    def chunk(ci, nr):
        for h0, hinf in proof.sumcheck_polys[ci]:
            ch.observe_slice(np.asarray(h0, U32))
            ch.observe_slice(np.asarray(hinf, U32))
            ch.sample_ext(E)

    chunk(0, k)
    for i in range(1, P.num_rounds):
        _n, log_prev = P.round_shape(i - 1)
        ch.observe_slice(np.asarray(proof.commitments[i]))
        ch.sample_ext(E)
        ch.observe_slice(np.asarray(proof.ood_answers[i][0], U32))
        if P.query_pow_bits:
            ch.check_witness(
                P.query_pow_bits, proof.pow_witnesses[i - 1]
            )
        for q in range(P.num_queries):
            rows[(i - 1, q)] = ch.sample_bits(log_prev - k)
        ch.sample_ext(E)
        chunk(i, k)
    for row_v in np.asarray(proof.final_poly, U32):
        ch.observe_slice(row_v)
    if P.query_pow_bits:
        ch.check_witness(
            P.query_pow_bits, proof.pow_witnesses[P.num_rounds - 1]
        )
    _fn, log_last = P.round_shape(P.num_rounds - 1)
    for q in range(P.num_queries):
        rows[(P.num_rounds - 1, q)] = ch.sample_bits(log_last - k)
    return rows


def build_whir_verifier_circuit(
    config: StarkConfig,
    params: WhirParams,
    n_points: int,
    base_leaf0: bool = True,
) -> WhirVerifierCircuitResult:
    """Circuit verifying WHIR proofs of `params`' shape opened at
    `n_points` caller points.  base_leaf0: round-0 committed vector was
    base-field (leaf width 2^k base values); later rounds are always ext."""
    F, E = config.field, config.ext
    p = F.P
    d = E.D
    k = params.folding_factor
    n = params.num_variables
    from ..prover.horner_table import horner_npo_for
    from ..prover.poseidon2_table import poseidon2_npo_for
    from ..prover.recompose_table import recompose_npo_for

    b = CircuitBuilder(E)
    npo = poseidon2_npo_for(F.name)
    b.enable_op(npo)
    b.enable_recompose(recompose_npo_for(F.name))
    b.enable_horner(horner_npo_for(F.name))
    al = _Alloc(b)
    ch = CircuitChallenger(b, npo.type_id)
    mmcs = MmcsGadget(b, npo.type_id)
    one = b.one()
    inv2 = b.const(pow(2, p - 2, p))

    def priv_ext(extract):
        coeffs = al.private_vec(d, extract)
        return coeffs, b.recompose_base_coeffs_to_ext(coeffs)

    commit0 = al.public_vec(
        8, lambda v, i: int(v.commitment[i])
    )
    ch.observe_slice(commit0)
    constraints = []  # (point target, n_vars, coeff target)
    claim = b.zero
    pts = []
    for m in range(n_points):
        zc = al.public_vec(d, _bind(lambda v, m, j: int(v.points[m][j]), m))
        ch.observe_slice(zc)
        yc = al.public_vec(d, _bind(lambda v, m, j: int(v.values[m][j]), m))
        ch.observe_slice(yc)
        pts.append(
            (b.recompose_base_coeffs_to_ext(zc), b.recompose_base_coeffs_to_ext(yc))
        )
    u0 = ch.sample_ext()
    a0c, a0 = priv_ext(lambda v, j: int(v.proof.ood_answers[0][0][j]))
    ch.observe_slice(a0c)
    gamma = ch.sample_ext()
    gpow = one
    for z_t, y_t in pts + [(u0, a0)]:
        constraints.append((z_t, n, gpow))
        claim = b.add(claim, b.mul(gpow, y_t))
        gpow = b.mul(gpow, gamma)
    r_all = []

    def sumcheck_chunk(ci, nr):
        nonlocal claim
        rs = []
        for ri in range(nr):
            h0c, h0 = priv_ext(
                _bind(
                    lambda v, ci, ri, j: int(
                        v.proof.sumcheck_polys[ci][ri][0][j]
                    ),
                    ci,
                    ri,
                )
            )
            ch.observe_slice(h0c)
            hic, hinf = priv_ext(
                _bind(
                    lambda v, ci, ri, j: int(
                        v.proof.sumcheck_polys[ci][ri][1][j]
                    ),
                    ci,
                    ri,
                )
            )
            ch.observe_slice(hic)
            r = ch.sample_ext()
            # claim' = h0·(1−r) + (claim−h0)·r + h∞·r·(r−1)
            h1 = b.sub(claim, h0)
            t = b.mul(h0, b.sub(one, r))
            t = b.mul_add(h1, r, t)
            claim = b.mul_add(hinf, b.mul(r, b.sub(r, one)), t)
            rs.append(r)
        r_all.extend(rs)
        return rs

    def pow_from_bits(bits, base: int):
        """base^{Σ bits_j·2^j} as a target (natural-order index)."""
        x = one
        cur = base % p
        for bit in bits:
            x = b.mul(x, b.select(bit, b.const(cur), one))
            cur = cur * cur % p
        return x

    def leaf_fold(leaf_vals, rs, bits, log_dom):
        """k affine butterflies over one leaf; leaf_vals: 2^k ext targets."""
        n_dom = 1 << log_dom
        w = F.two_adic_generator(log_dom)
        # y0 = ω^row, inverted once; level t uses y0^{2^t}
        y0 = pow_from_bits(bits, w)
        inv_y0 = b.div(one, y0)
        vals = list(leaf_vals)
        for t in range(k):
            half = len(vals) // 2
            r = rs[t]
            nxt = []
            for m in range(half):
                fy, fny = vals[m], vals[m + half]
                even = b.mul(b.add(fy, fny), inv2)
                # odd = (fy − fny) / (2·ω^{(m·N/2^k)·2^t}·y0^{2^t})
                wc = pow(w, (m * (n_dom >> k) << t) % n_dom, p)
                cconst = pow(2 * wc % p, p - 2, p)
                odd = b.mul(
                    b.mul(b.sub(fy, fny), b.const(cconst)), inv_y0
                )
                nxt.append(b.mul_add(r, b.sub(odd, even), even))
            vals = nxt
            inv_y0 = b.mul(inv_y0, inv_y0)
        return vals[0]

    rs = sumcheck_chunk(0, k)
    prev_commit = commit0
    prev_base = base_leaf0
    for i in range(1, params.num_rounds):
        n_i, _ld = params.round_shape(i)
        _pn, log_prev = params.round_shape(i - 1)
        ci = al.private_vec(
            8, _bind(lambda v, i, j: int(v.proof.commitments[i][j]), i)
        )
        ch.observe_slice(ci)
        u = ch.sample_ext()
        ac, a = priv_ext(
            _bind(lambda v, i, j: int(v.proof.ood_answers[i][0][j]), i)
        )
        ch.observe_slice(ac)
        if params.query_pow_bits:
            wtn = al.private(
                _bind(lambda v, i: int(v.proof.pow_witnesses[i - 1]), i)
            )
            ch.check_pow_witness(wtn, params.query_pow_bits)
        idx_bits = log_prev - k
        width = (1 << k) if prev_base else (1 << k) * d
        new_claims = []
        for q in range(params.num_queries):
            bits = ch.sample_bits(idx_bits, is_index=True)
            leaf = al.private_vec(
                width,
                _bind(
                    lambda v, i, q, j: int(
                        np.asarray(v.proof.query_openings[i - 1][q][0], U32)
                        .reshape(-1)[j]
                    ),
                    i,
                    q,
                ),
            )
            tag = ("whirq", i - 1, q)
            al.npo_specs.append(("whir", tag, i - 1, q, idx_bits))
            mmcs.verify_batch(
                prev_commit, [(1 << idx_bits, width)], bits, [leaf], tag
            )
            if prev_base:
                leaf_vals = list(leaf)
            else:
                leaf_vals = [
                    b.recompose_base_coeffs_to_ext(
                        leaf[m * d : (m + 1) * d]
                    )
                    for m in range(1 << k)
                ]
            fv = leaf_fold(leaf_vals, rs, bits, log_prev)
            z_row = pow_from_bits(
                bits, pow(F.two_adic_generator(log_prev), 1 << k, p)
            )
            new_claims.append((z_row, fv))
        gamma = ch.sample_ext()
        gpow = one
        for z_t, y_t in [(u, a)] + new_claims:
            constraints.append((z_t, n_i, gpow))
            claim = b.add(claim, b.mul(gpow, y_t))
            gpow = b.mul(gpow, gamma)
        rs = sumcheck_chunk(i, k)
        prev_commit = ci
        prev_base = False
    # final phase
    fnv = params.final_num_variables
    final_ts = []
    for a_i in range(1 << fnv):
        fc = al.private_vec(
            d, _bind(lambda v, a_i, j: int(v.proof.final_poly[a_i][j]), a_i)
        )
        ch.observe_slice(fc)
        final_ts.append(b.recompose_base_coeffs_to_ext(fc))
    if params.query_pow_bits:
        wtn = al.private(
            lambda v: int(v.proof.pow_witnesses[params.num_rounds - 1])
        )
        ch.check_pow_witness(wtn, params.query_pow_bits)
    _fn, log_last = params.round_shape(params.num_rounds - 1)
    idx_bits = log_last - k
    width = (1 << k) if prev_base else (1 << k) * d
    for q in range(params.num_queries):
        bits = ch.sample_bits(idx_bits, is_index=True)
        leaf = al.private_vec(
            width,
            _bind(
                lambda v, q, j: int(
                    np.asarray(v.proof.query_openings[-1][q][0], U32)
                    .reshape(-1)[j]
                ),
                q,
            ),
        )
        tag = ("whirq", params.num_rounds - 1, q)
        al.npo_specs.append(
            ("whir", tag, params.num_rounds - 1, q, idx_bits)
        )
        mmcs.verify_batch(
            prev_commit, [(1 << idx_bits, width)], bits, [leaf], tag
        )
        if prev_base:
            leaf_vals = list(leaf)
        else:
            leaf_vals = [
                b.recompose_base_coeffs_to_ext(leaf[m * d : (m + 1) * d])
                for m in range(1 << k)
            ]
        fv = leaf_fold(leaf_vals, rs, bits, log_last)
        z_row = pow_from_bits(
            bits, pow(F.two_adic_generator(log_last), 1 << k, p)
        )
        # final queries check directly against the clear final polynomial
        b.connect(fv, b.horner_eval(z_row, final_ts))
    sumcheck_chunk(params.num_rounds, fnv)
    # terminal identity
    total = len(r_all)
    wsum = b.zero
    for z_t, v_at, coeff in constraints:
        start = total - v_at
        acc = one
        cur = z_t
        for j in range(v_at):
            r = r_all[start + j]
            acc = b.mul(acc, b.mul_add(r, b.sub(cur, one), one))
            cur = b.mul(cur, cur)
        wsum = b.add(wsum, b.mul(coeff, acc))
    cfin = final_ts
    for r in r_all[total - fnv :]:
        cfin = [
            b.mul_add(r, b.sub(cfin[2 * m + 1], cfin[2 * m]), cfin[2 * m])
            for m in range(len(cfin) // 2)
        ]
    b.connect(claim, b.mul(wsum, cfin[0]))
    return WhirVerifierCircuitResult(
        builder=b,
        public_extractors=al.pub,
        private_extractors=al.priv,
        config=config,
        params=params,
        npo_specs=al.npo_specs,
        n_points=n_points,
        base_leaf0=base_leaf0,
    )

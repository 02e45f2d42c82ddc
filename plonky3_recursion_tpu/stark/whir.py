"""WHIR: sumcheck-based multilinear PCS with STIR-style queries.

TPU-native equivalent of the reference's `p3-whir` + `p3-sumcheck`
dependency surface (SURVEY.md §2.6 #70) and the protocol the reference's
in-circuit WHIR verifier replays (`recursion/src/pcs/whir/verifier.rs:64`,
`sumcheck.rs:28-93`).  Self-consistent rebuild (not bit-compatible with
p3-whir): one committed vector `v` of length 2^n serves dually as

  * the hypercube EVALUATIONS of a multilinear F (sumcheck side), and
  * the COEFFICIENTS of a univariate G(y) = Σ_a v[a]·y^a (code side).

Commitment: the Reed–Solomon codeword E = NTT(pad(v)) over the size-N
subgroup, reshaped so Merkle leaf `row` holds G on the coset
{y : y^{2^k} = ω^{2^k·row}} (= E.reshape(2^k, N/2^k).T — a stride view).

Claims are univariate evaluations G(u) = a, i.e. weighted hypercube sums
Σ_b v[b]·u^{int(b)}; the weight MLE factorizes as Π_j ((1-r_j)+r_j·u^{2^j})
so the verifier evaluates every constraint in O(n) at the end.

Per round: γ-batch new claims into the running sum, run k sumcheck rounds
(compact [h(0), h(∞)] round polys, h(1) = claim − h(0)), fold v in the
evaluation basis v' = (1-r)·v_even + r·v_odd — whose univariate is exactly
G' = (1-r)·G_e + r·G_o, so a leaf of the PREVIOUS codeword folds to a
VALUE of the new G' via k affine butterflies:
  even = (f(y)+f(-y))/2,  odd = (f(y)-f(-y))/(2y),
  next = (1-r)·even + r·odd            at point y².
Those folded values at queried domain points become the next round's
univariate claims (STIR).  The final vector is sent in the clear; final
queries check it by Horner, and the terminal identity is
  claim == (Σ_c γ-weighted constraint evals at r) · fold(final_poly, r_tail).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..fields.monty31 import Monty31, U32
from ..ops.ntt import ntt
from .merkle import MerkleMmcs, flatten_ext_matrix
from .challenger import DuplexChallenger


@dataclasses.dataclass(frozen=True)
class WhirParams:
    num_variables: int
    log_inv_rate: int = 2
    folding_factor: int = 2  # k: variables folded per commitment round
    final_num_variables: int = 2
    num_queries: int = 16
    ood_samples: int = 1
    query_pow_bits: int = 0

    def __post_init__(self):
        assert (
            self.num_variables - self.final_num_variables
        ) % self.folding_factor == 0, (
            "num_variables - final_num_variables must be a multiple of "
            "the folding factor"
        )

    @property
    def num_rounds(self) -> int:
        """Number of committed rounds (incl. the initial commitment)."""
        return (
            self.num_variables - self.final_num_variables
        ) // self.folding_factor

    def round_shape(self, i: int) -> tuple[int, int]:
        """(n_vars, log_domain) of round-i's committed vector."""
        n_i = self.num_variables - i * self.folding_factor
        log_n_i = n_i + self.log_inv_rate + i * (self.folding_factor - 1)
        return n_i, log_n_i


@dataclasses.dataclass
class WhirProof:
    commitments: list  # (8,) digests per committed round
    ood_answers: list  # [round][sample] -> (D,)
    sumcheck_polys: list  # [chunk][round_in_chunk] -> ((D,), (D,)) = (h0, hinf)
    final_poly: np.ndarray  # (2^final_nv, D)
    query_openings: list  # [chunk>=1][query] -> (leaf (2^k, D) or (2^k,), path)
    pow_witnesses: list  # per query-sampling block


def _powers_vector(E, u, v: int, xp=np):
    """w[int(b)] = u^{int(b)} for b in {0,1}^v as (2^v, D) (LSB-first)."""
    t = E.from_base(np.asarray([1], dtype=U32), xp)
    cur = np.asarray(u, dtype=U32)
    for _ in range(v):
        t = xp.concatenate([t, E.mul(t, xp.broadcast_to(cur, t.shape), xp)])
        cur = E.mul(cur, cur, xp)
    return t


def _univariate_eval(E, coeffs, u, xp=np):
    """Σ_a coeffs[a]·u^a, coeffs (m, D) ext."""
    acc = E.zeros((), xp)
    for a in range(coeffs.shape[0] - 1, -1, -1):
        acc = E.add(E.mul(acc, np.asarray(u, dtype=U32), xp), coeffs[a], xp)
    return acc


def _fold_pair(E, v, r, xp=np):
    """(1-r)·v_even + r·v_odd over interleaved pairs; v (2m, D)."""
    ev, od = v[0::2], v[1::2]
    diff = E.sub(od, ev, xp)
    return E.add(ev, E.mul(diff, xp.broadcast_to(r, diff.shape), xp), xp)


def _leaf_fold(F, E, leaf, rs, row: int, log_dom: int, k: int, xp=np):
    """Fold one leaf (2^k codeword values on the row's coset) down to the
    folded univariate's value via k affine butterflies."""
    p = F.P
    w = F.two_adic_generator(log_dom)
    n_dom = 1 << log_dom
    # coset points y_m = ω^{row + m·N/2^k}
    ys = [
        pow(w, (row + m * (n_dom >> k)) % n_dom, p) for m in range(1 << k)
    ]
    vals = [np.asarray(x, dtype=U32) for x in leaf]
    inv2 = pow(2, p - 2, p)
    for t in range(k):
        half = len(vals) // 2
        r = rs[t]
        nxt = []
        for m in range(half):
            fy, fny = vals[m], vals[m + half]
            even = E.mul_base(
                E.add(fy, fny, xp), np.uint32(inv2), xp
            )
            inv_2y = pow(2 * ys[m] % p, p - 2, p)
            odd = E.mul_base(
                E.sub(fy, fny, xp), np.uint32(inv_2y), xp
            )
            diff = E.sub(odd, even, xp)
            nxt.append(
                E.add(even, E.mul(diff, np.asarray(r, dtype=U32), xp), xp)
            )
            ys[m] = ys[m] * ys[m] % p
        vals = nxt
    return vals[0]


class Whir:
    """Prover + verifier for the WHIR protocol above."""

    def __init__(self, field: Monty31, ext, params: WhirParams):
        self.F = field
        self.E = ext
        self.P = params
        self.mmcs = MerkleMmcs(field)

    # ----- commit -----

    def _encode(self, vec, log_dom: int, xp=np):
        """NTT codeword of `vec` (coefficients), reshaped to leaf rows:
        (N/2^k, 2^k[, D])."""
        F, k = self.F, self.P.folding_factor
        n_dom = 1 << log_dom
        pad = [(0, n_dom - vec.shape[0])] + [(0, 0)] * (vec.ndim - 1)
        cw = ntt(F, np.pad(np.asarray(vec, dtype=U32), pad), xp)
        # leaf row i holds E[i + m·N/2^k] for m < 2^k
        return np.moveaxis(
            cw.reshape((1 << k,) + (n_dom >> k,) + cw.shape[1:]), 0, 1
        )

    def commit(self, vec: np.ndarray):
        """vec: (2^n,) base or (2^n, D) ext coefficient/eval vector."""
        assert vec.shape[0] == 1 << self.P.num_variables
        _nv, log_dom = self.P.round_shape(0)
        rows = self._encode(vec, log_dom)
        flat = (
            rows.reshape(rows.shape[0], -1)
            if rows.ndim == 3
            else rows
        )
        root, tree = self.mmcs.commit([np.ascontiguousarray(flat)])
        return root, (tree, vec)

    # ----- prove -----

    def prove(self, prover_data, points: list, challenger: DuplexChallenger):
        """Open the committed vector's univariate G at `points` (each (D,)).
        Returns (claimed values, WhirProof)."""
        F, E, P = self.F, self.E, self.P
        tree0, vec = prover_data
        xp = np
        # ext view of the committed vector
        C = (
            np.asarray(vec, dtype=U32)
            if vec.ndim == 2
            else E.from_base(np.asarray(vec, dtype=U32), xp)
        )
        values = [_univariate_eval(E, C, z, xp) for z in points]
        k = P.folding_factor
        n = P.num_variables
        # initial claims: caller's points (answers are the return values,
        # observed by the caller's wrapping protocol) + one OOD sample
        ood_answers = []
        sumcheck_polys = []
        query_openings = []
        pow_witnesses = []
        commitments = [tree0.root]
        challenger.observe_slice(np.asarray(tree0.root))
        for z, y in zip(points, values):
            challenger.observe_slice(np.asarray(z, dtype=U32))
            challenger.observe_slice(np.asarray(y, dtype=U32))
        u0 = challenger.sample_ext(E)
        a0 = _univariate_eval(E, C, u0, xp)
        challenger.observe_slice(np.asarray(a0, dtype=U32))
        ood_answers.append([np.asarray(a0, dtype=U32)])
        gamma = challenger.sample_ext(E)
        # running weight vector W and claim
        W = E.zeros((1 << n,), xp)
        claim = E.zeros((), xp)
        gpow = E.from_base(np.asarray(1, dtype=U32), xp)
        for z, y in list(zip(points, values)) + [(u0, a0)]:
            W = E.add(
                W,
                E.mul(
                    _powers_vector(E, z, n, xp),
                    xp.broadcast_to(gpow, (1 << n, E.D)),
                    xp,
                ),
                xp,
            )
            claim = E.add(claim, E.mul(gpow, np.asarray(y, U32), xp), xp)
            gpow = E.mul(gpow, gamma, xp)

        trees = [tree0]
        r_all = []

        def sumcheck_chunk(n_rounds):
            nonlocal C, W, claim
            chunk = []
            rs = []
            for _ in range(n_rounds):
                ev_c, od_c = C[0::2], C[1::2]
                ev_w, od_w = W[0::2], W[1::2]
                h0 = _ext_dot(E, ev_w, ev_c, xp)
                hinf = _ext_dot(
                    E, E.sub(od_w, ev_w, xp), E.sub(od_c, ev_c, xp), xp
                )
                challenger.observe_slice(np.asarray(h0, U32))
                challenger.observe_slice(np.asarray(hinf, U32))
                r = challenger.sample_ext(E)
                # claim' = h(r) with h(1) = claim − h(0)
                claim = _extrapolate_01inf(E, h0, claim, hinf, r, xp)
                C = _fold_pair(E, C, r, xp)
                W = _fold_pair(E, W, r, xp)
                chunk.append((np.asarray(h0, U32), np.asarray(hinf, U32)))
                rs.append(np.asarray(r, U32))
            sumcheck_polys.append(chunk)
            r_all.extend(rs)
            return rs

        rs = sumcheck_chunk(k)
        for i in range(1, P.num_rounds):
            n_i, log_dom_i = P.round_shape(i)
            _pn, log_dom_prev = P.round_shape(i - 1)
            rows = self._encode(C, log_dom_i, xp)
            root, tree = self.mmcs.commit(
                [np.ascontiguousarray(flatten_ext_matrix(rows))]
            )
            trees.append(tree)
            commitments.append(root)
            challenger.observe_slice(np.asarray(root))
            u = challenger.sample_ext(E)
            a = _univariate_eval(E, C, u, xp)
            challenger.observe_slice(np.asarray(a, U32))
            ood_answers.append([np.asarray(a, U32)])
            if P.query_pow_bits:
                pow_witnesses.append(challenger.grind(P.query_pow_bits))
            # STIR queries against the PREVIOUS commitment
            idx_bits = log_dom_prev - k
            new_points = []
            fold_vals = []
            opens = []
            for _q in range(P.num_queries):
                row = challenger.sample_bits(idx_bits)
                opened, path = self.mmcs.open_batch(row, trees[i - 1])
                leaf = opened[0]
                if leaf.ndim == 1 and i - 1 == 0 and C.ndim == 2:
                    pass
                leaf_vals = (
                    E.from_base(leaf, xp)
                    if i - 1 == 0 and vec.ndim == 1
                    else np.asarray(leaf, U32).reshape(1 << k, E.D)
                )
                fv = _leaf_fold(
                    F, E, leaf_vals, rs, row, log_dom_prev, k, xp
                )
                z_row = pow(
                    F.two_adic_generator(log_dom_prev),
                    (row << k) % (1 << log_dom_prev),
                    F.P,
                )
                new_points.append(E.from_base(np.asarray(z_row, U32), xp))
                fold_vals.append(fv)
                opens.append((np.asarray(leaf), path))
            query_openings.append(opens)
            gamma = challenger.sample_ext(E)
            gpow = E.from_base(np.asarray(1, U32), xp)
            for z, y in zip(
                [np.asarray(u, U32)] + new_points,
                [np.asarray(a, U32)] + fold_vals,
            ):
                W = E.add(
                    W,
                    E.mul(
                        _powers_vector(E, z, n_i, xp),
                        xp.broadcast_to(gpow, (1 << n_i, E.D)),
                        xp,
                    ),
                    xp,
                )
                claim = E.add(claim, E.mul(gpow, np.asarray(y, U32), xp), xp)
                gpow = E.mul(gpow, gamma, xp)
            rs = sumcheck_chunk(k)
        # final phase
        final_poly = np.asarray(C, dtype=U32)
        for row_v in final_poly:
            challenger.observe_slice(np.asarray(row_v, U32))
        if P.query_pow_bits:
            pow_witnesses.append(challenger.grind(P.query_pow_bits))
        _fn, log_dom_last = P.round_shape(P.num_rounds - 1)
        idx_bits = log_dom_last - k
        opens = []
        for _q in range(P.num_queries):
            row = challenger.sample_bits(idx_bits)
            opened, path = self.mmcs.open_batch(row, trees[-1])
            opens.append((np.asarray(opened[0]), path))
        query_openings.append(opens)
        sumcheck_chunk(P.final_num_variables)
        proof = WhirProof(
            commitments=commitments,
            ood_answers=ood_answers,
            sumcheck_polys=sumcheck_polys,
            final_poly=final_poly,
            query_openings=query_openings,
            pow_witnesses=pow_witnesses,
        )
        return values, proof

    # ----- verify -----

    def verify(
        self,
        commitment,
        points: list,
        values: list,
        proof: WhirProof,
        challenger: DuplexChallenger,
    ) -> bool:
        F, E, P = self.F, self.E, self.P
        xp = np
        k = P.folding_factor
        n = P.num_variables
        if not np.array_equal(
            np.asarray(commitment), np.asarray(proof.commitments[0])
        ):
            raise ValueError("whir: wrong initial commitment")
        if len(proof.commitments) != P.num_rounds:
            raise ValueError("whir: wrong commitment count")
        if np.asarray(proof.final_poly).shape != (
            1 << P.final_num_variables,
            E.D,
        ):
            raise ValueError("whir: bad final poly shape")
        challenger.observe_slice(np.asarray(proof.commitments[0]))
        for z, y in zip(points, values):
            challenger.observe_slice(np.asarray(z, dtype=U32))
            challenger.observe_slice(np.asarray(y, dtype=U32))
        u0 = challenger.sample_ext(E)
        a0 = np.asarray(proof.ood_answers[0][0], U32)
        challenger.observe_slice(a0)
        gamma = challenger.sample_ext(E)
        # constraints: (point, n_vars at introduction, γ-coefficient)
        constraints = []
        claim = E.zeros((), xp)
        gpow = E.from_base(np.asarray(1, U32), xp)
        for z, y in list(zip(points, values)) + [(u0, a0)]:
            constraints.append((np.asarray(z, U32), n, gpow))
            claim = E.add(claim, E.mul(gpow, np.asarray(y, U32), xp), xp)
            gpow = E.mul(gpow, gamma, xp)
        r_all = []

        def replay_chunk(ci, n_rounds):
            nonlocal claim
            chunk = proof.sumcheck_polys[ci]
            if len(chunk) != n_rounds:
                raise ValueError("whir: sumcheck chunk length")
            rs = []
            for h0, hinf in chunk:
                h0 = np.asarray(h0, U32)
                hinf = np.asarray(hinf, U32)
                challenger.observe_slice(h0)
                challenger.observe_slice(hinf)
                r = challenger.sample_ext(E)
                claim = _extrapolate_01inf(E, h0, claim, hinf, r, xp)
                rs.append(np.asarray(r, U32))
            r_all.extend(rs)
            return rs

        rs = replay_chunk(0, k)
        pw = 0
        for i in range(1, P.num_rounds):
            n_i, log_dom_i = P.round_shape(i)
            _pn, log_dom_prev = P.round_shape(i - 1)
            root = np.asarray(proof.commitments[i])
            challenger.observe_slice(root)
            u = challenger.sample_ext(E)
            a = np.asarray(proof.ood_answers[i][0], U32)
            challenger.observe_slice(a)
            if P.query_pow_bits:
                if not challenger.check_witness(
                    P.query_pow_bits, proof.pow_witnesses[pw]
                ):
                    raise ValueError("whir: bad query PoW")
                pw += 1
            idx_bits = log_dom_prev - k
            prev_nv = n_i + k
            new_points = []
            fold_vals = []
            for q in range(P.num_queries):
                row = challenger.sample_bits(idx_bits)
                leaf, path = proof.query_openings[i - 1][q]
                leaf = np.asarray(leaf, U32)
                if not self.mmcs.verify_batch(
                    np.asarray(proof.commitments[i - 1]),
                    [((1 << idx_bits), leaf.reshape(-1).shape[0])],
                    row,
                    [leaf.reshape(-1)],
                    path,
                ):
                    raise ValueError("whir: query MMCS failed")
                leaf_vals = (
                    E.from_base(leaf.reshape(-1), xp)
                    if i - 1 == 0 and leaf.reshape(-1).shape[0] == (1 << k)
                    else leaf.reshape(1 << k, E.D)
                )
                fv = _leaf_fold(
                    F, E, leaf_vals, rs, row, log_dom_prev, k, xp
                )
                z_row = pow(
                    F.two_adic_generator(log_dom_prev),
                    (row << k) % (1 << log_dom_prev),
                    F.P,
                )
                new_points.append(E.from_base(np.asarray(z_row, U32), xp))
                fold_vals.append(fv)
            gamma = challenger.sample_ext(E)
            gpow = E.from_base(np.asarray(1, U32), xp)
            for z, y in zip([u] + new_points, [a] + fold_vals):
                constraints.append((np.asarray(z, U32), n_i, gpow))
                claim = E.add(claim, E.mul(gpow, np.asarray(y, U32), xp), xp)
                gpow = E.mul(gpow, gamma, xp)
            rs = replay_chunk(i, k)
        # final phase
        final_poly = np.asarray(proof.final_poly, U32)
        for row_v in final_poly:
            challenger.observe_slice(row_v)
        if P.query_pow_bits:
            if not challenger.check_witness(
                P.query_pow_bits, proof.pow_witnesses[pw]
            ):
                raise ValueError("whir: bad final PoW")
        _fn, log_dom_last = P.round_shape(P.num_rounds - 1)
        idx_bits = log_dom_last - k
        for q in range(P.num_queries):
            row = challenger.sample_bits(idx_bits)
            leaf, path = proof.query_openings[-1][q]
            leaf = np.asarray(leaf, U32)
            if not self.mmcs.verify_batch(
                np.asarray(proof.commitments[-1]),
                [((1 << idx_bits), leaf.reshape(-1).shape[0])],
                row,
                [leaf.reshape(-1)],
                path,
            ):
                raise ValueError("whir: final query MMCS failed")
            leaf_vals = (
                E.from_base(leaf.reshape(-1), xp)
                if P.num_rounds == 1 and leaf.reshape(-1).shape[0] == (1 << k)
                else leaf.reshape(1 << k, E.D)
            )
            fv = _leaf_fold(F, E, leaf_vals, rs, row, log_dom_last, k, xp)
            z_row = pow(
                F.two_adic_generator(log_dom_last),
                (row << k) % (1 << log_dom_last),
                F.P,
            )
            # final queries check DIRECTLY against the clear final poly
            want = _univariate_eval(
                E, final_poly, E.from_base(np.asarray(z_row, U32), xp), xp
            )
            if not np.array_equal(np.asarray(fv), np.asarray(want)):
                raise ValueError("whir: final fold/poly mismatch")
        replay_chunk(P.num_rounds, P.final_num_variables)
        # terminal identity: claim == Σ_c coeff·Π((1-r)+r·u^{2^j}) · C(r_tail)
        wsum = E.zeros((), xp)
        total = len(r_all)
        one = E.from_base(np.asarray(1, U32), xp)
        for z, v_at, coeff in constraints:
            start = total - v_at
            acc = one
            cur = np.asarray(z, U32)
            for j in range(v_at):
                r = r_all[start + j]
                term = E.add(
                    E.sub(one, r, xp), E.mul(r, cur, xp), xp
                )
                acc = E.mul(acc, term, xp)
                cur = E.mul(cur, cur, xp)
            wsum = E.add(wsum, E.mul(coeff, acc, xp), xp)
        cfin = final_poly
        for r in r_all[total - P.final_num_variables :]:
            cfin = _fold_pair(E, cfin, r, xp)
        want = E.mul(wsum, cfin[0], xp)
        if not np.array_equal(np.asarray(claim), np.asarray(want)):
            raise ValueError("whir: terminal sumcheck identity failed")
        return True


def _ext_dot(E, a, b, xp):
    prod = E.mul(a, b, xp)
    acc = prod[0]
    for i in range(1, prod.shape[0]):
        acc = E.add(acc, prod[i], xp)
    return acc


def _extrapolate_01inf(E, h0, claim, hinf, r, xp):
    """h(r) from (h(0), h(1)=claim−h(0), h(∞)): h0·(1−r) + h1·r + h∞·r·(r−1)."""
    one = E.from_base(np.asarray(1, dtype=U32), xp)
    h1 = E.sub(claim, h0, xp)
    w0 = E.sub(one, np.asarray(r, U32), xp)
    winf = E.mul(np.asarray(r, U32), E.sub(np.asarray(r, U32), one, xp), xp)
    out = E.mul(h0, w0, xp)
    out = E.add(out, E.mul(h1, np.asarray(r, U32), xp), xp)
    return E.add(out, E.mul(hinf, winf, xp), xp)

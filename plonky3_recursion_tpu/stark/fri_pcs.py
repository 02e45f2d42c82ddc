"""TwoAdicFriPcs: FRI-based polynomial commitment scheme.

TPU-native equivalent of the reference's upstream `p3-fri`
(`TwoAdicFriPcs`, `FriParameters`) + the PCS face of `p3-commit`
(SURVEY.md §2.6).  Variable-arity folding: each phase folds 2^a with
a ≤ max_log_arity (`FriParams.standard()` uses max_log_arity=2, matching
the reference's example defaults), the schedule stopping at pending
roll-in heights (`fri_phase_schedule`).

Layout / protocol conventions (self-consistent across prover, native
verifier and the recursion circuits):

* Every committed matrix is re-interpolated from its own coset domain
  (shift s_i, size 2^k_i) and low-degree-extended onto the STANDARD commit
  domain g·K of size 2^(k_i + log_blowup) in BIT-REVERSED row order (g the
  field generator), then Merkle-committed as one mixed-height batch.
* The batch-opening reduction: with a single global α counter over
  (round, matrix, point, column),
      acc_H(x) += α^k · (p_c(x) − p_c(z)) / (x − z)
  accumulated per LDE height H.  Fold partners (x, −x) are adjacent in
  bit-reversed order; the phase-r fold of value pairs (a, b) at pair point
  x is  (a+b)/2 + β_r·(a−b)/(2x), giving the codeword of
  f_e + β f_o on the squared domain (shift s², half size).  Lower heights
  roll in additively in index space when the fold reaches their height.
* Transcript order (PCS part — mirrored exactly by verify and by the
  recursive verifier circuit, cf. `recursion/src/pcs/fri/targets.rs:748`):
    1. observe all claimed opened values (round→matrix→point→column,
       extension coefficient order)
    2. sample α
    3. per phase: observe commit digest; grind commit_pow_bits; sample β
    4. observe final-poly coefficients
    5. grind query_pow_bits
    6. per query: sample_bits(log_max_lde_height)
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

from ..fields.extension import BinomialExtension
from ..fields.monty31 import Monty31, U32
from ..ops.ntt import _bitrev_perm, bit_reverse_rows, coset_lde, intt, ntt
from ..utils import ext_powers, modsum, reduce_matrix_ext
from .challenger import DuplexChallenger
from .domains import domain_points
from .merkle import DIGEST_ELEMS, MerkleMmcs, MerkleTree


@dataclasses.dataclass(frozen=True)
class FriParams:
    log_blowup: int = 2
    log_final_poly_len: int = 0
    num_queries: int = 54
    commit_pow_bits: int = 0
    query_pow_bits: int = 0
    max_log_arity: int = 1  # fold 2^a per phase (reference default 2)

    @staticmethod
    def testing() -> "FriParams":
        """Reference `FriParameters::new_testing` analog (fast params)."""
        return FriParams(
            log_blowup=1,
            log_final_poly_len=0,
            num_queries=8,
            commit_pow_bits=0,
            query_pow_bits=2,
        )

    @staticmethod
    def standard(security_level: int = 124) -> "FriParams":
        """Reference example defaults (recursive_fibonacci.rs:72-107)."""
        qpw = 15
        return FriParams(
            log_blowup=2,
            log_final_poly_len=5,
            num_queries=(security_level - qpw) // 2,
            commit_pow_bits=0,
            query_pow_bits=qpw,
            max_log_arity=2,
        )


def fri_phase_schedule(
    params: FriParams, log_max: int, acc_heights: tuple
) -> list[int]:
    """Per-phase log-arities: fold 2^a per phase, capped so the fold never
    skips past a pending roll-in height or the final codeword size."""
    log_final = params.log_final_poly_len + params.log_blowup
    schedule = []
    log_size = log_max
    while log_size > log_final:
        stops = [h for h in acc_heights if log_final <= h < log_size]
        next_stop = max(stops + [log_final])
        a = min(params.max_log_arity, log_size - next_stop)
        schedule.append(a)
        log_size -= a
    return schedule


@dataclasses.dataclass
class CommittedMatrix:
    shift: int
    log_n: int  # original domain size
    width: int
    coeffs: np.ndarray  # (2^log_n, w) canonical, coefficient basis


@dataclasses.dataclass
class PcsProverData:
    matrices: list  # list[CommittedMatrix]
    tree: MerkleTree  # commits the bit-reversed LDE matrices
    commitment: np.ndarray


@dataclasses.dataclass
class QueryProof:
    # per round: (opened rows per matrix (bitrev LDE rows), sibling path)
    input_openings: list
    # per phase: (pair row (2*D,) base view, sibling path)
    commit_steps: list


@dataclasses.dataclass
class FriProof:
    commit_digests: list
    commit_pow_witnesses: list
    final_coeffs: np.ndarray  # (final_len, D)
    pow_witness: int
    query_proofs: list
    # prover-side cache of the sampled query indices (NOT part of the
    # proof: derivable from the transcript, never serialized, dropped on
    # deserialization).  Lets the recursion layer skip a full host-side
    # transcript replay when packing Merkle direction bits.
    query_indices: list | None = dataclasses.field(
        default=None, compare=False
    )


@functools.lru_cache(maxsize=None)
def _fold_consts(field: Monty31, log_size: int, shift: int):
    """Per-phase fold tables for domain shift·K of size 2^log_size.

    x_pair[j] = shift · w^{rev_{k-1}(j)}  (w = 2^log_size-th root);
    returns (x_pair, inv_2x) canonical, plus Monty inv_2 scalar.
    """
    p = field.P
    half = 1 << (log_size - 1)
    nat = domain_points(field, log_size, shift)[:half]
    x_pair = nat[_bitrev_perm(half)] if half > 1 else nat
    inv_2x = field.inv(field.double(x_pair, np), np)
    return x_pair, inv_2x


class TwoAdicFriPcs:
    def __init__(
        self,
        field: Monty31,
        ext: BinomialExtension,
        params: FriParams,
        mmcs: MerkleMmcs | None = None,
        use_jit: bool = False,
        hiding_salt_cols: int = 0,
        salt_rng: np.random.Generator | None = None,
        mesh=None,
        mesh_axis: str = "rows",
        cap_height: int = 0,
        fuse_full: bool = True,
    ):
        """hiding_salt_cols > 0 enables salted (hiding) commitments: every
        distinct LDE height in a commit gets a random salt matrix hashed
        into the same Merkle leaves (reference `MerkleTreeHidingMmcs` /
        `HidingFriPcs` salts; SURVEY.md §2.6).  Salt rows travel in query
        openings but never enter the α-reduction (they are not polynomial
        data).

        mesh: a `jax.sharding.Mesh` — commit rounds (interpolation + LDE +
        Merkle) and FRI folds run as jitted GSPMD programs with rows
        sharded over the mesh axis (XLA inserts the NTT all_to_alls and
        Merkle all_gathers; `parallel/mesh.py`).  The sequential
        Fiat–Shamir transcript stays on host 0 between device calls."""
        self.F = field
        self.E = ext
        self.params = params
        self.use_jit = use_jit
        self.cap_height = cap_height
        self.mmcs = mmcs or MerkleMmcs(
            field, use_jit=use_jit, cap_height=cap_height
        )
        self.hiding_salt_cols = hiding_salt_cols
        self.salt_rng = salt_rng or np.random.default_rng()
        self.mesh = mesh
        self.mesh_axis = mesh_axis
        # whole-prove fusion (stark/fused.py): when eligible, prove_batch
        # runs commits + transcript + quotient + FRI + queries as ONE
        # device program.  fuse_full=False forces the staged path.
        self.fuse_full = fuse_full

    # ----- commit -----

    def commit(self, mats: list[tuple[int, np.ndarray]], xp=np) -> PcsProverData:
        """mats: list of (shift, evals (2^k, w)) canonical u32."""
        F = self.F
        committed = []
        ldes = []
        if (
            self.mesh is not None
            and self.use_jit
            and self.fuse_full
            and not self.hiding_salt_cols
        ):
            # fused-mesh path: the device-resident commit (round_commit_fn)
            # with GSPMD row-sharding constraints — tree layers stay on
            # device so the whole-prove fusion can gather siblings there
            from ..ops.jitk import merkle_layer_heights, round_commit_fn

            sig = tuple(
                (int(shift), evals.shape[0].bit_length() - 1, evals.shape[1])
                for shift, evals in mats
            )
            fn = round_commit_fn(
                F, sig, self.params.log_blowup, self.mesh, self.mesh_axis
            )
            coeffs_t, ldes_t, flat = fn(*[e for _s, e in mats])
            for (shift, log_n, w), coeffs in zip(sig, coeffs_t):
                committed.append(CommittedMatrix(shift, log_n, w, coeffs))
            lb = self.params.log_blowup
            tree = MerkleTree(
                matrices=list(ldes_t),
                dev_flat=flat,
                layer_heights=merkle_layer_heights(
                    tuple((1 << (ln + lb), w) for _s, ln, w in sig)
                ),
            )
            return PcsProverData(
                committed, tree, self.mmcs.cap_commitment(tree)
            )
        if self.mesh is not None:
            from ..parallel.mesh import mesh_round_commit_fn

            sig = tuple(
                (int(shift), evals.shape[0].bit_length() - 1, evals.shape[1])
                for shift, evals in mats
            )
            # hiding: salt matrices (one per distinct LDE height, like the
            # host path) join the Merkle leaves, rows sharded with the rest
            lde_heights = [
                (1 << ln) << self.params.log_blowup for _s, ln, _w in sig
            ]
            salts = self._salt_matrices(lde_heights, np)
            salt_dims = tuple((s.shape[0], s.shape[1]) for s in salts)
            fn = mesh_round_commit_fn(
                F,
                sig,
                self.params.log_blowup,
                self.mesh,
                self.mesh_axis,
                salt_dims=salt_dims,
            )
            with self.mesh:
                coeffs_t, ldes_t, layers_t = fn(
                    *[e for _s, e in mats], *salts
                )
            for (shift, log_n, w), coeffs in zip(sig, coeffs_t):
                committed.append(
                    CommittedMatrix(shift, log_n, w, np.asarray(coeffs))
                )
            layers = [np.asarray(l) for l in layers_t]
            tree = MerkleTree(
                matrices=[np.asarray(l) for l in ldes_t] + list(salts),
                layers=layers,
            )
            return PcsProverData(
                committed, tree, self.mmcs.cap_commitment(tree)
            )
        if self.use_jit and not self.hiding_salt_cols:
            from ..ops.jitk import merkle_layer_heights, round_commit_fn

            sig = tuple(
                (int(shift), evals.shape[0].bit_length() - 1, evals.shape[1])
                for shift, evals in mats
            )
            fn = round_commit_fn(F, sig, self.params.log_blowup)
            coeffs_t, ldes_t, flat = fn(*[e for _s, e in mats])
            for (shift, log_n, w), coeffs in zip(sig, coeffs_t):
                # coeffs stay device-resident; eval_at_point consumes them
                committed.append(CommittedMatrix(shift, log_n, w, coeffs))
            lb = self.params.log_blowup
            tree = MerkleTree(
                matrices=list(ldes_t),
                dev_flat=flat,
                layer_heights=merkle_layer_heights(
                    tuple((1 << (ln + lb), w) for _s, ln, w in sig)
                ),
            )
            return PcsProverData(
                committed, tree, self.mmcs.cap_commitment(tree)
            )
        for shift, evals in mats:
            n, w = evals.shape
            log_n = n.bit_length() - 1
            assert 1 << log_n == n
            # interpolate on the matrix's own coset: p(shift·y) has coeffs
            # q_i; p's coeffs are q_i·shift^{-i}
            coeffs = intt(F, xp.asarray(evals), xp)
            if shift != 1:
                inv_s = pow(int(shift), F.P - 2, F.P)
                from ..ops.ntt import _power_table

                unscale = xp.asarray(_power_table(F, inv_s, n))
                shaped = unscale.reshape((n,) + (1,) * (evals.ndim - 1))
                coeffs = F.monty_mul(coeffs, shaped, xp)
            # LDE onto the standard commit domain g·K, bit-reversed rows
            m = n << self.params.log_blowup
            pad = [(0, m - n)] + [(0, 0)] * (evals.ndim - 1)
            from ..ops.ntt import _power_table

            gpow = xp.asarray(_power_table(F, F.generator, n))
            scaled = F.monty_mul(
                coeffs, gpow.reshape((n,) + (1,) * (evals.ndim - 1)), xp
            )
            lde = ntt(F, xp.pad(scaled, pad), xp)
            lde = bit_reverse_rows(lde, xp)
            committed.append(
                CommittedMatrix(int(shift), log_n, w, np.asarray(coeffs))
            )
            ldes.append(lde)
        ldes = ldes + self._salt_matrices([m.shape[0] for m in ldes], xp)
        root, tree = self.mmcs.commit(ldes, xp)
        return PcsProverData(committed, tree, np.asarray(root))

    def _salt_matrices(self, heights: list, xp) -> list:
        """One random salt matrix per distinct height (hiding mode)."""
        if not self.hiding_salt_cols:
            return []
        out = []
        seen = []
        for h in heights:
            if h not in seen:
                seen.append(h)
                out.append(
                    xp.asarray(
                        self.F.rand(
                            self.salt_rng, (h, self.hiding_salt_cols)
                        )
                    )
                )
        return out

    def salt_dims(self, lde_heights: list) -> list:
        """Verifier-side dims of the salt matrices of a commitment."""
        if not self.hiding_salt_cols:
            return []
        seen = []
        for h in lde_heights:
            if h not in seen:
                seen.append(h)
        return [(h, self.hiding_salt_cols) for h in seen]

    # ----- evaluation at points (prover side) -----

    def eval_at_point(self, mat: CommittedMatrix, zeta: np.ndarray, xp=np):
        """p(ζ) for all columns: (w, D) ext values, from coefficients."""
        F, E = self.F, self.E
        if self.use_jit:
            from ..ops.jitk import eval_at_point_fn

            fn = eval_at_point_fn(F, E.D, mat.log_n, mat.width)
            return np.asarray(fn(mat.coeffs, np.asarray(zeta, dtype=U32)))
        n = 1 << mat.log_n
        pows = ext_powers(E, xp.asarray(zeta), n, xp)  # (n, D)
        coeffs = xp.asarray(mat.coeffs)
        outs = []
        for d in range(E.D):
            pm = F.to_monty(pows[:, d], xp)
            prod = F.monty_mul(coeffs, pm[:, None], xp)
            outs.append(modsum(F, prod, 0, xp))
        return xp.stack(outs, axis=-1)  # (w, D)

    # ----- open (prove) -----

    def open(
        self,
        rounds: list[tuple[PcsProverData, list[list[np.ndarray]]]],
        challenger: DuplexChallenger,
        xp=np,
    ):
        """rounds: [(prover_data, points[mat_idx] = list of ζ (D,))].

        Returns (opened_values, FriProof) where
        opened_values[round][mat][point] = (w, D) canonical.
        """
        if self.use_jit and not self.hiding_salt_cols:
            return self._open_jit(rounds, challenger)
        F, E, P = self.F, self.E, self.params
        # 1. claimed evaluations, observed in canonical order
        opened: list[list[list[np.ndarray]]] = []
        for data, points in rounds:
            round_vals = []
            for mat, pts in zip(data.matrices, points):
                round_vals.append(
                    [np.asarray(self.eval_at_point(mat, z, xp)) for z in pts]
                )
            opened.append(round_vals)
        for rv in opened:
            for mv in rv:
                for pv in mv:
                    challenger.observe_slice(pv)
        # 2. alpha
        alpha = challenger.sample_ext(E)
        # 3. per-height reduced openings, global alpha counter
        total_cols = sum(
            mat.width * len(pts)
            for data, points in rounds
            for mat, pts in zip(data.matrices, points)
        )
        alpha_pows = np.asarray(ext_powers(E, np.asarray(alpha), total_cols, np))
        acc: dict[int, np.ndarray] = {}
        k = 0
        for (data, points), round_vals in zip(rounds, opened):
            for mi, (mat, pts, mat_vals) in enumerate(
                zip(data.matrices, points, round_vals)
            ):
                log_h = mat.log_n + P.log_blowup
                h = 1 << log_h
                lde = xp.asarray(data.tree.matrices[mi])
                x_nat = domain_points(F, log_h, F.generator)
                x_br = xp.asarray(x_nat[_bitrev_perm(h)])
                for z, y in zip(pts, mat_vals):
                    apow = alpha_pows[k : k + mat.width]
                    y_red = _reduce_vec_ext(F, E, np.asarray(y), apow)
                    if self.use_jit:
                        from ..ops.jitk import fri_reduce_fn

                        fn = fri_reduce_fn(F, E.D, log_h, mat.width)
                        term = np.asarray(
                            fn(
                                lde,
                                np.asarray(z, dtype=U32),
                                np.asarray(y_red, dtype=U32),
                                np.asarray(apow, dtype=U32),
                            )
                        )
                    else:
                        # num_red(x) = Σ_c α^{k+c}·p_c(x)
                        num_red = reduce_matrix_ext(
                            F, E, lde, xp.asarray(apow), xp
                        )
                        zx = E.sub(
                            E.from_base(x_br, xp),
                            xp.broadcast_to(xp.asarray(z), (h, E.D)),
                            xp,
                        )
                        inv_zx = E.inv(zx, xp)
                        diff = E.sub(
                            num_red,
                            xp.broadcast_to(xp.asarray(y_red), (h, E.D)),
                            xp,
                        )
                        term = E.mul(diff, inv_zx, xp)
                    acc[log_h] = (
                        term if log_h not in acc else E.add(acc[log_h], term, xp)
                    )
                    k += mat.width
        # 4. commit phase (variable arity: one commitment + β per phase,
        # `a` iterated 2-folds with β, β², β⁴, …)
        log_max = max(acc)
        log_final = P.log_final_poly_len + P.log_blowup
        assert min(acc) >= log_final, (
            "committed matrix below FRI final fold height — its openings "
            "would be unconstrained (raise min_trace_height)"
        )
        schedule = fri_phase_schedule(P, log_max, tuple(acc))
        folded = acc[log_max]
        shift = F.generator
        commit_digests = []
        commit_trees = []
        commit_pows = []
        log_size = log_max
        for a in schedule:
            group = 1 << a
            rows = folded.reshape((1 << log_size) >> a, group * E.D)
            root, tree = self.mmcs.commit([rows], xp)
            commit_digests.append(np.asarray(root))
            commit_trees.append(tree)
            challenger.observe_slice(np.asarray(root))
            if P.commit_pow_bits:
                commit_pows.append(challenger.grind(P.commit_pow_bits))
            beta = challenger.sample_ext(E)
            beta_t = np.asarray(beta, dtype=U32)
            sub_shift = shift
            for t in range(a):
                folded = self._fold_once(
                    folded, beta_t, log_size - t, sub_shift, xp
                )
                beta_t = E.mul(beta_t, beta_t, np)
                sub_shift = sub_shift * sub_shift % F.P
            shift = sub_shift
            log_size -= a
            if log_size in acc:
                folded = E.add(folded, acc[log_size], xp)
        # final polynomial: interpolate remaining codeword (bitrev, shift)
        final_evals = bit_reverse_rows(folded, xp)
        fc = intt(F, final_evals, xp)
        if shift != 1:
            from ..ops.ntt import _power_table

            inv_s = pow(shift, F.P - 2, F.P)
            unscale = xp.asarray(_power_table(F, inv_s, fc.shape[0]))
            fc = F.monty_mul(fc, unscale[:, None], xp)
        final_coeffs = np.asarray(fc)[: 1 << P.log_final_poly_len]
        # degree bound: coefficients above final_poly_len must vanish
        assert np.all(np.asarray(fc)[1 << P.log_final_poly_len :] == 0), (
            "FRI final poly exceeds degree bound"
        )
        challenger.observe_slice(final_coeffs)
        # 5. query PoW
        pow_witness = challenger.grind(P.query_pow_bits) if P.query_pow_bits else 0
        # 6. queries (each round's tree opened at its height-scaled index)
        query_proofs = []
        round_log_max = [
            max(m.log_n + P.log_blowup for m in data.matrices)
            for data, _p in rounds
        ]
        indices = []
        for _ in range(P.num_queries):
            index = challenger.sample_bits(log_max)
            indices.append(index)
            input_openings = []
            for (data, _pts), rlm in zip(rounds, round_log_max):
                opened_rows, sibs = self.mmcs.open_batch(
                    index >> (log_max - rlm), data.tree
                )
                input_openings.append((opened_rows, sibs))
            commit_steps = []
            off = 0
            for ph, (tree, a) in enumerate(zip(commit_trees, schedule)):
                row_idx = index >> (off + a)
                rows, sibs = self.mmcs.open_batch(row_idx, tree)
                commit_steps.append((rows[0], sibs))
                off += a
            query_proofs.append(QueryProof(input_openings, commit_steps))
        proof = FriProof(
            commit_digests,
            commit_pows,
            final_coeffs,
            pow_witness,
            query_proofs,
            query_indices=indices,
        )
        return opened, proof

    def _fold_once(self, folded, beta, log_size: int, shift: int, xp):
        """One radix-2 β-fold of an ext codeword in bitrev order."""
        F, E = self.F, self.E
        if self.mesh is not None:
            import jax.numpy as jnp

            from ..parallel.mesh import mesh_fold_fn

            fn = mesh_fold_fn(
                F, E.D, log_size, int(shift), self.mesh, self.mesh_axis
            )
            with self.mesh:
                return fn(jnp.asarray(folded), np.asarray(beta, dtype=U32))
        if self.use_jit:
            from ..ops.jitk import fri_fold_fn

            import jax.numpy as jnp

            return fri_fold_fn(F, E.D, log_size, int(shift))(
                folded, np.asarray(beta, dtype=U32)
            )
        _x, inv_2x = _fold_consts(F, log_size, shift)
        a = folded[0::2]
        b = folded[1::2]
        s = E.add(a, b, xp)
        d = E.sub(a, b, xp)
        inv2 = F.monty_constant(pow(2, F.P - 2, F.P))
        even = F.monty_mul(s, xp.asarray(inv2), xp)
        odd = E.mul_base(d, xp.asarray(inv_2x), xp)
        return E.add(
            even,
            E.mul(odd, xp.broadcast_to(xp.asarray(beta), odd.shape), xp),
            xp,
        )

    def _open_jit(self, rounds, challenger: DuplexChallenger):
        """Device-resident open with whole-stage fusion: ONE device call
        (and one download) for all claimed evaluations, ONE for all
        reduced-opening accumulators, one commit + one fused multi-fold
        call per FRI phase, one gather per round's query rows, and one
        sibling gather per tree — the Fiat-Shamir transcript is the only
        host-side sequencing left (critical through the TPU tunnel)."""
        import jax.numpy as jnp

        from ..ops.jitk import (
            eval_points_all_fn,
            fri_phase_fold_fn,
            fri_reduce_all_fn,
            gather_rows_concat_fn,
            sibling_gather_all_fn,
        )
        from ..utils.tracing import span

        F, E, P = self.F, self.E, self.params

        # 1. claimed evaluations: one fused call, one download
        zs_list: list = []
        z_index: dict = {}

        def z_of(z):
            key = tuple(int(x) for x in np.asarray(z))
            if key not in z_index:
                z_index[key] = len(zs_list)
                zs_list.append(np.asarray(z, dtype=U32))
            return z_index[key]

        esig = []
        eargs = []
        for data, points in rounds:
            for mat, pts in zip(data.matrices, points):
                esig.append(
                    (mat.log_n, mat.width, tuple(z_of(z) for z in pts))
                )
                eargs.append(mat.coeffs)
        zs = (
            np.stack(zs_list)
            if zs_list
            else np.zeros((1, E.D), dtype=U32)
        )
        with span("open.eval_at_points"):
            flat_evals = np.asarray(
                eval_points_all_fn(F, E.D, tuple(esig))(zs, *eargs)
            )
        opened = []
        pos = 0
        for data, points in rounds:
            round_vals = []
            for mat, pts in zip(data.matrices, points):
                vals = []
                for _z in pts:
                    vals.append(flat_evals[pos : pos + mat.width])
                    pos += mat.width
                round_vals.append(vals)
            opened.append(round_vals)
        for rv in opened:
            for mv in rv:
                for pv in mv:
                    challenger.observe_slice(pv)
        alpha = challenger.sample_ext(E)
        total_cols = sum(
            mat.width * len(pts)
            for data, points in rounds
            for mat, pts in zip(data.matrices, points)
        )
        alpha_pows = np.asarray(
            ext_powers(E, np.asarray(alpha), total_cols, np)
        )

        # 3. per-height reduced openings: one fused call, stays on device
        rsig = []
        rargs = []
        y_reds = []
        k = 0
        for (data, points), round_vals in zip(rounds, opened):
            for mi, (mat, pts, mat_vals) in enumerate(
                zip(data.matrices, points, round_vals)
            ):
                log_h = mat.log_n + P.log_blowup
                lde = data.tree.matrices[mi]
                for z, y in zip(pts, mat_vals):
                    apow = alpha_pows[k : k + mat.width]
                    y_reds.append(_reduce_vec_ext(F, E, np.asarray(y), apow))
                    rsig.append((log_h, mat.width, z_of(z), k))
                    rargs.append(lde)
                    k += mat.width
        with span("open.reduce"):
            accs = fri_reduce_all_fn(F, E.D, tuple(rsig))(
                zs,
                np.stack(y_reds).astype(U32),
                alpha_pows,
                *rargs,
            )
        heights_desc = sorted({lh for lh, _w, _z, _o in rsig}, reverse=True)
        acc = dict(zip(heights_desc, accs))

        # 4. commit phase: one commit + one fused multi-fold per phase
        log_max = max(acc)
        log_final = P.log_final_poly_len + P.log_blowup
        assert min(acc) >= log_final, (
            "committed matrix below FRI final fold height — its openings "
            "would be unconstrained (raise min_trace_height)"
        )
        schedule = fri_phase_schedule(P, log_max, tuple(acc))
        folded = acc[log_max]
        shift = F.generator
        commit_digests = []
        commit_trees = []
        commit_pows = []
        log_size = log_max
        with span("open.commit_phases"):
            chain_ok = (
                P.commit_pow_bits == 0
                and not challenger.input_buffer
                and bool(schedule)
                and getattr(challenger, "is_default_poseidon2", False)
                # the fused chain observes single-root commitments; Merkle
                # caps fall back to host-sequenced phase commits
                and self.cap_height == 0
            )
            if chain_ok:
                # whole phase chain (commits + duplex transcript + folds)
                # as ONE device program; sync the host challenger after
                from ..ops.jitk import fri_phase_chain_fn, merkle_layer_heights

                rollin_flags = []
                rollin_args = []
                ls = log_max
                for a in schedule:
                    ls -= a
                    rollin_flags.append(ls in acc)
                    if ls in acc:
                        rollin_args.append(acc[ls])
                fn = fri_phase_chain_fn(
                    F,
                    E.D,
                    log_max,
                    tuple(schedule),
                    tuple(rollin_flags),
                    int(F.generator),
                )
                (state, folded, roots, ph_rows, ph_flats) = fn(
                    np.asarray(challenger.state, dtype=U32),
                    folded,
                    *rollin_args,
                )
                roots_np = np.asarray(roots)  # one download
                challenger.state = np.asarray(state)
                challenger.input_buffer = []
                challenger.output_buffer = [
                    int(x) for x in challenger.state[: challenger.RATE]
                ][E.D :]
                for ph, a in enumerate(schedule):
                    commit_digests.append(roots_np[ph])
                    commit_trees.append(
                        MerkleTree(
                            matrices=[ph_rows[ph]],
                            dev_flat=ph_flats[ph],
                            layer_heights=merkle_layer_heights(
                                ((ph_rows[ph].shape[0], 0),)
                            ),
                        )
                    )
                    for _t in range(a):
                        shift = shift * shift % F.P
                    log_size -= a
            else:
                for a in schedule:
                    group = 1 << a
                    rows = folded.reshape(
                        (1 << log_size) >> a, group * E.D
                    )
                    root, tree = self.mmcs.commit([rows], jnp)
                    commit_digests.append(np.asarray(root))
                    commit_trees.append(tree)
                    challenger.observe_slice(np.asarray(root))
                    if P.commit_pow_bits:
                        commit_pows.append(
                            challenger.grind(P.commit_pow_bits)
                        )
                    beta = challenger.sample_ext(E)
                    has_rollin = (log_size - a) in acc
                    fold = fri_phase_fold_fn(
                        F, E.D, log_size, a, int(shift), has_rollin
                    )
                    args = (folded, np.asarray(beta, dtype=U32))
                    if has_rollin:
                        args = args + (acc[log_size - a],)
                    folded = fold(*args)
                    for _t in range(a):
                        shift = shift * shift % F.P
                    log_size -= a
        # final polynomial (tiny: download + host interpolation)
        folded_np = np.asarray(folded)
        final_evals = bit_reverse_rows(folded_np, np)
        fc = intt(F, final_evals, np)
        if shift != 1:
            from ..ops.ntt import _power_table

            inv_s = pow(shift, F.P - 2, F.P)
            unscale = np.asarray(_power_table(F, inv_s, fc.shape[0]))
            fc = F.monty_mul(fc, unscale[:, None], np)
        final_coeffs = np.asarray(fc)[: 1 << P.log_final_poly_len]
        assert np.all(np.asarray(fc)[1 << P.log_final_poly_len :] == 0), (
            "FRI final poly exceeds degree bound"
        )
        challenger.observe_slice(final_coeffs)
        with span("open.grind"):
            pow_witness = (
                challenger.grind(P.query_pow_bits)
                if P.query_pow_bits
                else 0
            )
        # 6. queries: one fused row gather per round (+ one for all
        # phases), one sibling gather per tree
        nq = P.num_queries
        indices = [challenger.sample_bits(log_max) for _ in range(nq)]
        round_log_max = [
            max(m.log_n + P.log_blowup for m in data.matrices)
            for data, _p in rounds
        ]
        input_rows = []  # [ri][mi] -> (nq, w) np
        with span("open.query_gathers"):
            for (data, _pts), rlm in zip(rounds, round_log_max):
                mats = data.tree.matrices
                gsig = tuple((m.shape[0], m.shape[1]) for m in mats)
                idx = np.stack(
                    [
                        np.asarray(
                            [
                                i >> (log_max - (m.shape[0].bit_length() - 1))
                                for i in indices
                            ],
                            dtype=np.int32,
                        )
                        for m in mats
                    ]
                )
                cat = np.asarray(
                    gather_rows_concat_fn(gsig, nq)(idx, *mats)
                )
                per_mat = []
                off = 0
                for _h, w in gsig:
                    per_mat.append(cat[:, off : off + w])
                    off += w
                input_rows.append(per_mat)
        offsets = []
        off = 0
        for a in schedule:
            offsets.append(off)
            off += a
        with span("open.phase_gathers"):
            ph_mats = [t.matrices[0] for t in commit_trees]
            gsig = tuple((m.shape[0], m.shape[1]) for m in ph_mats)
            idx = np.stack(
                [
                    np.asarray(
                        [i >> (offsets[ph] + a) for i in indices],
                        dtype=np.int32,
                    )
                    for ph, a in enumerate(schedule)
                ]
            )
            cat = np.asarray(
                gather_rows_concat_fn(gsig, nq)(idx, *ph_mats)
            )
            phase_rows = []
            off = 0
            for _h, w in gsig:
                phase_rows.append(cat[:, off : off + w])
                off += w

        def tree_sib_indices(tree, node_indices, levels):
            offs = tree.layer_offsets()
            flat_idx = []
            for idx0 in node_indices:
                i = idx0
                for l in range(levels):
                    flat_idx.append(offs[l] + (i ^ 1))
                    i >>= 1
            return np.asarray(flat_idx, dtype=np.int32)

        with span("open.sibling_gathers"):
            # EVERY tree's sibling digests in one device call + download
            jobs = []  # (tree, levels)
            for (data, _pts), rlm in zip(rounds, round_log_max):
                node_idx = [i >> (log_max - rlm) for i in indices]
                levels = rlm - self.mmcs.tree_cap_height(1 << rlm)
                jobs.append((data.tree, levels, node_idx))
            for ph, a in enumerate(schedule):
                log_h = log_max - offsets[ph] - a
                levels = log_h - self.mmcs.tree_cap_height(1 << log_h)
                node_idx = [i >> (offsets[ph] + a) for i in indices]
                jobs.append((commit_trees[ph], levels, node_idx))
            args = []
            counts = []
            for tree, levels, node_idx in jobs:
                if levels == 0:
                    continue
                idx = tree_sib_indices(tree, node_idx, levels)
                args.extend([idx, tree.dev_flat])
                counts.append(idx.shape[0])
            cat = (
                np.asarray(
                    sibling_gather_all_fn(tuple(counts))(*args)
                )
                if counts
                else np.zeros((0, 8), dtype=U32)
            )
            per_tree = []
            off = 0
            ci = 0
            for tree, levels, node_idx in jobs:
                if levels == 0:
                    per_tree.append(
                        np.zeros((nq, 0, 8), dtype=U32)
                    )
                    continue
                cnt = counts[ci]
                ci += 1
                per_tree.append(
                    cat[off : off + cnt].reshape(nq, levels, 8)
                )
                off += cnt
            round_sibs = per_tree[: len(rounds)]
            phase_sibs = per_tree[len(rounds) :]
        query_proofs = []
        for q, index in enumerate(indices):
            input_openings = []
            for ri, ((data, _pts), rlm) in enumerate(
                zip(rounds, round_log_max)
            ):
                opened_rows = [
                    input_rows[ri][mi][q]
                    for mi in range(len(data.tree.matrices))
                ]
                sibs = list(round_sibs[ri][q])
                input_openings.append((opened_rows, sibs))
            commit_steps = []
            for ph, a in enumerate(schedule):
                commit_steps.append(
                    (phase_rows[ph][q], list(phase_sibs[ph][q]))
                )
            query_proofs.append(QueryProof(input_openings, commit_steps))
        proof = FriProof(
            commit_digests,
            commit_pows,
            final_coeffs,
            pow_witness,
            query_proofs,
            query_indices=list(indices),
        )
        return opened, proof


    # ----- verify -----

    def verify(
        self,
        rounds: list[
            tuple[np.ndarray, list[tuple[int, list[tuple[np.ndarray, np.ndarray]]]]]
        ],
        proof: FriProof,
        challenger: DuplexChallenger,
    ):
        """rounds: [(commitment, mats)] with mats[i] = (log_n,
        [(ζ (D,), claimed (w, D)), ...]).  Raises on failure.
        """
        F, E, P = self.F, self.E, self.params
        log_final = P.log_final_poly_len + P.log_blowup
        # Soundness shape checks BEFORE any transcript interaction:
        # (a) the final polynomial must have exactly 2^log_final_poly_len
        #     coefficients (reference recursion/src/pcs/fri/verifier.rs:
        #     1511-1517) — a longer poly can interpolate ANY function on
        #     the final fold domain, voiding the low-degree test;
        # (b) every committed matrix must live at height >= log_final —
        #     reduced openings below the final fold height are never
        #     consumed by the fold chain, so their claimed values would be
        #     completely unconstrained (reference zero-constrains them,
        #     verifier.rs:1641-1645; we reject outright, which is strictly
        #     stronger and matches the prover-side min-height guard).
        fc = np.asarray(proof.final_coeffs)
        if fc.shape[0] != 1 << P.log_final_poly_len:
            raise ValueError(
                f"final poly has {fc.shape[0]} coeffs, expected "
                f"{1 << P.log_final_poly_len}"
            )
        if np.any(fc >= F.P):
            raise ValueError("final poly coefficients out of field range")
        for _com, mats in rounds:
            for log_n, _pts in mats:
                if log_n + P.log_blowup < log_final:
                    raise ValueError(
                        f"matrix height 2^{log_n} below FRI minimum "
                        f"2^{P.log_final_poly_len} (unconstrained openings)"
                    )
        # 1-2. replay opened values, sample alpha
        for _com, mats in rounds:
            for _log_n, pts in mats:
                for _z, y in pts:
                    challenger.observe_slice(np.asarray(y))
        alpha = challenger.sample_ext(E)
        # 3. commit phase challenges
        betas = []
        for ph, digest in enumerate(proof.commit_digests):
            challenger.observe_slice(np.asarray(digest))
            if P.commit_pow_bits:
                w = proof.commit_pow_witnesses[ph]
                if not challenger.check_witness(P.commit_pow_bits, w):
                    raise ValueError("commit PoW check failed")
            betas.append(challenger.sample_ext(E))
        challenger.observe_slice(np.asarray(proof.final_coeffs))
        if P.query_pow_bits:
            if not challenger.check_witness(P.query_pow_bits, proof.pow_witness):
                raise ValueError("query PoW check failed")
        heights = [
            log_n + P.log_blowup for _c, mats in rounds for log_n, _p in mats
        ]
        log_max = max(heights)
        schedule = fri_phase_schedule(P, log_max, tuple(set(heights)))
        if len(proof.commit_digests) != len(schedule):
            raise ValueError("wrong number of FRI phases")
        if len(proof.query_proofs) != P.num_queries:
            raise ValueError("wrong number of query proofs")
        total_cols = sum(
            np.asarray(pts[0][1]).shape[0] * len(pts)
            for _c, mats in rounds
            for _log_n, pts in mats
        )
        alpha_pows = np.asarray(ext_powers(E, np.asarray(alpha), total_cols, np))
        round_log_max = [
            max(log_n + P.log_blowup for log_n, _p in mats)
            for _c, mats in rounds
        ]
        # per-query checks
        for q in range(P.num_queries):
            index = challenger.sample_bits(log_max)
            qp = proof.query_proofs[q]
            # recompute reduced openings per height at this index
            acc: dict[int, np.ndarray] = {}
            k = 0
            for (com, mats), (opened_rows, sibs), rlm in zip(
                rounds, qp.input_openings, round_log_max
            ):
                dims = [
                    (1 << (log_n + P.log_blowup), np.asarray(pts[0][1]).shape[0])
                    for log_n, pts in mats
                ]
                dims = dims + self.salt_dims([h for h, _w in dims])
                if not self.mmcs.verify_batch(
                    np.asarray(com),
                    dims,
                    index >> (log_max - rlm),
                    opened_rows,
                    sibs,
                ):
                    raise ValueError("input MMCS verification failed")
                for (log_n, pts), row in zip(mats, opened_rows):
                    log_h = log_n + P.log_blowup
                    idx_h = index >> (log_max - log_h)
                    w = np.asarray(row).shape[0]
                    x = int(
                        domain_points(F, log_h, F.generator)[
                            _nat_index(idx_h, log_h)
                        ]
                    )
                    for z, y in pts:
                        apow = alpha_pows[k : k + w]
                        p_red = _reduce_vec_ext(
                            F, E, E.from_base(np.asarray(row), np), apow
                        )
                        y_red = _reduce_vec_ext(F, E, np.asarray(y), apow)
                        zx = E.sub(
                            E.from_base(np.uint32([x]), np)[0],
                            np.asarray(z),
                            np,
                        )
                        term = E.mul(
                            E.sub(p_red, y_red, np), E.inv(zx, np), np
                        )
                        acc[log_h] = (
                            term
                            if log_h not in acc
                            else E.add(acc[log_h], term, np)
                        )
                        k += w
            # fold chain (variable arity)
            folded_val = acc[log_max]
            idx = index
            shift = F.generator
            log_size = log_max
            inv2 = F.monty_constant(pow(2, F.P - 2, F.P))
            for ph, ((row, sibs), ar) in enumerate(
                zip(qp.commit_steps, schedule)
            ):
                group = 1 << ar
                row_idx = idx >> ar
                if not self.mmcs.verify_batch(
                    np.asarray(proof.commit_digests[ph]),
                    [((1 << log_size) >> ar, group * E.D)],
                    row_idx,
                    [row],
                    sibs,
                ):
                    raise ValueError(f"commit-phase MMCS failed at phase {ph}")
                vals = np.asarray(row, dtype=U32).reshape(group, E.D)
                if not np.array_equal(vals[idx & (group - 1)], folded_val):
                    raise ValueError(f"fold consistency failed at phase {ph}")
                beta_t = np.asarray(betas[ph], dtype=U32)
                sub_shift = shift
                for t in range(ar):
                    _xp, inv_2x = _fold_consts(F, log_size - t, sub_shift)
                    half_local = vals.shape[0] // 2
                    new_vals = np.zeros((half_local, E.D), dtype=U32)
                    base = idx >> ar
                    for j2 in range(half_local):
                        gp = (base << (ar - t - 1)) | j2
                        va, vb = vals[2 * j2], vals[2 * j2 + 1]
                        even = F.monty_mul(E.add(va, vb, np), inv2, np)
                        odd = E.mul_base(
                            E.sub(va, vb, np), np.uint32(int(inv_2x[gp])), np
                        )
                        new_vals[j2] = E.add(
                            even, E.mul(odd, beta_t, np), np
                        )
                    vals = new_vals
                    beta_t = E.mul(beta_t, beta_t, np)
                    sub_shift = sub_shift * sub_shift % F.P
                folded_val = vals[0]
                shift = sub_shift
                log_size -= ar
                idx = row_idx
                if log_size in acc:
                    folded_val = E.add(folded_val, acc[log_size], np)
            # final poly check
            x_fin = int(
                domain_points(F, log_size, shift)[_nat_index(idx, log_size)]
            )
            expect = _eval_poly_ext(E, proof.final_coeffs, x_fin)
            if not np.array_equal(expect, folded_val):
                raise ValueError("final polynomial check failed")
        return True


def _nat_index(bitrev_index: int, log_n: int) -> int:
    """bit-reversed position -> natural domain exponent."""
    r = 0
    for b in range(log_n):
        r |= ((bitrev_index >> b) & 1) << (log_n - 1 - b)
    return r


def _ext_pow_int(E: BinomialExtension, base: np.ndarray, e: int) -> np.ndarray:
    return E.pow_static(np.asarray(base, dtype=U32), e, np) if e else E.from_base(
        np.uint32(1), np
    )


def _reduce_vec_ext(F, E, vec_ext: np.ndarray, weights: np.ndarray) -> np.ndarray:
    """Σ_c vec[c]·weights[c] for (w, D) ext vec and (w, D) ext weights."""
    prod = E.mul(vec_ext, weights, np)
    out = prod[0]
    for c in range(1, prod.shape[0]):
        out = E.add(out, prod[c], np)
    return out


def _eval_poly_ext(E: BinomialExtension, coeffs: np.ndarray, x: int) -> np.ndarray:
    """Horner eval of ext-coeff poly at base point x."""
    F = E.base
    acc = E.zeros((), np)
    xm = F.monty_constant(x)
    for i in range(coeffs.shape[0] - 1, -1, -1):
        acc = F.monty_mul(acc, xm, np)
        acc = E.add(acc, np.asarray(coeffs[i], dtype=U32), np)
    return acc

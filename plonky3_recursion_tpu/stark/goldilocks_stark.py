"""Goldilocks native STARK pipeline: D=2 extension, Poseidon2 W8, FRI.

TPU-native equivalent of the reference's Goldilocks configuration
(`circuit-prover/src/config.rs` `goldilocks()`: Poseidon2Goldilocks<8>
hash+compress, 4-element digests, `BinomialExtensionField<Goldilocks, 2>`;
exercised by `recursion/tests/goldilocks.rs`).  The reference gets all of
this generically from upstream crates (p3-goldilocks, p3-poseidon2,
p3-merkle-tree, p3-fri, p3-uni-stark); here the 64-bit field rides the
u32 limb-pair layout of `fields/goldilocks.py` (TPUs have no useful
64-bit integer path), so every element carries a trailing limb dim of 2
and the pipeline is written against that layout:

  * base values      (..., 2)          [lo, hi] u32 limbs
  * extension values (..., 2, 2)       (coeff, limb) — x² = 7
  * Poseidon2 state  (..., 8, 2)       width 8, rate 4, digest 4

Round constants are self-derived (SHA-256 counter mode + rejection), like
the Monty31 fields — the reference seeds its Goldilocks Poseidon2 from a
SmallRng, whose stream is not reproducible here (see README's constants
scope note).  The permutation structure (initial external layer, RF=8
external + RP=22 partial rounds, x⁷ S-box, M4-circulant external /
diag+sum internal layers) mirrors `ops/poseidon2.py`.

Scope: native L0–L2 (field/hash/Merkle/challenger/NTT/FRI/uni-stark).
Recursive Goldilocks verification (the reference's GoldilocksD2Width8
circuit table) needs the 64-bit circuit stack — a later round.
"""

from __future__ import annotations

import dataclasses
import functools
import hashlib

import numpy as np

from ..fields.goldilocks import GOLDILOCKS, Goldilocks, P_GOLDILOCKS
from ..fields.monty31 import U32

GL = GOLDILOCKS
WIDTH = 8
RATE = 4
DIGEST = 4
RF = 8
RP = 22


# ---------------------------------------------------------------------------
# quadratic extension  GL[x] / (x² − 7)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class GlExt2:
    """Binomial quadratic extension of Goldilocks with x² = W = 7 (the
    reference's `BinomialExtensionField<Goldilocks, 2>` parameter).
    Elements are (..., 2, 2) arrays: axis -2 the coefficient, axis -1 the
    u32 limb pair."""

    D: int = 2
    W: int = 7
    limbs: int = 2  # u32 limbs per base element (circuit-runner cells)

    @property
    def base(self):
        return GL

    def zeros(self, shape, xp=np):
        return xp.zeros(tuple(shape) + (2, 2), dtype=U32)

    def from_ints(self, pair) -> np.ndarray:
        return GL.from_ints(list(pair))

    def to_ints(self, a):
        return GL.to_ints(a)

    def from_base(self, a, xp=np):
        out = xp.zeros(a.shape[:-1] + (2, 2), dtype=U32)
        if xp is np:
            out[..., 0, :] = a
            return out
        return out.at[..., 0, :].set(a)

    def add(self, a, b, xp=np):
        return GL.add(a, b, xp)  # elementwise per coeff

    def sub(self, a, b, xp=np):
        return GL.sub(a, b, xp)

    def neg(self, a, xp=np):
        return GL.neg(a, xp)

    @functools.cached_property
    def _w_const(self):
        return GL.from_ints(self.W)

    def mul(self, a, b, xp=np):
        a0, a1 = a[..., 0, :], a[..., 1, :]
        b0, b1 = b[..., 0, :], b[..., 1, :]
        w = xp.asarray(self._w_const)
        c0 = GL.add(
            GL.mul(a0, b0, xp), GL.mul(GL.mul(a1, b1, xp), w, xp), xp
        )
        c1 = GL.add(GL.mul(a0, b1, xp), GL.mul(a1, b0, xp), xp)
        return xp.stack([c0, c1], axis=-2)

    def mul_base(self, a, b, xp=np):
        """(..., 2, 2) ext × (..., 2) base."""
        return xp.stack(
            [GL.mul(a[..., 0, :], b, xp), GL.mul(a[..., 1, :], b, xp)],
            axis=-2,
        )

    def inv(self, a, xp=np):
        a0, a1 = a[..., 0, :], a[..., 1, :]
        w = xp.asarray(self._w_const)
        norm = GL.sub(
            GL.mul(a0, a0, xp), GL.mul(w, GL.mul(a1, a1, xp), xp), xp
        )
        inv_n = GL.inv(norm, xp)
        return xp.stack(
            [GL.mul(a0, inv_n, xp), GL.neg(GL.mul(a1, inv_n, xp), xp)],
            axis=-2,
        )

    def powers(self, a, n: int, xp=np):
        """[1, a, a², …] — (n, 2, 2)."""
        out = [self.from_ints((1, 0))]
        for _ in range(1, n):
            out.append(self.mul(xp.asarray(out[-1]), a, xp))
        return xp.stack([xp.asarray(o) for o in out])


GLE = GlExt2()

# x² = 7 must be irreducible: 7 is a quadratic non-residue mod p.
assert pow(7, (P_GOLDILOCKS - 1) // 2, P_GOLDILOCKS) == P_GOLDILOCKS - 1


# ---------------------------------------------------------------------------
# Poseidon2 over Goldilocks, width 8
# ---------------------------------------------------------------------------


def _gl_elements_from_seed(tag: str, n: int) -> np.ndarray:
    """n canonical Goldilocks elements, SHA-256 counter mode + rejection
    (same scheme as `ops/poseidon2._field_elements_from_seed`)."""
    out = []
    counter = 0
    while len(out) < n:
        h = hashlib.sha256(f"{tag}/{counter}".encode()).digest()
        counter += 1
        for i in range(0, 32, 8):
            v = int.from_bytes(h[i : i + 8], "little")
            if v < P_GOLDILOCKS:
                out.append(v)
                if len(out) == n:
                    break
    return GL.from_ints(out)


@dataclasses.dataclass(frozen=True)
class GlPoseidon2Params:
    rc_ext: np.ndarray  # (RF, 8, 2)
    rc_int: np.ndarray  # (RP, 2)
    diag: np.ndarray  # (8, 2)


@functools.lru_cache(maxsize=None)
def gl_poseidon2_params() -> GlPoseidon2Params:
    tag = "plonky3_recursion_tpu/poseidon2/goldilocks/w8"
    rc_ext = _gl_elements_from_seed(tag + "/ext", RF * WIDTH).reshape(
        RF, WIDTH, 2
    )
    rc_int = _gl_elements_from_seed(tag + "/int", RP)
    attempt = 0
    p = P_GOLDILOCKS
    while True:
        diag = _gl_elements_from_seed(f"{tag}/diag/{attempt}", WIDTH)
        ds = [int(x) for x in GL.to_ints(diag)]
        if 0 in ds or len(set(ds)) != WIDTH:
            attempt += 1
            continue
        det = 1
        for d in ds:
            det = det * d % p
        s = sum(pow(d, p - 2, p) for d in ds) % p
        if det * (1 + s) % p != 0:
            break
        attempt += 1
    return GlPoseidon2Params(rc_ext, rc_int, diag)


def _gl_sbox(x, xp):
    """x⁷ (Goldilocks S-box degree)."""
    x2 = GL.mul(x, x, xp)
    x4 = GL.mul(x2, x2, xp)
    return GL.mul(GL.mul(x4, x2, xp), x, xp)


def _gl_m4(c, xp):
    """M4 = [[2,3,1,1],[1,2,3,1],[1,1,2,3],[3,1,1,2]] on (..., 4, 2),
    add-only decomposition (mirrors `ops/poseidon2._m4_chunk`)."""
    x0, x1, x2, x3 = (c[..., j, :] for j in range(4))
    t01 = GL.add(x0, x1, xp)
    t23 = GL.add(x2, x3, xp)
    t0123 = GL.add(t01, t23, xp)
    t01123 = GL.add(t0123, x1, xp)
    t01233 = GL.add(t0123, x3, xp)
    y3 = GL.add(t01233, GL.add(x0, x0, xp), xp)
    y1 = GL.add(t01123, GL.add(x2, x2, xp), xp)
    y0 = GL.add(t01123, t01, xp)
    y2 = GL.add(t01233, t23, xp)
    return xp.stack([y0, y1, y2, y3], axis=-2)


def _gl_external_layer(state, xp):
    """M_E = circ(2·M4, M4) on (..., 8, 2)."""
    chunks = state.reshape(state.shape[:-2] + (2, 4, 2))
    m4d = _gl_m4(chunks, xp)
    acc = GL.add(m4d[..., 0, :, :], m4d[..., 1, :, :], xp)
    out = GL.add(m4d, acc[..., None, :, :], xp)
    return out.reshape(state.shape)


def _gl_internal_layer(state, diag, xp):
    acc = state[..., 0, :]
    for i in range(1, WIDTH):
        acc = GL.add(acc, state[..., i, :], xp)
    dx = GL.mul(state, diag, xp)
    return GL.add(dx, acc[..., None, :], xp)


def gl_permute(state, xp=np):
    """Poseidon2 permutation on (..., 8, 2), batched over leading dims."""
    params = gl_poseidon2_params()
    diag = xp.asarray(params.diag)
    rc_ext = xp.asarray(params.rc_ext)
    rc_int = xp.asarray(params.rc_int)
    rf2 = RF // 2
    s = _gl_external_layer(xp.asarray(state), xp)

    def ext_round(s, rc):
        s = GL.add(s, rc, xp)
        s = _gl_sbox(s, xp)
        return _gl_external_layer(s, xp)

    def int_round(s, rc):
        s0 = _gl_sbox(GL.add(s[..., 0, :], rc, xp), xp)
        if xp is np:
            s = s.copy()
            s[..., 0, :] = s0
        else:
            s = s.at[..., 0, :].set(s0)
        return _gl_internal_layer(s, diag, xp)

    for r in range(rf2):
        s = ext_round(s, rc_ext[r])
    for r in range(RP):
        s = int_round(s, rc_int[r])
    for r in range(rf2, RF):
        s = ext_round(s, rc_ext[r])
    return s


# ---------------------------------------------------------------------------
# hashing: rate-4 sponge + 2-to-1 digest-4 compression
# ---------------------------------------------------------------------------


def gl_sponge_hash(rows, xp=np):
    """PaddingFreeSponge over W8/rate 4: rows (n, w, 2) -> (n, 4, 2),
    overwrite mode (matches `ops/hashing.sponge_hash` discipline)."""
    n, w, _ = rows.shape
    state = xp.zeros((n, WIDTH, 2), dtype=U32)
    for start in range(0, w, RATE):
        chunk = rows[:, start : start + RATE]
        k = chunk.shape[1]
        if xp is np:
            state = state.copy()
            state[:, :k] = chunk
        else:
            state = state.at[:, :k].set(chunk)
        state = gl_permute(state, xp)
    return state[:, :DIGEST]


def gl_compress(left, right, xp=np):
    """TruncatedPermutation 2-to-1: (n, 4, 2) × (n, 4, 2) -> (n, 4, 2)."""
    state = xp.concatenate([left, right], axis=1)
    return gl_permute(state, xp)[:, :DIGEST]


# ---------------------------------------------------------------------------
# Merkle MMCS (arity 2, mixed heights by injection)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class GlMerkleTree:
    matrices: list  # (h, w, 2) in commit order
    layers: list  # digest layers (h_k, 4, 2), tallest first


class GlMerkleMmcs:
    """Mixed-height batch Merkle commitments over the Goldilocks W8
    permutation (4-element digests; mirrors `stark/merkle.MerkleMmcs`)."""

    def commit(self, matrices: list, xp=np):
        heights = [m.shape[0] for m in matrices]
        for h in heights:
            assert h & (h - 1) == 0
        by_h: dict[int, list] = {}
        for m in matrices:
            by_h.setdefault(m.shape[0], []).append(xp.asarray(m))

        def digest_rows(mats):
            return gl_sponge_hash(xp.concatenate(mats, axis=1), xp)

        h = max(heights)
        layer = digest_rows(by_h[h])
        layers = [layer]
        while h > 1:
            h //= 2
            layer = gl_compress(layer[0::2], layer[1::2], xp)
            if h in by_h:
                layer = gl_compress(layer, digest_rows(by_h[h]), xp)
            layers.append(layer)
        tree = GlMerkleTree(matrices=list(matrices), layers=layers)
        return np.asarray(layers[-1][0]), tree

    def open_batch(self, index: int, tree: GlMerkleTree):
        heights = [m.shape[0] for m in tree.matrices]
        max_h = max(heights)
        log_max = max_h.bit_length() - 1
        opened = [
            np.asarray(m[index >> (log_max - (m.shape[0].bit_length() - 1))])
            for m in tree.matrices
        ]
        siblings = []
        idx = index
        for level in range(log_max):
            siblings.append(np.asarray(tree.layers[level][idx ^ 1]))
            idx >>= 1
        return opened, siblings

    def verify_batch(
        self, commitment, dimensions, index, opened_rows, siblings, xp=np
    ) -> bool:
        heights = [h for h, _w in dimensions]
        max_h = max(heights)
        log_max = max_h.bit_length() - 1
        if len(siblings) != log_max:
            return False
        by_h: dict[int, list] = {}
        for (h, _w), row in zip(dimensions, opened_rows):
            by_h.setdefault(h, []).append(
                np.asarray(row, dtype=U32).reshape(1, -1, 2)
            )

        def digest_at(h):
            return gl_sponge_hash(np.concatenate(by_h[h], axis=1), xp)[0]

        node = digest_at(max_h)
        idx = index
        h = max_h
        for level in range(log_max):
            sib = np.asarray(siblings[level], dtype=U32)
            l, r = (sib, node) if (idx & 1) else (node, sib)
            node = gl_compress(l[None], r[None], xp)[0]
            idx >>= 1
            h //= 2
            if h in by_h:
                node = gl_compress(node[None], digest_at(h)[None], xp)[0]
        return bool(
            np.array_equal(node, np.asarray(commitment, dtype=U32))
        )


# ---------------------------------------------------------------------------
# duplex challenger (W8, rate 4)
# ---------------------------------------------------------------------------


class GlChallenger:
    """Duplex challenger over the Goldilocks W8 permutation (mirrors
    `stark/challenger.DuplexChallenger` at rate 4)."""

    def __init__(self):
        self.state = np.zeros((WIDTH, 2), dtype=U32)
        self.input_buffer: list = []
        self.output_buffer: list = []

    def _duplex(self):
        for i, v in enumerate(self.input_buffer):
            self.state[i] = v
        self.input_buffer = []
        self.state = gl_permute(self.state[None])[0]
        self.output_buffer = list(self.state[:RATE])

    def observe(self, value):
        """value: (2,) limb pair (or int)."""
        if isinstance(value, (int, np.integer)):
            value = GL.from_ints(int(value))
        self.output_buffer = []
        self.input_buffer.append(np.asarray(value, dtype=U32))
        if len(self.input_buffer) == RATE:
            self._duplex()

    def observe_slice(self, values):
        arr = np.asarray(values, dtype=U32).reshape(-1, 2)
        for v in arr:
            self.observe(v)

    def observe_ext(self, e):
        self.observe_slice(np.asarray(e, dtype=U32))

    def sample(self) -> np.ndarray:
        # front-pop, like DuplexChallenger (stark/challenger.py): sampled
        # extension elements then coincide with D-aligned output limbs of
        # the permutation, so the recursive GL verifier reads samples as
        # chained-table output limbs with zero arithmetic rows
        if self.input_buffer or not self.output_buffer:
            self._duplex()
        return np.asarray(self.output_buffer.pop(0), dtype=U32)

    def sample_ext(self) -> np.ndarray:
        c0 = self.sample()
        c1 = self.sample()
        return np.stack([c0, c1])

    def sample_bits(self, bits: int) -> int:
        v = int(GL.to_ints(self.sample()))
        return v & ((1 << bits) - 1)


# ---------------------------------------------------------------------------
# NTT over Goldilocks (two-adicity 32)
# ---------------------------------------------------------------------------


def _gl_bitrev_perm(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n)
    out = np.zeros(n, dtype=np.int64)
    for b in range(bits):
        out = (out << 1) | ((idx >> b) & 1)
    return out


@functools.lru_cache(maxsize=None)
def _gl_twiddles(log_n: int, inverse: bool) -> tuple:
    """Per-stage twiddle tables (stage s: (2^{s-1}, 2) array)."""
    out = []
    for s in range(1, log_n + 1):
        m = 1 << s
        w = GL.two_adic_generator(s)
        if inverse:
            w = pow(w, P_GOLDILOCKS - 2, P_GOLDILOCKS)
        out.append(
            GL.from_ints([pow(w, j, P_GOLDILOCKS) for j in range(m // 2)])
        )
    return tuple(out)


def gl_ntt(a, xp=np, inverse: bool = False):
    """In-order radix-2 NTT down axis 0 of (n, w, 2)."""
    n = a.shape[0]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    if n == 1:
        return xp.asarray(a)
    a = xp.asarray(a)[_gl_bitrev_perm(n)]
    tw = _gl_twiddles(log_n, inverse)
    for s in range(1, log_n + 1):
        m = 1 << s
        blocks = a.reshape(n // m, m, -1, 2)
        even = blocks[:, : m // 2]
        odd = blocks[:, m // 2 :]
        t = GL.mul(odd, xp.asarray(tw[s - 1])[None, :, None, :], xp)
        a = xp.concatenate(
            [GL.add(even, t, xp), GL.sub(even, t, xp)], axis=1
        ).reshape(n, -1, 2)
    if inverse:
        inv_n = GL.from_ints(pow(n, P_GOLDILOCKS - 2, P_GOLDILOCKS))
        a = GL.mul(a, xp.asarray(inv_n), xp)
    return a


def gl_intt(a, xp=np):
    return gl_ntt(a, xp, inverse=True)


def _gl_power_table(base: int, n: int) -> np.ndarray:
    out, acc = [], 1
    for _ in range(n):
        out.append(acc)
        acc = acc * base % P_GOLDILOCKS
    return GL.from_ints(out)


def gl_domain_points(log_n: int, shift: int) -> np.ndarray:
    w = GL.two_adic_generator(log_n)
    pts = _gl_power_table(w, 1 << log_n)
    return GL.mul(pts, np.asarray(GL.from_ints(shift)), np)


# ---------------------------------------------------------------------------
# FRI PCS (two-adic, arity-2 folds; host path)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class GlFriParams:
    """Mirrors `stark/fri_pcs.FriParams` (arity fixed at 2, no hiding /
    caps / PoW — the Goldilocks pipeline carries the core protocol)."""

    log_blowup: int = 1
    num_queries: int = 8
    log_final_poly_len: int = 0

    @staticmethod
    def testing() -> "GlFriParams":
        return GlFriParams()


@dataclasses.dataclass
class GlCommittedMatrix:
    shift: int
    log_n: int
    width: int
    coeffs: np.ndarray  # (n, w, 2)


@dataclasses.dataclass
class GlPcsProverData:
    matrices: list
    tree: GlMerkleTree
    commitment: np.ndarray  # (4, 2)


@dataclasses.dataclass
class GlQueryProof:
    input_openings: list  # per round: (opened bitrev-LDE rows, siblings)
    commit_steps: list  # per phase: (pair row (2, 2, 2), siblings)


@dataclasses.dataclass
class GlFriProof:
    commit_digests: list  # per phase (4, 2)
    final_coeffs: np.ndarray  # (final_len, 2, 2)
    query_proofs: list
    # prover-side cache of the sampled query indices (derived data, like
    # FriProof.query_indices): lets the GL recursion layer skip the full
    # transcript replay when packing Merkle direction bits
    query_indices: list | None = dataclasses.field(
        default=None, compare=False
    )


def _gl_reduce_sum(arr, axis0_len, xp=np):
    """Σ along axis 0 by pairwise halving (GL-add tree)."""
    a = arr
    n = axis0_len
    while n > 1:
        if n % 2:
            tail = a[n - 1 : n]
            a = GL.add(a[: n // 2], a[n // 2 : n - 1 + n // 2], xp)
            # odd leftover folds into slot 0
            a0 = GL.add(a[0:1], tail, xp)
            a = xp.concatenate([a0, a[1:]], axis=0)
            n = n // 2
        else:
            a = GL.add(a[: n // 2], a[n // 2 : n], xp)
            n //= 2
    return a[0]


def _gl_ext_reduce_matrix(lde, alpha_pows, xp=np):
    """Σ_c α^{k+c}·p_c(x) over columns: lde (h, w, 2) base,
    alpha_pows (w, 2, 2) -> (h, 2, 2)."""
    h, w, _ = lde.shape
    terms = GLE.mul_base(
        alpha_pows[None, :, :, :], lde, xp
    )  # (h, w, 2, 2)
    acc = terms[:, 0]
    for c in range(1, w):
        acc = GLE.add(acc, terms[:, c], xp)
    return acc


class GlFriPcs:
    """Two-adic FRI PCS over Goldilocks (mirrors `TwoAdicFriPcs`'s host
    path at arity 2: commit = coset LDE + Merkle in bitrev row order;
    open = per-height reduced openings, β-fold chain with roll-ins, final
    polynomial + query paths)."""

    def __init__(self, params: GlFriParams | None = None):
        self.params = params or GlFriParams.testing()
        self.mmcs = GlMerkleMmcs()

    # ----- commit -----

    def commit(self, mats: list, xp=np) -> GlPcsProverData:
        """mats: [(shift, evals (n, w, 2))] — evals over shift·K."""
        committed, ldes = [], []
        for shift, evals in mats:
            n, w, _ = evals.shape
            log_n = n.bit_length() - 1
            coeffs = gl_intt(xp.asarray(evals), xp)
            if shift != 1:
                inv_s = pow(int(shift), P_GOLDILOCKS - 2, P_GOLDILOCKS)
                coeffs = GL.mul(
                    coeffs, xp.asarray(_gl_power_table(inv_s, n))[:, None], xp
                )
            m = n << self.params.log_blowup
            gpow = xp.asarray(_gl_power_table(GL.generator, n))
            scaled = GL.mul(coeffs, gpow[:, None], xp)
            padded = xp.zeros((m, w, 2), dtype=U32)
            if xp is np:
                padded[:n] = scaled
            else:
                padded = padded.at[:n].set(scaled)
            lde = gl_ntt(padded, xp)[_gl_bitrev_perm(m)]
            committed.append(
                GlCommittedMatrix(int(shift), log_n, w, np.asarray(coeffs))
            )
            ldes.append(lde)
        root, tree = self.mmcs.commit(ldes, xp)
        return GlPcsProverData(committed, tree, np.asarray(root))

    # ----- evaluate committed polynomial at an extension point -----

    def eval_at_point(self, mat: GlCommittedMatrix, zeta, xp=np):
        """p(ζ) per column: (w, 2, 2)."""
        n = 1 << mat.log_n
        pows = GLE.powers(xp.asarray(zeta), n, xp)  # (n, 2, 2)
        terms = GLE.mul_base(
            pows[:, None, :, :], xp.asarray(mat.coeffs), xp
        )  # (n, w, 2, 2)
        return _gl_reduce_sum(terms, n, xp)

    # ----- open -----

    def open(self, rounds: list, challenger: GlChallenger, xp=np):
        """rounds: [(GlPcsProverData, points[mat] = [ζ…])] — mirrors
        `TwoAdicFriPcs.open`'s transcript order."""
        P = self.params
        opened = []
        for data, points in rounds:
            rv = []
            for mat, pts in zip(data.matrices, points):
                rv.append(
                    [np.asarray(self.eval_at_point(mat, z, xp)) for z in pts]
                )
            opened.append(rv)
        for rv in opened:
            for mv in rv:
                for pv in mv:
                    challenger.observe_slice(pv)
        alpha = challenger.sample_ext()
        total_cols = sum(
            mat.width * len(pts)
            for data, points in rounds
            for mat, pts in zip(data.matrices, points)
        )
        alpha_pows = np.asarray(GLE.powers(alpha, max(total_cols, 1), xp))
        acc: dict[int, np.ndarray] = {}
        k = 0
        for (data, points), round_vals in zip(rounds, opened):
            for mi, (mat, pts, mat_vals) in enumerate(
                zip(data.matrices, points, round_vals)
            ):
                log_h = mat.log_n + P.log_blowup
                h = 1 << log_h
                lde = xp.asarray(data.tree.matrices[mi])
                x_br = gl_domain_points(log_h, GL.generator)[
                    _gl_bitrev_perm(h)
                ]
                for z, y in zip(pts, mat_vals):
                    apow = alpha_pows[k : k + mat.width]
                    # y_red = Σ_c α^{k+c}·y_c  (y: (w, 2, 2) ext values)
                    y_red = _gl_reduce_sum(
                        GLE.mul(apow, np.asarray(y), xp), mat.width, xp
                    )
                    num_red = _gl_ext_reduce_matrix(lde, apow, xp)
                    zx = GLE.sub(
                        GLE.from_base(xp.asarray(x_br), xp),
                        xp.broadcast_to(xp.asarray(z), (h, 2, 2)),
                        xp,
                    )
                    diff = GLE.sub(
                        num_red,
                        xp.broadcast_to(np.asarray(y_red), (h, 2, 2)),
                        xp,
                    )
                    term = GLE.mul(diff, GLE.inv(zx, xp), xp)
                    acc[log_h] = (
                        term
                        if log_h not in acc
                        else GLE.add(acc[log_h], term, xp)
                    )
                    k += mat.width
        # commit phase: arity-2 folds down to the final codeword
        log_max = max(acc)
        log_final = P.log_final_poly_len + P.log_blowup
        assert min(acc) >= log_final
        folded = acc[log_max]
        shift = GL.generator
        commit_digests, commit_trees = [], []
        log_size = log_max
        while log_size > log_final:
            rows = folded.reshape((1 << log_size) // 2, 4, 2)
            root, tree = self.mmcs.commit([rows], xp)
            commit_digests.append(np.asarray(root))
            commit_trees.append(tree)
            challenger.observe_slice(np.asarray(root))
            beta = challenger.sample_ext()
            folded = self._fold_once(folded, beta, log_size, shift, xp)
            shift = shift * shift % P_GOLDILOCKS
            log_size -= 1
            if log_size in acc:
                folded = GLE.add(folded, acc[log_size], xp)
        # final polynomial: an ext codeword NTTs per coefficient column
        final_evals = folded[_gl_bitrev_perm(1 << log_size)]
        fc = gl_intt(final_evals, xp)  # (sz, 2, 2)
        if shift != 1:
            inv_s = pow(int(shift), P_GOLDILOCKS - 2, P_GOLDILOCKS)
            fc = GL.mul(
                fc,
                xp.asarray(_gl_power_table(inv_s, 1 << log_size))[
                    :, None, :
                ],
                xp,
            )
        final_len = 1 << P.log_final_poly_len
        final_coeffs = np.asarray(fc)[:final_len]
        assert np.all(np.asarray(fc)[final_len:] == 0), (
            "FRI final poly exceeds degree bound"
        )
        challenger.observe_slice(final_coeffs)
        # queries
        round_log_max = [
            max(m.log_n + P.log_blowup for m in data.matrices)
            for data, _p in rounds
        ]
        query_proofs = []
        indices = []
        for _ in range(P.num_queries):
            index = challenger.sample_bits(log_max)
            indices.append(index)
            input_openings = []
            for (data, _pts), rlm in zip(rounds, round_log_max):
                input_openings.append(
                    self.mmcs.open_batch(index >> (log_max - rlm), data.tree)
                )
            commit_steps = []
            for ph, tree in enumerate(commit_trees):
                rows, sibs = self.mmcs.open_batch(index >> (ph + 1), tree)
                commit_steps.append((rows[0], sibs))
            query_proofs.append(GlQueryProof(input_openings, commit_steps))
        return opened, GlFriProof(
            commit_digests,
            final_coeffs,
            query_proofs,
            query_indices=indices,
        )

    def _fold_once(self, folded, beta, log_size: int, shift: int, xp):
        half = 1 << (log_size - 1)
        nat = gl_domain_points(log_size, shift)[:half]
        x_pair = nat[_gl_bitrev_perm(half)] if half > 1 else nat
        inv_2x = GL.inv(GL.add(x_pair, x_pair, xp), xp)
        a = folded[0::2]
        b = folded[1::2]
        s = GLE.add(a, b, xp)
        d = GLE.sub(a, b, xp)
        inv2 = xp.asarray(
            GL.from_ints(pow(2, P_GOLDILOCKS - 2, P_GOLDILOCKS))
        )
        even = GLE.mul_base(s, inv2, xp)
        odd = GLE.mul_base(d, xp.asarray(inv_2x)[:, None, :][:, 0], xp)
        return GLE.add(
            even,
            GLE.mul(odd, xp.broadcast_to(xp.asarray(beta), odd.shape), xp),
            xp,
        )

    # ----- verify -----

    def verify(self, rounds: list, proof: GlFriProof, challenger):
        """rounds: [(commitment, mats)] with mats[i] = (log_n,
        [(ζ (2,2), claimed (w,2,2)), …]).  Mirrors `TwoAdicFriPcs.verify`
        (arity-2 fold chain; includes the overlong-final-poly and
        below-final-height soundness rejections)."""
        P = self.params
        log_final = P.log_final_poly_len + P.log_blowup
        fc = np.asarray(proof.final_coeffs)
        if fc.shape[0] != 1 << P.log_final_poly_len:
            raise ValueError("final poly length mismatch")
        if any(
            int(v) >= P_GOLDILOCKS for v in GL.to_ints(fc).reshape(-1)
        ):
            raise ValueError("final poly coefficients out of field range")
        for _com, mats in rounds:
            for log_n, _pts in mats:
                if log_n + P.log_blowup < log_final:
                    raise ValueError("matrix height below FRI minimum")
        for _com, mats in rounds:
            for _log_n, pts in mats:
                for _z, y in pts:
                    challenger.observe_slice(np.asarray(y))
        alpha = challenger.sample_ext()
        betas = []
        for digest in proof.commit_digests:
            challenger.observe_slice(np.asarray(digest))
            betas.append(challenger.sample_ext())
        challenger.observe_slice(np.asarray(proof.final_coeffs))
        heights = [
            log_n + P.log_blowup for _c, mats in rounds for log_n, _p in mats
        ]
        log_max = max(heights)
        if len(proof.commit_digests) != log_max - log_final:
            raise ValueError("wrong number of FRI phases")
        if len(proof.query_proofs) != P.num_queries:
            raise ValueError("wrong number of query proofs")
        total_cols = sum(
            np.asarray(pts[0][1]).shape[0] * len(pts)
            for _c, mats in rounds
            for _log_n, pts in mats
        )
        alpha_pows = np.asarray(GLE.powers(alpha, max(total_cols, 1), np))
        round_log_max = [
            max(log_n + P.log_blowup for log_n, _p in mats)
            for _c, mats in rounds
        ]
        inv2 = GL.from_ints(pow(2, P_GOLDILOCKS - 2, P_GOLDILOCKS))
        for q in range(P.num_queries):
            index = challenger.sample_bits(log_max)
            qp = proof.query_proofs[q]
            acc: dict[int, np.ndarray] = {}
            k = 0
            for (com, mats), (opened_rows, sibs), rlm in zip(
                rounds, qp.input_openings, round_log_max
            ):
                dims = [
                    (
                        1 << (log_n + P.log_blowup),
                        np.asarray(pts[0][1]).shape[0],
                    )
                    for log_n, pts in mats
                ]
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
                    x = gl_domain_points(log_h, GL.generator)[
                        _gl_nat_index(idx_h, log_h)
                    ]
                    for z, y in pts:
                        apow = alpha_pows[k : k + w]
                        p_red = _gl_reduce_sum(
                            GLE.mul_base(apow, np.asarray(row), np), w, np
                        )
                        y_red = _gl_reduce_sum(
                            GLE.mul(apow, np.asarray(y), np), w, np
                        )
                        zx = GLE.sub(
                            GLE.from_base(np.asarray(x), np),
                            np.asarray(z),
                            np,
                        )
                        term = GLE.mul(
                            GLE.sub(p_red, y_red, np), GLE.inv(zx, np), np
                        )
                        acc[log_h] = (
                            term
                            if log_h not in acc
                            else GLE.add(acc[log_h], term, np)
                        )
                        k += w
            # arity-2 fold chain
            folded_val = acc[log_max]
            idx = index
            shift = GL.generator
            log_size = log_max
            for ph, (row, sibs) in enumerate(qp.commit_steps):
                row_idx = idx >> 1
                if not self.mmcs.verify_batch(
                    np.asarray(proof.commit_digests[ph]),
                    [((1 << log_size) // 2, 4)],
                    row_idx,
                    [row],
                    sibs,
                ):
                    raise ValueError(
                        f"commit-phase MMCS failed at phase {ph}"
                    )
                vals = np.asarray(row, dtype=U32).reshape(2, 2, 2)
                if not np.array_equal(vals[idx & 1], folded_val):
                    raise ValueError(
                        f"fold consistency failed at phase {ph}"
                    )
                half = 1 << (log_size - 1)
                nat = gl_domain_points(log_size, shift)[:half]
                x_pair = nat[_gl_bitrev_perm(half)] if half > 1 else nat
                inv_2x = GL.inv(
                    GL.add(x_pair[row_idx], x_pair[row_idx], np), np
                )
                va, vb = vals[0], vals[1]
                even = GLE.mul_base(GLE.add(va, vb, np), inv2, np)
                odd = GLE.mul_base(GLE.sub(va, vb, np), inv_2x, np)
                folded_val = GLE.add(
                    even, GLE.mul(odd, np.asarray(betas[ph]), np), np
                )
                shift = shift * shift % P_GOLDILOCKS
                log_size -= 1
                idx = row_idx
                if log_size in acc:
                    folded_val = GLE.add(folded_val, acc[log_size], np)
            x_fin = gl_domain_points(log_size, shift)[
                _gl_nat_index(idx, log_size)
            ]
            expect = _gl_eval_poly_ext(proof.final_coeffs, x_fin)
            if not np.array_equal(expect, folded_val):
                raise ValueError("final polynomial check failed")
        return True


def _gl_nat_index(bitrev_index: int, log_n: int) -> int:
    r = 0
    for b in range(log_n):
        r |= ((bitrev_index >> b) & 1) << (log_n - 1 - b)
    return r


def _gl_eval_poly_ext(coeffs, x):
    """Horner eval of ext-coeff poly at base point x (2,)."""
    acc = GLE.zeros((), np)
    for i in range(np.asarray(coeffs).shape[0] - 1, -1, -1):
        acc = GLE.mul_base(acc, np.asarray(x), np)
        acc = GLE.add(acc, np.asarray(coeffs[i], dtype=U32), np)
    return acc


# ---------------------------------------------------------------------------
# uni-stark over Goldilocks
# ---------------------------------------------------------------------------


class GlFibAir:
    """Fibonacci AIR (the reference goldilocks.rs workload): columns
    (a, b); publics (a₀, b₀, b_final).  Constraints evaluated directly in
    GL2 (the Monty31 symbolic layer is field-specific)."""

    width_main = 2
    width_prep = 0
    num_publics = 3
    log_quotient_degree = 0  # max constraint degree 2

    def eval_ext(
        self, local, nxt, publics, sels, xp=np, prep_local=None,
        prep_next=None,
    ):
        """local/nxt: (..., w, 2, 2) ext; publics: [(2,) base]*3;
        sels: dict of (..., 2, 2) ext.  Returns constraint evals."""
        a, b = local[..., 0, :, :], local[..., 1, :, :]
        an, bn = nxt[..., 0, :, :], nxt[..., 1, :, :]
        p0, p1, pf = publics
        first, last, trans = sels["first"], sels["last"], sels["transition"]

        def mb(e, base):
            return GLE.sub(
                e, GLE.from_base(xp.broadcast_to(xp.asarray(base), e.shape[:-2] + (2,)), xp), xp
            )

        return [
            GLE.mul(first, mb(a, p0), xp),
            GLE.mul(first, mb(b, p1), xp),
            GLE.mul(trans, GLE.sub(an, b, xp), xp),
            GLE.mul(trans, GLE.sub(bn, GLE.add(a, b, xp), xp), xp),
            GLE.mul(last, mb(b, pf), xp),
        ]


class GlMulAir:
    """Preprocessed-column AIR (the reference goldilocks.rs
    `test_goldilocks_mul_verifier_with_preprocessed` workload analog):
    main columns (x, y) with a preprocessed multiplier column k;
    constraints y = k·x per row and first-row x = p₀."""

    width_main = 2
    width_prep = 1
    num_publics = 1
    log_quotient_degree = 0  # max constraint degree 2 (main × prep)

    def eval_ext(
        self, local, nxt, publics, sels, xp=np, prep_local=None,
        prep_next=None,
    ):
        x, y = local[..., 0, :, :], local[..., 1, :, :]
        k = prep_local[..., 0, :, :]
        (p0,) = publics
        first = sels["first"]
        x_m_p0 = GLE.sub(
            x,
            GLE.from_base(
                xp.broadcast_to(xp.asarray(p0), x.shape[:-2] + (2,)), xp
            ),
            xp,
        )
        return [
            GLE.sub(y, GLE.mul(k, x, xp), xp),
            GLE.mul(first, x_m_p0, xp),
        ]


@dataclasses.dataclass(frozen=True)
class GlStarkConfig:
    """The reference's `goldilocks()` StarkConfig analog."""

    pcs: GlFriPcs

    def challenger(self) -> GlChallenger:
        return GlChallenger()


def goldilocks_config(params: GlFriParams | None = None) -> GlStarkConfig:
    return GlStarkConfig(GlFriPcs(params))


@dataclasses.dataclass
class GlUniProof:
    log_n: int
    trace_commit: np.ndarray
    quotient_commit: np.ndarray
    trace_local: np.ndarray  # (w, 2, 2)
    trace_next: np.ndarray
    quotient_chunks: list  # [(2, 2, 2)] per chunk
    fri: GlFriProof
    # preprocessed columns (reference MulAir-with-preprocessed workload)
    prep_commit: np.ndarray | None = None
    prep_local: np.ndarray | None = None  # (wp, 2, 2)
    prep_next: np.ndarray | None = None


def _gl_selectors_on_coset(log_n: int, shift: int, size: int, xp=np):
    """first/last/transition/inv_vanishing over shift·K of |size| rows
    (p3-uni-stark selector formulas: Z_H = xⁿ−1, first = Z/(x−1),
    last = Z/(x−g⁻¹), transition = x−g⁻¹)."""
    n = 1 << log_n
    x = gl_domain_points(size.bit_length() - 1, shift)
    xn = x
    for _ in range(log_n):
        xn = GL.mul(xn, xn, xp)
    one = xp.asarray(GL.from_ints(1))
    zh = GL.sub(xn, xp.broadcast_to(one, xn.shape), xp)
    g_inv = pow(GL.two_adic_generator(log_n), n - 1, P_GOLDILOCKS)
    gi = xp.asarray(GL.from_ints(g_inv))
    xm1 = GL.sub(x, xp.broadcast_to(one, x.shape), xp)
    xmg = GL.sub(x, xp.broadcast_to(gi, x.shape), xp)
    return {
        "first": GL.mul(zh, GL.inv(xm1, xp), xp),
        "last": GL.mul(zh, GL.inv(xmg, xp), xp),
        "transition": xmg,
        "inv_vanishing": GL.inv(zh, xp),
    }


def _gl_selectors_at_point(log_n: int, zeta, xp=np):
    """Same selectors at an extension point ζ."""
    n = 1 << log_n
    zn = zeta
    for _ in range(log_n):
        zn = GLE.mul(zn, zn, xp)
    one = GLE.from_ints((1, 0))
    zh = GLE.sub(zn, xp.asarray(one), xp)
    g_inv = pow(GL.two_adic_generator(log_n), n - 1, P_GOLDILOCKS)
    zm1 = GLE.sub(zeta, xp.asarray(one), xp)
    zmg = GLE.sub(zeta, xp.asarray(GLE.from_ints((g_inv, 0))), xp)
    return {
        "first": GLE.mul(zh, GLE.inv(zm1, xp), xp),
        "last": GLE.mul(zh, GLE.inv(zmg, xp), xp),
        "transition": zmg,
        "inv_vanishing": GLE.inv(zh, xp),
    }


def _gl_fold_constraints(constraints, alpha, xp=np):
    apow = GLE.powers(np.asarray(alpha), len(constraints), xp)
    acc = None
    for i, c in enumerate(constraints):
        t = GLE.mul(c, xp.broadcast_to(xp.asarray(apow[i]), c.shape), xp)
        acc = t if acc is None else GLE.add(acc, t, xp)
    return acc


def gl_prove(
    config: GlStarkConfig, air, trace, publics, xp=np, prep=None
) -> GlUniProof:
    """trace: (n, w, 2); publics: list of ints; prep: optional (n, wp, 2)
    preprocessed columns.  Mirrors `uni.prove`."""
    pcs = config.pcs
    n = trace.shape[0]
    log_n = n.bit_length() - 1
    pub_arrs = [GL.from_ints(int(v)) for v in publics]
    ch = config.challenger()
    ch.observe(log_n)
    prep_data = None
    if prep is not None:
        prep_data = pcs.commit([(1, np.asarray(prep))], xp)
        ch.observe_slice(prep_data.commitment)
    trace_data = pcs.commit([(1, np.asarray(trace))], xp)
    ch.observe_slice(trace_data.commitment)
    for v in pub_arrs:
        ch.observe(v)
    alpha = ch.sample_ext()
    # quotient on the coset g·K (size n·2^lq; lq = 0 for degree-2 airs)
    lq = air.log_quotient_degree
    m = n << lq

    def to_coset(mat, w):
        coeffs = gl_intt(xp.asarray(mat), xp)
        gpow = xp.asarray(_gl_power_table(GL.generator, n))
        scaled = GL.mul(coeffs, gpow[:, None], xp)
        padded = xp.zeros((m, w, 2), dtype=U32)
        if xp is np:
            padded[:n] = scaled
        else:
            padded = padded.at[:n].set(scaled)
        return gl_ntt(padded, xp)

    lde_q = to_coset(trace, air.width_main)
    nxt = xp.roll(lde_q, -(1 << lq), axis=0)
    prep_kw = {}
    if prep is not None:
        lde_p = to_coset(prep, prep.shape[1])
        prep_kw = {
            "prep_local": GLE.from_base(lde_p, xp),
            "prep_next": GLE.from_base(
                xp.roll(lde_p, -(1 << lq), axis=0), xp
            ),
        }
    sels = _gl_selectors_on_coset(log_n, GL.generator, m, xp)
    sels_ext = {k: GLE.from_base(v, xp) for k, v in sels.items()}
    cons = air.eval_ext(
        GLE.from_base(lde_q, xp), GLE.from_base(nxt, xp), pub_arrs,
        sels_ext, xp, **prep_kw,
    )
    folded = _gl_fold_constraints(cons, alpha, xp)
    qvals = GLE.mul_base(folded, sels["inv_vanishing"], xp)  # (m, 2, 2)
    qdeg = 1 << lq
    wq = GL.two_adic_generator(log_n + lq)
    chunk_mats = []
    q_np = np.asarray(qvals)
    for i in range(qdeg):
        shift = GL.generator * pow(wq, i, P_GOLDILOCKS) % P_GOLDILOCKS
        chunk_mats.append((shift, q_np[i::qdeg]))  # (n, 2, 2) base cols
    q_data = pcs.commit(chunk_mats, xp)
    ch.observe_slice(q_data.commitment)
    zeta = ch.sample_ext()
    g_n = GL.two_adic_generator(log_n)
    zeta_next = GLE.mul_base(zeta, np.asarray(GL.from_ints(g_n)), np)
    rounds = [(trace_data, [[zeta, zeta_next]])]
    if prep_data is not None:
        rounds.append((prep_data, [[zeta, zeta_next]]))
    rounds.append((q_data, [[zeta]] * qdeg))
    opened, fri_proof = pcs.open(rounds, ch, xp)
    qi = 2 if prep_data is not None else 1
    return GlUniProof(
        log_n=log_n,
        trace_commit=trace_data.commitment,
        quotient_commit=q_data.commitment,
        trace_local=opened[0][0][0],
        trace_next=opened[0][0][1],
        quotient_chunks=[opened[qi][i][0] for i in range(qdeg)],
        fri=fri_proof,
        prep_commit=prep_data.commitment if prep_data else None,
        prep_local=opened[1][0][0] if prep_data else None,
        prep_next=opened[1][0][1] if prep_data else None,
    )


def gl_verify(config: GlStarkConfig, air, proof: GlUniProof, publics) -> bool:
    pcs = config.pcs
    log_n = proof.log_n
    lq = air.log_quotient_degree
    qdeg = 1 << lq
    if len(proof.quotient_chunks) != qdeg:
        raise ValueError("wrong number of quotient chunks")
    if np.asarray(proof.trace_local).shape != (air.width_main, 2, 2):
        raise ValueError("wrong trace opening shape")
    if np.asarray(proof.trace_next).shape != (air.width_main, 2, 2):
        raise ValueError("wrong trace_next opening shape")
    for c in proof.quotient_chunks:
        if np.asarray(c).shape != (2, 2, 2):
            raise ValueError("wrong quotient chunk shape")
    wp = getattr(air, "width_prep", 0)
    if (wp > 0) != (proof.prep_commit is not None):
        raise ValueError("preprocessed commitment presence mismatch")
    if wp:
        if np.asarray(proof.prep_local).shape != (wp, 2, 2):
            raise ValueError("wrong prep opening shape")
        if np.asarray(proof.prep_next).shape != (wp, 2, 2):
            raise ValueError("wrong prep_next opening shape")
    pub_arrs = [GL.from_ints(int(v)) for v in publics]
    ch = config.challenger()
    ch.observe(log_n)
    if wp:
        ch.observe_slice(proof.prep_commit)
    ch.observe_slice(proof.trace_commit)
    for v in pub_arrs:
        ch.observe(v)
    alpha = ch.sample_ext()
    ch.observe_slice(proof.quotient_commit)
    zeta = ch.sample_ext()
    sels = _gl_selectors_at_point(log_n, np.asarray(zeta), np)
    prep_kw = {}
    if wp:
        prep_kw = {
            "prep_local": np.asarray(proof.prep_local, dtype=U32),
            "prep_next": np.asarray(proof.prep_next, dtype=U32),
        }
    cons = air.eval_ext(
        np.asarray(proof.trace_local, dtype=U32),
        np.asarray(proof.trace_next, dtype=U32),
        pub_arrs,
        sels,
        np,
        **prep_kw,
    )
    folded = _gl_fold_constraints(cons, alpha, np)
    lhs = GLE.mul(folded, sels["inv_vanishing"], np)
    # recompose Q(ζ) from chunk openings: chunk i's base columns are the
    # ext coefficients; with lq = 0 the single chunk IS Q
    basis1 = GLE.from_ints((0, 1))
    q_zeta = None
    assert qdeg == 1, "GL pipeline: degree-2 airs (single quotient chunk)"
    c = np.asarray(proof.quotient_chunks[0], dtype=U32)  # (2, 2, 2)
    q_zeta = GLE.add(c[0], GLE.mul(np.asarray(basis1), c[1], np), np)
    if not np.array_equal(lhs, q_zeta):
        raise ValueError("quotient/constraint mismatch at zeta")
    g_n = GL.two_adic_generator(log_n)
    zeta_next = GLE.mul_base(
        np.asarray(zeta), np.asarray(GL.from_ints(g_n)), np
    )
    rounds_v = [
        (
            proof.trace_commit,
            [(log_n, [(np.asarray(zeta), np.asarray(proof.trace_local)),
                      (zeta_next, np.asarray(proof.trace_next))])],
        ),
    ]
    if wp:
        rounds_v.append(
            (
                proof.prep_commit,
                [(log_n, [(np.asarray(zeta), np.asarray(proof.prep_local)),
                          (zeta_next, np.asarray(proof.prep_next))])],
            )
        )
    rounds_v.append(
        (
            proof.quotient_commit,
            [
                (log_n, [(np.asarray(zeta), np.asarray(proof.quotient_chunks[i]))])
                for i in range(qdeg)
            ],
        )
    )
    pcs.verify(rounds_v, proof.fri, ch)
    return True

"""Merkle-tree MMCS: batched vector commitments over matrix batches.

TPU-native equivalent of the reference's upstream `p3-merkle-tree`
(`MerkleTreeMmcs`) + `p3-commit` (`ExtensionMmcs`); SURVEY.md §2.6.

Semantics:
* `commit` takes matrices of power-of-two heights (tallest H). Level 0
  hashes, for every row index, the concatenation of the rows of all
  height-H matrices (PaddingFreeSponge, rate 8, 8-element digests). Each
  next level 2-to-1 compresses sibling digests (TruncatedPermutation) and,
  when matrices of that height exist, injects their row-hash via a second
  compression: `node = compress(compress(l, r), row_digest)`.
* `open_batch(index)` returns each matrix's row at `index >> (logH - logh)`
  plus the sibling-digest path; `verify_batch` recomputes the root.

All level hashes are batched device-friendly Poseidon2 calls; the tree for
height H costs ~2H permutations total regardless of matrix count.

Extension-field matrices commit via `flatten_ext_matrix` (each ext element
becomes D adjacent base columns), mirroring `ExtensionMmcs`.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..fields.monty31 import Monty31, U32
from ..ops.hashing import compress_pair, sponge_hash
from ..ops.poseidon2 import Poseidon2Params, poseidon2_params

DIGEST_ELEMS = 8
RATE = 8


@dataclasses.dataclass
class MerkleTree:
    """Prover data: committed matrices + all digest layers.

    Device mode (`dev_flat` set): every digest layer concatenated into ONE
    device array (leaf layer first) — siblings are gathered off the device
    at query time, so the tree is never bulk-downloaded.  Host mode keeps
    the per-layer numpy list."""

    matrices: list  # list[(H_i, W_i) canonical u32], arbitrary order
    layers: list | None = None  # host digest layers, [0] = leaf (H, 8)
    dev_flat: object = None  # device (Σ layer heights, 8)
    layer_heights: list | None = None  # per layer, leaf first

    @property
    def root(self) -> np.ndarray:
        if self.layers is not None:
            return np.asarray(self.layers[-1][0])
        return np.asarray(self.dev_flat[sum(self.layer_heights[:-1])])

    def host_layers(self) -> list:
        """Materialize per-layer host arrays (one download, cached)."""
        if self.layers is None:
            flat = np.asarray(self.dev_flat)
            ls, off = [], 0
            for h in self.layer_heights:
                ls.append(flat[off : off + h])
                off += h
            self.layers = ls
        return self.layers

    def layer_offsets(self) -> list:
        offs, off = [], 0
        for h in self.layer_heights:
            offs.append(off)
            off += h
        return offs


class MerkleMmcs:
    def __init__(
        self,
        field: Monty31,
        params: Poseidon2Params | None = None,
        use_jit: bool = False,
    ):
        self.field = field
        self.params = params or poseidon2_params(field, 16)
        self.use_jit = use_jit

    def _rows_digest(self, mats_at_h: list, xp) -> np.ndarray:
        rows = xp.concatenate([m for m in mats_at_h], axis=1)
        return sponge_hash(self.params, rows, RATE, DIGEST_ELEMS, xp)

    def commit(self, matrices: list, xp=np) -> tuple[np.ndarray, MerkleTree]:
        """matrices: list of (H_i, W_i) canonical u32 arrays (H_i = 2^k)."""
        assert matrices, "empty commitment"
        heights = [m.shape[0] for m in matrices]
        for h in heights:
            assert h & (h - 1) == 0, "heights must be powers of two"
        if self.use_jit:
            from ..ops.jitk import merkle_commit_flat_fn, merkle_layer_heights

            shapes = tuple((m.shape[0], m.shape[1]) for m in matrices)
            fn = merkle_commit_flat_fn(self.field, shapes)
            # matrices kept as given (possibly device-resident) for
            # batched query-row gathers later; digest layers stay on
            # device as one flat array (siblings gathered at query time)
            tree = MerkleTree(
                matrices=list(matrices),
                dev_flat=fn(*matrices),
                layer_heights=merkle_layer_heights(shapes),
            )
            return tree.root, tree
        by_height: dict[int, list] = {}
        for m in matrices:
            by_height.setdefault(m.shape[0], []).append(m)
        h = max(heights)
        layer = self._rows_digest(by_height[h], xp)
        layers = [layer]
        while h > 1:
            h //= 2
            left = layer[0::2]
            right = layer[1::2]
            layer = compress_pair(self.params, left, right, xp)
            if h in by_height:
                inj = self._rows_digest(by_height[h], xp)
                layer = compress_pair(self.params, layer, inj, xp)
            layers.append(layer)
        tree = MerkleTree(matrices=list(matrices), layers=layers)
        return np.asarray(layers[-1][0]), tree

    def open_batch(self, index: int, tree: MerkleTree):
        """Returns (opened_rows per matrix in commit order, sibling path)."""
        max_h = max(m.shape[0] for m in tree.matrices)
        log_max = max_h.bit_length() - 1
        opened = []
        for m in tree.matrices:
            h = m.shape[0]
            opened.append(np.asarray(m[index >> (log_max - (h.bit_length() - 1))]))
        siblings = []
        idx = index
        layers = tree.host_layers()
        for level in range(log_max):
            sib = np.asarray(layers[level][idx ^ 1])
            siblings.append(sib)
            idx >>= 1
        return opened, siblings

    def verify_batch(
        self,
        commitment: np.ndarray,
        dimensions: list[tuple[int, int]],
        index: int,
        opened_rows: list,
        siblings: list,
        xp=np,
    ) -> bool:
        """dimensions: (height, width) per matrix, commit order."""
        heights = [h for h, _ in dimensions]
        max_h = max(heights)
        log_max = max_h.bit_length() - 1
        if len(siblings) != log_max:
            return False
        by_height: dict[int, list] = {}
        for (h, _w), row in zip(dimensions, opened_rows):
            by_height.setdefault(h, []).append(np.asarray(row, dtype=U32))

        def digest_at(h):
            rows = np.concatenate(by_height[h])[None, :]
            return sponge_hash(self.params, rows, RATE, DIGEST_ELEMS, xp)[0]

        node = digest_at(max_h)
        idx = index
        h = max_h
        for sib in siblings:
            sib = np.asarray(sib, dtype=U32)
            l, r = (node, sib) if idx & 1 == 0 else (sib, node)
            node = compress_pair(self.params, l[None, :], r[None, :], xp)[0]
            idx >>= 1
            h //= 2
            if h in by_height:
                node = compress_pair(
                    self.params, node[None, :], digest_at(h)[None, :], xp
                )[0]
        return bool(np.array_equal(node, np.asarray(commitment, dtype=U32)))


def flatten_ext_matrix(m_ext) -> np.ndarray:
    """(H, W, D) extension matrix -> (H, W*D) base matrix (ExtensionMmcs).
    Preserves the array's device placement (no forced host copy)."""
    h, w, d = m_ext.shape
    return m_ext.reshape(h, w * d)


def unflatten_ext_row(row: np.ndarray, d: int) -> np.ndarray:
    return np.asarray(row).reshape(-1, d)


def compress4(params, children, xp=np):
    """TruncatedPermutation 4-to-1 over a W32 permutation:
    children (N, 4, 8) -> (N, 8)."""
    n = children.shape[0]
    state = children.reshape(n, 32)
    from ..ops.poseidon2 import permute

    return permute(params, state, xp)[..., :DIGEST_ELEMS]


class MerkleMmcs4:
    """Arity-4 Merkle MMCS over the W32 permutation (reference arity-4
    trees, `circuit/src/ops/mmcs.rs:242-348`): leaf rows hash through the
    W32/rate-24 sponge, each level packs FOUR child digests into one W32
    permutation — half the levels (and half the chained perm rows in the
    recursive verifier) of the arity-2 tree.  Single height class per
    commit (FRI commit-phase/table-batch shape); heights must satisfy
    4 | H."""

    def __init__(self, field: Monty31):
        self.field = field
        self.params = poseidon2_params(field, 32)

    def commit(self, matrices: list, xp=np):
        heights = {m.shape[0] for m in matrices}
        assert len(heights) == 1, "arity-4 MMCS: single height per commit"
        (h,) = heights
        rows = xp.concatenate([xp.asarray(m) for m in matrices], axis=1)
        layer = sponge_hash(self.params, rows, 24, DIGEST_ELEMS, xp)
        layers = [layer]
        while h > 1:
            assert h % 4 == 0, "arity-4 MMCS: height must be a power of 4"
            layer = compress4(
                self.params, layer.reshape(h // 4, 4, DIGEST_ELEMS), xp
            )
            layers.append(layer)
            h //= 4
        tree = MerkleTree(matrices=list(matrices), layers=[np.asarray(l) for l in layers])
        return np.asarray(layers[-1][0]), tree

    def open_batch(self, index: int, tree: MerkleTree):
        opened = [np.asarray(m[index]) for m in tree.matrices]
        siblings = []  # per level: (3, 8) the OTHER three children in order
        idx = index
        layers = tree.host_layers()
        for level in range(len(layers) - 1):
            group = (idx >> 2) << 2
            sibs = [
                np.asarray(layers[level][group + q])
                for q in range(4)
                if group + q != idx
            ]
            siblings.append(np.stack(sibs))
            idx >>= 2
        return opened, siblings

    def verify_batch(
        self,
        commitment: np.ndarray,
        dimensions: list[tuple[int, int]],
        index: int,
        opened_rows: list,
        siblings: list,
        xp=np,
    ) -> bool:
        rows = np.concatenate(
            [np.asarray(r, dtype=U32).reshape(-1) for r in opened_rows]
        )[None, :]
        node = sponge_hash(self.params, rows, 24, DIGEST_ELEMS, xp)[0]
        idx = index
        for sibs in siblings:
            sibs = np.asarray(sibs, dtype=U32)
            pos = idx & 3
            children = np.empty((4, DIGEST_ELEMS), dtype=U32)
            si = 0
            for q in range(4):
                if q == pos:
                    children[q] = node
                else:
                    children[q] = sibs[si]
                    si += 1
            node = compress4(self.params, children[None], xp)[0]
            idx >>= 2
        return bool(np.array_equal(node, np.asarray(commitment, dtype=U32)))

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
        cap_height: int = 0,
    ):
        """cap_height > 0 commits to the MERKLE CAP — the 2^cap_height
        digests at that depth, flattened to (2^cap_height * 8,) — instead
        of the root (reference `MerkleTreeMmcs::new(hash, compress,
        cap_height)` / `MerkleCap`, used by `MerkleCapTargets` in
        `recursion/src/pcs/fri/targets.rs:348-372`).  Opening paths are
        cap_height levels shorter; the remaining top index bits select the
        cap entry.  cap_height=0 keeps the single (8,) root."""
        self.field = field
        self.params = params or poseidon2_params(field, 16)
        self.use_jit = use_jit
        self.cap_height = cap_height

    def tree_cap_height(self, max_height: int) -> int:
        """Effective cap height for a commit of tallest height `max_height`
        (clamped so shallow trees — e.g. late FRI phase trees — stay
        committable)."""
        return min(self.cap_height, max_height.bit_length() - 1)

    def cap_commitment(self, tree: MerkleTree) -> np.ndarray:
        """The tree's commitment under this MMCS's cap height: the flat
        (2^cap * 8,) cap layer (the (8,) root when cap_height == 0)."""
        max_h = max(m.shape[0] for m in tree.matrices)
        cap_h = self.tree_cap_height(max_h)
        if cap_h == 0:
            return tree.root
        cap_layer = (max_h.bit_length() - 1) - cap_h
        if tree.layers is not None:
            return np.asarray(tree.layers[cap_layer]).reshape(-1)
        off = sum(tree.layer_heights[:cap_layer])
        return np.asarray(
            tree.dev_flat[off : off + (1 << cap_h)]
        ).reshape(-1)

    def _rows_digest(self, mats_at_h: list, xp) -> np.ndarray:
        rows = xp.concatenate([m for m in mats_at_h], axis=1)
        return sponge_hash(self.params, rows, RATE, DIGEST_ELEMS, xp)

    def commit(self, matrices: list, xp=np) -> tuple[np.ndarray, MerkleTree]:
        """matrices: list of (H_i, W_i) canonical u32 arrays (H_i = 2^k)."""
        assert matrices, "empty commitment"
        heights = [m.shape[0] for m in matrices]
        for h in heights:
            assert h & (h - 1) == 0, "heights must be powers of two"
        cap_h = self.tree_cap_height(max(heights))
        cap = 1 << cap_h
        if cap_h:
            assert min(heights) >= cap, (
                "cap_height above the smallest matrix height"
            )
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
            return self.cap_commitment(tree), tree
        by_height: dict[int, list] = {}
        for m in matrices:
            by_height.setdefault(m.shape[0], []).append(m)
        h = max(heights)
        layer = self._rows_digest(by_height[h], xp)
        layers = [layer]
        while h > cap:
            h //= 2
            left = layer[0::2]
            right = layer[1::2]
            layer = compress_pair(self.params, left, right, xp)
            if h in by_height:
                inj = self._rows_digest(by_height[h], xp)
                layer = compress_pair(self.params, layer, inj, xp)
            layers.append(layer)
        tree = MerkleTree(matrices=list(matrices), layers=layers)
        return np.asarray(layers[-1]).reshape(-1), tree

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
        for level in range(log_max - self.tree_cap_height(max_h)):
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
        cap_h = self.tree_cap_height(max_h)
        if len(siblings) != log_max - cap_h:
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
        cap_entries = np.asarray(commitment, dtype=U32).reshape(
            -1, DIGEST_ELEMS
        )
        if cap_entries.shape[0] != 1 << cap_h:
            return False
        return bool(np.array_equal(node, cap_entries[idx]))


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


def arity4_schedule(heights: list[int]) -> list[tuple[int, int]]:
    """Per-level (step, inject_height) walk of an arity-4 Merkle tree over
    power-of-two heights (reference `arity4_path_schedule` /
    `Arity4PathStep`, `recursion/src/pcs/mmcs.rs:878-956`):

      * step 4 packs four children into one W32 compression,
      * a step-2 BRIDGE (two children at chunks 0,1; chunks 2,3 zero)
        arises when an intermediate matrix height lands between two
        quaternary layers (or fewer than 4 nodes remain),
      * inject_height != 0 compresses that height class's leaf digest in
        AFTER the step: compress4(node, digest, 0, 0).
    """
    hs = sorted(set(heights), reverse=True)
    for h in hs:
        assert h > 0 and h & (h - 1) == 0, "heights must be powers of two"
    rest = hs[1:]
    steps = []
    curr = hs[0]
    ri = 0
    while curr > 1:
        bridge = curr < 4 or (ri < len(rest) and rest[ri] > curr // 4)
        step = 2 if bridge else 4
        curr //= step
        inject = 0
        if ri < len(rest) and rest[ri] == curr:
            inject = curr
            ri += 1
        steps.append((step, inject))
    return steps


class MerkleMmcs4:
    """Arity-4 Merkle MMCS over the W32 permutation (reference arity-4
    trees, `circuit/src/ops/mmcs.rs:242-348`): leaf rows hash through the
    W32/rate-24 sponge, each level packs FOUR child digests into one W32
    permutation — half the levels (and half the chained perm rows in the
    recursive verifier) of the arity-2 tree.  Mixed-height batches follow
    `arity4_schedule`: bridge levels compress two children with zero pads,
    shorter matrices' digests are injected as compress4(node, digest, 0, 0)
    (reference `recursive_arity4_mmcs.rs` mixed-height round trips)."""

    def __init__(self, field: Monty31):
        self.field = field
        self.params = poseidon2_params(field, 32)

    def _digest_rows(self, mats: list, xp) -> np.ndarray:
        rows = xp.concatenate([xp.asarray(m) for m in mats], axis=1)
        return sponge_hash(self.params, rows, 24, DIGEST_ELEMS, xp)

    def commit(self, matrices: list, xp=np):
        heights = [m.shape[0] for m in matrices]
        by_h: dict[int, list] = {}
        for m in matrices:
            by_h.setdefault(m.shape[0], []).append(m)
        layer = self._digest_rows(by_h[max(heights)], xp)
        layers = [layer]
        for step, inject in arity4_schedule(heights):
            h = layer.shape[0]
            if step == 4:
                children = layer.reshape(h // 4, 4, DIGEST_ELEMS)
            else:
                pairs = layer.reshape(h // 2, 2, DIGEST_ELEMS)
                z = xp.zeros((h // 2, 2, DIGEST_ELEMS), dtype=U32)
                children = xp.concatenate([pairs, z], axis=1)
            layer = compress4(self.params, children, xp)
            layers.append(layer)
            if inject:
                dig = self._digest_rows(by_h[inject], xp)
                assert layer.shape[0] == inject
                z = xp.zeros((inject, 2, DIGEST_ELEMS), dtype=U32)
                children = xp.concatenate(
                    [layer[:, None, :], dig[:, None, :], z], axis=1
                )
                layer = compress4(self.params, children, xp)
                layers.append(layer)
        tree = MerkleTree(
            matrices=list(matrices), layers=[np.asarray(l) for l in layers]
        )
        return np.asarray(layers[-1][0]), tree

    def open_batch(self, index: int, tree: MerkleTree):
        """Opened rows (per matrix at its own height's row) plus per-STEP
        sibling stacks (3, 8) — bridge levels carry one real sibling and
        two zero pads; injection levels need no private data (the verifier
        rehashes the injected rows itself)."""
        heights = [m.shape[0] for m in tree.matrices]
        max_h = max(heights)
        log_max = max_h.bit_length() - 1
        opened = [
            np.asarray(m[index >> (log_max - (m.shape[0].bit_length() - 1))])
            for m in tree.matrices
        ]
        siblings = []
        idx = index
        layers = tree.host_layers()
        li = 0
        zero_d = np.zeros(DIGEST_ELEMS, dtype=U32)
        for step, inject in arity4_schedule(heights):
            layer = layers[li]
            li += 1
            if step == 4:
                group = (idx >> 2) << 2
                sibs = [
                    np.asarray(layer[group + q])
                    for q in range(4)
                    if group + q != idx
                ]
                idx >>= 2
            else:
                sibs = [np.asarray(layer[idx ^ 1]), zero_d, zero_d]
                idx >>= 1
            siblings.append(np.stack(sibs))
            if inject:
                li += 1
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
        heights = [h for h, _w in dimensions]
        by_h: dict[int, list] = {}
        for (h, _w), row in zip(dimensions, opened_rows):
            by_h.setdefault(h, []).append(
                np.asarray(row, dtype=U32).reshape(1, -1)
            )

        def digest_at(h):
            return self._digest_rows(by_h[h], xp)[0]

        node = digest_at(max(heights))
        schedule = arity4_schedule(heights)
        if len(siblings) != len(schedule):
            return False
        idx = index
        for (step, inject), sibs in zip(schedule, siblings):
            sibs = np.asarray(sibs, dtype=U32).reshape(-1, DIGEST_ELEMS)
            children = np.zeros((4, DIGEST_ELEMS), dtype=U32)
            if step == 4:
                pos = idx & 3
                si = 0
                for q in range(4):
                    if q == pos:
                        children[q] = node
                    else:
                        children[q] = sibs[si]
                        si += 1
                idx >>= 2
            else:
                pos = idx & 1
                children[pos] = node
                children[1 - pos] = sibs[0]
                idx >>= 1
            node = compress4(self.params, children[None], xp)[0]
            if inject:
                children = np.zeros((4, DIGEST_ELEMS), dtype=U32)
                children[0] = node
                children[1] = digest_at(inject)
                node = compress4(self.params, children[None], xp)[0]
        return bool(np.array_equal(node, np.asarray(commitment, dtype=U32)))

"""Mixed-height Merkle commitment (MMCS) with Poseidon2, batched on-chip.

TPU re-design of the reference's `p3-merkle-tree` MerkleTreeMmcs (used via
openvm-stark-backend for trace/quotient commitments; SURVEY.md §2.2): every
tree level is ONE batched compress over an (s, 8) digest matrix, leaf layers
are batched row sponges. No host round-trips during commit; the digest layers
stay on device and only the paths needed for openings are pulled to host.

Scheme (self-consistent; documented divergence from p3: rows are committed in
natural domain order, so FRI sibling points (x, -x) open two paths):

  - matrices: list of (h_i, w_i) uint32 (Montgomery) with h_i a power of two,
    h_max = max h_i.
  - leaf level (size h_max): D = hash_rows(concat of all height-h_max rows).
  - going from size 2s to s: D'[i] = compress(D[2i], D[2i+1]); if matrices of
    height s exist, D'[i] <- compress(D'[i], hash_rows(their rows)[i]).
  - root = the single digest at size 1.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence

import numpy as np
import jax.numpy as jnp

from ..ops import poseidon2 as p2

DIGEST = p2.DIGEST


@dataclass
class MerkleTree:
    """Device-resident commitment: per-level digest arrays, tallest first.

    levels[0] has shape (h_max, 8); levels[-1] is (1, 8) (the root).
    matrices are retained (device) for row openings.
    """

    matrices: List[jnp.ndarray]
    levels: List[jnp.ndarray]

    @property
    def root(self) -> jnp.ndarray:
        return self.levels[-1][0]

    def root_np(self) -> np.ndarray:
        return np.asarray(self.root)


def _rows_digest(mats: Sequence[jnp.ndarray]) -> jnp.ndarray:
    if all(isinstance(m, np.ndarray) for m in mats):
        cat = mats[0] if len(mats) == 1 else np.concatenate(mats, axis=1)
        return p2.hash_rows_np(np.ascontiguousarray(cat))
    cat = mats[0] if len(mats) == 1 else jnp.concatenate(mats, axis=1)
    return p2.hash_rows(cat)


# NOT jitted as a whole: each hash_rows/compress call dispatches the shared
# per-shape jitted kernels, so tree compiles are amortized across all trees
# with the same level sizes (FRI builds log(m) trees of descending heights).
def _commit_levels(matrices):
    by_height = {}
    for m in matrices:
        by_height.setdefault(int(m.shape[0]), []).append(m)
    h_max = max(by_height)

    levels = []
    d = _rows_digest(by_height[h_max])
    is_np = isinstance(d, np.ndarray)
    compress = p2.compress_np if is_np else p2.compress
    levels.append(d)
    s = h_max
    while s > 1:
        s //= 2
        pairs = d.reshape(s, 2, DIGEST)
        d = compress(pairs[:, 0], pairs[:, 1])
        if s in by_height:
            d = compress(d, _rows_digest(by_height[s]))
        levels.append(d)
    return levels


def commit(matrices: Sequence[jnp.ndarray]) -> MerkleTree:
    for m in matrices:
        h = int(m.shape[0])
        assert h & (h - 1) == 0, "matrix heights must be powers of two"
    levels = _commit_levels(list(matrices))
    return MerkleTree(matrices=list(matrices), levels=levels)


@dataclass
class Opening:
    """Host-side opening for one leaf index: per-matrix rows + digest path."""

    index: int
    rows: List[np.ndarray]          # canonical order as passed to commit
    siblings: List[np.ndarray]      # sibling digest per level, bottom-up


def open_index(tree: MerkleTree, index: int) -> Opening:
    h_max = int(tree.levels[0].shape[0])
    rows = []
    for m in tree.matrices:
        h = int(m.shape[0])
        shift = (h_max // h).bit_length() - 1
        rows.append(np.asarray(m[index >> shift]))
    siblings = []
    idx = index
    # levels[k] has size h_max >> k; sibling of node idx at level k is idx^1
    for k in range(len(tree.levels) - 1):
        level = tree.levels[k]
        siblings.append(np.asarray(level[idx ^ 1]))
        idx >>= 1
    return Opening(index=index, rows=rows, siblings=siblings)


def verify_opening(
    root: np.ndarray,
    opening: Opening,
    heights: Sequence[int],
) -> bool:
    """Recompute the path from the opened rows. heights = matrix heights in
    the order rows were supplied."""
    return verify_openings(root, [opening], heights)


def verify_openings(
    root: np.ndarray,
    openings: Sequence[Opening],
    heights: Sequence[int],
) -> bool:
    """Batch-verify all openings of ONE tree (same heights, same root).

    All Q openings walk the same level structure, so every level is one
    native compress over (Q, 8) digests and every leaf layer one row
    sponge over (Q, sum_w) — instead of Q * depth single-row native calls
    (the per-call ctypes overhead dominated the 100-query verify)."""
    if not openings:
        return True
    n_sib = len(openings[0].siblings)
    if any(len(op.siblings) != n_sib or len(op.rows) != len(heights)
           for op in openings):
        return False
    by_height = {}
    for j, h in enumerate(heights):
        by_height.setdefault(int(h), []).append(
            np.stack([np.asarray(op.rows[j]) for op in openings])
        )  # (Q, w_j)
    h_max = max(by_height)
    if h_max.bit_length() - 1 != n_sib:
        return False

    def digest_of(hh):
        mats = by_height[hh]
        cat = mats[0] if len(mats) == 1 else np.concatenate(mats, axis=1)
        return p2.hash_rows_np(np.ascontiguousarray(cat, dtype=np.uint32))

    d = digest_of(h_max)                                     # (Q, 8)
    idx = np.asarray([op.index for op in openings], dtype=np.int64)
    if ((idx < 0) | (idx >= h_max)).any():
        return False
    s = h_max
    k = 0
    while s > 1:
        sib = np.stack(
            [np.asarray(op.siblings[k], dtype=np.uint32) for op in openings]
        )
        left_is_d = (idx % 2 == 0)[:, None]
        left = np.where(left_is_d, d, sib)
        right = np.where(left_is_d, sib, d)
        d = p2.compress_np(left, right)
        idx >>= 1
        s //= 2
        k += 1
        if s in by_height:
            d = p2.compress_np(d, digest_of(s))
    return bool((d == np.asarray(root)[None, :]).all())

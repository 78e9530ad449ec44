"""Row-sharded Poseidon2 Merkle commit: leaves hashed locally on each device,
per-device subtree roots all_gathered, top of the tree finished replicated.

The root is bit-identical to the single-device `stark.merkle.commit` because
contiguous row shards align with complete subtrees (power-of-two sizes).
This is the commitment half of SURVEY.md §7 Phase 2 ("Poseidon2 Merkle tree
with leaves sharded + all_gather of top layers").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import poseidon2 as p2


def commit_root_sharded(matrix, mesh: Mesh, axis_name: str = "shard"):
    """Merkle root of a single (h, w) matrix with rows sharded over the mesh.

    Returns the (8,) root digest (replicated). Equals
    merkle.commit([matrix]).root.
    """
    h = int(matrix.shape[0])
    d = mesh.shape[axis_name]
    assert h % d == 0 and (h // d) & (h // d - 1) == 0

    def local(block):
        # block: (h/d, w) — hash rows, fold local subtree to one digest
        dig = p2.hash_rows(block)
        s = dig.shape[0]
        while s > 1:
            pairs = dig.reshape(s // 2, 2, p2.DIGEST)
            dig = p2.compress(pairs[:, 0], pairs[:, 1])
            s //= 2
        # gather all device-level roots (d, 8), finish the top replicated
        tops = jax.lax.all_gather(dig[0], axis_name)  # (d, 8)
        s = tops.shape[0]
        while s > 1:
            pairs = tops.reshape(s // 2, 2, p2.DIGEST)
            tops = p2.compress(pairs[:, 0], pairs[:, 1])
            s //= 2
        return tops[0]

    f = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=P(axis_name, None),
        out_specs=P(),
        check_vma=False,  # all_gather makes the output replicated
    )
    return f(matrix)

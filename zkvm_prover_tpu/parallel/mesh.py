"""Device-mesh helpers for pod-sharded proving.

The reference is single-process/single-GPU (SURVEY.md §2.3 "Distributed
communication backend: none in reference"); this module is the TPU-native
scale-out the reference lacks. Axis conventions (SURVEY.md §2.3 mapping):

  "data"  — independent work: segments / chunks / sibling proofs (DP axis)
  "shard" — one large object sharded: NTT rows, MSM buckets (TP/SP axis)
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_shard: int | None = None, n_data: int = 1) -> Mesh:
    devs = jax.devices()
    n_shard = n_shard or (len(devs) // n_data)
    assert n_shard * n_data <= len(devs)
    arr = np.array(devs[: n_shard * n_data]).reshape(n_data, n_shard)
    return Mesh(arr, ("data", "shard"))


def shard_cols(mesh: Mesh, x):
    """Shard trailing (column) axis over the 'shard' axis."""
    return jax.device_put(x, NamedSharding(mesh, P(None, "shard")))


def shard_rows(mesh: Mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P("shard")))

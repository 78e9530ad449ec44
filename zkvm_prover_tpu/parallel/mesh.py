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


def initialize_multihost(coordinator: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> None:
    """Join a multi-host pod (jax.distributed) — call once per host before
    any jax use. On single-host runs (tests, one chip) this is a no-op.

    The DCN/ICI split then falls out of make_pod_mesh: devices of one host
    are contiguous in jax.devices(), so the 'data' axis (independent
    proofs/segments) crosses hosts over DCN while the 'shard' axis (one
    sharded NTT/MSM) stays inside a host's ICI domain — the layout rule of
    SURVEY.md §2.3 ("lay out shardings so collectives ride ICI, not DCN").
    """
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_pod_mesh() -> Mesh:
    """Pod mesh: 'data' over hosts (DCN), 'shard' over each host's local
    chips (ICI). Works identically on a single host (data axis = 1)."""
    devs = jax.devices()
    n_local = jax.local_device_count()
    n_hosts = max(1, len(devs) // n_local)
    arr = np.array(devs[: n_hosts * n_local]).reshape(n_hosts, n_local)
    return Mesh(arr, ("data", "shard"))


def shard_cols(mesh: Mesh, x):
    """Shard trailing (column) axis over the 'shard' axis."""
    return jax.device_put(x, NamedSharding(mesh, P(None, "shard")))


def shard_rows(mesh: Mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P("shard")))

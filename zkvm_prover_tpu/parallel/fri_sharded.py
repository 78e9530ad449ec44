"""Sharded FRI fold — the commit-phase hot loop under shard_map.

One fold pairs row i (first half) with row i + m/2: with the codeword
row-sharded contiguously over D devices, the pair partners live on
device d and d + D/2. Each fold output block o needs half a block from
lo-device o//2 and half a block from hi-device D/2 + o//2, so the fold
runs as FOUR `ppermute`s (lo/hi x even/odd-output halves) + a purely
local combine — all traffic rides the ICI ring, no all_gather.

Bit-identical to stark.fri.fold_round (tests/test_sharded.py)."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fields import babybear as bb, ext4
from ..stark.fri import _inv_denoms


def _fold_local(lo, hi, inv_d, beta):
    inv2 = jnp.uint32(bb.to_monty_int(pow(2, bb.P - 2, bb.P)))
    s = bb.add(lo, hi)
    d = bb.sub(lo, hi)
    g = bb.mul(s, inv2)
    h = bb.mul(d, inv_d[:, None])
    return bb.add(g, ext4.mul(jnp.broadcast_to(beta, h.shape), h))


def fold_round_sharded(codeword, log_m: int, shift_int: int, beta,
                       mesh: Mesh, axis_name: str = "shard"):
    """codeword: (m, 4) sharded over rows on `axis_name`; returns the
    folded (m/2, 4) codeword, row-sharded over the same axis."""
    D = mesh.shape[axis_name]
    m = 1 << log_m
    assert m % (2 * D) == 0, "need >= 2 rows per device"
    piece = m // (2 * D)          # rows each output device receives per side

    inv_d_full = _inv_denoms(log_m, shift_int % bb.P)   # (m/2,)
    inv_sharded = jax.device_put(
        jnp.asarray(inv_d_full),
        NamedSharding(mesh, P(axis_name)),
    )
    beta = jnp.asarray(beta, dtype=jnp.uint32)

    lo_half = D // 2

    def body(block, inv_local, beta_):
        # block: (m/D, 4) local rows; split into the two output pieces
        b0 = block[:piece]
        b1 = block[piece:]
        # four routed copies (absent (src,dst) pairs deliver zeros)
        perm_a = [(ls, 2 * ls) for ls in range(lo_half)]
        perm_b = [(ls, 2 * ls + 1) for ls in range(lo_half)]
        perm_c = [(lo_half + hs, 2 * hs) for hs in range(lo_half)]
        perm_d = [(lo_half + hs, 2 * hs + 1) for hs in range(lo_half)]
        ra = jax.lax.ppermute(b0, axis_name, perm_a)
        rb = jax.lax.ppermute(b1, axis_name, perm_b)
        rc = jax.lax.ppermute(b0, axis_name, perm_c)
        rd = jax.lax.ppermute(b1, axis_name, perm_d)
        lo = ra + rb   # exactly one is nonzero per device
        hi = rc + rd
        return _fold_local(lo, hi, inv_local, beta_)

    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    folded = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis_name, None), P(axis_name), P()),
        out_specs=P(axis_name, None),
    )(codeword, inv_sharded, beta)
    return folded

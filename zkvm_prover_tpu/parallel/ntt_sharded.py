"""Pod-sharded NTT: four-step decomposition with one `all_to_all` re-shard.

This is the "sequence-parallel" axis of the build (SURVEY.md §2.3, §5
long-context analog): a single 2^24+-point BabyBear NTT laid out as an
(n1, n2) matrix, columns sharded across the mesh:

  step A: DIF NTTs of length n1 along axis 0 — local (stride never crosses
          the shard boundary because the shard axis is axis 1)
  step B: twiddle multiply — local, table host-precomputed in the
          bit-reversed row order produced by step A
  step C: all_to_all: reshard from column-sharded to row-sharded (the
          butterfly-stage exchange riding ICI)
  step D: DIF NTTs of length n2 along axis 1 — local

Output equals the single-chip `ntt_natural_to_rev` bit for bit: with
i = i2 + n2*i1 and k = k1 + n1*k2, the (bitrev(k1), bitrev(k2))-ordered
result matrix flattened row-major is exactly the bit-reversed-order NTT
(tested in tests/test_sharded.py).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fields import babybear as bb
from ..ops import ntt as ntt_mod


@functools.lru_cache(maxsize=None)
def _mid_twiddles(log_n1: int, log_n2: int):
    """T[r1, i2] = w_n^(bitrev_{n1}(r1) * i2), Montgomery, numpy (n1, n2)."""
    n1, n2 = 1 << log_n1, 1 << log_n2
    n = n1 * n2
    w = bb.two_adic_generator_int(log_n1 + log_n2)
    rev = ntt_mod._bitrev_perm(log_n1)
    out = np.empty((n1, n2), dtype=np.uint32)
    for r1 in range(n1):
        k1 = int(rev[r1])
        base = pow(w, k1, bb.P)
        row = bb.powers_int(base, n2)
        out[r1] = np.array(
            [bb.to_monty_int(int(v)) for v in row], dtype=np.uint32
        )
    return out


def _dif_axis0(x, log_n: int):
    return ntt_mod._dif(x, log_n, inverse=False)


def ntt_natural_to_rev_sharded(x, mesh: Mesh, axis_name: str = "shard"):
    """Sharded forward NTT, natural input -> bit-reversed output.

    x: (n, *rest) global array (replicated or arbitrarily sharded input; the
    result is sharded along axis 0). n is split n = n1*n2 with n2 divisible
    by the mesh axis size.
    """
    n = int(x.shape[0])
    log_n = n.bit_length() - 1
    log_n1 = log_n // 2
    log_n2 = log_n - log_n1
    n1, n2 = 1 << log_n1, 1 << log_n2
    rest = x.shape[1:]
    d = mesh.shape[axis_name]
    assert n2 % d == 0, f"n2={n2} must be divisible by mesh axis {d}"

    m = x.reshape((n1, n2) + rest)
    tw = jnp.asarray(_mid_twiddles(log_n1, log_n2)).reshape(
        (n1, n2) + (1,) * len(rest)
    )

    def local(block, tw_block):
        # block: (n1, n2/d, *rest) — column shard
        a = _dif_axis0(block, log_n1)
        b = bb.mul(a, tw_block)
        # reshard: split axis 0 into d parts, concatenate along axis 1
        c = jax.lax.all_to_all(
            b, axis_name, split_axis=0, concat_axis=1, tiled=True
        )
        # c: (n1/d, n2, *rest) — row shard; NTT along axis 1
        c_t = jnp.moveaxis(c, 1, 0)  # (n2, n1/d, *rest)
        e = _dif_axis0(c_t, log_n2)
        return jnp.moveaxis(e, 0, 1)  # (n1/d, n2, *rest)

    spec_in = P(*([None, axis_name] + [None] * len(rest)))
    spec_out = P(*([axis_name, None] + [None] * len(rest)))
    f = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(spec_in, spec_in),
        out_specs=spec_out,
    )
    out = f(m, tw)
    return out.reshape((n,) + rest)

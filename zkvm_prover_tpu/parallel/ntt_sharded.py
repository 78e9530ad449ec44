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


# four-step mid table shared with the single-device path
_mid_twiddles = ntt_mod._mid_twiddles


def _dif_axis0(x, log_n: int, inverse: bool = False):
    return ntt_mod._dif(x, log_n, inverse=inverse)


def _dit_axis0(x, log_n: int, inverse: bool = False):
    return ntt_mod._dit(x, log_n, inverse=inverse)


def _four_step_nat_to_rev(x, mesh: Mesh, axis_name: str, inverse: bool):
    n = int(x.shape[0])
    log_n = n.bit_length() - 1
    log_n1 = log_n // 2
    log_n2 = log_n - log_n1
    n1, n2 = 1 << log_n1, 1 << log_n2
    rest = x.shape[1:]
    d = mesh.shape[axis_name]
    assert n2 % d == 0, f"n2={n2} must be divisible by mesh axis {d}"

    m = x.reshape((n1, n2) + rest)
    tw = jnp.asarray(_mid_twiddles(log_n1, log_n2, inverse)).reshape(
        (n1, n2) + (1,) * len(rest)
    )

    def local(block, tw_block):
        # block: (n1, n2/d, *rest) — column shard
        a = _dif_axis0(block, log_n1, inverse)
        b = bb.mul(a, tw_block)
        # reshard: split axis 0 into d parts, concatenate along axis 1
        c = jax.lax.all_to_all(
            b, axis_name, split_axis=0, concat_axis=1, tiled=True
        )
        # c: (n1/d, n2, *rest) — row shard; NTT along axis 1
        c_t = jnp.moveaxis(c, 1, 0)  # (n2, n1/d, *rest)
        e = _dif_axis0(c_t, log_n2, inverse)
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


def ntt_natural_to_rev_four_step_local(x):
    """Single-device four-step NTT, bit-identical to `ntt_natural_to_rev`
    (the d=1 specialization of the sharded path: the all_to_all reshard
    degenerates to the local transpose).

    Exists for XLA COMPILE time at pod scales: a 2^22-point radix-2 NTT
    unrolls 22 butterfly stages (~6.5 min to compile through the axon
    tunnel), while the four-step form compiles two 11-stage halves in a
    few seconds — same steady-state throughput."""
    n = int(x.shape[0])
    log_n = n.bit_length() - 1
    log_n1 = log_n // 2
    log_n2 = log_n - log_n1
    rest = x.shape[1:]
    m = x.reshape((1 << log_n1, 1 << log_n2) + rest)
    tw = jnp.asarray(_mid_twiddles(log_n1, log_n2, False)).reshape(
        (1 << log_n1, 1 << log_n2) + (1,) * len(rest)
    )
    a = _dif_axis0(m, log_n1)
    b = bb.mul(a, tw)
    c_t = jnp.moveaxis(b, 1, 0)
    e = _dif_axis0(c_t, log_n2)
    return jnp.moveaxis(e, 0, 1).reshape((n,) + rest)


def ntt_natural_to_rev_sharded(x, mesh: Mesh, axis_name: str = "shard"):
    """Sharded forward NTT, natural input -> bit-reversed output.

    x: (n, *rest) global array (replicated or arbitrarily sharded input; the
    result is sharded along axis 0). n is split n = n1*n2 with n2 divisible
    by the mesh axis size.
    """
    return _four_step_nat_to_rev(x, mesh, axis_name, inverse=False)


def intt_natural_to_rev_sharded(x, mesh: Mesh, axis_name: str = "shard"):
    """Sharded inverse NTT: natural-order evals -> bit-reversed coeffs
    (sharded analog of ops.ntt.intt_natural_to_rev, bit-identical)."""
    n = int(x.shape[0])
    log_n = n.bit_length() - 1
    out = _four_step_nat_to_rev(x, mesh, axis_name, inverse=True)
    return bb.mul(out, ntt_mod._n_inv_monty(log_n))


def ntt_rev_to_natural_sharded(x, mesh: Mesh, axis_name: str = "shard"):
    """Sharded forward NTT, bit-reversed input -> natural output.

    The mirror four-step: with k = k1 + n1*k2 and r = bitrev(k) =
    rev(k2) + n2*rev(k1), the input reshaped (n1, n2) has element
    (r1, r2) = c[rev(r1) + n1*rev(r2)]; per-row DITs recover the inner
    transform over k2, the SAME mid-twiddle table applies (its row index
    r1 already encodes bitrev(k1)), one all_to_all reshards, and per-column
    DITs over k1 produce the natural-order result (i1, i2) -> i2 + n2*i1.
    """
    n = int(x.shape[0])
    log_n = n.bit_length() - 1
    log_n1 = log_n // 2
    log_n2 = log_n - log_n1
    n1, n2 = 1 << log_n1, 1 << log_n2
    rest = x.shape[1:]
    d = mesh.shape[axis_name]
    assert n1 % d == 0, f"n1={n1} must be divisible by mesh axis {d}"

    m = x.reshape((n1, n2) + rest)
    tw = jnp.asarray(_mid_twiddles(log_n1, log_n2, False)).reshape(
        (n1, n2) + (1,) * len(rest)
    )

    def local(block, tw_block):
        # block: (n1/d, n2, *rest) — row shard
        c_t = jnp.moveaxis(block, 1, 0)          # (n2, n1/d, *rest)
        e = _dit_axis0(c_t, log_n2)              # inner NTT over k2 -> i2
        e = jnp.moveaxis(e, 0, 1)                # (n1/d, n2, *rest)
        f_ = bb.mul(e, tw_block)
        g = jax.lax.all_to_all(
            f_, axis_name, split_axis=1, concat_axis=0, tiled=True
        )                                        # (n1, n2/d, *rest)
        return _dit_axis0(g, log_n1)             # outer NTT over k1 -> i1

    spec_in = P(*([axis_name, None] + [None] * len(rest)))
    spec_out = P(*([None, axis_name] + [None] * len(rest)))
    f = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(spec_in, spec_in),
        out_specs=spec_out,
    )
    out = f(m, tw)
    return out.reshape((n,) + rest)


def interpolate_coset_rev_sharded(evals, mesh: Mesh, shift_in_int: int = 1,
                                  axis_name: str = "shard"):
    """Sharded analog of ops.ntt.interpolate_coset_rev."""
    n = int(evals.shape[0])
    log_n = n.bit_length() - 1
    c_rev = intt_natural_to_rev_sharded(evals, mesh, axis_name)
    if shift_in_int % bb.P != 1:
        s_inv = pow(shift_in_int % bb.P, bb.P - 2, bb.P)
        scale = jnp.asarray(
            ntt_mod._powers_bitrev_monty(s_inv, log_n)
        ).reshape((n,) + (1,) * (evals.ndim - 1))
        c_rev = bb.mul(c_rev, scale)
    return c_rev


def eval_coset_from_rev_sharded(c_rev, log_blowup: int, shift_int: int,
                                mesh: Mesh, axis_name: str = "shard"):
    """Sharded analog of ops.ntt.eval_coset_from_rev (bit-identical
    natural-order coset evaluations)."""
    n = int(c_rev.shape[0])
    log_n = n.bit_length() - 1
    blowup = 1 << log_blowup
    rest = c_rev.shape[1:]
    w_m_int = bb.two_adic_generator_int(log_n + log_blowup)
    cosets = []
    for r in range(blowup):
        s_r = (shift_int * pow(w_m_int, r, bb.P)) % bb.P
        scale = jnp.asarray(
            ntt_mod._powers_bitrev_monty(s_r, log_n)
        ).reshape((n,) + (1,) * len(rest))
        cosets.append(
            ntt_rev_to_natural_sharded(bb.mul(c_rev, scale), mesh, axis_name)
        )
    out = jnp.stack(cosets, axis=1)  # (n, blowup, *rest)
    return out.reshape((n * blowup,) + rest)


def coset_lde_sharded(evals, log_blowup: int, mesh: Mesh,
                      shift_int: int = bb.GENERATOR, shift_in_int: int = 1,
                      axis_name: str = "shard"):
    """Sharded low-degree extension: the full LDE hot path (interpolate +
    multi-coset evaluation) under shard_map — the round-3 completion of
    ROADMAP Phase 2 "sharded inverse NTT / LDE"."""
    c_rev = interpolate_coset_rev_sharded(evals, mesh, shift_in_int,
                                          axis_name)
    return eval_coset_from_rev_sharded(c_rev, log_blowup, shift_int, mesh,
                                       axis_name)

"""Pallas TPU kernel: fused final butterfly stages of the DIF NTT.

The jnp NTT performs log2(n) full HBM passes (one per stage). The final k
stages of a DIF (natural-order input) act within disjoint contiguous blocks
of 2^k rows, so they tile perfectly: one Pallas grid step loads a
(2^k, W) block into VMEM, applies all k stages in-register, and writes it
back — turning k HBM passes into one. (The *first* stages have global
stride and stay in XLA; the four-step/all_to_all decomposition in
parallel/ntt_sharded.py is the cross-block answer at pod scale.)

Montgomery multiply inside the kernel reuses the exact uint32 limb algebra
from fields.babybear (pure jnp — Pallas lowers it directly), so results are
bit-identical to the XLA path (tested in interpret mode on CPU).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..fields import babybear as bb
from . import ntt as ntt_mod


def _fused_stages_kernel(k: int, w_tile: int, inverse: bool):
    """Kernel applying DIF stages s=k..1 inside a (2^k, w_tile) block."""

    def kernel(x_ref, *tw_refs_and_out):
        tw_refs = tw_refs_and_out[:-1]
        out_ref = tw_refs_and_out[-1]
        x = x_ref[:]  # (2^k, w_tile)
        n_rows = 1 << k
        for s in range(k, 0, -1):
            h = 1 << (s - 1)
            tw = tw_refs[k - s][:]  # (1, h) uint32
            v = x.reshape(n_rows // (2 * h), 2, h, w_tile)
            lo = v[:, 0]
            hi = v[:, 1]
            new_lo = bb.add(lo, hi)
            new_hi = bb.mul(bb.sub(lo, hi), tw.reshape(1, h, 1))
            x = jnp.stack([new_lo, new_hi], axis=1).reshape(n_rows, w_tile)
        out_ref[:] = x

    return kernel


@functools.partial(
    jax.jit, static_argnames=("k", "inverse", "interpret")
)
def fused_final_stages(x, k: int, inverse: bool = False, interpret: bool = False):
    """Apply DIF stages s=k..1 to x (n, W) with one HBM pass.

    Equivalent to running ntt._dif's last k loop iterations.
    """
    n, w = x.shape
    n_blocks = n // (1 << k)
    tws = ntt_mod._stage_twiddles(k, inverse)  # stages 1..k; numpy
    # kernel consumes stage order k..1
    tw_inputs = [jnp.asarray(tws[s - 1]).reshape(1, -1) for s in range(k, 0, -1)]

    kernel = _fused_stages_kernel(k, w, inverse)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, w), jnp.uint32),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1 << k, w), lambda i: (i, 0)),
        ]
        + [
            pl.BlockSpec((1, 1 << (s - 1)), lambda i: (0, 0))
            for s in range(k, 0, -1)
        ],
        out_specs=pl.BlockSpec((1 << k, w), lambda i: (i, 0)),
        interpret=interpret,
    )(x, *tw_inputs)


def dif_fused(x, log_n: int, inverse: bool, k: int = 9, interpret: bool = False):
    """Full DIF using XLA stages for strides crossing the 2^k block size and
    the fused Pallas kernel for the final k stages."""
    n = x.shape[0]
    k = min(k, log_n)
    w_all = ntt_mod._stage_twiddles(log_n, inverse)
    rest = x.shape[1:]
    for s in range(log_n, k, -1):
        h = 1 << (s - 1)
        tw = w_all[s - 1].reshape((1, h) + (1,) * len(rest))
        v = x.reshape((n // (2 * h), 2, h) + rest)
        lo = v[:, 0]
        hi = v[:, 1]
        new_lo = bb.add(lo, hi)
        new_hi = bb.mul(bb.sub(lo, hi), tw)
        x = jnp.stack([new_lo, new_hi], axis=1).reshape((n,) + rest)
    return fused_final_stages(x, k, inverse, interpret=interpret)

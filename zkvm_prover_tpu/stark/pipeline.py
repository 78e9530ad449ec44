"""Fully-jittable device core of the STARK prover.

`prover_core` is the transcript-free part of `stark.prover.prove` — the
compute between Fiat-Shamir interactions, fused into one XLA program:

    trace -> interpolate -> coset LDE -> Merkle levels (trace)
          -> fused constraint eval -> quotient -> chunk split/re-extension
          -> Merkle levels (quotient) -> DEEP combination -> first FRI fold

It is the "forward step" of the framework's flagship model (the chunk-proof
pipeline of SURVEY.md §3.2) and the unit the driver compile-checks.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import babybear as bb
from ..fields import ext4
from ..models.air import Air, LdeBuilder, LOG_QUOTIENT_DEGREE
from ..ops import ntt
from . import domain, fri
from .prover import _deep_combine, _fold_constraints_ext
from ..ops import poseidon2 as p2


def _merkle_root_inline(matrix):
    """Merkle root computed inline (jit-friendly; no host tree object)."""
    d = p2.hash_rows(matrix)
    s = d.shape[0]
    while s > 1:
        pairs = d.reshape(s // 2, 2, p2.DIGEST)
        d = p2.compress(pairs[:, 0], pairs[:, 1])
        s //= 2
    return d[0]


def make_prover_core(air: Air, log_n: int, config=None):
    """Build a jitted core for a fixed AIR and trace height."""
    from .config import StarkConfig

    config = config or StarkConfig()
    log_blowup = config.log_blowup
    g = config.coset_shift % bb.P
    w_m_int = bb.two_adic_generator_int(log_n + log_blowup)
    n_chunks = 1 << LOG_QUOTIENT_DEGREE

    sels = domain.selectors_on_coset(log_n, log_blowup, g)

    @jax.jit
    def core(trace_m, pvs_m, alpha, zeta, gamma):
        c_rev = ntt.interpolate_coset_rev(trace_m, 1)
        trace_lde = ntt.eval_coset_from_rev(c_rev, log_blowup, g)
        trace_root = _merkle_root_inline(trace_lde)

        builder = LdeBuilder(trace_lde, 1 << log_blowup, sels, pvs_m)
        air.eval(builder)
        cons = jnp.stack(builder.constraints, axis=0)
        alpha_pows = ext4.powers(alpha, cons.shape[0])
        c_folded = _fold_constraints_ext(cons, alpha_pows)
        q = bb.mul(c_folded, sels["inv_zh"][:, None])

        chunk_ldes = []
        chunk_crevs = []
        for r in range(n_chunks):
            s_r = (g * pow(w_m_int, r, bb.P)) % bb.P
            cr = ntt.interpolate_coset_rev(q[r::n_chunks], s_r)
            chunk_crevs.append(cr)
            chunk_ldes.append(ntt.eval_coset_from_rev(cr, log_blowup, g))
        chunk_lde = jnp.concatenate(chunk_ldes, axis=1)
        q_root = _merkle_root_inline(chunk_lde)

        g_h = bb.two_adic_generator_int(log_n)
        zeta_next = ext4.mul_base(zeta, np.uint32(bb.to_monty_int(g_h)))
        t_at_z = ntt.eval_poly_at_point_ext(c_rev, zeta)
        t_at_zn = ntt.eval_poly_at_point_ext(c_rev, zeta_next)
        q_at_z = jnp.concatenate(
            [ntt.eval_poly_at_point_ext(cr, zeta) for cr in chunk_crevs],
            axis=0,
        )
        codeword = _deep_combine(
            trace_lde, chunk_lde, sels["x"], zeta, zeta_next,
            t_at_z, t_at_zn, q_at_z, gamma,
        )
        folded = fri.fold_round(codeword, log_n + log_blowup, g, zeta)
        return trace_root, q_root, codeword, folded

    return core

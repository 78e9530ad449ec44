"""Fully sharded STARK prover core: the whole `stark.pipeline` device
pipeline (interpolate -> coset LDE -> Merkle commit -> fused constraint
eval -> quotient chunks -> OOD openings -> DEEP combination -> first FRI
fold) running over a `jax.sharding.Mesh`, bit-identical to the
single-device `make_prover_core`.

This is the integration layer over the sharded kernels (SURVEY.md §2.3
"distributed comm backend"; the reference scales by running independent
proofs per GPU, so a sequence-sharded single proof is where the TPU
design diverges deliberately — ICI all_to_all / ppermute / all_gather
replace the reference's per-device independence):

  - NTT/iNTT/LDE: four-step transforms with one all_to_all
    (parallel/ntt_sharded.py)
  - Merkle commit: leaves hashed locally, subtree tops all_gathered
    (parallel/merkle_sharded.py)
  - constraint eval / quotient: row-sharded with a `blowup`-row halo
    exchanged via ppermute (the AIR's next-row rotation)
  - out-of-domain opening: per-shard bit-reversed power ladders; the
    shard's base offset z^bitrev(shard) folds in via one all_gather of
    the (W, 4) partial sums
  - DEEP combination: elementwise over rows, auto-sharded by XLA
  - FRI fold: ppermute halo exchange (parallel/fri_sharded.py)
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fields import babybear as bb
from ..fields import ext4
from ..models.air import Air, LdeBuilder, LOG_QUOTIENT_DEGREE
from ..ops import ntt
from ..stark import domain, fri
from ..stark.prover import _deep_combine, _fold_constraints_ext
from .fri_sharded import fold_round_sharded
from .merkle_sharded import commit_root_sharded
from .ntt_sharded import (
    eval_coset_from_rev_sharded,
    interpolate_coset_rev_sharded,
)


def _bitrev_power_ladder(z, levels: int):
    """(2^levels, 4) table t[j] = z^bitrev_levels(j) (ext Montgomery)."""
    pw = ext4.one((1,), xp=jnp)
    zp = jnp.asarray(z, dtype=jnp.uint32)
    for _ in range(levels):
        hi = ext4.mul(pw, jnp.broadcast_to(zp, pw.shape))
        pw = jnp.stack([pw, hi], axis=1).reshape(-1, 4)
        zp = ext4.mul(zp, zp)
    return pw


def eval_poly_at_point_ext_sharded(coeffs_rev, point_ext, mesh: Mesh,
                                   axis_name: str = "shard"):
    """Sharded analog of ops.ntt.eval_poly_at_point_ext.

    coeffs_rev: (n, W) bit-reversed base-field coeffs, rows sharded.
    Exploits bitrev(j) = bitrev_k(t)*D + bitrev_d(s) for j = s*(n/D) + t:
    each shard builds the local ladder of (z^D)^bitrev_k(t), scales by
    z^bitrev_d(s), partial-sums, and one all_gather finishes the sum.
    """
    n = int(coeffs_rev.shape[0])
    log_n = n.bit_length() - 1
    D = mesh.shape[axis_name]
    d = D.bit_length() - 1
    log_k = log_n - d
    def local(c_local, z):
        zd = z
        for _ in range(d):
            zd = ext4.mul(zd, zd)                     # z^(2^d) = z^D
        pw = _bitrev_power_ladder(zd, log_k)          # (k, 4)
        tbl = _bitrev_power_ladder(z, d)              # (D, 4): z^bitrev_d(s)
        s = jax.lax.axis_index(axis_name)
        zs = jnp.take(tbl, s, axis=0)                 # (4,)
        pw = ext4.mul(pw, jnp.broadcast_to(zs, pw.shape))
        terms = bb.mul(c_local[..., None], pw[:, None, :])  # (k, W, 4)
        part = ntt._field_sum(terms, axis=0)          # (W, 4)
        parts = jax.lax.all_gather(part, axis_name)   # (D, W, 4)
        return ntt._field_sum(parts, axis=0)

    f = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis_name, None), P()),
        out_specs=P(),
        check_vma=False,  # all_gather makes the output replicated
    )
    return f(coeffs_rev, jnp.asarray(point_ext, dtype=jnp.uint32))


class _ShardBuilder(LdeBuilder):
    """LdeBuilder over a local row block with an explicit next-row view
    (the halo-extended shift replaces the global roll)."""

    def __init__(self, lde_local, next_local, sels_local, public_values):
        self._lde = lde_local
        self._next = next_local
        self._pre = None
        self._pre_next = None
        self._sels = sels_local
        self._pvs = public_values
        self._constraints = []
        self._interactions = []

    def preprocessed(self, col):  # pragma: no cover - guard
        raise NotImplementedError(
            "make_prover_core_sharded does not yet plumb a halo-extended "
            "preprocessed LDE; AIRs with preprocessed columns (program "
            "ROM, range tables) must use the single-device core"
        )

    def preprocessed_next(self, col):  # pragma: no cover - guard
        self.preprocessed(col)


def quotient_sharded(air: Air, trace_lde, sels, pvs_m, alpha, mesh: Mesh,
                     log_blowup: int, axis_name: str = "shard"):
    """Fused constraint eval + quotient with rows sharded.

    The AIR's next-row view is a global roll by `blowup`; each shard
    ppermutes its first `blowup` rows to the previous shard (cyclically,
    matching the roll's wrap-around) as a halo.
    """
    blowup = 1 << log_blowup
    D = mesh.shape[axis_name]
    perm = [(s, (s - 1) % D) for s in range(D)]

    def local(block, s_first, s_last, s_trans, s_inv_zh, pvs, alpha_):
        halo = jax.lax.ppermute(block[:blowup], axis_name, perm)
        nxt = jnp.concatenate([block[blowup:], halo], axis=0)
        sels_local = {"first": s_first, "last": s_last,
                      "transition": s_trans}
        builder = _ShardBuilder(block, nxt, sels_local, pvs)
        air.eval(builder)
        cons = jnp.stack(builder.constraints, axis=0)
        alpha_pows = ext4.powers(alpha_, cons.shape[0])
        c_folded = _fold_constraints_ext(cons, alpha_pows)
        return bb.mul(c_folded, s_inv_zh[:, None])

    f = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis_name, None), P(axis_name), P(axis_name),
                  P(axis_name), P(axis_name), P(), P()),
        out_specs=P(axis_name, None),
        check_vma=False,  # ppermute halo + replicated pvs/alpha operands
    )
    return f(trace_lde, sels["first"], sels["last"], sels["transition"],
             sels["inv_zh"], pvs_m, jnp.asarray(alpha, dtype=jnp.uint32))


def make_prover_core_sharded(air: Air, log_n: int, config, mesh: Mesh,
                             axis_name: str = "shard"):
    """Sharded analog of stark.pipeline.make_prover_core: same signature,
    same (trace_root, quotient_root, codeword, folded) outputs, bit-
    identical values — every heavy stage sharded over `axis_name`."""
    from ..stark.config import StarkConfig

    config = config or StarkConfig()
    log_blowup = config.log_blowup
    g = config.coset_shift % bb.P
    w_m_int = bb.two_adic_generator_int(log_n + log_blowup)
    n_chunks = 1 << LOG_QUOTIENT_DEGREE

    sels_np = domain.selectors_on_coset(log_n, log_blowup, g)
    shard = NamedSharding(mesh, P(axis_name))
    sels = {k: jax.device_put(jnp.asarray(np.asarray(v)), shard)
            for k, v in sels_np.items()}

    @jax.jit
    def core(trace_m, pvs_m, alpha, zeta, gamma):
        c_rev = interpolate_coset_rev_sharded(trace_m, mesh, 1, axis_name)
        trace_lde = eval_coset_from_rev_sharded(c_rev, log_blowup, g, mesh,
                                                axis_name)
        trace_root = commit_root_sharded(trace_lde, mesh, axis_name)

        q = quotient_sharded(air, trace_lde, sels, pvs_m, alpha, mesh,
                             log_blowup, axis_name)

        chunk_ldes = []
        chunk_crevs = []
        for r in range(n_chunks):
            s_r = (g * pow(w_m_int, r, bb.P)) % bb.P
            cr = interpolate_coset_rev_sharded(q[r::n_chunks], mesh, s_r,
                                               axis_name)
            chunk_crevs.append(cr)
            chunk_ldes.append(
                eval_coset_from_rev_sharded(cr, log_blowup, g, mesh,
                                            axis_name))
        chunk_lde = jnp.concatenate(chunk_ldes, axis=1)
        q_root = commit_root_sharded(chunk_lde, mesh, axis_name)

        g_h = bb.two_adic_generator_int(log_n)
        zeta_next = ext4.mul_base(zeta, np.uint32(bb.to_monty_int(g_h)))
        t_at_z = eval_poly_at_point_ext_sharded(c_rev, zeta, mesh,
                                                axis_name)
        t_at_zn = eval_poly_at_point_ext_sharded(c_rev, zeta_next, mesh,
                                                 axis_name)
        q_at_z = jnp.concatenate(
            [eval_poly_at_point_ext_sharded(cr, zeta, mesh, axis_name)
             for cr in chunk_crevs],
            axis=0,
        )
        codeword = _deep_combine(
            trace_lde, chunk_lde, sels["x"], zeta, zeta_next,
            t_at_z, t_at_zn, q_at_z, gamma,
        )
        folded = fold_round_sharded(codeword, log_n + log_blowup, g, zeta,
                                    mesh, axis_name)
        return trace_root, q_root, codeword, folded

    return core

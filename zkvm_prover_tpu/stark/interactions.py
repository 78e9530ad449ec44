"""logUp permutation argument: cross-AIR bus interactions.

The TPU re-design of openvm-stark-backend's interaction system (the lookup
glue between the 42 chunk AIRs; SURVEY.md §2.2, §7 Phase 4 "lookup/permutation
arguments"). Per AIR with k interactions, the permutation trace has k ext
columns c_j = signed_mult_j / (z - fp_j) plus one running-sum column S
(stored as 4 base columns each), with

  fp_j  = bus_j + sum_k beta^(k+1) * field_{j,k}
  sign  = +1 for sends, -1 for receives

Constraints (all extension-valued, degree <= main_degree + 1):
  c_j * (z - fp_j) - signed_mult_j               (every row)
  first:      S - sum_j c_j
  transition: S_next - S - sum_j c_j_next
  last:       S - claimed_sum

Soundness: sum of claimed_sums over all AIRs must be 0 (verifier check) —
matched send/receive pairs cancel in the log-derivative sum.

All prover-side work is vectorized: fingerprints and multiplicities come out
of a TraceBuilder pass, the k inversions are one batched ext inversion, and
the running sum is a `jax.lax.associative_scan` (parallel prefix sum).
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import babybear as bb
from ..fields import ext4
from ..models.air import Interaction

PERM_COLS_PER_INTERACTION = 4  # ext coords as base columns


def _as_ext(x, point_mode: bool):
    """Base builder values -> ext. The mode must be EXPLICIT: a height-4
    base column has shape (4,) and would be misread as one ext element by
    shape sniffing."""
    xp = bb._mod(x)
    x = xp.asarray(x, dtype=xp.uint32)
    if point_mode:
        return x if x.ndim >= 1 else ext4.from_base(x)
    return ext4.from_base(x)


def _mul_sel(c_ext, sel):
    """Multiply ext constraint by a selector (base array in LDE mode, ext
    value in point mode)."""
    xp = bb._mod(c_ext, sel)
    sel = xp.asarray(sel, dtype=xp.uint32)
    if sel.ndim >= 1 and sel.shape[-1] == 4 and sel.ndim == c_ext.ndim:
        return ext4.mul(c_ext, sel)
    return bb.mul(c_ext, sel[..., None])


def fingerprint(inter: Interaction, z, beta, point_mode: bool = False):
    """fp = bus + sum_k beta^(k+1) * field_k, broadcast over rows."""
    xp = bb._mod(beta, *inter.fields)
    bus_m = np.zeros(4, dtype=np.uint32)
    bus_m[0] = bb.to_monty_int(inter.bus)
    acc = xp.asarray(bus_m)
    beta_x = xp.asarray(beta, dtype=xp.uint32)
    bpow = beta_x
    for f in inter.fields:
        f_arr = xp.asarray(f, dtype=xp.uint32)
        if point_mode and f_arr.ndim >= 1:
            # genuine ext value (OOD point mode) — full ext product
            term = ext4.mul(xp.broadcast_to(bpow, f_arr.shape), f_arr)
        else:
            # base-field column/constant: term = f * beta^k is a SCALE of
            # the ext power by a base value — 1 broadcast base mul instead
            # of a 19-mul ext product (the logUp fingerprint hot path)
            term = bb.mul(f_arr[..., None], bpow)
        acc = ext4.add(
            xp.broadcast_to(acc, term.shape) if acc.ndim < term.ndim else acc,
            term,
        )
        bpow = ext4.mul(bpow, beta_x)
    return acc


def signed_mult(inter: Interaction, point_mode: bool = False):
    m = _as_ext(inter.mult, point_mode)
    return m if inter.is_send else ext4.neg(m)


def build_perm_trace(interactions: Sequence[Interaction], z, beta):
    """Prover-side: (perm_matrix (n, 4k+4) base Montgomery, claimed_sum (4,)).

    interactions carry (n,)-vector fields/mults from a TraceBuilder pass.
    """
    xp = bb._mod(z, beta,
                 *[f for i_ in interactions for f in i_.fields],
                 *[i_.mult for i_ in interactions])
    cols = []
    for inter in interactions:
        fp = fingerprint(inter, z, beta)          # (n, 4) or (4,) if all
        sm = signed_mult(inter)                   # fields/mult are constants
        sm = xp.asarray(sm)
        shape = np.broadcast_shapes(fp.shape, sm.shape)
        fp = xp.broadcast_to(fp, shape)
        sm = xp.broadcast_to(sm, shape)
        denom = ext4.sub(xp.broadcast_to(xp.asarray(z, dtype=xp.uint32),
                                         shape), fp)
        inv_d = ext4.inv(denom)
        # sm is a signed BASE multiplicity embedded into the ext field
        # (only coeff 0 nonzero): scale beats a full ext product
        c = bb.mul(inv_d, sm[..., 0:1])
        cols.append(c)
    shape = np.broadcast_shapes(*[c.shape for c in cols])
    cols = [xp.broadcast_to(c, shape) for c in cols]
    total = cols[0]
    for c in cols[1:]:
        total = ext4.add(total, c)
    if xp is np:
        # parallel-prefix not needed on the host path: an exact uint64
        # cumsum mod p is the same running sum (values < p, n < 2^33)
        run_sum = (np.cumsum(total.astype(np.uint64), axis=0)
                   % np.uint64(bb.P)).astype(np.uint32)
    else:
        run_sum = jax.lax.associative_scan(bb.add, total, axis=0)  # (n, 4)
    claimed = run_sum[-1]
    perm = xp.concatenate(cols + [run_sum], axis=1)  # (n, 4k+4)
    return perm, claimed


def perm_constraints(
    interactions: Sequence[Interaction],
    perm_local: List,       # k+1 ext values/arrays (cols then S)
    perm_next: List,
    sels,                   # dict with first/last/transition (builder mode)
    z,
    beta,
    claimed_sum,            # (4,) ext Montgomery
    point_mode: bool = False,
) -> List:
    k = len(interactions)
    assert len(perm_local) == k + 1
    out = []
    for j, inter in enumerate(interactions):
        xp = bb._mod(z, beta, perm_local[j], *inter.fields)
        fp = fingerprint(inter, z, beta, point_mode)
        sm = signed_mult(inter, point_mode)
        c = perm_local[j]
        lhs = ext4.mul(c, ext4.sub(
            xp.broadcast_to(xp.asarray(z, dtype=xp.uint32), fp.shape), fp))
        out.append(ext4.sub(lhs, xp.broadcast_to(xp.asarray(sm), lhs.shape)))

    s_local = perm_local[k]
    s_next = perm_next[k]
    csum = perm_local[0]
    for j in range(1, k):
        csum = ext4.add(csum, perm_local[j])
    csum_next = perm_next[0]
    for j in range(1, k):
        csum_next = ext4.add(csum_next, perm_next[j])

    out.append(_mul_sel(ext4.sub(s_local, csum), sels["first"]))
    out.append(
        _mul_sel(
            ext4.sub(ext4.sub(s_next, s_local), csum_next), sels["transition"]
        )
    )
    xp2 = bb._mod(s_local, claimed_sum)
    out.append(
        _mul_sel(
            ext4.sub(s_local,
                     xp2.broadcast_to(xp2.asarray(claimed_sum,
                                                  dtype=xp2.uint32),
                                      s_local.shape)),
            sels["last"],
        )
    )
    return out

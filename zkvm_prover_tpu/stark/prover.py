"""Single-AIR STARK prover (uni-stark), end-to-end on device.

TPU re-design of the reference's per-AIR proving pipeline
(openvm-stark-backend `prove` driven from /root/reference/crates/prover/src/
prover/mod.rs:342-413 via openvm_sdk; SURVEY.md §3.2 "THE HOT LOOPS"):

  trace -> coset LDE -> Poseidon2 Merkle commit -> alpha -> fused
  constraint/quotient eval -> chunk split + commit -> zeta -> out-of-domain
  openings -> gamma -> DEEP combination -> FRI commit/fold/query + PoW.

Every heavy stage is a jitted batched kernel (NTT butterfly passes, batched
Poseidon2 sponges, one fused VPU pass for the whole constraint polynomial);
the host only sequences the Fiat-Shamir transcript.

Protocol layout notes (self-consistent; divergences from Plonky3 are layout
only — natural-order domains, committed round-0 FRI codeword — see
ROADMAP.md for the bit-parity plan):
  quotient q = (sum_i alpha^i c_i) / Z_H   has degree < 2n; it is split into
  2 chunks (restrictions to the two size-n cosets of the LDE domain D),
  re-extended onto D and committed as 8 base columns. The verifier
  reconstructs q(zeta) = sum_r L_r(zeta) chunk_r(zeta) with
  L_r = (zeta^n - v_{1-r})/(v_r - v_{1-r}), v_r = (g w_m^r)^n.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import babybear as bb
from ..fields import ext4
from ..ops import ntt
from ..models.air import Air, LdeBuilder, LOG_QUOTIENT_DEGREE
from . import domain, fri, merkle
from .challenger import Challenger
from .config import StarkConfig


@dataclass
class QueryOpening:
    """Merkle openings of the trace/quotient trees at one LDE index."""

    index: int
    trace: merkle.Opening
    quotient: merkle.Opening


@dataclass
class StarkProof:
    log_n: int
    width: int
    public_values: List[int]                 # canonical ints
    trace_root: np.ndarray                   # (8,) Montgomery
    quotient_root: np.ndarray
    opened_trace_zeta: np.ndarray            # (w, 4) Montgomery
    opened_trace_zeta_next: np.ndarray       # (w, 4)
    opened_quotient: np.ndarray              # (2, 4, 4): chunk, basecol, extcoord
    fri_proof: fri.FriProof
    query_openings: Dict[int, QueryOpening] = field(default_factory=dict)
    stat: Dict[str, float] = field(default_factory=dict)


def _observe_opened(challenger: Challenger, *arrays):
    for a in arrays:
        challenger.observe_slice(np.asarray(a, dtype=np.uint32).reshape(-1))


@jax.jit
def _fold_constraints_ext(constraints, alpha_powers):
    """C = sum_i alpha^i * c_i. constraints: (k, m) base; alpha_powers: (k, 4).
    Returns (m, 4)."""
    terms = bb.mul(constraints[:, :, None], alpha_powers[:, None, :])
    return ntt.field_sum(terms, axis=0)


@jax.jit
def _deep_combine(trace_lde, chunk_lde, x_monty, zeta, zeta_next,
                  t_at_z, t_at_zn, q_at_z, gamma):
    """Build the DEEP/batch-opening codeword F on the LDE domain D.

    trace_lde: (m, w) base; chunk_lde: (m, 8) base; x_monty: (m,) domain pts;
    zeta/zeta_next/gamma: (4,) ext; t_at_z/t_at_zn: (w, 4); q_at_z: (8, 4).
    Returns (m, 4) ext codeword.
    """
    m, w = trace_lde.shape
    x_ext = ext4.from_base(x_monty)                    # (m, 4)
    inv_xz = ext4.inv(ext4.sub(x_ext, zeta[None, :]))  # (m, 4)
    inv_xzn = ext4.inv(ext4.sub(x_ext, zeta_next[None, :]))

    n_terms = 2 * w + 8
    gammas = ext4.powers(gamma, n_terms)               # (n_terms, 4)

    def col_terms(lde_cols, opened, gamma_slice, inv_tab):
        # (m, k) base - (k, 4) ext -> (m, k, 4)
        diff = ext4.from_base(lde_cols)                # (m, k, 4)
        diff = bb.sub(diff, jnp.broadcast_to(opened[None, :, :], diff.shape))
        weighted = ext4.mul(diff, jnp.broadcast_to(
            gamma_slice[None, :, :], diff.shape))
        summed = ntt.field_sum(weighted, axis=1)       # (m, 4)
        return ext4.mul(summed, inv_tab)

    f1 = col_terms(trace_lde, t_at_z, gammas[:w], inv_xz)
    f2 = col_terms(trace_lde, t_at_zn, gammas[w : 2 * w], inv_xzn)
    f3 = col_terms(chunk_lde, q_at_z, gammas[2 * w :], inv_xz)
    return ext4.add(f1, ext4.add(f2, f3))


def prove(
    air: Air,
    trace: np.ndarray,
    public_values: List[int],
    config: Optional[StarkConfig] = None,
) -> StarkProof:
    """Prove one AIR over a power-of-two-height trace.

    trace: (n, w) canonical uint32 host array (or jnp array).
    """
    import time

    t_start = time.time()
    config = config or StarkConfig()
    n, w = int(trace.shape[0]), int(trace.shape[1])
    assert n & (n - 1) == 0
    log_n = n.bit_length() - 1
    log_blowup = config.log_blowup
    assert log_blowup == 1, "round-1 pipeline assumes blowup 2"
    m = n << log_blowup
    g = config.coset_shift % bb.P
    w_m_int = bb.two_adic_generator_int(log_n + log_blowup)

    challenger = Challenger()
    challenger.observe_canonical_u32(log_n)
    challenger.observe_canonical_u32(w)
    for pv in public_values:
        challenger.observe_canonical_u32(int(pv))

    # 1. commit trace LDE
    trace_m = bb.to_monty(jnp.asarray(np.asarray(trace, dtype=np.uint32)))
    c_rev = ntt.interpolate_coset_rev(trace_m, 1)
    trace_lde = ntt.eval_coset_from_rev(c_rev, log_blowup, g)
    tree_t = merkle.commit([trace_lde])
    challenger.observe_slice(tree_t.root_np())
    alpha = challenger.sample_ext()

    # 2. fused constraint eval + quotient
    sels = domain.selectors_on_coset(log_n, log_blowup, g)
    pvs_m = jnp.asarray(
        np.array([bb.to_monty_int(int(v) % bb.P) for v in public_values],
                 dtype=np.uint32)
    )
    builder = LdeBuilder(trace_lde, 1 << log_blowup, sels, pvs_m)
    air.eval(builder)
    constraints = jnp.stack(builder.constraints, axis=0)  # (k, m)
    alpha_pows = ext4.powers(alpha, constraints.shape[0])
    c_folded = _fold_constraints_ext(constraints, alpha_pows)  # (m, 4)
    q = bb.mul(c_folded, sels["inv_zh"][:, None])              # (m, 4)

    # 3. split quotient into per-coset chunks, re-extend, commit
    n_chunks = 1 << LOG_QUOTIENT_DEGREE
    chunk_ldes = []
    chunk_crevs = []
    for r in range(n_chunks):
        chunk = q[r::n_chunks]  # (n, 4) evals on (g*w_m^r) * H
        s_r = (g * pow(w_m_int, r, bb.P)) % bb.P
        cr = ntt.interpolate_coset_rev(chunk, s_r)
        chunk_crevs.append(cr)
        chunk_ldes.append(ntt.eval_coset_from_rev(cr, log_blowup, g))
    chunk_lde = jnp.concatenate(chunk_ldes, axis=1)  # (m, 8)
    tree_q = merkle.commit([chunk_lde])
    challenger.observe_slice(tree_q.root_np())
    zeta = challenger.sample_ext()

    # 4. out-of-domain openings
    g_h = bb.two_adic_generator_int(log_n)
    zeta_next = ext4.mul_base(zeta, np.uint32(bb.to_monty_int(g_h)))
    t_at_z = ntt.eval_poly_at_point_ext(c_rev, zeta)        # (w, 4)
    t_at_zn = ntt.eval_poly_at_point_ext(c_rev, zeta_next)  # (w, 4)
    q_at_z = jnp.concatenate(
        [ntt.eval_poly_at_point_ext(cr, zeta) for cr in chunk_crevs], axis=0
    )  # (8, 4)
    _observe_opened(challenger, t_at_z, t_at_zn, q_at_z)
    gamma = challenger.sample_ext()

    # 5. DEEP combination + FRI
    codeword = _deep_combine(
        trace_lde, chunk_lde, sels["x"], zeta, zeta_next,
        t_at_z, t_at_zn, q_at_z, gamma,
    )
    fri_proof = fri.prove(codeword, log_n + log_blowup, g, config.fri,
                          challenger)

    # 6. open commitment trees at all queried positions (and siblings)
    half = m // 2
    positions = set()
    for q0 in fri_proof.query_indices:
        qq = q0 % half
        positions.add(qq)
        positions.add(qq + half)
    query_openings = {
        pos: QueryOpening(
            index=pos,
            trace=merkle.open_index(tree_t, pos),
            quotient=merkle.open_index(tree_q, pos),
        )
        for pos in sorted(positions)
    }

    return StarkProof(
        log_n=log_n,
        width=w,
        public_values=[int(v) for v in public_values],
        trace_root=tree_t.root_np(),
        quotient_root=tree_q.root_np(),
        opened_trace_zeta=np.asarray(t_at_z),
        opened_trace_zeta_next=np.asarray(t_at_zn),
        opened_quotient=np.asarray(q_at_z).reshape(n_chunks, 4, 4),
        fri_proof=fri_proof,
        query_openings=query_openings,
        stat={"proving_time_mills": (time.time() - t_start) * 1e3,
              "trace_height": n, "trace_width": w},
    )

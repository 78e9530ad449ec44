"""Multi-AIR machine proofs: many AIRs with mixed trace heights, one shared
transcript, per-height commitments, and one FRI with per-height codeword
injection.

This is the TPU re-design of the reference's multi-AIR segment proofs
(openvm-stark-backend proves 42 AIRs per chunk segment under one challenger;
SURVEY.md §2.2 "STARK prover", §7 Phase 4). Structure:

- Matrices are grouped by LDE height; each height gets one trace commitment
  and one quotient-chunk commitment (so FRI query indexing per height is the
  natural `q mod m'` of the fold chain — no bit-reversed interleaving).
- LDE coset shifts follow the fold chain: a height-2^l matrix commits on
  shift(l) = g^(2^(L-l)) (L = max log-height), which is exactly the coset the
  FRI fold lands on after L-l rounds — injected codewords line up for free.
- One alpha (per-AIR constraint folding), one zeta (all openings), one gamma
  (global power index across every opened column of every AIR).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from ..fields import babybear as bb
from ..fields import ext4
from ..models.air import Air, LdeBuilder, PointBuilder, LOG_QUOTIENT_DEGREE
from ..ops import ntt
from ..utils import ext_np
from . import domain, fri, merkle
from .challenger import Challenger
from .config import StarkConfig
from .prover import _deep_combine, _fold_constraints_ext, _observe_opened

P = bb.P
N_CHUNKS = 1 << LOG_QUOTIENT_DEGREE


@dataclass
class AirInstance:
    air: Air
    trace: np.ndarray              # (n, w) canonical uint32
    public_values: List[int]


@dataclass
class OpenedValues:
    trace_zeta: np.ndarray         # (w, 4) Montgomery
    trace_zeta_next: np.ndarray    # (w, 4)
    quotient: np.ndarray           # (N_CHUNKS*4, 4)


@dataclass
class MachineProof:
    meta: List[Tuple[int, int, List[int]]]   # per AIR: (log_n, width, pvs)
    trace_roots: Dict[int, np.ndarray]       # log_m -> (8,)
    quotient_roots: Dict[int, np.ndarray]
    opened: List[OpenedValues]
    fri_proof: fri.FriProof
    # log_m -> {pos -> (trace Opening, quotient Opening)}
    query_openings: Dict[int, Dict[int, Tuple[merkle.Opening, merkle.Opening]]]
    stat: Dict[str, float] = field(default_factory=dict)


def _shift_for(log_m: int, log_max: int, g: int) -> int:
    return pow(g, 1 << (log_max - log_m), P)


def prove_machine(
    instances: Sequence[AirInstance],
    config: Optional[StarkConfig] = None,
) -> MachineProof:
    t_start = time.time()
    config = config or StarkConfig()
    log_blowup = config.log_blowup
    g = config.coset_shift % P
    assert log_blowup == 1

    metas = []
    log_ms = []
    for inst in instances:
        n, w = int(inst.trace.shape[0]), int(inst.trace.shape[1])
        assert n & (n - 1) == 0
        metas.append((n.bit_length() - 1, w, [int(v) for v in inst.public_values]))
        log_ms.append(n.bit_length() - 1 + log_blowup)
    log_max = max(log_ms)

    ch = Challenger()
    ch.observe_canonical_u32(len(instances))
    for (log_n, w, pvs) in metas:
        ch.observe_canonical_u32(log_n)
        ch.observe_canonical_u32(w)
        for pv in pvs:
            ch.observe_canonical_u32(pv)

    # ---- trace LDEs, grouped by height -----------------------------------
    trace_ldes = []
    trace_crevs = []
    for inst, (log_n, w, _), lm in zip(instances, metas, log_ms):
        shift = _shift_for(lm, log_max, g)
        trace_m = bb.to_monty(jnp.asarray(np.asarray(inst.trace, dtype=np.uint32)))
        cr = ntt.interpolate_coset_rev(trace_m, 1)
        trace_crevs.append(cr)
        trace_ldes.append(ntt.eval_coset_from_rev(cr, log_blowup, shift))

    heights = sorted(set(log_ms), reverse=True)
    trace_trees: Dict[int, merkle.MerkleTree] = {}
    for lm in heights:
        mats = [trace_ldes[i] for i in range(len(instances)) if log_ms[i] == lm]
        trace_trees[lm] = merkle.commit(mats)
        ch.observe_slice(trace_trees[lm].root_np())
    alpha = ch.sample_ext()

    # ---- quotients --------------------------------------------------------
    chunk_ldes = []
    chunk_crevs = []
    for i, (inst, (log_n, w, pvs), lm) in enumerate(zip(instances, metas, log_ms)):
        shift = _shift_for(lm, log_max, g)
        sels = domain.selectors_on_coset(log_n, log_blowup, shift)
        pvs_m = jnp.asarray(
            np.array([bb.to_monty_int(v % P) for v in pvs], dtype=np.uint32)
        )
        builder = LdeBuilder(trace_ldes[i], 1 << log_blowup, sels, pvs_m)
        inst.air.eval(builder)
        cons = jnp.stack(builder.constraints, axis=0)
        alpha_pows = ext4.powers(alpha, cons.shape[0])
        c_folded = _fold_constraints_ext(cons, alpha_pows)
        q = bb.mul(c_folded, jnp.asarray(sels["inv_zh"])[:, None])

        w_m_int = bb.two_adic_generator_int(lm)
        crs = []
        ldes = []
        for r in range(N_CHUNKS):
            s_r = (shift * pow(w_m_int, r, P)) % P
            cr = ntt.interpolate_coset_rev(q[r::N_CHUNKS], s_r)
            crs.append(cr)
            ldes.append(ntt.eval_coset_from_rev(cr, log_blowup, shift))
        chunk_crevs.append(crs)
        chunk_ldes.append(jnp.concatenate(ldes, axis=1))  # (m, 8)

    quotient_trees: Dict[int, merkle.MerkleTree] = {}
    for lm in heights:
        mats = [chunk_ldes[i] for i in range(len(instances)) if log_ms[i] == lm]
        quotient_trees[lm] = merkle.commit(mats)
        ch.observe_slice(quotient_trees[lm].root_np())
    zeta = ch.sample_ext()

    # ---- openings ---------------------------------------------------------
    opened: List[OpenedValues] = []
    for i, ((log_n, w, _), lm) in enumerate(zip(metas, log_ms)):
        g_h = bb.two_adic_generator_int(log_n)
        zeta_next = ext4.mul_base(zeta, np.uint32(bb.to_monty_int(g_h)))
        t_z = ntt.eval_poly_at_point_ext(trace_crevs[i], zeta)
        t_zn = ntt.eval_poly_at_point_ext(trace_crevs[i], zeta_next)
        q_z = jnp.concatenate(
            [ntt.eval_poly_at_point_ext(cr, zeta) for cr in chunk_crevs[i]],
            axis=0,
        )
        opened.append(
            OpenedValues(
                trace_zeta=np.asarray(t_z),
                trace_zeta_next=np.asarray(t_zn),
                quotient=np.asarray(q_z),
            )
        )
        _observe_opened(ch, t_z, t_zn, q_z)
    gamma = ch.sample_ext()

    # ---- per-height DEEP codewords ---------------------------------------
    gamma_base = 0
    codewords: Dict[int, jnp.ndarray] = {}
    for i, ((log_n, w, _), lm) in enumerate(zip(metas, log_ms)):
        shift = _shift_for(lm, log_max, g)
        sels = domain.selectors_on_coset(log_n, log_blowup, shift)
        g_h = bb.two_adic_generator_int(log_n)
        zeta_next = ext4.mul_base(zeta, np.uint32(bb.to_monty_int(g_h)))
        deep = _deep_combine(
            trace_ldes[i], chunk_ldes[i], jnp.asarray(sels["x"]),
            zeta, zeta_next,
            jnp.asarray(opened[i].trace_zeta),
            jnp.asarray(opened[i].trace_zeta_next),
            jnp.asarray(opened[i].quotient),
            gamma,
        )
        scale = ext4.exp_const(gamma, gamma_base)
        deep = ext4.mul(jnp.broadcast_to(scale, deep.shape), deep)
        codewords[lm] = (
            bb.add(codewords[lm], deep) if lm in codewords else deep
        )
        gamma_base += 2 * w + 4 * N_CHUNKS

    injected = {lm: cw for lm, cw in codewords.items() if lm != log_max}
    fri_proof = fri.prove(
        codewords[log_max], log_max, g, config.fri, ch, injected=injected
    )

    # ---- query openings per height ---------------------------------------
    query_openings: Dict[int, Dict[int, Tuple[merkle.Opening, merkle.Opening]]] = {}
    for lm in heights:
        m_l = 1 << lm
        positions = set()
        for q0 in fri_proof.query_indices:
            if lm == log_max:
                qq = q0 % (m_l // 2)
                positions.update((qq, qq + m_l // 2))
            else:
                positions.add(q0 % m_l)
        query_openings[lm] = {
            pos: (
                merkle.open_index(trace_trees[lm], pos),
                merkle.open_index(quotient_trees[lm], pos),
            )
            for pos in sorted(positions)
        }

    return MachineProof(
        meta=metas,
        trace_roots={lm: trace_trees[lm].root_np() for lm in heights},
        quotient_roots={lm: quotient_trees[lm].root_np() for lm in heights},
        opened=opened,
        fri_proof=fri_proof,
        query_openings=query_openings,
        stat={
            "proving_time_mills": (time.time() - t_start) * 1e3,
            "n_airs": len(instances),
        },
    )


def verify_machine(
    airs: Sequence[Air],
    proof: MachineProof,
    config: Optional[StarkConfig] = None,
) -> bool:
    config = config or StarkConfig()
    log_blowup = config.log_blowup
    g = config.coset_shift % P
    metas = proof.meta
    if len(airs) != len(metas):
        return False
    log_ms = [log_n + log_blowup for (log_n, _, _) in metas]
    log_max = max(log_ms)
    heights = sorted(set(log_ms), reverse=True)

    # ---- transcript replay ------------------------------------------------
    ch = Challenger()
    ch.observe_canonical_u32(len(metas))
    for (log_n, w, pvs) in metas:
        ch.observe_canonical_u32(log_n)
        ch.observe_canonical_u32(w)
        for pv in pvs:
            ch.observe_canonical_u32(int(pv))
    for lm in heights:
        if lm not in proof.trace_roots:
            return False
        ch.observe_slice(proof.trace_roots[lm])
    alpha = ch.sample_ext()
    for lm in heights:
        ch.observe_slice(proof.quotient_roots[lm])
    zeta = ch.sample_ext()
    for ov in proof.opened:
        _observe_opened(ch, ov.trace_zeta, ov.trace_zeta_next, ov.quotient)
    gamma = ch.sample_ext()

    from .verifier import _canon_ext

    zeta_c = _canon_ext(np.asarray(zeta))
    gamma_c = _canon_ext(np.asarray(gamma))
    alpha_c = _canon_ext(np.asarray(alpha))

    # ---- per-AIR out-of-domain constraint check --------------------------
    for i, (air, (log_n, w, pvs), lm) in enumerate(zip(airs, metas, log_ms)):
        n = 1 << log_n
        shift = _shift_for(lm, log_max, g)
        sels_z = domain.selectors_at_point_ext(log_n, zeta)
        pvs_m = [bb.to_monty_int(int(v) % P) for v in pvs]
        pb = PointBuilder(
            jnp.asarray(proof.opened[i].trace_zeta),
            jnp.asarray(proof.opened[i].trace_zeta_next),
            sels_z,
            pvs_m,
        )
        air.eval(pb)
        acc = [0, 0, 0, 0]
        apow = ext_np.from_base(1)
        for cons in pb.constraints:
            acc = ext_np.add(acc, ext_np.mul(apow, _canon_ext(np.asarray(cons))))
            apow = ext_np.mul(apow, alpha_c)
        inv_zh = _canon_ext(np.asarray(sels_z["inv_zh"]))
        q_expected = ext_np.mul(acc, inv_zh)

        w_m_int = bb.two_adic_generator_int(lm)
        v = [pow((shift * pow(w_m_int, r, P)) % P, n, P) for r in range(N_CHUNKS)]
        zeta_n = ext_np.exp(zeta_c, n)
        opened_q = proof.opened[i].quotient.reshape(N_CHUNKS, 4, 4)
        q_zeta = [0, 0, 0, 0]
        for r in range(N_CHUNKS):
            other = 1 - r
            l_num = ext_np.sub(zeta_n, ext_np.from_base(v[other]))
            denom_inv = pow((v[r] - v[other]) % P, P - 2, P)
            l_r = ext_np.scale(l_num, denom_inv)
            chunk_val = [0, 0, 0, 0]
            for c in range(4):
                coeff = _canon_ext(opened_q[r, c])
                basis = [0, 0, 0, 0]
                basis[c] = 1
                chunk_val = ext_np.add(chunk_val, ext_np.mul(coeff, basis))
            q_zeta = ext_np.add(q_zeta, ext_np.mul(l_r, chunk_val))
        if not ext_np.eq(q_expected, q_zeta):
            return False

    # ---- verify Merkle openings ------------------------------------------
    for lm in heights:
        mat_heights = [1 << lm] * sum(1 for x in log_ms if x == lm)
        for pos, (ot, oq) in proof.query_openings[lm].items():
            if ot.index != pos or oq.index != pos:
                return False
            if not merkle.verify_opening(proof.trace_roots[lm], ot, mat_heights):
                return False
            if not merkle.verify_opening(
                proof.quotient_roots[lm], oq, mat_heights
            ):
                return False

    # ---- derived codeword callbacks per height ---------------------------
    # gamma offsets per AIR
    offsets = []
    off = 0
    for (log_n, w, _) in metas:
        offsets.append(off)
        off += 2 * w + 4 * N_CHUNKS
    gammas = ext_np.powers(gamma_c, off)

    def make_derived(lm):
        airs_here = [i for i in range(len(metas)) if log_ms[i] == lm]
        shift = _shift_for(lm, log_max, g)
        w_m_int = bb.two_adic_generator_int(lm)

        def derived(idx: int):
            entry = proof.query_openings[lm].get(idx)
            if entry is None:
                raise KeyError(f"missing opening at height {lm} pos {idx}")
            ot, oq = entry
            x = (shift * pow(w_m_int, idx, P)) % P
            total = [0, 0, 0, 0]
            for slot, i in enumerate(airs_here):
                log_n, w, _ = metas[i]
                g_h = bb.two_adic_generator_int(log_n)
                zeta_g = ext_np.mul(zeta_c, ext_np.from_base(g_h))
                inv_xz = ext_np.inv(ext_np.sub(ext_np.from_base(x), zeta_c))
                inv_xzg = ext_np.inv(ext_np.sub(ext_np.from_base(x), zeta_g))
                trow = np.asarray(
                    bb.from_monty(jnp.asarray(ot.rows[slot]))
                ).astype(np.int64)
                qrow = np.asarray(
                    bb.from_monty(jnp.asarray(oq.rows[slot]))
                ).astype(np.int64)
                t_z = _canon_ext(proof.opened[i].trace_zeta)
                t_zn = _canon_ext(proof.opened[i].trace_zeta_next)
                q_z = _canon_ext(proof.opened[i].quotient)
                base = offsets[i]
                acc1 = [0, 0, 0, 0]
                acc2 = [0, 0, 0, 0]
                acc3 = [0, 0, 0, 0]
                for j in range(w):
                    d1 = ext_np.sub(ext_np.from_base(int(trow[j])), t_z[j])
                    acc1 = ext_np.add(acc1, ext_np.mul(gammas[base + j], d1))
                    d2 = ext_np.sub(ext_np.from_base(int(trow[j])), t_zn[j])
                    acc2 = ext_np.add(acc2, ext_np.mul(gammas[base + w + j], d2))
                for k in range(4 * N_CHUNKS):
                    d3 = ext_np.sub(ext_np.from_base(int(qrow[k])), q_z[k])
                    acc3 = ext_np.add(
                        acc3, ext_np.mul(gammas[base + 2 * w + k], d3)
                    )
                term = ext_np.add(
                    ext_np.mul(ext_np.add(acc1, acc3), inv_xz),
                    ext_np.mul(acc2, inv_xzg),
                )
                total = ext_np.add(total, term)
            return np.array(total, dtype=np.uint64)

        return derived

    derived_map = {lm: make_derived(lm) for lm in heights}

    return fri.verify(
        proof.fri_proof, log_max, g, config.fri, ch, derived_map
    )

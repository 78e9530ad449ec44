"""Multi-AIR machine proofs: many AIRs with mixed trace heights, one shared
transcript, logUp bus interactions, per-height commitments, and one FRI with
per-height codeword injection.

This is the TPU re-design of the reference's multi-AIR segment proofs
(openvm-stark-backend proves 42 AIRs per chunk segment under one challenger,
with logUp interactions gluing chips together; SURVEY.md §2.2 "STARK
prover", §7 Phase 4). Structure:

- Matrices are grouped by LDE height; each height gets one trace commitment,
  one permutation commitment (if any AIR at that height has interactions) and
  one quotient-chunk commitment, so FRI query indexing per height is the
  natural `q mod m'` of the fold chain.
- LDE coset shifts follow the fold chain: a height-2^l matrix commits on
  shift(l) = g^(2^(L-l)) (L = max log-height) — injected codewords line up
  with the FRI fold domains for free.
- Transcript: meta -> trace roots -> (beta, z) -> perm roots + claimed sums
  -> alpha -> quotient roots -> zeta -> openings -> gamma -> FRI.
- Global logUp soundness: sum of per-AIR claimed cumulative sums == 0.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from ..fields import babybear as bb
from ..fields import ext4
from ..models.air import (
    Air,
    LdeBuilder,
    PointBuilder,
    TraceBuilder,
    LOG_QUOTIENT_DEGREE,
)
from ..ops import ntt
from ..utils import ext_np
from . import domain, fri, interactions as ilib, merkle
from .challenger import Challenger
from .config import StarkConfig
from .prover import _observe_opened

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
    perm_zeta: Optional[np.ndarray] = None       # (4k+4, 4)
    perm_zeta_next: Optional[np.ndarray] = None
    pre_zeta: Optional[np.ndarray] = None        # (pw, 4)
    pre_zeta_next: Optional[np.ndarray] = None


@dataclass
class QueryOpening:
    trace: merkle.Opening
    quotient: merkle.Opening
    perm: Optional[merkle.Opening] = None
    pre: Optional[merkle.Opening] = None


@dataclass
class MachineProof:
    meta: List[Tuple[int, int, List[int]]]   # per AIR: (log_n, width, pvs)
    trace_roots: Dict[int, np.ndarray]       # log_m -> (8,)
    quotient_roots: Dict[int, np.ndarray]
    perm_roots: Dict[int, np.ndarray]        # heights with interactions only
    # heights with preprocessed columns only; the verifier RECOMPUTES these
    # from the Air definitions (verification-key material)
    pre_roots: Dict[int, np.ndarray] = field(default_factory=dict)
    claimed_sums: List[Optional[np.ndarray]] = field(default_factory=list)
    opened: List[OpenedValues] = field(default_factory=list)
    fri_proof: fri.FriProof = None
    query_openings: Dict[int, Dict[int, QueryOpening]] = field(
        default_factory=dict
    )
    stat: Dict[str, float] = field(default_factory=dict)


def _shift_for(log_m: int, log_max: int, g: int) -> int:
    return pow(g, 1 << (log_max - log_m), P)


# Below this element count, the host numpy path beats device dispatch +
# per-shape XLA compile for the NTT/commit kernels (the round-2 "per-proof
# overhead" fix); production-size traces still run on the TPU.
# Env-tunable: on tunneled single-chip setups (axon) where host<->device
# readback runs ~180 KB/s, forcing a huge threshold keeps mixed-phase
# proofs entirely on the host; multi-host production keeps the default.
import os as _os

_DEVICE_MIN_ELEMS = int(
    _os.environ.get("ZKVM_TPU_DEVICE_MIN_ELEMS", 1 << 17)
)


def _dev(x):
    return jnp.asarray(x) if x.size >= _DEVICE_MIN_ELEMS else x


# Moved to fields/babybear.py (round 5) so ops/ntt.py can share it; the
# local name is kept for the call sites below.
_mont_matmul_np = bb.mont_matmul_np


def _fold_mixed_ext(constraints: List, alpha):
    """C = sum_i alpha^i * c_i over mixed base (m,) / ext (m, 4) constraints.
    Returns (m, 4). alpha is concrete; the power ladder is host-computed.
    Backend-generic: numpy constraints stay numpy (host fast path)."""
    apows = _ext_powers_host(alpha, len(constraints))
    acc = None
    for i, c in enumerate(constraints):
        xp = bb._mod(c)
        c = xp.asarray(c, dtype=xp.uint32)
        ap = xp.asarray(apows[i])
        if c.ndim == 1:
            term = bb.mul(c[:, None], ap[None, :])
        else:
            term = ext4.mul(c, xp.broadcast_to(ap, c.shape))
        acc = term if acc is None else bb.add(acc, term)
    return acc


def _deep_terms(lde_mats: List[jnp.ndarray], opened_list, x_monty, points,
                gamma_powers, gamma_base: int):
    """Batch-opening combination for one AIR on its LDE domain.

    lde_mats: matrices (m, w_i); opened_list: matching (w_i, 4) openings;
    points: matching (4,) opening points; gamma_powers: (N, 4) precomputed
    power ladder (host-computed once per proof — avoids one scan compile per
    distinct ladder length). Returns (m, 4) and the next gamma index.
    """
    # Pick ONE backend for the whole combination: a single jax-ish operand
    # (a quotient-chunk LDE, a challenger sample) would otherwise drag the
    # entire phase onto the eager-jax path, which compiles a fresh kernel
    # per (op, shape) — measured 130 s of XLA compiles per proof. Host
    # unless the largest matrix crosses the device threshold.
    biggest = max(int(np.prod(m_.shape)) for m_ in lde_mats)
    if biggest < _DEVICE_MIN_ELEMS:
        lde_mats = [np.asarray(m_) for m_ in lde_mats]
        opened_list = [np.asarray(o) for o in opened_list]
        points = [np.asarray(p) for p in points]
        x_monty = np.asarray(x_monty)
        gamma_powers = np.asarray(gamma_powers)
    xp = bb._mod(x_monty, *lde_mats)
    m = lde_mats[0].shape[0]
    x_ext = ext4.from_base(xp.asarray(x_monty, dtype=xp.uint32))
    acc = xp.zeros((m, 4), dtype=xp.uint32)
    gidx = gamma_base
    # matrices opened at the same point share one domain-wide ext4 inverse
    # (the per-element norm/exp-chain inversion is ~80 vector passes)
    inv_cache = {}

    def inv_at(pt):
        if xp is not np:
            return ext4.inv(ext4.sub(x_ext, pt[None, :]))
        key = np.asarray(pt).tobytes()
        if key not in inv_cache:
            inv_cache[key] = ext4.inv(ext4.sub(x_ext, pt[None, :]))
        return inv_cache[key]

    for mat, opened, pt in zip(lde_mats, opened_list, points):
        w = mat.shape[1]
        pt = xp.asarray(pt, dtype=xp.uint32)
        inv_x = inv_at(pt)
        gammas = xp.asarray(gamma_powers[gidx : gidx + w])
        opened = xp.asarray(opened, dtype=xp.uint32)
        if xp is np:
            # sum_w (mat[:, w]*e0 - opened_w) x gamma_w splits into a
            # dense modular matmul minus a w-sized constant: BLAS path
            dot = _mont_matmul_np(mat, gammas)  # (m, 4)
            const = ntt.field_sum(ext4.mul(opened, gammas), axis=0)
            summed = bb.sub(dot, const[None, :])
        else:
            diff = ext4.from_base(mat)  # (m, w, 4)
            diff = bb.sub(
                diff, xp.broadcast_to(opened[None, :, :], diff.shape)
            )
            weighted = ext4.mul(
                diff, xp.broadcast_to(gammas[None, :, :], diff.shape)
            )
            summed = ntt.field_sum(weighted, axis=1)
        acc = bb.add(acc, ext4.mul(summed, inv_x))
        gidx += w
    return acc, gidx


def _ext_powers_host(x_monty_4, n: int) -> np.ndarray:
    """Host-side ext power ladder [1, x, ..., x^(n-1)] (n, 4) Montgomery."""
    from ..utils import ext_np
    from .verifier import _canon_ext

    x_c = _canon_ext(np.asarray(x_monty_4))
    out = np.zeros((n, 4), dtype=np.uint32)
    acc = ext_np.from_base(1)
    for i in range(n):
        for j in range(4):
            out[i, j] = bb.to_monty_int(int(acc[j]))
        acc = ext_np.mul(acc, x_c)
    return out


def _extract_interactions(air: Air, trace_m, pvs_m, pre_m=None):
    tb = TraceBuilder(trace_m, pvs_m, pre_m=pre_m)
    air.eval(tb)
    return tb.interactions


def _perm_ext_groups(perm_mat, k: int):
    """Split an (m, 4k+4) base matrix into k+1 ext-valued (m, 4) groups."""
    return [perm_mat[:, 4 * j : 4 * j + 4] for j in range(k + 1)]


def prove_machine(
    instances: Sequence[AirInstance],
    config: Optional[StarkConfig] = None,
) -> MachineProof:
    t_start = time.time()
    config = config or StarkConfig()
    log_blowup = config.log_blowup
    g = config.coset_shift % P
    assert log_blowup == 1
    blowup = 1 << log_blowup

    metas = []
    log_ms = []
    for inst in instances:
        n, w = int(inst.trace.shape[0]), int(inst.trace.shape[1])
        assert n & (n - 1) == 0
        metas.append(
            (n.bit_length() - 1, w, [int(v) for v in inst.public_values])
        )
        log_ms.append(n.bit_length() - 1 + log_blowup)
    log_max = max(log_ms)
    heights = sorted(set(log_ms), reverse=True)

    ch = Challenger()
    ch.observe_canonical_u32(len(instances))
    for (log_n, w, pvs) in metas:
        ch.observe_canonical_u32(log_n)
        ch.observe_canonical_u32(w)
        for pv in pvs:
            ch.observe_canonical_u32(pv)

    # numpy: feeds the host-eval fast paths (TraceBuilder / LdeBuilder)
    pvs_ms = [
        np.array([bb.to_monty_int(v % P) for v in pvs], dtype=np.uint32)
        for (_, _, pvs) in metas
    ]

    # ---- phase 0: preprocessed (verifier-known) columns -------------------
    pre_ms: List[Optional[jnp.ndarray]] = []
    pre_ldes: List[Optional[jnp.ndarray]] = []
    pre_crevs: List[Optional[jnp.ndarray]] = []
    for inst, (log_n, _, _), lm in zip(instances, metas, log_ms):
        pre_np = inst.air.preprocessed_trace()
        if pre_np is None:
            pre_ms.append(None)
            pre_ldes.append(None)
            pre_crevs.append(None)
            continue
        assert pre_np.shape[0] == (1 << log_n), (
            "preprocessed height must equal trace height"
        )
        shift = _shift_for(lm, log_max, g)
        pm_np = bb.to_monty(np.asarray(pre_np, dtype=np.uint32))
        cr = ntt.interpolate_coset_rev(_dev(pm_np), 1)
        pre_ms.append(pm_np)
        pre_crevs.append(cr)
        pre_ldes.append(ntt.eval_coset_from_rev(cr, log_blowup, shift))

    pre_trees: Dict[int, merkle.MerkleTree] = {}
    for lm in heights:
        mats = [
            pre_ldes[i]
            for i in range(len(instances))
            if log_ms[i] == lm and pre_ldes[i] is not None
        ]
        if mats:
            pre_trees[lm] = merkle.commit(mats)
            ch.observe_slice(pre_trees[lm].root_np())

    # ---- phase 1: main trace LDEs, commit per height ----------------------
    trace_ms = []
    trace_ldes = []
    trace_crevs = []
    for inst, lm in zip(instances, log_ms):
        shift = _shift_for(lm, log_max, g)
        trace_m = bb.to_monty(np.asarray(inst.trace, dtype=np.uint32))
        trace_ms.append(trace_m)  # numpy (host interaction extraction)
        cr = ntt.interpolate_coset_rev(_dev(trace_m), 1)
        trace_crevs.append(cr)
        trace_ldes.append(ntt.eval_coset_from_rev(cr, log_blowup, shift))

    trace_trees: Dict[int, merkle.MerkleTree] = {}
    for lm in heights:
        mats = [trace_ldes[i] for i in range(len(instances)) if log_ms[i] == lm]
        trace_trees[lm] = merkle.commit(mats)
        ch.observe_slice(trace_trees[lm].root_np())

    # ---- phase 2: logUp permutation traces --------------------------------
    beta = ch.sample_ext()
    z = ch.sample_ext()

    inters_per_air = [
        _extract_interactions(inst.air, trace_ms[i], pvs_ms[i], pre_ms[i])
        for i, inst in enumerate(instances)
    ]
    perm_ldes: List[Optional[jnp.ndarray]] = [None] * len(instances)
    perm_crevs: List[Optional[jnp.ndarray]] = [None] * len(instances)
    claimed_sums: List[Optional[np.ndarray]] = [None] * len(instances)
    for i, inters in enumerate(inters_per_air):
        if not inters:
            continue
        perm, claimed = ilib.build_perm_trace(inters, z, beta)
        claimed_sums[i] = np.asarray(claimed)
        shift = _shift_for(log_ms[i], log_max, g)
        cr = ntt.interpolate_coset_rev(_dev(perm), 1)
        perm_crevs[i] = cr
        perm_ldes[i] = ntt.eval_coset_from_rev(cr, log_blowup, shift)

    perm_trees: Dict[int, merkle.MerkleTree] = {}
    for lm in heights:
        mats = [
            perm_ldes[i]
            for i in range(len(instances))
            if log_ms[i] == lm and perm_ldes[i] is not None
        ]
        if mats:
            perm_trees[lm] = merkle.commit(mats)
            ch.observe_slice(perm_trees[lm].root_np())
    for cs in claimed_sums:
        if cs is not None:
            ch.observe_slice(cs)

    # ---- phase 3: quotients ----------------------------------------------
    alpha = ch.sample_ext()
    chunk_ldes = []
    chunk_crevs = []
    for i, (inst, (log_n, w, pvs), lm) in enumerate(
        zip(instances, metas, log_ms)
    ):
        shift = _shift_for(lm, log_max, g)
        sels = domain.selectors_on_coset(log_n, log_blowup, shift)
        # constraint evaluation runs on the numpy fast path: wide AIRs emit
        # tens of thousands of elementwise ops — per-op jax dispatch, not
        # compute, would dominate (VERDICT round-2 per-proof overhead)
        sels_np = {k_: np.asarray(v) for k_, v in sels.items()}
        lde_np = np.asarray(trace_ldes[i])
        pre_lde_np = (
            None if pre_ldes[i] is None else np.asarray(pre_ldes[i])
        )
        builder = LdeBuilder(
            lde_np, blowup, sels_np, pvs_ms[i], pre_lde=pre_lde_np
        )
        inst.air.eval(builder)
        constraints = list(builder.constraints)
        if inters_per_air[i]:
            k = len(inters_per_air[i])
            perm_np = np.asarray(perm_ldes[i])
            groups = _perm_ext_groups(perm_np, k)
            groups_next = [np.roll(gp, -blowup, axis=0) for gp in groups]
            constraints += ilib.perm_constraints(
                builder.interactions,  # LDE-vector fields/mults
                groups,
                groups_next,
                sels_np,
                z,
                beta,
                claimed_sums[i],
            )
        c_folded = _fold_mixed_ext(constraints, alpha)
        q = bb.mul(c_folded, sels_np["inv_zh"][:, None])

        w_m_int = bb.two_adic_generator_int(lm)
        crs = []
        ldes = []
        for r in range(N_CHUNKS):
            s_r = (shift * pow(w_m_int, r, P)) % P
            cr = ntt.interpolate_coset_rev(
                _dev(np.ascontiguousarray(q[r::N_CHUNKS]))
                if isinstance(q, np.ndarray) else q[r::N_CHUNKS],
                s_r,
            )
            crs.append(cr)
            ldes.append(ntt.eval_coset_from_rev(cr, log_blowup, shift))
        chunk_crevs.append(crs)
        # backend-preserving concat: an unconditional jnp.concatenate here
        # promoted host-path quotient LDEs onto the device (on tunneled
        # setups, a transfer + per-shape compile per AIR)
        xp_c = np if all(isinstance(v, np.ndarray) for v in ldes) else jnp
        chunk_ldes.append(xp_c.concatenate(ldes, axis=1))  # (m, 8)

    quotient_trees: Dict[int, merkle.MerkleTree] = {}
    for lm in heights:
        mats = [chunk_ldes[i] for i in range(len(instances)) if log_ms[i] == lm]
        quotient_trees[lm] = merkle.commit(mats)
        ch.observe_slice(quotient_trees[lm].root_np())
    zeta = ch.sample_ext()

    # ---- phase 4: openings ------------------------------------------------
    opened: List[OpenedValues] = []
    for i, ((log_n, w, _), lm) in enumerate(zip(metas, log_ms)):
        g_h = bb.two_adic_generator_int(log_n)
        zeta_next = ext4.mul_base(zeta, np.uint32(bb.to_monty_int(g_h)))
        t_z = ntt.eval_poly_at_point_ext(trace_crevs[i], zeta)
        t_zn = ntt.eval_poly_at_point_ext(trace_crevs[i], zeta_next)
        q_parts = [
            np.asarray(ntt.eval_poly_at_point_ext(cr, zeta))
            for cr in chunk_crevs[i]
        ]
        q_z = np.concatenate(q_parts, axis=0)
        ov = OpenedValues(
            trace_zeta=np.asarray(t_z),
            trace_zeta_next=np.asarray(t_zn),
            quotient=np.asarray(q_z),
        )
        _observe_opened(ch, t_z, t_zn, q_z)
        if perm_crevs[i] is not None:
            p_z = ntt.eval_poly_at_point_ext(perm_crevs[i], zeta)
            p_zn = ntt.eval_poly_at_point_ext(perm_crevs[i], zeta_next)
            ov.perm_zeta = np.asarray(p_z)
            ov.perm_zeta_next = np.asarray(p_zn)
            _observe_opened(ch, p_z, p_zn)
        if pre_crevs[i] is not None:
            e_z = ntt.eval_poly_at_point_ext(pre_crevs[i], zeta)
            e_zn = ntt.eval_poly_at_point_ext(pre_crevs[i], zeta_next)
            ov.pre_zeta = np.asarray(e_z)
            ov.pre_zeta_next = np.asarray(e_zn)
            _observe_opened(ch, e_z, e_zn)
        opened.append(ov)
    gamma = ch.sample_ext()

    # ---- phase 5: per-height DEEP codewords + FRI ------------------------
    n_terms = sum(
        2 * w + 4 * N_CHUNKS
        + (2 * (4 * len(inters_per_air[i]) + 4) if inters_per_air[i] else 0)
        + (2 * pre_ldes[i].shape[1] if pre_ldes[i] is not None else 0)
        for i, (_, w, _) in enumerate(metas)
    )
    gamma_powers = _ext_powers_host(gamma, max(n_terms, 1))
    gamma_base = 0
    codewords: Dict[int, jnp.ndarray] = {}
    for i, ((log_n, w, _), lm) in enumerate(zip(metas, log_ms)):
        shift = _shift_for(lm, log_max, g)
        sels = domain.selectors_on_coset(log_n, log_blowup, shift)
        g_h = bb.two_adic_generator_int(log_n)
        zeta_next = ext4.mul_base(zeta, np.uint32(bb.to_monty_int(g_h)))
        mats = [trace_ldes[i], trace_ldes[i]]
        opens = [
            opened[i].trace_zeta,
            opened[i].trace_zeta_next,
        ]
        points = [zeta, zeta_next]
        if perm_ldes[i] is not None:
            mats += [perm_ldes[i], perm_ldes[i]]
            opens += [
                opened[i].perm_zeta,
                opened[i].perm_zeta_next,
            ]
            points += [zeta, zeta_next]
        if pre_ldes[i] is not None:
            mats += [pre_ldes[i], pre_ldes[i]]
            opens += [
                opened[i].pre_zeta,
                opened[i].pre_zeta_next,
            ]
            points += [zeta, zeta_next]
        mats.append(chunk_ldes[i])
        opens.append(opened[i].quotient)
        points.append(zeta)
        deep, gamma_base = _deep_terms(
            mats, opens, sels["x"], points, gamma_powers, gamma_base
        )
        codewords[lm] = (
            bb.add(codewords[lm], deep) if lm in codewords else deep
        )

    injected = {lm: cw for lm, cw in codewords.items() if lm != log_max}
    fri_proof = fri.prove(
        codewords[log_max], log_max, g, config.fri, ch, injected=injected
    )

    # ---- phase 6: query openings per height ------------------------------
    query_openings: Dict[int, Dict[int, QueryOpening]] = {}
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
            pos: QueryOpening(
                trace=merkle.open_index(trace_trees[lm], pos),
                quotient=merkle.open_index(quotient_trees[lm], pos),
                perm=(
                    merkle.open_index(perm_trees[lm], pos)
                    if lm in perm_trees
                    else None
                ),
                pre=(
                    merkle.open_index(pre_trees[lm], pos)
                    if lm in pre_trees
                    else None
                ),
            )
            for pos in sorted(positions)
        }

    return MachineProof(
        meta=metas,
        trace_roots={lm: trace_trees[lm].root_np() for lm in heights},
        quotient_roots={lm: quotient_trees[lm].root_np() for lm in heights},
        perm_roots={lm: t.root_np() for lm, t in perm_trees.items()},
        pre_roots={lm: t.root_np() for lm, t in pre_trees.items()},
        claimed_sums=claimed_sums,
        opened=opened,
        fri_proof=fri_proof,
        query_openings=query_openings,
        stat={
            "proving_time_mills": (time.time() - t_start) * 1e3,
            "n_airs": len(instances),
        },
    )


# ---------------------------------------------------------------------------
# Verifier
# ---------------------------------------------------------------------------


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

    from .verifier import _canon_ext

    # which AIRs have interactions (re-derived from the AIR definitions via a
    # dry TraceBuilder pass on a zero trace — interaction STRUCTURE is static)
    inter_counts = []
    pre_traces = []
    for air, (log_n, w, _pvs) in zip(airs, metas):
        pre_np = air.preprocessed_trace()
        pre_traces.append(pre_np)
        zero_tm = np.zeros((2, w), dtype=np.uint32)
        zero_pre = (
            None
            if pre_np is None
            else np.zeros((2, pre_np.shape[1]), dtype=np.uint32)
        )
        tb = TraceBuilder(
            zero_tm, np.zeros((len(_pvs),), dtype=np.uint32), pre_m=zero_pre
        )
        air.eval(tb)
        inter_counts.append(len(tb.interactions))

    # ---- recompute preprocessed commitments (verification-key material) ---
    pre_ldes_v: List[Optional[jnp.ndarray]] = []
    for i, (pre_np, (log_n, _, _), lm) in enumerate(
        zip(pre_traces, metas, log_ms)
    ):
        if pre_np is None:
            pre_ldes_v.append(None)
            continue
        if pre_np.shape[0] != (1 << log_n):
            return False
        shift = _shift_for(lm, log_max, g)
        pm = bb.to_monty(np.asarray(pre_np, dtype=np.uint32))
        cr = ntt.interpolate_coset_rev(pm, 1)
        pre_ldes_v.append(ntt.eval_coset_from_rev(cr, log_blowup, shift))
    expected_pre_roots: Dict[int, np.ndarray] = {}
    for lm in heights:
        mats = [
            pre_ldes_v[i]
            for i in range(len(metas))
            if log_ms[i] == lm and pre_ldes_v[i] is not None
        ]
        if mats:
            expected_pre_roots[lm] = merkle.commit(mats).root_np()
    if set(expected_pre_roots) != set(proof.pre_roots):
        return False
    for lm, root in expected_pre_roots.items():
        if not (np.asarray(proof.pre_roots[lm]) == root).all():
            return False

    # ---- transcript replay ------------------------------------------------
    ch = Challenger()
    ch.observe_canonical_u32(len(metas))
    for (log_n, w, pvs) in metas:
        ch.observe_canonical_u32(log_n)
        ch.observe_canonical_u32(w)
        for pv in pvs:
            ch.observe_canonical_u32(int(pv))
    for lm in heights:
        if lm in expected_pre_roots:
            ch.observe_slice(expected_pre_roots[lm])
    for lm in heights:
        if lm not in proof.trace_roots:
            return False
        ch.observe_slice(proof.trace_roots[lm])
    beta = ch.sample_ext()
    z = ch.sample_ext()
    for lm in heights:
        has_perm = any(
            inter_counts[i] and log_ms[i] == lm for i in range(len(metas))
        )
        if has_perm:
            if lm not in proof.perm_roots:
                return False
            ch.observe_slice(proof.perm_roots[lm])
    for i, cs in enumerate(proof.claimed_sums):
        if (cs is not None) != bool(inter_counts[i]):
            return False
        if cs is not None:
            ch.observe_slice(np.asarray(cs, dtype=np.uint32))
    alpha = ch.sample_ext()
    for lm in heights:
        ch.observe_slice(proof.quotient_roots[lm])
    zeta = ch.sample_ext()
    for i, ov in enumerate(proof.opened):
        _observe_opened(ch, ov.trace_zeta, ov.trace_zeta_next, ov.quotient)
        if inter_counts[i]:
            if ov.perm_zeta is None or ov.perm_zeta_next is None:
                return False
            _observe_opened(ch, ov.perm_zeta, ov.perm_zeta_next)
        if pre_traces[i] is not None:
            if ov.pre_zeta is None or ov.pre_zeta_next is None:
                return False
            _observe_opened(ch, ov.pre_zeta, ov.pre_zeta_next)
    gamma = ch.sample_ext()

    # ---- global logUp balance --------------------------------------------
    if any(inter_counts):
        total = [0, 0, 0, 0]
        for cs in proof.claimed_sums:
            if cs is not None:
                total = ext_np.add(total, _canon_ext(np.asarray(cs)))
        if not ext_np.is_zero(total):
            return False

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
            np.asarray(proof.opened[i].trace_zeta),
            np.asarray(proof.opened[i].trace_zeta_next),
            sels_z,
            pvs_m,
            pre_ext=(
                None
                if proof.opened[i].pre_zeta is None
                else np.asarray(proof.opened[i].pre_zeta)
            ),
            pre_next_ext=(
                None
                if proof.opened[i].pre_zeta_next is None
                else np.asarray(proof.opened[i].pre_zeta_next)
            ),
        )
        air.eval(pb)
        constraints = list(pb.constraints)
        if inter_counts[i]:
            k = inter_counts[i]
            pz = np.asarray(proof.opened[i].perm_zeta).reshape(k + 1, 4, 4)
            pzn = np.asarray(proof.opened[i].perm_zeta_next).reshape(
                k + 1, 4, 4
            )
            perm_local = [ext4.from_base_cols(pz[j]) for j in range(k + 1)]
            perm_next = [ext4.from_base_cols(pzn[j]) for j in range(k + 1)]
            constraints += ilib.perm_constraints(
                pb.interactions,
                perm_local,
                perm_next,
                sels_z,
                z,
                beta,
                np.asarray(proof.claimed_sums[i]),
                point_mode=True,
            )
        acc = [0, 0, 0, 0]
        apow = ext_np.from_base(1)
        for cons in constraints:
            acc = ext_np.add(
                acc, ext_np.mul(apow, _canon_ext(np.asarray(cons)))
            )
            apow = ext_np.mul(apow, alpha_c)
        inv_zh = _canon_ext(np.asarray(sels_z["inv_zh"]))
        q_expected = ext_np.mul(acc, inv_zh)

        w_m_int = bb.two_adic_generator_int(lm)
        v = [
            pow((shift * pow(w_m_int, r, P)) % P, n, P) for r in range(N_CHUNKS)
        ]
        zeta_n = ext_np.exp(zeta_c, n)
        opened_q = proof.opened[i].quotient.reshape(N_CHUNKS, 4, 4)
        q_zeta = [0, 0, 0, 0]
        for r in range(N_CHUNKS):
            other = 1 - r
            l_num = ext_np.sub(zeta_n, ext_np.from_base(v[other]))
            denom_inv = pow((v[r] - v[other]) % P, P - 2, P)
            l_r = ext_np.scale(l_num, denom_inv)
            chunk_val = _canon_ext(
                np.asarray(ext4.from_base_cols(np.asarray(opened_q[r])))
            )
            q_zeta = ext_np.add(q_zeta, ext_np.mul(l_r, chunk_val))
        if not ext_np.eq(q_expected, q_zeta):
            return False

    # ---- verify Merkle openings ------------------------------------------
    for lm in heights:
        n_mats = sum(1 for x in log_ms if x == lm)
        n_perm = sum(
            1 for i in range(len(metas)) if log_ms[i] == lm and inter_counts[i]
        )
        n_pre = sum(
            1
            for i in range(len(metas))
            if log_ms[i] == lm and pre_traces[i] is not None
        )
        qos = list(proof.query_openings[lm].items())
        for pos, qo in qos:
            if qo.trace.index != pos or qo.quotient.index != pos:
                return False
            if n_perm and (qo.perm is None or qo.perm.index != pos):
                return False
            if n_pre and (qo.pre is None or qo.pre.index != pos):
                return False
        # one batched path walk per tree (all queries share the level
        # structure — each level is a single native compress call)
        if not merkle.verify_openings(
            proof.trace_roots[lm], [qo.trace for _, qo in qos],
            [1 << lm] * n_mats
        ):
            return False
        if not merkle.verify_openings(
            proof.quotient_roots[lm], [qo.quotient for _, qo in qos],
            [1 << lm] * n_mats
        ):
            return False
        if n_perm and not merkle.verify_openings(
            proof.perm_roots[lm], [qo.perm for _, qo in qos],
            [1 << lm] * n_perm
        ):
            return False
        if n_pre and not merkle.verify_openings(
            proof.pre_roots[lm], [qo.pre for _, qo in qos],
            [1 << lm] * n_pre
        ):
            return False

    # ---- derived codeword callbacks per height ---------------------------
    from ..fields.ext4 import W_INT as _W

    def _acc_cols(row_canon, opened_canon, gammas_np, gidx):
        """acc = sum_j gammas[gidx+j] * (row[j] - opened[j]) — vectorized
        over columns (the per-query python-int loop here dominated the
        whole 100-query verify on wide AIRs)."""
        w = len(row_canon)
        if w == 0:
            return [0, 0, 0, 0], gidx
        a = gammas_np[gidx : gidx + w]                       # (w, 4) u64
        oc = np.asarray(opened_canon, dtype=np.int64)        # (w, 4)
        # ext diff of a BASE row value: only coordinate 0 carries row[j]
        d = (-oc) % P
        d[:, 0] = (np.asarray(row_canon, dtype=np.int64) - oc[:, 0]) % P
        d = d.astype(np.uint64)
        c = np.zeros((7, w), dtype=np.uint64)
        for i in range(4):
            for j in range(4):
                # each term < p after the mod; <= 4 terms per k < 2^33
                c[i + j] += (a[:, i] * d[:, j]) % P
        for k in range(6, 3, -1):
            c[k - 4] = (c[k - 4] + _W * (c[k] % P)) % P
        acc = [int(c[k].sum() % P) for k in range(4)]
        return acc, gidx + w

    # total gamma terms
    pre_widths = [
        0 if p is None else int(p.shape[1]) for p in pre_traces
    ]
    total_terms = 0
    for i, (_, w, _) in enumerate(metas):
        total_terms += 2 * w + 4 * N_CHUNKS
        if inter_counts[i]:
            total_terms += 2 * (4 * inter_counts[i] + 4)
        total_terms += 2 * pre_widths[i]
    gammas = ext_np.powers(gamma_c, max(total_terms, 1))
    gammas_np = np.asarray(gammas, dtype=np.uint64)

    # per-AIR gamma offsets in prover order
    offsets = []
    off = 0
    for i, (_, w, _) in enumerate(metas):
        offsets.append(off)
        off += 2 * w
        if inter_counts[i]:
            off += 2 * (4 * inter_counts[i] + 4)
        off += 2 * pre_widths[i]
        off += 4 * N_CHUNKS

    def make_derived(lm):
        airs_here = [i for i in range(len(metas)) if log_ms[i] == lm]
        shift = _shift_for(lm, log_max, g)
        w_m_int = bb.two_adic_generator_int(lm)
        # hoist per-AIR canonical opened values out of the query loop
        canon = {}
        for i in airs_here:
            ov = proof.opened[i]
            canon[i] = (
                _canon_ext(ov.trace_zeta), _canon_ext(ov.trace_zeta_next),
                _canon_ext(ov.quotient),
                None if ov.perm_zeta is None else _canon_ext(ov.perm_zeta),
                None if ov.perm_zeta_next is None
                else _canon_ext(ov.perm_zeta_next),
                None if ov.pre_zeta is None else _canon_ext(ov.pre_zeta),
                None if ov.pre_zeta_next is None
                else _canon_ext(ov.pre_zeta_next),
            )

        def derived(idx: int):
            qo = proof.query_openings[lm].get(idx)
            if qo is None:
                raise KeyError(f"missing opening at height {lm} pos {idx}")
            x = (shift * pow(w_m_int, idx, P)) % P
            total = [0, 0, 0, 0]
            perm_slot = 0
            pre_slot = 0
            for slot, i in enumerate(airs_here):
                log_n, w, _ = metas[i]
                g_h = bb.two_adic_generator_int(log_n)
                zeta_g = ext_np.mul(zeta_c, ext_np.from_base(g_h))
                inv_xz = ext_np.inv(ext_np.sub(ext_np.from_base(x), zeta_c))
                inv_xzg = ext_np.inv(ext_np.sub(ext_np.from_base(x), zeta_g))
                trow = np.asarray(
                    bb.from_monty(np.asarray(qo.trace.rows[slot]))
                ).astype(np.int64)
                qrow = np.asarray(
                    bb.from_monty(np.asarray(qo.quotient.rows[slot]))
                ).astype(np.int64)
                t_z, t_zn, q_z, p_z, p_zn, e_z, e_zn = canon[i]
                gidx = offsets[i]
                a1, gidx = _acc_cols(trow, t_z, gammas_np, gidx)
                a2, gidx = _acc_cols(trow, t_zn, gammas_np, gidx)
                term = ext_np.add(
                    ext_np.mul(a1, inv_xz), ext_np.mul(a2, inv_xzg)
                )
                if inter_counts[i]:
                    prow = np.asarray(
                        bb.from_monty(np.asarray(qo.perm.rows[perm_slot]))
                    ).astype(np.int64)
                    perm_slot += 1
                    a3, gidx = _acc_cols(prow, p_z, gammas_np, gidx)
                    a4, gidx = _acc_cols(prow, p_zn, gammas_np, gidx)
                    term = ext_np.add(
                        term,
                        ext_np.add(
                            ext_np.mul(a3, inv_xz), ext_np.mul(a4, inv_xzg)
                        ),
                    )
                if pre_widths[i]:
                    erow = np.asarray(
                        bb.from_monty(np.asarray(qo.pre.rows[pre_slot]))
                    ).astype(np.int64)
                    pre_slot += 1
                    a6, gidx = _acc_cols(erow, e_z, gammas_np, gidx)
                    a7, gidx = _acc_cols(erow, e_zn, gammas_np, gidx)
                    term = ext_np.add(
                        term,
                        ext_np.add(
                            ext_np.mul(a6, inv_xz), ext_np.mul(a7, inv_xzg)
                        ),
                    )
                a5, gidx = _acc_cols(qrow, q_z, gammas_np, gidx)
                term = ext_np.add(term, ext_np.mul(a5, inv_xz))
                total = ext_np.add(total, term)
            return np.array(total, dtype=np.uint64)

        return derived

    derived_map = {lm: make_derived(lm) for lm in heights}

    return fri.verify(
        proof.fri_proof, log_max, g, config.fri, ch, derived_map
    )

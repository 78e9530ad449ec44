"""Single-AIR STARK verifier (host-side; openings are tiny).

Mirrors the check structure of the reference's in-SDK verification
(`Sdk::verify_proof` self-check at /root/reference/crates/prover/src/prover/
mod.rs:407-411 and UniversalVerifier at crates/verifier/src/verifier.rs:38-85):
transcript replay, out-of-domain constraint check (DEEP-ALI), Merkle path
checks, and FRI fold verification.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import jax.numpy as jnp

from ..fields import babybear as bb
from ..fields import ext4
from ..models.air import Air, PointBuilder, LOG_QUOTIENT_DEGREE
from ..utils import ext_np
from . import domain, fri, merkle
from .challenger import Challenger
from .config import StarkConfig
from .prover import StarkProof, _observe_opened

P = bb.P


def _canon_ext(arr) -> List[List[int]]:
    """Montgomery (…,4) array -> canonical nested lists."""
    c = np.asarray(bb.from_monty(np.asarray(arr, dtype=np.uint32)))
    return c.astype(np.int64).tolist()


def verify(
    air: Air,
    proof: StarkProof,
    config: Optional[StarkConfig] = None,
) -> bool:
    config = config or StarkConfig()
    log_n = proof.log_n
    n = 1 << log_n
    log_blowup = config.log_blowup
    m = n << log_blowup
    w = proof.width
    g = config.coset_shift % P
    w_m_int = bb.two_adic_generator_int(log_n + log_blowup)
    n_chunks = 1 << LOG_QUOTIENT_DEGREE

    # ---- transcript replay ------------------------------------------------
    ch = Challenger()
    ch.observe_canonical_u32(log_n)
    ch.observe_canonical_u32(w)
    for pv in proof.public_values:
        ch.observe_canonical_u32(int(pv))
    ch.observe_slice(proof.trace_root)
    alpha = ch.sample_ext()
    ch.observe_slice(proof.quotient_root)
    zeta = ch.sample_ext()
    _observe_opened(
        ch, proof.opened_trace_zeta, proof.opened_trace_zeta_next,
        proof.opened_quotient.reshape(-1, 4),
    )
    gamma = ch.sample_ext()

    zeta_c = _canon_ext(np.asarray(zeta))
    gamma_c = _canon_ext(np.asarray(gamma))

    # ---- out-of-domain constraint check (DEEP-ALI) ------------------------
    sels_z = domain.selectors_at_point_ext(log_n, zeta)
    pvs_m = [bb.to_monty_int(int(v) % P) for v in proof.public_values]
    # host numpy: the point evaluation walks every constraint expression —
    # eager jax here would dispatch one device op per expression node
    pb = PointBuilder(
        np.asarray(proof.opened_trace_zeta),
        np.asarray(proof.opened_trace_zeta_next),
        sels_z,
        pvs_m,
    )
    air.eval(pb)
    alpha_c = _canon_ext(np.asarray(alpha))
    acc = [0, 0, 0, 0]
    apow = ext_np.from_base(1)
    for cons in pb.constraints:
        c_val = _canon_ext(np.asarray(cons))
        acc = ext_np.add(acc, ext_np.mul(apow, c_val))
        apow = ext_np.mul(apow, alpha_c)
    inv_zh = _canon_ext(np.asarray(sels_z["inv_zh"]))
    q_expected = ext_np.mul(acc, inv_zh)

    # reconstruct q(zeta) from chunk openings
    opened_q = proof.opened_quotient  # (n_chunks, 4 basecol, 4 extcoord)
    v = [pow((g * pow(w_m_int, r, P)) % P, n, P) for r in range(n_chunks)]
    zeta_n = ext_np.exp(zeta_c, n)
    q_zeta = [0, 0, 0, 0]
    # ext basis: e_c = x^c in F_p[x]/(x^4-11)
    for r in range(n_chunks):
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

    # ---- query openings: Merkle paths + derived DEEP values ---------------
    t_at_z = _canon_ext(proof.opened_trace_zeta)        # (w, 4)
    t_at_zn = _canon_ext(proof.opened_trace_zeta_next)  # (w, 4)
    q_at_z = _canon_ext(proof.opened_quotient.reshape(n_chunks * 4, 4))
    gammas = ext_np.powers(gamma_c, 2 * w + 4 * n_chunks)
    g_h = bb.two_adic_generator_int(log_n)
    zeta_g = ext_np.mul(zeta_c, ext_np.from_base(g_h))

    qos = list(proof.query_openings.items())
    for pos, qo in qos:
        if qo.trace.index != pos or qo.quotient.index != pos:
            return False
    if not merkle.verify_openings(
        proof.trace_root, [qo.trace for _, qo in qos], [m]
    ):
        return False
    if not merkle.verify_openings(
        proof.quotient_root, [qo.quotient for _, qo in qos], [m]
    ):
        return False

    def initial_values(idx: int):
        qo = proof.query_openings.get(idx)
        if qo is None:
            raise KeyError(f"missing query opening at {idx}")
        x = (g * pow(w_m_int, idx, P)) % P
        trow = np.asarray(
            bb.from_monty(np.asarray(qo.trace.rows[0]))
        ).astype(np.int64)
        qrow = np.asarray(
            bb.from_monty(np.asarray(qo.quotient.rows[0]))
        ).astype(np.int64)
        inv_xz = ext_np.inv(ext_np.sub(ext_np.from_base(x), zeta_c))
        inv_xzg = ext_np.inv(ext_np.sub(ext_np.from_base(x), zeta_g))
        acc1 = [0, 0, 0, 0]
        acc2 = [0, 0, 0, 0]
        acc3 = [0, 0, 0, 0]
        for j in range(w):
            d1 = ext_np.sub(ext_np.from_base(int(trow[j])), t_at_z[j])
            acc1 = ext_np.add(acc1, ext_np.mul(gammas[j], d1))
            d2 = ext_np.sub(ext_np.from_base(int(trow[j])), t_at_zn[j])
            acc2 = ext_np.add(acc2, ext_np.mul(gammas[w + j], d2))
        for k in range(4 * n_chunks):
            d3 = ext_np.sub(ext_np.from_base(int(qrow[k])), q_at_z[k])
            acc3 = ext_np.add(acc3, ext_np.mul(gammas[2 * w + k], d3))
        out = ext_np.add(
            ext_np.mul(ext_np.add(acc1, acc3), inv_xz),
            ext_np.mul(acc2, inv_xzg),
        )
        return np.array(out, dtype=np.uint64)

    # ---- FRI --------------------------------------------------------------
    return fri.verify(
        proof.fri_proof, log_n + log_blowup, g, config.fri, ch, initial_values
    )

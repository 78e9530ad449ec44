"""Evaluation-domain helpers: vanishing polynomials and Lagrange selectors on
cosets, vectorized for the LDE pass and symbolic at out-of-domain points.

Structure mirrors p3's TwoAdicMultiplicativeCoset selector computation
(reference drives it through openvm-stark-backend; SURVEY.md §2.2) but on
natural-order domains.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import babybear as bb
from ..fields import ext4


@functools.lru_cache(maxsize=None)
def selectors_on_coset(log_n: int, log_blowup: int, shift_int: int):
    """Selector arrays on the LDE coset shift*G_m, m = n<<log_blowup.

    Returns dict of (m,) Montgomery uint32 device arrays:
      first      = Z_H(x) / (x - 1)
      last       = Z_H(x) / (x - g_H^{-1})
      transition = x - g_H^{-1}
      inv_zh     = 1 / Z_H(x)
    """
    n = 1 << log_n
    m = n << log_blowup
    w_m = bb.two_adic_generator_int(log_n + log_blowup)
    g_h_inv = pow(bb.two_adic_generator_int(log_n), bb.P - 2, bb.P)

    # x values: host table (m,) — fine up to 2^22ish; beyond that switch to
    # on-device power ladders.
    x = bb.powers_int(w_m, m).astype(np.uint64)
    x = (x * (shift_int % bb.P)) % bb.P

    xn = np.array([pow(int(v), n, bb.P) for v in x[: 1 << log_blowup]])
    # x^n is constant on each coset of H: period = blowup in natural order
    xn_full = np.tile(xn, n)
    zh = (xn_full + bb.P - 1) % bb.P

    # host numpy end-to-end: the results are cached as numpy anyway, and a
    # jnp round-trip would run on whatever platform jax initialised
    x_m = np.array([bb.to_monty_int(int(v)) for v in x], np.uint32)
    zh_m = np.array([bb.to_monty_int(int(v)) for v in zh], np.uint32)
    one_m = np.full((m,), bb.ONE, dtype=np.uint32)
    ghinv_m = np.uint32(bb.to_monty_int(g_h_inv))

    xm1 = bb.sub(x_m, one_m)
    xmg = bb.sub(x_m, np.full((m,), ghinv_m, dtype=np.uint32))
    inv_xm1 = bb.inv(xm1)
    inv_xmg = bb.inv(xmg)
    inv_zh = bb.inv(zh_m)
    # Cached as numpy (forced off-device): this function must only run
    # eagerly — lru_cache + jit tracing would leak tracers otherwise.
    return {
        "first": np.asarray(bb.mul(zh_m, inv_xm1)),
        "last": np.asarray(bb.mul(zh_m, inv_xmg)),
        "transition": np.asarray(xmg),
        "inv_zh": np.asarray(inv_zh),
        "x": np.asarray(x_m),
    }


def selectors_at_point_ext(log_n: int, zeta_ext):
    """Same selectors at an extension point zeta. Returns dict of (4,) ext.
    Backend follows zeta_ext (numpy on the host verifier path)."""
    n = 1 << log_n
    xp = bb._mod(zeta_ext)
    g_h_inv = pow(bb.two_adic_generator_int(log_n), bb.P - 2, bb.P)
    zeta_n = ext4.exp_const(zeta_ext, n)
    one = ext4.one(xp=xp)
    zh = ext4.sub(zeta_n, one)
    zm1 = ext4.sub(zeta_ext, one)
    zmg = ext4.sub(zeta_ext, ext4.from_ints([g_h_inv, 0, 0, 0]))
    return {
        "first": ext4.mul(zh, ext4.inv(zm1)),
        "last": ext4.mul(zh, ext4.inv(zmg)),
        "transition": zmg,
        "zh": zh,
        "inv_zh": ext4.inv(zh),
    }

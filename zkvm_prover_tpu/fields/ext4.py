"""Quartic binomial extension F_{p^4} = F_p[x]/(x^4 - W), W = 11, over BabyBear.

Matches the structure of the reference's challenge field (Plonky3
`BinomialExtensionField<BabyBear, 4>` used by openvm-stark-backend for FRI
challenges and quotient accumulation; SURVEY.md §2.2 "quartic extension").

Representation: a uint32 jnp array whose **last axis has size 4** holds the
coefficients [a0, a1, a2, a3] (each in Montgomery form), meaning
a0 + a1*x + a2*x^2 + a3*x^3. All ops are elementwise over leading axes, so a
batch of N extension elements is an (N, 4) array — TPU-lane friendly.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import babybear as bb

W_INT = 11
W = np.uint32(bb.to_monty_int(W_INT))
# Frobenius: x^p = DTH_ROOT * x with DTH_ROOT = W^((p-1)/4)
DTH_ROOT_INT = pow(W_INT, (bb.P - 1) // 4, bb.P)
DTH_ROOT = np.uint32(bb.to_monty_int(DTH_ROOT_INT))

D = 4


def zero(shape=(), xp=jnp):
    return xp.zeros((*shape, D), dtype=xp.uint32)


def one(shape=(), xp=jnp):
    z = np.zeros((*shape, D), dtype=np.uint32)
    z[..., 0] = bb.ONE
    return xp.asarray(z)


def from_base(a):
    """Embed base-field array (Montgomery) into the extension (append zeros)."""
    if isinstance(a, bb._NP_TYPES):
        a = np.asarray(a, dtype=np.uint32)
        z = np.zeros((*a.shape, D), dtype=np.uint32)
        z[..., 0] = a
        return z
    a = jnp.asarray(a, dtype=jnp.uint32)
    z = jnp.zeros((*a.shape, D), dtype=jnp.uint32)
    return z.at[..., 0].set(a)


def from_ints(coeffs) -> np.ndarray:
    """Python-int canonical coefficients -> Montgomery ext element (numpy;
    promotes to jax on contact with jax values)."""
    return np.asarray(
        [bb.to_monty_int(int(v) % bb.P) for v in coeffs], dtype=np.uint32
    )


def to_ints(a) -> list:
    c = np.asarray(bb.from_monty(a))
    return [int(v) for v in c.reshape(-1, D)[0]] if c.ndim else list(c)


def add(a, b):
    return bb.add(a, b)


def sub(a, b):
    return bb.sub(a, b)


def neg(a):
    return bb.neg(a)


def scale(a, s):
    """Multiply ext element(s) by base-field scalar(s) (Montgomery form)."""
    xp = bb._mod(a, s)
    return bb.mul(a, xp.asarray(s, dtype=xp.uint32)[..., None])


_P64 = np.uint64(bb.P)
_NP64 = np.uint64(bb.NP)
_M32_64 = np.uint64(0xFFFFFFFF)
_S32_64 = np.uint64(32)
_W64 = np.uint64(int(W))


def _redc64(t):
    """Montgomery REDC of exact uint64 products t < p^2."""
    m_ = ((t & _M32_64) * _NP64) & _M32_64
    u = (t + m_ * _P64) >> _S32_64
    return np.where(u >= _P64, u - _P64, u)


def _mul_np(a, b):
    """numpy outer-product variant (testing/reference only): measured
    SLOWER than `mul` on the host path — the (..., 4, 4) strided
    coefficient extraction dominates; kept for the bit-identity test."""
    with np.errstate(over="ignore"):
        a64 = np.asarray(a, np.uint64)
        b64 = np.asarray(b, np.uint64)
        p = _redc64(a64[..., :, None] * b64[..., None, :])  # (..., i, j)

        def addm(x, y):
            s = x + y
            return np.where(s >= _P64, s - _P64, s)

        w0 = _redc64(addm(addm(p[..., 1, 3], p[..., 2, 2]),
                          p[..., 3, 1]) * _W64)
        w1 = _redc64(addm(p[..., 2, 3], p[..., 3, 2]) * _W64)
        w2 = _redc64(p[..., 3, 3] * _W64)
        c0 = addm(p[..., 0, 0], w0)
        c1 = addm(addm(p[..., 0, 1], p[..., 1, 0]), w1)
        c2 = addm(addm(p[..., 0, 2], p[..., 1, 1]),
                  addm(p[..., 2, 0], w2))
        c3 = addm(addm(p[..., 0, 3], p[..., 1, 2]),
                  addm(p[..., 2, 1], p[..., 3, 0]))
        return np.stack([c0, c1, c2, c3], axis=-1).astype(np.uint32)


# Native wins at every size on the host path: a single scalar ext mul is
# ~15us through ctypes vs ~230us through the 19-bb.mul numpy fallback
# (measured round 5) — the numpy fallback only serves native-unavailable
# builds.
_NATIVE_MIN_ELEMS = 1


def mul(a, b):
    """Extension product modulo x^4 - W. 16 base muls + 3 W-muls.

    numpy inputs route through the native C++ batch kernel
    (ops/p2_native.ext4_mul, bit-identical) — one fused pass per element
    vs ~100 numpy temporaries; the jax device path is unchanged."""
    xp = bb._mod(a, b)
    if xp is np:
        a_arr = np.asarray(a, dtype=np.uint32)
        b_arr = np.asarray(b, dtype=np.uint32)
        shape = np.broadcast_shapes(a_arr.shape, b_arr.shape)
        if shape[-1] == 4 and int(np.prod(shape)) >= _NATIVE_MIN_ELEMS:
            from ..ops import p2_native

            out = p2_native.ext4_mul(
                np.broadcast_to(a_arr, shape),
                np.broadcast_to(b_arr, shape), int(W))
            if out is not None:
                return out
    a0, a1, a2, a3 = (a[..., i] for i in range(4))
    b0, b1, b2, b3 = (b[..., i] for i in range(4))
    m = bb.mul
    s = bb.add

    c0 = s(m(a0, b0), m(W, s(s(m(a1, b3), m(a2, b2)), m(a3, b1))))
    c1 = s(s(m(a0, b1), m(a1, b0)), m(W, s(m(a2, b3), m(a3, b2))))
    c2 = s(s(m(a0, b2), m(a1, b1)), s(m(a2, b0), m(W, m(a3, b3))))
    c3 = s(s(m(a0, b3), m(a1, b2)), s(m(a2, b1), m(a3, b0)))
    return xp.stack([c0, c1, c2, c3], axis=-1)


def mul_base(a, b):
    """Ext * base (b broadcast over the coefficient axis)."""
    xp = bb._mod(a, b)
    return bb.mul(a, xp.asarray(b, dtype=xp.uint32)[..., None])


def square(a):
    return mul(a, a)


def from_base_cols(cols):
    """Reassemble ext value(s) from 4 separately-opened base columns:
    cols: (..., 4 basecol, 4 extcoord) -> sum_c cols[..., c, :] * x^c."""
    import numpy as _np

    xp = bb._mod(cols)
    acc = cols[..., 0, :]
    for c in range(1, 4):
        basis = _np.zeros(4, dtype=_np.uint32)
        basis[c] = bb.ONE
        acc = add(acc, mul(cols[..., c, :], xp.asarray(basis)))
    return acc


def frobenius(a, k: int = 1):
    """a -> a^(p^k), i.e. coefficient i scaled by DTH_ROOT^(i*k)."""
    scal = np.ones(4, dtype=np.uint64)
    r = pow(DTH_ROOT_INT, k, bb.P)
    acc = 1
    vals = []
    for i in range(4):
        vals.append(bb.to_monty_int(acc))
        acc = (acc * r) % bb.P
    scal = np.asarray(vals, dtype=np.uint32)
    if bb._mod(a) is not np:
        scal = jnp.asarray(scal)
    return bb.mul(a, scal)


def inv(a):
    """Inverse via the norm map: a^{-1} = (∏_{k=1..3} a^{p^k}) / Norm(a)."""
    f1 = frobenius(a, 1)
    f2 = frobenius(a, 2)
    f3 = frobenius(a, 3)
    conj = mul(f1, mul(f2, f3))
    norm_full = mul(a, conj)
    # Norm(a) lies in the base field: its x^1..x^3 coefficients are 0.
    norm = norm_full[..., 0]
    return mul_base(conj, bb.inv(norm))


def exp_const(a, e: int):
    result = None
    base = a
    while e > 0:
        if e & 1:
            result = base if result is None else mul(result, base)
        base = mul(base, base)
        e >>= 1
    if result is None:
        xp = bb._mod(a)
        return xp.broadcast_to(one(xp=xp), a.shape)
    return result


def powers(base, n: int):
    """[1, base, ..., base^(n-1)] — (n, 4) array; base a single ext element."""
    import jax

    def step(c, _):
        nxt = mul(c, base)
        return nxt, c

    _, ys = jax.lax.scan(step, one(), None, length=n)
    return ys

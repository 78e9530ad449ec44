"""BabyBear prime field (p = 15 * 2**27 + 1 = 2013265921) as vectorized uint32
lane kernels for TPU.

Design (TPU-first, cf. /root/repo/SURVEY.md §7 Phase 1):

- Elements are stored as ``jnp.uint32`` arrays in **Montgomery form** with
  R = 2**32 (same in-memory convention as the reference's Plonky3 backend,
  `p3-baby-bear`; cf. reference use at /root/reference/Cargo.lock p3-baby-bear
  0.4.3). Montgomery form means an element x is stored as x*R mod p.
- All arithmetic is expressed with 16-bit limb decompositions so that every
  multiply is an exact 16x16->32 ``uint32`` multiply — the widest exact integer
  multiply the TPU VPU lowers efficiently. No 64-bit integers are used
  anywhere, so every function here works identically under jit on TPU, inside
  Pallas kernels, and on the CPU backend.
- Functions are shape-polymorphic and elementwise; XLA fuses chains of them
  into single VPU loops.

Reference behavior being matched (not copied): Plonky3 `MontyField31`
arithmetic as driven by openvm-stark-backend (SURVEY.md §2.2).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Field constants (computed with Python bignum at import time, baked as
# uint32 literals into every jitted program).
# ---------------------------------------------------------------------------

P = 2013265921  # 15 * 2**27 + 1
TWO_ADICITY = 27
# Smallest multiplicative generator of F_p^* (order p-1). 31 generates the
# full group for BabyBear.
GENERATOR = 31

MONTY_BITS = 32
R = (1 << MONTY_BITS) % P          # R mod p      (Montgomery "one")
R2 = (R * R) % P                   # R^2 mod p    (to_monty multiplier)
# NP = -p^{-1} mod 2^32: p * NP ≡ -1 (mod 2^32)
NP = (-pow(P, -1, 1 << 32)) % (1 << 32)

_U32 = jnp.uint32
MASK16 = np.uint32(0xFFFF)

# Backend dispatch: every elementwise kernel here runs EITHER on numpy
# (host-orchestrated phases — constraint eval over small traces, trace
# builders, debug checks — where per-op jax dispatch overhead dominates) OR
# on jax (jitted device kernels). numpy inputs stay numpy; anything jax-ish
# (tracers, device arrays, python scalars mixed with jax) goes through jnp.
_NP_TYPES = (np.ndarray, np.generic, int, np.integer)

# Unsigned wraparound is the *mechanism* of the kernels here (Montgomery
# REDC, borrow chains). numpy arrays (ndim >= 1) wrap silently, but numpy
# SCALARS and 0-d arrays emit RuntimeWarnings. Rather than flipping
# process-wide np.seterr (a global side effect that would mask real
# overflow bugs in unrelated importer code), scope the suppression to
# scalar-shaped invocations of the wraparound kernels: the array hot path
# pays only an isinstance/ndim check.
def _scalar_overflow_ok(fn):
    import functools

    @functools.wraps(fn)
    def wrapper(*args):
        for a in args:
            if isinstance(a, np.ndarray):
                if a.ndim == 0:
                    break  # 0-d: intermediates become warning scalars
            elif isinstance(a, (int, np.integer)):
                break
            else:
                return fn(*args)  # jax types: no numpy warnings
        else:
            return fn(*args)  # all args are >=1-d numpy arrays
        with np.errstate(over="ignore"):
            return fn(*args)

    return wrapper


def _mod(*xs):
    for x in xs:
        if not isinstance(x, _NP_TYPES):
            return jnp
    return np


def _u32(x):
    return jnp.asarray(x, dtype=_U32)


def _cast(m, x):
    return m.asarray(x, dtype=m.uint32)


# ---------------------------------------------------------------------------
# 32x32 -> 64 multiply emulated with 16-bit limbs (4 exact uint32 multiplies)
# ---------------------------------------------------------------------------

@_scalar_overflow_ok
def mul32_wide(a, b):
    """Full 64-bit product of two uint32 arrays, returned as (hi, lo) uint32."""
    m = _mod(a, b)
    a = _cast(m, a)
    b = _cast(m, b)
    a0 = a & MASK16
    a1 = a >> 16
    b0 = b & MASK16
    b1 = b >> 16
    lolo = a0 * b0          # < 2^32, exact
    hilo = a1 * b0          # < 2^32, exact
    lohi = a0 * b1          # < 2^32, exact
    hihi = a1 * b1          # < 2^32, exact
    # mid = hilo + lohi, may carry out of 32 bits
    mid = hilo + lohi
    carry_mid = (mid < hilo).astype(m.uint32)
    lo = lolo + (mid << 16)
    carry_lo = (lo < lolo).astype(m.uint32)
    hi = hihi + (mid >> 16) + (carry_mid << 16) + carry_lo
    return hi, lo


@_scalar_overflow_ok
def mul32_lo(a, b):
    """Low 32 bits of a*b (3 exact multiplies)."""
    m = _mod(a, b)
    a = _cast(m, a)
    b = _cast(m, b)
    a0 = a & MASK16
    a1 = a >> 16
    b0 = b & MASK16
    b1 = b >> 16
    return a0 * b0 + ((a0 * b1 + a1 * b0) << 16)


# ---------------------------------------------------------------------------
# Montgomery arithmetic. All values in [0, p).
# ---------------------------------------------------------------------------

@_scalar_overflow_ok
def mont_reduce(hi, lo):
    """REDC: given t = hi*2^32 + lo < p*2^32, return t * R^{-1} mod p."""
    xp = _mod(hi, lo)
    m = mul32_lo(lo, np.uint32(NP))
    mp_hi, mp_lo = mul32_wide(m, np.uint32(P))
    # lo + mp_lo ≡ 0 (mod 2^32) exactly; carry out is 1 unless both are 0.
    carry = (_cast(xp, lo) != 0).astype(xp.uint32)
    u = _cast(xp, hi) + mp_hi + carry
    return xp.where(u >= np.uint32(P), u - np.uint32(P), u)


_P64 = np.uint64(P)
_NP64 = np.uint64(NP)
_M32_64 = np.uint64(0xFFFFFFFF)
_S32_64 = np.uint64(32)


# Above this size the native fused C++ kernel beats numpy's multi-pass
# uint64 REDC (measured round 5, second pass, on a 2-core host with the
# work-gated thread spawn: parity at 2^8, 1.7x at 2^12, 3x at 2^14, 4x at
# 2^20 — numpy's uint64 temporaries fall out of cache, and broadcast
# patterns win even earlier via the fused rows/cols/outer kernels);
# below it, numpy wins on call overhead.
_NATIVE_MUL_MIN = 1 << 9


def mul(a, b):
    """Montgomery product: (a*b*R^{-1}) mod p. Inputs/outputs Montgomery form.

    numpy path: direct uint64 REDC (t + m*p < 2^62 + 2^63 stays exact) —
    ~4x fewer ops than the 16-bit-limb emulation, which exists for the
    32-bit jax/TPU lanes and stays the device path. Large same-shape (or
    scalar-broadcast) products route through the fused native C++ kernel."""
    if _mod(a, b) is np:
        a_arr = np.asarray(a, np.uint32)
        b_arr = np.asarray(b, np.uint32)
        big = max(a_arr.size, b_arr.size)
        if big >= _NATIVE_MUL_MIN:
            from ..ops import p2_native

            if a_arr.size == 1 and b_arr.size > 1:
                a_arr, b_arr = b_arr, a_arr
            out = p2_native.bb_mul(a_arr, b_arr)
            if out is not None:
                return out
        with np.errstate(over="ignore"):
            t = np.asarray(a, np.uint64) * np.asarray(b, np.uint64)
            m_ = ((t & _M32_64) * _NP64) & _M32_64
            u = (t + m_ * _P64) >> _S32_64
            return np.where(u >= _P64, u - _P64, u).astype(np.uint32)
    hi, lo = mul32_wide(a, b)
    return mont_reduce(hi, lo)


_R16_MOD_P = np.uint64((1 << 16) % P)
_R32_MOD_P = np.uint64((1 << 32) % P)


def mont_matmul_np(a_mont: np.ndarray, b_mont: np.ndarray) -> np.ndarray:
    """Exact modular matmul of Montgomery operands, Montgomery result:
    C[i, j] = (sum_k a[i,k] * b[k,j]) * R^{-1} mod p.

    Computed as four float64 BLAS GEMMs on 16-bit halves (each dot
    accumulates < 2^32 * k <= 2^53 for k <= 2^21 — exact in float64),
    recombined mod p, then one REDC-by-1 to strip the extra R. Host-path
    workhorse for dense combine-and-sum patterns (DEEP batch combination,
    OOD poly evaluation)."""
    a = np.asarray(a_mont, np.uint32)
    b = np.asarray(b_mont, np.uint32)
    assert a.shape[-1] == b.shape[0] and a.shape[-1] <= (1 << 21)
    from ..ops import p2_native

    out = p2_native.mont_matmul(a, b)
    if out is not None:
        return out
    al = (a & 0xFFFF).astype(np.float64)
    ah = (a >> 16).astype(np.float64)
    bl = (b & 0xFFFF).astype(np.float64)
    bh = (b >> 16).astype(np.float64)
    ll = (al @ bl).astype(np.uint64)
    mid = (al @ bh).astype(np.uint64) + (ah @ bl).astype(np.uint64)
    hh = (ah @ bh).astype(np.uint64)
    t = (ll % _P64 + (mid % _P64) * _R16_MOD_P
         + (hh % _P64) * _R32_MOD_P) % _P64
    # t = R^2 * (a.b) mod p; one Montgomery reduce by 1 -> R * (a.b)
    return mul(t.astype(np.uint32), np.uint32(1))


@_scalar_overflow_ok
def add(a, b):
    xp = _mod(a, b)
    s = _cast(xp, a) + _cast(xp, b)  # both < p < 2^31 — no wraparound
    return xp.where(s >= np.uint32(P), s - np.uint32(P), s)


@_scalar_overflow_ok
def sub(a, b):
    xp = _mod(a, b)
    a = _cast(xp, a)
    b = _cast(xp, b)
    d = a - b  # wraps when a < b
    return xp.where(a >= b, d, d + np.uint32(P))


def neg(a):
    xp = _mod(a)
    a = _cast(xp, a)
    return xp.where(a == 0, a, np.uint32(P) - a)


def double(a):
    return add(a, a)


def to_monty(a):
    """Canonical uint32 (< p) -> Montgomery form."""
    hi, lo = mul32_wide(a, np.uint32(R2))
    return mont_reduce(hi, lo)


def from_monty(a):
    """Montgomery form -> canonical uint32 (< p)."""
    xp = _mod(a)
    a = _cast(xp, a)
    return mont_reduce(xp.zeros_like(a), a)


ZERO = np.uint32(0)
ONE = np.uint32(R)                    # 1 in Montgomery form
TWO = np.uint32((2 * R) % P)
NEG_ONE = np.uint32((P - R) % P)


def full_mul(a, b):
    """Field product of canonical-form inputs, canonical-form output.

    Two REDC passes; use only at boundaries — hot paths stay in Montgomery.
    """
    return from_monty(mul(to_monty(a), to_monty(b)))


# ---------------------------------------------------------------------------
# Exponentiation / inversion (vectorized, fixed 31-iteration ladder)
# ---------------------------------------------------------------------------

def exp_const(a, e: int):
    """a ** e for a static Python exponent; a in Montgomery form."""
    result = None
    base = a
    while e > 0:
        if e & 1:
            result = base if result is None else mul(result, base)
        base = mul(base, base)
        e >>= 1
    if result is None:
        xp = _mod(a)
        return xp.full(np.shape(a) if xp is np else jnp.shape(a), ONE,
                       dtype=xp.uint32)
    return result


def inv(a):
    """Field inverse via a^(p-2); a in Montgomery form. inv(0) returns 0."""
    return exp_const(a, P - 2)


def batch_inv(a):
    """Montgomery's batched-inversion trick along the last axis.

    For long vectors this replaces n inversions with 1 inversion + 3n muls.
    Zero entries are mapped to zero (matching `inv`).
    """
    flat = a.reshape(-1)
    safe = jnp.where(flat == 0, ONE, flat)
    prefix = jnp.concatenate(
        [jnp.full((1,), ONE, dtype=_U32), _cumprod(safe)[:-1]]
    )
    total = mul(prefix[-1], safe[-1])
    inv_total = inv(total)
    suffix = _cumprod_rev(safe)
    # suffix[i] = prod_{j>i} safe[j]
    out = mul(mul(prefix, suffix), inv_total)
    out = jnp.where(flat == 0, jnp.uint32(0), out)
    return out.reshape(a.shape)


def _cumprod(x):
    import jax

    def step(c, v):
        c2 = mul(c, v)
        return c2, c2

    _, ys = jax.lax.scan(step, jnp.full((), ONE, dtype=_U32), x)
    return ys


def _cumprod_rev(x):
    import jax

    def step(c, v):
        out = c
        c2 = mul(c, v)
        return c2, out

    _, ys = jax.lax.scan(step, jnp.full((), ONE, dtype=_U32), x, reverse=True)
    return ys


# ---------------------------------------------------------------------------
# Two-adic roots of unity
# ---------------------------------------------------------------------------

def two_adic_generator_int(bits: int) -> int:
    """Canonical-form generator of the order-2^bits subgroup (Python int).

    Derived as g^( (p-1) / 2^bits ) with g = 31, matching the standard
    Plonky3 derivation (root of the maximal 2-adic subgroup raised to a
    power of two).
    """
    assert 0 <= bits <= TWO_ADICITY
    return pow(GENERATOR, (P - 1) >> bits, P)


def powers_int(base: int, n: int) -> np.ndarray:
    """[1, base, base^2, ..., base^(n-1)] canonical form as numpy uint32."""
    out = np.empty(n, dtype=np.uint64)
    acc = 1
    for i in range(n):
        out[i] = acc
        acc = (acc * base) % P
    return out.astype(np.uint32)


def to_monty_int(x: int) -> int:
    return (x * R) % P


def from_monty_int(x: int) -> int:
    return (x * pow(R, -1, P)) % P

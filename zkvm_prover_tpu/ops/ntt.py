"""Radix-2 NTT / coset LDE over BabyBear, batched column-wise, TPU-first.

Re-designs the reference's LDE stage (Plonky3 `p3-dft` Radix2Dit driven by
openvm-stark-backend; SURVEY.md §2.2 "STARK prover" row) for XLA:

- A polynomial batch is an (N, W) uint32 matrix (Montgomery form): axis 0 is
  the evaluation/coefficient index, axis 1 the trace columns. Every butterfly
  stage is ONE reshape + elementwise mul/add/sub over the whole matrix — XLA
  fuses each stage into a single VPU pass; there are log2(N) passes.
- No gathers anywhere on the hot path. We use decimation-in-frequency (DIF)
  for natural->bit-reversed and decimation-in-time (DIT) for
  bit-reversed->natural, so forward+inverse round trips and the LDE never
  materialize a bit-reversal permutation.
- Domain convention: **natural order** cosets. FRI folding then combines the
  two contiguous halves of the array (x and -x live at j and j+N/2), which is
  the TPU-friendly layout (contiguous slabs, no strided pairs). This
  deliberately differs from Plonky3's bit-reversed storage; it is an internal
  layout choice with identical math.
- Twiddle tables are precomputed host-side per (log_n, direction) and cached
  as device arrays (Montgomery form).

The multi-chip variant (butterfly stages local until the stride crosses the
shard boundary, then `all_to_all` re-shard) lives in parallel/ntt_sharded.py.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import babybear as bb

# ---------------------------------------------------------------------------
# Twiddle caches (host-side numpy; uploaded once per size)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _stage_twiddles(log_n: int, inverse: bool):
    """Per-stage twiddle tables, Montgomery form.

    stage s (1-indexed, block half-size h = 2^(s-1)) uses w_{2h}^j for
    j in [0, h) where w_{2h} is the canonical order-2h root (inverse root if
    inverse=True).
    """
    tables = []
    for s in range(1, log_n + 1):
        h = 1 << (s - 1)
        w = bb.two_adic_generator_int(s)
        if inverse:
            w = pow(w, bb.P - 2, bb.P)
        tw = bb.powers_int(w, h)
        tw_m = np.array(
            [bb.to_monty_int(int(v)) for v in tw], dtype=np.uint32
        )
        # plain numpy: jnp arrays created inside a jit trace would leak
        # tracers out of the lru_cache
        tables.append(tw_m)
    return tables


@functools.lru_cache(maxsize=None)
def _n_inv_monty(log_n: int) -> np.uint32:
    n_inv = pow(1 << log_n, bb.P - 2, bb.P)
    return np.uint32(bb.to_monty_int(n_inv))


@functools.lru_cache(maxsize=None)
def _bitrev_perm(log_n: int):
    n = 1 << log_n
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev


@functools.lru_cache(maxsize=None)
def _powers_bitrev_monty(base_int: int, log_n: int):
    """[base^bitrev(j) for j] in Montgomery form (host precompute)."""
    n = 1 << log_n
    pw = bb.powers_int(base_int, n)  # canonical
    rev = _bitrev_perm(log_n)
    return np.array([bb.to_monty_int(int(pw[r])) for r in rev], dtype=np.uint32)


# ---------------------------------------------------------------------------
# Core transforms
# ---------------------------------------------------------------------------


# Above this size the jax path uses the four-step decomposition: two
# half-length stage sweeps over a (n1, n2) matrix layout instead of log_n
# strided passes. Measured on v5e (round 5): 7.3 -> 51 Gbf/s at 2^20x8
# (~100% of HBM roofline vs ~14% for the monolithic radix-2 form), and
# XLA compile drops from minutes to seconds at 2^22. Bit-identical
# (tests pin it). numpy host path keeps the staged form.
FOUR_STEP_MIN_LOG_N = 14


@functools.lru_cache(maxsize=None)
def _mid_twiddles(log_n1: int, log_n2: int, inverse: bool = False):
    """Four-step mid table T[r1, i2] = w_n^(bitrev_{n1}(r1) * i2),
    Montgomery, numpy (n1, n2)."""
    n1, n2 = 1 << log_n1, 1 << log_n2
    w = bb.two_adic_generator_int(log_n1 + log_n2)
    if inverse:
        w = pow(w, bb.P - 2, bb.P)
    rev = _bitrev_perm(log_n1)
    out = np.empty((n1, n2), dtype=np.uint32)
    for r1 in range(n1):
        base = pow(w, int(rev[r1]), bb.P)
        row = bb.powers_int(base, n2)
        out[r1] = np.array(
            [bb.to_monty_int(int(v)) for v in row], dtype=np.uint32
        )
    return out


def _dif_four_step(x, log_n: int, inverse: bool):
    """Four-step DIF: natural -> bit-reversed, same output as the staged
    form (the single-device specialization of the sharded four-step,
    parallel/ntt_sharded.py)."""
    log_n1 = log_n // 2
    log_n2 = log_n - log_n1
    n1, n2 = 1 << log_n1, 1 << log_n2
    rest = x.shape[1:]
    m = x.reshape((n1, n2) + rest)
    tw = jnp.asarray(_mid_twiddles(log_n1, log_n2, inverse)).reshape(
        (n1, n2) + (1,) * len(rest)
    )
    a = _dif(m, log_n1, inverse)
    b_ = bb.mul(a, tw)
    c_t = jnp.moveaxis(b_, 1, 0)
    e = _dif(c_t, log_n2, inverse)
    return jnp.moveaxis(e, 0, 1).reshape(((1 << log_n),) + rest)


def _dit_four_step(x, log_n: int, inverse: bool):
    """Four-step DIT: bit-reversed -> natural (mirror diagram; see
    parallel/ntt_sharded.py ntt_rev_to_natural_sharded)."""
    log_n1 = log_n // 2
    log_n2 = log_n - log_n1
    n1, n2 = 1 << log_n1, 1 << log_n2
    rest = x.shape[1:]
    m = x.reshape((n1, n2) + rest)
    c_t = jnp.moveaxis(m, 1, 0)
    e = _dit(c_t, log_n2, inverse)
    e = jnp.moveaxis(e, 0, 1)
    tw = jnp.asarray(_mid_twiddles(log_n1, log_n2, inverse)).reshape(
        (n1, n2) + (1,) * len(rest)
    )
    g = _dit(bb.mul(e, tw), log_n1, inverse)
    return g.reshape(((1 << log_n),) + rest)


@functools.lru_cache(maxsize=None)
def _stage_tw_flat(log_n: int, inverse: bool) -> np.ndarray:
    """Stage tables concatenated so stage s starts at offset 2^(s-1)-1
    (the native kernel's layout)."""
    return np.ascontiguousarray(
        np.concatenate(_stage_twiddles(log_n, inverse))
    )


def _native_ntt(x, log_n: int, inverse: bool, dit: bool):
    """Host path through the native C++ staged kernel (bit-identical:
    same twiddle tables, same butterfly formulas). None on tiny inputs
    (ctypes overhead) or native-unavailable builds."""
    if log_n == 0 or x.size < (1 << 8):
        return None
    from . import p2_native

    out = p2_native.ntt_stages(x, log_n, _stage_tw_flat(log_n, inverse), dit)
    if out is None:
        return None
    return out.reshape(x.shape)


def _dif(x, log_n: int, inverse: bool):
    """DIF butterflies: natural-order input -> bit-reversed-order output.
    Backend-generic: numpy input runs entirely on numpy (no XLA compile;
    large inputs take the fused native C++ kernel)."""
    xp = np if isinstance(x, np.ndarray) else jnp
    if xp is jnp and log_n >= FOUR_STEP_MIN_LOG_N:
        return _dif_four_step(x, log_n, inverse)
    if xp is np:
        out = _native_ntt(x, log_n, inverse, dit=False)
        if out is not None:
            return out
    n = x.shape[0]
    w_all = _stage_twiddles(log_n, inverse)
    rest = x.shape[1:]
    for s in range(log_n, 0, -1):
        h = 1 << (s - 1)
        tw = w_all[s - 1].reshape((1, h) + (1,) * len(rest))
        v = x.reshape((n // (2 * h), 2, h) + rest)
        lo = v[:, 0]
        hi = v[:, 1]
        new_lo = bb.add(lo, hi)
        new_hi = bb.mul(bb.sub(lo, hi), tw)
        x = xp.stack([new_lo, new_hi], axis=1).reshape((n,) + rest)
    return x


def _dit(x, log_n: int, inverse: bool):
    """DIT butterflies: bit-reversed-order input -> natural-order output."""
    xp = np if isinstance(x, np.ndarray) else jnp
    if xp is jnp and log_n >= FOUR_STEP_MIN_LOG_N:
        return _dit_four_step(x, log_n, inverse)
    if xp is np:
        out = _native_ntt(x, log_n, inverse, dit=True)
        if out is not None:
            return out
    n = x.shape[0]
    w_all = _stage_twiddles(log_n, inverse)
    rest = x.shape[1:]
    for s in range(1, log_n + 1):
        h = 1 << (s - 1)
        tw = w_all[s - 1].reshape((1, h) + (1,) * len(rest))
        v = x.reshape((n // (2 * h), 2, h) + rest)
        lo = v[:, 0]
        hi = bb.mul(v[:, 1], tw)
        x = xp.stack([bb.add(lo, hi), bb.sub(lo, hi)], axis=1).reshape(
            (n,) + rest
        )
    return x


def _np_or_jit(jit_fn):
    """numpy input -> run the traced body eagerly on numpy; else jit."""

    def wrapper(x, *args):
        if isinstance(x, np.ndarray):
            return jit_fn.__wrapped__(x, *args)
        return jit_fn(x, *args)

    wrapper.__name__ = jit_fn.__wrapped__.__name__
    wrapper.__doc__ = jit_fn.__wrapped__.__doc__
    return wrapper


@_np_or_jit
@jax.jit
def ntt_natural_to_rev(x):
    """Forward NTT; natural-order input, bit-reversed output."""
    log_n = int(x.shape[0]).bit_length() - 1
    return _dif(x, log_n, inverse=False)


@_np_or_jit
@jax.jit
def ntt_rev_to_natural(x):
    """Forward NTT; bit-reversed input, natural-order output."""
    log_n = int(x.shape[0]).bit_length() - 1
    return _dit(x, log_n, inverse=False)


@_np_or_jit
@jax.jit
def intt_natural_to_rev(x):
    """Inverse NTT; natural-order evals -> bit-reversed coefficients."""
    log_n = int(x.shape[0]).bit_length() - 1
    out = _dif(x, log_n, inverse=True)
    return bb.mul(out, _n_inv_monty(log_n))


@_np_or_jit
@jax.jit
def intt_rev_to_natural(x):
    """Inverse NTT; bit-reversed evals -> natural-order coefficients."""
    log_n = int(x.shape[0]).bit_length() - 1
    out = _dit(x, log_n, inverse=True)
    return bb.mul(out, _n_inv_monty(log_n))


def bit_reverse(x):
    """Explicit bit-reversal permutation along axis 0 (gather; avoid on hot path)."""
    log_n = int(x.shape[0]).bit_length() - 1
    return jnp.take(x, jnp.asarray(_bitrev_perm(log_n)), axis=0)


# ---------------------------------------------------------------------------
# Coset LDE
# ---------------------------------------------------------------------------


@_np_or_jit
@functools.partial(jax.jit, static_argnums=(1,))
def interpolate_coset_rev(evals, shift_in_int: int = 1):
    """Evals on coset shift_in*H (natural order) -> bit-reversed coefficients.

    Standard INTT recovers coefficients of f(shift*x); dividing coefficient j
    by shift^j (a host-precomputed bit-reversed-order table) recovers f.

    numpy input runs eagerly on numpy (no per-shape XLA compile): this was
    the ONE transform on the commit path missing the host dispatch, and it
    silently promoted every downstream LDE/Merkle input to jax — a fresh
    multi-minute compile per distinct trace shape (the round-3 bench
    timeout's root cause).
    """
    n = int(evals.shape[0])
    log_n = n.bit_length() - 1
    c_rev = intt_natural_to_rev(evals)
    if shift_in_int % bb.P != 1:
        s_inv = pow(shift_in_int % bb.P, bb.P - 2, bb.P)
        scale = _powers_bitrev_monty(s_inv, log_n).reshape(
            (n,) + (1,) * (evals.ndim - 1)
        )
        c_rev = bb.mul(c_rev, scale)
    return c_rev


def _eval_coset_from_rev_body(c_rev, log_blowup: int, shift_int: int):
    """Bit-reversed coefficients (n, W) -> evals of the degree<n poly on the
    coset shift*G_m (natural order), m = n << log_blowup.

    TPU shape: per-coset scale tables are host-precomputed in bit-reversed
    index order, so the whole evaluation is `blowup` DITs with zero gathers.
    """
    n = int(c_rev.shape[0])
    log_n = n.bit_length() - 1
    blowup = 1 << log_blowup
    rest = c_rev.shape[1:]

    w_m_int = bb.two_adic_generator_int(log_n + log_blowup)
    cosets = []
    for r in range(blowup):
        s_r = (shift_int * pow(w_m_int, r, bb.P)) % bb.P
        scale = _powers_bitrev_monty(s_r, log_n).reshape(
            (n,) + (1,) * len(rest)
        )
        cosets.append(_dit(bb.mul(c_rev, scale), log_n, inverse=False))
    # interleave: global natural index t = r + j*blowup
    xp = np if isinstance(c_rev, np.ndarray) else jnp
    out = xp.stack(cosets, axis=1)  # (n, blowup, *rest)
    return out.reshape((n * blowup,) + rest)


_eval_coset_from_rev_jit = functools.partial(jax.jit, static_argnums=(1, 2))(
    _eval_coset_from_rev_body
)


def eval_coset_from_rev(c_rev, log_blowup: int, shift_int: int):
    """Bit-reversed coefficients -> natural-order coset evals (see body);
    numpy input runs on numpy, jax input through the jitted kernel."""
    if isinstance(c_rev, np.ndarray):
        return _eval_coset_from_rev_body(c_rev, log_blowup, shift_int)
    return _eval_coset_from_rev_jit(c_rev, log_blowup, shift_int)


def coset_lde(evals, log_blowup: int, shift_int: int = bb.GENERATOR,
              shift_in_int: int = 1):
    """Low-degree extension (the reference's `coset_lde_batch`, log_blowup=1).

    Input: (n, W) evals of columns on shift_in*H (natural order).
    Output: (n * 2^log_blowup, W) evals on shift*G (natural order).
    """
    c_rev = interpolate_coset_rev(evals, shift_in_int)
    return eval_coset_from_rev(c_rev, log_blowup, shift_int)


def eval_poly_at_point_ext(coeffs_rev, point_ext):
    """Evaluate a poly (bit-reversed base-field coeffs (n, W)) at an ext point.

    Used for out-of-domain (DEEP) openings. Horner is sequential; instead use
    sum_i c_i * z^i with a precomputed power ladder: powers of z in natural
    order, permuted host-side? z is a traced value — compute powers with an
    O(log n) squaring doubling trick, in *bit-reversed* order directly:
    bitrev powers table satisfies pw[j] = z^bitrev(j); build by interleaving:
    start [1]; at step k (building 2^(k+1) entries from 2^k):
      new[2i] = old[i], new[2i+1] = old[i] * z^(2^k)  -- because appending a
    high bit b_k=1 to the reversed index adds 2^k to the exponent... careful:
    bitrev over log_n bits of (j) — we build for increasing log sizes where
    bitrev_(k+1)(2i+b) = bitrev_k(i) + b*2^k. So exponent(new[2i+b]) =
    exponent(old[i]) + b*2^k. That is exactly the interleave rule above.
    """
    n = int(coeffs_rev.shape[0])
    log_n = n.bit_length() - 1
    from ..fields import ext4

    xp = np if isinstance(coeffs_rev, np.ndarray) and isinstance(
        point_ext, (np.ndarray, np.generic)) else jnp
    pw = ext4.one((1,), xp=xp)  # (1, 4)
    zp = xp.asarray(point_ext, dtype=xp.uint32)  # z^(2^k)
    for _ in range(log_n):
        hi = ext4.mul(pw, xp.broadcast_to(zp, pw.shape))
        pw = xp.stack([pw, hi], axis=1).reshape(-1, 4)
        zp = ext4.mul(zp, zp)
    # pw[j] = z^bitrev(j), shape (n, 4)
    # result[w] = sum_j coeffs_rev[j, w] * pw[j]: base-times-ext sums are
    # coefficient-wise, so this is a dense (W, n) @ (n, 4) modular matmul
    # — BLAS on the host path instead of an (n, W, 4) materialization
    if xp is np and n <= (1 << 21):  # GEMM exactness bound
        return bb.mont_matmul_np(np.ascontiguousarray(coeffs_rev.T), pw)
    terms = bb.mul(coeffs_rev[..., None], pw[:, None, :])  # (n, W, 4)
    return _field_sum(terms, axis=0)


def _field_sum(x, axis=0):
    """Sum mod p along an axis using uint32 lanes.

    Values < 2^31; sum pairs then reduce — use a log-tree of bb.add to stay
    in-range (each add renormalizes below p).
    """
    xp = np if isinstance(x, np.ndarray) else jnp
    n = x.shape[axis]
    x = xp.moveaxis(x, axis, 0)
    while n > 1:
        if n % 2 == 1:
            x = xp.concatenate(
                [x, xp.zeros((1,) + x.shape[1:], dtype=x.dtype)], axis=0
            )
            n += 1
        x = bb.add(x[0::2], x[1::2])
        n //= 2
    return x[0]


field_sum = _field_sum

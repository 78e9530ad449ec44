"""Pod-ready Pippenger MSM over BN254 G1 as vectorized TPU kernels.

The TPU replacement for the reference's halo2curves/CUDA MSM (the dominant
cost of the Halo2 SNARK wrapper — SURVEY.md §2.2 "Pippenger MSM with
points partitioned across hosts"; BASELINE.json north-star metric
"BN254 MSM pts/s"). Design:

- Field: ops/bigint 16-bit-limb Montgomery kernels (no 64-bit ints).
- Points: Jacobian (X, Y, Z) limb arrays; infinity is Z == 0. The lane
  point-add is UNIFIED: it computes the general add and the doubling and
  selects per lane (buckets do hit equal points), with infinity absorbed
  by selects — fully branch-free, jit/shard_map-friendly.
- Bucket accumulation avoids data-dependent scatter-adds: per window the
  points are sorted by bucket index and reduced with a log2(n)-round
  SEGMENTED prefix combine (each round one vectorized lane add), then the
  last element of every segment is scattered to its bucket slot (unique
  writes). The 255-step weighted bucket reduction runs as one lax.scan
  with all windows in parallel lanes.
- The final cross-window combine (32 points) is host-side python.

Multi-host scaling (SURVEY.md §2.3): points shard over the mesh, each
shard computes window buckets locally, and bucket grids reduce with
`jax.lax.psum`-style point-adds — `msm_device` exposes `window_buckets`
for that composition.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from ..fields import bn254 as bn
from .bigint import BN254_FQ as F

K = F.K


# ---------------------------------------------------------------------------
# Jacobian lane arithmetic (backend-generic via bigint's dispatch)
# ---------------------------------------------------------------------------


def _xp(*arrs):
    from ..fields import babybear as bb

    return bb._mod(*arrs)


def _sel(mask, a, b):
    """Per-lane select over limb arrays; mask shape = lane shape."""
    xp = _xp(a, b)
    return xp.where(mask[..., None], a, b)


def pt_infinity(shape, xp=np):
    one = xp.asarray(np.broadcast_to(F.to_monty_int(1), (*shape, K)))
    zero = xp.zeros((*shape, K), dtype=xp.uint32)
    return (one, one, zero)


def pt_double(p):
    X, Y, Z = p
    A = F.square(X)
    B = F.square(Y)
    C = F.square(B)
    t = F.square(F.add(X, B))
    d_half = F.sub(F.sub(t, A), C)
    D = F.add(d_half, d_half)
    E = F.add(F.add(A, A), A)
    Fq2 = F.square(E)
    X3 = F.sub(F.sub(Fq2, D), D)
    eight_c = F.add(C, C)
    eight_c = F.add(eight_c, eight_c)
    eight_c = F.add(eight_c, eight_c)
    Y3 = F.sub(F.mul(E, F.sub(D, X3)), eight_c)
    Z3 = F.mul(F.add(Y, Y), Z)
    return (X3, Y3, Z3)


def pt_add(p, q):
    """Unified Jacobian add (handles P==Q, P==-Q, and infinities)."""
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    Z1Z1 = F.square(Z1)
    Z2Z2 = F.square(Z2)
    U1 = F.mul(X1, Z2Z2)
    U2 = F.mul(X2, Z1Z1)
    S1 = F.mul(F.mul(Y1, Z2), Z2Z2)
    S2 = F.mul(F.mul(Y2, Z1), Z1Z1)
    H = F.sub(U2, U1)
    Rr = F.sub(S2, S1)

    HH = F.square(H)
    HHH = F.mul(H, HH)
    V = F.mul(U1, HH)
    X3 = F.sub(F.sub(F.square(Rr), HHH), F.add(V, V))
    Y3 = F.sub(F.mul(Rr, F.sub(V, X3)), F.mul(S1, HHH))
    Z3 = F.mul(F.mul(Z1, Z2), H)

    p_inf = F.is_zero(Z1)
    q_inf = F.is_zero(Z2)
    h_zero = F.is_zero(H)
    r_zero = F.is_zero(Rr)
    same = h_zero & r_zero & ~p_inf & ~q_inf
    opp = h_zero & ~r_zero & ~p_inf & ~q_inf

    dX, dY, dZ = pt_double(p)
    xp = _xp(X3)
    Z3 = xp.where(opp[..., None], xp.zeros_like(Z3), Z3)
    X3 = _sel(same, dX, X3)
    Y3 = _sel(same, dY, Y3)
    Z3 = _sel(same, dZ, Z3)
    X3 = _sel(p_inf, X2, X3)
    Y3 = _sel(p_inf, Y2, Y3)
    Z3 = _sel(p_inf, Z2, Z3)
    X3 = _sel(q_inf, X1, X3)
    Y3 = _sel(q_inf, Y1, Y3)
    Z3 = _sel(q_inf, Z1, Z3)
    return (X3, Y3, Z3)


def pt_to_affine_int(p) -> bn.G1:
    """Single Jacobian limb point -> host affine (None for infinity)."""
    X, Y, Z = (np.asarray(c).reshape(K) for c in p)
    z = F.from_monty(Z)
    if z == 0:
        return None
    x = F.from_monty(X)
    y = F.from_monty(Y)
    zinv = pow(z, bn.Q - 2, bn.Q)
    return (x * zinv * zinv % bn.Q, y * zinv * zinv * zinv % bn.Q)


def affine_to_limbs(points: Sequence[bn.G1]) -> Tuple[np.ndarray, np.ndarray,
                                                      np.ndarray]:
    """Host affine points -> Jacobian limb arrays (n, K) x3 (Z=1, or 0 for
    infinity)."""
    n = len(points)
    X = np.zeros((n, K), dtype=np.uint32)
    Y = np.zeros((n, K), dtype=np.uint32)
    Z = np.zeros((n, K), dtype=np.uint32)
    one = F.to_monty_int(1)
    for i, p in enumerate(points):
        if p is None:
            X[i] = one
            Y[i] = one
            continue
        X[i] = F.to_monty_int(p[0])
        Y[i] = F.to_monty_int(p[1])
        Z[i] = one
    return X, Y, Z


# ---------------------------------------------------------------------------
# Pippenger
# ---------------------------------------------------------------------------


def _digits(scalars: Sequence[int], c: int) -> np.ndarray:
    n_windows = -(-bn.R.bit_length() // c)
    out = np.zeros((len(scalars), n_windows), dtype=np.int32)
    mask = (1 << c) - 1
    for i, s in enumerate(scalars):
        s = int(s) % bn.R
        for w in range(n_windows):
            out[i, w] = (s >> (c * w)) & mask
    return out


def window_buckets(points, digits, c: int, use_jax: bool):
    """Per-window bucket sums via sort + segmented combine.

    points: (X, Y, Z) each (n, K); digits: (n, W) ints.
    Returns bucket point grid ((W, 2^c, K) x3) — bucket 0 unused.
    """
    if use_jax:
        import jax
        import jax.numpy as jnp

        xp = jnp
    else:
        xp = np
    n, W = digits.shape
    n_buckets = 1 << c

    X, Y, Z = (xp.asarray(a) for a in points)
    digs = xp.asarray(digits.T)                      # (W, n)
    order = xp.argsort(digs, axis=1)                 # (W, n)
    seg = xp.take_along_axis(digs, order, axis=1)    # sorted bucket ids
    Xs = X[order]                                    # (W, n, K)
    Ys = Y[order]
    Zs = Z[order]
    # zero-digit points contribute nothing: force to infinity
    Zs = xp.where((seg == 0)[..., None], xp.zeros_like(Zs), Zs)

    val = (Xs, Ys, Zs)
    if use_jax:
        # one jitted round with a DYNAMIC shift: compiles once, runs log2(n)
        # times (the combine is associative over equal-segment runs)
        @jax.jit
        def seg_round(val, seg_, shift):
            idx = jnp.arange(val[0].shape[1])
            valid = idx[None, :] >= shift
            prev_seg = jnp.roll(seg_, shift, axis=1)
            mask = valid & (seg_ == prev_seg)
            px = jnp.roll(val[0], shift, axis=1)
            py = jnp.roll(val[1], shift, axis=1)
            pz = jnp.roll(val[2], shift, axis=1)
            pz = jnp.where(mask[..., None], pz, jnp.zeros_like(pz))
            return pt_add(val, (px, py, pz))

        shift = 1
        while shift < n:
            val = seg_round(val, seg, jnp.int32(shift))
            shift *= 2
    else:
        shift = 1
        while shift < n:
            px = xp.concatenate(
                [val[0][:, :shift], val[0][:, :-shift]], axis=1)
            py = xp.concatenate(
                [val[1][:, :shift], val[1][:, :-shift]], axis=1)
            pz = xp.concatenate(
                [val[2][:, :shift], val[2][:, :-shift]], axis=1)
            prev_seg = xp.concatenate(
                [xp.full((W, shift), -1, dtype=seg.dtype), seg[:, :-shift]],
                axis=1,
            )
            mask = seg == prev_seg                   # same segment
            pz = xp.where(mask[..., None], pz, xp.zeros_like(pz))
            val = pt_add(val, (px, py, pz))
            shift *= 2

    # scatter the last element of each segment into its bucket slot
    nxt_seg = xp.concatenate(
        [seg[:, 1:], xp.full((W, 1), -1, dtype=seg.dtype)], axis=1
    )
    is_last = seg != nxt_seg
    write_idx = xp.where(is_last & (seg > 0), seg, n_buckets)  # dump slot

    one = xp.asarray(np.broadcast_to(F.to_monty_int(1),
                                     (W, n_buckets + 1, K)))
    BX = one.copy() if xp is np else one
    BY = one.copy() if xp is np else one
    BZ = xp.zeros((W, n_buckets + 1, K), dtype=xp.uint32)
    if xp is np:
        for w in range(W):
            BX[w, write_idx[w]] = val[0][w]
            BY[w, write_idx[w]] = val[1][w]
            BZ[w, write_idx[w]] = val[2][w]
    else:
        widx = write_idx[..., None]
        BX = BX.at[xp.arange(W)[:, None], write_idx].set(val[0])
        BY = BY.at[xp.arange(W)[:, None], write_idx].set(val[1])
        BZ = BZ.at[xp.arange(W)[:, None], write_idx].set(val[2])
        del widx
    return (BX[:, :n_buckets], BY[:, :n_buckets], BZ[:, :n_buckets])


def _weighted_bucket_sum(buckets, c: int, use_jax: bool):
    """acc_w = sum_k k * B_{w,k} via running suffix sums (255 steps, all
    windows in parallel lanes)."""
    BX, BY, BZ = buckets
    W = BX.shape[0]
    n_buckets = BX.shape[1]
    if use_jax:
        import jax
        import jax.numpy as jnp

        def step(carry, bk):
            run, acc = carry
            run = pt_add(run, bk)
            acc = pt_add(acc, run)
            return (run, acc), None

        init = (pt_infinity((W,), jnp), pt_infinity((W,), jnp))
        # scan from the top bucket down to 1
        seq = (
            jnp.flip(BX[:, 1:], axis=1).swapaxes(0, 1),
            jnp.flip(BY[:, 1:], axis=1).swapaxes(0, 1),
            jnp.flip(BZ[:, 1:], axis=1).swapaxes(0, 1),
        )
        (run, acc), _ = jax.lax.scan(step, init, seq)
        return acc
    run = pt_infinity((W,), np)
    acc = pt_infinity((W,), np)
    for k in range(n_buckets - 1, 0, -1):
        run = pt_add(run, (BX[:, k], BY[:, k], BZ[:, k]))
        acc = pt_add(acc, run)
    return acc


def msm_device(points: Sequence[bn.G1], scalars: Sequence[int],
               c: int = 8, use_jax: bool = True) -> bn.G1:
    """Full MSM on the device kernels; returns a host affine point."""
    assert len(points) == len(scalars) and points
    digits = _digits(scalars, c)
    pts = affine_to_limbs(points)
    buckets = window_buckets(pts, digits, c, use_jax)
    acc = _weighted_bucket_sum(buckets, c, use_jax)

    # host combine: total = sum_w 2^(c*w) * acc_w
    W = digits.shape[1]
    total: bn.G1 = None
    for w in range(W - 1, -1, -1):
        for _ in range(c if total is not None else 0):
            total = bn.g1_add(total, total)
        aw = pt_to_affine_int((acc[0][w], acc[1][w], acc[2][w]))
        total = bn.g1_add(total, aw)
    return total

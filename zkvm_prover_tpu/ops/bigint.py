"""Multi-limb Montgomery arithmetic for big prime fields (BN254 Fq) as
vectorized uint32 lane kernels.

The TPU answer to the reference's halo2curves/CUDA BN254 field arithmetic
(SURVEY.md §2.2 "Halo2/BN254 static verifier": BN254 Fr/Fq limb kernels,
Pippenger MSM). Design rules match fields/babybear.py: 16-bit limbs so
every multiply is an exact 16x16->32 uint32 multiply; no 64-bit integers
anywhere; all functions are shape-polymorphic over leading axes and work
identically under jit on TPU and eagerly on numpy.

Layout: an element of F_q is (..., K) uint32 with each limb < 2^16,
little-endian, in Montgomery form (x*R mod q, R = 2^(16K)). K = 16 for
BN254 (256-bit representation of the 254-bit modulus).

The schoolbook product accumulates 16-bit partial products into uint32
cells (max 2*K terms of < 2^16 each, plus carries — comfortably < 2^32),
then one sequential carry normalization; Montgomery reduction interleaves
K scalar-limb rounds (CIOS outer loop) of the same shape.
"""

from __future__ import annotations

import numpy as np

from ..fields import babybear as bb  # for the _mod backend dispatch

MASK16 = np.uint32(0xFFFF)


class Field:
    """A multi-limb Montgomery field context (host-precomputed constants)."""

    def __init__(self, modulus: int, n_limbs: int):
        self.q = modulus
        self.K = n_limbs
        assert modulus < 1 << (16 * n_limbs)
        self.R = (1 << (16 * n_limbs)) % modulus
        self.R2 = (self.R * self.R) % modulus
        # -q^{-1} mod 2^16 (per-limb Montgomery factor)
        self.np0 = np.uint32((-pow(modulus, -1, 1 << 16)) % (1 << 16))
        self.q_limbs = np.array(
            [(modulus >> (16 * i)) & 0xFFFF for i in range(n_limbs)],
            dtype=np.uint32,
        )
        self.one = self.to_monty_int(1)

    # -- host int <-> limb conversions ------------------------------------
    def to_limbs(self, x: int) -> np.ndarray:
        return np.array(
            [(x >> (16 * i)) & 0xFFFF for i in range(self.K)],
            dtype=np.uint32,
        )

    def from_limbs(self, limbs) -> int:
        limbs = np.asarray(limbs, dtype=np.uint64).reshape(-1)
        return sum(int(v) << (16 * i) for i, v in enumerate(limbs))

    def to_monty_int(self, x: int) -> np.ndarray:
        return self.to_limbs((x % self.q) * self.R % self.q)

    def from_monty(self, limbs) -> int:
        r_inv = pow(self.R, -1, self.q)
        return self.from_limbs(limbs) * r_inv % self.q

    def to_monty_batch(self, xs) -> np.ndarray:
        """List of ints -> (n, K) Montgomery limbs (host)."""
        return np.stack([self.to_monty_int(int(x)) for x in xs])

    # -- vectorized kernels -------------------------------------------------
    def _xp(self, *arrs):
        return bb._mod(*arrs)

    def add(self, a, b):
        """(a + b) mod q, limbwise with carry propagation + conditional
        subtract of q."""
        xp = self._xp(a, b)
        K = self.K
        s = a + b  # limbs < 2^17
        out = []
        carry = xp.zeros(s.shape[:-1], dtype=xp.uint32)
        for i in range(K):
            c = s[..., i] + carry
            out.append(c & MASK16)
            carry = c >> 16
        res = xp.stack(out, axis=-1)
        return self._cond_sub_q(res, carry)

    def _cond_sub_q(self, res, overflow):
        """Subtract q where res >= q (or an overflow carry is pending)."""
        xp = self._xp(res)
        ge = self._geq_q(res) | (overflow != 0)
        return xp.where(ge[..., None], self._sub_q(res), res)

    def _geq_q(self, a):
        """a >= q over 16-bit limbs (lexicographic from the top)."""
        xp = self._xp(a)
        ge = xp.ones(a.shape[:-1], dtype=bool)
        decided = xp.zeros(a.shape[:-1], dtype=bool)
        for i in range(self.K - 1, -1, -1):
            qi = self.q_limbs[i]
            gt = a[..., i] > qi
            lt = a[..., i] < qi
            ge = xp.where(~decided & gt, True, ge)
            ge = xp.where(~decided & lt, False, ge)
            decided = decided | gt | lt
        return ge

    def _sub_q(self, a):
        xp = self._xp(a)
        out = []
        borrow = xp.zeros(a.shape[:-1], dtype=xp.uint32)
        for i in range(self.K):
            d = a[..., i] - self.q_limbs[i] - borrow
            out.append(d & MASK16)
            borrow = (d >> 16) & 1  # 16-bit borrow trick (d wraps)
        return xp.stack(out, axis=-1)

    def sub(self, a, b):
        """(a - b) mod q."""
        xp = self._xp(a, b)
        out = []
        borrow = xp.zeros(a.shape[:-1], dtype=xp.uint32)
        for i in range(self.K):
            d = a[..., i] - b[..., i] - borrow
            out.append(d & MASK16)
            borrow = (d >> 16) & 1
        res = xp.stack(out, axis=-1)
        # add q back where we borrowed
        out2 = []
        carry = xp.zeros(a.shape[:-1], dtype=xp.uint32)
        addq = xp.where(borrow != 0, np.uint32(1), np.uint32(0))
        for i in range(self.K):
            c = res[..., i] + self.q_limbs[i] * addq + carry
            out2.append(c & MASK16)
            carry = c >> 16
        return xp.stack(out2, axis=-1)

    def neg(self, a):
        xp = self._xp(a)
        z = self.is_zero(a)
        qm = xp.asarray(
            np.broadcast_to(self.q_limbs, a.shape).copy()
            if xp is np else np.broadcast_to(self.q_limbs, a.shape)
        )
        out = []
        borrow = xp.zeros(a.shape[:-1], dtype=xp.uint32)
        for i in range(self.K):
            d = self.q_limbs[i] - a[..., i] - borrow
            out.append(d & MASK16)
            borrow = (d >> 16) & 1
        res = xp.stack(out, axis=-1)
        return xp.where(z[..., None], a, res)

    def is_zero(self, a):
        acc = a[..., 0]
        for i in range(1, self.K):
            acc = acc | a[..., i]
        return acc == 0

    def eq(self, a, b):
        acc = a[..., 0] == b[..., 0]
        for i in range(1, self.K):
            acc = acc & (a[..., i] == b[..., i])
        return acc

    def mul(self, a, b):
        """Montgomery product (a*b*R^{-1} mod q) — SOS: schoolbook product
        into uint32 cells, carry-normalize, K reduction rounds."""
        xp = self._xp(a, b)
        K = self.K
        shape = np.broadcast_shapes(a.shape[:-1], b.shape[:-1])
        cells = [xp.zeros(shape, dtype=xp.uint32) for _ in range(2 * K + 1)]
        for i in range(K):
            ai = a[..., i]
            for j in range(K):
                p = ai * b[..., j]
                cells[i + j] = cells[i + j] + (p & MASK16)
                cells[i + j + 1] = cells[i + j + 1] + (p >> 16)
        # normalize to 16-bit limbs t[0..2K]
        t = []
        carry = xp.zeros(shape, dtype=xp.uint32)
        for s in range(2 * K + 1):
            c = cells[s] + carry
            t.append(c & MASK16)
            carry = c >> 16
        t.append(carry)  # t has 2K+2 entries, top ones small

        # Montgomery reduction: K rounds, each clears t[i]
        for i in range(K):
            m = (t[i] * self.np0) & MASK16
            carry = xp.zeros(shape, dtype=xp.uint32)
            for j in range(K):
                p = m * self.q_limbs[j]
                c = t[i + j] + (p & MASK16) + carry
                t[i + j] = c & MASK16
                carry = (c >> 16) + (p >> 16)
            # propagate the final carry up
            j = i + K
            while True:
                c = t[j] + carry
                t[j] = c & MASK16
                carry = c >> 16
                if xp is np:
                    if not np.any(carry):
                        break
                    j += 1
                else:
                    # bounded: two extra limbs absorb the worst case
                    j += 1
                    if j > 2 * K + 1:
                        break
        res = xp.stack(t[K : 2 * K], axis=-1)
        top = t[2 * K] + t[2 * K + 1]
        return self._cond_sub_q(res, top)

    def square(self, a):
        return self.mul(a, a)

    def inv_int(self, a_limbs) -> np.ndarray:
        """Host-side inverse (single element)."""
        x = self.from_monty(a_limbs)
        return self.to_monty_int(pow(x, self.q - 2, self.q))


# BN254 base field context (coordinates)
BN254_FQ = Field(
    21888242871839275222246405745257275088696311157297823662689037894645226208583,
    16,
)

"""Poseidon2 permutation over BabyBear, batched on-chip (width 16 and 24).

Re-designs the reference's hash pipeline (Plonky3 `p3-poseidon2` as used by
openvm-stark-backend for Merkle commitments and the Fiat-Shamir duplex
challenger; SURVEY.md §2.2, §7 Phase 1) for the TPU:

- A batch of S states is an (S, WIDTH) uint32 matrix (Montgomery form); every
  round is elementwise VPU work + tiny reductions along the width axis. XLA
  fuses a full permutation (8 external + internal rounds) into a handful of
  passes; S is the parallel axis (millions of leaf hashes per Merkle layer).
- Structure matches Poseidon2 (Grassi et al. 2023): external rounds use the
  circulant MDS light layer M_E = circ(2I, I, .., I) composed of 4x4 blocks
  M4, internal rounds use M_I = I + diag(v). S-box x^7 (BabyBear).

Round constants: the reference's exact Plonky3 constants are not vendored in
/root/reference (they live in the pinned external p3-baby-bear crate), so
this module generates deterministic constants from SHA-256 counter-mode
expansion (domain-separated). For future bit-parity with the reference
transcript, drop-in replace via `load_constants` — every consumer reads them
from this single table. See ROADMAP.md.
"""

from __future__ import annotations

import functools
import hashlib

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import babybear as bb

# Plonky3 BabyBear Poseidon2 round structure
SBOX_DEGREE = 7
ROUNDS_F = 8  # external rounds (4 initial + 4 final)

# internal rounds per width (Plonky3: 13 for width 16, 21 for width 24)
ROUNDS_P = {16: 13, 24: 21}

# Internal-layer diagonal for M_I = I + diag(v). Plonky3 uses the special
# vector [-2, 1, 2, 1/2, 3, 4, -1/2, -3, -4, 1/2^8, 1/4, 1/8, 1/2^27, -1/2^8,
# -1/16, -1/2^27] for width 16 (cheap shifts on CPU). On TPU every mul costs
# the same, so we keep the same *values* for structural parity.
_DIAG16 = [
    -2, 1, 2, "1/2", 3, 4, "-1/2", -3, -4, "1/2^8", "1/4", "1/8",
    "1/2^27", "-1/2^8", "-1/16", "-1/2^27",
]
_DIAG24 = [
    -2, 1, 2, "1/2", 3, 4, "-1/2", -3, -4, "1/2^8", "1/4", "1/8",
    "1/16", "1/32", "1/64", "1/2^27", "-1/2^8", "-1/4", "-1/8", "-1/16",
    "-1/32", "-1/64", "-1/2^27", "1/2^2",
]


def _parse_diag_entry(e) -> int:
    if isinstance(e, int):
        return e % bb.P
    neg = e.startswith("-")
    body = e.lstrip("-")
    assert body.startswith("1/")
    d = body[2:]
    if "^" in d:
        base, exp = d.split("^")
        denom = int(base) ** int(exp)
    else:
        denom = int(d)
    v = pow(denom, bb.P - 2, bb.P)
    return (-v) % bb.P if neg else v


def _expand_constants(tag: str, count: int) -> np.ndarray:
    """Deterministic field elements via SHA-256(tag || counter) rejection
    sampling (canonical form)."""
    out = []
    ctr = 0
    while len(out) < count:
        h = hashlib.sha256(f"zkvm-prover-tpu/poseidon2/{tag}/{ctr}".encode()).digest()
        for i in range(0, 32, 4):
            v = int.from_bytes(h[i : i + 4], "little")
            if v < bb.P and len(out) < count:
                out.append(v)
        ctr += 1
    return np.array(out, dtype=np.uint32)


@functools.lru_cache(maxsize=None)
def constants(width: int):
    """(external_rc (ROUNDS_F, width), internal_rc (ROUNDS_P,), diag (width,))
    — all Montgomery form device arrays."""
    rp = ROUNDS_P[width]
    ext = _expand_constants(f"w{width}/external", ROUNDS_F * width).reshape(
        ROUNDS_F, width
    )
    internal = _expand_constants(f"w{width}/internal", rp)
    diag_vals = _DIAG16 if width == 16 else _DIAG24
    diag = np.array([_parse_diag_entry(e) for e in diag_vals], dtype=np.uint32)

    # NOTE: cached values must be plain numpy — jnp arrays created inside a
    # jit trace would leak tracers out of the lru_cache.
    to_m = lambda a: np.vectorize(lambda v: bb.to_monty_int(int(v)))(a).astype(
        np.uint32
    )
    return to_m(ext), to_m(internal), to_m(diag)


_OVERRIDES = {}


def load_constants(width: int, external, internal, diag):
    """Install external constants (e.g. extracted Plonky3 tables) —
    canonical-form numpy arrays."""
    to_m = lambda a: np.vectorize(lambda v: bb.to_monty_int(int(v)))(
        np.asarray(a)
    ).astype(np.uint32)
    _OVERRIDES[width] = (to_m(external), to_m(internal), to_m(diag))
    from . import p2_native

    p2_native.reset()  # re-install the new tables in the C++ kernel


def _get_constants(width):
    return _OVERRIDES.get(width) or constants(width)


# ---------------------------------------------------------------------------
# Permutation
# ---------------------------------------------------------------------------


def _sbox(x):
    x2 = bb.mul(x, x)
    x4 = bb.mul(x2, x2)
    x6 = bb.mul(x4, x2)
    return bb.mul(x6, x)


def _m4(x):
    """Apply the 4x4 block matrix M4 = [[2,3,1,1],[1,2,3,1],[1,1,2,3],[3,1,1,2]]
    to groups of 4 along the last axis (Poseidon2 paper fast sequence;
    verified against the dense matmul in tests). x: (..., width)."""
    s = x.shape
    v = x.reshape(s[:-1] + (s[-1] // 4, 4))
    a, b, c, d = v[..., 0], v[..., 1], v[..., 2], v[..., 3]
    t01 = bb.add(a, b)
    t23 = bb.add(c, d)
    t0123 = bb.add(t01, t23)
    t01123 = bb.add(t0123, b)
    t01233 = bb.add(t0123, d)
    out_d = bb.add(t01233, bb.double(a))  # 3a + b + c + 2d
    out_b = bb.add(t01123, bb.double(c))  # a + 2b + 3c + d
    out_a = bb.add(t01123, t01)           # 2a + 3b + c + d
    out_c = bb.add(t01233, t23)           # a + b + 2c + 3d
    out = jnp.stack([out_a, out_b, out_c, out_d], axis=-1)
    return out.reshape(s)


def _external_linear(x):
    """M_E = circ(2*M4, M4, ..., M4): blockwise M4, then add the sum of all
    blocks to each block."""
    width = x.shape[-1]
    y = _m4(x)
    s = y.reshape(y.shape[:-1] + (width // 4, 4))
    n_blocks = width // 4
    acc = s[..., 0, :]
    for i in range(1, n_blocks):
        acc = bb.add(acc, s[..., i, :])
    out = bb.add(s, acc[..., None, :])
    return out.reshape(x.shape)


def _internal_linear(x, diag):
    """(M_I x)_i = sum_j(x_j) + diag_i * x_i."""
    width = x.shape[-1]
    acc = x[..., 0]
    for i in range(1, width):
        acc = bb.add(acc, x[..., i])
    return bb.add(acc[..., None], bb.mul(diag, x))


@jax.jit
def permute(state):
    """Poseidon2 permutation. state: (..., width) uint32 Montgomery.

    Rounds are `lax.scan`s over the round-constant tables so the compiled
    program stays small (3 loop bodies) no matter how often the permutation
    is inlined — compile time matters as much as run time for the pipeline.
    """
    width = state.shape[-1]
    ext_rc, int_rc, diag_np = _get_constants(width)
    ext_rc = jnp.asarray(ext_rc)
    int_rc = jnp.asarray(int_rc)
    diag = jnp.asarray(diag_np)
    half = ROUNDS_F // 2

    def ext_round(x, rc):
        x = bb.add(x, rc)
        x = _sbox(x)
        return _external_linear(x), None

    def int_round(x, rc):
        x0 = _sbox(bb.add(x[..., 0], rc))
        x = x.at[..., 0].set(x0)
        return _internal_linear(x, diag), None

    x = _external_linear(state)
    x, _ = jax.lax.scan(ext_round, x, ext_rc[:half])
    x, _ = jax.lax.scan(int_round, x, int_rc)
    x, _ = jax.lax.scan(ext_round, x, ext_rc[half:])
    return x


# ---------------------------------------------------------------------------
# Hash modes (Merkle / sponge), width 16, rate 8, digest 8 — matching the
# reference's PaddingFreeSponge<Poseidon2, 16, 8, 8> + TruncatedPermutation
# compressor (openvm-stark-sdk config; SURVEY.md §2.2).
# ---------------------------------------------------------------------------

WIDTH = 16
RATE = 8
DIGEST = 8


@jax.jit
def hash_rows(matrix):
    """Hash each row of an (S, C) matrix to an (S, 8) digest.

    Padding-free sponge: absorb RATE lanes per permutation, zero-pad the last
    block (matching p3 PaddingFreeSponge semantics: remaining capacity zeros,
    final partial block zero-filled).
    """
    s, c = matrix.shape
    n_blocks = max(1, -(-c // RATE))
    pad = n_blocks * RATE - c
    if pad:
        matrix = jnp.concatenate(
            [matrix, jnp.zeros((s, pad), dtype=jnp.uint32)], axis=1
        )
    state = jnp.zeros((s, WIDTH), dtype=jnp.uint32)
    for b in range(n_blocks):
        block = matrix[:, b * RATE : (b + 1) * RATE]
        state = state.at[:, :RATE].set(block)
        state = permute(state)
    return state[:, :DIGEST]


@jax.jit
def compress(left, right):
    """2-to-1 digest compression: truncated permutation of [left || right].

    left/right: (S, 8) -> (S, 8).
    """
    state = jnp.concatenate([left, right], axis=-1)
    return permute(state)[..., :DIGEST]


# ---------------------------------------------------------------------------
# Host (numpy) permutation — bit-identical to `permute`, used by the
# challenger and by Merkle path verification so the host side never pays
# per-call device dispatch. uint64 intermediates keep every product exact.
# ---------------------------------------------------------------------------

_P64 = np.uint64(bb.P)
_NP64 = np.uint64(bb.NP)
_M32 = np.uint64(0xFFFFFFFF)


def _mul_np(a, b):
    t = a.astype(np.uint64) * b.astype(np.uint64)
    m = ((t & _M32) * _NP64) & _M32
    u = (t + m * _P64) >> np.uint64(32)
    return np.where(u >= _P64, u - _P64, u)


_R2_64 = np.uint64(bb.R2)


def to_monty_np(a: np.ndarray) -> np.ndarray:
    """Vectorized canonical -> Montgomery (numpy, any shape)."""
    return _mul_np(np.asarray(a, dtype=np.uint64), _R2_64).astype(np.uint32)


def from_monty_np(a: np.ndarray) -> np.ndarray:
    """Vectorized Montgomery -> canonical: mont-mul by 1."""
    return _mul_np(np.asarray(a, dtype=np.uint64), np.uint64(1)).astype(
        np.uint32
    )


def _add_np(a, b):
    s = a.astype(np.uint64) + b.astype(np.uint64)
    return np.where(s >= _P64, s - _P64, s)


def permute_np(state: np.ndarray) -> np.ndarray:
    """Poseidon2 on (..., width) uint32 Montgomery numpy arrays.

    Dispatches to the native C++ batch kernel (ops/p2_native.py) when
    available — bit-identical, ~1000x less per-element overhead than the
    numpy fallback below (profiled: the numpy path was 60% of a machine
    proof's wall-clock). Set ZKVM_TPU_NO_NATIVE_P2=1 to force numpy."""
    from . import p2_native

    native = p2_native.permute(state)
    if native is not None:
        return native
    return _permute_np_numpy(state)


def _permute_np_numpy(state: np.ndarray) -> np.ndarray:
    width = state.shape[-1]
    ext_rc, int_rc, diag = _get_constants(width)
    x = state.astype(np.uint64)

    def sbox(v):
        v2 = _mul_np(v, v)
        v4 = _mul_np(v2, v2)
        return _mul_np(_mul_np(v4, v2), v)

    def m4(v):
        s = v.shape
        g = v.reshape(s[:-1] + (s[-1] // 4, 4))
        a, b_, c, d = g[..., 0], g[..., 1], g[..., 2], g[..., 3]
        t01 = _add_np(a, b_)
        t23 = _add_np(c, d)
        t0123 = _add_np(t01, t23)
        t01123 = _add_np(t0123, b_)
        t01233 = _add_np(t0123, d)
        out_d = _add_np(t01233, _add_np(a, a))
        out_b = _add_np(t01123, _add_np(c, c))
        out_a = _add_np(t01123, t01)
        out_c = _add_np(t01233, t23)
        return np.stack([out_a, out_b, out_c, out_d], axis=-1).reshape(s)

    def ext_lin(v):
        y = m4(v)
        s = y.reshape(y.shape[:-1] + (width // 4, 4))
        acc = s[..., 0, :]
        for i in range(1, width // 4):
            acc = _add_np(acc, s[..., i, :])
        return _add_np(s, acc[..., None, :]).reshape(v.shape)

    def int_lin(v):
        acc = v[..., 0]
        for i in range(1, width):
            acc = _add_np(acc, v[..., i])
        return _add_np(acc[..., None], _mul_np(np.asarray(diag, np.uint64), v))

    half = ROUNDS_F // 2
    x = ext_lin(x)
    for r in range(half):
        x = _add_np(x, np.asarray(ext_rc[r], np.uint64))
        x = sbox(x)
        x = ext_lin(x)
    for r in range(int_rc.shape[0]):
        x0 = sbox(_add_np(x[..., 0], np.uint64(int_rc[r])))
        x = x.copy()
        x[..., 0] = x0
        x = int_lin(x)
    for r in range(half, ROUNDS_F):
        x = _add_np(x, np.asarray(ext_rc[r], np.uint64))
        x = sbox(x)
        x = ext_lin(x)
    return x.astype(np.uint32)


def hash_rows_np(matrix: np.ndarray) -> np.ndarray:
    from . import p2_native

    native = p2_native.hash_rows(matrix, RATE, DIGEST)
    if native is not None:
        return native
    s, c = matrix.shape
    n_blocks = max(1, -(-c // RATE))
    pad = n_blocks * RATE - c
    if pad:
        matrix = np.concatenate(
            [matrix, np.zeros((s, pad), dtype=np.uint32)], axis=1
        )
    state = np.zeros((s, WIDTH), dtype=np.uint32)
    for b in range(n_blocks):
        state[:, :RATE] = matrix[:, b * RATE : (b + 1) * RATE]
        state = permute_np(state)
    return state[:, :DIGEST]


def compress_np(left: np.ndarray, right: np.ndarray) -> np.ndarray:
    from . import p2_native

    native = p2_native.compress(left, right, DIGEST)
    if native is not None:
        return native
    return permute_np(np.concatenate([left, right], axis=-1))[..., :DIGEST]

"""ctypes wrapper for the native batch Poseidon2 kernel
(native/poseidon2/poseidon2.cpp) — the host hashing hot path.

Auto-builds the shared library (mirroring vm/executor.py) and installs
the Python-side round-constant tables on first use per width, so the
native permutation is bit-identical to ops/poseidon2.py::permute_np by
construction (including any `load_constants` Plonky3-parity override —
call `reset()` after installing overrides to re-sync).

Disable with ZKVM_TPU_NO_NATIVE_P2=1 (falls back to the numpy path)."""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_REPO_ROOT = Path(__file__).resolve().parents[2]
_SRC = _REPO_ROOT / "native" / "poseidon2" / "poseidon2.cpp"
_SO = _REPO_ROOT / "native" / "poseidon2" / "libposeidon2.so"

_U32P = np.ctypeslib.ndpointer(dtype=np.uint32, flags="C_CONTIGUOUS")


def build_native(force: bool = False) -> Path:
    if _SO.exists() and not force:
        if _SO.stat().st_mtime >= _SRC.stat().st_mtime:
            return _SO
    tmp = _SO.with_suffix(f".tmp{os.getpid()}.so")
    subprocess.run(
        [
            "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
            str(_SRC), "-o", str(tmp), "-lpthread",
        ],
        check=True,
    )
    os.replace(tmp, _SO)
    return _SO


_lib = None
_inited: set = set()


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is None:
        if os.environ.get("ZKVM_TPU_NO_NATIVE_P2"):
            return None
        try:
            lib = ctypes.CDLL(str(build_native()))
        except (OSError, subprocess.CalledProcessError):  # pragma: no cover
            return None
        lib.p2_init.argtypes = [
            ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32, _U32P,
            ctypes.c_uint32, _U32P, ctypes.c_uint32, _U32P,
        ]
        lib.p2_init.restype = ctypes.c_int
        lib.p2_permute.argtypes = [ctypes.c_uint32, ctypes.c_uint64, _U32P]
        lib.p2_permute.restype = ctypes.c_int
        lib.p2_hash_rows.argtypes = [
            ctypes.c_uint64, ctypes.c_uint64, ctypes.c_uint32,
            ctypes.c_uint32, _U32P, _U32P,
        ]
        lib.p2_hash_rows.restype = ctypes.c_int
        lib.p2_compress.argtypes = [
            ctypes.c_uint64, ctypes.c_uint32, _U32P, _U32P, _U32P,
        ]
        lib.p2_compress.restype = ctypes.c_int
        lib.bb_init.argtypes = [ctypes.c_uint32, ctypes.c_uint32]
        lib.bb_init.restype = ctypes.c_int
        lib.bb_mul_arrays.argtypes = [ctypes.c_uint64, _U32P, _U32P, _U32P]
        lib.bb_mul_arrays.restype = ctypes.c_int
        lib.bb_mul_scalar.argtypes = [
            ctypes.c_uint64, _U32P, ctypes.c_uint32, _U32P,
        ]
        lib.bb_mul_scalar.restype = ctypes.c_int
        for name in ("bb_mul_rows", "bb_mul_cols", "bb_mul_outer"):
            fn = getattr(lib, name)
            fn.argtypes = [ctypes.c_uint64, ctypes.c_uint64, _U32P, _U32P,
                           _U32P]
            fn.restype = ctypes.c_int
        lib.bb_mont_matmul.argtypes = [
            ctypes.c_uint64, ctypes.c_uint64, ctypes.c_uint64, _U32P, _U32P,
            _U32P,
        ]
        lib.bb_mont_matmul.restype = ctypes.c_int
        lib.bb_ntt.argtypes = [
            ctypes.c_uint32, ctypes.c_uint64, ctypes.c_uint64,
            ctypes.c_uint32, _U32P, _U32P,
        ]
        lib.bb_ntt.restype = ctypes.c_int
        lib.ext4_mul_arrays.argtypes = [
            ctypes.c_uint64, _U32P, _U32P, ctypes.c_uint32, _U32P,
        ]
        lib.ext4_mul_arrays.restype = ctypes.c_int
        from ..fields import babybear as bb

        lib.bb_init(np.uint32(bb.P), np.uint32(bb.NP))
        _lib = lib
    return _lib


def reset() -> None:
    """Force re-installation of constants (after load_constants)."""
    _inited.clear()


def _ensure_width(width: int) -> Optional[ctypes.CDLL]:
    lib = _load()
    if lib is None:
        return None
    if width not in _inited:
        from ..fields import babybear as bb
        from . import poseidon2 as p2

        ext_rc, int_rc, diag = p2._get_constants(width)
        ext_rc = np.ascontiguousarray(ext_rc, dtype=np.uint32)
        int_rc = np.ascontiguousarray(int_rc, dtype=np.uint32)
        diag = np.ascontiguousarray(diag, dtype=np.uint32)
        rc = lib.p2_init(
            np.uint32(bb.P), np.uint32(bb.NP), width, ext_rc,
            ext_rc.shape[0], int_rc, int_rc.shape[0], diag,
        )
        if rc != 0:  # pragma: no cover
            return None
        _inited.add(width)
    return lib


def permute(state: np.ndarray) -> Optional[np.ndarray]:
    """Batch permute (..., width); returns None if native unavailable."""
    width = state.shape[-1]
    lib = _ensure_width(width)
    if lib is None:
        return None
    out = np.ascontiguousarray(state, dtype=np.uint32).copy()
    flat = out.reshape(-1, width)
    lib.p2_permute(width, flat.shape[0], flat)
    return out


def hash_rows(matrix: np.ndarray, rate: int, digest: int
              ) -> Optional[np.ndarray]:
    lib = _ensure_width(16)
    if lib is None:
        return None
    mat = np.ascontiguousarray(matrix, dtype=np.uint32)
    s, c = mat.shape
    out = np.empty((s, digest), dtype=np.uint32)
    if lib.p2_hash_rows(s, c, rate, digest, mat, out) != 0:
        return None  # pragma: no cover
    return out


def bb_mul(a: np.ndarray, b: np.ndarray) -> Optional[np.ndarray]:
    """Batch base-field Montgomery product: same-shape arrays, or one
    operand a scalar/size-1 array (broadcast). Returns None when native
    is unavailable or the broadcast pattern isn't supported."""
    lib = _load()
    if lib is None:
        return None
    if b.ndim == 0 or b.size == 1:
        a = np.ascontiguousarray(a, dtype=np.uint32)
        out = np.empty_like(a)
        if lib.bb_mul_scalar(a.size, a.reshape(-1),
                             np.uint32(np.asarray(b).reshape(-1)[0]),
                             out.reshape(-1)) != 0:
            return None  # pragma: no cover
        return out
    if a.shape != b.shape:
        return _bb_mul_broadcast(lib, a, b)
    a = np.ascontiguousarray(a, dtype=np.uint32)
    b = np.ascontiguousarray(b, dtype=np.uint32)
    out = np.empty_like(a)
    if lib.bb_mul_arrays(a.size, a.reshape(-1), b.reshape(-1),
                         out.reshape(-1)) != 0:
        return None  # pragma: no cover
    return out


def _bb_mul_broadcast(lib, a: np.ndarray, b: np.ndarray
                      ) -> Optional[np.ndarray]:
    """Differently-shaped operands: recognize the prover's broadcast hot
    patterns (per-row scale, per-column scale, outer product) and route
    them to the fused native kernels. Anything else returns None (caller
    falls back to the numpy REDC path)."""
    try:
        out_shape = np.broadcast_shapes(a.shape, b.shape)
    except ValueError:
        return None
    nd = len(out_shape)

    def pad(s):
        return (1,) * (nd - len(s)) + tuple(s)

    pa, pb = pad(a.shape), pad(b.shape)
    out = tuple(out_shape)
    # commute so `a` is the operand covering the full output, if either does
    if pb == out and pa != out:
        a, b, pa, pb = b, a, pb, pa
    af = np.ascontiguousarray(a, dtype=np.uint32).reshape(-1)
    bf = np.ascontiguousarray(b, dtype=np.uint32).reshape(-1)
    res = np.empty(out, dtype=np.uint32)

    def prod(dims):
        p = 1
        for d in dims:
            p *= d
        return p

    if pa == out:
        nz = [i for i, d in enumerate(pb) if d != 1]
        if not nz:  # b is size-1: scalar kernel (callers handle, but be safe)
            if lib.bb_mul_scalar(af.size, af, np.uint32(bf[0]),
                                 res.reshape(-1)) != 0:
                return None  # pragma: no cover
            return res
        if all(pb[i] == pa[i] for i in nz):
            r_lo, r_hi = nz[0], nz[-1] + 1
            if all(d == 1 for d in pb[r_hi:]) and pb[:r_hi] == pa[:r_hi]:
                # b indexes the leading dims: per-row scale
                rows, cols = prod(pa[:r_hi]), prod(pa[r_hi:])
                if lib.bb_mul_rows(rows, cols, af, bf,
                                   res.reshape(-1)) != 0:
                    return None  # pragma: no cover
                return res
            if all(d == 1 for d in pb[:r_lo]) and pb[r_lo:] == pa[r_lo:]:
                # b indexes the trailing dims: per-column scale
                rows, cols = prod(pa[:r_lo]), prod(pa[r_lo:])
                if lib.bb_mul_cols(rows, cols, af, bf,
                                   res.reshape(-1)) != 0:
                    return None  # pragma: no cover
                return res
        return None
    # neither covers the output: outer product a(leading) x b(trailing)
    nz_a = [i for i, d in enumerate(pa) if d != 1]
    nz_b = [i for i, d in enumerate(pb) if d != 1]
    if nz_a and nz_b and nz_b[-1] < nz_a[0]:
        a, b, pa, pb, af, bf = b, a, pb, pa, bf, af
        nz_a, nz_b = nz_b, nz_a
    if nz_a and nz_b and nz_a[-1] < nz_b[0] \
            and all(pa[i] == out[i] for i in nz_a) \
            and all(pb[i] == out[i] for i in nz_b) \
            and af.size * bf.size == prod(out):
        if lib.bb_mul_outer(af.size, bf.size, af, bf,
                            res.reshape(-1)) != 0:
            return None  # pragma: no cover
        return res
    return None


def mont_matmul(a: np.ndarray, b: np.ndarray) -> Optional[np.ndarray]:
    """Native exact modular matmul of Montgomery operands, Montgomery
    result (the twin of fields/babybear.py::mont_matmul_np). Returns None
    when native is unavailable or the inner-column count is unsupported."""
    lib = _load()
    if lib is None or b.ndim != 2 or b.shape[1] > 64:
        return None
    m, k = (a.shape if a.ndim == 2 else (1, a.shape[0]))
    if a.ndim > 2 or k != b.shape[0] or k > (1 << 21):
        return None
    a2 = np.ascontiguousarray(a, dtype=np.uint32)
    b2 = np.ascontiguousarray(b, dtype=np.uint32)
    out = np.empty((m, b.shape[1]), dtype=np.uint32)
    if lib.bb_mont_matmul(m, k, b.shape[1], a2.reshape(-1), b2.reshape(-1),
                          out.reshape(-1)) != 0:
        return None  # pragma: no cover
    return out if a.ndim == 2 else out.reshape(b.shape[1:])


def ntt_stages(x: np.ndarray, log_n: int, tw_flat: np.ndarray, dit: bool
               ) -> Optional[np.ndarray]:
    """Staged radix-2 NTT butterflies on an (n, ...) matrix. tw_flat is
    the caller's flattened Montgomery stage-twiddle tables (stage s at
    offset 2^(s-1)-1), so the result is bit-identical to the numpy
    staged loop by construction. Returns a NEW array (input untouched)
    or None if native is unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = x.shape[0]
    out = np.array(x, dtype=np.uint32, order="C")  # one copy, contiguous
    cols = out.size // n if n else 0
    if lib.bb_ntt(1 if dit else 0, n, cols, log_n,
                  np.ascontiguousarray(tw_flat, dtype=np.uint32),
                  out.reshape(-1)) != 0:
        return None  # pragma: no cover
    return out


def ext4_mul(a: np.ndarray, b: np.ndarray, w_monty: int
             ) -> Optional[np.ndarray]:
    """Batch quartic-extension multiply on (..., 4) numpy arrays (equal
    shapes, pre-broadcast). Returns None if native unavailable."""
    lib = _load()
    if lib is None:
        return None
    a = np.ascontiguousarray(a, dtype=np.uint32)
    b = np.ascontiguousarray(b, dtype=np.uint32)
    out = np.empty_like(a)
    n = a.size // 4
    if lib.ext4_mul_arrays(n, a.reshape(-1), b.reshape(-1),
                           np.uint32(w_monty), out.reshape(-1)) != 0:
        return None  # pragma: no cover
    return out


def compress(left: np.ndarray, right: np.ndarray, digest: int
             ) -> Optional[np.ndarray]:
    lib = _ensure_width(16)
    if lib is None:
        return None
    l = np.ascontiguousarray(left, dtype=np.uint32)
    r = np.ascontiguousarray(right, dtype=np.uint32)
    shape = l.shape
    lf = l.reshape(-1, 8)
    out = np.empty((lf.shape[0], digest), dtype=np.uint32)
    if lib.p2_compress(lf.shape[0], digest, lf, r.reshape(-1, 8),
                       out) != 0:
        return None  # pragma: no cover
    return out.reshape(shape[:-1] + (digest,))

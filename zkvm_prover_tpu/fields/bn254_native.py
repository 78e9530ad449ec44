"""ctypes wrapper for the native BN254 Pippenger MSM
(native/bn254/bn254.cpp) — the host MSM engine for the SNARK wrapper.

Auto-builds the shared library (mirroring ops/p2_native.py), installs the
field constants from fields/bn254.py, and exposes `msm(points, scalars)`
returning an affine point (or None for the infinity result / if the
native library is unavailable — callers fall back to the python path).

Disable with ZKVM_TPU_NO_NATIVE_BN254=1."""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

_REPO_ROOT = Path(__file__).resolve().parents[2]
_SRC = _REPO_ROOT / "native" / "bn254" / "bn254.cpp"
_SO = _REPO_ROOT / "native" / "bn254" / "libbn254.so"

_U64P = np.ctypeslib.ndpointer(dtype=np.uint64, flags="C_CONTIGUOUS")
_U8P = np.ctypeslib.ndpointer(dtype=np.uint8, flags="C_CONTIGUOUS")

_UNAVAILABLE = object()


def build_native(force: bool = False) -> Path:
    if _SO.exists() and not force:
        if _SO.stat().st_mtime >= _SRC.stat().st_mtime:
            return _SO
    tmp = _SO.with_suffix(f".tmp{os.getpid()}.so")
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", str(_SRC),
         "-o", str(tmp)],
        check=True,
    )
    os.replace(tmp, _SO)
    return _SO


_lib = None


def _limbs64(x: int) -> np.ndarray:
    return np.array([(x >> (64 * k)) & ((1 << 64) - 1) for k in range(4)],
                    dtype=np.uint64)


def _load():
    global _lib
    if _lib is None:
        if os.environ.get("ZKVM_TPU_NO_NATIVE_BN254"):
            _lib = _UNAVAILABLE
            return None
        try:
            lib = ctypes.CDLL(str(build_native()))
        except (OSError, subprocess.CalledProcessError):  # pragma: no cover
            _lib = _UNAVAILABLE
            return None
        lib.bn254_init.argtypes = [_U64P, _U64P, _U64P, ctypes.c_uint64]
        lib.bn254_init.restype = ctypes.c_int
        lib.bn254_msm.argtypes = [
            _U64P, _U8P, ctypes.c_uint64, ctypes.c_uint32, _U64P,
        ]
        lib.bn254_msm.restype = ctypes.c_int

        from . import bn254 as bn

        R_mont = (1 << 256) % bn.Q
        r2 = R_mont * R_mont % bn.Q
        inv = (-pow(bn.Q, -1, 1 << 64)) % (1 << 64)
        lib.bn254_init(_limbs64(bn.Q), _limbs64(r2), _limbs64(R_mont),
                       np.uint64(inv))
        _lib = lib
    return None if _lib is _UNAVAILABLE else _lib


def msm(points: Sequence, scalars: Sequence[int], c: int = 8):
    """Native Pippenger MSM; returns the affine G1 result, None for the
    zero result, or the string "unavailable" sentinel-free fallback is
    signalled by raising nothing — callers check availability first via
    `available()`."""
    lib = _load()
    assert lib is not None, "native bn254 unavailable (check available())"
    from . import bn254 as bn

    n = len(points)
    aff = np.zeros((n, 8), dtype=np.uint64)
    for i, p in enumerate(points):
        if p is None:
            continue  # (0, 0) encodes infinity
        aff[i, :4] = _limbs64(p[0])
        aff[i, 4:] = _limbs64(p[1])
    sc = np.zeros((n, 32), dtype=np.uint8)
    for i, s in enumerate(scalars):
        sc[i] = np.frombuffer((s % bn.R).to_bytes(32, "little"),
                              dtype=np.uint8)
    out = np.zeros(12, dtype=np.uint64)
    rc = lib.bn254_msm(np.ascontiguousarray(aff.reshape(-1)),
                       np.ascontiguousarray(sc.reshape(-1)),
                       n, c, out)
    assert rc == 0, f"bn254_msm rc={rc}"

    def unl(a):
        return sum(int(v) << (64 * k) for k, v in enumerate(a))

    x, y, z = unl(out[:4]), unl(out[4:8]), unl(out[8:12])
    if z == 0:
        return None
    zinv = pow(z, -1, bn.Q)
    z2 = zinv * zinv % bn.Q
    return (x * z2 % bn.Q, y * z2 * zinv % bn.Q)


def available() -> bool:
    return _load() is not None

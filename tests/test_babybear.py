"""BabyBear base/extension field correctness vs Python bignum arithmetic."""

import numpy as np
import jax.numpy as jnp
import pytest

from zkvm_prover_tpu.fields import babybear as bb
from zkvm_prover_tpu.fields import ext4

P = bb.P
RNG = np.random.default_rng(0)


def rand_canon(n):
    return RNG.integers(0, P, size=n, dtype=np.uint64).astype(np.uint32)


def test_constants():
    assert (bb.P * bb.NP) % (1 << 32) == (1 << 32) - 1
    assert bb.R == (1 << 32) % P
    assert pow(bb.GENERATOR, (P - 1) // 2, P) != 1  # generator is a non-residue
    # order of two_adic_generator(k) is exactly 2^k
    for k in (1, 5, 27):
        g = bb.two_adic_generator_int(k)
        assert pow(g, 1 << k, P) == 1
        assert pow(g, 1 << (k - 1), P) != 1


def test_mul32_wide():
    a = rand_canon(1000)
    b = rand_canon(1000)
    hi, lo = bb.mul32_wide(a, b)
    got = (np.asarray(hi, dtype=np.uint64) << 32) | np.asarray(lo, dtype=np.uint64)
    want = a.astype(np.uint64) * b.astype(np.uint64)
    np.testing.assert_array_equal(got, want)


def test_monty_roundtrip():
    a = rand_canon(1000)
    back = np.asarray(bb.from_monty(bb.to_monty(a)))
    np.testing.assert_array_equal(back, a)


def test_add_sub_neg():
    a = rand_canon(1000)
    b = rand_canon(1000)
    np.testing.assert_array_equal(
        np.asarray(bb.add(a, b)), (a.astype(np.uint64) + b) % P
    )
    np.testing.assert_array_equal(
        np.asarray(bb.sub(a, b)), (a.astype(np.int64) - b) % P
    )
    np.testing.assert_array_equal(np.asarray(bb.neg(a)), (-a.astype(np.int64)) % P)


def test_mont_mul():
    a = rand_canon(1000)
    b = rand_canon(1000)
    am = bb.to_monty(a)
    bm = bb.to_monty(b)
    got = np.asarray(bb.from_monty(bb.mul(am, bm)))
    want = (a.astype(object) * b.astype(object)) % P
    np.testing.assert_array_equal(got, want.astype(np.uint64))


def test_edge_values():
    vals = np.array([0, 1, 2, P - 1, P - 2, 1 << 27, 15], dtype=np.uint32)
    m = bb.to_monty(vals)
    got = np.asarray(bb.from_monty(bb.mul(m, m)))
    want = (vals.astype(object) ** 2) % P
    np.testing.assert_array_equal(got, want.astype(np.uint64))


def test_inv():
    a = rand_canon(64)
    a[0] = 0  # inv(0) -> 0 convention
    am = bb.to_monty(a)
    got = np.asarray(bb.from_monty(bb.inv(am)))
    for x, g in zip(a, got):
        if x == 0:
            assert g == 0
        else:
            assert (int(x) * int(g)) % P == 1


def test_batch_inv():
    a = rand_canon(257)
    a[7] = 0
    am = bb.to_monty(a)
    got = np.asarray(bb.from_monty(bb.batch_inv(am)))
    for x, g in zip(a, got):
        if x == 0:
            assert g == 0
        else:
            assert (int(x) * int(g)) % P == 1


# --- extension field ------------------------------------------------------


def ext_mul_ref(a, b):
    """Schoolbook mult mod x^4 - 11 over Python ints."""
    c = [0] * 7
    for i in range(4):
        for j in range(4):
            c[i + j] += a[i] * b[j]
    for k in range(6, 3, -1):
        c[k - 4] += ext4.W_INT * c[k]
    return [v % P for v in c[:4]]


def rand_ext():
    return [int(x) for x in RNG.integers(0, P, size=4)]


def test_ext_mul():
    for _ in range(20):
        a = rand_ext()
        b = rand_ext()
        am = ext4.from_ints(a)
        bm = ext4.from_ints(b)
        got = [int(v) for v in np.asarray(bb.from_monty(ext4.mul(am, bm)))]
        assert got == ext_mul_ref(a, b)


def test_ext_mul_batched():
    a = RNG.integers(0, P, size=(32, 4)).astype(np.uint32)
    b = RNG.integers(0, P, size=(32, 4)).astype(np.uint32)
    am = bb.to_monty(jnp.asarray(a))
    bm = bb.to_monty(jnp.asarray(b))
    got = np.asarray(bb.from_monty(ext4.mul(am, bm)))
    for i in range(32):
        assert [int(v) for v in got[i]] == ext_mul_ref(
            [int(v) for v in a[i]], [int(v) for v in b[i]]
        )


def test_ext_inv():
    for _ in range(10):
        a = rand_ext()
        am = ext4.from_ints(a)
        got_inv = ext4.inv(am)
        prod = np.asarray(bb.from_monty(ext4.mul(am, got_inv)))
        assert list(prod) == [1, 0, 0, 0]


def test_ext_frobenius_is_pth_power():
    a = rand_ext()
    am = ext4.from_ints(a)
    frob = np.asarray(bb.from_monty(ext4.frobenius(am, 1)))
    pth = np.asarray(bb.from_monty(ext4.exp_const(am, P)))
    np.testing.assert_array_equal(frob, pth)


def test_ext_powers():
    a = rand_ext()
    am = ext4.from_ints(a)
    pw = ext4.powers(am, 5)
    p2 = np.asarray(bb.from_monty(pw[2]))
    want = np.asarray(bb.from_monty(ext4.mul(am, am)))
    np.testing.assert_array_equal(p2, want)

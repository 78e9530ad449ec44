"""NTT / coset LDE vs naive bignum DFT."""

import numpy as np
import jax.numpy as jnp

from zkvm_prover_tpu.fields import babybear as bb
from zkvm_prover_tpu.fields import ext4
from zkvm_prover_tpu.ops import ntt

P = bb.P
RNG = np.random.default_rng(1)


def naive_dft(coeffs, root, shift=1):
    """X_t = sum_j c_j * (shift * root^t)^j ... no: evals of poly at shift*root^t."""
    n = len(coeffs)
    out = []
    for t in range(n):
        x = (shift * pow(root, t, P)) % P
        acc = 0
        for j in reversed(range(n)):
            acc = (acc * x + int(coeffs[j])) % P
        out.append(acc)
    return np.array(out, dtype=np.uint64)


def rand_poly(n, w=1):
    return RNG.integers(0, P, size=(n, w), dtype=np.uint64).astype(np.uint32)


def test_ntt_matches_naive_dft():
    log_n = 4
    n = 1 << log_n
    c = rand_poly(n, 3)
    root = bb.two_adic_generator_int(log_n)
    cm = bb.to_monty(jnp.asarray(c))
    got_rev = np.asarray(bb.from_monty(ntt.ntt_natural_to_rev(cm)))
    rev = ntt._bitrev_perm(log_n)
    got = got_rev[np.argsort(rev)]  # un-bit-reverse
    for w in range(3):
        want = naive_dft(c[:, w], root)
        np.testing.assert_array_equal(got[:, w].astype(np.uint64), want)


def test_ntt_roundtrip():
    for log_n in (1, 3, 6, 10):
        n = 1 << log_n
        c = bb.to_monty(jnp.asarray(rand_poly(n, 2)))
        evals_rev = ntt.ntt_natural_to_rev(c)
        back = np.asarray(ntt.intt_rev_to_natural(evals_rev))
        np.testing.assert_array_equal(back, np.asarray(c))
        # other direction
        coeffs_rev = ntt.intt_natural_to_rev(c)
        back2 = np.asarray(ntt.ntt_rev_to_natural(coeffs_rev))
        np.testing.assert_array_equal(back2, np.asarray(c))


def test_coset_lde():
    log_n, log_blowup = 3, 1
    n = 1 << log_n
    m = n << log_blowup
    vals = rand_poly(n, 2)
    vm = bb.to_monty(jnp.asarray(vals))
    lde = np.asarray(bb.from_monty(ntt.coset_lde(vm, log_blowup)))
    # reference: interpolate coeffs from evals on H, evaluate on g*G
    root_n = bb.two_adic_generator_int(log_n)
    root_m = bb.two_adic_generator_int(log_n + log_blowup)
    for w in range(2):
        # naive interpolation: c = IDFT(vals)
        n_inv = pow(n, P - 2, P)
        coeffs = [
            (n_inv * sum(int(vals[t, w]) * pow(root_n, -j * t % (n), P) for t in range(n)))
            % P
            for j in range(n)
        ]
        coeffs_padded = np.array(coeffs + [0] * (m - n), dtype=np.uint64)
        want = naive_dft(coeffs_padded, root_m, shift=bb.GENERATOR)
        np.testing.assert_array_equal(lde[:, w].astype(np.uint64), want)


def test_lde_first_coset_is_consistent_with_degree():
    # LDE of a low-degree poly evaluated back on the original points:
    # points shift*w_m^(2j) = shift*w_n^j — LDE at stride-2 positions must be
    # the evals of the same poly on the shifted subgroup.
    log_n = 5
    n = 1 << log_n
    vals = bb.to_monty(jnp.asarray(rand_poly(n, 1)))
    lde = ntt.coset_lde(vals, 1)
    # fold check: lde[j]^2-domain consistency via second LDE of subsampled rows
    sub = lde[0::2]
    coeffs_rev = ntt.intt_natural_to_rev(vals)
    # evaluate poly on g*H directly
    scale = ntt._powers_bitrev_monty(bb.GENERATOR, log_n).reshape(n, 1)
    direct = ntt._dit(bb.mul(coeffs_rev, scale), log_n, inverse=False)
    np.testing.assert_array_equal(np.asarray(sub), np.asarray(direct))


def test_eval_poly_at_ext_point():
    log_n = 4
    n = 1 << log_n
    c = rand_poly(n, 2)
    cm = bb.to_monty(jnp.asarray(c))
    # bit-reversed coeff layout
    rev = ntt._bitrev_perm(log_n)
    c_rev = cm[jnp.asarray(rev)]
    z = [123456, 789, 4242, 999999]
    zm = ext4.from_ints(z)
    got = np.asarray(bb.from_monty(ntt.eval_poly_at_point_ext(c_rev, zm)))

    # reference: Horner over the extension using python ints
    def ext_mul(a, b):
        cfull = [0] * 7
        for i in range(4):
            for j in range(4):
                cfull[i + j] += a[i] * b[j]
        for k in range(6, 3, -1):
            cfull[k - 4] += 11 * cfull[k]
        return [v % P for v in cfull[:4]]

    for w in range(2):
        acc = [0, 0, 0, 0]
        for j in reversed(range(n)):
            acc = ext_mul(acc, z)
            acc[0] = (acc[0] + int(c[j, w])) % P
        np.testing.assert_array_equal(got[w].astype(np.uint64), np.array(acc))


def test_field_sum():
    x = rand_poly(1000, 1)[:, 0]
    got = int(np.asarray(ntt.field_sum(jnp.asarray(x))))
    assert got == int(x.astype(object).sum() % P)

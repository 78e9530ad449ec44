"""TPU Pippenger MSM kernels: 16-bit-limb Montgomery field, unified
Jacobian adds, sort-based bucket accumulation. Cross-checked against the
host bn254 reference implementation (BASELINE.json "BN254 MSM pts/s")."""

import numpy as np
import pytest

from zkvm_prover_tpu.fields import bn254 as bn
from zkvm_prover_tpu.ops import msm
from zkvm_prover_tpu.ops.bigint import BN254_FQ as F

RNG = np.random.default_rng(7)


def _rand_fq(n):
    return [int(RNG.integers(0, 1 << 63)) * 3 + 1 for _ in range(n)]


def test_bigint_field_ops():
    xs = _rand_fq(8) + [0, 1, bn.Q - 1]
    ys = _rand_fq(8) + [bn.Q - 1, 5, 1]
    a = np.stack([F.to_monty_int(x) for x in xs])
    b = np.stack([F.to_monty_int(y) for y in ys])
    s = F.add(a, b)
    d = F.sub(a, b)
    p = F.mul(a, b)
    for i, (x, y) in enumerate(zip(xs, ys)):
        assert F.from_monty(s[i]) == (x + y) % bn.Q
        assert F.from_monty(d[i]) == (x - y) % bn.Q
        assert F.from_monty(p[i]) == (x * y) % bn.Q
    z = F.neg(a)
    for i, x in enumerate(xs):
        assert F.from_monty(z[i]) == (-x) % bn.Q


def test_point_add_double_vs_host():
    pts = [bn.g1_mul(bn.G1_GEN, k) for k in (1, 2, 5, 77, 123457)]
    X, Y, Z = msm.affine_to_limbs(pts)
    # double all
    dX, dY, dZ = msm.pt_double((X, Y, Z))
    for i, p in enumerate(pts):
        got = msm.pt_to_affine_int((dX[i], dY[i], dZ[i]))
        assert got == bn.g1_add(p, p)
    # pairwise adds incl. equal/opposite/infinity lanes
    q_list = [pts[1], pts[0], bn.g1_neg(pts[2]), None, pts[4]]
    Xq, Yq, Zq = msm.affine_to_limbs(q_list)
    aX, aY, aZ = msm.pt_add((X, Y, Z), (Xq, Yq, Zq))
    for i, (p, q) in enumerate(zip(pts, q_list)):
        got = msm.pt_to_affine_int((aX[i], aY[i], aZ[i]))
        assert got == bn.g1_add(p, q), i


@pytest.mark.parametrize(
    "use_jax",
    [
        False,
        pytest.param(True, marks=pytest.mark.skipif(
            "not config.getoption('--run-heavy', default=False) "
            "and not __import__('os').environ.get('RUN_HEAVY')",
            reason="jax MSM graph compile is minutes on 2-core CI; the "
                   "kernel code is backend-identical to the numpy variant "
                   "(exercised above) and runs on TPU via bench.py",
        )),
    ],
    ids=["numpy", "jax"],
)
def test_msm_matches_reference(use_jax):
    n = 32
    pts = [bn.g1_mul(bn.G1_GEN, int(RNG.integers(1, 1 << 30)))
           for _ in range(n)]
    scalars = [int(RNG.integers(0, 1 << 62)) for _ in range(n)]
    scalars[0] = 0
    scalars[1] = bn.R - 1
    want = bn.msm(pts, scalars)
    got = msm.msm_device(pts, scalars, c=8, use_jax=use_jax)
    assert got == want


def test_msm_duplicate_buckets():
    """Many points landing in the same bucket exercises the doubling lane
    of the unified add."""
    pts = [bn.G1_GEN] * 7 + [bn.g1_mul(bn.G1_GEN, 3)]
    scalars = [5] * 7 + [5]
    want = bn.msm(pts, scalars)
    got = msm.msm_device(pts, scalars, c=4, use_jax=False)
    assert got == want

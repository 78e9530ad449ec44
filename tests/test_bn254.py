"""BN254 host library: curve laws, optimal-ate pairing, Pippenger MSM,
KZG commit/open/verify, and the EvmProof instance layout.

Reference parity targets: halo2curves-axiom BN254 + snark-verifier KZG
(crates/prover/src/prover/mod.rs:419-432), EvmProof instances at
crates/types/src/proof.rs:221-239.
"""

import pytest

from zkvm_prover_tpu.fields import bn254 as bn

pytestmark = pytest.mark.filterwarnings("ignore")


def test_generators_on_curve():
    assert bn.g1_is_on_curve(bn.G1_GEN)
    assert bn.g2_is_on_curve(bn.G2_GEN)


def test_g1_group_law():
    p2 = bn.g1_add(bn.G1_GEN, bn.G1_GEN)
    p3 = bn.g1_add(p2, bn.G1_GEN)
    assert p3 == bn.g1_mul(bn.G1_GEN, 3)
    assert bn.g1_is_on_curve(p3)
    assert bn.g1_mul(bn.G1_GEN, bn.R) is None
    assert bn.g1_add(bn.G1_GEN, bn.g1_neg(bn.G1_GEN)) is None


def test_g2_group_law():
    p2 = bn.g2_add(bn.G2_GEN, bn.G2_GEN)
    assert bn.g2_is_on_curve(p2)
    assert p2 == bn.g2_mul(bn.G2_GEN, 2)
    assert bn.g2_mul(bn.G2_GEN, bn.R) is None


def test_fq12_inverse():
    a = bn.fq12(3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8)
    assert bn.fq12_mul(a, bn.fq12_inv(a)) == bn.FQ12_ONE


def test_pairing_bilinearity():
    f1 = bn.pairing(bn.g2_mul(bn.G2_GEN, 5), bn.G1_GEN)
    f2 = bn.pairing(bn.G2_GEN, bn.g1_mul(bn.G1_GEN, 5))
    assert f1 == f2
    assert f1 != bn.FQ12_ONE


def test_msm_matches_naive():
    pts = [bn.g1_mul(bn.G1_GEN, k) for k in (1, 7, 11, 13, 100003)]
    scalars = [3, 0, 2**65 + 5, bn.R - 1, 123456789]
    expect = None
    for p, s in zip(pts, scalars):
        expect = bn.g1_add(expect, bn.g1_mul(p, s))
    assert bn.msm(pts, scalars) == expect


def test_kzg_roundtrip():
    srs = bn.KzgSrs.generate_insecure(4, tau=0xBEEF)
    coeffs = [5, 3, 0, 7, 11, 2, 9, 1]
    c = bn.kzg_commit(srs, coeffs)
    z = 0x1234
    y, proof = bn.kzg_open(srs, coeffs, z)
    assert y == sum(cf * pow(z, i, bn.R) for i, cf in enumerate(coeffs)) \
        % bn.R
    assert bn.kzg_verify(srs.tau_g2, c, z, y, proof)
    # wrong evaluation must fail
    assert not bn.kzg_verify(srs.tau_g2, c, z, (y + 1) % bn.R, proof)


def test_evm_proof_instance_layout():
    from zkvm_prover_tpu.host.proof_types import (
        N_ACC_SCALARS, N_DIGEST_SCALARS, N_PI_SCALARS, EvmProof)

    assert (N_ACC_SCALARS, N_DIGEST_SCALARS, N_PI_SCALARS) == (12, 2, 32)
    pi = bytes(range(32))
    instances = (
        b"\x00" * 32 * N_ACC_SCALARS
        + b"\x11" * 32 * N_DIGEST_SCALARS
        + b"".join(b.to_bytes(32, "big") for b in pi)
    )
    p = EvmProof(proof=b"\xaa" * 64, instances=instances)
    assert bytes(p.public_values()) == pi


def test_native_msm_matches_python():
    """The C++ Pippenger engine must agree with the python reference on
    mixed cases (infinity inputs, zero scalars, full-width scalars)."""
    import numpy as np

    from zkvm_prover_tpu.fields import bn254 as bn
    from zkvm_prover_tpu.fields import bn254_native

    if not bn254_native.available():
        import pytest

        pytest.skip("native bn254 unavailable")
    rng = np.random.default_rng(11)
    base = [bn.g1_mul_jac(bn.G1_GEN, k + 1) for k in range(16)]
    for n in (8, 61):
        pts = [None if i % 7 == 3 else base[int(i) % 16] for i in range(n)]
        sc = [0 if i % 5 == 2
              else int.from_bytes(rng.bytes(32), "little") % bn.R
              for i in range(n)]
        assert bn254_native.msm(pts, sc) == bn.msm(pts, sc)
    # all-zero / all-infinity edge: the zero result
    assert bn254_native.msm([base[0]] * 8, [0] * 8) is None
    assert bn254_native.msm([None] * 8, [5] * 8) is None

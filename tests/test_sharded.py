"""Multi-device (virtual 8-CPU mesh) bit-identity tests: sharded NTT and
Merkle must match the single-device kernels exactly (SURVEY.md §4: the
multi-chip tests the reference lacks)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zkvm_prover_tpu.fields import babybear as bb
from zkvm_prover_tpu.ops import ntt
from zkvm_prover_tpu.parallel import mesh as mesh_mod
from zkvm_prover_tpu.parallel.ntt_sharded import ntt_natural_to_rev_sharded
from zkvm_prover_tpu.parallel.merkle_sharded import commit_root_sharded
from zkvm_prover_tpu.stark import merkle

RNG = np.random.default_rng(3)


@pytest.fixture(scope="module")
def mesh8():
    assert jax.device_count() >= 8, "conftest must force 8 host devices"
    return mesh_mod.make_mesh(n_shard=8)


def test_sharded_ntt_matches_single_device(mesh8):
    log_n = 10
    n = 1 << log_n
    x = bb.to_monty(
        jnp.asarray(RNG.integers(0, bb.P, size=(n,), dtype=np.uint64).astype(np.uint32))
    )
    want = np.asarray(ntt.ntt_natural_to_rev(x))
    got = np.asarray(ntt_natural_to_rev_sharded(x, mesh8))
    np.testing.assert_array_equal(got, want)


def test_sharded_ntt_batched(mesh8):
    log_n = 8
    n = 1 << log_n
    x = bb.to_monty(
        jnp.asarray(
            RNG.integers(0, bb.P, size=(n, 3), dtype=np.uint64).astype(np.uint32)
        )
    )
    want = np.asarray(ntt.ntt_natural_to_rev(x))
    got = np.asarray(ntt_natural_to_rev_sharded(x, mesh8))
    np.testing.assert_array_equal(got, want)


def test_sharded_merkle_root_matches(mesh8):
    h, w = 64, 5
    m = bb.to_monty(
        jnp.asarray(
            RNG.integers(0, bb.P, size=(h, w), dtype=np.uint64).astype(np.uint32)
        )
    )
    want = merkle.commit([m]).root_np()
    got = np.asarray(commit_root_sharded(m, mesh8))
    np.testing.assert_array_equal(got, want)


def test_sharded_intt_and_rev_to_natural(mesh8):
    from zkvm_prover_tpu.parallel.ntt_sharded import (
        intt_natural_to_rev_sharded,
        ntt_rev_to_natural_sharded,
    )

    log_n = 9
    n = 1 << log_n
    x = bb.to_monty(
        jnp.asarray(
            RNG.integers(0, bb.P, size=(n, 2), dtype=np.uint64).astype(
                np.uint32
            )
        )
    )
    want = np.asarray(ntt.intt_natural_to_rev(x))
    got = np.asarray(intt_natural_to_rev_sharded(x, mesh8))
    np.testing.assert_array_equal(got, want)

    want2 = np.asarray(ntt.ntt_rev_to_natural(x))
    got2 = np.asarray(ntt_rev_to_natural_sharded(x, mesh8))
    np.testing.assert_array_equal(got2, want2)


def test_sharded_coset_lde_matches(mesh8):
    from zkvm_prover_tpu.parallel.ntt_sharded import coset_lde_sharded

    log_n = 8
    n = 1 << log_n
    x = bb.to_monty(
        jnp.asarray(
            RNG.integers(0, bb.P, size=(n, 3), dtype=np.uint64).astype(
                np.uint32
            )
        )
    )
    want = np.asarray(ntt.coset_lde(x, 1, bb.GENERATOR))
    got = np.asarray(coset_lde_sharded(x, 1, mesh8))
    np.testing.assert_array_equal(got, want)


def test_sharded_fri_fold_matches_single_device(mesh8):
    """FRI fold under shard_map (4-ppermute halo exchange) is
    bit-identical to stark.fri.fold_round."""
    from zkvm_prover_tpu.parallel.fri_sharded import fold_round_sharded
    from zkvm_prover_tpu.stark import fri as fri_mod

    log_m = 9
    m = 1 << log_m
    shift = bb.GENERATOR
    cw = bb.to_monty(jnp.asarray(
        RNG.integers(0, bb.P, size=(m, 4), dtype=np.uint64).astype(
            np.uint32)))
    beta = bb.to_monty(jnp.asarray(
        RNG.integers(0, bb.P, size=(4,), dtype=np.uint64).astype(
            np.uint32)))
    want = np.asarray(fri_mod.fold_round(np.asarray(cw), log_m, shift,
                                         np.asarray(beta)))
    got = np.asarray(fold_round_sharded(cw, log_m, shift, beta, mesh8))
    np.testing.assert_array_equal(got, want)

    # two chained folds (the commit-phase loop shape)
    shift2 = (shift * shift) % bb.P
    want2 = np.asarray(fri_mod.fold_round(want, log_m - 1, shift2,
                                          np.asarray(beta)))
    got2 = np.asarray(fold_round_sharded(
        jnp.asarray(want), log_m - 1, shift2, beta, mesh8))
    np.testing.assert_array_equal(got2, want2)


def test_sharded_ood_eval_matches(mesh8):
    """eval_poly_at_point_ext_sharded == single-device OOD opening."""
    from zkvm_prover_tpu.parallel.pipeline_sharded import (
        eval_poly_at_point_ext_sharded,
    )

    log_n, w = 9, 3
    n = 1 << log_n
    c = bb.to_monty(jnp.asarray(
        RNG.integers(0, bb.P, size=(n, w), dtype=np.uint64)
        .astype(np.uint32)))
    z = bb.to_monty(jnp.asarray(
        RNG.integers(0, bb.P, size=(4,), dtype=np.uint64).astype(np.uint32)))
    got = np.asarray(eval_poly_at_point_ext_sharded(c, z, mesh8))
    want = np.asarray(ntt.eval_poly_at_point_ext(np.asarray(c),
                                                 np.asarray(z)))
    assert (got == want).all()


def test_sharded_full_prover_core_bit_identical(mesh8):
    """The ENTIRE prover core (LDE -> commit -> quotient -> OOD -> DEEP ->
    FRI fold) sharded over the 8-device mesh equals the single-device
    pipeline bit for bit (VERDICT 'shard the whole prover')."""
    from zkvm_prover_tpu.models.fibonacci import FibonacciAir
    from zkvm_prover_tpu.parallel.pipeline_sharded import (
        make_prover_core_sharded,
    )
    from zkvm_prover_tpu.stark.config import StarkConfig
    from zkvm_prover_tpu.stark.pipeline import make_prover_core

    log_n = 8
    air = FibonacciAir()
    trace, pvs = air.generate_trace(log_n)
    cfg = StarkConfig()
    core = make_prover_core(air, log_n, cfg)
    score = make_prover_core_sharded(air, log_n, cfg, mesh8)

    trace_m = bb.to_monty(jnp.asarray(trace))
    pvs_m = jnp.asarray(
        np.array([bb.to_monty_int(v) for v in pvs], dtype=np.uint32))

    def rext():
        return bb.to_monty(jnp.asarray(
            RNG.integers(0, bb.P, size=(4,), dtype=np.uint64)
            .astype(np.uint32)))

    args = (trace_m, pvs_m, rext(), rext(), rext())
    single = core(*args)
    sharded = score(*args)
    for name, x, y in zip(("trace_root", "q_root", "codeword", "folded"),
                          single, sharded):
        assert (np.asarray(x) == np.asarray(y)).all(), name

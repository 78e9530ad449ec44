"""End-to-end single-AIR STARK: prove on the (virtual) device pipeline,
verify with the host verifier; tamper checks."""

import copy

import numpy as np
import pytest

from zkvm_prover_tpu.models.fibonacci import FibonacciAir
from zkvm_prover_tpu.stark import prover as stark_prover
from zkvm_prover_tpu.stark import verifier as stark_verifier
from zkvm_prover_tpu.stark.config import fast_test_config


@pytest.fixture(scope="module")
def fib_proof():
    air = FibonacciAir()
    trace, pvs = air.generate_trace(4)
    cfg = fast_test_config()
    proof = stark_prover.prove(air, trace, pvs, cfg)
    return air, proof, cfg, trace, pvs


def test_prove_verify_roundtrip(fib_proof):
    air, proof, cfg, _, _ = fib_proof
    assert stark_verifier.verify(air, proof, cfg)


def test_reject_wrong_public_values(fib_proof):
    air, proof, cfg, _, _ = fib_proof
    bad = copy.deepcopy(proof)
    bad.public_values = list(bad.public_values)
    bad.public_values[2] = (bad.public_values[2] + 1) % 2013265921
    assert not stark_verifier.verify(air, bad, cfg)


def test_reject_tampered_opening(fib_proof):
    air, proof, cfg, _, _ = fib_proof
    bad = copy.deepcopy(proof)
    bad.opened_trace_zeta = bad.opened_trace_zeta.copy()
    bad.opened_trace_zeta[0, 0] ^= 1
    assert not stark_verifier.verify(air, bad, cfg)


def test_reject_tampered_root(fib_proof):
    air, proof, cfg, _, _ = fib_proof
    bad = copy.deepcopy(proof)
    bad.trace_root = bad.trace_root.copy()
    bad.trace_root[0] ^= 1
    assert not stark_verifier.verify(air, bad, cfg)


def test_reject_invalid_trace():
    air = FibonacciAir()
    trace, pvs = air.generate_trace(4)
    trace = trace.copy()
    trace[5, 1] = (int(trace[5, 1]) + 1) % 2013265921  # break the recurrence
    cfg = fast_test_config()
    proof = stark_prover.prove(air, trace, pvs, cfg)
    assert not stark_verifier.verify(air, proof, cfg)

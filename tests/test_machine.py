"""Multi-AIR machine proofs: mixed trace heights under one transcript."""

import copy

import pytest

from zkvm_prover_tpu.models.doubling import DoublingAir
from zkvm_prover_tpu.models.fibonacci import FibonacciAir
from zkvm_prover_tpu.stark import machine
from zkvm_prover_tpu.stark.config import fast_test_config


@pytest.fixture(scope="module")
def machine_proof():
    fib = FibonacciAir()
    dbl = DoublingAir()
    t1, pv1 = fib.generate_trace(4)
    t2, pv2 = dbl.generate_trace(3)
    instances = [
        machine.AirInstance(fib, t1, pv1),
        machine.AirInstance(dbl, t2, pv2),
    ]
    cfg = fast_test_config()
    proof = machine.prove_machine(instances, cfg)
    return [fib, dbl], proof, cfg


def test_machine_roundtrip(machine_proof):
    airs, proof, cfg = machine_proof
    assert machine.verify_machine(airs, proof, cfg)


def test_machine_same_height():
    fib = FibonacciAir()
    dbl = DoublingAir()
    t1, pv1 = fib.generate_trace(3)
    t2, pv2 = dbl.generate_trace(3)
    cfg = fast_test_config()
    proof = machine.prove_machine(
        [machine.AirInstance(fib, t1, pv1), machine.AirInstance(dbl, t2, pv2)],
        cfg,
    )
    assert machine.verify_machine([fib, dbl], proof, cfg)


def test_machine_reject_tampered_pv(machine_proof):
    airs, proof, cfg = machine_proof
    bad = copy.deepcopy(proof)
    log_n, w, pvs = bad.meta[1]
    pvs = list(pvs)
    pvs[1] = (pvs[1] + 1) % 2013265921
    bad.meta[1] = (log_n, w, pvs)
    assert not machine.verify_machine(airs, bad, cfg)


def test_machine_reject_tampered_opened(machine_proof):
    airs, proof, cfg = machine_proof
    bad = copy.deepcopy(proof)
    bad.opened[0].trace_zeta = bad.opened[0].trace_zeta.copy()
    bad.opened[0].trace_zeta[0, 0] ^= 1
    assert not machine.verify_machine(airs, bad, cfg)


def test_machine_reject_invalid_second_trace():
    fib = FibonacciAir()
    dbl = DoublingAir()
    t1, pv1 = fib.generate_trace(4)
    t2, pv2 = dbl.generate_trace(3)
    t2 = t2.copy()
    t2[4, 0] = (int(t2[4, 0]) + 5) % 2013265921
    cfg = fast_test_config()
    proof = machine.prove_machine(
        [machine.AirInstance(fib, t1, pv1), machine.AirInstance(dbl, t2, pv2)],
        cfg,
    )
    assert not machine.verify_machine([fib, dbl], proof, cfg)

"""logUp bus interactions: range-check lookup across two AIRs of different
heights; soundness checks (out-of-range value, wrong multiplicity)."""

import numpy as np
import pytest

from zkvm_prover_tpu.models.lookup import RangeCheckedAir, RangeTableAir
from zkvm_prover_tpu.stark import machine
from zkvm_prover_tpu.stark.config import fast_test_config

RNG = np.random.default_rng(9)


def build(valid=True, tamper_mult=False, log_table=3, log_user=4):
    table = RangeTableAir()
    user = RangeCheckedAir()
    n_table = 1 << log_table
    values = RNG.integers(0, n_table, size=1 << log_user)
    if not valid:
        values = values.copy()
        values[3] = n_table + 5  # not in table
    t_user = user.generate_trace(values % (1 << 31))
    t_table = table.generate_trace(
        log_table, values[values < n_table] if not valid else values
    )
    if tamper_mult:
        t_table = t_table.copy()
        t_table[0, 1] = (int(t_table[0, 1]) + 1) % 2013265921
    instances = [
        machine.AirInstance(table, t_table, []),
        machine.AirInstance(user, t_user, []),
    ]
    return [table, user], instances


def test_lookup_roundtrip():
    airs, instances = build(valid=True)
    cfg = fast_test_config()
    proof = machine.prove_machine(instances, cfg)
    assert proof.claimed_sums[0] is not None
    assert proof.claimed_sums[1] is not None
    assert machine.verify_machine(airs, proof, cfg)


def test_lookup_rejects_out_of_range_value():
    airs, instances = build(valid=False)
    cfg = fast_test_config()
    proof = machine.prove_machine(instances, cfg)
    assert not machine.verify_machine(airs, proof, cfg)


def test_lookup_rejects_tampered_multiplicity():
    airs, instances = build(valid=True, tamper_mult=True)
    cfg = fast_test_config()
    proof = machine.prove_machine(instances, cfg)
    assert not machine.verify_machine(airs, proof, cfg)


def test_no_interaction_airs_still_work():
    """Old-style AIRs without interactions coexist with the new transcript."""
    from zkvm_prover_tpu.models.fibonacci import FibonacciAir

    fib = FibonacciAir()
    t, pvs = fib.generate_trace(4)
    cfg = fast_test_config()
    proof = machine.prove_machine([machine.AirInstance(fib, t, pvs)], cfg)
    assert proof.claimed_sums == [None]
    assert machine.verify_machine([fib], proof, cfg)


def test_mixed_interaction_and_plain():
    from zkvm_prover_tpu.models.fibonacci import FibonacciAir

    airs, instances = build(valid=True)
    fib = FibonacciAir()
    t, pvs = fib.generate_trace(5)
    instances.append(machine.AirInstance(fib, t, pvs))
    cfg = fast_test_config()
    proof = machine.prove_machine(instances, cfg)
    assert machine.verify_machine(airs + [fib], proof, cfg)

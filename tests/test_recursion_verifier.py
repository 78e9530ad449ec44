"""Verifier-in-circuit: a wire program that verifies a child STARK machine
proof inside the proof system.

Replaces the host child-verification trust gap flagged in round 2
(host/aggregation.py TRUST MODEL): here, the wire circuit's constraints ARE
the verifier — transcript replay, OOD constraint check, logUp balance,
Merkle openings, FRI folds + PoW. Reference analog: in-guest verify_stark
(/root/reference/crates/types/circuit/src/lib.rs:138-154).
"""

import copy

import numpy as np
import pytest

from zkvm_prover_tpu.fields import babybear as bb
from zkvm_prover_tpu.models.fibonacci import FibonacciAir
from zkvm_prover_tpu.models.lookup import RangeCheckedAir, RangeTableAir
from zkvm_prover_tpu.recursion import CircuitBuilder
from zkvm_prover_tpu.recursion.stark_verifier import (
    DummyOracle,
    RealOracle,
    compute_pre_roots,
    shape_of,
    verify_in_circuit,
)
from zkvm_prover_tpu.stark import debug, machine
from zkvm_prover_tpu.stark.config import StarkConfig
from zkvm_prover_tpu.stark.fri import FriConfig

P = bb.P

# tiny FRI profile: keeps the verifier circuit small for CPU-mesh tests
TINY = StarkConfig(fri=FriConfig(log_blowup=1, num_queries=2,
                                 proof_of_work_bits=2))


def fib_child():
    air = FibonacciAir()
    trace, pvs = air.generate_trace(3)
    instances = [machine.AirInstance(air, trace, pvs)]
    proof = machine.prove_machine(instances, TINY)
    assert machine.verify_machine([air], proof, TINY)
    return [air], [3], proof


def lookup_child():
    """Mixed heights + interactions + (no) preprocessed columns."""
    table = RangeTableAir()
    checked = RangeCheckedAir()
    vals = [1, 5, 5, 200, 3, 3, 3, 7]
    t_checked = checked.generate_trace(vals)
    t_table = table.generate_trace(8, vals)
    instances = [
        machine.AirInstance(table, t_table, []),
        machine.AirInstance(checked, t_checked, []),
    ]
    proof = machine.prove_machine(instances, TINY)
    assert machine.verify_machine([table, checked], proof, TINY)
    return [table, checked], [8, 3], proof


def build_circuit(airs, log_ns, proof_or_none):
    shape = shape_of(airs, log_ns, TINY)
    pre_roots = compute_pre_roots(airs, shape)
    bld = CircuitBuilder()
    oracle = (
        RealOracle(proof_or_none) if proof_or_none is not None
        else DummyOracle()
    )
    verify_in_circuit(bld, airs, shape, oracle, pre_mode="constant",
                      pre_roots=pre_roots)
    return bld


def check_satisfied(bld) -> bool:
    instances = bld.finalize()
    pairs = [(i.air, i.trace) for i in instances]
    pvs_map = {k: inst.public_values for k, inst in enumerate(instances)}
    for inst in instances:
        errs = debug.check_constraints(inst.air, inst.trace,
                                       inst.public_values)
        if errs:
            return False
    return debug.check_bus_balance(pairs, pvs_map) == {}


@pytest.fixture(scope="module")
def fib_setup():
    return fib_child()


def test_fib_proof_satisfies_circuit(fib_setup):
    airs, log_ns, proof = fib_setup
    bld = build_circuit(airs, log_ns, proof)
    assert check_satisfied(bld)


def test_program_is_shape_only(fib_setup):
    """DummyOracle (no proof) and RealOracle produce the same program —
    the program is vk material independent of the witness."""
    airs, log_ns, proof = fib_setup
    real = build_circuit(airs, log_ns, proof).finalize()
    dummy = build_circuit(airs, log_ns, None).finalize()
    for r, d in zip(real[:2], dummy[:2]):
        assert np.array_equal(r.air.program, d.air.program)


@pytest.mark.parametrize("tamper", [
    "trace_root", "opened", "pow", "pv", "fri_final", "claimed"])
def test_tampered_child_fails(fib_setup, tamper):
    airs, log_ns, proof = fib_setup
    bad = copy.deepcopy(proof)
    if tamper == "trace_root":
        lm = max(bad.trace_roots)
        r = np.asarray(bad.trace_roots[lm]).copy()
        r[0] ^= 1
        bad.trace_roots[lm] = r
    elif tamper == "opened":
        ov = bad.opened[0].trace_zeta.copy()
        ov[0, 0] ^= 1
        bad.opened[0].trace_zeta = ov
    elif tamper == "pow":
        bad.fri_proof.pow_witness ^= 1
    elif tamper == "pv":
        ln, w, pvs = bad.meta[0]
        pvs = list(pvs)
        pvs[2] = (pvs[2] + 1) % P
        bad.meta[0] = (ln, w, pvs)
    elif tamper == "fri_final":
        fp = np.asarray(bad.fri_proof.final_poly).copy()
        fp.reshape(-1)[0] ^= 1
        bad.fri_proof.final_poly = fp
    elif tamper == "claimed":
        # fibonacci has no interactions; tamper a quotient root instead
        lm = max(bad.quotient_roots)
        r = np.asarray(bad.quotient_roots[lm]).copy()
        r[3] ^= 2
        bad.quotient_roots[lm] = r
    assert not machine.verify_machine(airs, bad, TINY)
    bld = build_circuit(airs, log_ns, bad)
    assert not check_satisfied(bld)


def test_lookup_child_mixed_heights():
    airs, log_ns, proof = lookup_child()
    bld = build_circuit(airs, log_ns, proof)
    assert check_satisfied(bld)

    # tamper the claimed logUp sum: in-circuit balance must fail
    bad = copy.deepcopy(proof)
    cs = np.asarray(bad.claimed_sums[0]).copy()
    cs[0] ^= 1
    bad.claimed_sums[0] = cs
    bld2 = build_circuit(airs, log_ns, bad)
    assert not check_satisfied(bld2)


def test_recursion_proof_end_to_end(fib_setup):
    """Prove the wire circuit itself and verify the recursion proof."""
    from zkvm_prover_tpu.stark.config import fast_test_config

    airs, log_ns, proof = fib_setup
    bld = build_circuit(airs, log_ns, proof)
    instances = bld.finalize()
    cfg = fast_test_config()
    rec_proof = machine.prove_machine(instances, cfg)
    rec_airs = [i.air for i in instances]
    assert machine.verify_machine(rec_airs, rec_proof, cfg)

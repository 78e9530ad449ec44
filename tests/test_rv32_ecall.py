"""ECALL system chip: halt / hint / reveal, and the PublicValuesAir binding
of revealed words to the machine proof's public values.

Reference behavior mirrored: openvm reveal_bytes32 -> user public values
(/root/reference/crates/types/circuit/src/lib.rs:14-17), the all-zero PV
precheck (crates/prover/src/utils/vm.rs:20-25), and termination-with-
exit-code-0 semantics.
"""

import numpy as np
import pytest

from zkvm_prover_tpu.models import rv32_v2
from zkvm_prover_tpu.stark import debug, machine
from zkvm_prover_tpu.stark.config import fast_test_config
from zkvm_prover_tpu.vm import asm
from zkvm_prover_tpu.vm.executor import HALTED, PAUSED, Rv32Executor

R = asm.REGS


def reveal_program():
    """Reads one hint word, derives 8 words, reveals them all, halts."""
    body = [
        *asm.hint_read("s0"),               # s0 = hint word
        asm.addi("s1", "zero", 0),          # i = 0
    ]
    # words[i] = s0 + 3*i, revealed at index i (fully unrolled)
    for i in range(rv32_v2.N_PV_WORDS):
        body += [
            asm.addi("t0", "s0", 3 * i),
            *asm.reveal("t0", i),
        ]
    body.append(asm.halt(0))
    return asm.assemble(body)


@pytest.fixture(scope="module")
def ecall_proof():
    prog = reveal_program()
    ex = Rv32Executor()
    ex.load_program(prog)
    ex.set_hints((0xDEAD0001).to_bytes(4, "little"))
    state = ex.run(1 << 12)
    assert state == HALTED
    records = ex.records()
    air_traces = rv32_v2.generate_traces(prog, records, data_base=0x3000)
    airs = [a for a, _, _ in air_traces]
    instances = [machine.AirInstance(a, t, pvs) for a, t, pvs in air_traces]
    cfg = fast_test_config()
    proof = machine.prove_machine(instances, cfg)
    return ex, airs, instances, proof, cfg


def test_executor_pvs(ecall_proof):
    ex, *_ = ecall_proof
    assert ex.public_values() == [
        (0xDEAD0001 + 3 * i) & 0xFFFFFFFF
        for i in range(rv32_v2.N_PV_WORDS)
    ]


def test_constraints_and_balance(ecall_proof):
    _, _, instances, _, _ = ecall_proof
    pairs = [(i.air, i.trace) for i in instances]
    pvs_map = {i: inst.public_values for i, inst in enumerate(instances)}
    for inst in instances:
        assert debug.check_constraints(inst.air, inst.trace,
                                       inst.public_values) == []
    assert debug.check_bus_balance(pairs, pvs_map) == {}


def test_proof_carries_pvs_and_verifies(ecall_proof):
    ex, airs, instances, proof, cfg = ecall_proof
    assert machine.verify_machine(airs, proof, cfg)
    # the proof's PublicValuesAir meta carries the revealed words as limbs
    pv_idx = next(i for i, a in enumerate(airs)
                  if isinstance(a, rv32_v2.PublicValuesAir))
    _, _, pvs = proof.meta[pv_idx]
    words = [sum(pvs[4 * i + k] << (8 * k) for k in range(4))
             for i in range(rv32_v2.N_PV_WORDS)]
    assert words == ex.public_values()
    # per-word reveal flags all set
    assert pvs[4 * rv32_v2.N_PV_WORDS:] == [1] * rv32_v2.N_PV_WORDS
    # the exec boundary meta claims halted
    eb_idx = next(i for i, a in enumerate(airs)
                  if isinstance(a, rv32_v2.ExecBoundaryAirV2))
    assert proof.meta[eb_idx][2] == [1]


def test_reject_tampered_pv(ecall_proof):
    """Changing a claimed public value must break verification."""
    import copy

    _, airs, _, proof, cfg = ecall_proof
    pv_idx = next(i for i, a in enumerate(airs)
                  if isinstance(a, rv32_v2.PublicValuesAir))
    bad = copy.deepcopy(proof)
    log_n, w, pvs = bad.meta[pv_idx]
    pvs = list(pvs)
    pvs[0] = (pvs[0] + 1) % 256
    bad.meta[pv_idx] = (log_n, w, pvs)
    assert not machine.verify_machine(airs, bad, cfg)


def test_reject_claim_halted_when_paused():
    """A paused segment claiming halted=1 violates the boundary constraint;
    an honest paused claim (halted=0) passes the debug checks."""
    prog = asm.assemble([
        asm.addi("t0", "zero", 0),
        ("label", "loop"),
        asm.addi("t0", "t0", 1),
        ("branch", asm.bne, "t0", "zero", "loop"),
        asm.halt(0),
    ])
    ex = Rv32Executor()
    ex.load_program(prog)
    state = ex.run(64)
    assert state == PAUSED
    air_traces = rv32_v2.generate_traces(prog, ex.records(),
                                         data_base=0x3000)
    eb = next((a, t, pvs) for a, t, pvs in air_traces
              if isinstance(a, rv32_v2.ExecBoundaryAirV2))
    air, tr, pvs = eb
    assert pvs == [0]
    assert debug.check_constraints(air, tr, pvs) == []
    assert debug.check_constraints(air, tr, [1]) != []
    # honest paused machine balances end-to-end
    pairs = [(a, t) for a, t, _ in air_traces]
    pvs_map = {i: p for i, (_, _, p) in enumerate(air_traces)}
    assert debug.check_bus_balance(pairs, pvs_map) == {}


def test_reject_skipping_halt():
    """Dropping the halt row (trying to end the chain early) unbalances the
    exec bus."""
    prog = asm.assemble([
        asm.addi("t0", "zero", 7),
        *asm.reveal("t0", 0),
        asm.halt(0),
    ])
    ex = Rv32Executor()
    ex.load_program(prog)
    assert ex.run(1 << 10) == HALTED
    air_traces = rv32_v2.generate_traces(prog, ex.records(),
                                         data_base=0x3000)
    # tamper: zero out the halt row on the system chip
    sys_i = next(i for i, (a, _, _) in enumerate(air_traces)
                 if isinstance(a, rv32_v2.SystemAir))
    air, tr, pvs = air_traces[sys_i]
    tr = tr.copy()
    halt_rows = np.nonzero(tr[:, rv32_v2.SystemAir.F_HALT])[0]
    assert halt_rows.size == 1
    tr[halt_rows[0]] = 0
    pairs = [(a, t if i != sys_i else tr)
             for i, (a, t, _) in enumerate(air_traces)]
    pvs_map = {i: p for i, (_, _, p) in enumerate(air_traces)}
    assert debug.check_bus_balance(pairs, pvs_map) != {}

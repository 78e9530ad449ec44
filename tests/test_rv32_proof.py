"""End-to-end: native RV32 execution proven by the multi-AIR machine —
CPU chip + program ROM + register memory argument + byte range table,
all glued by logUp buses."""

import numpy as np
import pytest

from zkvm_prover_tpu.models import rv32_v0
from zkvm_prover_tpu.stark import machine
from zkvm_prover_tpu.stark.config import fast_test_config
from zkvm_prover_tpu.vm import asm
from zkvm_prover_tpu.vm.executor import HALTED


def straightline_program():
    # computes ((5 + 7) - 3) + 100 into t3 via chained arithmetic
    return asm.assemble(
        [
            asm.addi("t0", "zero", 5),
            asm.addi("t1", "zero", 7),
            asm.add("t2", "t0", "t1"),
            asm.addi("t3", "t2", -3),
            asm.addi("t4", "t3", 100),
            asm.add("t5", "t4", "t4"),
            asm.sub("t6", "t5", "t0"),
            asm.halt(0),
        ]
    )


@pytest.fixture(scope="module")
def proven_execution():
    prog = straightline_program()
    ex, state, air_traces = rv32_v0.execute_and_trace(prog)
    assert state == HALTED
    airs = [a for a, _ in air_traces]
    instances = [machine.AirInstance(a, t, []) for a, t in air_traces]
    cfg = fast_test_config()
    proof = machine.prove_machine(instances, cfg)
    return ex, airs, proof, cfg, prog


def test_execution_matches_semantics(proven_execution):
    ex, *_ = proven_execution
    assert ex.get_reg(asm.REGS["t6"]) == ((5 + 7 - 3 + 100) * 2 - 5)


def test_rv32_proof_verifies(proven_execution):
    _, airs, proof, cfg, _ = proven_execution
    assert machine.verify_machine(airs, proof, cfg)


def test_rv32_reject_tampered_register_value():
    """Forge a trace claiming a wrong ADD result — memory argument +
    constraints must catch it."""
    prog = straightline_program()
    ex, state, air_traces = rv32_v0.execute_and_trace(prog)
    cpu_air, cpu = air_traces[0]
    cpu = cpu.copy()
    C = rv32_v0.CpuAirV0
    # row 2 is the add t2,t0,t1: bump the result limb and its carry story
    cpu[2, C.RD_VAL] = (int(cpu[2, C.RD_VAL]) + 1) % 256
    air_traces = [(cpu_air, cpu)] + air_traces[1:]
    airs = [a for a, _ in air_traces]
    instances = [machine.AirInstance(a, t, []) for a, t in air_traces]
    cfg = fast_test_config()
    proof = machine.prove_machine(instances, cfg)
    assert not machine.verify_machine(airs, proof, cfg)


def test_rv32_reject_wrong_program():
    """The program ROM is preprocessed (verification-key material): a proof
    generated for program A must not verify against a verifier expecting
    program B."""
    prog = straightline_program()
    ex, state, air_traces = rv32_v0.execute_and_trace(prog)
    airs = [a for a, _ in air_traces]
    instances = [machine.AirInstance(a, t, []) for a, t in air_traces]
    cfg = fast_test_config()
    proof = machine.prove_machine(instances, cfg)

    other_prog = asm.assemble(
        [
            asm.addi("t0", "zero", 6),  # first addi loads 6 instead of 5
            asm.addi("t1", "zero", 7),
            asm.add("t2", "t0", "t1"),
            asm.addi("t3", "t2", -3),
            asm.addi("t4", "t3", 100),
            asm.add("t5", "t4", "t4"),
            asm.sub("t6", "t5", "t0"),
            asm.halt(0),
        ]
    )
    airs_b = list(airs)
    airs_b[1] = rv32_v0.ProgramAir(other_prog)
    assert not machine.verify_machine(airs_b, proof, cfg)
    # sanity: the honest airs still accept
    assert machine.verify_machine(airs, proof, cfg)


def test_wraparound_arithmetic_proof():
    """u32 overflow semantics (carry chains) survive the proof."""
    prog = asm.assemble(
        [
            asm.addi("t0", "zero", -1),      # 0xffffffff
            asm.addi("t1", "t0", 1),         # wraps to 0
            asm.add("t2", "t0", "t0"),       # 0xfffffffe
            asm.sub("t3", "t1", "t0"),       # 0 - (-1) = 1
            asm.halt(0),
        ]
    )
    ex, state, air_traces = rv32_v0.execute_and_trace(prog)
    assert ex.get_reg(asm.REGS["t1"]) == 0
    assert ex.get_reg(asm.REGS["t2"]) == 0xFFFFFFFE
    assert ex.get_reg(asm.REGS["t3"]) == 1
    airs = [a for a, _ in air_traces]
    instances = [machine.AirInstance(a, t, []) for a, t in air_traces]
    cfg = fast_test_config()
    proof = machine.prove_machine(instances, cfg)
    assert machine.verify_machine(airs, proof, cfg)


def test_production_config_prove_verify():
    """Full machine proof at the PRODUCTION security profile (100 FRI
    queries, 16 PoW bits — openvm.toml parity): prove + verify + one
    tamper rejection. Heavy tier (~1 min); the bench exercises the same
    path on every round."""
    import os

    import pytest

    if not os.environ.get("RUN_HEAVY"):
        pytest.skip("production-config e2e is the heavy tier")
    from zkvm_prover_tpu.models import rv32_v2
    from zkvm_prover_tpu.stark import machine
    from zkvm_prover_tpu.stark.config import default_config
    from zkvm_prover_tpu.vm import asm
    from zkvm_prover_tpu.vm.executor import HALTED, Rv32Executor

    body = [
        *asm.li("s0", 0), *asm.li("s1", 50), *asm.li("s2", 7),
        ("label", "loop"),
        asm.mul("s2", "s2", "s2"),
        asm.srli("s2", "s2", 3),
        asm.addi("s2", "s2", 1),
        asm.addi("s0", "s0", 1),
        ("branch", asm.bne, "s0", "s1", "loop"),
        *asm.reveal("s2", 0), *asm.reveal("s0", 1),
    ]
    for i in range(2, 8):
        body += asm.reveal("s1", i)
    body.append(asm.halt(0))
    prog = asm.assemble(body)
    ex = Rv32Executor()
    ex.load_program(prog)
    assert ex.run(1 << 14) == HALTED
    tr = rv32_v2.generate_traces(prog, ex.records(), data_base=0x3000)
    inst = [machine.AirInstance(a, t, p) for a, t, p in tr]
    cfg = default_config()
    assert cfg.fri.num_queries >= 100 and cfg.fri.proof_of_work_bits >= 16
    proof = machine.prove_machine(inst, cfg)
    assert machine.verify_machine([a for a, _, _ in tr], proof, cfg)
    # tamper: corrupt a FRI query opening
    import copy

    bad = copy.deepcopy(proof)
    bad.meta = list(bad.meta)
    (_, w, pvs) = bad.meta[0]
    bad.meta[0] = (bad.meta[0][0] + 1, w, pvs)  # lie about a height
    assert not machine.verify_machine([a for a, _, _ in tr], bad, cfg)

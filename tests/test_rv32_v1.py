"""RV32 v1 chipset: control flow (branches, jumps, loops) proven via the
execution bus. The Fibonacci loop here is the first *looping* RISC-V program
proven end-to-end by the framework."""

import numpy as np
import pytest

from zkvm_prover_tpu.models import rv32_v1
from zkvm_prover_tpu.stark import machine
from zkvm_prover_tpu.stark.config import fast_test_config
from zkvm_prover_tpu.vm import asm
from zkvm_prover_tpu.vm.executor import HALTED


def fib_loop_program(n_iter=8):
    return asm.assemble(
        [
            asm.addi("s0", "zero", 0),
            asm.addi("s1", "zero", 1),
            asm.addi("t0", "zero", n_iter),
            ("label", "loop"),
            asm.add("t1", "s0", "s1"),
            asm.add("s0", "s1", "zero"),
            asm.add("s1", "t1", "zero"),
            asm.addi("t0", "t0", -1),
            ("branch", asm.bne, "t0", "zero", "loop"),
            asm.halt(0),
        ]
    )


@pytest.fixture(scope="module")
def fib_proof():
    prog = fib_loop_program(8)
    ex, state, air_traces = rv32_v1.execute_and_trace(prog)
    assert state == HALTED
    airs = [a for a, _ in air_traces]
    instances = [machine.AirInstance(a, t, []) for a, t in air_traces]
    cfg = fast_test_config()
    proof = machine.prove_machine(instances, cfg)
    return ex, airs, instances, proof, cfg


def test_loop_executes_correctly(fib_proof):
    ex, *_ = fib_proof
    assert ex.get_reg(asm.REGS["s0"]) == 21  # fib(8)


def test_loop_proof_verifies(fib_proof):
    _, airs, _, proof, cfg = fib_proof
    assert machine.verify_machine(airs, proof, cfg)


def test_loop_multiplicities_counted(fib_proof):
    _, airs, instances, proof, cfg = fib_proof
    # the loop body instructions executed 8 times each
    prog_trace = instances[1].trace
    mults = prog_trace[:, rv32_v1.ProgramAirV1.MULT]
    assert mults.max() == 8


def test_branch_both_directions():
    """taken and not-taken branches in one program."""
    prog = asm.assemble(
        [
            asm.addi("t0", "zero", 1),
            asm.addi("t1", "zero", 1),
            ("branch", asm.beq, "t0", "t1", "eq_path"),   # taken
            asm.addi("t2", "zero", 99),                   # skipped
            ("label", "eq_path"),
            ("branch", asm.bne, "t0", "t1", "never"),     # not taken
            asm.addi("t3", "zero", 7),
            ("label", "never"),
            asm.halt(0),
        ]
    )
    ex, state, air_traces = rv32_v1.execute_and_trace(prog)
    assert ex.get_reg(asm.REGS["t2"]) == 0
    assert ex.get_reg(asm.REGS["t3"]) == 7
    airs = [a for a, _ in air_traces]
    instances = [machine.AirInstance(a, t, []) for a, t in air_traces]
    cfg = fast_test_config()
    proof = machine.prove_machine(instances, cfg)
    assert machine.verify_machine(airs, proof, cfg)


def test_jal_and_lui():
    prog = asm.assemble(
        [
            asm.lui("t0", 0x12345),
            ("jal", "ra", "after"),
            asm.addi("t1", "zero", 111),   # skipped by the jump
            ("label", "after"),
            asm.addi("t2", "zero", 5),
            asm.halt(0),
        ]
    )
    ex, state, air_traces = rv32_v1.execute_and_trace(prog)
    assert ex.get_reg(asm.REGS["t0"]) == 0x12345000
    assert ex.get_reg(asm.REGS["t1"]) == 0
    assert ex.get_reg(asm.REGS["ra"]) == 8  # pc of jal (4) + 4
    airs = [a for a, _ in air_traces]
    instances = [machine.AirInstance(a, t, []) for a, t in air_traces]
    cfg = fast_test_config()
    proof = machine.prove_machine(instances, cfg)
    assert machine.verify_machine(airs, proof, cfg)


def test_reject_forged_branch_direction(fib_proof):
    """Flip a branch's taken flag (and its consequences) — the execution
    bus must refuse the broken chain."""
    _, airs, instances, _, cfg = fib_proof
    C = rv32_v1.CpuAirV1
    cpu = instances[0].trace.copy()
    # find the first bne row and pretend it fell through
    bne_rows = np.nonzero(cpu[:, C.FLAGS + rv32_v1.K_BNE])[0]
    r = int(bne_rows[0])
    cpu[r, C.IS_TAKEN] = 0
    cpu[r, C.NEXT_PC] = int(cpu[r, C.PC]) + 4
    forged = [machine.AirInstance(instances[0].air, cpu, [])] + instances[1:]
    proof = machine.prove_machine(forged, cfg)
    assert not machine.verify_machine(airs, proof, cfg)

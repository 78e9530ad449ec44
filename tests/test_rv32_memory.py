"""RV32 v1 RAM: LW/SW through the memory bus with a touched-address
boundary — proven store/load roundtrips and array summation."""

import numpy as np
import pytest

from zkvm_prover_tpu.models import rv32_v1
from zkvm_prover_tpu.stark import machine
from zkvm_prover_tpu.stark.config import fast_test_config
from zkvm_prover_tpu.vm import asm
from zkvm_prover_tpu.vm.executor import HALTED

DATA = 0x1000


def prove_and_verify(prog):
    ex, state, air_traces = rv32_v1.execute_and_trace(prog)
    assert state == HALTED
    airs = [a for a, _ in air_traces]
    instances = [machine.AirInstance(a, t, []) for a, t in air_traces]
    cfg = fast_test_config()
    proof = machine.prove_machine(instances, cfg)
    return ex, airs, instances, proof, cfg


def test_store_load_roundtrip():
    prog = asm.assemble(
        [
            asm.lui("s2", DATA >> 12),          # s2 = 0x1000
            asm.addi("t0", "zero", 1234),
            asm.sw("t0", "s2", 0),
            asm.addi("t1", "zero", 777),
            asm.sw("t1", "s2", 4),
            asm.lw("t2", "s2", 0),
            asm.lw("t3", "s2", 4),
            asm.add("t4", "t2", "t3"),
            asm.halt(0),
        ]
    )
    ex, airs, _, proof, cfg = prove_and_verify(prog)
    assert ex.get_reg(asm.REGS["t4"]) == 1234 + 777
    assert machine.verify_machine(airs, proof, cfg)


def test_array_sum_loop():
    """store 1..5 into an array, then loop-load and sum — exercises RAM +
    branches together."""
    prog = asm.assemble(
        [
            asm.lui("s2", DATA >> 12),
            asm.addi("t0", "zero", 1),          # value
            asm.addi("t1", "zero", 0),          # offset reg (bytes)
            ("label", "fill"),
            asm.add("t6", "s2", "t1"),
            asm.sw("t0", "t6", 0),
            asm.addi("t0", "t0", 1),
            asm.addi("t1", "t1", 4),
            asm.addi("t2", "zero", 20),
            ("branch", asm.bne, "t1", "t2", "fill"),
            # sum phase
            asm.addi("s0", "zero", 0),          # acc
            asm.addi("t1", "zero", 0),
            ("label", "sum"),
            asm.add("t6", "s2", "t1"),
            asm.lw("t3", "t6", 0),
            asm.add("s0", "s0", "t3"),
            asm.addi("t1", "t1", 4),
            ("branch", asm.bne, "t1", "t2", "sum"),
            asm.halt(0),
        ]
    )
    ex, airs, _, proof, cfg = prove_and_verify(prog)
    assert ex.get_reg(asm.REGS["s0"]) == 1 + 2 + 3 + 4 + 5
    assert machine.verify_machine(airs, proof, cfg)


def test_reject_forged_load_value():
    """Claim a LW read a different value — the RAM chain must catch it."""
    prog = asm.assemble(
        [
            asm.lui("s2", DATA >> 12),
            asm.addi("t0", "zero", 42),
            asm.sw("t0", "s2", 0),
            asm.lw("t1", "s2", 0),
            asm.halt(0),
        ]
    )
    ex, state, air_traces = rv32_v1.execute_and_trace(prog)
    C = rv32_v1.CpuAirV1
    cpu = air_traces[0][1].copy()
    lw_rows = np.nonzero(cpu[:, C.FLAGS + rv32_v1.K_LW])[0]
    r = int(lw_rows[0])
    cpu[r, C.RD_VAL] = 43  # forged loaded byte
    air_traces = [(air_traces[0][0], cpu)] + air_traces[1:]
    airs = [a for a, _ in air_traces]
    instances = [machine.AirInstance(a, t, []) for a, t in air_traces]
    cfg = fast_test_config()
    proof = machine.prove_machine(instances, cfg)
    assert not machine.verify_machine(airs, proof, cfg)

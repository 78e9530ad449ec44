"""RV32 v2 chipset: the full RV32IM instruction set proven end-to-end via
the multi-chip machine (ALU/Shift/Branch/Jump/LoadStore/Mul/DivRem glued by
logUp buses). Mirrors the reference's execute+prove chunk tests
(/root/reference/crates/integration/tests/chunk_circuit.rs) at the
instruction-set level."""

import numpy as np
import pytest

from zkvm_prover_tpu.models import rv32_v2
from zkvm_prover_tpu.stark import debug, machine
from zkvm_prover_tpu.stark.config import fast_test_config
from zkvm_prover_tpu.vm import asm
from zkvm_prover_tpu.vm.executor import HALTED

R = asm.REGS


def full_coverage_program():
    """Exercises every RV32IM instruction kind plus the RISC-V edge cases
    (div-by-zero, INT_MIN/-1, sub-word memory at all offsets)."""
    return asm.assemble([
        asm.addi("t0", "zero", 100),
        asm.addi("t1", "zero", -7),
        asm.add("t2", "t0", "t1"),
        asm.sub("t3", "t0", "t1"),
        asm.and_("s2", "t0", "t1"),
        asm.or_("s3", "t0", "t1"),
        asm.xor("s4", "t0", "t1"),
        asm.andi("s5", "t1", 0x5A),
        asm.ori("s6", "t1", 0x21),
        asm.xori("s7", "t0", -1),
        asm.slt("s8", "t1", "t0"),
        asm.sltu("s9", "t1", "t0"),
        asm.slti("s10", "t0", -5),
        asm.sltiu("s11", "t0", 200),
        asm.addi("a2", "zero", 3),
        asm.sll("a3", "t0", "a2"),
        asm.slli("a4", "t1", 4),
        asm.srl("a5", "t1", "a2"),
        asm.srli("a6", "t1", 8),
        asm.sra("s0", "t1", "a2"),
        asm.srai("s1", "t1", 1),
        asm.srai("gp", "t0", 31),
        asm.mul("a7", "t0", "t1"),
        asm.mulh("t4", "t0", "t1"),
        asm.mulhu("t5", "t0", "t1"),
        asm.mulhsu("t6", "t1", "t0"),
        asm.div("tp", "t1", "a2"),
        asm.rem("ra", "t1", "a2"),
        asm.add("a6", "ra", "zero"),  # the jal below clobbers ra (link reg)
        asm.divu("sp", "t0", "a2"),
        asm.remu("a0", "t0", "a2"),
        asm.div("a1", "t0", "zero"),
        asm.rem("t2", "t0", "zero"),
        asm.lui("t3", 0x80000),
        asm.addi("s2", "zero", -1),
        asm.div("s3", "t3", "s2"),
        asm.rem("s4", "t3", "s2"),
        asm.lui("s5", 0x3),
        asm.sw("t0", "s5", 0),
        asm.lw("s6", "s5", 0),
        asm.sb("t1", "s5", 5),
        asm.lb("s7", "s5", 5),
        asm.lbu("s8", "s5", 5),
        asm.sh("t1", "s5", 6),
        asm.lh("s9", "s5", 6),
        asm.lhu("s10", "s5", 6),
        asm.lw("s11", "s5", 4),
        asm.auipc("a2", 1),
        ("jal", "ra", "next"),
        asm.addi("a3", "zero", 99),
        ("label", "next"),
        asm.addi("a4", "zero", 1),
        ("branch", asm.blt, "t1", "a4", "ok1"),
        asm.addi("a5", "zero", 98),
        ("label", "ok1"),
        ("branch", asm.bgeu, "t1", "a4", "ok2"),
        asm.addi("a5", "zero", 97),
        ("label", "ok2"),
        ("branch", asm.bge, "a4", "t1", "ok3"),
        asm.addi("a5", "zero", 96),
        ("label", "ok3"),
        ("branch", asm.bltu, "a4", "t1", "ok4"),
        asm.addi("a5", "zero", 95),
        ("label", "ok4"),
        # halt(0) clobbers a0 (exit code) and a7 (syscall id): preserve the
        # MUL-low / REMU results first
        asm.add("t5", "a7", "zero"),
        asm.add("t6", "a0", "zero"),
        asm.halt(0),
    ])


@pytest.fixture(scope="module")
def v2_proof():
    prog = full_coverage_program()
    ex, state, air_traces = rv32_v2.execute_and_trace(prog, data_base=0x3000)
    assert state == HALTED
    airs = [a for a, _, _ in air_traces]
    instances = [machine.AirInstance(a, t, pvs) for a, t, pvs in air_traces]
    cfg = fast_test_config()
    proof = machine.prove_machine(instances, cfg)
    return ex, airs, instances, proof, cfg


def test_executor_semantics(v2_proof):
    ex, *_ = v2_proof
    g = lambda r: ex.get_reg(R[r])
    assert g("t2") == 100                       # rem 100, 0 -> 100
    assert g("t3") == 0x80000000                # lui
    assert g("s8") == 0xF9                      # lbu zero-extends 0xF9
    assert g("a3") == 800                       # 100 << 3
    assert g("s0") == 0xFFFFFFFF                # -7 >> 3 arithmetic = -1
    assert g("gp") == 0                         # 100 >>a 31
    assert g("t5") == (100 * (2**32 - 7)) % (1 << 32)  # mul low (saved)
    assert g("a7") == 0                         # clobbered by halt(0)
    assert g("t4") == ((100 * -7) >> 32) % (1 << 32)   # mulh
    assert g("tp") == (-2) % (1 << 32)          # -7 / 3
    assert g("a6") == (-1) % (1 << 32)          # -7 % 3 (saved before jal)
    assert g("sp") == 33 and g("t6") == 1       # divu / remu (saved)
    assert g("a0") == 0                         # clobbered by halt(0)
    assert g("a1") == 0xFFFFFFFF                # div by zero
    assert g("s3") == 0x80000000                # INT_MIN / -1
    assert g("s4") == 0                         # INT_MIN % -1
    assert g("s6") == 100                       # lw round-trip
    assert g("s7") == (-7) % (1 << 32)          # lb sign-extends 0xF9
    assert g("s8") == 0xF9                      # lbu
    assert g("s9") == 0xFFFFFFF9                # lh sign-extends
    assert g("s10") == 0xFFF9                   # lhu
    # a5 keeps the srl result (0xFFFFFFF9 >> 3): every branch took its
    # edge, so none of the fall-through writes (95..98) happened
    assert g("a5") == 0x1FFFFFFF


def test_bus_balance_and_constraints(v2_proof):
    _, _, instances, _, _ = v2_proof
    pairs = [(i.air, i.trace) for i in instances]
    pvs_map = {i: inst.public_values for i, inst in enumerate(instances)}
    for inst in instances:
        assert debug.check_constraints(inst.air, inst.trace,
                                       inst.public_values) == []
    assert debug.check_bus_balance(pairs, pvs_map) == {}


def test_proof_verifies(v2_proof):
    _, airs, _, proof, cfg = v2_proof
    assert machine.verify_machine(airs, proof, cfg)


def test_reject_forged_div_result(v2_proof):
    """Tamper with a DIV quotient — the magnitude identity must refuse."""
    _, airs, instances, _, cfg = v2_proof
    C = rv32_v2.DivRemAir
    idx = next(i for i, inst in enumerate(instances)
               if isinstance(inst.air, rv32_v2.DivRemAir))
    tr = instances[idx].trace.copy()
    r = int(np.nonzero(tr[:, rv32_v2.IS_REAL])[0][0])
    tr[r, rv32_v2.RD_VAL] = (int(tr[r, rv32_v2.RD_VAL]) + 1) % 256
    tr[r, C.Q] = (int(tr[r, C.Q]) + 1) % 256
    pairs = [(inst.air, inst.trace if i != idx else tr)
             for i, inst in enumerate(instances)]
    pvs_map = {i: inst.public_values for i, inst in enumerate(instances)}
    assert (debug.check_constraints(airs[idx], tr)
            or debug.check_bus_balance(pairs, pvs_map))


def test_reject_forged_load(v2_proof):
    """Load a different value than was stored — MEM_BUS must unbalance."""
    _, airs, instances, _, cfg = v2_proof
    C = rv32_v2.LoadStoreAir
    idx = next(i for i, inst in enumerate(instances)
               if isinstance(inst.air, rv32_v2.LoadStoreAir))
    tr = instances[idx].trace.copy()
    lw_flag = rv32_v2.FLAGS + rv32_v2.LS_KINDS.index(rv32_v2.K_LW)
    r = int(np.nonzero(tr[:, lw_flag])[0][0])
    tr[r, C.W_OLD] = (int(tr[r, C.W_OLD]) + 1) % 256
    tr[r, C.W_NEW] = (int(tr[r, C.W_NEW]) + 1) % 256
    tr[r, rv32_v2.RD_VAL] = (int(tr[r, rv32_v2.RD_VAL]) + 1) % 256
    pairs = [(inst.air, inst.trace if i != idx else tr)
             for i, inst in enumerate(instances)]
    pvs_map = {i: inst.public_values for i, inst in enumerate(instances)}
    assert debug.check_bus_balance(pairs, pvs_map) != {}


def test_fibonacci_loop_with_memory():
    """A loop writing results through RAM: proves the integrated machine."""
    prog = asm.assemble([
        asm.lui("s5", 0x3),                # base 0x3000
        asm.addi("s0", "zero", 0),
        asm.addi("s1", "zero", 1),
        asm.addi("t0", "zero", 10),
        ("label", "loop"),
        asm.add("t1", "s0", "s1"),
        asm.add("s0", "s1", "zero"),
        asm.add("s1", "t1", "zero"),
        asm.sw("s1", "s5", 0),
        asm.addi("t0", "t0", -1),
        ("branch", asm.bne, "t0", "zero", "loop"),
        asm.lw("s2", "s5", 0),
        asm.halt(0),
    ])
    ex, state, air_traces = rv32_v2.execute_and_trace(prog, data_base=0x3000)
    assert state == HALTED
    assert ex.get_reg(R["s2"]) == 89       # fib(11)
    airs = [a for a, _, _ in air_traces]
    instances = [machine.AirInstance(a, t, pvs) for a, t, pvs in air_traces]
    cfg = fast_test_config()
    proof = machine.prove_machine(instances, cfg)
    assert machine.verify_machine(airs, proof, cfg)

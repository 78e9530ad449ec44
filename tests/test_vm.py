"""Native RV32IM executor: arithmetic, branches, memory, M-extension,
syscalls (halt/reveal/hint), records, segmentation (continuations)."""

import numpy as np
import pytest

from zkvm_prover_tpu.vm import asm
from zkvm_prover_tpu.vm.executor import (
    HALTED,
    PAUSED,
    TRAPPED,
    Rv32Executor,
)


def run_program(items, hints=b"", max_cycles=1 << 20):
    ex = Rv32Executor()
    words = asm.assemble(items)
    ex.load_program(words)
    if hints:
        ex.set_hints(hints)
    state = ex.run(max_cycles)
    return ex, state


def test_arith_and_halt():
    ex, state = run_program(
        [
            asm.li("t0", 21),
            asm.li("t1", 2),
            asm.mul("t2", "t0", "t1"),
            asm.halt("t2"),
        ]
    )
    assert state == HALTED
    assert ex.exit_code == 42


def test_fibonacci_loop():
    # compute fib(20) iteratively
    prog = [
        asm.li("s0", 0),        # a
        asm.li("s1", 1),        # b
        asm.li("t0", 20),       # counter
        ("label", "loop"),
        asm.add("t1", "s0", "s1"),
        asm.add("s0", "s1", "zero"),
        asm.add("s1", "t1", "zero"),
        asm.addi("t0", "t0", -1),
        ("branch", asm.bne, "t0", "zero", "loop"),
        asm.reveal("s0"),
        asm.halt(0),
    ]
    ex, state = run_program(prog)
    assert state == HALTED
    assert ex.public_values() == [6765]  # fib(20)


def test_memory_ops():
    prog = [
        asm.li("t0", 0x1000),
        asm.li("t1", 0xDEADBEEF),
        asm.sw("t1", "t0", 0),
        asm.lw("t2", "t0", 0),
        asm.lbu("t3", "t0", 3),     # 0xDE
        asm.lh("t4", "t0", 0),      # sign-extended 0xBEEF -> negative
        asm.reveal("t2", 0),
        asm.reveal("t3", 1),
        asm.reveal("t4", 2),
        asm.halt(0),
    ]
    ex, state = run_program(prog)
    assert state == HALTED
    pvs = ex.public_values()
    assert pvs[0] == 0xDEADBEEF
    assert pvs[1] == 0xDE
    assert pvs[2] == (0xFFFFBEEF)


def test_m_extension_edge_cases():
    prog = [
        asm.li("t0", -7),
        asm.li("t1", 2),
        asm.div("t2", "t0", "t1"),     # -3
        asm.rem("t3", "t0", "t1"),     # -1
        asm.li("t4", 5),
        asm.div("t5", "t4", "zero"),   # div by zero -> -1
        asm.remu("t6", "t4", "zero"),  # rem by zero -> a
        asm.reveal("t2", 0),
        asm.reveal("t3", 1),
        asm.reveal("t5", 2),
        asm.reveal("t6", 3),
        asm.halt(0),
    ]
    ex, state = run_program(prog)
    pvs = ex.public_values()
    assert pvs[0] == (-3) % (1 << 32)
    assert pvs[1] == (-1) % (1 << 32)
    assert pvs[2] == 0xFFFFFFFF
    assert pvs[3] == 5


def test_mulh_variants():
    a, b = 0x80000001, 0x7FFFFFFF
    prog = [
        asm.li("t0", a - (1 << 32)),
        asm.li("t1", b),
        asm.mulh("t2", "t0", "t1"),
        asm.mulhu("t3", "t0", "t1"),
        asm.mulhsu("t4", "t0", "t1"),
        asm.reveal("t2", 0),
        asm.reveal("t3", 1),
        asm.reveal("t4", 2),
        asm.halt(0),
    ]
    ex, _ = run_program(prog)
    sa = a - (1 << 32)
    pvs = ex.public_values()
    assert pvs[0] == ((sa * b) >> 32) % (1 << 32)
    assert pvs[1] == ((a * b) >> 32) % (1 << 32)
    assert pvs[2] == ((sa * b) >> 32) % (1 << 32)


def test_hint_stream():
    hints = (1234).to_bytes(4, "little") + (5678).to_bytes(4, "little")
    prog = [
        asm.li("a7", 1), asm.ecall(),            # read hint word -> a0
        asm.add("s0", "a0", "zero"),
        asm.li("a7", 1), asm.ecall(),
        asm.add("s1", "a0", "zero"),
        asm.add("t0", "s0", "s1"),
        asm.reveal("t0"),
        asm.halt(0),
    ]
    ex, state = run_program(prog, hints=hints)
    assert ex.public_values() == [1234 + 5678]


def test_records_shape_and_content():
    ex, _ = run_program([asm.li("t0", 5), asm.li("t1", 7),
                         asm.add("t2", "t0", "t1"), asm.halt("t2")])
    rec = ex.records()
    assert rec.shape[1] == 7
    # find the add record
    add_rows = rec[rec[:, 4] == 12]
    assert len(add_rows) >= 1
    assert add_rows[0][2] == 5 and add_rows[0][3] == 7


def test_segmentation_pause_resume():
    prog = [
        asm.li("t0", 1000),
        ("label", "loop"),
        asm.addi("t0", "t0", -1),
        ("branch", asm.bne, "t0", "zero", "loop"),
        asm.halt(0),
    ]
    ex = Rv32Executor()
    ex.load_program(asm.assemble(prog))
    states = []
    while True:
        s = ex.run(300)
        states.append(s)
        if s != PAUSED:
            break
    assert states[-1] == HALTED
    assert states.count(PAUSED) >= 5  # ~2000 cycles / 300
    assert ex.cycles > 2000


def test_trap_on_illegal_instruction():
    ex = Rv32Executor()
    ex.load_program([0xFFFFFFFF])
    assert ex.run(10) == TRAPPED

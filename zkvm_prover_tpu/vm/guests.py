"""Guest programs for the rv32 v2 machine.

The framework's analog of the reference's compiled guest binaries
(crates/circuits/*/src/main.rs -> .vmexe). Programs are assembled rv32im
with the hint-stream / reveal / keccak syscalls; the assembled ROM is
preprocessed trace (vk material), so the app's exe commitment binds the
actual program words.
"""

from __future__ import annotations

from typing import List

from . import asm

MSG_BASE = 0x3000
OUT_BASE = 0x2F00          # digest buffer (below MSG_BASE, above data base)
DATA_BASE = 0x2F00


def hash_reveal_program() -> List[int]:
    """The PI-hash guest: read a length-prefixed byte stream from the hint
    stream, store it to RAM, keccak256 it via the syscall, and reveal the
    32-byte digest as the machine's public values.

    Mirrors the reveal tail of the reference guests
    (crates/circuits/chunk-circuit/src/main.rs:14-29: read -> compute ->
    reveal_pi_hash): the hinted bytes are the PI preimage; the digest
    computation is proven in-VM (keccak syscall chips).

    Hint stream layout: word 0 = byte length L, then ceil(L/4) words of
    little-endian message bytes.
    """
    body = [
        *asm.hint_read("s1"),            # s1 = L
        asm.addi("t0", "s1", 3),
        asm.srli("s2", "t0", 2),         # s2 = n_words
        asm.addi("s0", "zero", 0),       # i = 0
        *asm.li("s3", MSG_BASE),
        ("label", "loop"),
        ("branch", asm.beq, "s0", "s2", "done"),
        *asm.hint_read("t0"),
        asm.slli("t1", "s0", 2),
        asm.add("t1", "t1", "s3"),
        asm.sw("t0", "t1", 0),
        asm.addi("s0", "s0", 1),
        # loop back with an always-taken branch (v2 forbids rd=x0 writes,
        # so `jal zero` is unavailable)
        ("branch", asm.beq, "zero", "zero", "loop"),
        ("label", "done"),
        # keccak256(MSG_BASE, L, OUT_BASE)
        *asm.li("a0", MSG_BASE),
        asm.add("a1", "s1", "zero"),
        *asm.li("a2", OUT_BASE),
        *asm.li("a7", 3),
        asm.ecall(),
    ]
    for i in range(8):
        body += [
            *asm.li("t1", OUT_BASE + 4 * i),
            asm.lw("t0", "t1", 0),
            *asm.reveal("t0", i),
        ]
    body.append(asm.halt(0))
    return asm.assemble(body)


def hash_hints(message: bytes) -> bytes:
    """Hint stream for hash_reveal_program."""
    padded = message + b"\x00" * (-len(message) % 4)
    return len(message).to_bytes(4, "little") + padded


def deferred_agg_program() -> List[int]:
    """The deferred-aggregation guest: for each child proof, read a
    64-byte leaf — keccak(child vk) || child pi-hash — from the hint
    stream, store it to RAM, and DEFER its verification (ECALL a7=8);
    then keccak256 the concatenated leaves and reveal the digest.

    Mirrors the reference batch/bundle guests' deferred `verify_stark`
    calls (crates/circuits/batch-circuit/src/main.rs:10-35 with
    crates/types/circuit/src/lib.rs:147-153): child validity is NOT
    proven here — the DeferralVmAir digest binds the ordered leaf list,
    and the host attaches a discharge proof (host/deferred.py).

    Hint stream layout: word 0 = N children, then N x 16 words of leaf
    bytes (little-endian).
    """
    body = [
        *asm.hint_read("s1"),            # s1 = N children
        *asm.li("s3", MSG_BASE),         # leaf cursor
        *asm.li("s5", 16),               # words per leaf
        *asm.li("s0", 0),                # i = 0
        ("label", "outer"),
        ("branch", asm.beq, "s0", "s1", "done"),
        *asm.li("s4", 0),                # j = 0
        ("label", "inner"),
        ("branch", asm.beq, "s4", "s5", "after"),
        *asm.hint_read("t0"),
        asm.slli("t1", "s4", 2),
        asm.add("t1", "t1", "s3"),
        asm.sw("t0", "t1", 0),
        asm.addi("s4", "s4", 1),
        ("branch", asm.beq, "zero", "zero", "inner"),
        ("label", "after"),
        asm.add("a0", "s3", "zero"),     # defer_verify(s3)
        *asm.li("a7", 8),
        asm.ecall(),
        asm.addi("s3", "s3", 64),
        asm.addi("s0", "s0", 1),
        ("branch", asm.beq, "zero", "zero", "outer"),
        ("label", "done"),
        # keccak256(MSG_BASE, 64*N, OUT_BASE) over the leaf concatenation
        *asm.li("a0", MSG_BASE),
        asm.slli("a1", "s1", 6),
        *asm.li("a2", OUT_BASE),
        *asm.li("a7", 3),
        asm.ecall(),
    ]
    for i in range(8):
        body += [
            *asm.li("t1", OUT_BASE + 4 * i),
            asm.lw("t0", "t1", 0),
            *asm.reveal("t0", i),
        ]
    body.append(asm.halt(0))
    return asm.assemble(body)


def deferred_agg_hints(leaves: List[bytes]) -> bytes:
    """Hint stream for deferred_agg_program (64-byte leaves)."""
    assert all(len(l) == 64 for l in leaves)
    return len(leaves).to_bytes(4, "little") + b"".join(leaves)

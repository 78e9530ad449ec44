"""KECCAK256 syscall (ECALL a7=3): SystemAir handoff -> KeccakVmAir sponge
-> KeccakfAir permutation, with RAM reads/writes over the offline-checking
MEM_BUS. Reference analog: openvm keccak extension + in-guest
keccak256_rv32 (/root/reference/crates/types/base/src/utils/hash.rs:6-26).
"""

import numpy as np
import pytest

from zkvm_prover_tpu.models import keccak_vm, rv32_v2
from zkvm_prover_tpu.ops.keccak import keccak256
from zkvm_prover_tpu.stark import debug, machine
from zkvm_prover_tpu.stark.config import StarkConfig
from zkvm_prover_tpu.stark.fri import FriConfig
from zkvm_prover_tpu.vm import asm
from zkvm_prover_tpu.vm.executor import HALTED, Rv32Executor

TINY = StarkConfig(fri=FriConfig(log_blowup=1, num_queries=2,
                                 proof_of_work_bits=2))

MSG_BASE = 0x3000
OUT_BASE = 0x3100


def keccak_guest(msg: bytes):
    """Stores msg to RAM, hashes it via the syscall, reveals the digest."""
    body = []
    padded = msg + b"\x00" * (-len(msg) % 4)
    for i in range(0, len(padded), 4):
        w = int.from_bytes(padded[i : i + 4], "little")
        body += asm.li("t0", w)
        body += asm.li("t1", MSG_BASE + i)
        body.append(asm.sw("t0", "t1", 0))
    body += asm.keccak256(MSG_BASE, len(msg), OUT_BASE)
    for i in range(8):
        body += asm.li("t1", OUT_BASE + 4 * i)
        body.append(asm.lw("t0", "t1", 0))
        body += asm.reveal("t0", i)
    body.append(asm.halt(0))
    return asm.assemble(body)


def run_guest(msg: bytes):
    prog = keccak_guest(msg)
    ex = Rv32Executor()
    ex.load_program(prog)
    assert ex.run(1 << 14) == HALTED
    air_traces = rv32_v2.generate_traces(prog, ex.records(),
                                         data_base=0x3000)
    return ex, air_traces


MSGS = [b"", b"hello keccak on tpu!", b"\xab" * 150, b"\xcd" * 300]


@pytest.mark.parametrize(
    "msg", MSGS, ids=["empty", "short", "two-block", "three-block"]
)
def test_syscall_digest_and_constraints(msg):
    ex, air_traces = run_guest(msg)
    digest = b"".join(
        int(w).to_bytes(4, "little") for w in ex.public_values()
    )
    assert digest == keccak256(msg)

    for air, tr, pvs in air_traces:
        assert debug.check_constraints(air, tr, pvs) == [], type(air).__name__
    pairs = [(a, t) for a, t, _ in air_traces]
    pvs_map = {i: p for i, (_, _, p) in enumerate(air_traces)}
    assert debug.check_bus_balance(pairs, pvs_map) == {}


def test_forged_digest_unbalances():
    """Flip a digest byte in the sponge chip -> constraints/buses fail."""
    _, air_traces = run_guest(b"forge me")
    k_i = next(i for i, (a, _, _) in enumerate(air_traces)
               if isinstance(a, keccak_vm.KeccakVmAir))
    air, tr, _ = air_traces[k_i]
    bad = tr.copy()
    row = int(np.nonzero(bad[:, keccak_vm.IS_LAST])[0][0])
    bad[row, keccak_vm.SOUT] ^= 1
    broken = (
        debug.check_constraints(air, bad, []) != []
        or debug.check_bus_balance(
            [(a, t if i != k_i else bad)
             for i, (a, t, _) in enumerate(air_traces)],
            {i: p for i, (_, _, p) in enumerate(air_traces)},
        ) != {}
    )
    assert broken


def test_prove_verify_keccak_guest():
    _, air_traces = run_guest(b"prove this digest")
    instances = [machine.AirInstance(a, t, p) for a, t, p in air_traces]
    proof = machine.prove_machine(instances, TINY)
    assert machine.verify_machine([a for a, _, _ in air_traces], proof,
                                  TINY)

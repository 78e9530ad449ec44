"""Sha256Air: bit-level SHA-256 compression chip.

Cross-checked against hashlib.sha256. Reference analog: the openvm
sha256 extension (chunk-circuit openvm.toml extension list) / the sha256
crypto provider (crates/types/chunk/src/crypto.rs)."""

import hashlib
import struct

import numpy as np
import pytest

from zkvm_prover_tpu.models.air import Air, AirBuilder
from zkvm_prover_tpu.models.sha256_air import (
    H_INIT,
    NUM_ROUNDS,
    SHA256_BUS,
    Sha256Air,
    sha256_compress,
    sha256_message_limbs,
)
from zkvm_prover_tpu.stark import debug, machine
from zkvm_prover_tpu.stark.config import StarkConfig
from zkvm_prover_tpu.stark.fri import FriConfig

TINY = StarkConfig(fri=FriConfig(log_blowup=1, num_queries=2,
                                 proof_of_work_bits=2))


def _pad_one_block(data: bytes):
    assert len(data) <= 55
    block = data + b"\x80" + b"\x00" * (55 - len(data)) + \
        struct.pack(">Q", len(data) * 8)
    return list(struct.unpack(">16I", block))


def test_host_compress_matches_hashlib():
    for data in (b"", b"abc", b"a" * 55):
        msg = _pad_one_block(data)
        out = sha256_compress(H_INIT, msg)
        digest = b"".join(struct.pack(">I", w) for w in out)
        assert digest == hashlib.sha256(data).digest()


class _QueryAir(Air):
    width = 65  # is_real | 64 limbs
    num_public_values = 0

    def eval(self, b: AirBuilder) -> None:
        real = b.local(0)
        b.assert_bool(real)
        b.push_send(SHA256_BUS, [b.local(1 + i) for i in range(64)], real)

    @staticmethod
    def generate_trace(calls):
        n = max(4, 1 << (len(calls) - 1).bit_length())
        t = np.zeros((n, 65), dtype=np.uint32)
        for r, (h_in, msg) in enumerate(calls):
            t[r, 0] = 1
            t[r, 1:] = sha256_message_limbs(
                h_in, msg, sha256_compress(h_in, msg))
        return t


BLOCKS = [
    (H_INIT, _pad_one_block(b"abc")),
    (H_INIT, _pad_one_block(b"tpu sha256 chip")),
]


def _instances(log_n=7, blocks=BLOCKS):
    air = Sha256Air(log_n=log_n)
    trace = air.generate_trace(blocks, [1] * len(blocks))
    q = _QueryAir()
    qt = _QueryAir.generate_trace(blocks)
    return [machine.AirInstance(air, trace, []),
            machine.AirInstance(q, qt, [])]


def test_trace_satisfies_constraints():
    insts = _instances()
    for inst in insts:
        errs = debug.check_constraints(inst.air, inst.trace,
                                       inst.public_values)
        assert errs == [], errs[:5]
    assert debug.check_bus_balance(
        [(i.air, i.trace) for i in insts], {}) == {}


def test_padded_blocks_satisfy_constraints():
    """log_n=8 with 2 real blocks leaves 2 flagged blocks to pad; padding
    must hold valid zero-message compressions at multiplicity 0."""
    air = Sha256Air(log_n=8)
    trace = air.generate_trace(BLOCKS, [1, 1])
    errs = debug.check_constraints(air, trace, [])
    assert errs == [], errs[:5]
    from zkvm_prover_tpu.models import sha256_air as S

    for p in (2, 3):
        assert trace[p * NUM_ROUNDS + NUM_ROUNDS - 1, S.MULT] == 0


def test_trace_output_matches_hashlib():
    air = Sha256Air(log_n=6)
    msg = _pad_one_block(b"abc")
    trace = air.generate_trace([(H_INIT, msg)], [1])
    from zkvm_prover_tpu.models import sha256_air as S

    out_limbs = trace[NUM_ROUNDS - 1, S.H_OUT : S.H_OUT + 16]
    words = [int(out_limbs[2 * j]) | (int(out_limbs[2 * j + 1]) << 16)
             for j in range(8)]
    digest = b"".join(struct.pack(">I", w) for w in words)
    assert digest == hashlib.sha256(b"abc").digest()


def test_tampered_output_fails():
    air = Sha256Air(log_n=6)
    trace = air.generate_trace([(H_INIT, _pad_one_block(b"abc"))], [1])
    from zkvm_prover_tpu.models import sha256_air as S

    bad = trace.copy()
    bad[NUM_ROUNDS - 1, S.H_OUT] ^= 1
    assert debug.check_constraints(air, bad, []) != []
    bad2 = trace.copy()
    bad2[30, S.A_BITS + 5] ^= 1  # flip one working-var bit mid-block
    assert debug.check_constraints(air, bad2, []) != []


@pytest.mark.slow
def test_prove_verify_sha256_machine():
    insts = _instances(log_n=7, blocks=BLOCKS[:1])
    proof = machine.prove_machine(insts, TINY)
    assert machine.verify_machine([i.air for i in insts], proof, TINY)

"""BigIntModMulAir: 256-bit modular arithmetic chip (openvm bigint +
modular extension analog, chunk-circuit openvm.toml:17-29)."""

import numpy as np
import pytest

from zkvm_prover_tpu.models.air import Air, AirBuilder
from zkvm_prover_tpu.models.bigint_air import (
    MODMUL_BUS,
    SUPPORTED_MODULI,
    BigIntModMulAir,
    modmul_message,
)
from zkvm_prover_tpu.models.rv32_v0 import ByteTableAir
from zkvm_prover_tpu.stark import debug, machine
from zkvm_prover_tpu.stark.config import StarkConfig
from zkvm_prover_tpu.stark.fri import FriConfig

TINY = StarkConfig(fri=FriConfig(log_blowup=1, num_queries=2,
                                 proof_of_work_bits=2))


class _RequestAir(Air):
    """Sends modmul requests (the extension-user side)."""

    width = 1 + 5 * 32
    num_public_values = 0

    def eval(self, b: AirBuilder) -> None:
        real = b.local(0)
        b.assert_bool(real)
        b.push_send(MODMUL_BUS,
                    [b.local(1 + i) for i in range(5 * 32)], real)

    @staticmethod
    def generate_trace(ops):
        n = max(4, 1 << (len(ops) - 1).bit_length())
        t = np.zeros((n, 1 + 5 * 32), dtype=np.uint32)
        for r, (a, bv, c, m) in enumerate(ops):
            t[r, 0] = 1
            t[r, 1:] = modmul_message(a, bv, c, m)
        return t


def _ops():
    k1 = SUPPORTED_MODULI[2]  # secp256k1 base field
    fr = SUPPORTED_MODULI[1]  # BN254 scalar field
    return [
        (0xDEADBEEF, 0x12345678, 0, k1),               # small modmul
        (k1 - 1, k1 - 1, 0, k1),                       # (-1)^2 = 1
        (123456789 << 128, 987654321 << 64, 0, fr),    # wide operands
        (fr - 5, 1, 17, fr),                           # modadd via b=1
    ]


def _byte_table_trace(kec_trace):
    counts = BigIntModMulAir.byte_lookups(kec_trace)
    t = np.zeros((256, 2), dtype=np.uint32)
    t[:, ByteTableAir.VALUE] = np.arange(256)
    t[:, ByteTableAir.MULT] = counts.astype(np.uint32)
    return t


def _instances(ops=None):
    ops = ops or _ops()
    air = BigIntModMulAir()
    tr = air.generate_trace(ops)
    req = _RequestAir()
    rt = _RequestAir.generate_trace(ops)
    byte = ByteTableAir()
    bt = _byte_table_trace(tr)
    return [
        machine.AirInstance(air, tr, []),
        machine.AirInstance(req, rt, []),
        machine.AirInstance(byte, bt, []),
    ]


def test_identity_holds():
    for a, bv, c, m in _ops():
        q, r = divmod(a * bv + c, m)
        assert a * bv + c == q * m + r and r == (a * bv + c) % m


def test_trace_satisfies_constraints():
    insts = _instances()
    for inst in insts:
        errs = debug.check_constraints(inst.air, inst.trace,
                                       inst.public_values)
        assert errs == [], errs[:5]
    assert debug.check_bus_balance(
        [(i.air, i.trace) for i in insts], {}) == {}


def test_wrong_result_fails():
    ops = _ops()
    air = BigIntModMulAir()
    tr = air.generate_trace(ops)
    from zkvm_prover_tpu.models import bigint_air as BA

    bad = tr.copy()
    bad[0, BA.R_] ^= 1  # r off by one
    assert debug.check_constraints(air, bad, []) != []


def test_forged_quotient_fails():
    """q tampered while keeping the bus message: the carry chain must
    break (the identity is exact, not modular)."""
    ops = _ops()
    air = BigIntModMulAir()
    tr = air.generate_trace(ops)
    from zkvm_prover_tpu.models import bigint_air as BA

    bad = tr.copy()
    bad[1, BA.Q] = (int(bad[1, BA.Q]) + 1) % 256
    assert debug.check_constraints(air, bad, []) != []


def test_modsub_via_complement():
    m = SUPPORTED_MODULI[0]
    a, b = 5, 9
    # a - b mod m rewritten as a + (m - b)
    ops = [(a, 1, m - b, m)]
    air = BigIntModMulAir()
    tr = air.generate_trace(ops)
    assert debug.check_constraints(air, tr, []) == []
    from zkvm_prover_tpu.models import bigint_air as BA

    r = sum(int(tr[0, BA.R_ + i]) << (8 * i) for i in range(32))
    assert r == (a - b) % m


@pytest.mark.slow
def test_prove_verify_bigint_machine():
    insts = _instances(_ops()[:2])
    proof = machine.prove_machine(insts, TINY)
    assert machine.verify_machine([i.air for i in insts], proof, TINY)

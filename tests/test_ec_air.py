"""EcAddAir: affine Weierstrass point addition delegated to the
bigint/modular chip over MODMUL_BUS (openvm ecc extension analog,
chunk-circuit openvm.toml:40-60)."""

import numpy as np
import pytest

from zkvm_prover_tpu.models.air import Air, AirBuilder
from zkvm_prover_tpu.models.bigint_air import BigIntModMulAir
from zkvm_prover_tpu.models.ec_air import (
    EC_ADD_BUS,
    EcAddAir,
    ec_add_message,
)
from zkvm_prover_tpu.models.rv32_v0 import ByteTableAir
from zkvm_prover_tpu.stark import debug, machine
from zkvm_prover_tpu.stark.config import StarkConfig
from zkvm_prover_tpu.stark.fri import FriConfig
from zkvm_prover_tpu.types.chunk.crypto.weierstrass import SECP256K1 as K1

TINY = StarkConfig(fri=FriConfig(log_blowup=1, num_queries=2,
                                 proof_of_work_bits=2))


class _RequestAir(Air):
    """Consumer side: requests EC adds."""

    width = 1 + 7 * 32
    num_public_values = 0

    def eval(self, b: AirBuilder) -> None:
        real = b.local(0)
        b.assert_bool(real)
        b.push_send(EC_ADD_BUS,
                    [b.local(1 + i) for i in range(7 * 32)], real)

    @staticmethod
    def generate_trace(adds):
        n = max(4, 1 << (len(adds) - 1).bit_length())
        t = np.zeros((n, 1 + 7 * 32), dtype=np.uint32)
        for r, (p1, p2, m) in enumerate(adds):
            t[r, 0] = 1
            t[r, 1:] = ec_add_message(p1, p2, m)
        return t


def _adds():
    g = K1.generator()
    g2 = K1.mul(2, g)
    g3 = K1.mul(3, g)
    g5 = K1.mul(5, g)
    return [
        (g, g2, K1.p),     # G + 2G
        (g2, g3, K1.p),    # 2G + 3G
        (g, g5, K1.p),
    ]


def _instances(adds=None):
    adds = adds or _adds()
    ec = EcAddAir()
    ec_tr, requests = EcAddAir.generate_trace(adds)
    big = BigIntModMulAir()
    big_tr = big.generate_trace(requests)
    byte = ByteTableAir()
    counts = BigIntModMulAir.byte_lookups(big_tr)
    bt = np.zeros((256, 2), dtype=np.uint32)
    bt[:, ByteTableAir.VALUE] = np.arange(256)
    bt[:, ByteTableAir.MULT] = counts.astype(np.uint32)
    req = _RequestAir()
    req_tr = _RequestAir.generate_trace(adds)
    return [
        machine.AirInstance(ec, ec_tr, []),
        machine.AirInstance(big, big_tr, []),
        machine.AirInstance(byte, bt, []),
        machine.AirInstance(req, req_tr, []),
    ]


def test_add_matches_curve_library():
    g = K1.generator()
    for p1, p2, m in _adds():
        want = K1.add_affine(p1, p2) if hasattr(K1, "add_affine") else None
        # derive via the message helper and check on-curve + group law
        msg = ec_add_message(p1, p2, m)
        x3 = sum(msg[4 * 32 + i] << (8 * i) for i in range(32))
        y3 = sum(msg[5 * 32 + i] << (8 * i) for i in range(32))
        assert K1.is_on_curve((x3, y3))
    # group law: G + 2G == 3G
    msg = ec_add_message(g, K1.mul(2, g), K1.p)
    x3 = sum(msg[4 * 32 + i] << (8 * i) for i in range(32))
    y3 = sum(msg[5 * 32 + i] << (8 * i) for i in range(32))
    assert (x3, y3) == K1.mul(3, g)


def test_trace_satisfies_constraints_and_buses():
    insts = _instances()
    for inst in insts:
        errs = debug.check_constraints(inst.air, inst.trace,
                                       inst.public_values)
        assert errs == [], (type(inst.air).__name__, errs[:3])
    assert debug.check_bus_balance(
        [(i.air, i.trace) for i in insts], {}) == {}


def test_forged_sum_unbalances():
    """Tampering x3 in the EC trace breaks MODMUL_BUS balance (the
    modular chip never proved the forged relation)."""
    adds = _adds()
    ec = EcAddAir()
    ec_tr, requests = EcAddAir.generate_trace(adds)
    from zkvm_prover_tpu.models import ec_air as E

    big_tr = BigIntModMulAir().generate_trace(requests)
    bad = ec_tr.copy()
    bad[0, E._OFF["x3"]] ^= 1
    bal = debug.check_bus_balance(
        [(ec, bad), (BigIntModMulAir(), big_tr)], {})
    assert E.MODMUL_BUS in bal or bal != {}


def test_doubling_rejected():
    g = K1.generator()
    with pytest.raises(AssertionError):
        EcAddAir.generate_trace([(g, g, K1.p)])


@pytest.mark.slow
def test_prove_verify_ec_machine():
    insts = _instances(_adds()[:1])
    proof = machine.prove_machine(insts, TINY)
    assert machine.verify_machine([i.air for i in insts], proof, TINY)

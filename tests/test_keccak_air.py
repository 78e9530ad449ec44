"""KeccakfAir: bit-level keccak-f[1600] permutation chip.

Cross-checked against the host keccak (ops/keccak.py, itself validated
against reference keccak256 vectors). Reference analog: the openvm keccak
extension (/root/reference/crates/circuits/chunk-circuit/openvm.toml:22-27).
"""

import numpy as np
import pytest

from zkvm_prover_tpu.models.air import Air, AirBuilder
from zkvm_prover_tpu.models.keccak_air import (
    KECCAK_F_BUS,
    NUM_ROUNDS,
    KeccakfAir,
    keccakf_message,
    state_limbs,
)
from zkvm_prover_tpu.ops.keccak import keccak_f1600
from zkvm_prover_tpu.stark import debug, machine
from zkvm_prover_tpu.stark.config import StarkConfig
from zkvm_prover_tpu.stark.fri import FriConfig

TINY = StarkConfig(fri=FriConfig(log_blowup=1, num_queries=2,
                                 proof_of_work_bits=2))


class _QueryAir(Air):
    """Sends one keccak-f query per real row (lookup-user side)."""

    width = 201  # is_real | 200 message limbs
    num_public_values = 0

    def eval(self, b: AirBuilder) -> None:
        real = b.local(0)
        b.assert_bool(real)
        b.push_send(KECCAK_F_BUS, [b.local(1 + i) for i in range(200)], real)

    @staticmethod
    def generate_trace(states):
        n = max(4, 1 << (len(states) - 1).bit_length())
        t = np.zeros((n, 201), dtype=np.uint32)
        for r, s in enumerate(states):
            t[r, 0] = 1
            t[r, 1:] = keccakf_message(s)
        return t


STATES = [
    [0] * 25,
    [(i * 0x9E3779B97F4A7C15) & ((1 << 64) - 1) for i in range(25)],
]


def _instances():
    kec = KeccakfAir(log_n=6)  # 64 rows >= 2*24
    trace = kec.generate_trace(STATES, [1] * len(STATES))
    q = _QueryAir()
    qt = _QueryAir.generate_trace(STATES)
    return [
        machine.AirInstance(kec, trace, []),
        machine.AirInstance(q, qt, []),
    ]


def test_trace_satisfies_constraints():
    insts = _instances()
    for inst in insts:
        errs = debug.check_constraints(inst.air, inst.trace,
                                       inst.public_values)
        assert errs == [], errs[:5]
    pairs = [(i.air, i.trace) for i in insts]
    assert debug.check_bus_balance(pairs, {}) == {}


def test_trace_output_matches_host_keccak():
    kec = KeccakfAir(log_n=5)
    trace = kec.generate_trace([STATES[1]], [1])
    out = keccak_f1600(list(STATES[1]))
    last = trace[NUM_ROUNDS - 1]
    from zkvm_prover_tpu.models import keccak_air as K

    got = [
        int(last[K.A_PP + K._limb_idx(x, y, limb)])
        if not (x == 0 and y == 0)
        else int(last[K.A_PPP_00 + limb])
        for y in range(5) for x in range(5)
        for limb in range(K.U64_LIMBS)
    ]
    assert got == state_limbs(out)


def test_tampered_output_fails():
    insts = _instances()
    kec_inst = insts[0]
    bad = kec_inst.trace.copy()
    from zkvm_prover_tpu.models import keccak_air as K

    bad[NUM_ROUNDS - 1, K.A_PP + 12] ^= 1
    errs = debug.check_constraints(kec_inst.air, bad, [])
    assert errs != []


def test_padded_blocks_satisfy_constraints():
    """Regression: the preprocessed schedule flags every n//24 block, so
    blocks not filled by a real permutation must carry the zero-state
    permutation (mult 0) — all-zero rows violate the ungated iota
    constraint. 3 states at log_n=7 leaves 2 flagged blocks to pad."""
    states3 = STATES + [[(7 * i + 1) & ((1 << 64) - 1) for i in range(25)]]
    kec = KeccakfAir(log_n=7)  # 128 rows -> 5 flagged blocks, 2 padded
    trace = kec.generate_trace(states3, [1] * len(states3))
    errs = debug.check_constraints(kec, trace, [])
    assert errs == [], errs[:5]
    # padded blocks must not touch the bus
    from zkvm_prover_tpu.models import keccak_air as K

    for p in range(3, 5):
        assert trace[p * NUM_ROUNDS + NUM_ROUNDS - 1, K.MULT] == 0
    # and the bus still balances against the 3 real queries
    q = _QueryAir()
    qt = _QueryAir.generate_trace(states3)
    assert debug.check_bus_balance([(kec, trace), (q, qt)], {}) == {}


def test_prove_verify_keccak_machine():
    insts = _instances()
    proof = machine.prove_machine(insts, TINY)
    assert machine.verify_machine([i.air for i in insts], proof, TINY)

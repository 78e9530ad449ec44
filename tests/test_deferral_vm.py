"""DeferralVmAir chip tier (fast): DEFER syscall (ECALL a7=8) trace
constraints, bus balance, sponge-chain digest, and forgeries. The full
deferred-aggregation e2e (discharge proof) is the RUN_HEAVY tier in
test_deferred_agg.py."""

import numpy as np

from zkvm_prover_tpu.models import rv32_v2
from zkvm_prover_tpu.models.deferral_vm import (
    ACC_IN,
    DeferralVmAir,
    chain_digest_from_leaves,
)
from zkvm_prover_tpu.stark import debug
from zkvm_prover_tpu.vm import asm
from zkvm_prover_tpu.vm.executor import HALTED, Rv32Executor

BASE = 0x3000


def _defer_guest(leaves):
    body = []
    for i, leaf in enumerate(leaves):
        base = BASE + 64 * i
        for j in range(0, 64, 4):
            body += asm.li("t0", int.from_bytes(leaf[j : j + 4], "little"))
            body += asm.li("t1", base + j)
            body.append(asm.sw("t0", "t1", 0))
        body += asm.defer_verify(base)
    body.append(asm.halt(0))
    return asm.assemble(body)


def _run(prog):
    ex = Rv32Executor()
    ex.load_program(prog)
    assert ex.run(1 << 15) == HALTED and ex.exit_code == 0
    return ex, rv32_v2.generate_traces(prog, ex.records(), data_base=BASE)


def test_defer_chain_digest_and_constraints():
    leaves = [bytes(range(64)), bytes(range(100, 164)),
              b"\xAB" * 32 + b"\xCD" * 32]
    _, traces = _run(_defer_guest(leaves))
    for air, tr, p in traces:
        errs = debug.check_constraints(air, tr, p)
        assert errs == [], (type(air).__name__, errs[:3])
    bal = debug.check_bus_balance(
        [(a, t) for a, t, _ in traces],
        {i: p for i, (_, _, p) in enumerate(traces)})
    assert bal == {}, sorted(bal)[:4]
    di = next(i for i, (a, _, _) in enumerate(traces)
              if isinstance(a, DeferralVmAir))
    expect = chain_digest_from_leaves(leaves)
    assert list(traces[di][2]) == [int(v) for v in expect]


def test_defer_forged_digest_pv_breaks():
    """Claiming a different final digest in the public values must fail."""
    _, traces = _run(_defer_guest([bytes(64)]))
    di = next(i for i, (a, _, _) in enumerate(traces)
              if isinstance(a, DeferralVmAir))
    air, tr, pvs = traces[di]
    bad_pvs = list(pvs)
    bad_pvs[0] ^= 1
    assert debug.check_constraints(air, tr, bad_pvs) != []


def test_defer_forged_leaf_breaks():
    """Flipping an absorbed byte limb must break either the chip
    constraints or the bus balance (RAM read consistency)."""
    _, traces = _run(_defer_guest([bytes(range(64))]))
    di = next(i for i, (a, _, _) in enumerate(traces)
              if isinstance(a, DeferralVmAir))
    air, tr, pvs = traces[di]
    bad = tr.copy()
    from zkvm_prover_tpu.models.deferral_vm import RDP

    bad[0, RDP + 3] ^= 1  # first value limb of the first read port
    broken = (
        debug.check_constraints(air, bad, pvs) != []
        or debug.check_bus_balance(
            [(a, t if i != di else bad) for i, (a, t, _) in
             enumerate(traces)],
            {i: p for i, (_, _, p) in enumerate(traces)}) != {}
    )
    assert broken


def test_defer_reordered_rows_change_digest():
    """The sponge chain is order-binding: swapping two deferral rows'
    leaves yields a different digest."""
    l1, l2 = bytes(range(64)), bytes(range(64, 128))
    a = chain_digest_from_leaves([l1, l2])
    b = chain_digest_from_leaves([l2, l1])
    assert not np.array_equal(a, b)

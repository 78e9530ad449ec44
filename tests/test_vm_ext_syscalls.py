"""Modular-arithmetic (ECALL a7=4), EC-add (a7=5) and SHA-256 (a7=6)
syscalls: SystemAir handoff -> ModularVmAir / EcVmAir / Sha256VmAir, with
RAM reads/writes over the offline-checking MEM_BUS and 256-bit arithmetic
delegated to BigIntModMulAir (and EcAddAir). Reference analog: openvm's
modular/bigint, ecc and sha256 VM extensions
(/root/reference/crates/circuits/chunk-circuit/openvm.toml:17-60)."""

import hashlib

import numpy as np
import pytest

from zkvm_prover_tpu.models import rv32_v2, sha256_vm, vm_ext
from zkvm_prover_tpu.models.bigint_air import SUPPORTED_MODULI
from zkvm_prover_tpu.stark import debug, machine
from zkvm_prover_tpu.stark.config import StarkConfig
from zkvm_prover_tpu.stark.fri import FriConfig
from zkvm_prover_tpu.types.chunk.crypto.weierstrass import SECP256K1 as K1
from zkvm_prover_tpu.vm import asm
from zkvm_prover_tpu.vm.executor import HALTED, Rv32Executor

TINY = StarkConfig(fri=FriConfig(log_blowup=1, num_queries=2,
                                 proof_of_work_bits=2))
BASE = 0x3000


def _store256(val, addr):
    out = []
    for i in range(8):
        out += asm.li("t0", (val >> (32 * i)) & 0xFFFFFFFF)
        out += asm.li("t1", addr + 4 * i)
        out.append(asm.sw("t0", "t1", 0))
    return out


def _reveal_word(addr, idx):
    out = asm.li("t1", addr)
    out.append(asm.lw("t0", "t1", 0))
    out += asm.reveal("t0", idx)
    return out


def _run(prog, max_cycles=1 << 15):
    ex = Rv32Executor()
    ex.load_program(prog)
    assert ex.run(max_cycles) == HALTED and ex.exit_code == 0
    traces = rv32_v2.generate_traces(prog, ex.records(), data_base=BASE)
    return ex, traces


def _check_all(traces):
    for air, tr, p in traces:
        errs = debug.check_constraints(air, tr, p)
        assert errs == [], (type(air).__name__, errs[:4])
    bal = debug.check_bus_balance(
        [(a, t) for a, t, _ in traces],
        {i: p for i, (_, _, p) in enumerate(traces)})
    assert bal == {}, sorted(bal)[:4]


# --- modop -----------------------------------------------------------------


@pytest.mark.parametrize("mi", range(len(SUPPORTED_MODULI)))
def test_modop_all_moduli(mi):
    m = SUPPORTED_MODULI[mi]
    x = (0x123456789ABCDEF0 * (mi + 1) ** 7 + 12345) % m
    y = (0xFEDCBA9876543210 * (mi + 3) ** 9 + 999) % m
    body = _store256(x, BASE) + _store256(y, BASE + 32)
    body += asm.modop(BASE + 64, BASE, BASE + 32, asm.MODOP_MUL, mi)
    body += asm.modop(BASE + 96, BASE, BASE + 32, asm.MODOP_ADD, mi)
    body += asm.modop(BASE + 128, BASE, BASE + 32, asm.MODOP_SUB, mi)
    for j, off in enumerate((64, 96, 128)):
        body += _reveal_word(BASE + off, j)
    body += asm.halt(0)
    ex, traces = _run(asm.assemble(body))
    pvs = ex.public_values()
    assert pvs[0] == (x * y % m) & 0xFFFFFFFF
    assert pvs[1] == ((x + y) % m) & 0xFFFFFFFF
    assert pvs[2] == ((x - y) % m) & 0xFFFFFFFF
    _check_all(traces)


@pytest.mark.parametrize("mi", [0, 2, 5])
def test_moddiv(mi):
    """OP_DIV (openvm ModularDiv parity): r = x/y with the in-chip
    y*yinv == 1 invertibility request."""
    m = SUPPORTED_MODULI[mi]
    x = (0xDEADBEEFCAFE1234 * (mi + 2) ** 11 + 7) % m
    y = (0x123456789ABCDEF * (mi + 5) ** 13 + 3) % m
    body = _store256(x, BASE) + _store256(y, BASE + 32)
    body += asm.modop(BASE + 64, BASE, BASE + 32, asm.MODOP_DIV, mi)
    body += _reveal_word(BASE + 64, 0)
    body += asm.halt(0)
    ex, traces = _run(asm.assemble(body))
    expect = x * pow(y, -1, m) % m
    assert ex.public_values()[0] == expect & 0xFFFFFFFF
    _check_all(traces)


def test_moddiv_by_zero_traps():
    body = _store256(5, BASE) + _store256(0, BASE + 32)
    body += asm.modop(BASE + 64, BASE, BASE + 32, asm.MODOP_DIV, 0)
    body += asm.halt(0)
    ex = Rv32Executor()
    ex.load_program(asm.assemble(body))
    from zkvm_prover_tpu.vm.executor import TRAPPED

    assert ex.run(1 << 15) == TRAPPED


def test_modop_forged_result_breaks():
    m = SUPPORTED_MODULI[0]
    body = _store256(123456789, BASE) + _store256(987654321, BASE + 32)
    body += asm.modop(BASE + 64, BASE, BASE + 32, asm.MODOP_MUL, 0)
    body += asm.halt(0)
    _, traces = _run(asm.assemble(body))
    mi = next(i for i, (a, _, _) in enumerate(traces)
              if isinstance(a, vm_ext.ModularVmAir))
    air, tr, _ = traces[mi]
    bad = tr.copy()
    bad[0, vm_ext.RES] ^= 1  # flip a result limb
    broken = (
        debug.check_constraints(air, bad, []) != []
        or debug.check_bus_balance(
            [(a, t if i != mi else bad) for i, (a, t, _) in
             enumerate(traces)],
            {i: p for i, (_, _, p) in enumerate(traces)}) != {}
    )
    assert broken


# --- ec_add ----------------------------------------------------------------


def _store_point(pt, addr):
    return _store256(pt[0], addr) + _store256(pt[1], addr + 32)


def test_ec_add_secp256k1():
    g = K1.generator()
    g2 = K1.mul(2, g)
    g3 = K1.add(g, g2)
    body = _store_point(g, BASE) + _store_point(g2, BASE + 64)
    body += asm.ec_add(BASE + 128, BASE, BASE + 64, 2)
    body += _reveal_word(BASE + 128, 0)
    body += asm.halt(0)
    ex, traces = _run(asm.assemble(body))
    x3 = sum(ex.load_mem32(BASE + 128 + 4 * i) << (32 * i)
             for i in range(8))
    y3 = sum(ex.load_mem32(BASE + 160 + 4 * i) << (32 * i)
             for i in range(8))
    assert (x3, y3) == g3
    _check_all(traces)


def test_ec_add_forged_coordinate_breaks():
    g = K1.generator()
    g2 = K1.mul(2, g)
    body = _store_point(g, BASE) + _store_point(g2, BASE + 64)
    body += asm.ec_add(BASE + 128, BASE, BASE + 64, 2)
    body += asm.halt(0)
    _, traces = _run(asm.assemble(body))
    ei = next(i for i, (a, _, _) in enumerate(traces)
              if isinstance(a, vm_ext.EcVmAir))
    air, tr, _ = traces[ei]
    bad = tr.copy()
    bad[0, vm_ext.E_RES] ^= 1  # flip an x3 limb
    broken = (
        debug.check_constraints(air, bad, []) != []
        or debug.check_bus_balance(
            [(a, t if i != ei else bad) for i, (a, t, _) in
             enumerate(traces)],
            {i: p for i, (_, _, p) in enumerate(traces)}) != {}
    )
    assert broken


# --- sha256 ----------------------------------------------------------------


def _sha_guest(msg):
    body = []
    padded = msg + b"\0" * (-len(msg) % 4)
    for i in range(0, len(padded), 4):
        body += asm.li("t0", int.from_bytes(padded[i : i + 4], "little"))
        body += asm.li("t1", BASE + i)
        body.append(asm.sw("t0", "t1", 0))
    body += asm.sha256(BASE, len(msg), BASE + 0x400)
    for i in range(8):
        body += _reveal_word(BASE + 0x400 + 4 * i, i)
    body += asm.halt(0)
    return asm.assemble(body)


@pytest.mark.parametrize(
    "msg",
    [b"", b"sha256 on tpu!", b"\xab" * 55, b"\xcd" * 56, b"\x11" * 64,
     b"\x22" * 150],
    ids=["empty", "short", "fit-55", "spill-56", "exact-64", "three-block"],
)
def test_sha256_digest_and_constraints(msg):
    ex, traces = _run(_sha_guest(msg))
    digest = b"".join(int(w).to_bytes(4, "little")
                      for w in ex.public_values())
    assert digest == hashlib.sha256(msg).digest()
    _check_all(traces)


def test_sha256_forged_digest_breaks():
    _, traces = _run(_sha_guest(b"forge me"))
    si = next(i for i, (a, _, _) in enumerate(traces)
              if isinstance(a, sha256_vm.Sha256VmAir))
    air, tr, _ = traces[si]
    bad = tr.copy()
    row = int(np.nonzero(bad[:, sha256_vm.IS_LAST])[0][0])
    bad[row, sha256_vm.DIG] ^= 1
    broken = (
        debug.check_constraints(air, bad, []) != []
        or debug.check_bus_balance(
            [(a, t if i != si else bad) for i, (a, t, _) in
             enumerate(traces)],
            {i: p for i, (_, _, p) in enumerate(traces)}) != {}
    )
    assert broken


def test_sha256_block_aligned_forgery_breaks():
    """Round-4 advisor forgery: for a block-aligned message, moving
    has_end onto the last FULL block (rem = 64 also satisfies the length
    binding) skips the 0x80 terminator. The rem <= 63 pin (has_end *
    p[63] = 0) must reject it."""
    _, traces = _run(_sha_guest(b"\x11" * 64))
    si = next(i for i, (a, _, _) in enumerate(traces)
              if isinstance(a, sha256_vm.Sha256VmAir))
    air, tr, _ = traces[si]
    bad = tr.copy()
    # honest: block 0 full message (rem=64), block 1 has_end+last (rem=0)
    assert bad[1, sha256_vm.HAS_END] == 1 and bad[0, sha256_vm.HAS_END] == 0
    bad[0, sha256_vm.HAS_END] = 1
    bad[1, sha256_vm.HAS_END] = 0
    # the attacker drops the terminator from the length-only block to
    # keep the absorption constraints locally consistent
    bad[1, sha256_vm.ABS] = 0
    assert debug.check_constraints(air, bad, []) != []


def test_modop_noncanonical_result_breaks():
    """Round-4 advisor forgery: modadd with q=0 writes r = x + y >= m
    (a non-canonical representative) to RAM; the in-chip r < m borrow
    chain must reject it even with the attacker's best chain witness."""
    m = SUPPORTED_MODULI[0]
    x, y = m - 5, m - 3
    body = _store256(x, BASE) + _store256(y, BASE + 32)
    body += asm.modop(BASE + 64, BASE, BASE + 32, asm.MODOP_ADD, 0)
    body += asm.halt(0)
    _, traces = _run(asm.assemble(body))
    mi = next(i for i, (a, _, _) in enumerate(traces)
              if isinstance(a, vm_ext.ModularVmAir))
    air, tr, _ = traces[mi]
    bad = tr.copy()
    forged = x + y  # = honest r + m, still a 32-limb value
    c = 1
    for k in range(vm_ext.N_LIMBS):
        bad[0, vm_ext.RES + k] = (forged >> (8 * k)) & 0xFF
        # greedy borrow-chain witness for d = m - 1 - forged (mod 2^256)
        t = ((m >> (8 * k)) & 0xFF) - int(bad[0, vm_ext.RES + k]) - c
        c = 1 if t < 0 else 0
        bad[0, vm_ext.CMP_D + k] = t + 256 if t < 0 else t
        if k < vm_ext.N_LIMBS - 1:
            bad[0, vm_ext.CMP_BW + k] = c
    # forged >= m needs a final borrow the chain cannot emit
    assert c == 1
    assert debug.check_constraints(air, bad, []) != []


def test_sha256_skipped_terminator_breaks():
    """Clearing HAS_END (no 0x80 binding) must violate constraints."""
    _, traces = _run(_sha_guest(b"no terminator"))
    si = next(i for i, (a, _, _) in enumerate(traces)
              if isinstance(a, sha256_vm.Sha256VmAir))
    air, tr, _ = traces[si]
    bad = tr.copy()
    row = int(np.nonzero(bad[:, sha256_vm.HAS_END])[0][0])
    bad[row, sha256_vm.HAS_END] = 0
    assert debug.check_constraints(air, bad, []) != []


# --- fp2 -------------------------------------------------------------------


def _store_fp2(c0, c1, addr):
    return _store256(c0, addr) + _store256(c1, addr + 32)


@pytest.mark.parametrize("mi", [0, 1])
def test_fp2_ops(mi):
    """Fp2 mul/add/sub (ECALL a7=9) over Fp[u]/(u^2+1) — openvm fp2
    extension parity (chunk-circuit openvm.toml Bn254Fp2)."""
    m = SUPPORTED_MODULI[mi]
    x0, x1 = 0xAAA1 * 3**40 % m, 0xBBB2 * 5**33 % m
    y0, y1 = 0xCCC3 * 7**29 % m, 0xDDD4 * 11**23 % m
    body = _store_fp2(x0, x1, BASE) + _store_fp2(y0, y1, BASE + 64)
    body += asm.fp2op(BASE + 128, BASE, BASE + 64, asm.FP2_MUL, mi)
    body += asm.fp2op(BASE + 192, BASE, BASE + 64, asm.FP2_ADD, mi)
    body += asm.fp2op(BASE + 256, BASE, BASE + 64, asm.FP2_SUB, mi)
    for j, off in enumerate((128, 192, 256)):
        body += _reveal_word(BASE + off, j)          # r0 low word
        body += _reveal_word(BASE + off + 32, j + 3)  # r1 low word
    body += asm.halt(0)
    ex, traces = _run(asm.assemble(body))
    pvs = ex.public_values()
    assert pvs[0] == (x0 * y0 - x1 * y1) % m & 0xFFFFFFFF
    assert pvs[3] == (x0 * y1 + x1 * y0) % m & 0xFFFFFFFF
    assert pvs[1] == (x0 + y0) % m & 0xFFFFFFFF
    assert pvs[4] == (x1 + y1) % m & 0xFFFFFFFF
    assert pvs[2] == (x0 - y0) % m & 0xFFFFFFFF
    assert pvs[5] == (x1 - y1) % m & 0xFFFFFFFF
    _check_all(traces)


def test_fp2_forged_result_breaks():
    from zkvm_prover_tpu.models import fp2_vm

    m = SUPPORTED_MODULI[0]
    body = _store_fp2(123, 456, BASE) + _store_fp2(789, 321, BASE + 64)
    body += asm.fp2op(BASE + 128, BASE, BASE + 64, asm.FP2_MUL, 0)
    body += asm.halt(0)
    _, traces = _run(asm.assemble(body))
    fi = next(i for i, (a, _, _) in enumerate(traces)
              if isinstance(a, fp2_vm.Fp2VmAir))
    air, tr, _ = traces[fi]
    bad = tr.copy()
    bad[0, fp2_vm.RES] ^= 1
    broken = (
        debug.check_constraints(air, bad, []) != []
        or debug.check_bus_balance(
            [(a, t if i != fi else bad) for i, (a, t, _) in
             enumerate(traces)],
            {i: p for i, (_, _, p) in enumerate(traces)}) != {}
    )
    assert broken


# --- end-to-end machine proof ---------------------------------------------


def test_prove_verify_ext_guest():
    """One guest exercising all three extension syscalls, proven and
    verified at the TINY config."""
    m = SUPPORTED_MODULI[2]
    g = K1.generator()
    g2 = K1.mul(2, g)
    body = _store256(g[0], BASE) + _store256(g[1], BASE + 32)
    body += asm.modop(BASE + 64, BASE, BASE + 32, asm.MODOP_MUL, 2)
    body += _store_point(g, BASE + 128) + _store_point(g2, BASE + 192)
    body += asm.ec_add(BASE + 256, BASE + 128, BASE + 192, 2)
    body += asm.sha256(BASE + 256, 64, BASE + 0x400)
    body += _reveal_word(BASE + 0x400, 0)
    body += asm.halt(0)
    ex, traces = _run(asm.assemble(body))
    x3y3 = b"".join(ex.load_mem32(BASE + 256 + 4 * i).to_bytes(4, "little")
                    for i in range(16))
    expect = hashlib.sha256(x3y3).digest()
    assert ex.public_values()[0] == int.from_bytes(expect[:4], "little")

    instances = [machine.AirInstance(a, t, p) for a, t, p in traces]
    proof = machine.prove_machine(instances, TINY)
    assert machine.verify_machine([a for a, _, _ in traces], proof, TINY)


# --- ec_double -------------------------------------------------------------


def test_ec_double_secp256k1():
    g = K1.generator()
    g2 = K1.mul(2, g)
    body = _store_point(g, BASE)
    body += asm.ec_double(BASE + 64, BASE, 2)
    body += _reveal_word(BASE + 64, 0)
    body += asm.halt(0)
    ex, traces = _run(asm.assemble(body))
    x3 = sum(ex.load_mem32(BASE + 64 + 4 * i) << (32 * i) for i in range(8))
    y3 = sum(ex.load_mem32(BASE + 96 + 4 * i) << (32 * i) for i in range(8))
    assert (x3, y3) == g2
    _check_all(traces)


def test_ec_double_then_add_matches_triple():
    """2G (double) + G (add) == 3G, both syscalls in one guest."""
    g = K1.generator()
    g3 = K1.mul(3, g)
    body = _store_point(g, BASE)
    body += asm.ec_double(BASE + 64, BASE, 2)
    body += asm.ec_add(BASE + 128, BASE + 64, BASE, 2)
    body += asm.halt(0)
    ex, traces = _run(asm.assemble(body))
    x = sum(ex.load_mem32(BASE + 128 + 4 * i) << (32 * i) for i in range(8))
    y = sum(ex.load_mem32(BASE + 160 + 4 * i) << (32 * i) for i in range(8))
    assert (x, y) == g3
    _check_all(traces)


def test_ec_double_forged_result_breaks():
    from zkvm_prover_tpu.models.vm_ext import D_RES, EcDoubleVmAir

    g = K1.generator()
    body = _store_point(g, BASE)
    body += asm.ec_double(BASE + 64, BASE, 2)
    body += asm.halt(0)
    _, traces = _run(asm.assemble(body))
    di = next(i for i, (a, _, _) in enumerate(traces)
              if isinstance(a, EcDoubleVmAir))
    air, tr, _ = traces[di]
    bad = tr.copy()
    bad[0, D_RES] ^= 1
    broken = (
        debug.check_constraints(air, bad, []) != []
        or debug.check_bus_balance(
            [(a, t if i != di else bad) for i, (a, t, _) in
             enumerate(traces)],
            {i: p for i, (_, _, p) in enumerate(traces)}) != {}
    )
    assert broken

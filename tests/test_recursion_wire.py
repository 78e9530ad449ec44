"""Wire-circuit machine: the execution substrate for in-circuit recursion.

Covers: SSA wire bus soundness (fanout/use balancing), ALU op constraints,
Poseidon2 wiring, public-value binding, bit decomposition canonicity, and
tamper rejection at the proof level.
"""

import numpy as np
import pytest

from zkvm_prover_tpu.fields import babybear as bb
from zkvm_prover_tpu.recursion import CircuitBuilder
from zkvm_prover_tpu.stark import debug, machine
from zkvm_prover_tpu.stark.config import fast_test_config
from zkvm_prover_tpu.utils import ext_np

P = bb.P


def check_all(instances):
    pairs = [(i.air, i.trace) for i in instances]
    pvs_map = {k: inst.public_values for k, inst in enumerate(instances)}
    for inst in instances:
        errs = debug.check_constraints(inst.air, inst.trace,
                                       inst.public_values)
        assert errs == [], errs
    assert debug.check_bus_balance(pairs, pvs_map) == {}


def test_alu_arith_and_bus():
    bld = CircuitBuilder()
    a = bld.const(7)
    b = bld.const([1, 2, 3, 4])
    c = bld.mul(a, b)
    d = bld.add(c, bld.sub(b, a))
    expect = ext_np.add(ext_np.mul((7, 0, 0, 0), (1, 2, 3, 4)),
                        ext_np.sub((1, 2, 3, 4), (7, 0, 0, 0)))
    assert list(d.value) == [v % P for v in expect]
    bld.assert_eq(d, bld.witness(d.value))
    check_all(bld.finalize())


def test_poseidon_matches_reference_permutation():
    from zkvm_prover_tpu.models.poseidon2_air import permute_canonical

    bld = CircuitBuilder()
    state = [bld.const(i + 1) for i in range(16)]
    outs = bld.poseidon(state)
    ref = permute_canonical(
        np.arange(1, 17, dtype=np.uint32)[None, :]
    )[0]
    assert [w.base for w in outs] == [int(v) for v in ref]
    # consume outputs
    for w in outs:
        bld.assert_eq(w, bld.witness(w.base))
    check_all(bld.finalize())


def test_public_binding_and_select():
    bld = CircuitBuilder(n_public_slots=1)
    x = bld.const(5)
    y = bld.const(9)
    b1 = bld.bit_witness(1)
    sel = bld.select(b1, x, y)          # = 5
    pv = bld.set_public(0, (5, 0, 0, 0))
    bld.assert_eq(sel, pv)
    instances = bld.finalize()
    check_all(instances)
    assert instances[2].public_values == [5, 0, 0, 0]


def test_bit_decomposition_canonical():
    bld = CircuitBuilder()
    v = P - 3
    w = bld.witness(v)
    bits = bld.decompose_bits(w, 31)
    assert [b.base for b in bits[:4]] == [(v >> i) & 1 for i in range(4)]
    # keep wires used
    bld.assert_zero(bld.mul(bld.bits_to_value(bits), bld.const(0)))
    check_all(bld.finalize())


def test_inverse_gadget():
    bld = CircuitBuilder()
    a = bld.const([3, 1, 4, 1])
    ia = bld.inv(a)
    assert list(ext_np.mul(a.value, ia.value)) == [1, 0, 0, 0]
    bld.assert_eq(bld.mul(a, ia), bld.one())
    check_all(bld.finalize())


def test_forged_wire_value_unbalances_bus():
    """Changing a wire's value at a use site must break the wire bus."""
    bld = CircuitBuilder()
    a = bld.const(7)
    b = bld.const(6)
    c = bld.mul(a, b)
    bld.assert_eq(c, bld.witness(42))
    instances = bld.finalize()
    check_all(instances)

    # tamper: at the mul row, claim in1 = 8 (and fix out so the op holds)
    from zkvm_prover_tpu.recursion.wire_air import WireAluAir

    tr = instances[0].trace.copy()
    # row 2 is the mul (rows: const 7, const 6, mul, wit, sub, az)
    assert instances[0].air.program[2, WireAluAir.P_OP + 2] == 1  # OP_MUL
    tr[2, WireAluAir.IN1] = 8
    tr[2, WireAluAir.OUT] = 48
    tampered = [machine.AirInstance(instances[0].air, tr, [])] + list(
        instances[1:]
    )
    pairs = [(i.air, i.trace) for i in tampered]
    pvs_map = {k: inst.public_values for k, inst in enumerate(tampered)}
    assert debug.check_bus_balance(pairs, pvs_map) != {}


def test_prove_verify_and_tamper():
    bld = CircuitBuilder(n_public_slots=1)
    a = bld.const(3)
    acc = a
    for _ in range(4):
        acc = bld.mul(acc, acc)
    state = [acc] + [bld.const(0)] * 15
    outs = bld.poseidon(state)
    digest = bld.pack_ext(outs[:4])
    for w in outs[4:]:
        bld.assert_zero(bld.mul(w, bld.const(0)))
    pv = bld.set_public(0, digest.value)
    bld.assert_eq(digest, pv)
    instances = bld.finalize()
    check_all(instances)

    cfg = fast_test_config()
    proof = machine.prove_machine(instances, cfg)
    airs = [i.air for i in instances]
    assert machine.verify_machine(airs, proof, cfg)

    # tampering with the claimed public digest must fail verification
    import copy

    bad = copy.deepcopy(proof)
    ln, w, pvs = bad.meta[2]
    pvs = list(pvs)
    pvs[0] = (pvs[0] + 1) % P
    bad.meta[2] = (ln, w, pvs)
    assert not machine.verify_machine(airs, bad, cfg)

    # swapping the program (preprocessed) must fail: vk binding
    bld2 = CircuitBuilder(n_public_slots=1)
    a2 = bld2.const(4)
    acc2 = a2
    for _ in range(4):
        acc2 = bld2.mul(acc2, acc2)
    st2 = [acc2] + [bld2.const(0)] * 15
    outs2 = bld2.poseidon(st2)
    dg2 = bld2.pack_ext(outs2[:4])
    for w2 in outs2[4:]:
        bld2.assert_zero(bld2.mul(w2, bld2.const(0)))
    bld2.assert_eq(dg2, bld2.set_public(0, dg2.value))
    other = bld2.finalize()
    other_airs = [i.air for i in other]
    assert not machine.verify_machine(other_airs, proof, cfg)

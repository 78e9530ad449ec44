"""Straight-line wire-program builder + witness evaluator.

The same build pass produces (a) the preprocessed program tables (vk
material — a pure function of the *shape* of the verified object) and (b)
the concrete wire values (the witness — a function of the actual proof
bytes). Witness inputs enter through `witness()` thunks so that building
against a dummy proof oracle yields the identical program with garbage
values (used to derive the vk without any proof in hand).

All values are canonical BabyBear^4 tuples; base values ride lane 0.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..fields import babybear as bb
from ..models.poseidon2_air import Poseidon2Air
from ..ops import poseidon2 as p2
from ..stark.machine import AirInstance
from ..utils import ext_np
from .wire_air import (
    N_OPS,
    OP_ADD,
    OP_AZ,
    OP_BIT,
    OP_CONST,
    OP_MUL,
    OP_SUB,
    OP_WIT,
    PublicBindAir,
    WireAluAir,
    WirePoseidonAir,
)

P = bb.P
ExtVal = Tuple[int, int, int, int]


def _ext(v) -> ExtVal:
    if isinstance(v, (int, np.integer)):
        return (int(v) % P, 0, 0, 0)
    t = tuple(int(x) % P for x in v)
    assert len(t) == 4
    return t  # type: ignore


@dataclass(frozen=True)
class Wire:
    id: int
    value: ExtVal

    @property
    def base(self) -> int:
        return self.value[0]


@dataclass
class _AluRow:
    op: int
    wout: int
    win1: int
    win2: int
    const: ExtVal
    in1: ExtVal
    in2: ExtVal
    out: ExtVal


class CircuitBuilder:
    """Records wire ops with eagerly computed concrete values."""

    def __init__(self, n_public_slots: int = 0):
        self.n_public_slots = n_public_slots
        self._next_id = n_public_slots + 1
        self._alu: List[_AluRow] = []
        self._pose: List[Tuple[List[int], List[int], List[ExtVal],
                               List[ExtVal]]] = []
        self._uses: Dict[int, int] = {}
        self._consts: Dict[ExtVal, Wire] = {}
        self._public_wires: List[Optional[Wire]] = [None] * n_public_slots
        self._public_vals: List[ExtVal] = [(0, 0, 0, 0)] * n_public_slots
        self._public_consumed = [False] * n_public_slots

    # -- wire allocation -------------------------------------------------
    def _new(self, value: ExtVal) -> Wire:
        w = Wire(self._next_id, value)
        self._next_id += 1
        return w

    def _use(self, w: Wire) -> int:
        if 1 <= w.id <= self.n_public_slots:
            s = w.id - 1
            assert not self._public_consumed[s], (
                f"public slot {s} consumed twice"
            )
            self._public_consumed[s] = True
        else:
            self._uses[w.id] = self._uses.get(w.id, 0) + 1
        return w.id

    # -- public values ---------------------------------------------------
    def set_public(self, slot: int, value) -> Wire:
        """Declare the value of public slot `slot`; returns its wire (must
        be consumed exactly once, typically by assert_eq against the
        recomputed value)."""
        v = _ext(value)
        assert self._public_wires[slot] is None, f"slot {slot} already set"
        w = Wire(slot + 1, v)
        self._public_wires[slot] = w
        self._public_vals[slot] = v
        return w

    # -- ops -------------------------------------------------------------
    def const(self, v) -> Wire:
        v = _ext(v)
        if v in self._consts:
            return self._consts[v]
        w = self._new(v)
        self._alu.append(_AluRow(OP_CONST, w.id, 0, 0, v,
                                 (0, 0, 0, 0), (0, 0, 0, 0), v))
        self._consts[v] = w
        return w

    def witness(self, value) -> Wire:
        v = _ext(value)
        w = self._new(v)
        self._alu.append(_AluRow(OP_WIT, w.id, 0, 0, (0, 0, 0, 0),
                                 (0, 0, 0, 0), (0, 0, 0, 0), v))
        return w

    def bit_witness(self, value: int) -> Wire:
        v = (int(value) & 1, 0, 0, 0)
        w = self._new(v)
        self._alu.append(_AluRow(OP_BIT, w.id, 0, 0, (0, 0, 0, 0),
                                 (0, 0, 0, 0), (0, 0, 0, 0), v))
        return w

    def _binop(self, op: int, a: Wire, b: Wire, out_val: ExtVal) -> Wire:
        w = self._new(out_val)
        self._alu.append(_AluRow(op, w.id, self._use(a), self._use(b),
                                 (0, 0, 0, 0), a.value, b.value, out_val))
        return w

    def add(self, a: Wire, b: Wire) -> Wire:
        return self._binop(OP_ADD, a, b, _ext(ext_np.add(a.value, b.value)))

    def sub(self, a: Wire, b: Wire) -> Wire:
        return self._binop(OP_SUB, a, b, _ext(ext_np.sub(a.value, b.value)))

    def mul(self, a: Wire, b: Wire) -> Wire:
        return self._binop(OP_MUL, a, b, _ext(ext_np.mul(a.value, b.value)))

    def assert_zero(self, a: Wire) -> None:
        self._alu.append(_AluRow(OP_AZ, 0, self._use(a), 0, (0, 0, 0, 0),
                                 a.value, (0, 0, 0, 0), (0, 0, 0, 0)))

    def assert_eq(self, a: Wire, b: Wire) -> None:
        self.assert_zero(self.sub(a, b))

    def poseidon(self, state: Sequence[Wire]) -> List[Wire]:
        """Full width-16 Poseidon2 permutation (base-valued wires)."""
        assert len(state) == 16
        inp = np.array([[w.base for w in state]], dtype=np.uint32)
        out_vals = p2.from_monty_np(
            p2.permute_np(p2.to_monty_np(inp))
        )[0]
        outs = [self._new((int(v), 0, 0, 0)) for v in out_vals]
        self._pose.append((
            [self._use(w) for w in state],
            [w.id for w in outs],
            [w.value for w in state],
            [w.value for w in outs],
        ))
        return outs

    # -- composite helpers ------------------------------------------------
    def zero(self) -> Wire:
        return self.const(0)

    def one(self) -> Wire:
        return self.const(1)

    def select(self, b: Wire, x: Wire, y: Wire) -> Wire:
        """b ? x : y  (b boolean)."""
        return self.add(y, self.mul(b, self.sub(x, y)))

    def inv(self, a: Wire) -> Wire:
        """Witnessed inverse with a*inv == 1 check (a must be nonzero for a
        satisfying witness to exist)."""
        v = a.value
        if any(v):
            iv = _ext(ext_np.inv(list(v)))
        else:
            iv = (0, 0, 0, 0)  # dummy-build path; constraint unsatisfiable
        w = self.witness(iv)
        self.assert_eq(self.mul(a, w), self.one())
        return w

    def decompose_bits(self, a: Wire, n_bits: int = 31,
                       canonical: bool = True) -> List[Wire]:
        """Split a base wire into `n_bits` boolean wires (LSB first),
        asserting the recomposition equals `a`. With `canonical`, also
        asserts the bit pattern is < P (unique representation): P =
        15*2^27 + 1, so value >= P iff bits 27..30 are all set and the low
        27 bits are nonzero."""
        x = a.base
        bits = [self.bit_witness((x >> i) & 1) for i in range(n_bits)]
        acc = None
        lo27 = None
        for i, b in enumerate(bits):
            term = b if i == 0 else self.mul(self.const(1 << i), b)
            acc = term if acc is None else self.add(acc, term)
            if i == 26:
                lo27 = acc
        self.assert_eq(acc, a)
        if canonical:
            assert n_bits == 31 and lo27 is not None
            hi = self.mul(self.mul(bits[27], bits[28]),
                          self.mul(bits[29], bits[30]))
            self.assert_zero(self.mul(hi, lo27))
        return bits

    def bits_to_value(self, bits: Sequence[Wire]) -> Wire:
        acc = None
        for i, b in enumerate(bits):
            term = b if i == 0 else self.mul(self.const(1 << i), b)
            acc = term if acc is None else self.add(acc, term)
        return acc if acc is not None else self.zero()

    def pack_ext(self, lanes: Sequence[Wire]) -> Wire:
        """Combine 4 base wires into one ext wire."""
        assert len(lanes) == 4
        acc = lanes[0]
        for k in range(1, 4):
            unit = [0, 0, 0, 0]
            unit[k] = 1
            acc = self.add(acc, self.mul(self.const(tuple(unit)), lanes[k]))
        return acc

    # -- finalize ---------------------------------------------------------
    def finalize(self, min_alu_rows: int = 4, min_pose_rows: int = 4,
                 fixed_alu_rows: Optional[int] = None,
                 fixed_pose_rows: Optional[int] = None):
        """Compile to AIR instances:
        [WireAluAir, WirePoseidonAir, PublicBindAir?, Poseidon2Air].

        fixed_*_rows pin trace heights (recursion over fixed shapes).
        """
        for s, w in enumerate(self._public_wires):
            if w is not None:
                assert self._public_consumed[s], (
                    f"public slot {s} never consumed"
                )

        A = WireAluAir
        n_alu = len(self._alu)
        h_alu = fixed_alu_rows or max(
            min_alu_rows, 1 << max(0, (n_alu - 1)).bit_length()
        )
        assert h_alu >= n_alu, "fixed_alu_rows too small"
        prog_a = np.zeros((h_alu, A.preprocessed_width), dtype=np.uint32)
        main_a = np.zeros((h_alu, A.width), dtype=np.uint32)
        for r, row in enumerate(self._alu):
            prog_a[r, A.P_OP + row.op] = 1
            prog_a[r, A.P_WOUT] = row.wout
            prog_a[r, A.P_WIN1] = row.win1
            prog_a[r, A.P_WIN2] = row.win2
            prog_a[r, A.P_USE1] = 1 if row.op in (
                OP_ADD, OP_SUB, OP_MUL, OP_AZ) else 0
            prog_a[r, A.P_USE2] = 1 if row.op in (
                OP_ADD, OP_SUB, OP_MUL) else 0
            prog_a[r, A.P_FAN] = self._uses.get(row.wout, 0)
            prog_a[r, A.P_CONST:A.P_CONST + 4] = row.const
            main_a[r, A.IN1:A.IN1 + 4] = row.in1
            main_a[r, A.IN2:A.IN2 + 4] = row.in2
            main_a[r, A.OUT:A.OUT + 4] = row.out

        PO = WirePoseidonAir
        n_pose = len(self._pose)
        h_pose = fixed_pose_rows or max(
            min_pose_rows, 1 << max(0, (n_pose - 1)).bit_length()
        )
        assert h_pose >= n_pose, "fixed_pose_rows too small"
        prog_p = np.zeros((h_pose, PO.preprocessed_width), dtype=np.uint32)
        main_p = np.zeros((h_pose, PO.width), dtype=np.uint32)
        pose_inputs = []
        for r, (win, wout, vin, vout) in enumerate(self._pose):
            prog_p[r, PO.P_REAL] = 1
            prog_p[r, PO.P_WIN:PO.P_WIN + 16] = win
            prog_p[r, PO.P_WOUT:PO.P_WOUT + 16] = wout
            prog_p[r, PO.P_FAN:PO.P_FAN + 16] = [
                self._uses.get(w, 0) for w in wout
            ]
            main_p[r, PO.VIN:PO.VIN + 16] = [v[0] for v in vin]
            main_p[r, PO.VOUT:PO.VOUT + 16] = [v[0] for v in vout]
            pose_inputs.append([v[0] for v in vin])

        # Poseidon2 lookup table: ONE ROW PER CALL (no dedup) so the table
        # height is a pure function of the program — shape stability is vk
        # material for recursion over recursion proofs (a dummy-oracle
        # build would otherwise collapse duplicate all-zero states and
        # produce a different machine shape than a real proof).
        if pose_inputs:
            p_in = np.array(pose_inputs, dtype=np.uint32)
        else:
            p_in = np.zeros((0, 16), dtype=np.uint32)
        p_mf = np.ones(len(p_in), dtype=np.uint32)
        p_tr = Poseidon2Air.generate_trace(
            p_in, np.zeros(len(p_in), dtype=np.uint32), p_mf
        )

        instances = [
            AirInstance(WireAluAir(prog_a), main_a, []),
            AirInstance(WirePoseidonAir(prog_p), main_p, []),
        ]
        if self.n_public_slots:
            pvs = [v for slot in self._public_vals for v in slot]
            instances.append(AirInstance(
                PublicBindAir(self.n_public_slots),
                PublicBindAir.trace(), pvs,
            ))
        instances.append(AirInstance(Poseidon2Air(), p_tr, []))
        return instances

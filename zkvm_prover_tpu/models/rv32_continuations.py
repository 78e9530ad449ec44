"""Continuations: segment-parallel RV32 proofs with persistent memory.

The TPU-native analog of openvm's continuations layer (reference: guest
execution split into segments, each proven independently, with memory state
carried across segments as a Poseidon2 Merkle commitment — SURVEY.md §2.2
"RISC-V VM executor + continuations", §2.3 "Segment parallelism": the
dominant scale-out axis).

Design:
- The guest runs in the native executor with a per-segment cycle budget;
  PAUSED segments snapshot boundary state (pc, registers, first-touch memory
  old/new values — native/vm/rv32im.cpp `vm_begin_segment`).
- Registers and data RAM live in ONE persistent Merkle tree (leaves
  0..31 = x0..x31, leaves 32.. = data words at `data_base + 4*(leaf-32)`),
  depth `DEPTH`. A leaf digest embeds the word's 4 byte-limbs in digest
  lanes 0..3. Segment public values carry the pre/post roots.
- In-segment consistency stays offline memory checking (REG_BUS/MEM_BUS,
  per-segment timestamps restarting at 1 — this is what bounds segment
  length and makes 24-bit ts-diff range checks sound).
- `MemoryBoundaryAirV3` opens every touched cell at ts 0 with its WITNESSED
  pre-segment value and closes at the final (ts, value), and emits the
  (leaf, old, new) level-0 message into the Merkle update argument.
- `MemoryMerkleAir` consumes leaf updates and proves the path
  recomputation old_root -> new_root, one tree node per row, hashing via
  logUp queries to `Poseidon2Air` (models/poseidon2_air.py).
- `ExecBoundaryAirV3` opens the execution bus at the witnessed initial pc
  (bound to public values) instead of pc=0.

Chain verification (`verify_chain`) = per-segment machine verification +
boundary chaining: final_root[i] == init_root[i+1], final_pc[i] ==
init_pc[i+1], halt only in the last segment, user PVs revealed exactly once
across the chain (the reference's all-zero-PV precheck analog).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..fields import babybear as bb
from ..stark import machine
from ..vm.executor import HALTED, PAUSED, Rv32Executor
from . import rv32_v2 as v2
from .air import Air, AirBuilder
from .poseidon2_air import (
    POSEIDON_BUS,
    Poseidon2Air,
    compress_canonical,
)
from .rv32_v0 import BYTE_BUS, REG_BUS
from .rv32_v2 import EXEC_BUS, MEM_BUS, N_LIMBS, _limbs

MERKLE_BUS = 30

DEPTH = 17            # default 2^17 leaves: 32 regs + ~2^16 data words;
                      # the boundary AIR's 3-limb offset supports any
                      # depth <= 24 (64 MiB) — pass `depth=` through
N_REG_LEAVES = 32


def leaf_of_addr(addr: int, data_base: int) -> int:
    return N_REG_LEAVES + (addr - data_base) // 4


def embed_word(word: int) -> np.ndarray:
    """Leaf digest of a memory word: 4 byte-limbs + 4 zero lanes."""
    d = np.zeros(8, dtype=np.uint32)
    d[:4] = _limbs(word)
    return d


# ---------------------------------------------------------------------------
# Host-side sparse Merkle tree over the persistent memory state
# ---------------------------------------------------------------------------


class MemState:
    """Persistent memory state: {leaf: word} with sparse root/digest calc."""

    def __init__(self, depth: int = DEPTH):
        self.depth = depth
        self.words: Dict[int, int] = {}
        self._defaults = [embed_word(0)]
        for _ in range(depth):
            d = self._defaults[-1]
            self._defaults.append(
                compress_canonical(d[None, :], d[None, :])[0]
            )

    def copy(self) -> "MemState":
        m = MemState.__new__(MemState)
        m.depth = self.depth
        m.words = dict(self.words)
        m._defaults = self._defaults
        return m

    def node_digest(self, level: int, idx: int,
                    _cache: Optional[dict] = None) -> np.ndarray:
        """Digest of node `idx` at `level` (0 = leaves)."""
        cache = _cache if _cache is not None else {}
        return self._node(level, idx, cache)

    def _node(self, level: int, idx: int, cache: dict) -> np.ndarray:
        key = (level, idx)
        if key in cache:
            return cache[key]
        if level == 0:
            out = embed_word(self.words.get(idx, 0))
        else:
            # prune: if no stored leaf under this node, use the default
            lo = idx << level
            hi = (idx + 1) << level
            if not any(lo <= leaf < hi for leaf in self.words):
                out = self._defaults[level]
            else:
                left = self._node(level - 1, 2 * idx, cache)
                right = self._node(level - 1, 2 * idx + 1, cache)
                out = compress_canonical(left[None, :], right[None, :])[0]
        cache[key] = out
        return out

    def root(self) -> np.ndarray:
        return self.node_digest(self.depth, 0)


# ---------------------------------------------------------------------------
# AIRs
# ---------------------------------------------------------------------------


class ExecBoundaryAirV3(Air):
    """Execution-bus boundary with witnessed initial pc (continuations).
    pvs = [init_pc, final_pc, is_halted]."""

    IS_INIT = 0
    IS_FIN = 1
    FIN_PC = 2
    FIN_TS = 3
    INIT_PC = 4
    width = 5
    num_public_values = 3

    def eval(self, b: AirBuilder) -> None:
        E = ExecBoundaryAirV3
        is_init = b.local(E.IS_INIT)
        is_fin = b.local(E.IS_FIN)
        b.assert_bool(is_init)
        b.assert_bool(is_fin)
        b.when_first_row().assert_eq(is_init, b.constant(1))
        b.when_transition().assert_zero(b.next(E.IS_INIT))
        init_pc = b.local(E.INIT_PC)
        b.assert_zero(b.mul(is_init, b.sub(init_pc, b.public_value(0))))
        halted = b.public_value(2)
        b.assert_zero(b.mul(is_fin, halted))
        b.assert_zero(
            b.mul(is_fin, b.sub(b.local(E.FIN_PC), b.public_value(1)))
        )
        b.push_send(EXEC_BUS, [init_pc, b.constant(1)], is_init)
        b.push_receive(EXEC_BUS, [b.local(E.FIN_PC), b.local(E.FIN_TS)],
                       is_fin)


class MemoryBoundaryAirV3(Air):
    """Unified register/RAM segment boundary: opens each touched cell's
    offline-checking chain at (ts=0, witnessed init value), closes at the
    witnessed final (ts, value), and sends the (leaf, old-digest, new-digest)
    level-0 update into MERKLE_BUS. Register rows (IS_REG) use REG_BUS with
    leaf = register index (< 32 via the 8*leaf byte check); RAM rows use
    MEM_BUS with leaf = 32 + (addr - data_base)/4, offset range-checked to
    24 bits (2^24 data words — the reference's DEFERRAL_AS-scale
    capacity; crates/prover/src/prover/mod.rs:218-233 reserves 2^25
    cells)."""

    IS_REAL = 0
    IS_REG = 1
    LEAF = 2
    INIT_VAL = 3      # 4
    FINAL_VAL = 7     # 4
    FINAL_TS = 11
    OFF_LO = 12
    OFF_MID = 13
    OFF_HI = 14
    width = 15
    num_public_values = 0

    def __init__(self, data_base: int = 0x2000):
        self.data_base = data_base

    def eval(self, b: AirBuilder) -> None:
        C = MemoryBoundaryAirV3
        real = b.local(C.IS_REAL)
        is_reg = b.local(C.IS_REG)
        b.assert_bool(real)
        b.assert_bool(is_reg)
        b.assert_zero(b.mul(is_reg, b.sub(real, b.constant(1))))
        is_ram = b.sub(real, is_reg)

        leaf = b.local(C.LEAF)
        init = [b.local(C.INIT_VAL + k) for k in range(N_LIMBS)]
        fin = [b.local(C.FINAL_VAL + k) for k in range(N_LIMBS)]
        fin_ts = b.local(C.FINAL_TS)
        zero = b.constant(0)

        # registers: leaf < 32
        b.push_send(BYTE_BUS, [b.mul(b.constant(8), leaf)], is_reg)
        b.push_send(REG_BUS, [leaf, zero] + init, is_reg)
        b.push_receive(REG_BUS, [leaf, fin_ts] + fin, is_reg)

        # RAM: single-felt addr = data_base + 4*(leaf - 32), offset < 2^24
        # (three byte limbs: 2^24 data words = 64 MiB guest RAM, the
        # DEFERRAL_AS-scale capacity — addr stays under the MEM_BUS
        # injective-key bound data_base + 2^26 < 2^31 - 2^27)
        lo, mid, hi = (b.local(C.OFF_LO), b.local(C.OFF_MID),
                       b.local(C.OFF_HI))
        off = b.add(b.add(lo, b.mul(b.constant(256), mid)),
                    b.mul(b.constant(1 << 16), hi))
        b.push_send(BYTE_BUS, [lo], is_ram)
        b.push_send(BYTE_BUS, [mid], is_ram)
        b.push_send(BYTE_BUS, [hi], is_ram)
        b.assert_zero(b.mul(is_ram, b.sub(leaf, b.add(off, b.constant(
            N_REG_LEAVES)))))
        addr_val = b.add(b.constant(self.data_base),
                         b.mul(b.constant(4), off))
        b.push_send(MEM_BUS, [addr_val, zero] + init, is_ram)
        b.push_receive(MEM_BUS, [addr_val, fin_ts] + fin, is_ram)

        # level-0 Merkle leaf update
        b.push_send(
            MERKLE_BUS,
            [zero, leaf] + init + [zero] * 4 + fin + [zero] * 4,
            real,
        )


class MemoryMerkleAir(Air):
    """Merkle root transition argument: one touched tree node per row.
    Receives its touched children's (old, new) digests from MERKLE_BUS,
    witnesses untouched siblings (old == new enforced), proves the two
    compressions via POSEIDON_BUS, and sends its own (old, new) upward.
    Root rows bind to pvs = old_root(8) || new_root(8)."""

    IS_REAL = 0
    IS_ROOT = 1
    LEVEL = 2        # parent level (1..depth)
    PIDX = 3         # parent index at LEVEL
    LT = 4           # left child touched
    RT = 5
    OLD_L = 6        # 8
    NEW_L = 14       # 8
    OLD_R = 22       # 8
    NEW_R = 30       # 8
    OLD_P = 38       # 8
    NEW_P = 46       # 8
    width = 54
    num_public_values = 16

    def __init__(self, depth: int = DEPTH):
        self.depth = depth

    def eval(self, b: AirBuilder) -> None:
        C = MemoryMerkleAir
        real = b.local(C.IS_REAL)
        root = b.local(C.IS_ROOT)
        lt, rt = b.local(C.LT), b.local(C.RT)
        for f in (real, root, lt, rt):
            b.assert_bool(f)
        one = b.constant(1)
        for f in (root, lt, rt):
            b.assert_zero(b.mul(f, b.sub(real, one)))

        level, pidx = b.local(C.LEVEL), b.local(C.PIDX)
        old_l = [b.local(C.OLD_L + k) for k in range(8)]
        new_l = [b.local(C.NEW_L + k) for k in range(8)]
        old_r = [b.local(C.OLD_R + k) for k in range(8)]
        new_r = [b.local(C.NEW_R + k) for k in range(8)]
        old_p = [b.local(C.OLD_P + k) for k in range(8)]
        new_p = [b.local(C.NEW_P + k) for k in range(8)]

        # untouched children: witnessed sibling, unchanged across segment
        not_lt = b.sub(real, lt)
        not_rt = b.sub(real, rt)
        for k in range(8):
            b.assert_zero(b.mul(not_lt, b.sub(new_l[k], old_l[k])))
            b.assert_zero(b.mul(not_rt, b.sub(new_r[k], old_r[k])))

        child_level = b.sub(level, one)
        two_pidx = b.add(pidx, pidx)
        b.push_receive(MERKLE_BUS,
                       [child_level, two_pidx] + old_l + new_l, lt)
        b.push_receive(MERKLE_BUS,
                       [child_level, b.add(two_pidx, one)] + old_r + new_r,
                       rt)

        b.push_send(POSEIDON_BUS, old_l + old_r + old_p, real)
        b.push_send(POSEIDON_BUS, new_l + new_r + new_p, real)

        b.push_send(MERKLE_BUS, [level, pidx] + old_p + new_p,
                    b.sub(real, root))

        # Exactly one root row, pinned to row 0: without this, an all-padding
        # Merkle trace satisfies every constraint while the 16 root public
        # values float free (forged memory-state transition). A no-touch
        # segment proves old_root == new_root via a root row with lt=rt=0.
        b.when_first_row().assert_eq(root, one)
        b.when_transition().assert_zero(b.next(C.IS_ROOT))
        b.assert_zero(b.mul(root, b.sub(level, b.constant(self.depth))))
        b.assert_zero(b.mul(root, pidx))
        for k in range(8):
            b.assert_zero(b.mul(root, b.sub(old_p[k], b.public_value(k))))
            b.assert_zero(b.mul(root, b.sub(new_p[k],
                                            b.public_value(8 + k))))


# ---------------------------------------------------------------------------
# Host-side trace generation
# ---------------------------------------------------------------------------


@dataclass
class SegmentWitness:
    """Boundary state + execution records for one segment."""
    records: np.ndarray
    init_pc: int
    final_pc: int
    init_regs: np.ndarray          # (32,) before the segment
    final_regs: np.ndarray
    touched_ram: np.ndarray        # (n, 3): word_addr, old, new
    halted: bool
    pre_state: MemState            # persistent memory before the segment
    post_state: MemState


def execute_segments(program_words, max_cycles_per_segment: int,
                     hints: bytes = b"", data_base: int = 0x2000,
                     depth: int = DEPTH,
                     max_segments: int = 64) -> List[SegmentWitness]:
    """Run the guest to completion in bounded segments, snapshotting the
    persistent-memory state at every boundary."""
    ex = Rv32Executor()
    ex.load_program(program_words)
    if hints:
        ex.set_hints(hints)
    state = MemState(depth)
    segments: List[SegmentWitness] = []
    for _ in range(max_segments):
        init_pc = ex.pc
        init_regs = np.array([ex.get_reg(r) for r in range(32)],
                             dtype=np.uint32)
        ex.begin_segment()
        run_state = ex.run(max_cycles_per_segment)
        assert run_state in (HALTED, PAUSED), f"guest trapped ({run_state})"
        records = ex.records()
        touched = ex.touched()
        final_regs = np.array([ex.get_reg(r) for r in range(32)],
                              dtype=np.uint32)
        post = state.copy()
        for r in range(32):
            if final_regs[r] != init_regs[r]:
                post.words[r] = int(final_regs[r])
        for addr, _old, new in touched:
            post.words[leaf_of_addr(int(addr), data_base)] = int(new)
        segments.append(SegmentWitness(
            records=records, init_pc=init_pc, final_pc=ex.pc,
            init_regs=init_regs, final_regs=final_regs,
            touched_ram=touched, halted=(run_state == HALTED),
            pre_state=state, post_state=post,
        ))
        state = post
        if run_state == HALTED:
            return segments
    raise RuntimeError("max_segments exceeded")


def _merkle_rows(seg: SegmentWitness, touched_leaves: Dict[int, Tuple[int, int]],
                 depth: int):
    """Touched-subtree update rows + the Poseidon2 query list.

    Returns (rows, poseidon_inputs, poseidon_mults): rows are dicts of
    column values; inputs is (m, 16) canonical with per-input multiplicity.
    """
    pre_cache: dict = {}
    C = MemoryMerkleAir
    rows = []
    pose: Dict[bytes, Tuple[np.ndarray, int]] = {}

    def query(left: np.ndarray, right: np.ndarray) -> np.ndarray:
        inp = np.concatenate([left, right]).astype(np.uint32)
        key = inp.tobytes()
        if key in pose:
            prev_inp, cnt = pose[key]
            pose[key] = (prev_inp, cnt + 1)
            out = compress_canonical(left[None, :], right[None, :])[0]
            return out
        out = compress_canonical(left[None, :], right[None, :])[0]
        pose[key] = (inp, 1)
        return out

    current: Dict[int, Tuple[np.ndarray, np.ndarray]] = {
        leaf: (embed_word(old), embed_word(new))
        for leaf, (old, new) in touched_leaves.items()
    }
    for level in range(1, depth + 1):
        parents: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
        for pidx in sorted({i >> 1 for i in current}):
            row = np.zeros(C.width, dtype=np.uint32)
            row[C.IS_REAL] = 1
            row[C.LEVEL] = level
            row[C.PIDX] = pidx
            kids = []
            for side, cidx in ((0, 2 * pidx), (1, 2 * pidx + 1)):
                if cidx in current:
                    old_d, new_d = current[cidx]
                    row[C.LT if side == 0 else C.RT] = 1
                else:
                    old_d = seg.pre_state.node_digest(level - 1, cidx,
                                                      pre_cache)
                    new_d = old_d
                kids.append((old_d, new_d))
                base_o = C.OLD_L if side == 0 else C.OLD_R
                base_n = C.NEW_L if side == 0 else C.NEW_R
                row[base_o:base_o + 8] = old_d
                row[base_n:base_n + 8] = new_d
            old_p = query(kids[0][0], kids[1][0])
            new_p = query(kids[0][1], kids[1][1])
            row[C.OLD_P:C.OLD_P + 8] = old_p
            row[C.NEW_P:C.NEW_P + 8] = new_p
            if level == depth:
                row[C.IS_ROOT] = 1
            rows.append(row)
            parents[pidx] = (old_p, new_p)
        current = parents

    if not touched_leaves:
        # No-touch segment: emit the mandatory root row (lt=rt=0) proving
        # old_root == new_root over the untouched children.
        row = np.zeros(C.width, dtype=np.uint32)
        row[C.IS_REAL] = 1
        row[C.IS_ROOT] = 1
        row[C.LEVEL] = depth
        left = seg.pre_state.node_digest(depth - 1, 0, pre_cache)
        right = seg.pre_state.node_digest(depth - 1, 1, pre_cache)
        root_d = query(left, right)
        query(left, right)  # new_p compression (same input, mult 2)
        for base in (C.OLD_L, C.NEW_L):
            row[base:base + 8] = left
        for base in (C.OLD_R, C.NEW_R):
            row[base:base + 8] = right
        for base in (C.OLD_P, C.NEW_P):
            row[base:base + 8] = root_d
        rows.append(row)

    # AIR pins the root row to row 0 (exactly-one-root constraint)
    rows.sort(key=lambda r: -int(r[C.IS_ROOT]))

    inputs = np.array([v[0] for v in pose.values()], dtype=np.uint32)
    mults = np.array([v[1] for v in pose.values()], dtype=np.uint32)
    if len(inputs) == 0:
        inputs = np.zeros((0, 16), dtype=np.uint32)
        mults = np.zeros(0, dtype=np.uint32)
    return rows, inputs, mults


def generate_segment_traces(program_words, seg: SegmentWitness,
                            data_base: int = 0x2000, depth: int = DEPTH):
    """All AIR traces for one segment. Returns (air, trace, pvs) triples in
    the canonical segment order."""
    init_ram = {int(a): int(old) for a, old, _ in seg.touched_ram}
    core, st = v2.generate_traces(
        program_words, seg.records, data_base,
        init_regs=seg.init_regs, init_ram=init_ram, init_pc=seg.init_pc,
        core_only=True,
    )
    out = list(core)
    assert st.halted == seg.halted

    # execution boundary v3
    E = ExecBoundaryAirV3
    ex_tr = np.zeros((4, E.width), dtype=np.uint32)
    ex_tr[0, E.IS_INIT] = 1
    ex_tr[0, E.INIT_PC] = seg.init_pc
    final_pc_pv = 0
    if not seg.halted:
        ex_tr[3, E.IS_FIN] = 1
        ex_tr[3, E.FIN_PC] = st.fin_pc
        ex_tr[3, E.FIN_TS] = st.fin_ts
        final_pc_pv = st.fin_pc
        assert st.fin_pc == seg.final_pc
    out.append((ExecBoundaryAirV3(), ex_tr,
                [seg.init_pc, final_pc_pv, 1 if seg.halted else 0]))

    # unified memory boundary; touched leaves for the Merkle argument
    B = MemoryBoundaryAirV3
    touched_leaves: Dict[int, Tuple[int, int]] = {}
    brows = []
    for r in range(32):
        if st.last_ts[r] == 0:
            continue
        row = np.zeros(B.width, dtype=np.uint32)
        row[B.IS_REAL], row[B.IS_REG] = 1, 1
        row[B.LEAF] = r
        st.bcheck(8 * r)
        row[B.INIT_VAL:B.INIT_VAL + 4] = _limbs(int(seg.init_regs[r]))
        row[B.FINAL_VAL:B.FINAL_VAL + 4] = _limbs(int(st.last_val[r]))
        row[B.FINAL_TS] = st.last_ts[r]
        touched_leaves[r] = (int(seg.init_regs[r]), int(st.last_val[r]))
        brows.append(row)
    for addr, (fts, fval) in sorted(st.ram.items()):
        row = np.zeros(B.width, dtype=np.uint32)
        row[B.IS_REAL] = 1
        leaf = leaf_of_addr(addr, data_base)
        off = leaf - N_REG_LEAVES
        assert 0 <= off < min(1 << 24, (1 << depth) - N_REG_LEAVES), \
            "data word outside the memory tree"
        row[B.LEAF] = leaf
        row[B.OFF_LO] = off & 0xFF
        row[B.OFF_MID] = (off >> 8) & 0xFF
        row[B.OFF_HI] = off >> 16
        st.bcheck(off & 0xFF)
        st.bcheck((off >> 8) & 0xFF)
        st.bcheck(off >> 16)
        row[B.INIT_VAL:B.INIT_VAL + 4] = _limbs(init_ram[addr])
        row[B.FINAL_VAL:B.FINAL_VAL + 4] = _limbs(fval)
        row[B.FINAL_TS] = fts
        touched_leaves[leaf] = (init_ram[addr], fval)
        brows.append(row)
    n_b = max(4, 1 << (max(len(brows), 1) - 1).bit_length())
    b_tr = np.zeros((n_b, B.width), dtype=np.uint32)
    for j, row in enumerate(brows):
        b_tr[j] = row
    out.append((MemoryBoundaryAirV3(data_base), b_tr, []))

    # Merkle update rows + Poseidon2 table
    mrows, p_inputs, p_mults = _merkle_rows(seg, touched_leaves, depth)
    M = MemoryMerkleAir
    n_m = max(4, 1 << (max(len(mrows), 1) - 1).bit_length())
    m_tr = np.zeros((n_m, M.width), dtype=np.uint32)
    for j, row in enumerate(mrows):
        m_tr[j] = row
    old_root = seg.pre_state.root()
    new_root = seg.post_state.root()
    out.append((MemoryMerkleAir(depth), m_tr,
                [int(v) for v in old_root] + [int(v) for v in new_root]))

    p_tr = Poseidon2Air.generate_trace(p_inputs, p_mults)
    out.append((Poseidon2Air(), p_tr, []))

    return v2.finish_tables(out, st)


# ---------------------------------------------------------------------------
# Segment chain prove/verify
# ---------------------------------------------------------------------------


@dataclass
class SegmentProofBundle:
    proof: machine.MachineProof
    airs: List[Air]


def prove_segments(program_words, segments: List[SegmentWitness], config,
                   data_base: int = 0x2000,
                   depth: int = DEPTH) -> List[SegmentProofBundle]:
    """Prove every segment. Segments are independent — across a pod this is
    the DP axis (each host/chip proves its own slice of segments)."""
    bundles = []
    for seg in segments:
        triples = generate_segment_traces(program_words, seg, data_base,
                                          depth)
        instances = [machine.AirInstance(a, t, pvs) for a, t, pvs in triples]
        proof = machine.prove_machine(instances, config)
        bundles.append(SegmentProofBundle(
            proof=proof, airs=[a for a, _, _ in triples]))
    return bundles


def _seg_pvs(bundle: SegmentProofBundle):
    """Extract (init_pc, final_pc, halted, old_root, new_root, pv) from the
    proof's public values (by AIR position)."""
    exec_pvs = merkle_pvs = user_pvs = None
    for air, (_ln, _w, pvs) in zip(bundle.airs, bundle.proof.meta):
        if isinstance(air, ExecBoundaryAirV3):
            exec_pvs = pvs
        elif isinstance(air, MemoryMerkleAir):
            merkle_pvs = pvs
        elif isinstance(air, v2.PublicValuesAir):
            user_pvs = pvs
    assert exec_pvs is not None and merkle_pvs is not None
    return exec_pvs, merkle_pvs, user_pvs


def verify_chain(bundles: List[SegmentProofBundle], config,
                 initial_root: Optional[np.ndarray] = None,
                 entry_pc: int = 0,
                 depth: int = DEPTH) -> bool:
    """Verify every segment proof and the boundary chaining between them.

    Like openvm's leaf verifier, the first segment is pinned to the program
    entry point and to a known initial memory commitment (defaults to the
    empty-memory root at `depth`); a chain starting at an arbitrary pc or
    memory state does not verify.
    """
    if not bundles:
        return False
    if initial_root is None:
        initial_root = MemState(depth).root()
    prev_root = None
    prev_pc = None
    word_counts = [0] * v2.N_PV_WORDS
    for i, bundle in enumerate(bundles):
        if not machine.verify_machine(bundle.airs, bundle.proof, config):
            return False
        exec_pvs, merkle_pvs, user_pvs = _seg_pvs(bundle)
        init_pc, final_pc, halted = exec_pvs
        old_root = np.array(merkle_pvs[:8], dtype=np.uint32)
        new_root = np.array(merkle_pvs[8:16], dtype=np.uint32)
        if i == 0:
            if init_pc != entry_pc:
                return False
            if not (old_root == np.asarray(initial_root)).all():
                return False
        else:
            if not (old_root == prev_root).all() or init_pc != prev_pc:
                return False
        last = i == len(bundles) - 1
        if bool(halted) != last:
            return False
        if user_pvs is not None:
            flags = user_pvs[4 * v2.N_PV_WORDS:]
            for w, f in enumerate(flags):
                word_counts[w] += int(f)
        prev_root, prev_pc = new_root, final_pc
    # each PV word revealed exactly once across the whole chain
    if any(c != 1 for c in word_counts):
        return False
    return True

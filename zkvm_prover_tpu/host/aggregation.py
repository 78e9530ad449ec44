"""Aggregation tree (recursion scaffolding, SURVEY.md §7 Phase 5).

Re-designs the reference's recursion layer (openvm leaf/internal/root
aggregation with `AggregationTreeConfig { num_children_leaf: 4,
num_children_internal: 3 }` — crates/prover/src/prover/mod.rs:47-60) for
this framework:

- Every aggregation node is a machine proof of `AggregationAir`: a Poseidon2
  sponge (overwrite-rate-8, the PaddingFreeSponge structure) absorbing a
  header block plus one fixed-size record per child — the child's 64-byte vk
  (exe||vm commitment) and its 32-byte PI hash, embedded as 16-bit limbs —
  and exposing the running digest as the node's 32-byte PI hash. Sponge
  permutations are proven via logUp queries into `Poseidon2Air`
  (POSEIDON_FULL_BUS).
- `input_commit(vk, pi_hash)` is the per-child commitment handed to parent
  tasks — the analog of the reference's deferral `input_commits`
  (crates/integration/src/lib.rs:461-514).

TRUST MODEL (documented divergence, tracked in ROADMAP Phase 5): the
aggregation proof binds children -> parent digest cryptographically, but
child *proof validity* is checked by the host verifier
(`Prover.gen_proof_stark` verifies every `task.aggregated_proofs` before
proving; host/prover.py). Full verifier-in-circuit recursion — the openvm
`verify_stark` equivalent — replaces that host check without changing this
tree or digest format.

Siblings at each tree level are independent proofs — across a pod this is
the same DP axis as segment proofs (SURVEY.md §2.3 "Proof-tree
parallelism").
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Sequence, Tuple

import numpy as np

from ..fields import babybear as bb
from ..models.air import Air, AirBuilder
from ..models.poseidon2_air import (
    POSEIDON_FULL_BUS,
    Poseidon2Air,
    permute_canonical,
)
from ..stark import machine

RATE = 8
WIDTH = 16
DIGEST_WORDS = 8
RECORD_FELTS = (64 + 32) // 2    # vk (64 B) + pi hash (32 B) as 16-bit limbs


@dataclass
class AggregationTreeConfig:
    """Mirrors reference AggregationTreeConfig (prover/mod.rs:54-60)."""

    num_children_leaf: int = 4
    num_children_internal: int = 3


def felts_of_bytes(data: bytes) -> List[int]:
    """Injective bytes -> BabyBear embedding: 16-bit little-endian limbs."""
    assert len(data) % 2 == 0
    return [
        int.from_bytes(data[i : i + 2], "little")
        for i in range(0, len(data), 2)
    ]


def child_record_felts(vk: bytes, pi_hash: bytes) -> List[int]:
    assert len(vk) == 64 and len(pi_hash) == 32
    return felts_of_bytes(vk + pi_hash)


def absorb_stream(children: Sequence[Tuple[bytes, bytes]]) -> List[int]:
    """Header block [n_children, 0...] then one record per child."""
    felts = [len(children)] + [0] * (RATE - 1)
    for vk, pi_hash in children:
        felts += child_record_felts(vk, pi_hash)
    assert len(felts) % RATE == 0
    return felts


def sponge_digest_words(felts: List[int]) -> np.ndarray:
    """Overwrite-mode rate-8 Poseidon2 sponge -> 8 canonical digest words."""
    state = np.zeros((1, WIDTH), dtype=np.uint32)
    for b in range(0, len(felts), RATE):
        state[0, :RATE] = felts[b : b + RATE]
        state = permute_canonical(state)
    return state[0, :DIGEST_WORDS].copy()


def digest_bytes(words: np.ndarray) -> bytes:
    return b"".join(int(w).to_bytes(4, "little") for w in words)


def aggregation_pi_hash(children: Sequence[Tuple[bytes, bytes]]) -> bytes:
    """The 32-byte PI hash an aggregation node reveals."""
    return digest_bytes(sponge_digest_words(absorb_stream(children)))


def input_commit(vk: bytes, pi_hash: bytes) -> bytes:
    """Per-child commitment (deferral input_commits analog)."""
    return digest_bytes(
        sponge_digest_words(
            [1] + [0] * (RATE - 1) + child_record_felts(vk, pi_hash)
        )
    )


class AggregationAir(Air):
    """Poseidon2 sponge chain: row r absorbs BLOCK over the running state
    (overwrite lanes 0..8, carry capacity lanes 8..16) and witnesses the
    permutation output; the last real row's digest is bound to the public
    values. Permutations are proven by Poseidon2Air via POSEIDON_FULL_BUS."""

    IS_REAL = 0
    IS_LAST = 1
    BLOCK = 2         # 8 absorbed felts
    CAP = 10          # 8 capacity input lanes
    STATE_OUT = 18    # 16
    width = 34
    num_public_values = DIGEST_WORDS

    def eval(self, b: AirBuilder) -> None:
        C = AggregationAir
        real = b.local(C.IS_REAL)
        last = b.local(C.IS_LAST)
        b.assert_bool(real)
        b.assert_bool(last)
        block = [b.local(C.BLOCK + k) for k in range(RATE)]
        cap = [b.local(C.CAP + k) for k in range(RATE)]
        out = [b.local(C.STATE_OUT + k) for k in range(WIDTH)]
        one = b.constant(1)

        # real rows form a prefix
        b.when_transition().assert_zero(
            b.mul(b.sub(one, real), b.next(C.IS_REAL))
        )
        # the sponge starts with zero capacity
        for k in range(RATE):
            b.when_first_row().assert_zero(cap[k])
        # capacity chains: next row's capacity input = this row's out[8..16]
        for k in range(RATE):
            b.when_transition().assert_zero(
                b.mul(b.next(C.IS_REAL),
                      b.sub(b.next(C.CAP + k), out[RATE + k]))
            )
        # IS_LAST marks exactly the final real row
        b.when_transition().assert_eq(last, b.sub(real, b.next(C.IS_REAL)))
        b.when_last_row().assert_eq(last, real)
        # digest binding
        for k in range(DIGEST_WORDS):
            b.assert_zero(b.mul(last, b.sub(out[k], b.public_value(k))))

        b.push_send(POSEIDON_FULL_BUS, block + cap + out, real)

    @staticmethod
    def generate_trace(felts: List[int]):
        """Returns (trace, digest_words, poseidon_inputs, poseidon_mults)."""
        n_blocks = len(felts) // RATE
        n = max(4, 1 << (n_blocks - 1).bit_length())
        C = AggregationAir
        trace = np.zeros((n, C.width), dtype=np.uint32)
        state = np.zeros((1, WIDTH), dtype=np.uint32)
        p_inputs = []
        for r in range(n_blocks):
            block = felts[r * RATE : (r + 1) * RATE]
            trace[r, C.IS_REAL] = 1
            trace[r, C.BLOCK : C.BLOCK + RATE] = block
            trace[r, C.CAP : C.CAP + RATE] = state[0, RATE:]
            state[0, :RATE] = block
            p_inputs.append(state[0].copy())
            state = permute_canonical(state)
            trace[r, C.STATE_OUT : C.STATE_OUT + WIDTH] = state[0]
        trace[n_blocks - 1, C.IS_LAST] = 1
        digest = trace[n_blocks - 1, C.STATE_OUT : C.STATE_OUT + DIGEST_WORDS]
        return (trace, digest.copy(), np.array(p_inputs, dtype=np.uint32),
                np.ones(n_blocks, dtype=np.uint32))


def build_aggregation_instances(children: Sequence[Tuple[bytes, bytes]]):
    """AIR instances for one aggregation node. Returns (instances, pi_hash)."""
    felts = absorb_stream(children)
    trace, digest, p_in, p_m = AggregationAir.generate_trace(felts)
    agg = machine.AirInstance(AggregationAir(), trace,
                              [int(w) for w in digest])
    # dedupe poseidon queries
    uniq = {}
    for row in p_in:
        key = row.tobytes()
        if key in uniq:
            uniq[key] = (uniq[key][0], uniq[key][1] + 1)
        else:
            uniq[key] = (row, 1)
    inputs = np.array([v[0] for v in uniq.values()], dtype=np.uint32)
    mults_full = np.array([v[1] for v in uniq.values()], dtype=np.uint32)
    p_tr = Poseidon2Air.generate_trace(
        inputs, np.zeros(len(inputs), dtype=np.uint32), mults_full
    )
    pose = machine.AirInstance(Poseidon2Air(), p_tr, [])
    return [agg, pose], digest_bytes(digest)


AGGREGATION_AIRS = lambda: [AggregationAir(), Poseidon2Air()]


# ---------------------------------------------------------------------------
# Tree orchestration
# ---------------------------------------------------------------------------


@dataclass
class AggNodeProof:
    proof: machine.MachineProof
    pi_hash: bytes
    level: str                   # "leaf" | "internal" | "root"
    children_pi: List[bytes] = field(default_factory=list)


class AggregationProver:
    """Drives the leaf(4)/internal(3) aggregation tree over child proof
    metadata. Each node proof is independent of its siblings (DP axis)."""

    def __init__(self, config, tree: AggregationTreeConfig = None):
        self.config = config
        self.tree = tree or AggregationTreeConfig()

    def _prove_node(self, children: Sequence[Tuple[bytes, bytes]],
                    level: str) -> AggNodeProof:
        instances, pi_hash = build_aggregation_instances(children)
        proof = machine.prove_machine(instances, self.config)
        return AggNodeProof(proof=proof, pi_hash=pi_hash, level=level,
                            children_pi=[pi for _, pi in children])

    def aggregate(self, child_vk: bytes,
                  child_pi_hashes: Sequence[bytes]) -> List[List[AggNodeProof]]:
        """Full tree: returns proofs per level, root last (single node)."""
        levels: List[List[AggNodeProof]] = []
        k = self.tree.num_children_leaf
        current = [
            self._prove_node(
                [(child_vk, pi) for pi in child_pi_hashes[i : i + k]],
                "leaf",
            )
            for i in range(0, len(child_pi_hashes), k)
        ]
        levels.append(current)
        agg_vk = b"\x01" * 64  # vk of the aggregation program itself
        k = self.tree.num_children_internal
        while len(current) > 1:
            current = [
                self._prove_node(
                    [(agg_vk, n.pi_hash) for n in current[i : i + k]],
                    "internal",
                )
                for i in range(0, len(current), k)
            ]
            levels.append(current)
        levels[-1][-1].level = "root"
        return levels

    @staticmethod
    def verify_node(node: AggNodeProof, children: Sequence[Tuple[bytes, bytes]],
                    config) -> bool:
        """Check the node proof and that its digest matches the children."""
        if aggregation_pi_hash(children) != node.pi_hash:
            return False
        airs = AGGREGATION_AIRS()
        if not machine.verify_machine(airs, node.proof, config):
            return False
        # the digest in the proof's public values must match pi_hash
        for air, (_ln, _w, pvs) in zip(airs, node.proof.meta):
            if isinstance(air, AggregationAir):
                return digest_bytes(np.array(pvs, dtype=np.uint32)) == \
                    node.pi_hash
        return False

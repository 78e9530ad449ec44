"""Recursive aggregation: node proofs that verify child proofs in-circuit.

The defining property (VERDICT round-2 #1): corrupt any child proof byte ->
the parent node proof fails verification, with NO host-side pre-check of
the child. Reference analog: in-guest verify_stark
(/root/reference/crates/types/circuit/src/lib.rs:138-154) and the
leaf-4/internal-3 tree (crates/prover/src/prover/mod.rs:47-60).
"""

import copy

import numpy as np
import pytest

from zkvm_prover_tpu.fields import babybear as bb
from zkvm_prover_tpu.models.fibonacci import FibonacciAir
from zkvm_prover_tpu.recursion.aggregation import (
    TAG_INTERNAL,
    TAG_LEAF,
    AggNodeProgram,
    ChildSlot,
    constraint_digest_felts,
    digest_bytes,
    input_commit,
    machine_vk_words,
    node_digest_words,
)
from zkvm_prover_tpu.stark import machine
from zkvm_prover_tpu.stark.config import StarkConfig
from zkvm_prover_tpu.stark.fri import FriConfig

P = bb.P

TINY = StarkConfig(fri=FriConfig(log_blowup=1, num_queries=2,
                                 proof_of_work_bits=2))


def fib_proof(log_n=3, x1=1):
    air = FibonacciAir()
    trace, pvs = air.generate_trace(log_n, 0, x1)
    proof = machine.prove_machine(
        [machine.AirInstance(air, trace, pvs)], TINY
    )
    return proof


@pytest.fixture(scope="module")
def leaf_setup():
    slot = ChildSlot([FibonacciAir()], [3], TINY)
    prog = AggNodeProgram(TAG_LEAF, [slot, slot], TINY)
    p1, p2 = fib_proof(x1=1), fib_proof(x1=2)
    node_proof, pi = prog.prove([p1, p2])
    return slot, prog, p1, p2, node_proof, pi


# ---------------------------------------------------------------------------
# vk binding (VERDICT round-2 #9)
# ---------------------------------------------------------------------------


class _TweakedFib(FibonacciAir):
    """Same shape, one extra (vacuous) constraint."""

    def eval(self, b):
        super().eval(b)
        x = b.local(0)
        b.assert_zero(b.mul(b.constant(0), x))


def test_vk_binds_constraint_structure():
    base = machine_vk_words([FibonacciAir()], [3], TINY)
    tweaked = machine_vk_words([_TweakedFib()], [3], TINY)
    assert not np.array_equal(base, tweaked)


def test_vk_binds_shape_and_config():
    base = machine_vk_words([FibonacciAir()], [3], TINY)
    taller = machine_vk_words([FibonacciAir()], [4], TINY)
    other_cfg = machine_vk_words(
        [FibonacciAir()], [3],
        StarkConfig(fri=FriConfig(log_blowup=1, num_queries=3,
                                  proof_of_work_bits=2)),
    )
    assert not np.array_equal(base, taller)
    assert not np.array_equal(base, other_cfg)


def test_constraint_digest_deterministic():
    a = constraint_digest_felts(FibonacciAir())
    b_ = constraint_digest_felts(FibonacciAir())
    assert a == b_


# ---------------------------------------------------------------------------
# domain separation (round-2 ADVICE medium)
# ---------------------------------------------------------------------------


def test_digest_domain_separation():
    vk = list(range(8))
    pvs = [7, 8, 9]
    leaf = node_digest_words(TAG_LEAF, [(vk, pvs)])
    internal = node_digest_words(TAG_INTERNAL, [(vk, pvs)])
    commit = input_commit(vk, pvs)
    assert not np.array_equal(leaf, internal)
    assert digest_bytes(leaf) != commit
    assert digest_bytes(internal) != commit


# ---------------------------------------------------------------------------
# leaf node: prove + verify + tamper
# ---------------------------------------------------------------------------


def test_leaf_node_roundtrip(leaf_setup):
    slot, prog, p1, p2, node_proof, pi = leaf_setup
    assert prog.verify(node_proof, expected_digest=pi)
    # digest matches the host mirror over (child vk, child PVs)
    children = [
        (slot.vk_words, [v for (_, _, pvs) in p.meta for v in pvs])
        for p in (p1, p2)
    ]
    assert pi == digest_bytes(node_digest_words(TAG_LEAF, children))
    assert AggNodeProgram.digest_of(node_proof) == pi


def test_leaf_rejects_tampered_child(leaf_setup):
    """No host pre-check anywhere: prove() accepts the corrupt child and
    the resulting node proof fails verification."""
    slot, prog, p1, _p2, _np_, _pi = leaf_setup
    bad = copy.deepcopy(p1)
    ln, w, pvs = bad.meta[0]
    pvs = list(pvs)
    pvs[2] = (pvs[2] + 1) % P  # forged public value
    bad.meta[0] = (ln, w, pvs)
    assert not machine.verify_machine([FibonacciAir()], bad, TINY)

    node_proof, _pi = prog.prove([bad, fib_proof(x1=2)])
    assert not prog.verify(node_proof)


def test_leaf_rejects_wrong_digest(leaf_setup):
    _slot, prog, _p1, _p2, node_proof, pi = leaf_setup
    wrong = bytearray(pi)
    wrong[0] ^= 1
    assert not prog.verify(node_proof, expected_digest=bytes(wrong))


@pytest.mark.skipif(
    not __import__("os").environ.get("RUN_HEAVY"),
    reason="in-circuit verification of a full 17-AIR rv32 chunk machine "
           "builds a ~10^5-op wire circuit — minutes of CPU; run with "
           "RUN_HEAVY=1 (the same machinery is exercised at small scale "
           "by every other test in this module)",
)
def test_leaf_over_rv32_chunk_machine():
    """Verifier-in-circuit over a REAL chunk app proof (the full rv32 VM
    machine incl. keccak syscall chips) — constraint-level check."""
    import json

    from zkvm_prover_tpu.host import serialization
    from zkvm_prover_tpu.host.app import get_app
    from zkvm_prover_tpu.host.prover import Prover, ProverConfig
    from zkvm_prover_tpu.host.task import ProvingTask
    from zkvm_prover_tpu.recursion.aggregation import (
        build_child_verification,
    )
    from zkvm_prover_tpu.recursion.stark_verifier import RealOracle
    from zkvm_prover_tpu.stark import debug
    from zkvm_prover_tpu.integration.testers import ChunkTaskGenerator

    gen = ChunkTaskGenerator(stark=TINY)
    envelope = gen.get_or_build_proof(0)
    mp = serialization.decode_machine_proof(envelope.proof)
    app = get_app("chunk")
    slot = ChildSlot(
        app.airs_for_meta(mp.meta), [ln for (ln, _, _) in mp.meta], TINY
    )
    instances = build_child_verification(
        TAG_LEAF, [slot], [RealOracle(mp)]
    )
    for inst in instances:
        assert debug.check_constraints(
            inst.air, inst.trace, inst.public_values
        ) == []
    pairs = [(i.air, i.trace) for i in instances]
    pvs_map = {k: i.public_values for k, i in enumerate(instances)}
    assert debug.check_bus_balance(pairs, pvs_map) == {}


def test_internal_node_over_leaf(leaf_setup):
    """Two-level tree: an internal node verifies a LEAF machine proof
    in-circuit (the wire machine verifying a proof of the wire machine —
    the self-similar step of the openvm recursion tower, depth-specific
    variant)."""
    slot, leaf_prog, _p1, _p2, leaf_proof, leaf_pi = leaf_setup
    leaf_slot = ChildSlot(
        leaf_prog.machine_airs(), leaf_prog._log_ns, TINY
    )
    internal = AggNodeProgram(TAG_INTERNAL, [leaf_slot], TINY)
    node_proof, pi = internal.prove([leaf_proof])
    assert internal.verify(node_proof, expected_digest=pi)
    # digest binds the leaf machine's vk + its public values (the digest)
    leaf_pvs = [v for (_, _, pvs) in leaf_proof.meta for v in pvs]
    expect = digest_bytes(node_digest_words(
        TAG_INTERNAL, [(leaf_slot.vk_words, leaf_pvs)]
    ))
    assert pi == expect


def test_parallel_leaf_siblings_bit_identical(leaf_setup):
    """Proof-tree parallelism (SURVEY §2.3): sibling leaf nodes proven in
    a process pool must be byte-identical to the sequential path."""
    from zkvm_prover_tpu.host import serialization
    from zkvm_prover_tpu.host.app import get_app
    from zkvm_prover_tpu.recursion.aggregation import (
        AggregationTreeConfig,
        RecursiveAggregationProver,
    )

    slot, _prog, p1, p2, _np, _pi = leaf_setup
    children = [p1, p2, p1, p2]
    prover = RecursiveAggregationProver(
        slot, TINY,
        AggregationTreeConfig(num_children_leaf=2,
                              num_children_internal=3),
    )
    seq = prover.aggregate(children)
    par = prover.aggregate(children, workers=2,
                           app_vk=get_app("fibonacci").vk_bytes())
    assert len(seq[0]) == len(par[0]) == 2
    for a, b in zip(seq[0], par[0]):
        assert serialization.encode_machine_proof(a.proof) == \
            serialization.encode_machine_proof(b.proof)
        assert a.pi_hash == b.pi_hash
    # the parallel leaves feed the same internal/root chain
    assert seq[-1][0].pi_hash == par[-1][0].pi_hash

"""Integration harness: chained task generators, disk proof cache,
independent verification at every layer (the reference's prove-verify tier,
SURVEY.md §4 tier 3 plumbing).

Tiering mirrors the reference: the fast default tier executes guests and
validates chaining (the reference's execute-only tests,
crates/integration/tests/chunk_circuit.rs:44-54); the full PROVED
chunk -> batch -> bundle chain — now a real 17-AIR rv32 VM machine per
layer — is the heavyweight make-gated tier (`make test-e2e-bundle` sets
RUN_HEAVY=1; reference parity: Makefile:71-123 gates its prove tests the
same way)."""

import os

import pytest

from zkvm_prover_tpu.integration import (
    BatchTaskGenerator,
    BundleTaskGenerator,
    ChunkTaskGenerator,
)
from zkvm_prover_tpu.stark.config import StarkConfig, fast_test_config
from zkvm_prover_tpu.stark.fri import FriConfig

TINY = StarkConfig(fri=FriConfig(log_blowup=1, num_queries=2,
                                 proof_of_work_bits=2))

HEAVY = pytest.mark.skipif(
    not os.environ.get("RUN_HEAVY"),
    reason="full proved chunk->batch->bundle chain over the rv32 VM "
           "machines takes tens of minutes on a small CPU host; run via "
           "`make test-e2e-bundle` (RUN_HEAVY=1). The proving path itself "
           "is covered by test_keccak_vm/test_prover_aggregation.",
)


@pytest.fixture(scope="module")
def harness(tmp_path_factory):
    os.environ["OUTPUT_DIR"] = str(tmp_path_factory.mktemp("run"))
    chunks = ChunkTaskGenerator(stark=TINY)
    batches = BatchTaskGenerator(chunks=chunks)
    bundles = BundleTaskGenerator(batches=batches, batches_per_bundle=2)
    return chunks, batches, bundles


def test_chunk_witnesses_are_chained(harness):
    chunks, _, _ = harness
    from zkvm_prover_tpu.circuits.chunk_circuit import ChunkCircuit

    i0, _ = ChunkCircuit.validate(chunks.witness(0))
    i1, _ = ChunkCircuit.validate(chunks.witness(1))
    assert i1.prev_state_root == i0.post_state_root
    assert i1.prev_msg_queue_hash == i0.post_msg_queue_hash


def test_chunk_app_executes_guest(harness):
    """Execute tier: the chunk app runs the hash-reveal guest on the rv32
    VM and the revealed digest equals the circuit PI hash."""
    from zkvm_prover_tpu.circuits.chunk_circuit import ChunkCircuit
    from zkvm_prover_tpu.host.app import get_app
    from zkvm_prover_tpu.host.task import ProvingTask

    chunks, _, _ = harness
    w = chunks.witness(0)
    task = ProvingTask(
        serialized_witness=[ChunkCircuit.serialize_witness(w)],
        identifier="exec-0",
    )
    app = get_app("chunk")
    instances, pi_hash = app.execute(task)
    assert pi_hash == ChunkCircuit.pi_hash(w)
    assert len(instances) == 17  # the full v2 machine incl. keccak chips


@HEAVY
def test_proved_e2e_chain(harness):
    chunks, batches, bundles = harness
    bundle_proof = bundles.build_proof()
    assert len(bundle_proof.user_pvs_proof) == 32
    # all layers cached on disk
    out = os.environ["OUTPUT_DIR"]
    assert len(list((os.scandir(f"{out}/chunk/proofs")))) == 4
    assert len(list((os.scandir(f"{out}/batch/proofs")))) == 2
    assert len(list((os.scandir(f"{out}/bundle/proofs")))) == 1


@HEAVY
def test_proof_cache_resume(harness):
    """Second build resumes entirely from the disk cache (fast)."""
    import time

    chunks, batches, bundles = harness
    bundles.build_proof()
    # fresh generators, same OUTPUT_DIR
    c2 = ChunkTaskGenerator(stark=TINY)
    t0 = time.time()
    p = c2.get_or_build_proof(0)
    assert time.time() - t0 < 30, "expected cache hit"
    assert p.user_pvs_proof == chunks.get_or_build_proof(0).user_pvs_proof
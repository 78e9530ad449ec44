"""Proved chunk -> batch -> bundle chain through the integration harness:
task generators with chained witnesses, disk proof cache, independent
verification at every layer (the reference's prove-verify tier, SURVEY.md
§4 tier 3 plumbing)."""

import os

import pytest

from zkvm_prover_tpu.integration import (
    BatchTaskGenerator,
    BundleTaskGenerator,
    ChunkTaskGenerator,
)
from zkvm_prover_tpu.stark.config import fast_test_config


@pytest.fixture(scope="module")
def harness(tmp_path_factory):
    os.environ["OUTPUT_DIR"] = str(tmp_path_factory.mktemp("run"))
    chunks = ChunkTaskGenerator(stark=fast_test_config())
    batches = BatchTaskGenerator(chunks=chunks)
    bundles = BundleTaskGenerator(batches=batches, batches_per_bundle=2)
    return chunks, batches, bundles


def test_proved_e2e_chain(harness):
    chunks, batches, bundles = harness
    bundle_proof = bundles.build_proof()
    assert len(bundle_proof.user_pvs_proof) == 32
    # all layers cached on disk
    out = os.environ["OUTPUT_DIR"]
    assert len(list((os.scandir(f"{out}/chunk/proofs")))) == 4
    assert len(list((os.scandir(f"{out}/batch/proofs")))) == 2
    assert len(list((os.scandir(f"{out}/bundle/proofs")))) == 1


def test_proof_cache_resume(harness):
    """Second build resumes entirely from the disk cache (fast)."""
    import time

    chunks, batches, bundles = harness
    # fresh generators, same OUTPUT_DIR
    c2 = ChunkTaskGenerator(stark=fast_test_config())
    t0 = time.time()
    p = c2.get_or_build_proof(0)
    assert time.time() - t0 < 5, "expected cache hit"
    assert p.user_pvs_proof == chunks.get_or_build_proof(0).user_pvs_proof


def test_chunk_witnesses_are_chained(harness):
    chunks, _, _ = harness
    from zkvm_prover_tpu.circuits.chunk_circuit import ChunkCircuit

    i0, _ = ChunkCircuit.validate(chunks.witness(0))
    i1, _ = ChunkCircuit.validate(chunks.witness(1))
    assert i1.prev_state_root == i0.post_state_root
    assert i1.prev_msg_queue_hash == i0.post_msg_queue_hash

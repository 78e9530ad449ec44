"""Execute-only e2e chain: chunk -> batch -> bundle through the circuit
programs — the analog of the reference's execute-only integration tier
(SURVEY.md §4 tier 2: real chained witnesses, fake proof commitments)."""

import pytest

from zkvm_prover_tpu.circuits import BatchCircuit, BundleCircuit, ChunkCircuit
from zkvm_prover_tpu.circuits.batch_circuit import BatchCircuitWitness
from zkvm_prover_tpu.fields import bls12_381 as bls
from zkvm_prover_tpu.ops.keccak import keccak256
from zkvm_prover_tpu.types.base import (
    AggregationInput,
    ForkName,
    Version,
)
from zkvm_prover_tpu.types.batch import (
    BatchHeaderV7,
    BatchWitness,
    BlobPolynomial,
    EnvelopeV7,
    PayloadV7,
    PointEvalWitness,
    kzg_to_versioned_hash,
)
from zkvm_prover_tpu.types.batch import blob as blob_mod
from zkvm_prover_tpu.types.bundle import BundleWitness
from zkvm_prover_tpu.types.chunk import ChunkWitness
from zkvm_prover_tpu.types.chunk.witness import BlockExecutionSummary

SETUP = bls.InsecureKzgSetup.generate(tau=0x5EED)
VERSION = Version.galileo_v2()


def mk_chunk_witness(start_block, prev_state, prev_q, prev_hash_seed):
    blocks = []
    state = prev_state
    for i in range(2):
        n = start_block + i
        state = keccak256(state + b"state")
        blocks.append(
            BlockExecutionSummary(
                number=n,
                timestamp=1_700_000_000 + n,
                base_fee_per_gas=1000,
                gas_limit=30_000_000,
                gas_used=1_000_000,
                state_root_after=state,
                block_hash=keccak256(prev_hash_seed + n.to_bytes(8, "big")),
                encoded_l2_txs=[b"\x02" + bytes([n % 256]) * 20],
                l1_msg_hashes=[keccak256(b"l1msg" + n.to_bytes(8, "big"))],
                num_txs=2,
            )
        )
    return ChunkWitness(
        version=VERSION.as_version_byte(),
        blocks=blocks,
        prev_msg_queue_hash=prev_q,
        fork_name=ForkName.GALILEO_V2,
        prev_state_root=prev_state,
        withdraw_root=b"\x07" * 32,
        chain_id=534352,
    )


@pytest.fixture(scope="module")
def chain():
    # --- two chained chunks ---
    w1 = mk_chunk_witness(100, b"\x01" * 32, b"\x00" * 32, b"\xaa")
    info1, v1 = ChunkCircuit.validate(w1)
    w2 = mk_chunk_witness(
        102, info1.post_state_root, info1.post_msg_queue_hash, b"\xbb"
    )
    info2, _ = ChunkCircuit.validate(w2)
    pi1 = info1.pi_hash_by_version(VERSION)
    pi2 = info2.pi_hash_by_version(VERSION)

    # --- batch over the chunks ---
    payload = PayloadV7(
        version=int(VERSION.stf_version),
        prev_msg_queue_hash=info1.prev_msg_queue_hash,
        post_msg_queue_hash=info2.post_msg_queue_hash,
        initial_block_number=info1.initial_block_number,
        num_blocks=len(info1.block_ctxs) + len(info2.block_ctxs),
        block_contexts=info1.block_ctxs + info2.block_ctxs,
        tx_data=b"".join(
            tx for w in (w1, w2) for b in w.blocks for tx in b.encoded_l2_txs
        ),
    )
    env = EnvelopeV7.build(
        int(VERSION.stf_version), payload.to_bytes(), encode=True
    )
    blob = BlobPolynomial(env.envelope_bytes)
    commitment = blob_mod.commit_blob(SETUP, blob)
    versioned_hash = kzg_to_versioned_hash(
        bls.g1_to_compressed_be(commitment)
    )
    header = BatchHeaderV7(
        version=int(VERSION.stf_version),
        batch_index=42,
        parent_batch_hash=b"\x09" * 32,
        blob_versioned_hash=versioned_hash,
    )
    z, y = blob.evaluate(env.challenge_digest(versioned_hash))
    _, proof = blob_mod.prove_blob_eval(SETUP, blob, z)
    pe = PointEvalWitness(
        kzg_commitment_x=commitment[0].to_bytes(48, "big"),
        kzg_commitment_y=commitment[1].to_bytes(48, "big"),
        kzg_proof_x=proof[0].to_bytes(48, "big"),
        kzg_proof_y=proof[1].to_bytes(48, "big"),
    )
    batch_witness = BatchCircuitWitness(
        inner=BatchWitness(
            version=VERSION.as_version_byte(),
            chunk_infos=[info1, info2],
            blob_bytes=env.envelope_bytes.rstrip(b"\x00"),
            header=header,
            point_eval_witness=pe,
        ),
        chunk_proofs=[
            AggregationInput.from_pi_hash(pi1),
            AggregationInput.from_pi_hash(pi2),
        ],
    )
    BatchCircuit.tau_g2_override = SETUP.tau_g2
    batch_info, _ = BatchCircuit.validate(batch_witness)
    batch_pi = batch_info.pi_hash_by_version(VERSION)

    # --- bundle over one batch ---
    bundle_witness = BundleWitness(
        version=VERSION.as_version_byte(),
        batch_proofs=[AggregationInput.from_pi_hash(batch_pi)],
        batch_infos=[batch_info],
        fork_name=ForkName.GALILEO_V2,
    )
    bundle_info, _ = BundleCircuit.validate(bundle_witness)
    return {
        "w1": w1, "info1": info1, "info2": info2,
        "batch_witness": batch_witness, "batch_info": batch_info,
        "bundle_info": bundle_info,
    }


def test_chunk_witness_serialization_roundtrip(chain):
    blob_bytes = ChunkCircuit.serialize_witness(chain["w1"])
    back = ChunkCircuit.deserialize_witness(blob_bytes)
    info, _ = ChunkCircuit.validate(back)
    assert info.pi_hash_by_version(VERSION) == chain["info1"].pi_hash_by_version(VERSION)


def test_batch_folds_chunks(chain):
    bi = chain["batch_info"]
    assert bi.parent_state_root == chain["info1"].prev_state_root
    assert bi.state_root == chain["info2"].post_state_root
    assert bi.prev_msg_queue_hash == chain["info1"].prev_msg_queue_hash
    assert bi.post_msg_queue_hash == chain["info2"].post_msg_queue_hash


def test_bundle_folds_batch(chain):
    bu = chain["bundle_info"]
    bi = chain["batch_info"]
    assert bu.num_batches == 1
    assert bu.batch_hash == bi.batch_hash
    assert bu.post_state_root == bi.state_root
    pi = bu.pi_by_version(VERSION)
    assert pi[31] == VERSION.as_version_byte()


def test_batch_rejects_unchained_chunks(chain):
    bad = chain["batch_witness"]
    import copy

    bad = copy.deepcopy(bad)
    # swap chunk order — chaining must fail
    bad.inner.chunk_infos = bad.inner.chunk_infos[::-1]
    with pytest.raises(AssertionError):
        BatchCircuit.validate(bad)


def test_batch_rejects_wrong_child_pi_hash(chain):
    import copy

    bad = copy.deepcopy(chain["batch_witness"])
    bad.chunk_proofs[0].public_values[0] ^= 1
    with pytest.raises(AssertionError):
        BatchCircuit.validate(bad)

"""Batch DA layer: headers, envelope/payload v7 (zstd), blob polynomial,
barycentric point evaluation, KZG pairing check, full BatchInfo builder —
the host-expressed batch-circuit computation."""

import numpy as np
import pytest

from zkvm_prover_tpu.fields import bls12_381 as bls
from zkvm_prover_tpu.ops.keccak import keccak256
from zkvm_prover_tpu.types.base import BlockContextV2, ChunkInfo, Version
from zkvm_prover_tpu.types.batch import (
    BatchHeaderV6,
    BatchHeaderV7,
    BatchHeaderValidiumV1,
    BatchWitness,
    BlobPolynomial,
    EnvelopeV7,
    N_BLOB_BYTES,
    PayloadV7,
    PointEvalWitness,
    build_batch_info_v7,
    kzg_to_versioned_hash,
)
from zkvm_prover_tpu.types.batch import blob as blob_mod
from zkvm_prover_tpu.types.batch.payload import INDEX_BLOCK_CTX


def test_header_hashes_change_with_fields():
    h = BatchHeaderV7(
        version=9, batch_index=5, parent_batch_hash=b"\x01" * 32,
        blob_versioned_hash=b"\x02" * 32,
    )
    h2 = BatchHeaderV7(
        version=9, batch_index=6, parent_batch_hash=b"\x01" * 32,
        blob_versioned_hash=b"\x02" * 32,
    )
    assert h.batch_hash() != h2.batch_hash()
    assert len(h.batch_hash()) == 32
    v6 = BatchHeaderV6(
        version=6, batch_index=1, l1_message_popped=2,
        total_l1_message_popped=3, parent_batch_hash=b"\x04" * 32,
        last_block_timestamp=99, data_hash=b"\x05" * 32,
        blob_versioned_hash=b"\x06" * 32,
    )
    assert len(v6.batch_hash()) == 32
    val = BatchHeaderValidiumV1(
        version=65, batch_index=1, parent_batch_hash=b"\x01" * 32,
        post_state_root=b"\x02" * 32, withdraw_root=b"\x03" * 32,
        commitment=b"\x04" * 32,
    )
    assert len(val.batch_hash()) == 32


def _mk_chunks():
    """Two chained chunks with block contexts + tx data."""
    ctx = lambda t: BlockContextV2(
        timestamp=t, base_fee=100, gas_limit=10_000_000, num_txs=2,
        num_l1_msgs=0,
    )
    tx1, tx2 = b"\xaa" * 40, b"\xbb" * 25
    c1 = ChunkInfo(
        chain_id=534352,
        prev_state_root=b"\x01" * 32,
        post_state_root=b"\x02" * 32,
        withdraw_root=b"\x03" * 32,
        tx_data_digest=keccak256(tx1),
        prev_msg_queue_hash=b"\x0a" * 32,
        post_msg_queue_hash=b"\x0b" * 32,
        tx_data_length=len(tx1),
        initial_block_number=100,
        block_ctxs=[ctx(1000), ctx(1001)],
    )
    c2 = ChunkInfo(
        chain_id=534352,
        prev_state_root=b"\x02" * 32,
        post_state_root=b"\x04" * 32,
        withdraw_root=b"\x05" * 32,
        tx_data_digest=keccak256(tx2),
        prev_msg_queue_hash=b"\x0b" * 32,
        post_msg_queue_hash=b"\x0c" * 32,
        tx_data_length=len(tx2),
        initial_block_number=102,
        block_ctxs=[ctx(1002)],
    )
    payload = PayloadV7(
        version=9,
        prev_msg_queue_hash=c1.prev_msg_queue_hash,
        post_msg_queue_hash=c2.post_msg_queue_hash,
        initial_block_number=100,
        num_blocks=3,
        block_contexts=c1.block_ctxs + c2.block_ctxs,
        tx_data=tx1 + tx2,
    )
    return [c1, c2], payload


def test_envelope_payload_roundtrip_zstd():
    chunks, payload = _mk_chunks()
    env = EnvelopeV7.build(9, payload.to_bytes(), encode=True)
    assert env.is_encoded == 1
    back = PayloadV7.from_envelope(env)
    assert back.prev_msg_queue_hash == payload.prev_msg_queue_hash
    assert back.num_blocks == 3
    assert back.tx_data == payload.tx_data
    back.validate(chunks)


def test_envelope_raw_and_padding_check():
    _, payload = _mk_chunks()
    env = EnvelopeV7.build(9, payload.to_bytes(), encode=False)
    back = PayloadV7.from_envelope(env)
    assert back.tx_data == payload.tx_data
    # nonzero padding rejected
    raw = bytearray(env.envelope_bytes)
    raw[-1] = 1
    with pytest.raises(AssertionError):
        EnvelopeV7.from_slice(bytes(raw))


def test_payload_validate_rejects_wrong_digest():
    chunks, payload = _mk_chunks()
    bad = chunks[0]
    bad.tx_data_digest = b"\xff" * 32
    with pytest.raises(AssertionError):
        payload.validate(chunks)


SETUP = bls.InsecureKzgSetup.generate(tau=0xDEADBEEFCAFE)


def test_blob_point_evaluation_consistency():
    """Barycentric evaluation (evaluation form) == coefficient-form Horner."""
    data = bytes(range(256)) * 4
    blob = BlobPolynomial(data)
    z = 987654321987654321
    y_bary = blob_mod.point_evaluation(blob.coefficients, z)
    coeffs = blob_mod._inverse_ntt_brp(blob.coefficients)
    y_horner = 0
    for c in reversed(coeffs):
        y_horner = (y_horner * z + c) % bls.R
    assert y_bary == y_horner


def test_full_batch_builder_v7():
    chunks, payload = _mk_chunks()
    env = EnvelopeV7.build(10, payload.to_bytes(), encode=True)
    blob = BlobPolynomial(env.envelope_bytes)
    commitment = blob_mod.commit_blob(SETUP, blob)
    versioned_hash = kzg_to_versioned_hash(bls.g1_to_compressed_be(commitment))

    header = BatchHeaderV7(
        version=10, batch_index=7, parent_batch_hash=b"\x09" * 32,
        blob_versioned_hash=versioned_hash,
    )
    z_digest = env.challenge_digest(versioned_hash)
    z, y = blob.evaluate(z_digest)
    y2, proof = blob_mod.prove_blob_eval(SETUP, blob, z)
    assert y2 == y

    pe = PointEvalWitness(
        kzg_commitment_x=commitment[0].to_bytes(48, "big"),
        kzg_commitment_y=commitment[1].to_bytes(48, "big"),
        kzg_proof_x=proof[0].to_bytes(48, "big"),
        kzg_proof_y=proof[1].to_bytes(48, "big"),
    )
    witness = BatchWitness(
        version=Version.galileo_v2().as_version_byte(),
        chunk_infos=chunks,
        blob_bytes=env.envelope_bytes.rstrip(b"\x00"),
        header=header,
        point_eval_witness=pe,
    )
    info = build_batch_info_v7(witness, tau_g2=SETUP.tau_g2)
    assert info.batch_hash == header.batch_hash()
    assert info.parent_state_root == chunks[0].prev_state_root
    assert info.state_root == chunks[-1].post_state_root
    assert info.chain_id == 534352

    # tampered proof point must fail the pairing check
    bad_pe = PointEvalWitness(
        kzg_commitment_x=pe.kzg_commitment_x,
        kzg_commitment_y=pe.kzg_commitment_y,
        kzg_proof_x=commitment[0].to_bytes(48, "big"),
        kzg_proof_y=commitment[1].to_bytes(48, "big"),
    )
    witness_bad = BatchWitness(
        version=witness.version, chunk_infos=chunks,
        blob_bytes=witness.blob_bytes, header=header,
        point_eval_witness=bad_pe,
    )
    with pytest.raises(AssertionError):
        build_batch_info_v7(witness_bad, tau_g2=SETUP.tau_g2)

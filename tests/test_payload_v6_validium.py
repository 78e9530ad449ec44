"""DA-codec v6 payload + v6/validium BatchInfo builders (reference
crates/types/batch/src/payload/v6.rs, builder/{v6,validium}.rs)."""

import pytest

from zkvm_prover_tpu.ops.keccak import keccak256
from zkvm_prover_tpu.types.base.chunk import ChunkInfo
from zkvm_prover_tpu.types.batch.blob import BlobPolynomial, N_BLOB_BYTES
from zkvm_prover_tpu.types.batch.builder import (
    build_batch_info_v6,
    build_batch_info_validium,
)
from zkvm_prover_tpu.types.batch.header import (
    BatchHeaderV6,
    BatchHeaderValidiumV1,
)
from zkvm_prover_tpu.types.batch.payload import (
    EnvelopeV6,
    N_MAX_CHUNKS_V6,
    PayloadV6,
    N_BYTES_METADATA_V6,
)
from zkvm_prover_tpu.types.batch.witness import BatchWitness

B32 = lambda b: bytes([b]) * 32


def _chunk_infos_v6(tx_datas):
    infos = []
    prev_sr = B32(1)
    for i, txd in enumerate(tx_datas):
        infos.append(ChunkInfo(
            chain_id=534352,
            prev_state_root=prev_sr,
            post_state_root=B32(10 + i),
            withdraw_root=B32(99),
            data_hash=keccak256(b"datahash%d" % i),
            tx_data_digest=keccak256(txd),
        ))
        prev_sr = B32(10 + i)
    return infos


def test_payload_v6_round_trip():
    tx_datas = [b"\x01" * 10, b"\x02" * 33, b""]
    payload_bytes = PayloadV6.build_payload_bytes(tx_datas)
    assert len(payload_bytes) == N_BYTES_METADATA_V6 + 43
    blob = EnvelopeV6.build(payload_bytes, encode=True)
    env = EnvelopeV6.from_slice(blob)
    assert env.is_encoded
    p = PayloadV6.from_envelope(env)
    assert p.chunk_data_digests == [keccak256(d) for d in tx_datas]
    assert p.metadata_digest == keccak256(
        payload_bytes[:N_BYTES_METADATA_V6]
    )
    # uncompressed round trip
    p2 = PayloadV6.from_envelope(
        EnvelopeV6.from_slice(EnvelopeV6.build(payload_bytes, encode=False))
    )
    assert p2.chunk_data_digests == p.chunk_data_digests


def test_payload_v6_rejects_bad_segmentation():
    payload_bytes = PayloadV6.build_payload_bytes([b"ab"])
    # extend batch bytes without fixing the sizes
    broken = EnvelopeV6.build(payload_bytes + b"x", encode=False)
    with pytest.raises(AssertionError):
        PayloadV6.from_envelope(EnvelopeV6.from_slice(broken))


def test_builder_v6_end_to_end():
    tx_datas = [b"\x11" * 20, b"\x22" * 5]
    infos = _chunk_infos_v6(tx_datas)
    payload_bytes = PayloadV6.build_payload_bytes(tx_datas)
    blob_bytes = EnvelopeV6.build(payload_bytes, encode=True)

    versioned_hash = B32(3)
    padded = blob_bytes + bytes(N_BLOB_BYTES - len(blob_bytes))
    payload = PayloadV6.from_envelope(EnvelopeV6.from_slice(blob_bytes))
    challenge = payload.challenge_digest(versioned_hash)
    z, y = BlobPolynomial(padded).evaluate(challenge)

    header = BatchHeaderV6(
        version=4,
        batch_index=12,
        l1_message_popped=0,
        total_l1_message_popped=0,
        parent_batch_hash=B32(7),
        last_block_timestamp=1700000000,
        data_hash=keccak256(b"".join(ci.data_hash for ci in infos)),
        blob_versioned_hash=versioned_hash,
        blob_data_proof=[z.to_bytes(32, "big"), y.to_bytes(32, "big")],
    )
    # euclidv1 version byte: domain scroll, stf v4 -> use raw byte 4
    wit = BatchWitness(version=4, chunk_infos=infos, blob_bytes=blob_bytes,
                       header=header)
    info = build_batch_info_v6(wit)
    assert info.batch_hash == header.batch_hash()
    assert info.parent_state_root == infos[0].prev_state_root
    assert info.state_root == infos[-1].post_state_root

    # corrupting the proof breaks the build
    header.blob_data_proof[1] = B32(0xEE)
    with pytest.raises(AssertionError):
        build_batch_info_v6(wit)


def test_builder_validium():
    infos = [ChunkInfo(
        chain_id=111,
        prev_state_root=B32(1),
        post_state_root=B32(2),
        withdraw_root=B32(3),
        prev_msg_queue_hash=B32(4),
        post_msg_queue_hash=B32(5),
        post_blockhash=B32(6),
        encryption_key=b"\xAB" * 33,
    )]
    from zkvm_prover_tpu.types.base.version import Version

    vbyte = Version.validium_v1().as_version_byte()
    header = BatchHeaderValidiumV1(
        version=1,
        batch_index=3,
        parent_batch_hash=B32(9),
        post_state_root=B32(2),
        withdraw_root=B32(3),
        commitment=B32(6),
    )
    wit = BatchWitness(version=vbyte, chunk_infos=infos,
                       blob_bytes=b"", header=header)
    info = build_batch_info_validium(wit)
    assert info.batch_hash == header.batch_hash()
    assert info.encryption_key == infos[0].encryption_key

    header.post_state_root = B32(0xFF)
    with pytest.raises(AssertionError):
        build_batch_info_validium(wit)

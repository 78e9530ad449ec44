"""Chunk digest helpers and witness -> ChunkInfo folding, plus the
chunk -> batch chaining path across the types layers."""

from zkvm_prover_tpu.ops.keccak import keccak256
from zkvm_prover_tpu.types.base import ForkName, Version
from zkvm_prover_tpu.types.chunk import (
    ChunkWitness,
    chunk_info_from_execution,
    rolling_msg_queue_hash,
    tx_bytes_hash,
)
from zkvm_prover_tpu.types.chunk.witness import BlockExecutionSummary


def test_rolling_msg_queue_hash_truncation():
    h0 = b"\x00" * 32
    h1 = rolling_msg_queue_hash(h0, [b"\x11" * 32])
    # last 4 bytes cleared
    assert h1[28:] == b"\x00" * 4
    assert h1 != h0
    # chaining order matters
    h2a = rolling_msg_queue_hash(h0, [b"\x11" * 32, b"\x22" * 32])
    h2b = rolling_msg_queue_hash(h0, [b"\x22" * 32, b"\x11" * 32])
    assert h2a != h2b
    # incremental == batch
    assert rolling_msg_queue_hash(h1, [b"\x22" * 32]) == h2a


def test_tx_bytes_hash():
    txs = [b"\x02\xf8\x01", b"\x02\xf8\x02\x03"]
    length, digest = tx_bytes_hash(txs)
    assert length == 7
    assert digest == keccak256(b"".join(txs))


def _blocks():
    return [
        BlockExecutionSummary(
            number=100, timestamp=1000, base_fee_per_gas=7, gas_limit=10**7,
            gas_used=21000, state_root_after=b"\x02" * 32,
            block_hash=b"\xb1" * 32,
            encoded_l2_txs=[b"\xaa" * 10], l1_msg_hashes=[b"\x11" * 32],
            num_txs=2,
        ),
        BlockExecutionSummary(
            number=101, timestamp=1001, base_fee_per_gas=7, gas_limit=10**7,
            gas_used=42000, state_root_after=b"\x03" * 32,
            block_hash=b"\xb2" * 32,
            encoded_l2_txs=[b"\xbb" * 5], l1_msg_hashes=[],
            num_txs=1,
        ),
    ]


def test_chunk_info_from_execution():
    w = ChunkWitness(
        version=Version.galileo_v2().as_version_byte(),
        blocks=_blocks(),
        prev_msg_queue_hash=b"\x0a" * 32,
        fork_name=ForkName.GALILEO_V2,
        prev_state_root=b"\x01" * 32,
        withdraw_root=b"\x05" * 32,
    )
    info = chunk_info_from_execution(w)
    assert info.initial_block_number == 100
    assert info.post_state_root == b"\x03" * 32
    assert info.tx_data_length == 15
    assert info.tx_data_digest == keccak256(b"\xaa" * 10 + b"\xbb" * 5)
    assert info.post_msg_queue_hash == rolling_msg_queue_hash(
        b"\x0a" * 32, [b"\x11" * 32]
    )
    assert len(info.block_ctxs) == 2
    assert info.block_ctxs[0].num_l1_msgs == 1
    # PI hash computes for the fork
    assert len(info.pi_hash_by_version(Version.galileo_v2())) == 32


def test_chunk_chaining_via_types():
    w1 = ChunkWitness(
        version=Version.galileo().as_version_byte(),
        blocks=_blocks(),
        prev_msg_queue_hash=b"\x00" * 32,
        fork_name=ForkName.GALILEO,
        prev_state_root=b"\x01" * 32,
        withdraw_root=b"\x05" * 32,
    )
    info1 = chunk_info_from_execution(w1)
    blocks2 = _blocks()
    for b in blocks2:
        b.number += 2
    w2 = ChunkWitness(
        version=w1.version,
        blocks=blocks2,
        prev_msg_queue_hash=info1.post_msg_queue_hash,
        fork_name=ForkName.GALILEO,
        prev_state_root=info1.post_state_root,
        withdraw_root=b"\x05" * 32,
    )
    info2 = chunk_info_from_execution(w2)
    info2.validate(info1, Version.galileo())


def test_euclidv1_legacy_data_hash_set():
    w = ChunkWitness(
        version=Version.euclid_v1().as_version_byte(),
        blocks=_blocks(),
        prev_msg_queue_hash=b"\x00" * 32,
        fork_name=ForkName.EUCLID_V1,
        prev_state_root=b"\x01" * 32,
    )
    info = chunk_info_from_execution(w)
    assert info.data_hash != b"\x00" * 32
    # v6 PI requires data_hash; should not raise
    info.pi_hash_by_version(Version.euclid_v1())

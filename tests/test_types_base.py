"""types-base layer: version byte packing, PI encodings, chaining validation.

Includes the reference's own golden vector
(crates/integration/tests/bundle_circuit.rs verify_bundle_info_pi) — passing
it proves byte-level parity of the PI encoding + keccak256 path.
"""

import pytest

from zkvm_prover_tpu.ops.keccak import keccak256
from zkvm_prover_tpu.types.base import (
    BatchInfo,
    BlockContextV2,
    BundleInfo,
    ChunkInfo,
    Domain,
    ForkName,
    STFVersion,
    Version,
)


def test_keccak_vectors():
    assert (
        keccak256(b"").hex()
        == "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )
    assert (
        keccak256(b"abc").hex()
        == "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
    )


def test_version_byte_packing():
    assert Version.euclid_v1().as_version_byte() == 6
    assert Version.galileo().as_version_byte() == 9
    assert Version.galileo_v2().as_version_byte() == 10
    # validium: domain=1 << 6 | stf=1
    assert Version.validium_v1().as_version_byte() == 65
    for v in (
        Version.euclid_v1(),
        Version.euclid_v2(),
        Version.feynman(),
        Version.galileo(),
        Version.galileo_v2(),
        Version.validium_v1(),
    ):
        rt = Version.from_version_byte(v.as_version_byte())
        assert rt == v


def test_bundle_pi_hash_golden_reference_vector():
    """Exact vector from the reference test suite (bundle_circuit.rs)."""
    info = BundleInfo(
        chain_id=534352,
        msg_queue_hash=b"\x00" * 32,
        num_batches=12,
        prev_state_root=bytes.fromhex(
            "0090ecc1308e0033e8cfef3b6aabe1de0a93361a14075cf6246e002e62944fa3"
        ),
        prev_batch_hash=bytes.fromhex(
            "6f8315e6c702a9ea8f83fb46d2a4a8e4a01d46a5bf72de7fac179f373cf27d68"
        ),
        post_state_root=bytes.fromhex(
            "0e9c09b32fd71c248df1dbc2b8fcbf69839257296f447deb6a8f8f49b9e158e4"
        ),
        batch_hash=bytes.fromhex(
            "1655c7521aa3045f5267ff8c6b21f9ad42024f79369c447500fd04c1077c2ad5"
        ),
        withdraw_root=bytes.fromhex(
            "97f9728ad48ff896b4272abcecd9a6a46577c24fbf2504f5ed2c3178c857263a"
        ),
        encryption_key=None,
    )
    assert (
        info.pi_hash_by_version(Version.euclid_v1()).hex()
        == "5e49fc59ce02b42a2f693c738c582b36bd08e9cfe3acb8cee299216743869bd4"
    )


def test_block_ctx_roundtrip():
    ctx = BlockContextV2(
        timestamp=1234567, base_fee=10**12, gas_limit=30_000_000,
        num_txs=17, num_l1_msgs=3,
    )
    b = ctx.to_bytes()
    assert len(b) == 52
    assert BlockContextV2.from_bytes(b) == ctx


def test_chunk_pi_lengths_and_version_prefix():
    info = ChunkInfo(
        chain_id=534352,
        prev_state_root=b"\x01" * 32,
        post_state_root=b"\x02" * 32,
        withdraw_root=b"\x03" * 32,
        data_hash=b"\x04" * 32,
        tx_data_digest=b"\x05" * 32,
        prev_msg_queue_hash=b"\x06" * 32,
        post_msg_queue_hash=b"\x07" * 32,
        initial_block_number=99,
        block_ctxs=[
            BlockContextV2(1, 2, 3, 4, 5),
            BlockContextV2(6, 7, 8, 9, 10),
        ],
    )
    v1 = info.pi_euclidv1()
    assert len(v1) == 8 + 32 * 5
    v2 = info.pi_euclidv2()
    assert len(v2) == 8 + 32 * 6 + 8 + 52 * 2
    g = info.pi_galileo(Version.galileo())
    assert g[0] == 9 and g[1:] == v2
    # galileo_v2 same encoding, different version byte
    g2 = info.pi_galileo_v2(Version.galileo_v2())
    assert g2[0] == 10 and g2[1:] == v2


def test_chunk_validium_pi():
    info = ChunkInfo(
        chain_id=1,
        prev_state_root=b"\x01" * 32,
        post_state_root=b"\x02" * 32,
        withdraw_root=b"\x03" * 32,
        prev_blockhash=b"\x08" * 32,
        post_blockhash=b"\x09" * 32,
        encryption_key=b"\xaa" * 33,
    )
    pv = info.pi_validium(Version.validium_v1())
    assert pv[0] == 65
    assert pv.endswith(b"\x09" * 32 + b"\xaa" * 33)
    with pytest.raises(AssertionError):
        ChunkInfo(
            chain_id=1,
            prev_state_root=b"\x01" * 32,
            post_state_root=b"\x02" * 32,
            withdraw_root=b"\x03" * 32,
        ).pi_validium(Version.validium_v1())


def test_chunk_chaining_validation():
    a = ChunkInfo(
        chain_id=1,
        prev_state_root=b"\x01" * 32,
        post_state_root=b"\x02" * 32,
        withdraw_root=b"\x03" * 32,
        prev_msg_queue_hash=b"\x0a" * 32,
        post_msg_queue_hash=b"\x0b" * 32,
    )
    b = ChunkInfo(
        chain_id=1,
        prev_state_root=b"\x02" * 32,
        post_state_root=b"\x04" * 32,
        withdraw_root=b"\x03" * 32,
        prev_msg_queue_hash=b"\x0b" * 32,
        post_msg_queue_hash=b"\x0c" * 32,
    )
    b.validate(a, Version.galileo())
    bad = ChunkInfo(
        chain_id=1,
        prev_state_root=b"\xff" * 32,
        post_state_root=b"\x04" * 32,
        withdraw_root=b"\x03" * 32,
        prev_msg_queue_hash=b"\x0b" * 32,
    )
    with pytest.raises(AssertionError):
        bad.validate(a, Version.galileo())


def test_batch_pi_and_validation():
    a = BatchInfo(
        parent_state_root=b"\x01" * 32,
        parent_batch_hash=b"\x02" * 32,
        state_root=b"\x03" * 32,
        batch_hash=b"\x04" * 32,
        chain_id=7,
        withdraw_root=b"\x05" * 32,
        prev_msg_queue_hash=b"\x06" * 32,
        post_msg_queue_hash=b"\x07" * 32,
    )
    assert len(a.pi_euclidv1()) == 32 * 5 + 8
    assert len(a.pi_euclidv2()) == 32 * 7 + 8
    assert a.pi_galileo(Version.galileo())[0] == 9
    b = BatchInfo(
        parent_state_root=b"\x03" * 32,
        parent_batch_hash=b"\x04" * 32,
        state_root=b"\x08" * 32,
        batch_hash=b"\x09" * 32,
        chain_id=7,
        withdraw_root=b"\x05" * 32,
        prev_msg_queue_hash=b"\x07" * 32,
        post_msg_queue_hash=b"\x0a" * 32,
    )
    b.validate(a, Version.galileo())
    with pytest.raises(AssertionError):
        a.validate(b, Version.galileo())


def test_bundle_versioned_prefix_is_b256_left_padded():
    info = BundleInfo(chain_id=1, num_batches=2)
    pi = info.pi_by_version(Version.galileo())
    assert pi[:31] == bytes(31)
    assert pi[31] == 9
    assert pi[32:] == info.pi_euclidv2()

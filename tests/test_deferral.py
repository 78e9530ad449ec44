"""Deferral data: Poseidon2 Merkle tree over input_commits + envelope
codec (parity with the reference's deferral_merkle_proofs —
crates/prover/src/prover/mod.rs:392-397)."""

from zkvm_prover_tpu.host.deferral import (
    decode_and_verify,
    deferral_tree,
    encode_deferral,
    verify_deferral_path,
)


def _commits(n):
    return [bytes([i + 1] * 32) for i in range(n)]


def test_tree_paths_verify():
    for n in (1, 2, 3, 4, 5, 8):
        commits = _commits(n)
        root, paths = deferral_tree(commits)
        for i, (c, path) in enumerate(zip(commits, paths)):
            assert verify_deferral_path(root, i, c, path), (n, i)
        # wrong leaf fails
        assert not verify_deferral_path(root, 0, bytes(32), paths[0])


def test_envelope_codec_roundtrip():
    commits = _commits(3)
    blob = encode_deferral(commits)
    assert decode_and_verify(blob, commits)
    # tampered blob / commits fail
    bad = bytearray(blob)
    bad[0] ^= 1
    assert not decode_and_verify(bytes(bad), commits)
    assert not decode_and_verify(blob, _commits(2))
    assert not decode_and_verify(blob, _commits(4))
    assert encode_deferral([]) == b""
    assert decode_and_verify(b"", [])
    assert not decode_and_verify(b"x", [])

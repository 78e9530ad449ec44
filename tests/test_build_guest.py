"""Release-asset pipeline (build-guest analog; reference
crates/build-guest/src/main.rs:186-394, verifier.rs:107-156)."""

import json

from zkvm_prover_tpu.bin.build_guest import (
    generate_app_assets,
    verify_assets,
)


def test_generate_and_verify_assets(tmp_path):
    index = generate_app_assets(tmp_path)
    assert set(index) == {"chunk", "batch", "bundle"}
    assert verify_assets(tmp_path)

    # child commitments thread chunk -> batch -> bundle
    batch_children = json.loads(
        (tmp_path / "batch" / "child_commitments.json").read_text()
    )
    chunk_commits = json.loads(
        (tmp_path / "chunk" / "commitments.json").read_text()
    )
    assert batch_children == chunk_commits

    # canonical digests match the bundle commitments
    d1 = (tmp_path / "bundle" / "digest_1.hex").read_text()
    assert d1 == "0x" + index["bundle"]["exe_commit"]

    # tampering is detected
    (tmp_path / "chunk" / "commitments.json").write_text(
        json.dumps({"exe": "00" * 32, "vm": "11" * 32})
    )
    assert not verify_assets(tmp_path)


def test_verifier_setup_from_assets(tmp_path):
    generate_app_assets(tmp_path)
    from zkvm_prover_tpu.host.verifier import UniversalVerifier

    v = UniversalVerifier.setup(str(tmp_path / "chunk"))
    assert v.app.name == "chunk"

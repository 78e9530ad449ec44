"""Verifier-only regression tier: a stored proof JSON must keep verifying
against the current code (parity with the reference's testdata proofs —
crates/verifier/src/verifier.rs:143-216, which are #[ignore]d when the
release assets are stale; here a vk mismatch skips with a message telling
the developer to regenerate)."""

import json
from pathlib import Path

import pytest

from zkvm_prover_tpu.host.app import get_app
from zkvm_prover_tpu.host.proof_types import StarkProof
from zkvm_prover_tpu.host.verifier import UniversalVerifier
from zkvm_prover_tpu.stark.config import StarkConfig
from zkvm_prover_tpu.stark.fri import FriConfig

DATA = Path(__file__).parent / "testdata" / "fibonacci-proof.json"


def test_stored_proof_still_verifies():
    d = json.loads(DATA.read_text())
    app = get_app(d["app_name"])
    proof = StarkProof.from_dict(d["proof"])
    if proof.baseline != app.vk_bytes():
        pytest.skip(
            "stored proof's vk differs from the current circuit — the "
            "constraint system changed (expected: vks bind constraints); "
            "regenerate tests/testdata/fibonacci-proof.json"
        )
    cfg = StarkConfig(fri=FriConfig(log_blowup=1, **d["fri"]))
    assert UniversalVerifier.verify_stark_proof_with_vk(
        app.vk_bytes(), proof, cfg
    )
    # tamper: flip one proof byte -> decode or verification must fail
    raw = bytearray(proof.proof)
    raw[len(raw) // 2] ^= 1
    bad = StarkProof.from_dict(d["proof"])
    bad.proof = bytes(raw)
    assert not UniversalVerifier.verify_stark_proof_with_vk(
        app.vk_bytes(), bad, cfg
    )

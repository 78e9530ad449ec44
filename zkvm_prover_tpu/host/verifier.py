"""Host verifier API (parity with reference `UniversalVerifier` at
crates/verifier/src/verifier.rs:17-141): commitment checks + proof decode +
machine verification; EVM-proof verification lands with the SNARK wrapper.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional

from ..stark import machine
from ..stark.config import StarkConfig
from . import serialization
from .app import get_app
from .proof_types import EvmProof, ProofEnum, StarkProof


class UniversalVerifier:
    def __init__(self, app_name: str, stark: Optional[StarkConfig] = None):
        self.app = get_app(app_name)
        self.stark = stark or StarkConfig()

    @classmethod
    def setup(cls, assets_dir: str) -> "UniversalVerifier":
        """Load from a release-assets dir containing app_vk.json
        (release-asset layout analog, verifier.rs:94-108)."""
        meta = json.loads((Path(assets_dir) / "app_vk.json").read_text())
        v = cls(meta["app_name"])
        expect = bytes.fromhex(meta["vk"])
        assert v.app.vk_bytes() == expect, "vk mismatch vs release assets"
        return v

    def verify_stark_proof(self, proof: StarkProof) -> bool:
        return self.verify_stark_proof_with_vk(
            self.app.vk_bytes(), proof, self.stark, app=self.app
        )

    @staticmethod
    def verify_stark_proof_with_vk(
        vk: bytes, proof: StarkProof, stark: Optional[StarkConfig] = None,
        app=None,
    ) -> bool:
        # commitment guard (verifier.rs:77-80): baseline must carry the
        # expected app vk
        if proof.baseline != vk:
            return False
        if app is None:
            # resolve app from the vk via the registry
            from .app import _REGISTRY

            app = None
            for name in _REGISTRY:
                cand = get_app(name)
                if cand.vk_bytes() == vk:
                    app = cand
                    break
            if app is None:
                return False
        try:
            mproof = serialization.decode_machine_proof(proof.proof)
        except Exception:
            return False
        # bind the revealed PI hash to the public values inside the proof
        if app.pi_hash_from_meta(mproof.meta) != proof.user_pvs_proof:
            return False
        return machine.verify_machine(
            app.airs(), mproof, stark or StarkConfig()
        )

    def verify_evm_proof(self, proof: EvmProof) -> bool:
        raise NotImplementedError(
            "EVM (SNARK) verification lands with the BN254 wrapper "
            "(ROADMAP Phase 7)"
        )

    def dump_vk(self, assets_dir: str) -> None:
        Path(assets_dir).mkdir(parents=True, exist_ok=True)
        (Path(assets_dir) / "app_vk.json").write_text(
            json.dumps(
                {"app_name": self.app.name, "vk": self.app.vk_bytes().hex()}
            )
        )

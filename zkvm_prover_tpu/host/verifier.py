"""Host verifier API (parity with reference `UniversalVerifier` at
crates/verifier/src/verifier.rs:17-141): commitment checks + proof decode +
machine verification; EVM-proof verification lands with the SNARK wrapper.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional

import numpy as np

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
        # Everything below operates on the untrusted proof envelope: a
        # malformed or hostile encoding must yield a clean False, never an
        # assertion/index error escaping to the caller (the reference
        # verifier returns Result the same way, verifier.rs:60-92).
        try:
            return UniversalVerifier._verify_decoded(
                vk, proof, stark or StarkConfig(), app
            )
        except Exception:
            return False

    @staticmethod
    def _verify_decoded(
        vk: bytes, proof: StarkProof, stark: StarkConfig, app
    ) -> bool:
        if proof.deferral_discharge:
            # deferred aggregation: the guest deferred child verification;
            # the envelope carries a discharge proof (host/deferred.py)
            from .deferred import verify_deferred

            return verify_deferred(proof, stark)
        mproof = serialization.decode_machine_proof(proof.proof)
        airs = app.airs_for_meta(mproof.meta)
        n_app = len(airs)
        # bind the revealed PI hash to the public values inside the proof
        if app.pi_hash_from_meta(mproof.meta[:n_app]) != proof.user_pvs_proof:
            return False

        # verifier-in-circuit aggregation: rebuild the wire verification
        # program from the claimed children (registered app circuits at the
        # claimed heights) and pin the digest over (child vk, child PVs).
        # Everything in agg_children is an untrusted hint — a mismatch in
        # app, heights, or PVs fails either the digest pin or the machine
        # verification against the rebuilt preprocessed program.
        if proof.agg_children:
            from ..recursion.aggregation import (
                TAG_LEAF,
                ChildSlot,
                child_verification_airs,
                digest_bytes,
                node_digest_words,
            )
            from .app import app_for_vk

            from ..recursion.aggregation import input_commit
            from .deferral import decode_and_verify

            slots = []
            children = []
            commits = []
            for rec in proof.agg_children:
                child_app = app_for_vk(rec.vk)
                if child_app is None:
                    return False
                # rebuild the child's AIR list at its claimed heights
                # (VM apps have height-dependent preprocessed schedules)
                meta_like = [(int(ln), None, []) for ln in rec.log_ns]
                slot = ChildSlot(
                    child_app.airs_for_meta(meta_like), rec.log_ns, stark
                )
                slots.append(slot)
                children.append((slot.vk_words, rec.pvs))
                commits.append(input_commit(slot.vk_words, rec.pvs))
            # input_commits + deferral Merkle data must match the children
            if proof.input_commits != commits:
                return False
            if not decode_and_verify(proof.deferral_merkle_proofs, commits):
                return False
            airs = airs + child_verification_airs(TAG_LEAF, slots)
            if len(mproof.meta) != len(airs):
                return False
            # PublicBindAir is the third wire AIR (n_app + 2)
            (_, _, digest_pvs) = mproof.meta[n_app + 2]
            expected = digest_bytes(node_digest_words(TAG_LEAF, children))
            if digest_bytes(
                np.array(digest_pvs, dtype=np.uint32)
            ) != expected:
                return False

        return machine.verify_machine(airs, mproof, stark)

    def verify_evm_proof(self, proof: EvmProof) -> bool:
        """EvmProof verification (verify_evm_proof analog,
        crates/verifier/src/evm.rs:38-43): PLONK verify (host + generated
        EVM bytecode under the mini-EVM simulator), instance/vk binding,
        and the deferred KZG accumulator pairing."""
        from ..snark import wrapper as snark_wrapper

        return snark_wrapper.verify_evm_proof(self.app.vk_bytes(), proof)

    def dump_vk(self, assets_dir: str) -> None:
        Path(assets_dir).mkdir(parents=True, exist_ok=True)
        (Path(assets_dir) / "app_vk.json").write_text(
            json.dumps(
                {"app_name": self.app.name, "vk": self.app.vk_bytes().hex()}
            )
        )

"""Host Prover/UniversalVerifier API: universal tasks, proof envelope JSON
schema, disk proof cache, self-verification, vk guards."""

import json

import pytest

from zkvm_prover_tpu.host import (
    ProofEnum,
    Prover,
    ProverConfig,
    ProvingTask,
    StarkProof,
    UniversalVerifier,
)
from zkvm_prover_tpu.host.prover import ProverError
from zkvm_prover_tpu.stark.config import fast_test_config


def make_task(identifier="t-1"):
    return ProvingTask(
        serialized_witness=[json.dumps({"log_n": 4, "x0": 1, "x1": 1}).encode()],
        fork_name="galileo",
        identifier=identifier,
    )


@pytest.fixture(scope="module")
def proven(tmp_path_factory):
    cache = tmp_path_factory.mktemp("proofs")
    cfg = ProverConfig(
        app_name="fibonacci", cache_dir=str(cache), stark=fast_test_config()
    )
    prover = Prover.setup(cfg)
    task = make_task()
    proof = prover.gen_proof_universal(task)
    return prover, task, proof, cache


def test_prove_and_self_verify(proven):
    prover, task, proof, _ = proven
    assert isinstance(proof, StarkProof)
    assert proof.stat.total_cycles == 16
    assert len(proof.user_pvs_proof) == 32
    v = UniversalVerifier("fibonacci", fast_test_config())
    assert v.verify_stark_proof(proof)


def test_proof_cache_roundtrip(proven):
    prover, task, proof, cache = proven
    files = list(cache.glob("*.json"))
    assert len(files) == 1
    # second call returns the cached proof (much faster; equality checked)
    proof2 = prover.gen_proof_universal(task)
    assert proof2.proof == proof.proof
    assert proof2.user_pvs_proof == proof.user_pvs_proof


def test_json_schema_roundtrip(proven):
    _, _, proof, _ = proven
    d = proof.to_dict()
    s = json.dumps(d)
    back = ProofEnum.from_dict(json.loads(s))
    assert isinstance(back, StarkProof)
    assert back.proof == proof.proof
    assert back.stat.total_cycles == proof.stat.total_cycles


def test_reject_wrong_vk(proven):
    _, _, proof, _ = proven
    assert not UniversalVerifier.verify_stark_proof_with_vk(
        b"\x00" * 64, proof, fast_test_config()
    )


def test_reject_tampered_pi_hash(proven):
    _, _, proof, _ = proven
    bad = StarkProof.from_dict(proof.to_dict())
    bad.user_pvs_proof = bytes([proof.user_pvs_proof[0] ^ 1]) + proof.user_pvs_proof[1:]
    v = UniversalVerifier("fibonacci", fast_test_config())
    assert not v.verify_stark_proof(bad)


def test_all_zero_pv_precheck():
    cfg = ProverConfig(app_name="fibonacci", stark=fast_test_config())
    prover = Prover.setup(cfg)

    class ZeroApp(type(prover.app)):
        def execute(self, task):
            insts, _ = super().execute(task)
            return insts, b"\x00" * 32

    prover.app = ZeroApp()
    with pytest.raises(ProverError):
        prover.gen_proof_stark(make_task("t-zero"))


def test_two_air_app():
    cfg = ProverConfig(app_name="fib-double", stark=fast_test_config())
    prover = Prover.setup(cfg)
    task = ProvingTask(
        serialized_witness=[
            json.dumps({"log_n_fib": 4, "log_n_dbl": 3}).encode()
        ],
        identifier="t-2",
    )
    proof = prover.gen_proof_universal(task)
    v = UniversalVerifier("fib-double", fast_test_config())
    assert v.verify_stark_proof(proof)
    # cross-app verification must fail (different vk)
    vf = UniversalVerifier("fibonacci", fast_test_config())
    assert not vf.verify_stark_proof(proof)


def test_vk_dump_and_setup(tmp_path):
    v = UniversalVerifier("fibonacci", fast_test_config())
    v.dump_vk(str(tmp_path))
    v2 = UniversalVerifier.setup(str(tmp_path))
    assert v2.app.name == "fibonacci"

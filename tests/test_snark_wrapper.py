"""BN254 SNARK wrapper layer: PLONK prove/verify, Poseidon2-Fr gadget,
EvmProof wrapping, and the generated EVM-bytecode verifier under the
mini-EVM simulator.

Reference analogs: gen_proof_snark (crates/prover/src/prover/mod.rs:
419-432), EvmProof instances (crates/types/src/proof.rs:221-239),
verifier.bin simulation (crates/verifier/src/evm.rs:38-43).
"""

import copy

import pytest

from zkvm_prover_tpu.fields import bn254 as bn
from zkvm_prover_tpu.snark import (
    fr,
    plonk,
    poseidon2_fr as p2,
    verifier_contract as vc,
    wrapper,
)


@pytest.fixture(scope="module")
def small_srs():
    return bn.KzgSrs.generate_insecure(7, tau=0xDEADBEEF12345)


@pytest.fixture(scope="module")
def small_proof(small_srs):
    cb = plonk.CircuitBuilder()
    x = cb.var(6)
    y = cb.var(7)
    p1v, p2v = 45, 55
    p1 = cb.var(p1v)
    pv2 = cb.var(p2v)
    cb.public_input(p1)
    cb.public_input(pv2)
    t = cb.mul(x, y)
    t2 = cb.add_const(t, 3)
    cb.assert_eq(t2, p1)
    y2 = cb.mul(y, y)
    s = cb.add(x, y2)
    cb.assert_eq(s, pv2)
    bit = cb.var(1)
    cb.assert_bool(bit)
    lin = cb.linear([(2, x), (3, y), (5, bit)], const=11)
    assert cb.val(lin) == 2 * 6 + 3 * 7 + 5 + 11
    assert cb.check() == []
    pk = plonk.setup(cb, small_srs)
    proof = plonk.prove(pk, cb)
    return pk, proof, [p1v, p2v]


def test_fr_ntt_roundtrip():
    coeffs = [i * 31 + 7 for i in range(16)]
    ev = fr.ntt(coeffs, 4)
    back = fr.ntt(ev, 4, inverse=True)
    assert back == coeffs
    # coset roundtrip
    ev2 = fr.evals_on_coset(coeffs, 5, fr.GENERATOR)
    back2 = fr.coeffs_from_coset(ev2, 5, fr.GENERATOR)
    assert back2[:16] == coeffs and all(c == 0 for c in back2[16:])
    # pointwise agreement
    om = fr.root_of_unity(4)
    assert ev[3] == fr.poly_eval(coeffs, pow(om, 3, fr.R))


def test_plonk_prove_verify(small_proof):
    pk, proof, public = small_proof
    assert plonk.verify(pk.vk, proof, public)


def test_plonk_rejects_wrong_public(small_proof):
    pk, proof, public = small_proof
    assert not plonk.verify(pk.vk, proof, [public[0] + 1, public[1]])


def test_plonk_rejects_tampered_proof(small_proof):
    pk, proof, public = small_proof
    bad = copy.deepcopy(proof)
    bad.evals["a"] = (bad.evals["a"] + 1) % plonk.R
    assert not plonk.verify(pk.vk, bad, public)
    bad2 = copy.deepcopy(proof)
    bad2.comms["z"] = bn.g1_add(bad2.comms["z"], bn.G1_GEN)
    assert not plonk.verify(pk.vk, bad2, public)
    bad3 = copy.deepcopy(proof)
    bad3.comms["w_zeta"], bad3.comms["w_zeta_omega"] = (
        bad3.comms["w_zeta_omega"], bad3.comms["w_zeta"])
    assert not plonk.verify(pk.vk, bad3, public)


def test_plonk_proof_serialization(small_proof):
    pk, proof, public = small_proof
    rt = plonk.PlonkProof.from_bytes(proof.to_bytes())
    assert plonk.verify(pk.vk, rt, public)


def test_poseidon2_fr_circuit_matches_host():
    cb = plonk.CircuitBuilder()
    ins = [123456789, 987654321, 555]
    vars_ = [cb.var(v) for v in ins]
    outs = p2.circuit_permute(cb, vars_)
    assert [cb.val(v) for v in outs] == p2.permute(ins)
    assert cb.check() == []

    cb2 = plonk.CircuitBuilder()
    xs = [i * 7 + 1 for i in range(5)]
    d = p2.circuit_sponge(cb2, [cb2.var(v) for v in xs])
    assert cb2.val(d) == p2.sponge(xs)
    assert cb2.check() == []


def test_poseidon2_fr_sponge_length_domain_separation():
    assert p2.sponge([1, 2]) != p2.sponge([1, 2, 0, 0])


def test_evm_interpreter_basics():
    from zkvm_prover_tpu.snark.evm import Evm

    # PUSH/ADD/RETURN: return (3 + 4)
    code = bytes([0x60, 3, 0x60, 4, 0x01, 0x5F, 0x52,
                  0x60, 0x20, 0x5F, 0xF3])
    out = Evm(code).run()
    assert int.from_bytes(out, "big") == 7
    # MULMOD
    code = bytes([0x60, 7, 0x60, 5, 0x60, 6, 0x09, 0x5F, 0x52,
                  0x60, 0x20, 0x5F, 0xF3])
    assert int.from_bytes(Evm(code).run(), "big") == (6 * 5) % 7


def test_evm_precompiles():
    from zkvm_prover_tpu.snark.evm import Evm

    evm = Evm(b"")
    # ecAdd: G + G == [2]G
    data = (bn.G1_GEN[0].to_bytes(32, "big") +
            bn.G1_GEN[1].to_bytes(32, "big")) * 2
    ok, out = evm._precompile(6, data)
    assert ok
    two_g = bn.g1_mul(bn.G1_GEN, 2)
    assert out == two_g[0].to_bytes(32, "big") + two_g[1].to_bytes(32, "big")
    # ecMul
    data = (bn.G1_GEN[0].to_bytes(32, "big") +
            bn.G1_GEN[1].to_bytes(32, "big") +
            (5).to_bytes(32, "big"))
    ok, out = evm._precompile(7, data)
    five_g = bn.g1_mul(bn.G1_GEN, 5)
    assert ok and out[:32] == five_g[0].to_bytes(32, "big")
    # modexp
    hdr = (32).to_bytes(32, "big") * 3
    ok, out = evm._precompile(
        5, hdr + (3).to_bytes(32, "big") + (4).to_bytes(32, "big")
        + (7).to_bytes(32, "big"))
    assert ok and int.from_bytes(out, "big") == pow(3, 4, 7)


def test_evm_verifier_accepts_and_rejects(small_proof):
    pk, proof, public = small_proof
    assert vc.evm_verify(pk.vk, proof, public)
    assert not vc.evm_verify(pk.vk, proof, [public[0] + 1, public[1]])
    bad = copy.deepcopy(proof)
    bad.evals["t_lo"] = (bad.evals["t_lo"] + 1) % plonk.R
    assert not vc.evm_verify(pk.vk, bad, public)


def test_evm_and_host_verifier_agree_on_garbage(small_proof):
    pk, proof, public = small_proof
    bad = copy.deepcopy(proof)
    bad.comms["a"] = bn.g1_mul(bn.G1_GEN, 99)
    host = plonk.verify(pk.vk, bad, public)
    evm = vc.evm_verify(pk.vk, bad, public)
    assert host == evm == False  # noqa: E712


# --- wrapper (EvmProof) ----------------------------------------------------

@pytest.fixture(scope="module")
def keys():
    return wrapper.wrapper_keys()


def test_wrap_and_verify_evm_proof(keys):
    app_vk = b"\x11" * 64
    proof_bytes = b"fake-root-proof-bytes" * 500
    pi = bytes(range(32))
    ep = wrapper.wrap_stark_proof(app_vk, proof_bytes, pi, keys)
    assert wrapper.verify_evm_proof(app_vk, ep, keys)
    assert ep.public_values() == list(pi)
    # instance layout: 46 scalars
    assert len(ep.instances) == 46 * 32


def test_wrapped_proof_rejects_wrong_vk(keys):
    ep = wrapper.wrap_stark_proof(b"\x11" * 64, b"proof", bytes(32), keys)
    assert not wrapper.verify_evm_proof(b"\x22" * 64, ep, keys)


def test_wrapped_proof_rejects_tampered_instances(keys):
    ep = wrapper.wrap_stark_proof(b"\x11" * 64, b"proof" * 100,
                                  bytes(range(32)), keys)
    # flip a PI byte instance
    off = (wrapper.N_ACC + wrapper.N_DIGEST) * 32 + 31
    bad = type(ep)(
        proof=ep.proof,
        instances=ep.instances[:off] + b"\x99" + ep.instances[off + 1:],
    )
    assert not wrapper.verify_evm_proof(b"\x11" * 64, bad, keys)
    # flip an accumulator limb
    bad2 = type(ep)(
        proof=ep.proof,
        instances=b"\x01" + ep.instances[1:],
    )
    assert not wrapper.verify_evm_proof(b"\x11" * 64, bad2, keys)


def test_wrapped_proof_rejects_tampered_blob(keys):
    ep = wrapper.wrap_stark_proof(b"\x11" * 64, b"proof" * 100,
                                  bytes(range(32)), keys)
    bad = type(ep)(
        proof=ep.proof[:100] + bytes([ep.proof[100] ^ 1]) + ep.proof[101:],
        instances=ep.instances,
    )
    assert not wrapper.verify_evm_proof(b"\x11" * 64, bad, keys)


def test_point_limb_roundtrip():
    p = bn.g1_mul(bn.G1_GEN, 0x123456789ABCDEF)
    limbs = wrapper.point_limbs(p)
    assert len(limbs) == 6
    assert all(0 <= v < (1 << wrapper.LIMB_BITS) for v in limbs)
    assert wrapper.limbs_to_point(limbs) == p


@pytest.mark.slow
def test_gen_proof_snark_through_host_prover(keys):
    """Full host path: ProvingTask -> STARK (self-verified) -> PLONK
    wrapper -> EvmProof -> UniversalVerifier.verify_evm_proof (host
    PLONK + accumulator pairing + generated-bytecode EVM simulation).
    Reference: gen_proof_universal(with_snark=True) ->
    verify_evm_proof (prover/mod.rs:419-432, verifier/evm.rs:38-43)."""
    import json

    from zkvm_prover_tpu.host.prover import Prover, ProverConfig
    from zkvm_prover_tpu.host.verifier import UniversalVerifier
    from zkvm_prover_tpu.stark.config import StarkConfig
    from zkvm_prover_tpu.stark.fri import FriConfig

    tiny = StarkConfig(fri=FriConfig(log_blowup=1, num_queries=2,
                                     proof_of_work_bits=2))
    prover = Prover.setup(ProverConfig(app_name="fibonacci", stark=tiny))
    task = __import__("zkvm_prover_tpu.host.task",
                      fromlist=["ProvingTask"]).ProvingTask(
        serialized_witness=[json.dumps({"log_n": 4}).encode()],
    )
    evm_proof = prover.gen_proof_universal(task, with_snark=True)
    verifier = UniversalVerifier("fibonacci", tiny)
    assert verifier.verify_evm_proof(evm_proof)
    # PI bytes surface through the on-chain instance layout
    stark = prover.gen_proof_stark(task)
    assert bytes(evm_proof.public_values()) == stark.user_pvs_proof
    # tampering the instances breaks it
    bad = type(evm_proof)(
        proof=evm_proof.proof,
        instances=b"\x01" + evm_proof.instances[1:],
    )
    assert not verifier.verify_evm_proof(bad)

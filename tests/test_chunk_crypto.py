"""Precompile crypto providers: secp256k1 ecrecover, P-256 verify, ECIES,
validium L1-message decryption (reference
crates/types/chunk/src/crypto/*.rs, scroll/types/validium.rs)."""

import hashlib
import os

from zkvm_prover_tpu.ops.keccak import keccak256
from zkvm_prover_tpu.types.chunk.crypto import (
    ecies_decrypt,
    ecies_encrypt,
    ecrecover,
    p256_verify,
)
from zkvm_prover_tpu.types.chunk.crypto import validium as V
from zkvm_prover_tpu.types.chunk.crypto.ecies import public_key_of
from zkvm_prover_tpu.types.chunk.crypto.weierstrass import (
    SECP256K1,
    SECP256R1,
)


def _sign(curve, sk, z, k):
    R = curve.mul(k, curve.generator())
    r = R[0] % curve.n
    s = (pow(k, curve.n - 2, curve.n) * (z + r * sk)) % curve.n
    return r, s, R[1] & 1


def test_ecrecover_known_address():
    sk = 0x4C0883A69102937D6231471B5DBB6204FE5129617082792AE468D01A3F362318
    pk = SECP256K1.mul(sk, SECP256K1.generator())
    addr = keccak256(
        pk[0].to_bytes(32, "big") + pk[1].to_bytes(32, "big")
    )[12:]
    h = keccak256(b"scroll chunk")
    z = int.from_bytes(h, "big") % SECP256K1.n
    r, s, v = _sign(SECP256K1, sk, z, k=0x1337C0DE)
    assert ecrecover(h, v, r, s) == addr
    # wrong recovery id -> different address
    assert ecrecover(h, 1 - v, r, s) != addr
    # malformed r
    assert ecrecover(h, v, 0, s) is None


def test_p256_verify():
    sk = 0xDEADBEEF12345678
    pk = SECP256R1.mul(sk, SECP256R1.generator())
    h = hashlib.sha256(b"rip-7212").digest()
    z = int.from_bytes(h, "big") % SECP256R1.n
    r, s, _ = _sign(SECP256R1, sk, z, k=0x424242)
    assert p256_verify(h, r, s, pk[0], pk[1])
    assert not p256_verify(hashlib.sha256(b"other").digest(), r, s,
                           pk[0], pk[1])
    assert not p256_verify(h, r, (s + 1) % SECP256R1.n, pk[0], pk[1])


def test_ecies_round_trip():
    sk = int.from_bytes(os.urandom(32), "big") % SECP256K1.n
    msg = os.urandom(57)
    ct = ecies_encrypt(public_key_of(sk), msg)
    assert ecies_decrypt(sk, ct) == msg
    # tamper -> auth failure
    bad = bytearray(ct)
    bad[-1] ^= 1
    try:
        ecies_decrypt(sk, bytes(bad))
        assert False, "tampered ciphertext accepted"
    except Exception:
        pass


def test_validium_relay_message_decrypt():
    sk = 0xABCDE12345
    to_plain = os.urandom(20)
    enc_to = ecies_encrypt(public_key_of(sk), to_plain)
    msg = V.SEL_FINALIZE_ERC20_ENC + V.abi_encode(
        V.ERC20_ENC_TYPES,
        [os.urandom(20), os.urandom(20), os.urandom(20), enc_to, 42,
         b"l2data"],
    )
    data = V.SEL_RELAY_MESSAGE + V.abi_encode(
        V.RELAY_TYPES, [os.urandom(20), os.urandom(20), 7, 9, msg]
    )
    out = V.decrypt_data(data, sk)
    assert out.startswith(V.SEL_RELAY_MESSAGE)
    *_, m2 = V.abi_decode(V.RELAY_TYPES, out[4:])
    assert m2.startswith(V.SEL_FINALIZE_ERC20)
    vals = V.abi_decode(V.ERC20_TYPES, m2[4:])
    assert vals[3] == to_plain and vals[4] == 42 and vals[5] == b"l2data"
    # non-deposit messages pass through untouched
    other = V.SEL_RELAY_MESSAGE + V.abi_encode(
        V.RELAY_TYPES, [os.urandom(20), os.urandom(20), 1, 1, b"\x01\x02"]
    )
    assert V.decrypt_data(other, sk) == other


def test_validium_tx_decrypt_passthrough():
    tx = V.TxL1Message(queue_index=1, gas_limit=21000, to=os.urandom(20),
                       value=0, sender=os.urandom(20), input=b"\xAA\xBB")
    out = V.decrypt(tx, 0x1234)
    assert out.input == tx.input and out.queue_index == 1

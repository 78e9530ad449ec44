"""ECIES over secp256k1 (parity with the reference's `ecies` crate defaults,
used for validium L1-message decryption at
crates/types/chunk/src/scroll/types/validium.rs:20-71).

Wire format (ecies-rs defaults): uncompressed ephemeral public key (65) ||
nonce (16) || GCM tag (16) || ciphertext. Key = HKDF-SHA256(no salt,
ikm = ephemeral_pk_bytes || shared_point_uncompressed, empty info, 32 bytes),
cipher = AES-256-GCM with the 16-byte nonce.
"""

from __future__ import annotations

import os

from cryptography.hazmat.primitives.ciphers.aead import AESGCM
from cryptography.hazmat.primitives.hashes import SHA256
from cryptography.hazmat.primitives.kdf.hkdf import HKDF

from .weierstrass import SECP256K1 as C

UNCOMPRESSED_LEN = 65
NONCE_LEN = 16
TAG_LEN = 16


def _uncompressed(pt) -> bytes:
    return b"\x04" + pt[0].to_bytes(32, "big") + pt[1].to_bytes(32, "big")


def _decode_point(data: bytes):
    assert len(data) == UNCOMPRESSED_LEN and data[0] == 4, (
        "expected uncompressed secp256k1 point"
    )
    pt = (int.from_bytes(data[1:33], "big"), int.from_bytes(data[33:], "big"))
    assert C.is_on_curve(pt), "point not on curve"
    return pt


def _derive_key(ephemeral_pk: bytes, shared_point) -> bytes:
    ikm = ephemeral_pk + _uncompressed(shared_point)
    return HKDF(algorithm=SHA256(), length=32, salt=None, info=b"").derive(
        ikm
    )


def ecies_decrypt(secret_key: int, payload: bytes) -> bytes:
    assert len(payload) >= UNCOMPRESSED_LEN + NONCE_LEN + TAG_LEN
    eph_bytes = payload[:UNCOMPRESSED_LEN]
    nonce = payload[UNCOMPRESSED_LEN : UNCOMPRESSED_LEN + NONCE_LEN]
    tag = payload[
        UNCOMPRESSED_LEN + NONCE_LEN : UNCOMPRESSED_LEN + NONCE_LEN + TAG_LEN
    ]
    ct = payload[UNCOMPRESSED_LEN + NONCE_LEN + TAG_LEN :]
    eph = _decode_point(eph_bytes)
    shared = C.mul(secret_key, eph)
    assert shared is not None
    key = _derive_key(eph_bytes, shared)
    # python cryptography's AESGCM expects ciphertext||tag
    return AESGCM(key).decrypt(nonce, ct + tag, None)


def ecies_encrypt(public_key, plaintext: bytes,
                  _rng=os.urandom) -> bytes:
    """Sender side (used by tests/witness builders)."""
    eph_sk = int.from_bytes(_rng(32), "big") % C.n or 1
    eph_pk = C.mul(eph_sk, C.generator())
    eph_bytes = _uncompressed(eph_pk)
    shared = C.mul(eph_sk, public_key)
    key = _derive_key(eph_bytes, shared)
    nonce = _rng(NONCE_LEN)
    ct_tag = AESGCM(key).encrypt(nonce, plaintext, None)
    ct, tag = ct_tag[:-TAG_LEN], ct_tag[-TAG_LEN:]
    return eph_bytes + nonce + tag + ct


def public_key_of(secret_key: int):
    return C.mul(secret_key, C.generator())

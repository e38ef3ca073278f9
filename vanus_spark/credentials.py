"""Sink credentials: typed models, secret masking, and AES-GCM
at-rest encryption (reference parity: pkg/sink_credentail.go,
pkg/crypto/aes/aes.go).

Wire format matches the reference byte-for-byte so ciphertexts are
interchangeable: hex(nonce[12] || AES-GCM(value)), with the key
zero-PADDED (ASCII '0', not NUL) or truncated to 16 bytes — the
reference's paddingKey quirk, reproduced deliberately.

Masking follows FillSinkCredential: an update whose secret fields are
the literal ``******`` keeps the stored values (the UI round-trip
pattern: secrets are never echoed back, and an unchanged masked field
must not clobber the stored secret).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

SECRETS_MASK = "******"
_NONCE_SIZE = 12


def _padded_key(key: str, size: int = 16) -> bytes:
    # paddingKey (aes.go:73-80): right-pad with ASCII '0' to size,
    # truncate beyond it
    while len(key) < size:
        key += "0"
    return key.encode()[:size]


def encrypt(value: str, key: str) -> str:
    from cryptography.hazmat.primitives.ciphers.aead import AESGCM

    nonce = os.urandom(_NONCE_SIZE)
    ct = AESGCM(_padded_key(key)).encrypt(nonce, value.encode(), None)
    return (nonce + ct).hex()


def decrypt(value: str, key: str) -> str:
    from cryptography.hazmat.primitives.ciphers.aead import AESGCM

    raw = bytes.fromhex(value)
    nonce, ct = raw[:_NONCE_SIZE], raw[_NONCE_SIZE:]
    return AESGCM(_padded_key(key)).decrypt(nonce, ct, None).decode()


@dataclass
class PlainSinkCredential:
    identifier: str
    secret: str
    type: str = "plain"

    _secret_fields = ("identifier", "secret")


@dataclass
class AkSkSinkCredential:
    access_key_id: str
    secret_access_key: str
    type: str = "aws"

    _secret_fields = ("access_key_id", "secret_access_key")


@dataclass
class GCloudSinkCredential:
    credential_json: str
    type: str = "gcloud"

    _secret_fields = ("credential_json",)


def mask(cred):
    """Outbound copy with every secret field replaced by the mask."""
    out = type(cred)(**{f: SECRETS_MASK for f in cred._secret_fields})
    return out


def fill(dst, src):
    """FillSinkCredential: masked fields in an UPDATE (dst) are
    restored from the STORED credential (src); type mismatch is a
    no-op."""
    if dst is None or src is None or dst.type != src.type:
        return dst
    for f in dst._secret_fields:
        if getattr(dst, f) == SECRETS_MASK:
            setattr(dst, f, getattr(src, f))
    return dst


def encrypt_credential(cred, key: str):
    """At-rest copy with every secret field AES-GCM encrypted."""
    out = type(cred)(
        **{f: encrypt(getattr(cred, f), key) for f in cred._secret_fields}
    )
    return out


def decrypt_credential(cred, key: str):
    out = type(cred)(
        **{f: decrypt(getattr(cred, f), key) for f in cred._secret_fields}
    )
    return out

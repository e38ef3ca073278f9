"""Sink credentials: masking, fill, AES-GCM at-rest encryption
(vanus_spark/credentials.py vs pkg/sink_credentail.go + crypto/aes)."""

from __future__ import annotations

import pytest


def test_encrypt_decrypt_roundtrip_and_wire_format():
    from vanus_spark.credentials import decrypt, encrypt

    ct = encrypt("super-secret", "k")
    raw = bytes.fromhex(ct)  # hex wire format
    assert len(raw) == 12 + len(b"super-secret") + 16  # nonce + ct + GCM tag
    assert decrypt(ct, "k") == "super-secret"
    # the reference pads keys with ASCII '0' to 16 bytes: a key and its
    # explicitly padded form are interchangeable
    assert decrypt(encrypt("x", "abc"), "abc0000000000000") == "x"
    # truncation beyond 16 bytes
    assert decrypt(encrypt("x", "A" * 20), "A" * 16) == "x"
    with pytest.raises(Exception):
        decrypt(ct, "wrong-key")


def test_mask_and_fill_roundtrip():
    from vanus_spark.credentials import (
        AkSkSinkCredential,
        PlainSinkCredential,
        SECRETS_MASK,
        fill,
        mask,
    )

    stored = PlainSinkCredential("user1", "pw1")
    shown = mask(stored)
    assert shown.identifier == SECRETS_MASK and shown.secret == SECRETS_MASK

    # UI round-trip: user edits nothing -> stored secrets survive
    update = PlainSinkCredential(SECRETS_MASK, SECRETS_MASK)
    assert fill(update, stored).secret == "pw1"
    # user rotates one field -> only that field changes
    update2 = PlainSinkCredential(SECRETS_MASK, "pw2")
    filled = fill(update2, stored)
    assert filled.identifier == "user1" and filled.secret == "pw2"
    # type mismatch is a no-op
    aws = AkSkSinkCredential(SECRETS_MASK, SECRETS_MASK)
    assert fill(aws, stored).access_key_id == SECRETS_MASK


def test_encrypt_credential_at_rest():
    from vanus_spark.credentials import (
        AkSkSinkCredential,
        decrypt_credential,
        encrypt_credential,
    )

    cred = AkSkSinkCredential("AKIA123", "shhh")
    enc = encrypt_credential(cred, "master-key")
    assert enc.access_key_id != "AKIA123" and enc.secret_access_key != "shhh"
    dec = decrypt_credential(enc, "master-key")
    assert dec.access_key_id == "AKIA123" and dec.secret_access_key == "shhh"

"""Public-key (recipient) encryption read-back — /Adobe.PubSec,
ISO 32000-1 §7.6.5, SubFilter adbe.pkcs7.s4/s5.

BEYOND the reference: it ships encryption/public_key.rs but its reader
(parser/encryption_handler.rs) never wires it, so recipient-encrypted
documents error there. Here a caller-supplied RSA private key (n, d)
opens the CMS EnvelopedData recipients, derives the §7.6.5.3 file key
(SHA-1 over seed + Recipients strings; SHA-256 for AESV3), and the
standard algorithms 1/1.A decrypt objects unchanged.
"""

from __future__ import annotations

import hashlib

import pytest

from oxidizepdf_spark.corpus import build_pubkey_encrypted_pdf
from oxidizepdf_spark.kernel.extract import extract_pdf_bytes
from oxidizepdf_spark.kernel.signatures import (
    TEST_RSA_D,
    TEST_RSA_N,
    SignatureError,
    build_recipient_envelope,
    open_enveloped_data,
)
from oxidizepdf_spark.kernel.textstate import ExtractionOptions

KEY = (TEST_RSA_N, TEST_RSA_D)


# ---------------------------------------------------------------------------
# envelope layer (RFC 5652 EnvelopedData)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("junk", [False, True])
def test_envelope_roundtrip(junk):
    seed = hashlib.sha1(b"s").digest()
    blob = build_recipient_envelope(seed, 0xFFFFFFFC, junk_recipient=junk)
    out = open_enveloped_data(blob, *KEY)
    assert out == seed + b"\xff\xff\xff\xfc"


def test_envelope_wrong_key_refused():
    blob = build_recipient_envelope(hashlib.sha1(b"s").digest(), -4)
    with pytest.raises(SignatureError, match="no RecipientInfo"):
        open_enveloped_data(blob, TEST_RSA_N, 987654321)


def test_envelope_mutation_fuzz_structured_errors():
    import random

    rng = random.Random(11)
    blob = bytearray(build_recipient_envelope(
        hashlib.sha1(b"fuzz").digest(), -4, junk_recipient=True))
    for _ in range(300):
        mut = bytearray(blob)
        for _ in range(rng.randrange(1, 5)):
            mut[rng.randrange(len(mut))] = rng.randrange(256)
        try:
            open_enveloped_data(bytes(mut), *KEY)
        except SignatureError:
            pass  # structured failure is the contract


# ---------------------------------------------------------------------------
# document layer
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("method", ["rc4-128", "aes-128", "aes-256"])
def test_pubkey_pdf_matrix(method):
    text = f"Recipient secret {method}"
    pdf = build_pubkey_encrypted_pdf(text, method=method)
    # no key: error-as-data, never an exception
    res = extract_pdf_bytes(pdf)
    assert res.error == "encrypted" and not res.page_texts
    # the recipient's key opens it
    res = extract_pdf_bytes(
        pdf, ExtractionOptions(recipient_key=KEY))
    assert res.error is None
    assert res.page_texts[0] == text
    # a wrong key stays error='encrypted'
    res = extract_pdf_bytes(
        pdf, ExtractionOptions(recipient_key=(TEST_RSA_N, 1234567)))
    assert res.error == "encrypted"


def test_pubkey_pdf_single_recipient_and_password_ignored():
    pdf = build_pubkey_encrypted_pdf("only me", junk_recipient=False)
    res = extract_pdf_bytes(pdf, ExtractionOptions(recipient_key=KEY))
    assert res.page_texts[0] == "only me"
    # a password is meaningless for the pubkey handler: stays locked
    res = extract_pdf_bytes(pdf, ExtractionOptions(password="owner"))
    assert res.error == "encrypted"


def test_pubkey_pdf_document_mutation_never_raises():
    import random

    rng = random.Random(13)
    pdf = bytearray(build_pubkey_encrypted_pdf("fuzz target"))
    for _ in range(150):
        mut = bytearray(pdf)
        for _ in range(rng.randrange(1, 6)):
            mut[rng.randrange(len(mut))] = rng.randrange(256)
        res = extract_pdf_bytes(
            bytes(mut), ExtractionOptions(recipient_key=KEY))
        assert res is not None  # error-as-data or decode, never a raise


def test_encrypt_metadata_false_changes_key():
    from oxidizepdf_spark.kernel.crypto import PublicKeySecurityHandler

    seed = hashlib.sha1(b"km").digest()
    blob = build_recipient_envelope(seed, -4)
    base = {"Filter": "Adobe.PubSec", "SubFilter": "adbe.pkcs7.s5",
            "V": 4, "Length": 128,
            "CF": {"DefaultCryptFilter": {
                "CFM": "AESV2", "Length": 16, "Recipients": [blob]}},
            "StmF": "DefaultCryptFilter", "StrF": "DefaultCryptFilter"}
    h1 = PublicKeySecurityHandler(base, None)
    assert h1.try_recipient_key(*KEY)
    nocopy = {**base, "CF": {"DefaultCryptFilter": {
        **base["CF"]["DefaultCryptFilter"], "EncryptMetadata": False}}}
    h2 = PublicKeySecurityHandler(nocopy, None)
    assert h2.try_recipient_key(*KEY)
    # §7.6.5.3 step d: 4 bytes of 0xFF enter the digest
    expect = hashlib.sha1(seed + blob + b"\xff\xff\xff\xff").digest()[:16]
    assert h2.key == expect and h1.key != h2.key
    assert h1.key == hashlib.sha1(seed + blob).digest()[:16]
    assert h1.perms == (-4 & 0xFFFFFFFF)


# ---------------------------------------------------------------------------
# r9 ADVICE regressions
# ---------------------------------------------------------------------------


def _malformed_envelope() -> bytes:
    """An envelope whose RecipientInfo is structurally broken such that
    the DER walk used to escape with a raw IndexError (fuzz-found:
    single byte 36 flipped to 0x2E)."""
    blob = bytearray(build_recipient_envelope(hashlib.sha1(b"advicetest").digest(), -4))
    blob[36] = 46
    return bytes(blob)


def test_malformed_envelope_raises_signature_error_only():
    # open_enveloped_data normalizes structural errors (the fuzz
    # contract): never a bare IndexError/ValueError
    with pytest.raises(SignatureError):
        open_enveloped_data(_malformed_envelope(), *KEY)


def test_recipient_walk_survives_malformed_foreign_envelope():
    """A structurally malformed foreign RecipientInfo earlier in
    /Recipients must not abort the walk — the valid envelope after it
    still unlocks (r9 ADVICE, crypto.py try_recipient_key)."""
    from oxidizepdf_spark.kernel.crypto import PublicKeySecurityHandler

    seed = hashlib.sha1(b"walk").digest()
    good = build_recipient_envelope(seed, -4)
    enc = {"Filter": "Adobe.PubSec", "SubFilter": "adbe.pkcs7.s4",
           "V": 2, "Length": 128,
           "Recipients": [_malformed_envelope(), good]}
    h = PublicKeySecurityHandler(enc, None)
    assert h.try_recipient_key(*KEY)
    assert h.key == hashlib.sha1(
        seed + _malformed_envelope() + good).digest()[:16]


def test_cf_length_bytes_sizes_key_without_top_level_length():
    """adbe.pkcs7.s5 carrying /Length only inside /CF (in BYTES per
    §7.6.5): the key must be 16 bytes, not the 5-byte top-level-default
    derivation (r9 ADVICE, crypto.py key sizing)."""
    from oxidizepdf_spark.kernel.crypto import PublicKeySecurityHandler

    seed = hashlib.sha1(b"cflen").digest()
    blob = build_recipient_envelope(seed, -4)
    enc = {"Filter": "Adobe.PubSec", "SubFilter": "adbe.pkcs7.s5",
           "V": 4,  # no top-level /Length → default 40 bits
           "CF": {"DefaultCryptFilter": {
               "CFM": "AESV2", "Length": 16, "Recipients": [blob]}},
           "StmF": "DefaultCryptFilter", "StrF": "DefaultCryptFilter"}
    h = PublicKeySecurityHandler(enc, None)
    assert h.try_recipient_key(*KEY)
    assert len(h.key) == 16
    assert h.key == hashlib.sha1(seed + blob).digest()[:16]
    # bits-in-CF producer quirk: 128 means 16 bytes, not capped 16×8
    enc2 = {**enc, "CF": {"DefaultCryptFilter": {
        "CFM": "AESV2", "Length": 128, "Recipients": [blob]}}}
    h2 = PublicKeySecurityHandler(enc2, None)
    assert h2.try_recipient_key(*KEY) and len(h2.key) == 16


def test_pubkey_pdf_length_in_cf_only_roundtrip():
    text = "Length lives in the crypt filter"
    pdf = build_pubkey_encrypted_pdf(text, method="aes-128",
                                     length_in_cf_only=True)
    assert b"/Length 16" in pdf and b"/Length 128" not in pdf
    res = extract_pdf_bytes(pdf, ExtractionOptions(recipient_key=KEY))
    assert res.error is None
    assert text in "\n".join(res.page_texts)

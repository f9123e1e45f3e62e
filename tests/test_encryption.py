"""Standard-security-handler tests: crypto primitives against public test
vectors, synthetic empty-password roundtrips (RC4-40/RC4-128/AES-128),
and key-derivation validation against the reference's own passworded
fixtures (we can validate their known user passwords without extracting)."""

from __future__ import annotations

import glob

from oxidizepdf_spark.corpus import build_encrypted_pdf
from oxidizepdf_spark.kernel.crypto import (
    StandardSecurityHandler,
    _encrypt_block,
    _expand_key,
    aes_cbc_decrypt,
    aes_cbc_decrypt_zero_iv_nopad,
    aes_cbc_encrypt_nopad,
    rc4,
)
from oxidizepdf_spark.kernel.extract import extract_pdf_bytes

FIXDIR = "/root/reference/oxidize-pdf-core/tests/fixtures"


# -- primitives --------------------------------------------------------------


def test_aes_fips197_vectors():
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    assert (
        _encrypt_block(pt, _expand_key(bytes(range(16)))).hex()
        == "69c4e0d86a7b0430d8cdb78070b4c55a"
    )
    assert (
        _encrypt_block(pt, _expand_key(bytes(range(24)))).hex()
        == "dda97ca4864cdfe06eaf70a0ec0d7191"
    )
    assert (
        _encrypt_block(pt, _expand_key(bytes(range(32)))).hex()
        == "8ea2b7ca516745bfeafc49904b496089"
    )


def test_rc4_vectors():
    assert rc4(b"Key", b"Plaintext").hex() == "bbf316e8d940af0ad3"
    assert rc4(b"Wiki", b"pedia").hex() == "1021bf0420"


def test_aes_cbc_roundtrip_and_padding():
    key = bytes(range(32))
    iv = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    msg = b"16-byte-aligned."
    ct = aes_cbc_encrypt_nopad(key, iv, msg)
    assert aes_cbc_decrypt(key, iv + ct, strip_pad=False) == msg
    # PKCS#5-padded layout
    body = b"abc"
    pad = 16 - len(body) % 16
    ct2 = aes_cbc_encrypt_nopad(key, iv, body + bytes([pad]) * pad)
    assert aes_cbc_decrypt(key, iv + ct2) == body
    # zero-IV no-pad variant (the UE/OE unwrap)
    ct3 = aes_cbc_encrypt_nopad(key, bytes(16), msg)
    assert aes_cbc_decrypt_zero_iv_nopad(key, ct3) == msg


# -- synthetic empty-password roundtrips -------------------------------------


def test_encrypted_roundtrip_all_methods():
    text = "Confidential alpha\nbravo charlie"
    for method in ("rc4-40", "rc4-128", "aes-128"):
        res = extract_pdf_bytes(build_encrypted_pdf(text, method=method))
        assert res.error is None, method
        assert res.page_texts[0] == text, method


def test_encrypted_passworded_refuses():
    for method in ("rc4-40", "rc4-128", "aes-128"):
        pdf = build_encrypted_pdf("x", method=method, user_pw=b"hunter2")
        res = extract_pdf_bytes(pdf)
        assert res.error == "encrypted", method


def test_passworded_extraction_with_user_password():
    """ExtractionOptions(password=...) unlocks user-passworded documents
    end-to-end (PasswordProvider SPI, parser/mod.rs:167-169)."""
    from oxidizepdf_spark.kernel.textstate import ExtractionOptions

    text = "Locked alpha\nbravo two"
    for method in ("rc4-40", "rc4-128", "aes-128"):
        pdf = build_encrypted_pdf(text, method=method, user_pw=b"hunter2")
        res = extract_pdf_bytes(pdf, ExtractionOptions(password="hunter2"))
        assert res.error is None, method
        assert res.page_texts[0] == text, method
        # wrong password stays error-as-data, never an exception
        bad = extract_pdf_bytes(pdf, ExtractionOptions(password="nope"))
        assert bad.error == "encrypted", method


def test_passworded_extraction_with_owner_password():
    """The OWNER password must also fully unlock (Algorithm 7: decrypt O
    with the owner key → recover the padded user password → same file
    key)."""
    from oxidizepdf_spark.kernel.textstate import ExtractionOptions

    text = "owner door"
    for method in ("rc4-40", "rc4-128", "aes-128"):
        pdf = build_encrypted_pdf(
            text, method=method, user_pw=b"hunter2", owner_pw=b"bosskey"
        )
        res = extract_pdf_bytes(pdf, ExtractionOptions(password="bosskey"))
        assert res.error is None, method
        assert res.page_texts[0] == text, method


def test_encrypted_strings_decrypted():
    # Info strings go through decrypt_string; metadata must round-trip.
    from oxidizepdf_spark.kernel.extract import extract_metadata

    pdf = build_encrypted_pdf("body", method="rc4-128")
    # splice an encrypted Info in: easier to assert via a full fixture —
    # the synthetic builder has no /Info, so just assert extraction works
    # and the handler's string path is exercised by the real fixtures.
    meta = extract_metadata(pdf)
    assert meta["error"] is None and meta["n_pages"] == 1


# -- reference passworded fixtures: validate their KNOWN passwords ----------


def _handler_for(path: str) -> StandardSecurityHandler:
    from oxidizepdf_spark.kernel import reader as R
    from oxidizepdf_spark.kernel.xref import parse_xref_chain

    class Peek(R.PdfReader):
        def __init__(self, data):
            self.data = data
            self.lenient = True
            self.decryptor = None
            self.version = self._parse_header()
            self._cache = {}
            self._objstm_cache = {}
            self._resolving = set()
            entries, trailer, mode = parse_xref_chain(data, self)
            self.xref = entries
            self.trailer = trailer
            self.mode = mode

    r = Peek(open(path, "rb").read())
    enc = r.resolve(r.trailer.get("Encrypt"))
    ids = r.resolve(r.trailer.get("ID"))
    fid = ids[0] if isinstance(ids, list) and ids else None
    return StandardSecurityHandler(enc, fid)


def test_r2_r4_key_derivation_against_reference_fixtures():
    """The qpdf-generated fixtures use known passwords; deriving their keys
    and validating U proves Algorithm 2/4/5 parity without guessing."""
    cases = [
        ("encrypted_rc4_40bit.pdf", b"user"),  # V1 R2
        ("encrypted_restricted.pdf", b"userpass"),  # V2 R3
    ]
    for name, pw in cases:
        h = _handler_for(f"{FIXDIR}/{name}")
        key = h._derive_key_r2_r4(pw)
        assert h._check_user_r2_r4(key), name
        # and a wrong password must not validate
        bad = h._derive_key_r2_r4(b"wrong")
        assert not h._check_user_r2_r4(bad), name


def test_r5_r6_validation_against_reference_fixtures():
    """R5 (SHA-256) and R6 (hash 2.B) empty-password validation unlocks the
    qpdf empty-user fixtures and refuses the passworded ones."""
    assert _handler_for(
        f"{FIXDIR}/encrypted_aes256_r5_empty_user.pdf"
    ).try_empty_password()
    assert _handler_for(
        f"{FIXDIR}/encrypted_aes256_r6_empty_user.pdf"
    ).try_empty_password()
    assert not _handler_for(
        f"{FIXDIR}/encrypted_aes256_r5_user.pdf"
    ).try_empty_password()
    assert not _handler_for(
        f"{FIXDIR}/encrypted_aes256_r6_user.pdf"
    ).try_empty_password()


def test_r6_known_password_validates():
    """pypdf cross-validation fixture: user password 'pypdf_test'
    (encryption_cross_validation_test.rs)."""
    h = _handler_for(f"{FIXDIR}/encrypted_pypdf_aes256_user.pdf")
    assert not h.try_empty_password()
    assert h._check_user_r5_r6(b"pypdf_test") is not None
    assert h._check_user_r5_r6(b"wrong") is None


def test_passworded_reference_fixtures_extract_text():
    """Full-pipeline decryption of the reference's passworded fixtures
    with their known passwords: RC4-40 (R2), RC4-128 (R3), AES-256 (R6).
    The extracted page text must be non-empty real text, not garbage."""
    from oxidizepdf_spark.kernel.textstate import ExtractionOptions

    cases = [
        # (fixture, password, expect_text) — passwords documented in the
        # reference's own tests (encryption_r5_real_pdf_test.rs:7,
        # encryption_r6_real_pdf_test.rs:7, encryption test docs); the
        # pypdf fixture is a deliberately blank page (no /Contents), so
        # it asserts unlock-only. Owner passwords exercise Algorithm 2.A's
        # owner branch on real files.
        ("encrypted_rc4_40bit.pdf", "user", True),
        ("encrypted_restricted.pdf", "userpass", True),
        ("encrypted_rc4_128bit.pdf", "test123", True),
        ("encrypted_rc4_128bit.pdf", "owner123", True),
        ("encrypted_aes256_r5_user.pdf", "user5", True),
        ("encrypted_aes256_r5_user.pdf", "owner5", True),
        ("encrypted_aes256_r6_user.pdf", "user6", True),
        ("encrypted_aes256_r6_user.pdf", "owner6", True),
        # UNICODE passwords (UTF-8 per ISO 32000-2; exercises hash 2.B
        # with multi-byte input on both the user and owner branches)
        ("encrypted_aes256_r5_unicode.pdf", "unicode_contraseña", True),
        ("encrypted_aes256_r5_unicode.pdf", "owner5_unicode", True),
        ("encrypted_aes256_r6_unicode.pdf", "café🔒", True),
        ("encrypted_aes256_r6_unicode.pdf", "owner6_unicode", True),
        ("encrypted_pypdf_aes256_user.pdf", "pypdf_test", False),
    ]
    for name, pw, expect_text in cases:
        data = open(f"{FIXDIR}/{name}", "rb").read()
        locked = extract_pdf_bytes(data)
        assert locked.error == "encrypted", name
        res = extract_pdf_bytes(data, ExtractionOptions(password=pw))
        assert res.error is None, (name, pw, res.error)
        assert res.n_pages >= 1, (name, pw)
        text = "".join(res.page_texts)
        if not expect_text:
            continue
        assert len(text.strip()) > 0, (name, pw)
        # decrypted output must be real text, not binary garbage: no
        # replacement-char soup, no stray control bytes (the Cold Email
        # fixture legitimately uses U+200B ZWSP heavily)
        bad = sum(c == "�" or (ord(c) < 32 and c not in "\n\t\r") for c in text)
        assert bad / len(text) < 0.02, (name, pw, text[:80])
    # shared KNOWN LIMITATION parity: the pypdf 'Contraseña123' fixture
    # needs full SASLprep normalization, which the reference itself
    # documents as unsupported (encryption_cross_validation_test.rs:243)
    # — both engines refuse it rather than mis-decrypting
    data = open(f"{FIXDIR}/encrypted_pypdf_aes256_spanish.pdf", "rb").read()
    res = extract_pdf_bytes(data, ExtractionOptions(password="Contraseña123"))
    assert res.error == "encrypted"


# -- property tests -----------------------------------------------------------


def test_rc4_involution_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        key=st.binary(min_size=1, max_size=32),
        data=st.binary(min_size=0, max_size=200),
    )
    @settings(max_examples=60, deadline=None)
    def check(key, data):
        assert rc4(key, rc4(key, data)) == data

    check()


def test_aes_cbc_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        key=st.sampled_from([bytes(range(16)), bytes(range(24)), bytes(range(32))]),
        iv=st.binary(min_size=16, max_size=16),
        nblocks=st.integers(min_value=1, max_value=8),
        payload=st.binary(min_size=0, max_size=16),
    )
    @settings(max_examples=40, deadline=None)
    def check(key, iv, nblocks, payload):
        msg = (payload * 16)[: nblocks * 16].ljust(nblocks * 16, b"\x00")
        ct = aes_cbc_encrypt_nopad(key, iv, msg)
        assert aes_cbc_decrypt(key, iv + ct, strip_pad=False) == msg

    check()


def test_encrypted_reading_order_composes():
    """Feature composability: decryption and the reading-order strategies
    must compose through one extraction call — an AES-128 encrypted
    multi-line document reads identically under every strategy (single
    column, so all three orders agree)."""
    from oxidizepdf_spark.corpus import build_encrypted_pdf
    from oxidizepdf_spark.kernel.extract import extract_pdf_bytes
    from oxidizepdf_spark.kernel.textstate import ExtractionOptions

    text = "alpha one\nbeta two\ngamma three"
    pdf = build_encrypted_pdf(text, method="aes-128")
    for ro in ("emission", "simple", "xycut"):
        res = extract_pdf_bytes(pdf, ExtractionOptions(reading_order=ro))
        assert res.error is None, ro
        assert res.page_texts[0] == text, (ro, res.page_texts[0])


def test_crypt_identity_stream_exempt_from_default_cipher():
    """ISO 32000-1 §7.6.5 (ADVICE r10): a stream whose /Filter chain
    carries an Identity /Crypt filter is stored in the clear inside an
    encrypted document and must NOT be run through the default StmF
    cipher first — doing so garbles the plaintext (the trailing Flate
    stage would fail loudly on the garbled bytes)."""
    for method in ("rc4-40", "rc4-128", "aes-128"):
        pdf = build_encrypted_pdf(
            "identity crypt", method=method, crypt_identity_content=True
        )
        res = extract_pdf_bytes(pdf)
        assert res.mode == "strict", method
        assert res.page_texts == ["identity crypt"], method

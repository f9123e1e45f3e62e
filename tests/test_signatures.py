"""Digital-signature stack: detection, CMS/X.509 parse, verification.

Mirrors the reference's own unit tests (signatures/types.rs,
verification.rs, cms.rs test mods) plus the documented quirks:
unprefixed RSA encoded-message (verification.rs:258), first-cert
selection (cms.rs:612), signedAttrs handling (our standards-correct
extension), and the key-usage BIT STRING read certificate.rs gets wrong.
"""

import pytest

from oxidizepdf_spark.corpus import build_form_pdf, build_signed_pdf
from oxidizepdf_spark.kernel.extract import extract_signatures
from oxidizepdf_spark.kernel.signatures import (
    TAG_OCTETS,
    TAG_SEQ,
    TAG_SET,
    TAG_UTF8,
    ByteRange,
    SignatureError,
    TrustStore,
    build_cms_signature,
    build_self_signed_cert,
    compute_pdf_hash,
    der_encode,
    detect_signature_fields,
    enc_int,
    enc_oid,
    enc_seq,
    enc_set,
    has_incremental_update,
    hashes_match,
    parse_certificate,
    parse_der,
    parse_pkcs7_signature,
    validate_certificate_at_time,
    verify_signature,
)


# ---------------------------------------------------------------------------
# ByteRange (types.rs test mod)
# ---------------------------------------------------------------------------


def test_byterange_from_array_valid():
    br = ByteRange.from_array([0, 1000, 2000, 500])
    assert len(br) == 2
    assert br.ranges == [(0, 1000), (2000, 500)]
    assert br.total_bytes() == 1500
    assert str(br) == "[0 1000 2000 500]"


@pytest.mark.parametrize(
    "values,msg",
    [
        ([0, 1000, 2000], "even"),
        ([0, 1000], "at least 4"),
        ([-1, 5, 10, 5], "negative"),
        ([0, 5, 10, -5], "negative"),
    ],
)
def test_byterange_from_array_rejects(values, msg):
    with pytest.raises(SignatureError, match=msg):
        ByteRange.from_array(values)


def test_byterange_validate():
    ByteRange([(0, 100), (200, 50)]).validate()
    with pytest.raises(SignatureError, match="Expected 2 ranges"):
        ByteRange([(0, 100)]).validate()
    with pytest.raises(SignatureError, match="offset 0"):
        ByteRange([(5, 100), (200, 50)]).validate()
    with pytest.raises(SignatureError, match="overlap"):
        ByteRange([(0, 100), (50, 50)]).validate()


# ---------------------------------------------------------------------------
# DER reader/writer
# ---------------------------------------------------------------------------


def test_der_oid_roundtrip():
    for oid in ("1.2.840.113549.1.7.2", "2.16.840.1.101.3.4.2.1", "2.5.4.3",
                "1.3.132.0.34"):
        node, _ = parse_der(enc_oid(oid))
        assert node.oid() == oid


def test_der_long_form_length():
    payload = b"x" * 300
    node, end = parse_der(der_encode(TAG_OCTETS, payload))
    assert node.content == payload and end == 300 + 4


def test_der_integer_signed():
    node, _ = parse_der(enc_int(0))
    assert node.integer() == 0
    node, _ = parse_der(enc_int(2**256 + 7))
    assert node.integer() == 2**256 + 7


def test_ber_indefinite_normalized():
    """BER indefinite-length constructed nodes come out as definite DER
    (cms.rs ber_to_der equivalent)."""
    inner = der_encode(TAG_UTF8, b"hi") + enc_int(7)
    ber = bytes([TAG_SEQ, 0x80]) + inner + b"\x00\x00"
    node, end = parse_der(ber)
    assert end == len(ber)
    assert node.der == der_encode(TAG_SEQ, inner)
    kids = node.children()
    assert kids[0].content == b"hi" and kids[1].integer() == 7


def test_der_truncated_raises():
    with pytest.raises(SignatureError):
        parse_der(b"\x30\x05ab")


# ---------------------------------------------------------------------------
# hash computation (verification.rs test mod)
# ---------------------------------------------------------------------------


def test_compute_pdf_hash_sha256():
    pdf = b"Hello, this is a test PDF content!"
    h = compute_pdf_hash(pdf, ByteRange([(0, 10), (20, 14)]), "SHA-256")
    assert len(h) == 32
    import hashlib

    assert h == hashlib.sha256(pdf[0:10] + pdf[20:34]).digest()


def test_compute_pdf_hash_out_of_bounds():
    with pytest.raises(SignatureError, match="exceeds document"):
        compute_pdf_hash(b"short", ByteRange([(0, 3), (4, 10)]), "SHA-256")


def test_hashes_match():
    assert hashes_match(b"abc", b"abc")
    assert not hashes_match(b"abc", b"abd")
    assert not hashes_match(b"abc", b"abcd")


# ---------------------------------------------------------------------------
# detection (detection.rs)
# ---------------------------------------------------------------------------


def test_detect_none_on_plain_form():
    assert detect_signature_fields(build_form_pdf("a", True, "b", "c")) == []


def test_detect_signed_field():
    pdf = build_signed_pdf("hello", reason="why", location="Lisbon")
    sigs = detect_signature_fields(pdf)
    assert len(sigs) == 1
    s = sigs[0]
    assert s.name == "Sig1"
    assert s.filter == "Adobe.PPKLite"
    assert s.sub_filter == "adbe.pkcs7.detached"
    assert s.is_pkcs7_detached() and not s.is_pades()
    assert s.reason == "why" and s.location == "Lisbon"
    assert s.signing_time == "D:20250106120000Z"
    assert s.contents_size() == 2048
    s.byte_range.validate()
    # first range starts at 0 and the two ranges cover all but the
    # /Contents hex gap
    (o1, l1), (o2, l2) = s.byte_range.ranges
    assert o1 == 0 and o2 + l2 == len(pdf)
    assert o2 - l1 == 2 + 2 * 2048


def test_detect_unsigned_sig_field_skipped():
    from oxidizepdf_spark.corpus import assemble_pdf

    objects = {
        1: b"<< /Type /Catalog /Pages 2 0 R /AcroForm << /Fields [50 0 R] >> >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] >>",
        50: b"<< /FT /Sig /T (Unsigned1) >>",  # no /V
    }
    assert detect_signature_fields(assemble_pdf(objects)) == []


def test_detect_missing_filter_raises():
    from oxidizepdf_spark.corpus import assemble_pdf

    objects = {
        1: b"<< /Type /Catalog /Pages 2 0 R /AcroForm << /Fields [50 0 R] >> >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] >>",
        50: b"<< /FT /Sig /T (S) /V 60 0 R >>",
        60: b"<< /Type /Sig /ByteRange [0 1 2 3] /Contents <00> >>",
    }
    with pytest.raises(SignatureError, match="Filter"):
        detect_signature_fields(assemble_pdf(objects))


def test_detect_sig_field_under_kids():
    """collect_signature_fields recurses through /Kids (detection.rs:77)."""
    from oxidizepdf_spark.corpus import sign_pdf_objects

    objects = {
        1: b"<< /Type /Catalog /Pages 2 0 R /AcroForm << /Fields [49 0 R] >> >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] >>",
        49: b"<< /T (outer) /Kids [50 0 R] >>",
        50: b"<< /FT /Sig /T (InnerSig) /V 60 0 R /Parent 49 0 R >>",
    }
    sigs = detect_signature_fields(sign_pdf_objects(objects, 60))
    assert [s.name for s in sigs] == ["InnerSig"]


# ---------------------------------------------------------------------------
# CMS parse (cms.rs)
# ---------------------------------------------------------------------------


def test_parse_pkcs7_fields():
    doc_hash = compute_pdf_hash(b"doc bytes", ByteRange([(0, 4), (5, 4)]), "SHA-256")
    cms = build_cms_signature(doc_hash, cn="Alice", signed_attrs=True)
    ps = parse_pkcs7_signature(cms)
    assert ps.digest_algorithm == "SHA-256"
    assert ps.signature_algorithm == "RSA-SHA256"
    assert ps.signer_common_name() == "Alice"
    # deviation from cms.rs:689 (placeholder string): real UTCTime decode
    assert ps.signing_time == "250106120000Z"
    assert ps.message_digest == doc_hash
    assert ps.signed_attrs_der is not None and ps.signed_attrs_der[0] == TAG_SET


def test_parse_pkcs7_zero_padding_tolerated():
    """PDF /Contents values are zero-padded past the DER payload."""
    cms = build_cms_signature(b"\x11" * 32, cn="Pad")
    ps = parse_pkcs7_signature(cms + b"\x00" * 64)
    assert ps.signer_common_name() == "Pad"


def test_parse_pkcs7_wrong_content_type():
    bad = enc_seq(enc_oid("1.2.840.113549.1.7.1"), der_encode(0xA0, b""))
    with pytest.raises(SignatureError, match="Expected SignedData"):
        parse_pkcs7_signature(bad)


def test_parse_pkcs7_unsupported_digest():
    # an unknown digest OID must raise like cms.rs parse_digest_algorithm;
    # same-length substitute (…3.4.2.9) keeps every DER length intact
    cms = build_cms_signature(b"\x22" * 32, cn="Sha1")
    bogus = enc_oid("2.16.840.1.101.3.4.2.9")
    sha256 = enc_oid("2.16.840.1.101.3.4.2.1")
    assert len(bogus) == len(sha256)
    patched = cms.replace(sha256, bogus)
    with pytest.raises(SignatureError, match="Unsupported algorithm"):
        parse_pkcs7_signature(patched)


def test_signer_common_name_binary_fallback():
    """cms.rs:516 fallback: '<binary CN: N bytes>' for non-string CNs."""
    from oxidizepdf_spark.kernel.signatures import ParsedSignature

    # hand-build a cert whose CN value is an OCTET STRING
    binary_name = enc_seq(enc_set(enc_seq(
        enc_oid("2.5.4.3"), der_encode(TAG_OCTETS, b"\x01\x02\x03"))))
    normal = build_self_signed_cert("X")
    node, _ = parse_der(normal)
    tbs_kids = node.children()[0].children()
    # replace subject (index 5 with [0] version present) by the binary name
    tbs_kids[5] = None
    rebuilt_tbs = der_encode(
        TAG_SEQ,
        b"".join(k.der if k is not None else binary_name
                 for k in node.children()[0].children()[:5])
        + binary_name
        + b"".join(k.der for k in node.children()[0].children()[6:]),
    )
    cert = enc_seq(rebuilt_tbs, *[k.der for k in node.children()[1:]])
    ps = ParsedSignature(
        digest_algorithm="SHA-256", signature_algorithm="RSA-SHA256",
        signature_value=b"", signer_certificate_der=cert,
    )
    assert ps.signer_common_name() == "<binary CN: 3 bytes>"


# ---------------------------------------------------------------------------
# verification matrix (verification.rs + quirks)
# ---------------------------------------------------------------------------

VARIANTS = [
    (dict(), True, "digestinfo"),
    (dict(unprefixed=True), True, "raw"),  # verification.rs:258 quirk
    (dict(signed_attrs=True), True, "digestinfo"),
    (dict(digest_alg="SHA-384"), True, "digestinfo"),
    (dict(digest_alg="SHA-512"), True, "digestinfo"),
    (dict(digest_alg="SHA-512", signed_attrs=True), True, "digestinfo"),
    (dict(key_type="ec-p256"), True, None),
    (dict(key_type="ec-p384", digest_alg="SHA-384"), True, None),
    (dict(key_type="ec-p256", signed_attrs=True), True, None),
    (dict(tamper_find=b"(payload"), False, None),
    (dict(signed_attrs=True, tamper_find=b"(payload"), False, None),
    (dict(key_type="ec-p256", tamper_find=b"(payload"), False, None),
]


@pytest.mark.parametrize("kw,expect_valid,expect_em", VARIANTS)
def test_verify_matrix(kw, expect_valid, expect_em):
    pdf = build_signed_pdf("payload text", **kw)
    s = detect_signature_fields(pdf)[0]
    ps = parse_pkcs7_signature(s.contents)
    r = verify_signature(pdf, ps, s.byte_range)
    assert r.is_valid() == expect_valid
    if expect_valid:
        assert r.em_form == expect_em
    if kw.get("signed_attrs") and kw.get("tamper_find"):
        # the correct CMS path fails at the messageDigest attribute
        assert not r.hash_valid and "messageDigest" in (r.details or "")


def test_verify_signature_algorithm_names():
    pdf = build_signed_pdf("x", key_type="ec-p384", digest_alg="SHA-384")
    ps = parse_pkcs7_signature(detect_signature_fields(pdf)[0].contents)
    assert ps.signature_algorithm == "ECDSA-SHA384"
    assert ps.digest_algorithm == "SHA-384"


def test_incremental_update_detection():
    pdf = build_signed_pdf("x")
    br = detect_signature_fields(pdf)[0].byte_range
    assert not has_incremental_update(pdf, br)
    pdf2 = build_signed_pdf("x", incremental_tail=b"% incremental\n")
    br2 = detect_signature_fields(pdf2)[0].byte_range
    assert has_incremental_update(pdf2, br2)
    # hash still valid — the update came after signing
    ps = parse_pkcs7_signature(detect_signature_fields(pdf2)[0].contents)
    assert verify_signature(pdf2, ps, br2).is_valid()
    assert not has_incremental_update(b"", ByteRange([]))


# ---------------------------------------------------------------------------
# certificate validation (certificate.rs)
# ---------------------------------------------------------------------------


def test_certificate_parse_fields():
    cert = parse_certificate(build_self_signed_cert("Carol"))
    assert cert.subject["CN"] == "Carol" and cert.issuer["CN"] == "Carol"
    assert cert.not_before == "2024-01-01 00:00:00"
    assert cert.not_after == "2039-01-01 00:00:00"
    assert cert.key_type == "rsa" and cert.rsa_e == 65537
    assert cert.has_key_usage_ext and cert.key_usage_bits == 0x80
    # serial is deterministic (sha256-derived, not process hash)
    again = parse_certificate(build_self_signed_cert("Carol"))
    assert again.serial == cert.serial


def test_validate_certificate_matrix():
    cert = build_self_signed_cert("Valid CN")
    moz = TrustStore(root_count=10, is_mozilla_bundle=True)
    ok = validate_certificate_at_time(cert, moz, "2025-06-01 00:00:00")
    assert ok.is_valid() and "Self-signed certificate" in ok.warnings
    assert ok.subject == "Valid CN" and ok.issuer == "Valid CN"

    empty = validate_certificate_at_time(cert, TrustStore.empty(),
                                         "2025-06-01 00:00:00")
    assert not empty.is_trusted and not empty.is_valid()
    assert "Using empty or custom trust store" in empty.warnings

    expired = validate_certificate_at_time(cert, moz, "2040-01-01 00:00:00")
    assert not expired.is_time_valid and not expired.is_valid()
    early = validate_certificate_at_time(cert, moz, "2023-12-31 23:59:59")
    assert not early.is_time_valid


def test_validate_key_usage_bits():
    """Correct BIT STRING read (certificate.rs:249 reads the length octet
    — documented reference bug we do NOT reproduce)."""
    moz = TrustStore(root_count=10, is_mozilla_bundle=True)
    no_sig = build_self_signed_cert("NoSigUsage", key_usage=b"\x03\x20")
    r = validate_certificate_at_time(no_sig, moz, "2025-01-01 00:00:00")
    assert not r.is_signature_capable
    assert "No digital signature key usage" in r.warnings

    no_ext = build_self_signed_cert("NoExt", key_usage=None)
    r2 = validate_certificate_at_time(no_ext, moz, "2025-01-01 00:00:00")
    assert r2.is_signature_capable  # permissive default, mirrored
    assert "No key usage extension" in r2.warnings


# ---------------------------------------------------------------------------
# extract surface
# ---------------------------------------------------------------------------


def test_extract_signatures_row():
    pdf = build_signed_pdf(
        "doc", signer_cn="Row Signer", reason="ok", signed_attrs=True,
        incremental_tail=b"%u\n",
    )
    rows = extract_signatures(pdf)
    assert len(rows) == 1
    r = rows[0]
    assert r["field_name"] == "Sig1"
    assert r["signer"] == "Row Signer"
    assert r["signature_valid"] and r["hash_valid"]
    assert r["em_form"] == "digestinfo"
    assert r["incremental_update"] is True
    assert r["error"] is None


def test_timestamp_token_roundtrip():
    # RFC 3161 / CAdES-T — BEYOND the reference (signatures/ has no
    # timestamp support): the unsigned id-aa-timeStampToken attribute
    # decodes, the TSTInfo imprint binds the signature value, and the
    # TSA countersignature verifies
    import hashlib

    from oxidizepdf_spark.kernel.signatures import (
        build_cms_signature, parse_pkcs7_signature, verify_timestamp_token)

    doc_hash = hashlib.sha256(b"ts doc").digest()
    for kw in ({}, {"signed_attrs": True}, {"cades": True},
               {"digest_alg": "SHA-384"}):
        cms = build_cms_signature(doc_hash, timestamp=True, **kw)
        p = parse_pkcs7_signature(cms)
        assert p.timestamp_token_der is not None
        ts = verify_timestamp_token(p.timestamp_token_der, p.signature_value)
        assert ts.error is None
        assert ts.gen_time == "2025-01-06 12:05:00"
        assert ts.tsa == "Test TSA"
        assert ts.serial == 7
        assert ts.imprint_ok and ts.token_sig_ok and ts.is_valid()


def test_timestamp_token_bad_imprint_detected():
    import hashlib

    from oxidizepdf_spark.kernel.signatures import (
        build_cms_signature, parse_pkcs7_signature, verify_timestamp_token)

    doc_hash = hashlib.sha256(b"ts doc").digest()
    cms = build_cms_signature(doc_hash, timestamp_bad_imprint=True)
    p = parse_pkcs7_signature(cms)
    ts = verify_timestamp_token(p.timestamp_token_der, p.signature_value)
    assert not ts.imprint_ok  # imprint doesn't hash the signature value
    assert ts.token_sig_ok  # the TSA still signed ITS TSTInfo correctly
    assert not ts.is_valid()
    # a token over the WRONG signature value must also fail the imprint
    good = parse_pkcs7_signature(build_cms_signature(doc_hash,
                                                     timestamp=True))
    ts2 = verify_timestamp_token(good.timestamp_token_der, b"other sig")
    assert not ts2.imprint_ok and not ts2.is_valid()


def test_timestamp_token_garbage_degrades():
    from oxidizepdf_spark.kernel.signatures import verify_timestamp_token

    ts = verify_timestamp_token(b"\x30\x03\x02\x01\x00", b"sig")
    assert ts.error is not None and not ts.is_valid()


def test_extract_signatures_timestamp_columns():
    pdf = build_signed_pdf("ts doc", signed_attrs=True, timestamp=True)
    (r,) = extract_signatures(pdf)
    assert r["signature_valid"] and r["error"] is None
    assert r["ts_valid"] is True
    assert r["ts_time"] == "2025-01-06 12:05:00"
    assert r["ts_tsa"] == "Test TSA"
    # no token -> None (distinguishes absence from failure)
    (r0,) = extract_signatures(build_signed_pdf("plain"))
    assert r0["ts_valid"] is None and r0["ts_time"] is None
    # tampered imprint -> ts_valid False, signature itself still valid
    (rb,) = extract_signatures(
        build_signed_pdf("bad ts", timestamp_bad_imprint=True))
    assert rb["signature_valid"] and rb["ts_valid"] is False


def test_extract_signatures_degrades_on_bad_cms():
    pdf = build_signed_pdf("doc")
    # corrupt the CMS payload: zero out the /Contents hex
    broken = pdf.replace(b"/Contents <3082", b"/Contents <0000", 1)
    rows = extract_signatures(broken)
    assert len(rows) == 1
    assert rows[0]["error"] is not None
    assert not rows[0]["signature_valid"]


# ---------------------------------------------------------------------------
# robustness fuzz: a corrupt signature must degrade, never crash a task
# ---------------------------------------------------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYP = True
except ImportError:  # pragma: no cover
    HAVE_HYP = False

if HAVE_HYP:

    @settings(max_examples=200, deadline=None)
    @given(st.binary(min_size=0, max_size=64))
    def test_parse_der_never_crashes(data):
        """parse_der on arbitrary bytes: parses or raises SignatureError —
        no other exception class escapes."""
        try:
            parse_der(data)
        except SignatureError:
            pass

    @settings(max_examples=100, deadline=None)
    @given(st.data())
    def test_cms_truncation_degrades(data):
        """Any prefix truncation of a valid CMS must raise SignatureError
        from parse (or parse to something verify handles)."""
        cms = build_cms_signature(b"\x33" * 32, cn="Trunc", signed_attrs=True)
        cut = data.draw(st.integers(min_value=0, max_value=len(cms) - 1))
        try:
            parse_pkcs7_signature(cms[:cut])
        except SignatureError:
            pass

    @settings(max_examples=100, deadline=None)
    @given(st.data())
    def test_cms_byte_flip_degrades_or_invalidates(data):
        """Single byte flips anywhere in the CMS: either the parse raises
        SignatureError, or verification completes with a boolean verdict —
        extract_signatures turns both into row-level fields, so a corrupt
        signature can never kill a Spark task through this path."""
        pdf = build_signed_pdf("fuzz doc")
        sig = detect_signature_fields(pdf)[0]
        cms = bytearray(sig.contents)
        pos = data.draw(st.integers(min_value=0, max_value=len(cms) - 1))
        bit = data.draw(st.integers(min_value=0, max_value=7))
        cms[pos] ^= 1 << bit
        try:
            parsed = parse_pkcs7_signature(bytes(cms))
            r = verify_signature(pdf, parsed, sig.byte_range)
            assert isinstance(r.signature_valid, bool)
        except SignatureError:
            pass

    def test_extract_signatures_fuzz_wrapper_total():
        """The pipeline-facing wrapper never raises for CMS-level damage."""
        pdf = build_signed_pdf("wrapper doc")
        for cut in (0, 10, 100, 1000):
            broken = pdf.replace(b"/Contents <", b"/Contents <00", 1)
            rows = extract_signatures(broken[: len(broken) - cut] + b"%%EOF\n")
            assert isinstance(rows, list)


def test_multi_signer_incremental_revisions():
    """Real multi-signer shape: each signer appends an incremental
    revision.  Both signatures verify over their own revision; the first
    reads incremental_update=True (the file grew past its signed region)
    and its coverage fraction drops, while the second spans the whole
    extended file minus its own /Contents gap."""
    from oxidizepdf_spark.corpus import append_incremental_signature

    base = build_signed_pdf("two signer doc", signer_cn="First Signer")
    multi = append_incremental_signature(
        base,
        {
            1: b"<< /Type /Catalog /Pages 2 0 R "
               b"/AcroForm << /Fields [50 0 R 55 0 R] /SigFlags 3 >> >>",
            55: b"<< /FT /Sig /T (Sig2) /V 70 0 R >>",
        },
        70,
        signer_cn="Second Signer",
        key_type="ec-p256",
        signed_attrs=True,
    )
    rows = {r["field_name"]: r for r in extract_signatures(multi)}
    assert set(rows) == {"Sig1", "Sig2"}
    s1, s2 = rows["Sig1"], rows["Sig2"]
    assert s1["signer"] == "First Signer" and s1["signature_valid"]
    assert s1["incremental_update"] is True
    assert s2["signer"] == "Second Signer" and s2["signature_valid"]
    assert s2["signature_algorithm"] == "ECDSA-SHA256"
    assert s2["incremental_update"] is False
    assert s2["coverage"] > 0.5 > s1["coverage"] > 0
    # tampering rev-1 content invalidates BOTH (it sits in both ranges)
    bad = bytearray(multi)
    bad[multi.index(b"(two signer")] ^= 1
    rows2 = {r["field_name"]: r for r in extract_signatures(bytes(bad))}
    assert not rows2["Sig1"]["signature_valid"]
    assert not rows2["Sig2"]["signature_valid"]
    # tampering inside rev-2's appended objects invalidates ONLY Sig2
    # (flip the rev-2 catalog's /SigFlags digit — after rev-1's ranges,
    # inside Sig2's first range, and still a parseable dict)
    bad2 = bytearray(multi)
    bad2[multi.rindex(b"/SigFlags 3") + len(b"/SigFlags ")] = ord("2")
    rows3 = {r["field_name"]: r for r in extract_signatures(bytes(bad2))}
    assert rows3["Sig1"]["signature_valid"]
    assert not rows3["Sig2"]["signature_valid"]


def test_chain_verification_synthetic():
    """verify_certificate_chain on the fixture key: a self-signed cert
    is its own one-link chain; a corrupted TBS fails the link."""
    from oxidizepdf_spark.kernel.signatures import (
        verify_certificate_chain,
        verify_certificate_signature,
    )

    cert = build_self_signed_cert("Chain Unit")
    chain = verify_certificate_chain([cert])
    assert len(chain) == 1 and chain[0]["sig_ok"] and chain[0]["self_signed"]
    assert verify_certificate_signature(cert, cert)
    # flip a byte inside the TBS (the validity string) → link fails
    bad = cert.replace(b"240101000000Z", b"240101000001Z")
    assert not verify_certificate_signature(bad, bad)
    ec = build_self_signed_cert("EC Chain Unit", key_type="ec-p384",
                                digest_alg="SHA-384")
    assert verify_certificate_chain([ec])[0]["sig_ok"]


def test_docmdp_certification_level():
    """/Reference /TransformMethod /DocMDP read-back (ISO 32000
    §12.8.2.2): certification signatures report their permission level;
    approval signatures report None; a missing /P defaults to 2."""
    pdf = build_signed_pdf("certified", docmdp=1)
    sig = detect_signature_fields(pdf)[0]
    assert sig.certification_level == 1
    (r,) = extract_signatures(pdf)
    assert r["certification_level"] == 1 and r["signature_valid"]

    plain = build_signed_pdf("approval only")
    assert detect_signature_fields(plain)[0].certification_level is None

    # missing /P defaults to 2 (spec default)
    nop = build_signed_pdf("certified default", docmdp=2)
    nop = nop.replace(b" /P 2 /V /1.2", b" /V /1.2")
    assert detect_signature_fields(nop)[0].certification_level == 2


def test_cades_signing_certificate_binding():
    """PAdES / ETSI.CAdES shape: the ESS signingCertificateV2 attribute
    binds the signer cert by SHA-256 into the signed attributes; the
    extraction row reports the binding check (None for plain CMS)."""
    pdf = build_signed_pdf(
        "cades doc", sub_filter="ETSI.CAdES.detached", cades=True
    )
    sig = detect_signature_fields(pdf)[0]
    assert sig.is_pades()
    ps = parse_pkcs7_signature(sig.contents)
    assert ps.signing_cert_hash is not None
    assert ps.signing_cert_hash_alg == "SHA-256"
    assert ps.signing_certificate_bound() is True
    assert verify_signature(pdf, ps, sig.byte_range).is_valid()
    (r,) = extract_signatures(pdf)
    assert r["cades_cert_bound"] is True and r["signature_valid"]

    # plain CMS: attribute absent → None
    plain = build_signed_pdf("plain", signed_attrs=True)
    (rp,) = extract_signatures(plain)
    assert rp["cades_cert_bound"] is None

    # a different cert hash must fail the binding (swap the signer cert
    # hash by rebuilding the parsed struct against another cert)
    other = build_self_signed_cert("Not The Signer")
    ps.signer_certificate_der = other
    assert ps.signing_certificate_bound() is False

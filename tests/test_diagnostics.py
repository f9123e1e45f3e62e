"""Corruption triage parity (recovery/corruption.rs:85-287)."""

from oxidizepdf_spark.corpus import build_pdf_with_content_stream
from oxidizepdf_spark.kernel.diagnostics import detect_corruption, is_corrupted

OPS = b"BT /F1 12 Tf 72 720 Td (hello) Tj ET"


def test_clean_pdf_reports_analysis_complete():
    pdf = build_pdf_with_content_stream(OPS)
    r = detect_corruption(pdf)
    assert r["severity"] == 0
    assert r["corruption_type"] == "Unknown"  # reference default stays
    assert r["errors"] == ["PDF structure analysis complete"]
    assert r["estimated_objects"] >= 5
    # reference parity quirks, mirrored: the naive '/Type /Page' pattern
    # also matches '/Type /Pages', and the 200-byte post-obj window can
    # overlap the NEXT object's dict — so a 1-page doc reports 3
    assert r["found_pages"] >= 1
    # the naive 'xref' scan counts 'startxref' too — reference quirk
    assert sum(1 for s in r["sections"] if s[0] == "XRef") >= 2
    assert not is_corrupted(pdf)


def test_invalid_header_severity_10_immediate():
    r = detect_corruption(b"not a pdf at all but long enough")
    assert r["corruption_type"] == "InvalidHeader"
    assert r["severity"] == 10
    assert r["errors"] == ["Invalid PDF header"]
    # immediate bail: no object census ran
    assert r["estimated_objects"] == 0
    assert is_corrupted(b"junk data here")
    # too-short file: the read itself fails
    r2 = detect_corruption(b"%PDF")
    assert r2["severity"] == 10 and "Cannot read header" in r2["errors"][0]


def test_missing_eof_severity_5():
    pdf = build_pdf_with_content_stream(OPS)
    clipped = pdf.replace(b"%%EOF", b"%%XXX")
    r = detect_corruption(clipped)
    assert r["severity"] == 5
    assert r["corruption_type"] == "MissingEOF"
    assert "Missing %%EOF marker" in r["errors"]


def test_no_xref_severity_8_and_multiple():
    pdf = build_pdf_with_content_stream(OPS)
    # remove every 'xref' occurrence (xref table + startxref keyword)
    noxref = pdf.replace(b"xref", b"nref")
    r = detect_corruption(noxref)
    assert r["severity"] == 8
    assert r["corruption_type"] == "CorruptXRef"
    # both EOF and xref broken → Multiple
    r2 = detect_corruption(noxref.replace(b"%%EOF", b"%%XXX"))
    assert r2["corruption_type"] == "Multiple"
    assert set(r2["types"]) == {"MissingEOF", "CorruptXRef"}
    assert r2["severity"] == 8


def test_no_objects_severity_10():
    data = b"%PDF-1.4\nxref\n0 0\ntrailer\n%%EOF\n"
    r = detect_corruption(data)
    assert r["severity"] == 10
    assert r["estimated_objects"] == 0
    assert "No PDF objects found" in r["errors"]

def test_oracle_probe_constants_pinned():
    """Pin the canonical-probe census constants hard-coded in
    ORACLE_DETECT_CORRUPTION (queries.py): the single-page build_text_pdf
    probe has exactly 5 indirect objects and reports found_pages=3 (the
    200-byte lookahead overlap quirk), for any doc_id digit width."""
    from oxidizepdf_spark.corpus import build_text_pdf

    for doc_id in (0, 7, 123, 99999999):
        pdf = build_text_pdf(f"corruption probe {doc_id}")
        expected = {
            0: ("Unknown", 0, 1, 5, 3),
            1: ("InvalidHeader", 10, 1, 0, 0),
            2: ("MissingEOF", 5, 1, 5, 3),
            3: ("CorruptXRef", 8, 2, 5, 3),
            4: ("Multiple", 8, 2, 5, 3),
        }
        muts = {
            0: pdf,
            1: b"XX" + pdf[2:],
            2: pdf.replace(b"%%EOF", b"%%EOX"),
            3: pdf.replace(b"xref", b"xrEf"),
            4: pdf.replace(b"%%EOF", b"%%EOX").replace(b"xref", b"xrEf"),
        }
        for v, data in muts.items():
            r = detect_corruption(data)
            got = (
                r["corruption_type"], r["severity"], len(r["errors"]),
                r["estimated_objects"], r["found_pages"],
            )
            assert got == expected[v], (doc_id, v, got)


def test_validate_pdf_bytes_clean():
    """recovery/validator.rs validate_document shape, with REAL xref and
    object passes (the reference's are mocked — validator.rs:206)."""
    from oxidizepdf_spark.corpus import build_text_pdf
    from oxidizepdf_spark.kernel.diagnostics import is_valid_pdf, validate_pdf_bytes

    r = validate_pdf_bytes(build_text_pdf("ok"), strict=True)
    assert r["is_valid"] and not r["errors"]
    assert r["stats"]["pages_validated"] == 1
    assert r["stats"]["xrefs_validated"] == 1
    assert r["stats"]["objects_checked"] >= 5
    assert r["stats"]["valid_objects"] >= 5
    assert is_valid_pdf(build_text_pdf("ok"))


def test_validate_pdf_bytes_findings():
    import re

    from oxidizepdf_spark.corpus import build_pdf_with_content_stream, build_text_pdf
    from oxidizepdf_spark.kernel.diagnostics import is_valid_pdf, validate_pdf_bytes

    # zero-width page → dimension error (validator.rs:186 message)
    bad_dims = build_pdf_with_content_stream(b"BT ET").replace(
        b"[0 0 612 792]", b"[0 0 000 792]"
    )
    r = validate_pdf_bytes(bad_dims)
    assert not r["is_valid"]
    assert any("invalid dimensions" in e for e in r["errors"])

    # an xref entry pointing at the wrong offset → real xref finding
    good = build_text_pdf("ok")
    broken = re.sub(
        rb"\n(\d{10}) 00000 n \n(\d{10}) 00000 n ",
        rb"\n\1 00000 n \n0000000001 00000 n ",
        good,
        count=1,
    )
    r2 = validate_pdf_bytes(broken)
    assert any("InvalidXref" in e for e in r2["errors"])

    assert not is_valid_pdf(b"not a pdf at all")


def test_extract_viewer_info_surface():
    """Read half of viewer_preferences.rs / page_transitions.rs + PDF/A
    identification from the XMP pdfaid schema."""
    from oxidizepdf_spark.corpus import build_pdf_with_content_stream
    from oxidizepdf_spark.kernel.extract import extract_viewer_info

    pdf = build_pdf_with_content_stream(
        b"BT ET",
        catalog_extra="/PageLayout /TwoColumnLeft /PageMode /UseOutlines "
        "/ViewerPreferences << /HideToolbar true /Direction /R2L "
        "/NumCopies 2 >>",
        page_dict_extra=" /Trans << /S /Wipe /D 2.5 >> /Dur 5",
        xmp={"title": "T", "pdfaid_part": "2", "pdfaid_conformance": "b"},
    )
    info = extract_viewer_info(pdf)
    assert info["page_layout"] == "TwoColumnLeft"
    assert info["page_mode"] == "UseOutlines"
    assert info["viewer_preferences"] == {
        "HideToolbar": True, "Direction": "R2L", "NumCopies": 2
    }
    assert info["transitions"] == [
        {"page": 0, "style": "Wipe", "duration": 2.5, "dur": 5.0}
    ]
    assert info["pdfa_part"] == 2 and info["pdfa_conformance"] == "B"

    # absent everything → None/empty; unknown names get the '?' marker
    plain = build_pdf_with_content_stream(b"BT ET")
    info2 = extract_viewer_info(plain)
    assert info2["page_layout"] is None and info2["transitions"] == []
    assert info2["pdfa_part"] is None
    weird = build_pdf_with_content_stream(
        b"BT ET", catalog_extra="/PageLayout /Spiral",
        page_dict_extra=" /Trans << /S /Warp >>",
    )
    info3 = extract_viewer_info(weird)
    assert info3["page_layout"] == "Spiral?"
    assert info3["transitions"][0]["style"] == "Warp?"


def test_xmp_pdfaid_does_not_leak_into_metadata():
    """extract_metadata's oracle-pinned fields ignore the pdfaid schema."""
    from oxidizepdf_spark.corpus import build_pdf_with_content_stream
    from oxidizepdf_spark.kernel.extract import extract_metadata

    pdf = build_pdf_with_content_stream(
        b"BT ET", xmp={"title": "T", "pdfaid_part": "3"}
    )
    md = extract_metadata(pdf)
    assert md["title"] == "T" and md["xmp_present"] is True


def _embedded_font_objects():
    """Minimal embedded TrueType so check_fonts passes: /FontDescriptor
    with a /FontFile2 stream."""
    return (
        b"<< /Type /Font /Subtype /TrueType /BaseFont /Stub "
        b"/FontDescriptor 30 0 R >>",
        {30: b"<< /Type /FontDescriptor /FontName /Stub /Flags 4 "
             b"/FontFile2 31 0 R >>",
         31: b"<< /Length 4 >>\nstream\n\x00\x01\x00\x00\nendstream"},
    )


def test_pdfa_validator_matrix():
    """pdfa/validator.rs check sequence: each forbidden construct maps
    to its ValidationError variant; part-2 relaxations (transparency,
    LZW) honored; encrypted docs short-circuit."""
    from oxidizepdf_spark.corpus import (
        build_encrypted_pdf,
        build_pdf_with_content_stream,
    )
    from oxidizepdf_spark.kernel.pdfa import validate_claimed_pdfa, validate_pdfa

    font_obj, extra = _embedded_font_objects()

    # fully compliant PDF/A-1b: 1.4 header, XMP claim, embedded font
    good = build_pdf_with_content_stream(
        b"BT /F1 12 Tf 100 700 Td (x) Tj ET",
        font_obj=font_obj, extra_objects=extra,
        xmp={"title": "T", "pdfaid_part": "1", "pdfaid_conformance": "b"},
    )
    r = validate_pdfa(good, "1b")
    assert r["is_compliant"], r["errors"]
    claimed = validate_claimed_pdfa(good)
    assert claimed["claimed"] == "1b" and claimed["is_compliant"]

    # conformance A additionally wants ToUnicode on the (Encoding-less) font
    ra = validate_pdfa(good, "1a")
    assert "FontMissingToUnicode: F1" in ra["errors"]

    # default Helvetica is NOT embedded
    plain = build_pdf_with_content_stream(
        b"BT ET", xmp={"pdfaid_part": "1", "pdfaid_conformance": "b"}
    )
    assert "FontNotEmbedded: F1" in validate_pdfa(plain, "1b")["errors"]

    # no XMP at all
    noxmp = build_pdf_with_content_stream(b"BT ET", font_obj=font_obj,
                                          extra_objects=extra)
    assert "XmpMetadataMissing" in validate_pdfa(noxmp, "1b")["errors"]
    assert validate_claimed_pdfa(noxmp)["claimed"] is None

    # part mismatch message mirrors error.rs payload
    assert (
        "XmpInvalidPdfAIdentifier: Part mismatch: expected 2, found 1"
        in validate_pdfa(good, "2b")["errors"]
    )

    # forbidden constructs
    bad = build_pdf_with_content_stream(
        b"BT ET", content_filter="LZWDecode", font_obj=font_obj,
        extra_objects=extra,
        catalog_extra="/OpenAction << /S /Launch /F (e.exe) >> "
        "/Names << /JavaScript << >> /EmbeddedFiles << >> >>",
        page_extra="/ExtGState << /GS0 << /ca 0.5 /BM /Multiply "
        "/SMask << >> >> >> /ColorSpace << /CS0 /DeviceRGB >> ",
        xmp={"pdfaid_part": "1", "pdfaid_conformance": "b"},
    )
    errs = validate_pdfa(bad, "1b")["errors"]
    assert "JavaScriptForbidden: Names/JavaScript" in errs
    assert "ExternalReferenceForbidden: Launch" in errs
    assert "EmbeddedFileForbidden" in errs
    assert "TransparencyForbidden: Page 1, ExtGState/GS0/ca" in errs
    assert "TransparencyForbidden: Page 1, ExtGState/GS0/SMask" in errs
    assert "TransparencyForbidden: Page 1, ExtGState/GS0/BM=Multiply" in errs
    assert any(e.startswith("LzwCompressionForbidden") for e in errs)
    assert "InvalidColorSpace: DeviceRGB at Page 1, ColorSpace/CS0" in errs

    # part 2 allows transparency + LZW (but still flags JS/external/files)
    errs2 = validate_pdfa(
        bad.replace(b"pdfaid:part>1<", b"pdfaid:part>2<"), "2b"
    )["errors"]
    assert not any("Transparency" in e or "Lzw" in e for e in errs2)
    assert "EmbeddedFileForbidden" in errs2  # forbidden below part 3
    errs3 = validate_pdfa(
        bad.replace(b"pdfaid:part>1<", b"pdfaid:part>3<"), "3b"
    )["errors"]
    assert "EmbeddedFileForbidden" not in errs3

    # OutputIntents legalizes device color
    intent = build_pdf_with_content_stream(
        b"BT ET", font_obj=font_obj, extra_objects=extra,
        catalog_extra="/OutputIntents [ << /Type /OutputIntent >> ]",
        page_extra="/ColorSpace << /CS0 /DeviceRGB >> ",
        xmp={"pdfaid_part": "1", "pdfaid_conformance": "b"},
    )
    assert validate_pdfa(intent, "1b")["is_compliant"]

    # encryption short-circuits
    enc = build_encrypted_pdf("s", user_pw=b"pw")
    assert validate_pdfa(enc, "1b")["errors"] == ["EncryptionForbidden"]

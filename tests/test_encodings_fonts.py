"""Encoding-path kernel tests: /Differences, WinAnsi high bytes, base
encodings, font-name fallback selection (extraction.rs:1766-1831,
extraction_cmap.rs:718-745)."""

from __future__ import annotations

from oxidizepdf_spark.corpus import build_pdf_with_content_stream
from oxidizepdf_spark.kernel.extract import extract_pdf_bytes
from oxidizepdf_spark.kernel.fonts import FontInfo, decode_text
from oxidizepdf_spark.kernel.encodings import decode_winansi_byte


def test_differences_glyph_names():
    """Font /Encoding dict with /Differences remaps codes via glyph names."""
    font = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Custom "
        b"/Encoding << /BaseEncoding /WinAnsiEncoding "
        b"/Differences [65 /bullet /Euro 70 /eacute] >> >>"
    )
    pdf = build_pdf_with_content_stream(
        b"BT /F1 12 Tf 100 700 Td (ABCF) Tj ET", font_obj=font
    )
    res = extract_pdf_bytes(pdf)
    # A(65)->bullet, B(66)->Euro, C untouched, F(70)->eacute
    assert res.spans == [("text", "•€Cé", None)]


def test_winansi_high_bytes():
    assert decode_winansi_byte(0x80) == "€"
    assert decode_winansi_byte(0x93) == "“"
    assert decode_winansi_byte(0xE9) == "é"  # latin-1 passthrough


def test_decode_text_fallback_by_font_name():
    # no FontInfo: falls back by name pattern (extraction.rs:1799-1819)
    assert decode_text(b"caf\xe9", "Helvetica", {}) == "café"  # WinAnsi
    # unknown name → PdfDocEncoding (utf-8 lossy per encoding.rs:164-166)
    assert decode_text(b"abc", "F1", {}) == "abc"


def test_decode_text_cmap_garbage_gate():
    """A CMap decoding to all-control chars is rejected; fallback applies
    (extraction.rs:1777-1780)."""
    from oxidizepdf_spark.kernel.cmap import CMap

    info = FontInfo()
    info.font_type = "Type1"
    cm = CMap.parse(b"1 beginbfchar <61> <0001> endbfchar")  # 'a' -> SOH control
    info.to_unicode = cm
    out = decode_text(b"a", "F9", {"F9": info})
    assert out == "a"  # gate rejected the control-only result → PdfDoc fallback


def test_macroman_font_name_fallback():
    assert decode_text(b"\xa5", "MyMacRomanFont", {}) == "•"  # bullet


def test_standard14_afm_widths_used_without_widths_array():
    """A Standard-14 font with no /Widths uses real AFM advances
    (kernel/afm_widths.py), not the 0.5em guess — the space-synthesis
    decision at a marginal gap proves which table was used:
    'lili' in Helvetica is 4x222 = 888/1000 em (10.66pt at 12pt); a second
    show 4pt past its true right edge must synthesize a space. The 0.5em
    guess (24pt) would put last_x past the second origin and emit none."""
    from oxidizepdf_spark.corpus import build_pdf_with_content_stream
    from oxidizepdf_spark.kernel.extract import extract_pdf_bytes

    content = (
        b"BT /F1 12 Tf 100 700 Td (lili) Tj "
        b"1 0 0 1 114.66 700 Tm (next) Tj ET"
    )
    res = extract_pdf_bytes(build_pdf_with_content_stream(content))
    assert res.page_texts[0] == "lili next"


def test_standard14_width_tables_sane():
    from oxidizepdf_spark.kernel.afm_widths import standard14_widths

    helv, d = standard14_widths("ABCDEF+Helvetica-Oblique")
    assert helv[32] == 278 and helv[ord("i")] == 222 and helv[ord("W")] == 944
    times, d = standard14_widths("Times-Roman")
    assert times[32] == 250 and times[ord("m")] == 778
    cour, d = standard14_widths("Courier-BoldOblique")
    assert set(cour) == {600}
    assert standard14_widths("EmbeddedCustomSans") is None


_EMBEDDED_CMAP = b"""/CIDInit /ProcSet findresource begin
12 dict begin
begincmap
/CIDSystemInfo 3 dict dup begin
/Registry (Adobe) def
/Ordering (GB1) def
/Supplement 0 def
end def
/CMapName /Test-Embedded-H def
/CMapType 1 def
1 begincodespacerange
<0000> <ffff>
endcodespacerange
3 begincidchar
<0001> 4559
<0002> 3809
<0003> 1875
endcidchar
endcmap
CMapName currentdict /CMap defineresource pop
end
end
"""


def _type0_pdf(encoding_is_stream: bool):
    from oxidizepdf_spark.corpus import _stream_obj, build_pdf_with_content_stream

    enc = b"8 0 R" if encoding_is_stream else b"/Identity-H"
    font = (
        b"<< /Type /Font /Subtype /Type0 /BaseFont /Test-GB1 /Encoding "
        + enc
        + b" /DescendantFonts [9 0 R] >>"
    )
    desc = (
        b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Test-GB1 "
        b"/CIDSystemInfo << /Registry (Adobe) /Ordering (GB1) "
        b"/Supplement 0 >> /CIDToGIDMap /Identity >>"
    )
    extra = {9: desc}
    if encoding_is_stream:
        extra[8] = _stream_obj(
            b"/Type /CMap /CMapName /Test-Embedded-H /CMapType 1",
            _EMBEDDED_CMAP,
        )
    return build_pdf_with_content_stream(
        b"BT /F1 12 Tf 100 700 Td <000100020003> Tj ET",
        font_obj=font,
        extra_objects=extra,
    )


def test_embedded_encoding_stream_maps_codes_to_cid_to_unicode():
    """encoding_embedded_stream_test.rs: a Type0 /Encoding that is a
    REFERENCE to a CMapType-1 stream drives code→CID→Unicode end-to-end —
    codes <0001><0002><0003> remap to GB1 CIDs 4559/3809/1875 → 中我国."""
    from oxidizepdf_spark.kernel.extract import extract_pdf_bytes

    res = extract_pdf_bytes(_type0_pdf(True))
    assert res.error is None
    assert res.page_texts[0] == "中我国"


def test_identity_h_same_bytes_do_not_produce_cjk():
    """Contrast case from the same reference test: under /Identity-H the
    bytes are raw CIDs 1/2/3 — NOT CJK — proving the embedded stream (not a
    default) produced the ideographs above."""
    from oxidizepdf_spark.kernel.extract import extract_pdf_bytes

    res = extract_pdf_bytes(_type0_pdf(False))
    cjk = [c for c in res.page_texts[0] if "一" <= c <= "鿿"]
    assert not cjk, res.page_texts[0]


def test_decode_with_encoding_table_matches_slow_loop():
    """The per-FontInfo translate-table fast path vs the per-byte
    authority loop, over every encoding x differences combination on
    random byte runs (incl. multi-char glyph expansions)."""
    import random

    from oxidizepdf_spark.kernel.fonts import (
        FontInfo,
        _decode_with_encoding,
        _decode_with_encoding_slow,
    )

    rng = random.Random(6)
    diff_variants = [
        None,
        {},
        {65: "bullet", 66: "nosuchglyph", 200: "ffi", 1: "space"},
        {0: "Adieresis", 255: "quotesingle", 128: "Euro"},
        {"bad": "key", 70: "emdash"},  # non-int key must be ignored
    ]
    for enc in (None, "WinAnsiEncoding", "MacRomanEncoding",
                "StandardEncoding", "SomethingElse"):
        for diffs in diff_variants:
            info = FontInfo()
            info.encoding = enc
            info.differences = diffs
            for _ in range(20):
                data = bytes(rng.randrange(0, 256)
                             for _ in range(rng.randrange(0, 40)))
                assert _decode_with_encoding(data, info) == \
                    _decode_with_encoding_slow(data, info), (enc, diffs, data)


def test_sanitize_fast_path_matches_state_machine():
    """Clean strings short-circuit; every trigger class still routes to
    the authority state machine — outputs equal across a fuzz mix."""
    import random

    from oxidizepdf_spark.kernel.fonts import (
        _SANITIZE_TRIGGER,
        sanitize_extracted_text,
    )

    def slow(text):
        # the original state machine, inlined as the authority
        out, last_was_space, i, n = [], False, 0, len(text)
        while i < n:
            ch = text[i]
            if ch == "\x00":
                if i + 1 < n and text[i + 1] == "\x03":
                    i += 1
                if not last_was_space:
                    out.append(" ")
                    last_was_space = True
            elif ch == "\x03":
                pass
            elif ch in "\t\n\r":
                out.append(ch)
                last_was_space = ch == "\t"
            elif ch == " ":
                if not last_was_space:
                    out.append(" ")
                    last_was_space = True
            elif ch < " " or ch == "\x7f":
                pass
            else:
                out.append(ch)
                last_was_space = False
            i += 1
        return "".join(out)

    rng = random.Random(7)
    alphabet = "ab X\t\n\r\x00\x03\x7f\x01  é."
    for _ in range(3000):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 30)))
        assert sanitize_extracted_text(s) == slow(s), repr(s)
    # the fast path actually fires for clean text
    assert _SANITIZE_TRIGGER.search("normal text with single spaces") is None
    assert _SANITIZE_TRIGGER.search("tab\there") is None
    assert _SANITIZE_TRIGGER.search("tab\t here") is not None
    assert _SANITIZE_TRIGGER.search("double  space") is not None

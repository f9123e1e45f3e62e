"""CID-collection mechanism tests (J3 broadcast path, cid_to_unicode.rs)."""

from __future__ import annotations

from oxidizepdf_spark.corpus import build_pdf_with_content_stream
from oxidizepdf_spark.kernel.cid_tables import (
    CidCollection,
    decode_with_cid_table,
    from_ordering,
    register_collection,
)
from oxidizepdf_spark.kernel.extract import extract_pdf_bytes


def test_collection_lookup_and_fffd():
    coll = CidCollection("TestOrd", {1: ord("你"), 2: ord("好"), 500: ord("!")})
    assert coll.cid_to_unicode(1) == "你"
    assert coll.cid_to_unicode(500) == "!"
    assert coll.cid_to_unicode(3) is None
    # 2-byte BE walk: known, unknown(→U+FFFD), CID 0 (dropped)
    text = b"\x00\x01\x00\x03\x00\x00\x00\x02"
    assert decode_with_cid_table(text, coll) == "你�好"


def test_from_ordering_unregistered_is_none():
    assert from_ordering("NoSuchCollection") is None
    assert from_ordering(None) is None


def test_type0_cid_collection_end_to_end():
    """Identity-H Type0 font with NO ToUnicode but a registered CID
    collection for its CIDSystemInfo ordering decodes through the table
    (extraction_cmap.rs:594-611 path)."""
    register_collection(
        CidCollection("PyTestCJK", {0x48: ord("H"), 0x69: ord("i")})
    )
    font = (
        b"<< /Type /Font /Subtype /Type0 /BaseFont /Dummy /Encoding /Identity-H "
        b"/DescendantFonts [9 0 R] >>"
    )
    desc = (
        b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Dummy "
        b"/CIDSystemInfo << /Registry (Adobe) /Ordering (PyTestCJK) "
        b"/Supplement 0 >> >>"
    )
    pdf = build_pdf_with_content_stream(
        b"BT /F1 12 Tf 100 700 Td <00480069> Tj ET",
        font_obj=font,
        extra_objects={9: desc},
    )
    res = extract_pdf_bytes(pdf)
    assert res.spans == [("text", "Hi", None)]


def test_broadcast_roundtrip_arrays():
    from oxidizepdf_spark.kernel import cid_tables

    register_collection(CidCollection("BCast", {7: ord("Z")}))
    payload = {
        name: (c._cids, c._unis) for name, c in cid_tables._REGISTRY.items()
    }
    cid_tables._REGISTRY.pop("BCast")
    cid_tables.register_from_arrays(payload)
    assert from_ordering("BCast").cid_to_unicode(7) == "Z"


def test_bundled_tables_load_lazily():
    """GB1/Japan1/Korea1 derived tables (tools/gen_cid_unicode.py: Adobe's
    BSD CMap resources composed with Python's CJK codecs) register on
    first from_ordering miss."""
    from oxidizepdf_spark.kernel.cid_tables import from_ordering

    g = from_ordering("GB1")
    assert g is not None and len(g) > 20_000
    j = from_ordering("Japan1")
    assert j is not None and len(j) > 7_000
    # canonical anchor: Adobe-Japan1 CID 843 is HIRAGANA LETTER A
    assert j.cid_to_unicode(843) == "あ"
    k = from_ordering("Korea1")
    assert k is not None and len(k) > 15_000
    # CNS1 bundled since round 3 (tools/gen_cns1_table.py)
    c = from_ordering("CNS1")
    assert c is not None and len(c) > 16_000
    assert c.cid_to_unicode(661) == "中"


def test_identity_h_gb1_without_tounicode_decodes():
    """The fixture class the reference covers with cid_to_unicode.rs
    (extraction_cmap.rs:650-669): a Type0 Identity-H font whose descendant
    names a CID collection, NO ToUnicode — CIDs decode through the
    collection table, not to glyph-index garbage."""
    from oxidizepdf_spark.corpus import build_pdf_with_content_stream
    from oxidizepdf_spark.kernel.extract import extract_pdf_bytes

    font = (
        b"<< /Type /Font /Subtype /Type0 /BaseFont /STSong-Light "
        b"/Encoding /Identity-H /DescendantFonts [8 0 R] >>"
    )
    desc = (
        b"<< /Type /Font /Subtype /CIDFontType0 /BaseFont /STSong-Light "
        b"/CIDSystemInfo << /Registry (Adobe) /Ordering (GB1) "
        b"/Supplement 2 >> >>"
    )
    content = b"BT /F1 12 Tf 100 700 Td <0B46 1042> Tj ET"
    pdf = build_pdf_with_content_stream(
        content, font_obj=font, extra_objects={8: desc}
    )
    res = extract_pdf_bytes(pdf)
    assert res.error is None
    assert res.page_texts[0] == "你一"  # 你一


def test_identity_h_cns1_without_tounicode_decodes():
    """Traditional-Chinese Type0 (Adobe-CNS1, the collection the engine
    lacked through round 2): Identity-H, NO ToUnicode, descendant names
    CNS1 — CIDs decode via the bundled derived table
    (tools/gen_cns1_table.py), no glyph-index garbage. CID values are read
    from the table itself so the test stays valid if the data is
    regenerated: 中(661) 國(2615) 臺(3837) 灣(4334) in the current data."""
    import gzip

    from importlib import resources

    from oxidizepdf_spark.corpus import build_pdf_with_content_stream
    from oxidizepdf_spark.kernel.extract import extract_pdf_bytes

    inv: dict[int, int] = {}
    raw = (
        resources.files("oxidizepdf_spark.kernel") / "data"
        / "cid_unicode_cns1.txt.gz"
    ).read_bytes()
    for line in gzip.decompress(raw).decode("ascii").splitlines():
        if line.startswith("#") or not line:
            continue
        cid_s, cp_s = line.split()
        inv.setdefault(int(cp_s), int(cid_s))
    text = "中國臺灣"
    cids = b"".join(inv[ord(ch)].to_bytes(2, "big") for ch in text)
    font = (
        b"<< /Type /Font /Subtype /Type0 /BaseFont /MSung-Light "
        b"/Encoding /Identity-H /DescendantFonts [8 0 R] >>"
    )
    desc = (
        b"<< /Type /Font /Subtype /CIDFontType0 /BaseFont /MSung-Light "
        b"/CIDSystemInfo << /Registry (Adobe) /Ordering (CNS1) "
        b"/Supplement 4 >> >>"
    )
    content = b"BT /F1 12 Tf 100 700 Td <%s> Tj ET" % cids.hex().encode()
    pdf = build_pdf_with_content_stream(
        content, font_obj=font, extra_objects={8: desc}
    )
    res = extract_pdf_bytes(pdf)
    assert res.error is None
    assert res.page_texts[0] == text
    # an unmapped CID (the residual gap, e.g. whatever maps nowhere) must
    # yield U+FFFD, matching extraction_cmap.rs:646-669 semantics
    content2 = b"BT /F1 12 Tf 100 700 Td <4AFE> Tj ET"  # CID 19198 > max
    pdf2 = build_pdf_with_content_stream(
        content2, font_obj=font, extra_objects={8: desc}
    )
    res2 = extract_pdf_bytes(pdf2)
    assert res2.page_texts[0] == "�"


def test_cns1_radical_repair_and_gap_fill():
    """Round-7 table repair (VERDICT r6 #3): the raw vendored source
    mapped CID 595 to the Kangxi-radical lookalike U+2F00 and lacked
    ~2,200 CIDs entirely. The generator now NFKC-repairs radical
    lookalikes and interpolates gaps by big5hkscs code order, each only
    where code-order cross-validation passes (tools/gen_cns1_table.py
    repair_radicals / fill_gaps). Pins the canonical first Big5
    ideographs and a previously-missing supplementary-plane fill."""
    from oxidizepdf_spark.kernel.cid_tables import from_ordering

    c = from_ordering("CNS1")
    assert len(c) > 18_000  # 16,950 raw + repairs + fills
    # Big5 0xA440/0xA441/0xA442 = Adobe-CNS1 CIDs 595/596/597
    assert c.cid_to_unicode(595) == "一"  # was ⼀ U+2F00 (radical)
    assert c.cid_to_unicode(596) == "乙"  # was ⼄ U+2F04
    assert c.cid_to_unicode(597) == "丁"  # always correct — the anchor
    # gap-filled: CID 14000 was absent; big5hkscs interpolation
    # recovers the HKSCS supplementary ideograph U+200CC
    assert c.cid_to_unicode(14000) == "\U000200CC"


def test_identity_h_cns1_yi_decodes():
    """End-to-end: 一 (the single most common Traditional-Chinese
    character) through an Identity-H CNS1 font with no ToUnicode —
    previously U+FFFD, now the real glyph."""
    from oxidizepdf_spark.corpus import build_pdf_with_content_stream
    from oxidizepdf_spark.kernel.extract import extract_pdf_bytes

    font = (
        b"<< /Type /Font /Subtype /Type0 /BaseFont /MSung-Light "
        b"/Encoding /Identity-H /DescendantFonts [8 0 R] >>"
    )
    desc = (
        b"<< /Type /Font /Subtype /CIDFontType0 /BaseFont /MSung-Light "
        b"/CIDSystemInfo << /Registry (Adobe) /Ordering (CNS1) "
        b"/Supplement 4 >> >>"
    )
    content = b"BT /F1 12 Tf 100 700 Td <0253> Tj ET"  # CID 595
    pdf = build_pdf_with_content_stream(
        content, font_obj=font, extra_objects={8: desc}
    )
    res = extract_pdf_bytes(pdf)
    assert res.error is None
    assert res.page_texts[0] == "一"

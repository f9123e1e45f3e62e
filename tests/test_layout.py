"""Layout-reconstruction parity tests — ported verbatim from the reference's
own unit suite (oxidize-pdf-core/src/text/extraction.rs:3269-3686) plus
end-to-end preserve_layout/reconstruct_paragraphs extraction.
"""

from __future__ import annotations

from oxidizepdf_spark.corpus import build_pdf_with_content_stream
from oxidizepdf_spark.kernel.extract import extract_pdf_bytes
from oxidizepdf_spark.kernel.layout import (
    LayoutProcessor,
    TextFragment,
    assign_row_ids,
    parse_font_style,
    standard_14_space_width,
)
from oxidizepdf_spark.kernel.textstate import ExtractionOptions


def tf(text, x, y, width, font_size):
    """Reference test helper (extraction.rs:3269-3285)."""
    return TextFragment(text, x, y, width, font_size, font_size)


def proc(**kw):
    return LayoutProcessor(ExtractionOptions(**kw))


# -- merge_into_lines (extraction.rs:3288-3468) -------------------------------


def test_merge_into_lines_groups_same_baseline():
    p = proc(reconstruct_paragraphs=True)
    lines = p.merge_into_lines(
        [
            tf("Hello", 50.0, 400.0, 30.0, 12.0),
            tf("world", 90.0, 400.0, 30.0, 12.0),
            tf("now.", 130.0, 400.0, 25.0, 12.0),
            tf("Next", 50.0, 386.0, 30.0, 12.0),
            tf("line.", 90.0, 386.0, 25.0, 12.0),
        ]
    )
    assert len(lines) == 2
    assert lines[0].text == "Hello world now."
    assert lines[1].text == "Next line."


def test_merge_into_lines_space_threshold():
    p = proc(reconstruct_paragraphs=True, space_threshold=0.3)
    lines = p.merge_into_lines(
        [tf("AB", 50.0, 400.0, 10.0, 12.0), tf("CD", 64.0, 400.0, 10.0, 12.0)]
    )
    assert lines[0].text == "AB CD"
    lines = p.merge_into_lines(
        [tf("AB", 50.0, 400.0, 10.0, 12.0), tf("CD", 61.0, 400.0, 10.0, 12.0)]
    )
    assert lines[0].text == "ABCD"


def test_merge_into_lines_font_switch_overlap_keeps_emission_order():
    # #302 symptom 1 (extraction.rs:3374-3400)
    p = proc(reconstruct_paragraphs=True)
    lines = p.merge_into_lines(
        [
            tf("to t", 455.5, 400.0, 12.0, 10.0),
            tf("he", 467.5, 400.0, 10.0, 10.0),
            tf("Z", 455.3, 400.0, 23.0, 10.0),
        ]
    )
    assert len(lines) == 1
    assert lines[0].text == "to theZ"


def test_merge_into_lines_backfill_keeps_emission_order():
    # #305 (extraction.rs:3403-3430)
    p = proc(reconstruct_paragraphs=True)
    lines = p.merge_into_lines(
        [
            tf("selection", 479.0, 400.0, 38.0, 8.0),
            tf("s", 517.0, 400.0, 4.0, 8.0),
            tf("d", 492.0, 400.0, 4.0, 8.0),
            tf("escribed", 496.0, 400.0, 41.0, 8.0),
        ]
    )
    assert lines[0].text == "selectionsdescribed"


def test_merge_into_lines_disjoint_backward_jump_uses_x_order():
    p = proc(reconstruct_paragraphs=True)
    lines = p.merge_into_lines(
        [
            tf("boson", 100.0, 400.0, 28.0, 10.0),
            tf("the", 80.0, 400.0, 15.0, 10.0),
        ]
    )
    assert len(lines) == 1
    assert lines[0].text == "the boson"


def test_merge_into_lines_unioned_bbox():
    p = proc(reconstruct_paragraphs=True)
    lines = p.merge_into_lines(
        [tf("A", 50.0, 400.0, 10.0, 12.0), tf("B", 100.0, 400.0, 10.0, 12.0)]
    )
    assert len(lines) == 1
    assert abs(lines[0].x - 50.0) < 0.01
    assert abs(lines[0].width - 60.0) < 0.01


# -- standard-14 / font style (extraction.rs:3341-3370, doc tests) ------------


def test_standard_14_space_width():
    assert standard_14_space_width("Times-Roman") == 250.0
    assert standard_14_space_width("Times-BoldItalic") == 250.0
    assert standard_14_space_width("Helvetica") == 278.0
    assert standard_14_space_width("Courier-Bold") == 600.0
    assert standard_14_space_width("Symbol") == 250.0
    assert standard_14_space_width("ZapfDingbats") == 278.0
    assert standard_14_space_width("ABCDEF+Times-Roman") == 250.0
    assert standard_14_space_width("Arial-BoldMT") == 278.0
    assert standard_14_space_width("TimesNewRomanPSMT") == 250.0
    assert standard_14_space_width("CourierNewPSMT") == 600.0
    assert standard_14_space_width("Poppins-Regular") is None
    assert standard_14_space_width("VUNXGH+Calibri") is None


def test_parse_font_style():
    assert parse_font_style("Helvetica-Bold") == (True, False)
    assert parse_font_style("Times-BoldItalic") == (True, True)
    assert parse_font_style("Courier") == (False, False)
    assert parse_font_style("Arial-Italic") == (False, True)


def test_assign_row_ids():
    # monotone descending Y keeps row 0; a Y-up jump bumps the row id
    frags = [tf("A", 50.0, 400.0, 10.0, 9.0), tf("B", 50.0, 388.0, 10.0, 9.0)]
    assert assign_row_ids(frags) == [0, 0]
    frags = [tf("A", 50.0, 380.0, 10.0, 9.0), tf("B", 50.0, 400.0, 10.0, 9.0)]
    assert assign_row_ids(frags) == [0, 1]


# -- paragraphs ----------------------------------------------------------------


def test_merge_into_paragraphs_gap_and_hyphen():
    p = proc(reconstruct_paragraphs=True)
    # two tightly-leaded lines join with \n; a big gap starts a new paragraph
    lines = [
        tf("First line", 50.0, 400.0, 80.0, 12.0),
        tf("second line.", 50.0, 386.0, 80.0, 12.0),
        tf("New paragraph.", 50.0, 340.0, 80.0, 12.0),
    ]
    paras = p.merge_into_paragraphs(lines)
    assert len(paras) == 2
    assert paras[0].text == "First line\nsecond line."
    assert paras[1].text == "New paragraph."


def test_merge_into_paragraphs_hyphen_join():
    p = proc(reconstruct_paragraphs=True)
    lines = [
        tf("hyphen-", 50.0, 400.0, 60.0, 12.0),
        tf("ated", 50.0, 386.0, 30.0, 12.0),
    ]
    paras = p.merge_into_paragraphs(lines)
    assert paras[0].text == "hyphenated"


def test_merge_close_fragments_kerning_artifact():
    # "IN VO ICE" -> "INVOICE" (extraction.rs:1597 doc comment)
    p = proc()
    frags = [
        tf("IN", 50.0, 400.0, 12.0, 12.0),
        tf("VO", 63.0, 400.0, 12.0, 12.0),  # 1pt gap < 0.5*12
        tf("ICE", 76.0, 400.0, 16.0, 12.0),
    ]
    merged = p.merge_close_fragments(frags)
    assert len(merged) == 1
    assert merged[0].text == "INVOICE"


# -- end to end through real PDFs ----------------------------------------------


def test_preserve_layout_fragments_end_to_end():
    content = (
        b"BT /F1 12 Tf 100 700 Td (Hello) Tj 120 0 Td (World) Tj "
        b"0 -50 Td (Lower) Tj ET"
    )
    pdf = build_pdf_with_content_stream(content)
    res = extract_pdf_bytes(pdf, ExtractionOptions(preserve_layout=True))
    frags = res.page_fragments[0]
    assert [f.text for f in frags] == ["Hello", "World", "Lower"]
    assert frags[0].x == 100.0 and frags[0].y == 700.0
    assert frags[2].y == 650.0
    # preserve_layout rebuilds text from sorted fragments
    assert res.page_texts[0] == "Hello World\nLower"


def test_reconstruct_paragraphs_end_to_end():
    lines = [b"(Alpha beta) Tj", b"(gamma delta.) Tj", b"(New para here.) Tj"]
    content = (
        b"BT /F1 12 Tf 100 700 Td " + lines[0] + b" 0 -14 Td " + lines[1]
        + b" 0 -60 Td " + lines[2] + b" ET"
    )
    pdf = build_pdf_with_content_stream(content)
    res = extract_pdf_bytes(
        pdf,
        ExtractionOptions(preserve_layout=True, reconstruct_paragraphs=True),
    )
    paras = res.page_fragments[0]
    assert [p.text for p in paras] == ["Alpha beta\ngamma delta.", "New para here."]


def test_actualtext_override_fragment():
    # /ActualText collapses the scope's Tj runs into one canonical fragment
    content = (
        b"/Span <</ActualText (fi)>> BDC "
        b"BT /F1 12 Tf 100 700 Td (f) Tj (i) Tj ET EMC"
    )
    pdf = build_pdf_with_content_stream(content)
    res = extract_pdf_bytes(pdf, ExtractionOptions(preserve_layout=True))
    frags = res.page_fragments[0]
    assert [f.text for f in frags] == ["fi"]
    assert frags[0].x == 100.0 and frags[0].y == 700.0


def test_mcid_tagging_on_fragments():
    content = b"/P <</MCID 7>> BDC BT /F1 12 Tf 100 700 Td (Tagged) Tj ET EMC"
    pdf = build_pdf_with_content_stream(content)
    res = extract_pdf_bytes(pdf, ExtractionOptions(preserve_layout=True))
    frag = res.page_fragments[0][0]
    assert frag.mcid == 7 and frag.struct_tag == "P"

"""Plain-text extraction API (kernel/plaintext.py).

Parity target: text/plaintext/{types,extractor}.rs — the reference's own
unit tests are mirrored, plus end-to-end runs over built PDFs pinning
the simplified interpreter's quirks (ignored TD/'/" operators, TJ kern
spaces, absolute-unit newline threshold)."""

from __future__ import annotations

from oxidizepdf_spark.corpus import build_pdf_with_content_stream, build_text_pdf
from oxidizepdf_spark.kernel.plaintext import (
    AUTO,
    NORMALIZE,
    PRESERVE_ALL,
    PlainTextConfig,
    PlainTextExtractor,
    PlainTextResult,
)


def test_config_defaults_and_presets():
    c = PlainTextConfig()
    assert c.space_threshold == 0.3
    assert c.tj_space_threshold == 0.2
    assert c.newline_threshold == 10.0
    assert not c.preserve_layout and c.line_break_mode == AUTO
    d = PlainTextConfig.dense()
    assert (d.space_threshold, d.tj_space_threshold, d.newline_threshold) == (
        0.1, 0.1, 8.0,
    )
    lo = PlainTextConfig.loose()
    assert (lo.space_threshold, lo.newline_threshold) == (0.4, 15.0)
    pl = PlainTextConfig.preserve_layout_config()
    assert pl.preserve_layout and pl.line_break_mode == PRESERVE_ALL


def test_result_counts():
    r = PlainTextResult.new("Hello\nWorld")
    assert r.line_count == 2 and r.char_count == 11
    assert not r.is_empty()
    e = PlainTextResult.empty()
    assert e.line_count == 0 and e.char_count == 0 and e.is_empty()


def test_normalize_line_breaks_hyphenated():
    ex = PlainTextExtractor()
    text = "This is a docu-\nment with hyphen-\nated words."
    assert (
        ex.normalize_line_breaks(text)
        == "This is a document with hyphenated words."
    )


def test_normalize_line_breaks_no_hyphen():
    ex = PlainTextExtractor()
    text = "This is a normal\ntext without\nhyphens."
    assert ex.normalize_line_breaks(text) == text


def test_auto_line_breaks_punctuation():
    ex = PlainTextExtractor()
    text = "First sentence.\nSecond sentence.\nThird sentence."
    assert ex.auto_line_breaks(text) == text


def test_auto_line_breaks_wrapped():
    ex = PlainTextExtractor()
    text = "This is a long line that\nwas wrapped in the PDF\nfor layout purposes"
    got = ex.auto_line_breaks(text)
    assert "long line that was" in got
    assert "wrapped in the PDF for" in got


def test_auto_line_breaks_empty_lines():
    ex = PlainTextExtractor()
    got = ex.auto_line_breaks("Paragraph one.\n\nParagraph two.\n\nParagraph three.")
    assert "\n\n" in got


def test_apply_mode_preserve_and_normalize():
    pres = PlainTextExtractor(
        PlainTextConfig(line_break_mode=PRESERVE_ALL)
    )
    assert pres.apply_line_break_mode("Line 1\nLine 2\nLine 3") == "Line 1\nLine 2\nLine 3"
    norm = PlainTextExtractor(PlainTextConfig(line_break_mode=NORMALIZE))
    assert norm.apply_line_break_mode("docu-\nment") == "document"
    auto = PlainTextExtractor(PlainTextConfig(line_break_mode=AUTO))
    assert "First sentence.\nSecond" in auto.apply_line_break_mode(
        "First sentence.\nSecond part"
    )


# ---------------------------------------------------------------------------
# end-to-end over built PDFs
# ---------------------------------------------------------------------------


def test_extract_simple_text():
    pdf = build_text_pdf("hello plain world")
    r = PlainTextExtractor().extract(pdf)
    assert r.text == "hello plain world"
    assert r.line_count == 1
    assert r.char_count == len("hello plain world")


def test_extract_newline_and_space_heuristics():
    # two Td-positioned shows: dy=20 > threshold 10 → newline;
    # then a same-line show with a wide dx → single space
    content = (
        b"BT /F1 12 Tf 72 700 Td (alpha) Tj ET "
        b"BT /F1 12 Tf 72 680 Td (beta) Tj ET "
        b"BT /F1 12 Tf 200 680 Td (gamma) Tj ET"
    )
    pdf = build_pdf_with_content_stream(content)
    r = PlainTextExtractor(
        PlainTextConfig(line_break_mode=PRESERVE_ALL)
    ).extract(pdf)
    assert r.text == "alpha\nbeta gamma"
    assert r.line_count == 2


def test_extract_tj_kern_space():
    # -300/1000 * 12 = 3.6 > 0.2*12 = 2.4 → implicit space; the small
    # kern (-100 → 1.2) must NOT add one
    content = b"BT /F1 12 Tf 72 700 Td [(Hello) -300 (World) -100 (Now)] TJ ET"
    pdf = build_pdf_with_content_stream(content)
    r = PlainTextExtractor(
        PlainTextConfig(line_break_mode=PRESERVE_ALL)
    ).extract(pdf)
    assert r.text == "Hello WorldNow"


def test_extract_ignores_td_and_quote_forms():
    # extractor.rs:332-334 quirk: TD and ' fall into the catch-all — TD
    # moves nothing and ' shows nothing in the plaintext path
    content = (
        b"BT /F1 12 Tf 72 700 Td (kept) Tj "
        b"10 -50 TD (ignored) ' ET"
    )
    pdf = build_pdf_with_content_stream(content)
    r = PlainTextExtractor(
        PlainTextConfig(line_break_mode=PRESERVE_ALL)
    ).extract(pdf)
    assert r.text == "kept"


def test_extract_lines_and_all():
    content = (
        b"BT /F1 12 Tf 72 700 Td (first line.) Tj ET "
        b"BT /F1 12 Tf 72 650 Td (second line.) Tj ET"
    )
    pdf = build_pdf_with_content_stream(content)
    ex = PlainTextExtractor()
    lines = ex.extract_lines(pdf)
    assert lines == ["first line.", "second line."]
    results = ex.extract_all(pdf)
    assert len(results) == 1 and results[0].text == "first line.\nsecond line."


def test_font_cache_persists_across_pages():
    ex = PlainTextExtractor()
    pdf = build_text_pdf("cache me")
    ex.extract(pdf)
    assert ex._font_cache  # fonts retained for subsequent pages

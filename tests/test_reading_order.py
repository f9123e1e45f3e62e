"""Reading-order strategy tests (A5, pipeline/reading_order.rs) + column
detection path."""

from __future__ import annotations

from oxidizepdf_spark.kernel.layout import LayoutProcessor, TextFragment
from oxidizepdf_spark.kernel.reading_order import (
    simple_reading_order,
    xycut_reading_order,
)
from oxidizepdf_spark.kernel.textstate import ExtractionOptions


def tf(text, x, y, w=30.0, h=12.0):
    return TextFragment(text, x, y, w, h, h)


def test_simple_reading_order_lines():
    frags = [
        tf("right", 200.0, 700.0),
        tf("left", 50.0, 700.0),
        tf("below", 50.0, 650.0),
    ]
    ordered = simple_reading_order(frags)
    assert [f.text for f in ordered] == ["left", "right", "below"]


def test_xycut_two_columns():
    """Two-column layout: left column read fully before right column —
    the case simple top-to-bottom ordering gets wrong."""
    frags = [
        tf("L1", 50.0, 700.0),
        tf("R1", 350.0, 700.0),
        tf("L2", 50.0, 650.0),
        tf("R2", 350.0, 650.0),
        tf("L3", 50.0, 600.0),
    ]
    ordered = xycut_reading_order(frags, min_gap=20.0)
    assert [f.text for f in ordered] == ["L1", "L2", "L3", "R1", "R2"]
    # simple order interleaves — documents why XYCut exists
    simple = simple_reading_order(frags)
    assert [f.text for f in simple] == ["L1", "R1", "L2", "R2", "L3"]


def test_xycut_header_above_columns():
    """Full-width header splits horizontally first, then columns."""
    frags = [
        tf("TITLE", 50.0, 780.0, w=330.0),
        tf("L1", 50.0, 700.0),
        tf("R1", 350.0, 700.0),
        tf("L2", 50.0, 650.0),
    ]
    ordered = xycut_reading_order(frags, min_gap=20.0)
    assert ordered[0].text == "TITLE"
    assert [f.text for f in ordered[1:]] == ["L1", "L2", "R1"]


def test_xycut_no_gap_falls_back_to_simple_leaf():
    frags = [tf("B", 50.0, 650.0), tf("A", 50.0, 700.0)]
    ordered = xycut_reading_order(frags, min_gap=20.0)
    # horizontal split triggers (gap 50-12=38 > 20) → A then B
    assert [f.text for f in ordered] == ["A", "B"]


def test_detect_columns_sorting():
    """A1's detect_columns option re-sorts a 2-column fragment set."""
    proc = LayoutProcessor(
        ExtractionOptions(detect_columns=True, column_threshold=50.0)
    )
    frags = [
        tf("R1", 400.0, 700.0),
        tf("L1", 50.0, 700.0),
        tf("R2", 400.0, 650.0),
        tf("L2", 50.0, 650.0),
    ]
    proc.sort_and_merge_fragments(frags)
    assert [f.text for f in frags] == ["L1", "L2", "R1", "R2"]


# --- end-to-end: reading_order wired through ExtractionOptions ------------
# (ported expectations: partition_reading_order_test.rs cycles 1.3-1.6)


def _two_column_pdf(per_col=3, lx=72, rx=400):
    from oxidizepdf_spark.corpus import build_pdf_with_content_stream

    parts = [b"BT /F1 12 Tf"]
    for i in range(1, per_col + 1):
        y = 720 - 20 * (i - 1)
        parts.append(b"1 0 0 1 %d %d Tm (L%d) Tj" % (lx, y, i))
        parts.append(b"1 0 0 1 %d %d Tm (R%d) Tj" % (rx, y, i))
    parts.append(b"ET")
    return build_pdf_with_content_stream(b" ".join(parts))


def test_extraction_option_unknown_strategy_rejected():
    import pytest

    with pytest.raises(ValueError):
        ExtractionOptions(reading_order="zigzag")


def test_e2e_emission_preserves_operator_order():
    """ReadingOrderStrategy::None analogue: emission order untouched
    (partition_reading_order_test.rs cycle 1.3)."""
    from oxidizepdf_spark.kernel.extract import extract_pdf_bytes

    res = extract_pdf_bytes(_two_column_pdf(), ExtractionOptions())
    assert res.page_texts[0] == "L1 R1\nL2 R2\nL3 R3"


def test_e2e_xycut_left_column_before_right():
    """XYCut reads the whole left column before the right one
    (partition_reading_order_test.rs cycle 1.4)."""
    from oxidizepdf_spark.kernel.extract import extract_pdf_bytes

    res = extract_pdf_bytes(
        _two_column_pdf(), ExtractionOptions(reading_order="xycut")
    )
    assert res.page_texts[0] == "L1\nL2\nL3\nR1\nR2\nR3"
    # spans collapse to one ordered text span in strategy mode
    assert res.spans == [("text", "L1\nL2\nL3\nR1\nR2\nR3", None)]


def test_e2e_simple_keeps_line_interleave():
    """Simple strategy orders by Y-chained lines then x — same-line pairs
    stay together (cycle 1.5 backwards-compat analogue)."""
    from oxidizepdf_spark.kernel.extract import extract_pdf_bytes

    res = extract_pdf_bytes(
        _two_column_pdf(), ExtractionOptions(reading_order="simple")
    )
    assert res.page_texts[0] == "L1 R1\nL2 R2\nL3 R3"


def test_e2e_xycut_three_columns():
    """Three columns read left→center→right
    (partition_reading_order_test.rs cycle 1.6)."""
    from oxidizepdf_spark.corpus import build_pdf_with_content_stream
    from oxidizepdf_spark.kernel.extract import extract_pdf_bytes

    parts = [b"BT /F1 12 Tf"]
    for i in (1, 2):
        y = 720 - 20 * (i - 1)
        parts.append(b"1 0 0 1 240 %d Tm (C%d) Tj" % (y, i))
        parts.append(b"1 0 0 1 440 %d Tm (R%d) Tj" % (y, i))
        parts.append(b"1 0 0 1 40 %d Tm (L%d) Tj" % (y, i))
    parts.append(b"ET")
    pdf = build_pdf_with_content_stream(b" ".join(parts))
    res = extract_pdf_bytes(pdf, ExtractionOptions(reading_order="xycut"))
    assert res.page_texts[0] == "L1\nL2\nC1\nC2\nR1\nR2"

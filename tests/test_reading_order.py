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

"""Bordered-table detection (text/table_detection.rs semantics) and the
vector-graphics pass (graphics/extraction.rs)."""

from __future__ import annotations

from oxidizepdf_spark.corpus import build_table_pdf
from oxidizepdf_spark.kernel.content import parse_content
from oxidizepdf_spark.kernel.extract import extract_pdf_bytes
from oxidizepdf_spark.kernel.graphics import extract_graphics
from oxidizepdf_spark.kernel.pages import flatten_page_tree, page_content
from oxidizepdf_spark.kernel.reader import PdfReader
from oxidizepdf_spark.kernel.tables import detect_page_tables, detect_tables
from oxidizepdf_spark.kernel.textstate import ExtractionOptions


def _detect(cells):
    pdf = build_table_pdf(cells)
    res = extract_pdf_bytes(pdf, ExtractionOptions(preserve_layout=True))
    r = PdfReader(pdf)
    content = page_content(r, flatten_page_tree(r)[0])
    return detect_page_tables(content, res.page_fragments[0])


def test_grid_table_roundtrip():
    cells = [["alpha", "beta", "gamma"], ["one", "two", "three"]]
    tables = _detect(cells)
    assert len(tables) == 1
    t = tables[0]
    assert (t.rows, t.columns) == (2, 3)
    got = [[t.get_cell(i, j).text for j in range(3)] for i in range(2)]
    assert got == cells


def test_graphics_pass_lines_and_transforms():
    # m/l + S in a translated CTM; a filled path must NOT contribute
    # (stroked_only); a diagonal is never counted toward table structure
    ops = parse_content(
        b"q 1 0 0 1 10 20 cm 0 0 m 100 0 l S Q "
        b"0 50 m 100 50 l f "
        b"0 0 m 100 100 l S "
        b"5 0 m 5 80 l S 95 0 m 95 80 l S"
    )
    g = extract_graphics(ops)
    assert g.horizontal_count == 1  # only the stroked one, translated
    h = g.horizontal_lines()[0]
    assert (h.x1, h.y1, h.x2, h.y2) == (10.0, 20.0, 110.0, 20.0)
    assert g.vertical_count == 2
    assert not g.has_table_structure()  # 1 H < 2


def test_rectangle_adds_edges_immediately():
    # extraction.rs:330 quirk: `re` contributes its 4 edges without any
    # paint operator
    g = extract_graphics(parse_content(b"10 10 200 100 re"))
    assert g.horizontal_count == 2 and g.vertical_count == 2
    assert g.has_table_structure()


def test_cluster_tolerance_merges_jittered_lines():
    # two horizontal borders drawn twice with 1pt jitter (within the 2pt
    # alignment tolerance) must cluster to single grid lines
    content = (
        b"72 700 m 552 700 l S 72 701 m 552 701 l S "
        b"72 540 m 552 540 l S 72 539 m 552 539 l S "
        b"72 700 m 72 540 l S 552 700 m 552 540 l S"
    )
    g = extract_graphics(parse_content(content))
    tables = detect_tables(g, [])
    assert len(tables) == 1
    assert (tables[0].rows, tables[0].columns) == (1, 1)
    # cluster means: (700+701)/2 and (540+539)/2
    assert tables[0].bbox == (72.0, 539.5, 480.0, 161.0)


def test_borderless_alignment_detection():
    """Alignment-only (no lines) grids are recovered from repeated
    left-edge clusters; prose and title+paragraph layouts (one x cluster)
    must never classify as tables."""
    from oxidizepdf_spark.corpus import (
        build_borderless_table_pdf,
        build_sectioned_pdf,
        build_text_pdf,
    )
    from oxidizepdf_spark.kernel.tables import detect_borderless_tables

    opts = ExtractionOptions(preserve_layout=True)
    cells = [["alpha", "beta", "gamma"], ["one", "two", "three"],
             ["x1", "x2", "x3"], ["p", "q", "r"]]
    res = extract_pdf_bytes(build_borderless_table_pdf(cells), opts)
    tables = detect_borderless_tables(res.page_fragments[0])
    assert len(tables) == 1 and (tables[0].rows, tables[0].columns) == (4, 3)
    got = [[tables[0].get_cell(i, j).text for j in range(3)] for i in range(4)]
    assert got == cells
    # negatives: wrapped prose, and a title+paragraph section layout
    prose = extract_pdf_bytes(
        build_text_pdf("\n".join(f"w{i} more text here" for i in range(10))),
        opts,
    )
    assert detect_borderless_tables(prose.page_fragments[0]) == []
    sec = extract_pdf_bytes(
        build_sectioned_pdf(
            [("SECTION 0", [[f"w{i}" for i in range(20)]])]
        ),
        opts,
    )
    assert detect_borderless_tables(sec.page_fragments[0]) == []


def test_ocr_spi_scanned_page():
    """OCR SPI (text/ocr/ shape): fires only on image-only pages, splices
    recognized text after the image span, tolerates provider failure, and
    never touches pages that already have text."""
    from oxidizepdf_spark.corpus import build_scanned_pdf, build_text_pdf

    pdf = build_scanned_pdf(b"scanned words here")
    assert extract_pdf_bytes(pdf).spans == [("image", "", "Im1")]
    res = extract_pdf_bytes(
        pdf, ExtractionOptions(ocr_provider=lambda b: b.decode("utf-8"))
    )
    assert res.spans == [
        ("image", "", "Im1"), ("text", "scanned words here", None)
    ]
    assert res.page_texts == ["scanned words here"]
    # provider exception degrades to no-OCR, never a page error
    res2 = extract_pdf_bytes(pdf, ExtractionOptions(ocr_provider=lambda b: 1 / 0))
    assert res2.error is None and res2.spans == [("image", "", "Im1")]
    # pages with real text are untouched
    res3 = extract_pdf_bytes(
        build_text_pdf("real text"),
        ExtractionOptions(ocr_provider=lambda b: "WRONG"),
    )
    assert res3.spans == [("text", "real text", None)]


def test_too_few_lines_or_area_rejected():
    g = extract_graphics(parse_content(b"72 700 m 552 700 l S 72 700 m 72 500 l S"))
    assert detect_tables(g, []) == []
    # a full grid but tiny (< 1000 sq pt) is rejected
    tiny = (
        b"0 0 m 20 0 l S 0 20 m 20 20 l S "
        b"0 0 m 0 20 l S 20 0 m 20 20 l S"
    )
    assert detect_tables(extract_graphics(parse_content(tiny)), []) == []


def test_key_value_detection_strategies():
    """text/structured/keyvalue.rs: three independent strategies, applied
    in order, no cross-strategy dedup (a 'K:\\tV' fragment legitimately
    matches both colon and tabular, exactly like the reference)."""
    from oxidizepdf_spark.kernel.structured import detect_key_value_pairs

    class F:
        def __init__(self, text, x=0.0, y=0.0, width=10.0):
            self.text, self.x, self.y, self.width = text, x, y, width

    kvs = detect_key_value_pairs(
        [
            F("Name: Alice", y=100),
            F("not a pair", y=80),
            F("Total\t42", y=60),
            F("left", x=0, y=40, width=30),
            F("right", x=100, y=40),
            F("a", x=0, y=20, width=30),
            F("b", x=35, y=20),  # gap 5 < 20 → NOT spatial
        ]
    )
    got = [(k.pattern, k.key, k.value) for k in kvs]
    assert got == [
        ("colon", "Name", "Alice"),
        ("spatial", "left", "right"),
        ("tabular", "Total", "42"),
    ]


def test_detect_column_layout_gap_analysis():
    """structured/layout.rs detect_column_layout end-to-end: a 2-column
    page splits at the inter-column gap midpoint, each column reads top
    to bottom, the gutter exceeding min_column_gap is the trigger, and
    a single-column page returns one section."""
    from oxidizepdf_spark.corpus import build_pdf_with_content_stream
    from oxidizepdf_spark.kernel.extract import extract_pdf_bytes
    from oxidizepdf_spark.kernel.structured import detect_column_layout
    from oxidizepdf_spark.kernel.textstate import ExtractionOptions

    parts = [b"BT /F1 12 Tf"]
    for i, (x, word) in enumerate(
        [(72, b"left1"), (72, b"left2"), (300, b"right1"), (300, b"right2")]
    ):
        y = 700 - 20 * (i % 2)
        parts.append(b"1 0 0 1 %d %d Tm (%s) Tj" % (x, y, word))
    parts.append(b"ET")
    pdf = build_pdf_with_content_stream(b" ".join(parts))
    res = extract_pdf_bytes(pdf, ExtractionOptions(preserve_layout=True))
    cols = detect_column_layout(res.page_fragments[0])
    assert len(cols) == 2
    assert cols[0].column_index == 0 and cols[0].text == "left1 left2"
    assert cols[1].column_index == 1 and cols[1].text == "right1 right2"
    # boundary sits in the gutter: left bbox ends before it, right starts after
    lx, _, lw, _ = cols[0].bbox
    rx = cols[1].bbox[0]
    assert lx + lw < rx
    # below-threshold gap -> one section, reading order preserved
    one = detect_column_layout(res.page_fragments[0], min_column_gap=500.0)
    assert len(one) == 1
    assert one[0].text == "left1 right1 left2 right2"  # y desc, x asc


def test_detect_structured_data_orchestrator():
    """structured/detector.rs detect(): one call returns all three
    pattern families; flags gate each; empty input is infallible."""
    from oxidizepdf_spark.corpus import build_pdf_with_content_stream
    from oxidizepdf_spark.kernel.extract import extract_pdf_bytes
    from oxidizepdf_spark.kernel.structured import detect_structured_data
    from oxidizepdf_spark.kernel.textstate import ExtractionOptions

    ops = (
        b"BT /F1 12 Tf "
        b"1 0 0 1 72 700 Tm (name: alice) Tj "
        b"1 0 0 1 72 660 Tm (leftcol) Tj "
        b"1 0 0 1 400 660 Tm (rightcol) Tj ET"
    )
    pdf = build_pdf_with_content_stream(ops)
    res = extract_pdf_bytes(pdf, ExtractionOptions(preserve_layout=True))
    frags = res.page_fragments[0]
    r = detect_structured_data(frags)
    assert {p.key: p.value for p in r["key_value_pairs"]}["name"] == "alice"
    assert len(r["column_sections"]) == 2
    off = detect_structured_data(
        frags, detect_key_value=False, detect_multi_column=False,
        detect_tables=False,
    )
    assert off == {
        "tables": [], "key_value_pairs": [], "column_sections": [],
    }
    assert detect_structured_data([]) == off

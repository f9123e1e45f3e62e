"""Element-typed partitioning + hybrid chunking (pipeline/element.rs +
partition.rs + hybrid_chunking.rs semantics over the engine's layout)."""

from __future__ import annotations

import math

from oxidizepdf_spark.corpus import build_sectioned_pdf
from oxidizepdf_spark.kernel.elements import (
    Element,
    body_font_size,
    classify_pages,
    hybrid_chunks,
)
from oxidizepdf_spark.kernel.extract import extract_pdf_bytes
from oxidizepdf_spark.kernel.textstate import ExtractionOptions


def _extract_chunks(nwords: int, max_tokens: int = 64):
    words = [f"w{i}" for i in range(nwords)]
    n_sec = max(1, math.ceil(len(words) / 40))
    sections = []
    for i in range(n_sec):
        sw = words[i * 40 : (i + 1) * 40]
        paras = [p for p in (sw[:20], sw[20:]) if p]
        sections.append((f"SECTION {i}", paras))
    res = extract_pdf_bytes(
        build_sectioned_pdf(sections),
        ExtractionOptions(preserve_layout=True, reconstruct_paragraphs=True),
    )
    assert res.error is None, res.error
    elements = classify_pages(res.page_fragments)
    return elements, hybrid_chunks(elements, max_tokens)


def test_body_font_size_tiebreak_smaller():
    # partition.rs:457 — ties go to the smaller size (body < headings)
    assert body_font_size([12.0, 18.0]) == 12.0
    assert body_font_size([18.0, 18.0, 12.0]) == 18.0
    assert body_font_size([]) == 0.0


def test_sectioned_layout_classifies_titles_and_merges_paragraphs():
    els, chunks = _extract_chunks(95)
    assert [e.kind for e in els] == [
        "title", "paragraph", "paragraph",
        "title", "paragraph", "paragraph",
        "title", "paragraph",
    ]
    # titles are structural boundaries; the two 20-word paragraphs of each
    # section merge into one 40-token body chunk under max_tokens=64
    assert [(c.kind, c.n_tokens) for c in chunks] == [
        ("title", 2), ("body", 40),
        ("title", 2), ("body", 40),
        ("title", 2), ("body", 15),
    ]
    # heading lineage: every chunk carries its section title
    assert [c.heading for c in chunks] == [
        "SECTION 0", "SECTION 0", "SECTION 1",
        "SECTION 1", "SECTION 2", "SECTION 2",
    ]
    assert chunks[3].text == " ".join(f"w{i}" for i in range(40, 80))


def test_single_size_document_has_no_titles():
    # a title-only document has one font size → the classifier's body font
    # IS that size, so nothing clears the 1.3x ratio (relative classifier)
    els, chunks = _extract_chunks(0)
    assert [(c.kind, c.heading, c.text, c.n_tokens) for c in chunks] == [
        ("body", None, "SECTION 0", 2)
    ]


def test_oversized_paragraph_splits_by_word_windows():
    els = [Element("paragraph", " ".join(f"x{i}" for i in range(150)), "H", 12.0, 0)]
    chunks = hybrid_chunks(els, max_tokens=64)
    assert [c.n_tokens for c in chunks] == [64, 64, 22]
    assert all(c.heading == "H" for c in chunks)
    joined = " ".join(c.text for c in chunks)
    assert joined == " ".join(f"x{i}" for i in range(150))


def test_adjacent_paragraphs_merge_until_budget():
    els = [
        Element("paragraph", " ".join(["a"] * 30), None, 12.0, 0),
        Element("paragraph", " ".join(["b"] * 30), None, 12.0, 0),
        Element("paragraph", " ".join(["c"] * 30), None, 12.0, 0),
    ]
    chunks = hybrid_chunks(els, max_tokens=64)
    # 30+30 fits, +30 would overflow → [60, 30]
    assert [c.n_tokens for c in chunks] == [60, 30]


def test_header_footer_zones_and_list_items():
    """partition.rs parity: top/bottom-5%-zone fragments classify as
    header/footer (length-capped), bullet/numbered prefixes as list_item;
    the chunker keeps furniture un-merged and merges inline content."""
    from oxidizepdf_spark.kernel.elements import Element, is_list_item

    assert is_list_item("- bullet") and is_list_item("• dot")
    assert is_list_item("1. one") and is_list_item("12) twelve")
    assert is_list_item("a) alpha") and not is_list_item("A) upper")
    assert not is_list_item("1.nospace") and not is_list_item("plain text")

    class F:
        def __init__(self, text, y, size=12.0):
            self.text, self.y, self.font_size = text, y, size
            self.height = size

    from oxidizepdf_spark.kernel.elements import classify_elements

    els = classify_elements(
        [
            F("running head", 770),
            F("SECTION", 700, 18.0),
            F("- item one", 640),
            F("body paragraph words", 600),
            F("x" * 150, 780),  # too long for the header zone → body rules
            F("page 9", 10),
        ]
    )
    kinds = [(e.kind, e.text[:12]) for e in els]
    assert kinds == [
        ("header", "running head"),
        ("title", "SECTION"),
        ("list_item", "- item one"),
        ("paragraph", "body paragra"),
        ("paragraph", "xxxxxxxxxxxx"),
        ("footer", "page 9"),
    ]
    from oxidizepdf_spark.kernel.elements import hybrid_chunks

    chunks = hybrid_chunks(els, max_tokens=64)
    # header own chunk; title own; list+para+long merge (inline); footer own
    assert [c.kind for c in chunks] == ["header", "title", "body", "footer"]

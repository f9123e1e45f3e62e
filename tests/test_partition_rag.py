"""Rich partitioner + element graph + chunkers + chunk metadata
(kernel/partition.py, kernel/rag_graph.py).

Parity targets: pipeline/{partition,graph,hybrid_chunking,
semantic_chunking,chunk_metadata,rag,profile}.rs and
text/structured/table.rs. Reference unit tests are mirrored where they
exist (chunk_metadata.rs:406-694); quirk behaviors are pinned
explicitly.
"""

from __future__ import annotations

import json

import pytest

from oxidizepdf_spark.kernel.graphics import ExtractedGraphics, VectorLine
from oxidizepdf_spark.kernel.layout import TextFragment
from oxidizepdf_spark.kernel.partition import (
    ElementBBox,
    ElementMetadata,
    PartitionConfig,
    Partitioner,
    RichElement,
    assign_heading_paths,
    compute_kv_confidence,
    compute_title_confidence,
    compute_zone_confidence,
    detect_spatial_tables,
    is_prose_prefix,
    numeric_prefix_title,
    partition_document,
    region_looks_like_list,
    segment_into_table_regions,
    struct_tag_is_body,
)
from oxidizepdf_spark.kernel.rag_graph import (
    Aggregates,
    ChunkMetadata,
    DocumentSource,
    ElementGraph,
    HybridChunkConfig,
    HybridChunker,
    MERGE_SAME_TYPE_ONLY,
    RagChunk,
    SemanticChunkConfig,
    SemanticChunker,
    content_chunk_id,
    content_type_flags,
    detect_language_full,
    extraction_profile,
    link_chunks,
    rag_chunks_from_elements,
    sentence_count,
    split_by_sentences,
    split_into_sentences,
    split_sentences_semantic,
    word_count,
)


def frag(text, x=100.0, y=400.0, w=50.0, h=12.0, size=12.0, font=None,
         bold=False, italic=False, tag=None):
    f = TextFragment(text, x, y, w, h, size, font, bold, italic)
    if tag is not None:
        f.struct_tag = tag
    return f


def el(kind, text="", page=0, bbox=None, font=None, size=None, bold=False,
       italic=False, conf=1.0, parent=None, path=None, rows=None,
       key=None, value=None):
    return RichElement(
        kind,
        text,
        ElementMetadata(
            page=page,
            bbox=bbox or ElementBBox(),
            confidence=conf,
            font_name=font,
            font_size=size,
            is_bold=bold,
            is_italic=italic,
            parent_heading=parent,
            heading_path=list(path) if path else [],
        ),
        rows=rows,
        key=key,
        value=value,
    )


# ---------------------------------------------------------------------------
# confidence formulas (partition.rs:914-939)
# ---------------------------------------------------------------------------


def test_confidence_formulas():
    assert compute_title_confidence(1.3, 1.3) == 0.5
    assert compute_title_confidence(2.6, 1.3) == 1.0
    assert compute_title_confidence(1.0, 0.0) == 1.0
    assert abs(compute_title_confidence(1.69, 1.3) - 0.65) < 1e-9
    assert compute_zone_confidence(0.0, 40.0) == 0.5
    assert compute_zone_confidence(40.0, 40.0) == 1.0
    assert compute_zone_confidence(1.0, 0.0) == 0.5
    # key bytes/40 length penalty + multi-word penalty, floor 0.5
    assert compute_kv_confidence("Name") == 1.0 - 4 / 40
    assert compute_kv_confidence("a b c") == pytest.approx(1.0 - 5 / 40 - 0.1)
    assert compute_kv_confidence("x" * 40) == 0.5


def test_prose_prefix():
    assert is_prose_prefix("The result")
    assert is_prose_prefix("as noted")
    # later-word indicator only counts with > 2 words
    assert not is_prose_prefix("result is")
    assert is_prose_prefix("final result is bad")
    assert not is_prose_prefix("Invoice Number")


def test_numeric_prefix_title_guards():
    assert numeric_prefix_title(frag("3.1 Methods"))
    assert numeric_prefix_title(frag("A2.a Risk Management"))
    assert numeric_prefix_title(frag("Section 4: Scope"))
    assert numeric_prefix_title(frag("IV. Findings"))
    # bare-integer marker yields to is_list_item
    assert not numeric_prefix_title(frag("1. Take action"))
    # lowercase continuation = measurement/prose
    assert not numeric_prefix_title(frag("1.2 million users"))
    # comma guard
    assert not numeric_prefix_title(frag("3.1 Alpha, Beta"))
    # word-count guard (> 14 words)
    assert not numeric_prefix_title(
        frag("3.1 " + " ".join(["Word"] * 15))
    )


def test_struct_tag_is_body():
    assert struct_tag_is_body("P") and struct_tag_is_body("H2")
    assert not struct_tag_is_body(None)
    assert not struct_tag_is_body("Artifact")


# ---------------------------------------------------------------------------
# partitioner classification (partition.rs:122-578)
# ---------------------------------------------------------------------------


def _partition(frags, **cfg):
    cfg.setdefault("reading_order", "none")
    return Partitioner(PartitionConfig(**cfg)).partition_fragments(
        frags, page=0, page_height=800.0
    )


def test_struct_tags_claim_first():
    els = _partition(
        [
            frag("Intro", tag="H1", size=12.0),
            frag("- item", tag="LBody"),
            frag("body text here", tag="P"),
        ],
        detect_tables=False,
    )
    assert [e.kind for e in els] == ["title", "list_item", "paragraph"]
    assert els[0].metadata.confidence == 1.0
    assert els[1].metadata.confidence == 1.0


def test_header_footer_zones_and_confidence():
    # page_height 800, header zone 5% → threshold 760, footer 40
    els = _partition(
        [
            frag("Running header", y=780.0),
            frag("Page 1", y=10.0, h=12.0),
            frag("body " * 30, y=780.0),  # > 100 chars: stays body
            frag("tagged body", y=780.0, tag="P"),  # body tag exempt
            frag("middle", y=400.0),
        ],
        detect_tables=False,
    )
    kinds = [e.kind for e in els]
    assert kinds.count("header") == 1
    assert kinds.count("footer") == 1
    header = next(e for e in els if e.kind == "header")
    # distance 20 / zone 40 = 0.5
    assert header.metadata.confidence == 0.5
    footer = next(e for e in els if e.kind == "footer")
    # footer: distance = 40 - (10 + 12) = 18 → 18/40 < .5 → clamp .5
    assert footer.metadata.confidence == 0.5


def test_key_value_detection():
    els = _partition(
        [
            frag("Invoice Number: INV-42"),
            frag("The result: something bad"),  # prose prefix
            frag("A" * 45 + ": v"),  # key too long
        ],
        detect_tables=False,
        detect_headers_footers=False,
    )
    assert els[0].kind == "key_value"
    assert els[0].key == "Invoice Number"
    assert els[0].value == "INV-42"
    assert els[0].text == "INV-42"  # element.rs: KV text() is the value
    assert els[0].display_text() == "Invoice Number: INV-42"
    assert els[1].kind == "paragraph"
    assert els[2].kind == "paragraph"


def test_title_three_signals():
    els = _partition(
        [
            frag("plain body text here today", size=10.0),
            frag("plain body text two", size=10.0),
            frag("Big Heading", size=20.0),  # ratio 2.0
            frag("Bold Heading", size=10.0, bold=True),  # bold-short 0.7
            frag("Bold emphasis", size=10.0, bold=True, tag="P"),  # suppressed
            frag("3.1 Methods", size=10.0),  # numeric prefix 0.8
            frag("A sentence that is bold.", size=10.0, bold=True),  # terminator
        ],
        detect_tables=False,
        detect_headers_footers=False,
    )
    by_text = {e.display_text(): e for e in els}
    assert by_text["Big Heading"].kind == "title"
    # ratio 20/10 = 2.0 vs min 1.3 → .5 + .5*(.7/1.3) ≈ .769
    assert by_text["Big Heading"].metadata.confidence == pytest.approx(
        0.5 + 0.5 * 0.7 / 1.3
    )
    assert by_text["Bold Heading"].kind == "title"
    assert by_text["Bold Heading"].metadata.confidence == 0.7
    assert by_text["Bold emphasis"].kind == "paragraph"
    assert by_text["3.1 Methods"].kind == "title"
    assert by_text["3.1 Methods"].metadata.confidence == 0.8
    assert by_text["A sentence that is bold."].kind == "paragraph"


def test_body_font_mode_quantized_tie_smaller():
    # 10.1 and 10.2 land in the same 0.5pt bucket (both round to 20/2);
    # two 10.x-bucket vs two 14.0 → tie broken toward the smaller
    els = _partition(
        [
            frag("one two three", size=10.1),
            frag("four five six", size=10.2),
            frag("seven eight", size=14.0),
            frag("nine ten", size=14.0),
        ],
        detect_tables=False,
        detect_headers_footers=False,
    )
    # body = 10.0 → threshold 13.0 → the 14.0 fragments are titles
    kinds = [e.kind for e in els]
    assert kinds == ["paragraph", "paragraph", "title", "title"]


def test_list_items():
    els = _partition(
        [frag("- bullet point"), frag("2) numbered"), frag("plain text")],
        detect_tables=False,
        detect_headers_footers=False,
    )
    assert [e.kind for e in els] == ["list_item", "list_item", "paragraph"]


# ---------------------------------------------------------------------------
# spatial table detection (structured/table.rs + partition.rs:369-436)
# ---------------------------------------------------------------------------


def _grid_frags(rows=3, cols=3, x0=100.0, y0=500.0, dx=80.0, dy=20.0):
    out = []
    for r in range(rows):
        for c in range(cols):
            out.append(
                frag(f"r{r}c{c}", x=x0 + c * dx, y=y0 - r * dy, w=40.0, h=10.0)
            )
    return out


def test_spatial_table_detection_grid():
    tables = detect_spatial_tables(_grid_frags())
    assert len(tables) == 1
    t = tables[0]
    assert t.rows == [
        ["r0c0", "r0c1", "r0c2"],
        ["r1c0", "r1c1", "r1c2"],
        ["r2c0", "r2c1", "r2c2"],
    ]
    # fully populated 3x3: 1.0 + min(6/10, .2) capped at 1.0
    assert t.confidence == 1.0


def test_spatial_confidence_population_ratio():
    frags = _grid_frags(2, 2)
    frags = frags[:3]  # drop one cell → 3/4 populated... but the
    # dropped fragment also shrinks clusters; rebuild with an empty cell
    frags = [
        frag("a", x=100.0, y=500.0),
        frag("b", x=200.0, y=500.0),
        frag("c", x=100.0, y=480.0),
        # (200, 480) empty — but 4 fragments min for the region pass;
        # detect_spatial_tables itself has no 4-fragment floor
    ]
    t = detect_spatial_tables(frags)[0]
    assert t.confidence == pytest.approx(3 / 4 + min(4 / 10, 0.2))


def test_region_segmentation_and_list_filter():
    # two clusters separated by a big Y gap; only >=4-fragment regions
    frags = _grid_frags(2, 3, y0=700.0) + _grid_frags(2, 3, y0=300.0)
    regions = segment_into_table_regions(frags, 2.0)
    assert len(regions) == 2
    assert all(len(r) == 6 for r in regions)
    # a 2-column layout with tiny left cells = list, not table
    lst = [
        frag("1.", x=100.0, y=500.0),
        frag("first item text", x=140.0, y=500.0),
        frag("2.", x=100.0, y=480.0),
        frag("second item text", x=140.0, y=480.0),
    ]
    assert region_looks_like_list(lst)
    assert not region_looks_like_list(_grid_frags(2, 3))


def test_partition_claims_table_fragments():
    frags = _grid_frags() + [frag("Conclusion paragraph", y=100.0)]
    els = _partition(frags, detect_headers_footers=False)
    kinds = [e.kind for e in els]
    assert kinds.count("table") == 1
    # the 9 grid fragments all claimed; only the standalone paragraph left
    assert kinds.count("paragraph") == 1
    table = next(e for e in els if e.kind == "table")
    assert len(table.rows) == 3 and len(table.rows[0]) == 3
    assert table.text == ""  # element.rs: tables have no raw text
    assert "r0c0 | r0c1 | r0c2" in table.display_text()


def test_min_table_confidence_filters():
    # sparse grid: 4 frags over a 3x3 lattice → low population
    frags = [
        frag("a", x=100.0, y=500.0),
        frag("b", x=260.0, y=500.0),
        frag("c", x=180.0, y=460.0),
        frag("d", x=100.0, y=420.0),
    ]
    els = _partition(
        frags, detect_headers_footers=False, min_table_confidence=0.99
    )
    assert all(e.kind != "table" for e in els)


def test_ruling_tables_claim_before_spatial():
    g = ExtractedGraphics()
    # 3 H + 3 V lines → 2x2 grid spanning x[100,300] y[400,500]
    for y in (400.0, 450.0, 500.0):
        g.add_line(VectorLine(100.0, y, 300.0, y))
    for x in (100.0, 200.0, 300.0):
        g.add_line(VectorLine(x, 400.0, x, 500.0))
    frags = [
        frag("c00", x=120.0, y=470.0, w=40.0, h=10.0),
        frag("c01", x=220.0, y=470.0, w=40.0, h=10.0),
        frag("c10", x=120.0, y=420.0, w=40.0, h=10.0),
        frag("c11", x=220.0, y=420.0, w=40.0, h=10.0),
    ]
    els = Partitioner(
        PartitionConfig(reading_order="none", detect_headers_footers=False)
    ).partition_fragments(frags, page=0, page_height=800.0, graphics=g)
    tables = [e for e in els if e.kind == "table"]
    assert len(tables) == 1
    assert tables[0].rows == [["c00", "c01"], ["c10", "c11"]]
    assert all(e.kind == "table" for e in els)  # all fragments claimed


# ---------------------------------------------------------------------------
# heading paths (partition.rs:587-639)
# ---------------------------------------------------------------------------


def test_assign_heading_paths_levels_and_stack():
    els = [
        el("title", "Chapter", size=20.0),
        el("paragraph", "intro"),
        el("title", "Section A", size=16.0),
        el("paragraph", "a body"),
        el("title", "Section B", size=16.0),  # pops Section A
        el("paragraph", "b body"),
        el("title", "Chapter 2", size=20.0),  # pops everything
        el("paragraph", "c body"),
    ]
    assign_heading_paths(els)
    assert els[0].metadata.heading_path == ["Chapter"]
    assert els[0].metadata.parent_heading == "Chapter"  # own text
    assert els[1].metadata.heading_path == ["Chapter"]
    assert els[3].metadata.heading_path == ["Chapter", "Section A"]
    assert els[3].metadata.parent_heading == "Section A"
    assert els[5].metadata.heading_path == ["Chapter", "Section B"]
    assert els[7].metadata.heading_path == ["Chapter 2"]


def test_heading_paths_size_bucket_merge_and_unknown():
    els = [
        el("title", "Big", size=20.0),
        el("title", "Near Big", size=20.5),  # within 5% → same level, pops
        el("paragraph", "p1"),
        el("title", "Unsized"),  # no size → deepest + 1
        el("paragraph", "p2"),
    ]
    assign_heading_paths(els)
    assert els[2].metadata.heading_path == ["Near Big"]
    assert els[4].metadata.heading_path == ["Near Big", "Unsized"]


def test_elements_before_any_title_have_no_heading():
    els = [el("paragraph", "preamble"), el("title", "T", size=20.0)]
    assign_heading_paths(els)
    assert els[0].metadata.parent_heading is None
    assert els[0].metadata.heading_path == []


# ---------------------------------------------------------------------------
# ElementGraph (graph.rs)
# ---------------------------------------------------------------------------


def _doc_elements():
    els = [
        el("paragraph", "preamble"),
        el("title", "Intro", size=20.0),
        el("paragraph", "i1"),
        el("paragraph", "i2"),
        el("title", "Methods", size=20.0),
        el("paragraph", "m1"),
    ]
    return assign_heading_paths(els)


def test_graph_parent_child_next_prev():
    els = _doc_elements()
    g = ElementGraph.build(els)
    assert len(g) == 6 and not g.is_empty()
    assert g.parent_of(0) is None  # preamble: no heading
    assert g.parent_of(1) is None  # titles are always roots
    assert g.parent_of(2) == 1 and g.parent_of(3) == 1
    assert g.parent_of(5) == 4
    assert g.children_of(1) == [2, 3]
    assert g.elements_in_section(4) == [5]
    assert g.top_level_sections() == [1, 4]
    assert g.next_of(0) == 1 and g.next_of(5) is None
    assert g.prev_of(0) is None and g.prev_of(5) == 4


def test_graph_forward_reference_has_no_parent():
    # an element pointing at a title that only appears LATER stays root
    els = [
        el("paragraph", "early", parent="Later"),
        el("title", "Later", size=20.0),
        el("paragraph", "after", parent="Later"),
    ]
    g = ElementGraph.build(els)
    assert g.parent_of(0) is None
    assert g.parent_of(2) == 1


def test_graph_most_recent_title_wins():
    els = [
        el("title", "Dup", size=20.0),
        el("title", "Dup", size=20.0),
        el("paragraph", "child", parent="Dup"),
    ]
    g = ElementGraph.build(els)
    assert g.parent_of(2) == 1
    assert g.children_of(0) == [] and g.children_of(1) == [2]


def test_graph_empty():
    g = ElementGraph.build([])
    assert g.is_empty() and g.top_level_sections() == []


# ---------------------------------------------------------------------------
# sentence splitters
# ---------------------------------------------------------------------------


def test_split_into_sentences_space_gated():
    # hybrid splitter: '.' splits only when followed by a space
    assert split_into_sentences("A. B. v1.2 end") == ["A.", "B.", "v1.2 end"]
    assert split_into_sentences("line one\nline two") == ["line one", "line two"]
    assert split_into_sentences("") == []


def test_split_sentences_semantic_leftover_appends():
    # semantic splitter: every terminator splits; leftover appends to last
    assert split_sentences_semantic("One. Two! tail") == ["One.", "Two! tail"]
    assert split_sentences_semantic("no terminator") == ["no terminator"]


def test_split_by_sentences_packing():
    text = "one two. three four. five six."
    assert split_by_sentences(text, 5) == ["one two. three four.", "five six."]
    # an over-long single sentence is emitted whole
    assert split_by_sentences("a b c d e f", 3) == ["a b c d e f"]


# ---------------------------------------------------------------------------
# HybridChunker (hybrid_chunking.rs)
# ---------------------------------------------------------------------------


def test_hybrid_merges_inline_flushes_on_title():
    els = assign_heading_paths(
        [
            el("title", "Intro", size=20.0),
            el("paragraph", "one two three"),
            el("list_item", "- four five"),
            el("title", "Next", size=20.0),
            el("paragraph", "six"),
        ]
    )
    chunks = HybridChunker(HybridChunkConfig(max_tokens=50)).chunk(els)
    texts = [c.text() for c in chunks]
    assert texts == [
        "Intro",
        "one two three\n- four five",
        "Next",
        "six",
    ]
    # heading context propagates from parent_heading
    assert chunks[1].heading_context == "Intro"
    assert chunks[1].full_text() == "Intro\n\none two three\n- four five"
    assert chunks[3].heading_context == "Next"


def test_hybrid_same_type_only_policy():
    els = [
        el("paragraph", "p one"),
        el("list_item", "- a"),
        el("list_item", "- b"),
    ]
    chunks = HybridChunker(
        HybridChunkConfig(max_tokens=50, merge_policy=MERGE_SAME_TYPE_ONLY)
    ).chunk(els)
    assert [c.text() for c in chunks] == ["p one", "- a\n- b"]


def test_hybrid_oversized_paragraph_splits_by_sentences():
    big = "alpha beta. gamma delta. epsilon zeta."
    els = [el("paragraph", big, parent="H")]
    # sentence packing counts +1 token per joining space: 2+1+2 = 5
    chunks = HybridChunker(HybridChunkConfig(max_tokens=5)).chunk(els)
    assert [c.text() for c in chunks] == [
        "alpha beta. gamma delta.",
        "epsilon zeta.",
    ]
    assert all(c.heading_context == "H" for c in chunks)
    assert all(not c.is_oversized() for c in chunks)
    # split fragments keep provenance but reset style metadata
    assert chunks[0].elements[0].metadata.parent_heading == "H"


def test_hybrid_oversized_table_atomic():
    rows = [[f"cell{i}", f"val{i}"] for i in range(10)]
    els = [el("table", rows=rows)]
    chunks = HybridChunker(HybridChunkConfig(max_tokens=4)).chunk(els)
    assert len(chunks) == 1
    assert chunks[0].is_oversized()
    assert chunks[0].elements[0].kind == "table"


def test_hybrid_chunk_with_graph_packs_sections():
    els = assign_heading_paths(
        [
            el("paragraph", "preamble text"),
            el("title", "Small", size=20.0),
            el("paragraph", "fits fine"),
            el("title", "Large", size=20.0),
            el("paragraph", " ".join(f"w{i}" for i in range(30))),
            el("paragraph", " ".join(f"v{i}" for i in range(30))),
        ]
    )
    g = ElementGraph.build(els)
    chunks = HybridChunker(HybridChunkConfig(max_tokens=40)).chunk_with_graph(els, g)
    assert chunks[0].text() == "preamble text"
    assert chunks[1].text() == "Small\nfits fine"
    assert chunks[1].heading_context == "Small"
    # the Large section exceeds 40 tokens → delegated, heading re-stamped
    assert len(chunks) > 3
    assert all(c.heading_context == "Large" for c in chunks[2:])


# ---------------------------------------------------------------------------
# SemanticChunker (semantic_chunking.rs)
# ---------------------------------------------------------------------------


def test_semantic_respects_boundaries_with_overlap():
    els = [
        el("paragraph", " ".join(f"a{i}" for i in range(8))),  # 8 tokens
        el("paragraph", " ".join(f"b{i}" for i in range(8))),
        el("paragraph", " ".join(f"c{i}" for i in range(8))),
    ]
    chunks = SemanticChunker(
        SemanticChunkConfig(max_tokens=16, overlap_tokens=8)
    ).chunk(els)
    # a+b fill chunk 0; flush carries b as overlap; quirk: the counter is
    # assigned to c's tokens, so chunk 1 = [b, c]
    assert len(chunks) == 2
    assert [e.text.split()[0] for e in chunks[0].elements] == ["a0", "b0"]
    assert [e.text.split()[0] for e in chunks[1].elements] == ["b0", "c0"]


def test_semantic_no_overlap():
    els = [
        el("paragraph", " ".join(f"a{i}" for i in range(8))),
        el("paragraph", " ".join(f"b{i}" for i in range(8))),
        el("paragraph", " ".join(f"c{i}" for i in range(8))),
    ]
    chunks = SemanticChunker(
        SemanticChunkConfig(max_tokens=16, overlap_tokens=0)
    ).chunk(els)
    assert len(chunks) == 2
    assert len(chunks[0].elements) == 2 and len(chunks[1].elements) == 1


def test_semantic_oversized_table_own_chunk():
    rows = [[f"r{i}", f"v{i}"] for i in range(20)]
    els = [el("table", rows=rows), el("paragraph", "after")]
    chunks = SemanticChunker(
        SemanticChunkConfig(max_tokens=8, overlap_tokens=0)
    ).chunk(els)
    assert chunks[0].is_oversized()
    assert chunks[0].elements[0].kind == "table"
    assert chunks[1].text() == "after"


def test_semantic_oversized_paragraph_splits():
    big = "one two three four. five six seven eight. nine ten."
    els = [el("paragraph", big)]
    chunks = SemanticChunker(
        SemanticChunkConfig(max_tokens=5, overlap_tokens=0)
    ).chunk(els)
    # first buffer (sentence 1, 4 tokens) flushes when sentence 2 won't
    # fit; the leftover buffer rides in current_elements → final chunk
    texts = [c.text() for c in chunks]
    assert texts[0] == "one two three four."
    assert texts[-1] == "nine ten."
    assert all(e.kind == "paragraph" for c in chunks for e in c.elements)


def test_semantic_page_numbers():
    els = [
        el("paragraph", "a", page=2),
        el("paragraph", "b", page=0),
        el("paragraph", "c", page=2),
    ]
    chunks = SemanticChunker(SemanticChunkConfig(max_tokens=50)).chunk(els)
    assert chunks[0].page_numbers() == [0, 2]


# ---------------------------------------------------------------------------
# ChunkMetadata (chunk_metadata.rs tests mirrored)
# ---------------------------------------------------------------------------


def test_content_types_and_counts():
    els = [
        el("paragraph", "Hello world. Second sentence!", font="F", size=10.0),
        el("table", rows=[]),
    ]
    flags = content_type_flags(els)
    assert flags.has_table and not flags.has_list and not flags.heading_only
    text = "Hello world. Second sentence!"
    assert word_count(text) == 4
    assert sentence_count(text) == 2
    assert content_type_flags([el("title", "T")]).heading_only


def test_aggregates_char_weighted():
    els = [
        el("paragraph", "aaaa", font="Helvetica", size=12.0, bold=True, conf=0.9),
        el("paragraph", "bb", font="Times", size=10.0, conf=0.5),
    ]
    agg = Aggregates(els)
    assert agg.dominant_font == "Helvetica"
    assert agg.dominant_font_size == 12.0
    assert agg.is_bold  # 4 bold vs 2 → strict majority
    assert agg.min_confidence == pytest.approx(0.5)
    # Rust max_by_key tie → LAST maximal element
    tie = Aggregates(
        [
            el("paragraph", "xx", font="A", size=8.0),
            el("paragraph", "yy", font="B", size=9.0),
        ]
    )
    assert tie.dominant_font == "B"
    assert tie.dominant_font_size == 9.0
    assert Aggregates([]).min_confidence == 0.0


def test_chunk_id_deterministic_and_prefixed():
    a = content_chunk_id(None, 0, "the quick brown fox")
    assert a == content_chunk_id(None, 0, "the quick brown fox")
    assert a.endswith(":0")
    assert len(a.split(":")[0]) == 16  # 8 bytes of SHA-256 in hex
    assert content_chunk_id("dochash123", 7, "ignored") == "dochash123:7"
    assert a != content_chunk_id(None, 0, "different text")


def test_chunk_metadata_default_empty():
    m = ChunkMetadata()
    assert m.heading_path == [] and m.dominant_font is None
    assert not m.is_bold and m.min_confidence == 0.0
    assert not m.content_types.has_table
    assert m.chunk_id == "" and m.source is None
    assert m.page_span is None and m.page_regions == []
    assert m.table_rows is None and m.table_cols is None
    assert m.language is None and m.language_confidence is None


def test_document_source_with_file():
    s = DocumentSource.with_file("doc.pdf", "h7")
    assert s.filename == "doc.pdf" and s.doc_hash == "h7"
    assert s.title is None and s.total_pages is None


def test_citation_anchor_union_bbox():
    els = [
        el("paragraph", "a", page=1, bbox=ElementBBox(10.0, 700.0, 100.0, 20.0)),
        el("paragraph", "b", page=1, bbox=ElementBBox(50.0, 600.0, 200.0, 10.0)),
        el("paragraph", "c", page=2, bbox=ElementBBox(30.0, 500.0, 40.0, 40.0)),
    ]
    m = ChunkMetadata.from_elements(els, "a\nb\nc", "a\nb\nc", 0)
    assert m.page_span == (1, 2)
    assert [r.page for r in m.page_regions] == [1, 2]
    p1 = m.page_regions[0].bbox
    assert (p1.x, p1.y, p1.right(), p1.top()) == (10.0, 600.0, 250.0, 720.0)
    p2 = m.page_regions[1].bbox
    assert (p2.x, p2.right(), p2.top()) == (30.0, 70.0, 540.0)
    empty = ChunkMetadata.from_elements([], "", "", 0)
    assert empty.page_span is None and empty.page_regions == []


def test_table_dims_largest_and_widest():
    small = el("table", rows=[["a", "b"]])
    big = el("table", rows=[["a"], ["b"], ["c"]])
    m = ChunkMetadata.from_elements(
        [el("paragraph", "x"), small, big], "x", "x", 0
    )
    assert m.table_rows == 3 and m.table_cols == 1
    ragged = el("table", rows=[["a", "b"], ["c", "d", "e", "f"]])
    m2 = ChunkMetadata.from_elements([ragged], "t", "t", 0)
    assert m2.table_rows == 2 and m2.table_cols == 4
    m3 = ChunkMetadata.from_elements([el("paragraph", "p")], "p", "p", 0)
    assert m3.table_rows is None and m3.table_cols is None


def test_heading_path_from_first_element():
    els = [
        el("paragraph", "x", path=["Ch", "Sec"]),
        el("paragraph", "y", path=["Other"]),
    ]
    m = ChunkMetadata.from_elements(els, "x\ny", "x\ny", 0)
    assert m.heading_path == ["Ch", "Sec"]


def test_language_detection_hook():
    text = (
        "The annual report summarizes the financial performance of the "
        "company over the year."
    )
    detected = detect_language_full(text)
    assert detected is not None
    code, conf, reliable = detected
    assert code == "eng" and 0.0 < conf <= 1.0 and reliable
    assert detect_language_full("") is None
    assert detect_language_full("zzz qqq") is None
    # feature-off default: fields stay None
    m = ChunkMetadata.from_elements([el("paragraph", "x")], text, text, 0)
    assert m.language is None
    m2 = ChunkMetadata.from_elements(
        [el("paragraph", "x")], text, text, 0, lang_detector=detect_language_full
    )
    assert m2.language == "eng" and m2.language_reliable is True


# ---------------------------------------------------------------------------
# RagChunk (rag.rs) + linking
# ---------------------------------------------------------------------------


def test_rag_chunks_from_elements_linked():
    els = assign_heading_paths(
        [
            el("title", "Intro", size=20.0, page=0,
               bbox=ElementBBox(50.0, 700.0, 200.0, 20.0)),
            el("paragraph", "one two three.", page=0,
               bbox=ElementBBox(50.0, 650.0, 200.0, 40.0)),
            el("title", "Methods", size=20.0, page=1),
            el("paragraph", "four five six.", page=1),
        ]
    )
    chunks = rag_chunks_from_elements(
        els, HybridChunkConfig(max_tokens=50),
        source=DocumentSource.with_file("doc.pdf", "h42"),
    )
    assert [c.chunk_index for c in chunks] == list(range(len(chunks)))
    c0 = chunks[0]
    assert c0.text == "Intro"
    assert c0.element_types == ["title"]
    assert c0.page_numbers == [0]
    assert c0.metadata.chunk_id == "h42:0"
    assert c0.metadata.prev_chunk_id is None
    assert c0.metadata.next_chunk_id == "h42:1"
    assert chunks[-1].metadata.next_chunk_id is None
    assert c0.metadata.source.filename == "doc.pdf"
    # full_text carries the heading context for body chunks
    body = chunks[1]
    assert body.heading_context == "Intro"
    assert body.full_text.startswith("Intro\n\n")
    # JSON round trip
    d = json.loads(c0.to_json())
    assert d["metadata"]["chunk_id"] == "h42:0"
    assert d["element_types"] == ["title"]


def test_link_chunks_direct():
    els = [el("paragraph", "a"), el("title", "T", size=20.0)]
    chunks = rag_chunks_from_elements(els)
    link_chunks(chunks)  # idempotent
    if len(chunks) > 1:
        assert chunks[0].metadata.next_chunk_id == chunks[1].metadata.chunk_id
        assert chunks[1].metadata.prev_chunk_id == chunks[0].metadata.chunk_id


# ---------------------------------------------------------------------------
# ExtractionProfile (profile.rs)
# ---------------------------------------------------------------------------


def test_extraction_profiles():
    std = extraction_profile("standard")
    assert std.extraction == {"space_threshold": 0.3, "detect_columns": False}
    assert std.partition.title_min_font_ratio == 1.3
    assert std.partition.reading_order == "simple"

    academic = extraction_profile("academic")
    assert academic.extraction["detect_columns"] is True
    assert academic.partition.header_zone == 0.08

    pres = extraction_profile("presentation")
    assert pres.partition.detect_spatial_tables is False
    assert pres.partition.title_min_font_ratio == 1.2

    rag = extraction_profile("rag")
    assert rag.partition.reading_order == "xycut"
    assert rag.partition.xycut_min_gap == 20.0
    assert rag.partition.min_table_confidence == 0.65

    form = extraction_profile("Form")  # case-insensitive
    assert form.partition.title_min_font_ratio == 1.5

    with pytest.raises(KeyError):
        extraction_profile("nope")


# ---------------------------------------------------------------------------
# document-level partition
# ---------------------------------------------------------------------------


def test_partition_document_per_page_headings():
    page0 = [
        frag("Heading One", size=20.0),
        frag("body of page zero", size=10.0),
        frag("more body text here", size=10.0),
    ]
    page1 = [
        frag("body of page one", size=10.0),
        frag("second body line", size=10.0),
    ]
    els = partition_document(
        [page0, page1],
        PartitionConfig(reading_order="none", detect_tables=False,
                        detect_headers_footers=False),
    )
    assert els[0].kind == "title" and els[0].metadata.page == 0
    assert els[1].metadata.parent_heading == "Heading One"
    # reference quirk: heading stacks reset at page boundaries
    page1_els = [e for e in els if e.metadata.page == 1]
    assert all(e.metadata.parent_heading is None for e in page1_els)


# ---------------------------------------------------------------------------
# end-to-end: real PDF bytes → partition → rag chunks
# ---------------------------------------------------------------------------


def test_partition_pdf_bytes_sectioned():
    from oxidizepdf_spark.corpus import build_sectioned_pdf
    from oxidizepdf_spark.kernel.partition import partition_pdf_bytes

    pdf = build_sectioned_pdf(
        [
            ("Introduction", [["alpha"] * 12, ["beta"] * 12]),
            ("Methods", [["gamma"] * 12]),
        ]
    )
    els = partition_pdf_bytes(pdf)
    titles = [e for e in els if e.kind == "title"]
    assert [t.display_text() for t in titles] == ["Introduction", "Methods"]
    # title at 18pt vs 12pt body → ratio 1.5; conf = .5 + .5*(.2/1.3)
    assert titles[0].metadata.confidence == pytest.approx(0.5 + 0.5 * 0.2 / 1.3)
    paras = [e for e in els if e.kind == "paragraph"]
    assert paras and all(
        e.metadata.parent_heading in ("Introduction", "Methods") for e in paras
    )
    # pages carried through (one page per section)
    assert {e.metadata.page for e in els} == {0, 1}


def test_partition_pdf_bytes_ruling_table():
    from oxidizepdf_spark.corpus import build_table_pdf
    from oxidizepdf_spark.kernel.partition import partition_pdf_bytes

    pdf = build_table_pdf([["h1", "h2"], ["a", "b"], ["c", "d"]])
    els = partition_pdf_bytes(pdf)
    tables = [e for e in els if e.kind == "table"]
    assert len(tables) == 1
    assert tables[0].rows == [["h1", "h2"], ["a", "b"], ["c", "d"]]
    assert tables[0].metadata.confidence == 1.0  # fully populated + bonus


def test_rag_chunks_pdf_bytes_end_to_end():
    from oxidizepdf_spark.corpus import build_sectioned_pdf
    from oxidizepdf_spark.kernel.rag_graph import rag_chunks_pdf_bytes

    pdf = build_sectioned_pdf(
        [("Results", [["delta"] * 8, ["omega"] * 8])]
    )
    chunks = rag_chunks_pdf_bytes(
        pdf, source=DocumentSource.with_file("r.pdf", "deadbeef")
    )
    assert chunks
    assert chunks[0].metadata.chunk_id == "deadbeef:0"
    all_text = "\n".join(c.text for c in chunks)
    assert "Results" in all_text and "delta" in all_text
    # linked list is consistent
    for i in range(1, len(chunks)):
        assert chunks[i].metadata.prev_chunk_id == chunks[i - 1].metadata.chunk_id


def test_export_elements_markdown():
    """ElementMarkdownExporter parity (pipeline/export.rs): per-kind
    mapping, header/footer gating, header-width table separator."""
    from oxidizepdf_spark.kernel.partition import (
        RichElement,
        export_elements_markdown,
    )

    els = [
        RichElement("title", "Heading One "),
        RichElement("paragraph", " body text "),
        RichElement("list_item", "first"),
        RichElement("key_value", key=" Total ", value=" 99 "),
        RichElement("code_block", "x = 1"),
        RichElement("image", alt_text="logo"),
        RichElement("table", rows=[["a", "b"], ["1", "2"]]),
        RichElement("header", "Page Header"),
        RichElement("footer", "Page 3"),
    ]
    md = export_elements_markdown(els)
    assert md == (
        "# Heading One\n\n"
        "body text\n\n"
        "- first\n\n"
        "**Total**: 99\n\n"
        "```\nx = 1\n```\n\n"
        "![logo]()\n\n"
        "| a | b |\n| --- | --- |\n| 1 | 2 |"
    )
    with_hf = export_elements_markdown(els, include_headers_footers=True)
    assert with_hf.endswith("Page Header\n\nPage 3")
    assert export_elements_markdown([]) == ""

"""Property tests for the rich partitioner, chunkers, and PNG codec.

Invariants (not example-based): chunkers conserve elements, heading
paths are internally consistent, the graph is a forest rooted at
titles, and encode_png ∘ parse_png_samples is the identity."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from oxidizepdf_spark.kernel.partition import (
    ElementBBox,
    ElementMetadata,
    RichElement,
    assign_heading_paths,
)
from oxidizepdf_spark.kernel.rag_graph import (
    ElementGraph,
    HybridChunkConfig,
    HybridChunker,
    SemanticChunkConfig,
    SemanticChunker,
    estimate_tokens,
    rag_chunks_from_elements,
    split_by_sentences,
    split_into_sentences,
)


_WORDS = st.lists(
    st.sampled_from(["alpha", "beta", "gamma", "delta", "word", "text."]),
    min_size=1,
    max_size=30,
)


@st.composite
def element_lists(draw):
    n = draw(st.integers(1, 12))
    out = []
    for i in range(n):
        kind = draw(
            st.sampled_from(
                ["paragraph", "title", "list_item", "header", "footer", "table"]
            )
        )
        if kind == "table":
            rows = [
                ["c" for _ in range(draw(st.integers(1, 3)))]
                for _ in range(draw(st.integers(1, 3)))
            ]
            out.append(
                RichElement(
                    "table",
                    metadata=ElementMetadata(page=draw(st.integers(0, 3))),
                    rows=rows,
                )
            )
        else:
            text = " ".join(draw(_WORDS))
            size = draw(st.sampled_from([10.0, 14.0, 20.0, None]))
            out.append(
                RichElement(
                    kind,
                    text,
                    ElementMetadata(
                        page=draw(st.integers(0, 3)),
                        font_size=size,
                        bbox=ElementBBox(10.0 * i, 700.0 - 20.0 * i, 50.0, 12.0),
                    ),
                )
            )
    return assign_heading_paths(out)


@given(element_lists())
@settings(max_examples=60, deadline=None)
def test_heading_paths_consistent(els):
    for e in els:
        path = e.metadata.heading_path
        if path:
            assert e.metadata.parent_heading == path[-1]
        else:
            assert e.metadata.parent_heading is None
        if e.kind == "title":
            # a title's own text terminates its path
            assert path and path[-1] == e.text


@given(element_lists())
@settings(max_examples=60, deadline=None)
def test_graph_is_title_rooted_forest(els):
    g = ElementGraph.build(els)
    assert len(g) == len(els)
    for i in range(len(els)):
        p = g.parent_of(i)
        if p is not None:
            assert els[p].kind == "title"
            assert p < i  # parent strictly precedes child
            assert i in g.children_of(p)
        if els[i].kind == "title":
            assert p is None  # titles are always roots
    tops = g.top_level_sections()
    assert tops == [i for i in range(len(els)) if els[i].kind == "title"]


@given(element_lists(), st.integers(4, 64))
@settings(max_examples=60, deadline=None)
def test_hybrid_chunker_conserves_elements(els, max_tokens):
    chunks = HybridChunker(HybridChunkConfig(max_tokens=max_tokens)).chunk(els)
    # element-disjoint cover: every source element appears exactly once
    # (oversized splittables are split into fragments whose concatenated
    # words equal the original)
    src_words = [w for e in els for w in e.display_text().split()]
    out_words = [
        w for c in chunks for e in c.elements for w in e.display_text().split()
    ]
    assert out_words == src_words
    for c in chunks:
        if not c.is_oversized():
            # only single-element unsplittable chunks may exceed the cap
            # (titles/tables appended to a buffer respect it by flushing)
            if len(c.elements) > 1:
                assert c.token_estimate() <= max_tokens or any(
                    e.kind not in ("paragraph", "list_item", "key_value")
                    for e in c.elements
                )


@given(element_lists(), st.integers(4, 64))
@settings(max_examples=60, deadline=None)
def test_semantic_chunker_covers_all_elements(els, max_tokens):
    chunks = SemanticChunker(
        SemanticChunkConfig(max_tokens=max_tokens, overlap_tokens=0)
    ).chunk(els)
    # with overlap off the chunker is a partition of the (possibly
    # sentence-split) element sequence — word streams must match
    src_words = [w for e in els for w in e.text.split()]
    out_words = [w for c in chunks for e in c.elements for w in e.text.split()]
    assert out_words == src_words


@given(element_lists())
@settings(max_examples=30, deadline=None)
def test_rag_chunks_linked_list(els):
    chunks = rag_chunks_from_elements(els)
    for i, c in enumerate(chunks):
        assert c.chunk_index == i
        assert c.metadata.chunk_id.endswith(f":{i}")
        if i > 0:
            assert c.metadata.prev_chunk_id == chunks[i - 1].metadata.chunk_id
        if i + 1 < len(chunks):
            assert c.metadata.next_chunk_id == chunks[i + 1].metadata.chunk_id
        # pages sorted unique
        assert c.page_numbers == sorted(set(c.page_numbers))


@given(st.text(alphabet="ab .!?\n", max_size=200), st.integers(1, 20))
@settings(max_examples=100, deadline=None)
def test_split_by_sentences_conserves_words(text, max_tokens):
    fragments = split_by_sentences(text, max_tokens)
    assert fragments  # never empty
    src = text.split()
    out = [w for f in fragments for w in f.split()]
    assert out == src


@given(st.text(alphabet="xy .!?\n", max_size=200))
@settings(max_examples=100, deadline=None)
def test_split_into_sentences_conserves_words(text):
    out = [w for s in split_into_sentences(text) for w in s.split()]
    assert out == text.split()


@given(
    st.integers(1, 20),
    st.integers(1, 20),
    st.sampled_from([1, 3, 4]),
    st.binary(min_size=0, max_size=2000),
)
@settings(max_examples=100, deadline=None)
def test_png_roundtrip(width, height, components, noise):
    from oxidizepdf_spark.kernel.extract_images import (
        encode_png,
        parse_png_samples,
    )

    need = width * height * components
    data = (noise * (need // max(len(noise), 1) + 1))[:need] if noise else bytes(need)
    png = encode_png(data, width, height, components, 8)
    w, h, comps, depth, samples = parse_png_samples(png)
    assert (w, h, comps, depth) == (width, height, components, 8)
    assert samples == data

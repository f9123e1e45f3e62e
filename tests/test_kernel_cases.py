"""Span-sequence parity over the full fixture matrix (FIXTURES.md §3-§4).

Mirrors the reference's synthetic-PDF integration tests
(tests/common/synthetic_pdf.rs + extraction_*_test.rs assertions):
every case must produce the exact (kind, text, media_ref, offset) sequence.
"""

from __future__ import annotations

import pytest

from oxidizepdf_spark.corpus import (
    all_cases,
    build_pdf_with_content_stream,
    build_text_pdf,
    generate_corpus,
)
from oxidizepdf_spark.kernel.extract import (
    decode_raw_payload,
    extract_document_spans,
    extract_pdf_bytes,
)


@pytest.mark.parametrize(
    "case,pdf,expected", [(c, p, e) for c, p, e in all_cases()], ids=lambda v: v if isinstance(v, str) else ""
)
def test_case_span_equality(case, pdf, expected):
    res = extract_pdf_bytes(pdf)
    assert res.error is None, f"{case}: {res.error}"
    got = res.spans
    assert got == expected, f"{case}: {got!r} != {expected!r}"


def test_recovery_mode_lineage():
    # X10-style corrupt startxref must extract but flag mode='recovered'
    from oxidizepdf_spark.corpus import structural_cases

    x10 = next(c for c in structural_cases() if c[0] == "X10")
    res = extract_pdf_bytes(x10[1])
    assert res.mode == "recovered"
    assert res.spans == x10[2]


def test_text_pdf_roundtrip_simple():
    text = "the quick brown fox jumps"
    res = extract_pdf_bytes(build_text_pdf(text))
    assert res.error is None
    assert res.spans == [("text", text, None)]


def test_text_pdf_roundtrip_multiline_and_pages():
    text = "\n".join(f"line {i} of the document" for i in range(100))
    res = extract_pdf_bytes(build_text_pdf(text, lines_per_page=40))
    assert res.error is None
    joined = "\n".join(s[1] for s in res.spans if s[0] == "text")
    assert joined == text
    assert res.n_pages == 3


def test_text_pdf_roundtrip_special_chars():
    text = "parens (and) back\\slash plus (nested (deep)) ok"
    res = extract_pdf_bytes(build_text_pdf(text))
    assert res.spans == [("text", text, None)]


def test_interleaved_document_passthrough():
    in_spans = [
        ("text", "before", None),
        (
            "raw_pdf",
            build_pdf_with_content_stream(
                b"BT /F1 12 Tf 100 700 Td (Hello World) Tj ET"
            ).decode("latin-1"),
            None,
        ),
        ("media", "", "media://img/000000000001"),
        ("text", "after", None),
    ]
    spans, meta = extract_document_spans(in_spans)
    assert meta["ok"] is True
    assert spans == [
        ("text", "before", None, 0),
        ("text", "Hello World", None, 1),
        ("media", "", "media://img/000000000001", 2),
        ("text", "after", None, 3),
    ]


def test_corpus_generator_deterministic_and_correct():
    pairs1 = list(generate_corpus(n_docs=40, seed=7))
    pairs2 = list(generate_corpus(n_docs=40, seed=7))
    assert pairs1 == pairs2  # determinism
    for in_row, exp_row in pairs1:
        in_spans = [
            (s["kind"], s["text"], s["media_ref"]) for s in in_row["spans"]
        ]
        got, meta = extract_document_spans(in_spans)
        want = [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in exp_row["spans"]
        ]
        assert got == want, f"{in_row['doc_id']} ({in_row['case']})"


def test_b85_payload_roundtrip():
    from oxidizepdf_spark.corpus import encode_raw_payload

    pdf = build_pdf_with_content_stream(
        b"BT /F1 12 Tf 100 700 Td (Hello World) Tj ET",
        content_filter="FlateDecode",
    )
    payload = encode_raw_payload(pdf)
    assert decode_raw_payload(payload) == pdf


def test_unbalanced_marked_content_defensive():
    """extraction_unbalanced_bdc_test.rs (issue #269): extra EMCs are
    silently dropped; a dangling BDC at EOF still extracts with its MCID
    attributed — never a crash."""
    from oxidizepdf_spark.corpus import build_pdf_with_content_stream
    from oxidizepdf_spark.kernel.extract import extract_pdf_bytes
    from oxidizepdf_spark.kernel.textstate import ExtractionOptions

    extra_emc = (
        b"BT /F1 12 Tf 100 700 Td EMC EMC "
        b"/P << /MCID 0 >> BDC (hello) Tj EMC EMC ET"
    )
    dangling = b"BT /F1 12 Tf 100 700 Td /P << /MCID 0 >> BDC (hello) Tj ET"
    for content in (extra_emc, dangling):
        pdf = build_pdf_with_content_stream(content)
        res = extract_pdf_bytes(pdf, ExtractionOptions(preserve_layout=True))
        assert res.error is None
        frs = res.page_fragments[0]
        hello = [f for f in frs if f.text == "hello"]
        assert hello and hello[0].mcid == 0

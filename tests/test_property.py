"""Property-based tests (SURVEY.md §5 item 4 — mirrors the reference's
proptest strategies, tests/proptest_parser.rs:1-60): parsers never raise on
arbitrary/corrupted input; valid constructs round-trip.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from oxidizepdf_spark.corpus import build_pdf_with_content_stream, escape_pdf_string, lzw_encode
from oxidizepdf_spark.kernel import filters
from oxidizepdf_spark.kernel.content import parse_content
from oxidizepdf_spark.kernel.extract import extract_pdf_bytes
from oxidizepdf_spark.kernel.objects import Lexer, PdfParseError


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=512))
def test_content_parser_never_raises(data):
    ops = parse_content(data)
    assert isinstance(ops, list)


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=512))
def test_object_lexer_graceful(data):
    lexer = Lexer(data)
    try:
        for _ in range(64):
            if lexer.next_token()[0] == "eof":
                break
    except PdfParseError:
        pass  # structured failure is allowed; crashes are not


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=256))
def test_whole_file_extraction_never_raises(data):
    res = extract_pdf_bytes(b"%PDF-1.4\n" + data)
    assert res.spans is not None


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E), max_size=120))
def test_literal_string_roundtrip(text):
    """Any printable-ASCII string survives escape → tokenize → decode,
    modulo the extractor's sanitize (space collapse)."""
    content = b"BT /F1 12 Tf 100 700 Td (%s) Tj ET" % escape_pdf_string(text)
    ops = parse_content(content)
    shows = [o for o in ops if o[0] == "Tj"]
    assert len(shows) == 1
    assert shows[0][1] == text.encode("latin-1")


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=2048))
def test_lzw_roundtrip_property(data):
    assert filters.decode_lzw(lzw_encode(data)) == data


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=512))
def test_flate_decoder_never_raises(data):
    out = filters.decode_flate(data)
    assert isinstance(out, bytes)


@settings(max_examples=60, deadline=None)
@given(
    st.text(alphabet="abcdefgh ", min_size=1, max_size=60),
    st.integers(min_value=0, max_value=400),
)
def test_corrupt_tail_recovers(text, cut):
    """Chopping the xref/trailer tail off a valid PDF must still extract
    via the recovery scan (xref.rs:1050) as long as the objects survive."""
    content = b"BT /F1 12 Tf 100 700 Td (%s) Tj ET" % escape_pdf_string(text)
    pdf = build_pdf_with_content_stream(content)
    xref_at = pdf.rindex(b"xref")
    cut_at = min(xref_at + cut, len(pdf))
    res = extract_pdf_bytes(pdf[:cut_at])
    # never raises; and when the body is intact the text must survive
    assert res.spans is not None
    if res.error is None and res.n_pages == 1:
        joined = "".join(s[1] for s in res.spans if s[0] == "text")
        from oxidizepdf_spark.kernel.fonts import sanitize_extracted_text

        assert joined == sanitize_extracted_text(text)


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=600))
def test_fused_parse_matches_two_pass(data):
    """parse_content's fused single pass must equal the reference-shaped
    two-pass pipeline (tokenize → parse_operators) on arbitrary bytes."""
    from oxidizepdf_spark.kernel.content import parse_content, parse_operators, tokenize

    assert parse_content(data) == parse_operators(tokenize(data))


def test_object_lexer_fast_path_equals_slow_path():
    """The master-regex fast path of the object lexer must produce the
    byte-identical token stream of the reference byte-wise path on
    arbitrary input (the fast path falls back to it for anything exotic)."""
    import random

    from oxidizepdf_spark.kernel import objects as O

    def stream(data, force_slow):
        lx = O.Lexer(data)
        out = []
        while True:
            try:
                t = lx._next_token_slow() if force_slow else lx.next_token()
            except O.PdfParseError as e:
                out.append(("RAISE", type(e).__name__))
                return out
            out.append(t)
            if t[0] == "eof":
                return out

    rng = random.Random(1234)
    alphabet = b"()<>[]{}/%+-.0123456789 \t\r\nabcRdefT#\\z"
    for _ in range(1500):
        data = bytes(
            rng.choice(alphabet) for _ in range(rng.randrange(0, 60))
        )
        assert stream(data, False) == stream(data, True), data


def test_fused_parser_adversarial_cases():
    """Deterministic differential cases for the fused parser, including the
    stray-ID / BI-value-position-ID divergences a review fuzz once found."""
    from oxidizepdf_spark.kernel.content import (
        parse_content,
        parse_operators,
        tokenize,
    )

    cases = [
        b"(hello) ID xx EI Tj",
        b"ET q null Tm Tf (a\\)b) ID xx EI Tj re",
        b"-3.5 ID xx EI sc",
        b"true /A#42 sc BI /A#42 ID xx EI Td",
        b"BI /F1 ID xx EI",
        b"BI /A ID xx EI (t) Tj",
        b"ID",
        b"ID x",
        b"BI ID",
        b"BI /K ID",
        b"BI /K /V ID p EI (x) Tj",
        b"BT /F0 16 Tf 1 0 0 -1 0 2235 Tm 408 0 Td <0003> Tj ET",
        b"[(a) -120 (b)] TJ",
        b"[1 + 2] TJ",
        b"1 2 Td (s) Tj",
        b"5 Td (a) Tj",
        b"(x) 1 2 Td (s) Tj",
        b"[" + b"1 " * 500 + b"] 0 d",
    ]
    for c in cases:
        assert parse_content(c) == parse_operators(tokenize(c)), c


def test_fused_parser_id_focused_fuzz():
    """Random interleavings of BI/ID/EI with operands and show ops — the
    inline-image state machine is where fused/token paths can drift."""
    import random

    from oxidizepdf_spark.kernel.content import (
        parse_content,
        parse_operators,
        tokenize,
    )

    rng = random.Random(99)
    toks = [
        b"BI", b"ID", b"EI", b"(a)", b"<41>", b"/K", b"/V", b"5", b"-3.5",
        b"Tj", b"TJ", b"[", b"]", b"Td", b"sc", b"Tm", b"q", b"null", b"xx",
    ]
    for _ in range(1500):
        c = b" ".join(rng.choice(toks) for _ in range(rng.randrange(0, 14)))
        try:
            a = parse_content(c)
        except Exception as e:
            a = ("R", type(e).__name__)
        try:
            b = parse_operators(tokenize(c))
        except Exception as e:
            b = ("R", type(e).__name__)
        assert a == b, c

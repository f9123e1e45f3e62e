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


def _interp_snapshot(interp):
    st = interp.state
    out = interp.finalize()
    return (
        out.spans,
        out.text,
        [
            (f.text, round(f.x, 6), round(f.y, 6), round(f.width, 6), f.mcid,
             f.struct_tag)
            for f in out.fragments
        ],
        st.text_matrix, st.text_line_matrix, st.ctm, st.leading,
        st.char_space, st.word_space, st.horizontal_scale, st.font_size,
        st.font_name, st.render_mode, st.fill_color, len(st.saved),
        len(st.mc_stack), st.artifact_n, interp.in_text,
        round(interp.last_x, 6), round(interp.last_y, 6),
    )


def test_fused_interpret_equals_two_pass():
    """parse_and_run (fused tokenize+parse+interpret, the extraction hot
    path) must leave the interpreter in EXACTLY the state that
    run(parse_content(x)) does — spans, text, fragments, matrices, colors,
    marked-content state — on targeted and random operator streams."""
    import random

    from oxidizepdf_spark.kernel.content import (
        _NAME_MEMO,
        parse_and_run,
        parse_content,
    )
    from oxidizepdf_spark.kernel.textstate import (
        ExtractionOptions,
        Interpreter,
    )

    # shared decode memo: clear so a bug in either path can't be masked by
    # a correct entry the other path cached earlier in the process
    _NAME_MEMO.clear()

    def run_both(content, **optkw):
        a = Interpreter(options=ExtractionOptions(**optkw))
        parse_and_run(a, content, None)
        b = Interpreter(options=ExtractionOptions(**optkw))
        b.run(parse_content(content), None)
        return _interp_snapshot(a), _interp_snapshot(b)

    cases = [
        b"BT /F1 12 Tf 100 700 Td (Hi) Tj ET",
        b"BT /F0 16 Tf 1 0 0 -1 0 2235 Tm 408 0 Td <0003> Tj ET",
        b"BT /F1 12 Tf [(a) -300 (b)] TJ ET",
        b"BT /F1 12 Tf 100 700 Td (a) ' (b) ' ET",
        b'BT /F1 12 Tf 2 3 (x) " ET',
        b"q 2 0 0 2 5 5 cm BT /F1 10 Tf (s) Tj ET Q",
        b"/P << /MCID 3 >> BDC BT /F1 9 Tf (m) Tj ET EMC",
        b"/Artifact BMC BT /F1 9 Tf (h) Tj ET EMC BT /F1 9 Tf (s) Tj ET",
        b"BT 14 TL /F1 12 Tf (l1) Tj T* (l2) Tj ET",
        b"BT /F1 12 Tf 1 Tz 50 Tz (z) Tj 3 Tr 0.5 Ts 2 Tc 1 Tw ET",
        b"0.5 g 1 0 0 rg 0 0 0 1 k BT /F1 8 Tf (c) Tj ET",
        b"(stray) Tj",
        b"5 Td (a) Tj",
        b"(x) 1 2 Td (s) Tj",
        b"BT /F1 12 Tf (pre) Tj ET BI /W 2 ID \x00\x01 EI (post) Tj",
        b"(hello) ID xx EI Tj",
        b"BI /A ID xx EI (t) Tj",
        b"EMC EMC BT /F1 12 Tf /P << /MCID 0 >> BDC (h) Tj EMC EMC ET",
        b"1 2 TD (s) Tj",
        b"[1 2] 0 d (x) Tj",
        b"true false null Tj",
    ]
    for c in cases:
        for kw in (
            {},
            {"preserve_layout": True},
            {"reading_order": "xycut"},
            {"include_artifacts": True},
        ):
            a, b = run_both(c, **kw)
            assert a == b, (c, kw)

    rng = random.Random(5)
    toks = [
        b"BT", b"ET", b"/F1 12 Tf", b"1 0 0 1 5 7 Tm", b"3 -4 Td", b"(a)",
        b"(ab) Tj", b"<41> Tj", b"[(a) -300 (b)] TJ", b"T*", b"12 TL",
        b"' ", b'2 3 (q) "', b"q", b"Q", b"2 0 0 2 0 0 cm", b"0.5 g",
        b"/P << /MCID 1 >> BDC", b"EMC", b"/Artifact BMC", b"/Im1 Do",
        b"BI /W 1 ID x EI", b"ID y", b"5 Tz", b"1 Tr", b"null",
        b"[1 2] 0 d", b"(x)", b"7",
        # trailing/embedded comments (the round-3 comment-at-EOF fix) and
        # path operators (the graphics pass shares the op stream)
        b"% trailing comment Q", b"%c\n", b"10 10 100 50 re", b"S",
        b"0 0 m 5 5 l",
    ]
    for _ in range(800):
        c = b" ".join(rng.choice(toks) for _ in range(rng.randrange(0, 16)))
        a, b = run_both(c)
        assert a == b, c

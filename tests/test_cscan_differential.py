"""C fast path vs pure-Python fused loop: full-output differential.

The C extension (_cscan.c) transcribes _parse_and_run_py; these tests pin
the two byte-for-byte equal — spans, page text, error strings, and final
interpreter state — over the whole synthetic corpus catalog, the builder
fixtures, and adversarial content streams. Skipped when the toolchain
can't build the extension (the engine then runs pure Python anyway)."""

from __future__ import annotations

import pytest

from oxidizepdf_spark.kernel import content as C

pytestmark = pytest.mark.skipif(
    C._CSCAN is None, reason="C extension unavailable (no toolchain)"
)


def _both_paths(fn):
    """Run fn() with the C paths active, then forced-off; return both."""
    from oxidizepdf_spark.kernel import reader as R

    with_c = fn()
    saved = C._CSCAN
    saved_p = R._CPARSE
    C._CSCAN = None
    R._CPARSE = None
    try:
        without_c = fn()
    finally:
        C._CSCAN = saved
        R._CPARSE = saved_p
    return with_c, without_c


def _extract_all(data: bytes):
    from oxidizepdf_spark.kernel.extract import extract_pdf_bytes

    res = extract_pdf_bytes(data)
    return (res.spans, res.n_pages, res.error, res.mode)


def test_differential_full_corpus_catalog():
    from oxidizepdf_spark.corpus import generate_corpus
    from oxidizepdf_spark.kernel.extract import extract_document_spans

    rows = list(generate_corpus(n_docs=400, seed=99))

    def run():
        out = []
        for in_row, _ in rows:
            spans, meta = extract_document_spans(
                [(s["kind"], s["text"], s["media_ref"]) for s in in_row["spans"]]
            )
            out.append((in_row["case"], spans, meta["ok"], meta.get("error")))
        return out

    got_c, got_py = _both_paths(run)
    assert got_c == got_py


def test_differential_interpreter_state():
    """Beyond output spans: the FULL final interpreter state must match
    (matrices, counters, graphics stack, fonts scope) on dense streams."""
    from oxidizepdf_spark.corpus import build_pdf_with_content_stream
    from oxidizepdf_spark.kernel.content import parse_and_run, _parse_and_run_py
    from oxidizepdf_spark.kernel.textstate import ExtractionOptions, Interpreter

    streams = [
        b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (ab) Tj 0 -14 Td (cd) Tj ET",
        b"BT /F1 9 Tf 14 TL (x) Tj T* (y) Tj (z) ' 2 3 (w) \" ET",
        b"q 2 0 0 2 10 10 cm BT /F1 12 Tf (s) Tj ET Q BT (t) Tj ET",
        b"BT [ (a) -250 (b) 12.5 (c) ] TJ ET",
        b"BT /F1 12 Tf 50 Tz (wide) Tj 100 Tz (norm) Tj ET",
        b"/Art BMC BT /F1 10 Tf (hidden) Tj ET EMC BT (vis) Tj ET",
        b"/P << /MCID 4 >> BDC BT (m) Tj ET EMC",
        b"BT <4142> Tj [ <43> -100 (D) ] TJ ET",
        b"1 0 0 RG 0.5 g 0 0 1 rg 0 1 0 0 k BT (c) Tj ET",
        b"BT /F1 12 Tf 1 2.5 Td 3 Tr -4 Ts .5 Tc 1 Tw (q) Tj ET",
        b"BT (\\110\\151) Tj (par(en)s) Tj ET",
        b"2 J 1 j [] 0 d 10 M BT (after) Tj ET % comment\nBT (x) Tj ET",
        b"BT (dangling",
        b"[ (a) /Bad (b) ] TJ BT (ok) Tj ET",
        b"5 3 Td (no-bt) Tj",
        b"BT 1 0 0 1 0 0 Tm >> ] } ; (odd) Tj ET",
        b"BT 99999999999999999999 0 Td (big) Tj ET",
        b"BT /F1 12. Tf +.5 -0.0 Td (n) Tj ET",
        # macro-shape gate parity: bad hex defers behind in_text in the
        # M2/M5 shapes, raises eagerly in generic contexts
        b"<4\x001> Tj",
        b"[ <4\x001> ] TJ",
        b"[ <4\x001> /X ] TJ",
        b"BT [ <4142> -300 <> () 12.5 ] TJ ET",
        b"[ 12 ( unclosed",
    ]

    for stream in streams:
        finals = []
        for use_c in (True, False):
            interp = Interpreter(options=ExtractionOptions())
            try:
                if use_c:
                    parse_and_run(interp, stream, {})
                else:
                    _parse_and_run_py(interp, stream, {})
                err = None
            except Exception as e:
                err = f"{type(e).__name__}:{e}"
            out = interp.finalize()
            st = interp.state
            finals.append(
                (
                    err, out.spans, out.text,
                    st.text_matrix, st.text_line_matrix, st.ctm,
                    st.leading, st.char_space, st.word_space,
                    st.horizontal_scale, st.text_rise, st.font_size,
                    st.font_name, st.render_mode, st.fill_color,
                    st.saved, st.artifact_n,
                    interp._total, interp.last_x, interp.last_y,
                    interp._last_char, interp.in_text,
                )
            )
        assert finals[0] == finals[1], stream


def test_differential_real_fixtures():
    import os

    paths = [
        "/root/reference/test-pdfs/Cold_Email_Hacks.pdf",
        "/root/reference/oxidize-pdf-core/tests/fixtures/"
        "issue_272_higgs_arxiv_1207_7214.pdf",
    ]
    for p in paths:
        if not os.path.exists(p):
            continue
        data = open(p, "rb").read()
        got_c, got_py = _both_paths(lambda: _extract_all(data))
        assert got_c == got_py, p


def test_differential_hypothesis_streams():
    """Adversarial token soup through both paths."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from oxidizepdf_spark.kernel.content import _parse_and_run_py, parse_and_run
    from oxidizepdf_spark.kernel.textstate import ExtractionOptions, Interpreter

    token = st.sampled_from(
        [b"BT", b"ET", b"Tj", b"TJ", b"Td", b"TD", b"Tm", b"Tf", b"T*",
         b"'", b'"', b"TL", b"Tz", b"q", b"Q", b"cm", b"Do", b"BMC",
         b"BDC", b"EMC", b"BI", b"ID", b"EI", b"/F1", b"/Artifact", b"(a)",
         b"(b c)", b"<4142>", b"<<", b">>", b"[", b"]", b"12", b"-3.5",
         b".5", b"(es\\(c)", b"%cmt", b"re", b"f", b"5", b"7.2",
         b"<4\x001>", b"<zz>", b"Tjx", b"TJx"]
    )

    @settings(max_examples=300, deadline=None)
    @given(st.lists(token, min_size=0, max_size=40))
    def check(tokens):
        stream = b" ".join(tokens)
        finals = []
        for use_c in (True, False):
            interp = Interpreter(options=ExtractionOptions())
            try:
                if use_c:
                    parse_and_run(interp, stream, {})
                else:
                    _parse_and_run_py(interp, stream, {})
                err = None
            except Exception as e:
                err = f"{type(e).__name__}:{e}"
            out = interp.finalize()
            st_i = interp.state
            finals.append(
                (err, out.spans, out.text, st_i.text_matrix,
                 st_i.text_line_matrix, st_i.ctm, st_i.artifact_n,
                 interp._total, interp.last_x, interp.last_y,
                 interp._last_char, interp.in_text)
            )
        assert finals[0] == finals[1], stream

    check()


def test_differential_object_parser_real_fixtures():
    """C parse_indirect vs the pure-Python object parser, object by object,
    over both real fixtures: identical (num, gen, value) for every xref
    entry, incl. streams (dict + raw payload)."""
    from oxidizepdf_spark.kernel import reader as R
    from oxidizepdf_spark.kernel.objects import Stream
    from oxidizepdf_spark.kernel.reader import PdfReader

    for path in (
        "/root/reference/test-pdfs/Cold_Email_Hacks.pdf",
        "/root/reference/oxidize-pdf-core/tests/fixtures/"
        "issue_272_higgs_arxiv_1207_7214.pdf",
    ):
        data = open(path, "rb").read()
        rdr = PdfReader(data)
        checked = 0
        for num, entry in list(rdr.xref.items()):
            if entry[0] != "n":
                continue
            offset = entry[1]
            c_res = None
            py_res = None
            c_err = py_err = None
            try:
                assert R._CPARSE is not None
                c_raw = R._CPARSE(data, offset)
                if c_raw is None:
                    continue  # C bailed: Python path is authoritative anyway
                cn, cg, cv, has_stream, pos = c_raw
                if has_stream:
                    cv = rdr._capture_stream(cv, pos, cn, cg)
                c_res = (cn, cg, cv)
            except Exception as e:
                c_err = f"{type(e).__name__}"
            try:
                py_res = rdr._parse_indirect_object_at_py(offset)
            except Exception as e:
                py_err = f"{type(e).__name__}"
            assert c_err == py_err, (path, num)
            if c_res is None:
                continue

            def canon(v):
                if isinstance(v, Stream):
                    return ("STREAM", canon(v.dict), v.raw)
                if isinstance(v, dict):
                    return tuple(sorted((k, canon(x)) for k, x in v.items()))
                if isinstance(v, list):
                    return tuple(canon(x) for x in v)
                return (type(v).__name__, v)

            assert canon(c_res[2]) == canon(py_res[2]), (path, num)
            assert c_res[:2] == py_res[:2], (path, num)
            checked += 1
        assert checked > 50, path


def test_differential_object_parser_synthetic():
    """Object-grammar soup: C parse vs Python parse on adversarial bodies
    (refs, signed gens, nested dicts, junk keys, hex, comments, escapes)."""
    from oxidizepdf_spark.kernel import reader as R
    from oxidizepdf_spark.kernel.objects import Lexer, parse_object

    bodies = [
        b"<< /A 5 0 R /B [1 2 3] /C (s\\(t) /D <4142> /E true /F null >>",
        b"[1 +2 -3 4.5 .5 5. /N (x) <0A> [nested [deep]] <<>>]",
        b"<< /K 5 +3 R /L 5 -3 R /M 5 3 Robj >>",
        b"<< 5 /Junk (skip) /Real 7 >>",
        b"<< /A % comment\n 5 >>",
        b"5 3 R",
        b"<< /Empty <> /Odd <414> >>",
        b"(with (nested) parens \\053)",
        b"<< /N [0 0 R 1 65535 R] >>",
        b"true", b"false", b"null", b"-0 3 R",
        b"<</A<</B<</C 1>>>>>>",
    ]
    for body in bodies:
        blob = b"7 0 obj " + body + b" endobj"
        c_raw = R._CPARSE(blob, 0) if R._CPARSE else None
        lexer = Lexer(blob, 0)
        lexer.next_token(); lexer.next_token(); lexer.next_token()
        try:
            py_val = parse_object(lexer)
            py_err = None
        except Exception as e:
            py_val, py_err = None, type(e).__name__
        if c_raw is None:
            continue  # bail → Python authoritative
        assert py_err is None, body
        assert c_raw[0] == 7 and c_raw[1] == 0
        assert repr(c_raw[2]) == repr(py_val), body


def _frag_key(f):
    """Bit-strict fragment fingerprint (repr distinguishes -0.0 / 0.0)."""
    return (
        f.text, repr(f.x), repr(f.y), repr(f.width), repr(f.height),
        repr(f.font_size), f.font_name, f.is_bold, f.is_italic, f.color,
        f.mcid, f.struct_tag,
    )


def test_differential_layout_fragments():
    """Layout-mode C path vs pure-Python: raw emitted fragments, the
    layout-processed fragments, page text, and final state must all
    match field-for-field — including ActualText absorption, artifact
    suppression, marked-content tags, scaled CTMs, and negative-zero
    origins (the fast-show identity shortcut would flip -0.0 to +0.0)."""
    from oxidizepdf_spark.kernel.content import _parse_and_run_py, parse_and_run
    from oxidizepdf_spark.kernel.textstate import ExtractionOptions, Interpreter

    streams = [
        b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (ab) Tj 0 -14 Td (cd) Tj ET",
        b"BT /F1 9 Tf 14 TL (x) Tj T* (y) Tj (z) ' 2 3 (w) \" ET",
        b"q 2 0 0 2 10 10 cm BT /F1 12 Tf (s) Tj ET Q BT (t) Tj ET",
        b"BT /F1 12 Tf [ (a) -250 (b) 12.5 (c) ] TJ ET",
        b"BT /F1 12 Tf 50 Tz (wide) Tj 100 Tz (norm) Tj ET",
        b"/Artifact BMC BT /F1 10 Tf (hidden) Tj ET EMC BT (vis) Tj ET",
        b"/P << /MCID 4 >> BDC BT /F1 12 Tf (m) Tj ET EMC",
        b"BT /F1 12 Tf <4142> Tj [ <43> -100 (D) ] TJ ET",
        b"/Span << /ActualText (AT) >> BDC BT /F1 12 Tf (x) Tj "
        b"[ (y) -400 (z) ] TJ ET EMC BT (after) Tj ET",
        b"/Span << /ActualText (OUT) >> BDC /Artifact BMC BT /F1 10 Tf "
        b"(gone) Tj ET EMC EMC",
        b"BT /F1-Bold 12 Tf (b) Tj /F2-Italic 10 Tf (i) Tj ET",
        b"BT /F1 12 Tf -0 0 Td (negzero) Tj ET",
        b"q 3 0 0 3 5 5 cm BT /F1 12 Tf 2 0 0 2 10 20 Tm (sc) Tj "
        b"[ (t) -200 (u) ] TJ ET Q",
        b"BT /F1 12 Tf 1 2 3 4 5 6 Tm (skew) Tj ET",
        b"BT (dangling",
        b"BT /F1 12 Tf (one) Tj ET /P << /MCID 7 >> BDC BT (two) Tj "
        b"[ (three) -999 (four) ] TJ ET EMC",
    ]
    for reading_order in ("emission", "simple"):
        for stream in streams:
            finals = []
            for use_c in (True, False):
                opts = ExtractionOptions(
                    preserve_layout=True, reading_order=reading_order
                )
                interp = Interpreter(options=opts)
                try:
                    if use_c:
                        parse_and_run(interp, stream, {})
                    else:
                        _parse_and_run_py(interp, stream, {})
                    err = None
                except Exception as e:
                    err = f"{type(e).__name__}:{e}"
                raw = [_frag_key(f) for f in interp.fragments]
                out = interp.finalize()
                finals.append(
                    (
                        err, raw, [_frag_key(f) for f in out.fragments],
                        out.text, out.spans,
                        interp.state.text_matrix, interp.state.ctm,
                        interp._total, interp.last_x, interp.last_y,
                    )
                )
            assert finals[0] == finals[1], (reading_order, stream)


def test_differential_layout_real_fixtures():
    """Full documents through the layout path on both engines: Cold_Email
    + Higgs with preserve_layout and with reading_order='simple'."""
    import os

    from oxidizepdf_spark.kernel.extract import extract_pdf_bytes
    from oxidizepdf_spark.kernel.textstate import ExtractionOptions

    paths = [
        "/root/reference/test-pdfs/Cold_Email_Hacks.pdf",
        "/root/reference/oxidize-pdf-core/tests/fixtures/"
        "issue_272_higgs_arxiv_1207_7214.pdf",
    ]
    for p in paths:
        if not os.path.exists(p):
            continue
        data = open(p, "rb").read()
        for kwargs in (
            {"preserve_layout": True},
            {"reading_order": "simple"},
        ):
            def run():
                res = extract_pdf_bytes(
                    data, options=ExtractionOptions(**kwargs)
                )
                return (res.spans, res.n_pages, res.error, res.mode)

            got_c, got_py = _both_paths(run)
            assert got_c == got_py, (p, kwargs)


def test_differential_layout_hypothesis():
    """Adversarial token soup through both paths in layout mode —
    fragments compared bit-strict."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from oxidizepdf_spark.kernel.content import _parse_and_run_py, parse_and_run
    from oxidizepdf_spark.kernel.textstate import ExtractionOptions, Interpreter

    token = st.sampled_from(
        [b"BT", b"ET", b"Tj", b"TJ", b"Td", b"TD", b"Tm", b"Tf", b"T*",
         b"'", b'"', b"TL", b"Tz", b"q", b"Q", b"cm", b"BMC", b"BDC",
         b"EMC", b"/F1", b"/Artifact", b"/Span", b"<<", b">>",
         b"/ActualText", b"(AT)", b"(a)", b"(b c)", b"<4142>", b"[", b"]",
         b"12", b"-3.5", b".5", b"-0", b"%cmt", b"2", b"0", b"1",
         b"<4\x001>", b"(es\\(c)"]
    )

    @settings(max_examples=200, deadline=None)
    @given(st.lists(token, min_size=0, max_size=30))
    def check(tokens):
        stream = b" ".join(tokens)
        finals = []
        for use_c in (True, False):
            interp = Interpreter(
                options=ExtractionOptions(preserve_layout=True)
            )
            try:
                if use_c:
                    parse_and_run(interp, stream, {})
                else:
                    _parse_and_run_py(interp, stream, {})
                err = None
            except Exception as e:
                err = f"{type(e).__name__}:{e}"
            raw = [_frag_key(f) for f in interp.fragments]
            out = interp.finalize()
            finals.append((err, raw, out.text, out.spans, interp._total))
        assert finals[0] == finals[1], stream

    check()


def test_differential_merge_and_reconstruct_fuzz():
    """C merge_close + reconstruct_text vs the pure-Python LayoutProcessor
    bodies over randomized CFrag lists (same values mirrored into
    TextFragment for the Python run), covering hyphen merges, mcid
    boundaries, gap thresholds, and reconstruct_paragraphs tolerance."""
    import random

    from oxidizepdf_spark.kernel import content as CC
    from oxidizepdf_spark.kernel.layout import LayoutProcessor, TextFragment
    from oxidizepdf_spark.kernel.textstate import ExtractionOptions

    ck = CC._CSCAN
    rng = random.Random(20260817)
    texts = ["a", "bc", "word-", "x y", "", "-", "Zz", "kern"]
    fonts = [None, "F1", "F2-Bold"]
    for trial in range(200):
        n = rng.randrange(0, 12)
        vals = []
        x = 0.0
        y = 700.0
        for _ in range(n):
            if rng.random() < 0.3:
                y -= rng.choice([0.0, 0.4, 1.2, 14.0])
            if rng.random() < 0.5:
                x += rng.choice([-2.0, 0.0, 1.0, 2.5, 8.0, 40.0])
            w = rng.choice([4.0, 10.0, 18.0])
            fsz = rng.choice([8.0, 12.0])
            vals.append(
                (
                    rng.choice(texts), x, y, w, fsz, fsz,
                    rng.choice(fonts), False, False, None,
                    rng.choice([None, 1, 2]), rng.choice([None, "P"]),
                )
            )
            x += w
        cfrags = [ck.CFrag(*v) for v in vals]
        pyfrags = [TextFragment(*v) for v in vals]
        for recon_paras in (False, True):
            opts = ExtractionOptions(
                preserve_layout=True, reconstruct_paragraphs=recon_paras
            )
            proc = LayoutProcessor(opts)
            got_c = [
                _frag_key(f)
                for f in ck.merge_close(
                    cfrags, recon_paras, proc.space_gap_threshold
                )
            ]
            # pure-Python authority (C bails on TextFragment input)
            got_py = [_frag_key(f) for f in proc.merge_close_fragments(pyfrags)]
            assert got_c == got_py, (trial, recon_paras, vals)
            text_c = proc.reconstruct_text_from_fragments(cfrags)
            text_py = proc.reconstruct_text_from_fragments(pyfrags)
            assert text_c == text_py, (trial, recon_paras, vals)


def test_differential_reconstruct_hyphen_merge():
    """merge_hyphenated line joins through the C reconstruct path vs
    Python: a trailing hyphen at a newline boundary is trimmed and the
    lines fuse without a separator."""
    from oxidizepdf_spark.kernel import content as CC
    from oxidizepdf_spark.kernel.layout import LayoutProcessor, TextFragment
    from oxidizepdf_spark.kernel.textstate import ExtractionOptions

    ck = CC._CSCAN
    vals = [
        ("hyphen-", 100.0, 700.0, 40.0, 12.0, 12.0, "F1", False, False,
         None, None, None),
        ("ated", 72.0, 686.0, 25.0, 12.0, 12.0, "F1", False, False,
         None, None, None),
        ("next", 72.0, 660.0, 25.0, 12.0, 12.0, "F1", False, False,
         None, None, None),
    ]
    for merge_hyph, want in ((True, "hyphenated\nnext"), (False, "hyphen-\nated\nnext")):
        opts = ExtractionOptions(
            preserve_layout=True, merge_hyphenated=merge_hyph
        )
        proc = LayoutProcessor(opts)
        text_c = proc.reconstruct_text_from_fragments(
            [ck.CFrag(*v) for v in vals]
        )
        text_py = proc.reconstruct_text_from_fragments(
            [TextFragment(*v) for v in vals]
        )
        assert text_c == text_py == want, (merge_hyph, text_c, text_py)


def _py_html_events(html):
    from oxidizepdf_spark.kernel.html_extract import _MainContentParser

    p = _MainContentParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass
    return list(p.events), list(p.links)


def test_differential_html_corpus():
    """C html_events vs the stdlib html.parser consumer over every HTML
    document the synthetic corpus generates, plus the spans/links
    public surfaces."""
    from oxidizepdf_spark.corpus import generate_corpus
    from oxidizepdf_spark.kernel import content as CC
    from oxidizepdf_spark.kernel.html_extract import (
        extract_html_links,
        extract_html_spans,
    )

    n_html = 0
    for in_row, _ in generate_corpus(n_docs=600, seed=123):
        for s in in_row["spans"]:
            if s["kind"] != "raw_html":
                continue
            html = s["text"]
            n_html += 1
            c = CC._CSCAN.html_events(html)
            py = _py_html_events(html)
            assert c is not None, "unexpected bail on corpus HTML"
            assert (list(c[0]), list(c[1])) == py
            # and the public surfaces agree with themselves
            assert extract_html_spans(html) is not None
            assert extract_html_links(html) is not None
    assert n_html > 50  # the corpus does exercise the HTML tier


def test_differential_html_constructs():
    """Targeted html.parser constructs through both engines: CDATA
    script/style, broken tags, comments, doctype, bogus comments,
    charrefs (incl. truncated at EOF), quoted/bare/valueless attrs,
    XHTML self-closing, nested/unbalanced anchors, img variants."""
    from oxidizepdf_spark.kernel import content as CC

    docs = [
        "<p class='sidebar x'>hidden</p><p class=promo>also</p><p>kept body text here</p>",
        '<P CLASS="NAV">upper</P><DIV ID="MainFooter">f</DIV><p>body text stays</p>',
        "<a href='/a'>one</a><a href=/b>two</a><a href>three</a><a>four</a>",
        "<img src='a.png'><img src=b.png /><img><img src=''>",
        "<script>if (a < b && c > d) { x = '<p>'; }</script><p>after body</p>",
        "<style>p > a { color: red; }</style><p>styled body text</p>",
        "<script>unterminated cdata tail is dropped",
        "<sCrIpT>x</sCrIpT after junk><p>recovery body text</p>",
        "<script>a</script ><p>space before gt body</p>",
        "<p>a<br>b<hr>c</p>",
        "<!-- c1 --><!--->odd<!----><p>comment soup body text</p>",
        "<!-- unterminated comment <p>gone</p>",
        "<!DOCTYPE html PUBLIC 'x'><p>doctype body text</p>",
        "<! bogus ><p>bogus comment body</p>",
        "<?php echo '<p>'; ?><p>pi body text</p>",
        "</><p>empty endtag body</p>",
        "</ div><p>bogus end body</p>",
        "</div attr='x'><p>attr endtag body</p>",
        "<div><p>unclosed div p",
        "<p>amp & lone</p>",
        "<p>trailing entity &am",
        "<p>entity &amp reopened</p>",
        "<p>num &#65; &#x41; &#9999999; &#xZZ;</p>",
        "<p x=1 y = '2' z=\"3\" w>attrs body text</p>",
        "<p x='a>b'>quote-gt body text</p>",
        "<p x=\"unterminated>body text continues",
        "<a href='/x' href='/y'>dup href</a>",
        "<a href='/k'><b>nested <i>anchor</i> text</b></a> tail",
        "<a href='/o'>outer <a href='/i'>inner</a> rest</a>",
        "<div class='a' class='ad'>dup class ad</div><p>body text</p>",
        "<div class='read'>not-boiler body text here</div>",
        "<div class='thread'>thread body text here</div>",
        "<div class='x-ad-y'>ad hyphens</div><p>body text</p>",
        "< p>lt space body</p>",
        "<1tag>numeric body</1tag>",
        "<tag-with-dash attr>dash body text</tag-with-dash>",
        "<p%>odd name body</p%>",
        "<p/junk>slash junk body</p>",
        "<br/><input type=text /><p>void self-close body</p>",
        "<td>cell one</td><td>cell two</td>",
        "text with no tags at all, long enough to keep",
        "<p>" + "x" * 5000 + "</p>",
        "<p>tail lt <",
        "<p>tail lt2 <x",
        "<p>tail eq <x a=",
        "<p a='é café'>unicode attr body</p>",
        "<p>café unicode body text — dash</p>",
        "<div class='café ad'>unicode class ad</div><p>body</p>",
        "<p nbsp>after-name nbsp</p>",
    ]
    from oxidizepdf_spark.kernel import content as CC2

    n_bail = 0
    for d in docs:
        c = CC2._CSCAN.html_events(d)
        py = _py_html_events(d)
        if c is None:
            n_bail += 1
            continue  # bail = Python authority runs; no divergence possible
        assert (list(c[0]), list(c[1])) == py, d[:80]
    # the fast path must actually cover the overwhelming majority
    assert n_bail <= 2, f"too many bails: {n_bail}"


def test_differential_html_hypothesis():
    """Adversarial tag soup through both engines."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from oxidizepdf_spark.kernel import content as CC

    piece = st.sampled_from(
        ["<p>", "</p>", "<div class='nav'>", "</div>", "<a href='/x'>",
         "</a>", "<img src='i.png'>", "<br>", "<script>", "</script>",
         "<b", ">", "<", "&amp;", "&", "&#65;", "&nbsp;", "text body",
         " ", "longer chunk of body text", "<!", "<!--", "-->", "<?pi",
         "'", '"', "=", "/>", "</", "x=1", " class=ad ", "é",
         "<style>", "</style>", "<td>", "</ td>", ";"]
    )

    @settings(max_examples=300, deadline=None)
    @given(st.lists(piece, min_size=0, max_size=25))
    def check(pieces):
        doc = "".join(pieces)
        c = CC._CSCAN.html_events(doc)
        if c is None:
            return  # bail → Python authority
        py = _py_html_events(doc)
        assert (list(c[0]), list(c[1])) == py, doc[:120]

    check()


def test_differential_html_eq_backtrack():
    """Pinned fuzz find: sre backtracks '=+' when a quoted attr value is
    unterminated — '<a 9==\">' parses as attr ('9', '=\"') and the tag
    completes (no data event); a linear scanner that treats the value
    group as empty instead emits the raw tag text."""
    from oxidizepdf_spark.kernel import content as CC

    for doc in ('<a 9==">', '<p a=="x>y', '<p a= =">z', '<p a == "u>v'):
        c = CC._CSCAN.html_events(doc)
        assert c is not None
        assert (list(c[0]), list(c[1])) == _py_html_events(doc), doc


def test_differential_html_large_document():
    """A ~750KB realistic page and a deep unbalanced-closer pathological
    case: exact parity at scale, and the shared unwind algorithm
    terminates on both engines."""
    from oxidizepdf_spark.kernel import content as CC

    parts = [
        "<html><head><title>t</title><style>p{a:1}</style></head>"
        "<body><nav>n1 n2 n3</nav>"
    ]
    for i in range(1500):
        parts.append(
            f"<div class='art'><h2>Heading {i}</h2><p>Paragraph {i} with "
            f"body text &amp; entities, <a href='/l{i}'>a link {i}</a> and "
            f"more words to fill the block.</p><img src='im{i}.png'></div>"
        )
    parts.append("<footer>f</footer></body></html>")
    for doc in ("".join(parts), "<b>" * 1000 + "</i>" * 1000):
        c = CC._CSCAN.html_events(doc)
        assert c is not None
        assert (list(c[0]), list(c[1])) == _py_html_events(doc)


def test_differential_xref_sections():
    """C strict-stride xref parse vs the Python authority loop: crafted
    layouts, a random fuzz over section shapes, and both real fixtures'
    actual tables (Cold_Email is traditional-xref)."""
    import os
    import random

    from oxidizepdf_spark.kernel import content as CC
    from oxidizepdf_spark.kernel import xref as X

    def both(data, offset=0):
        try:
            got_c = X._parse_traditional_section(data, offset)
        except Exception as e:
            got_c = ("ERR", type(e).__name__)
        saved = CC._CSCAN
        CC._CSCAN = None
        try:
            got_py = X._parse_traditional_section(data, offset)
        except Exception as e:
            got_py = ("ERR", type(e).__name__)
        finally:
            CC._CSCAN = saved
        assert got_c == got_py, data[:120]

    crafted = [
        b"xref\n0 2\n0000000000 65535 f \n0000000017 00005 n \ntrailer << /Size 2 >>",
        b"  xref\r\n0 1\r\n0000000000 65535 f\r\n3 2\r\n0000000100 00000 n\r\n0000000200 00000 n\r\ntrailer<</Size 5>>",
        b"xref\n0 0\ntrailer << /Size 0 >>",
        b"xref\n0 1\n0000000000 65535 f \n",
        b"xref\n0 2\n0 65535 f\n17 5 n\ntrailer<<>>",
        b"xref\n0 3\n0000000000 65535 f \n0000000017 00005 n \n",
        b"noxref here",
        b"% c\nxref\n0 1\n0000000000 65535 f \ntrailer<<>>",
        b"xref\n5 1\n0000000042 00007 n \n5 1\n0000000099 00001 n \ntrailer<<>>",
        b"xref\n0 1\n0000000000 65535 x \ntrailer<<>>",
        b"xref 0 1 0000000000 65535 n trailer<<>>",
        b"xref\n0 1\n0000000000 65535 n\ttrailer<<>>",
        b"xref",
        b"xrefx\n0 1\n0000000000 65535 n \n",
    ]
    for c in crafted:
        both(c)

    rng = random.Random(11)
    for _ in range(300):
        parts = [rng.choice([b"xref", b"xref ", b" xref", b"XREF", b"xr"])]
        for _s in range(rng.randrange(0, 3)):
            start = rng.randrange(0, 50)
            cnt = rng.randrange(0, 5)
            parts.append(
                b"\n%d %d\n" % (start, cnt)
                if rng.random() < 0.8
                else b" %d  %d " % (start, cnt)
            )
            for i in range(cnt):
                if rng.random() < 0.7:
                    parts.append(b"%010d %05d %c \n" % (
                        rng.randrange(0, 10**9), rng.randrange(0, 65536),
                        rng.choice(b"nf")))
                else:
                    parts.append(b"%d %d %c\n" % (
                        rng.randrange(0, 10**9), rng.randrange(0, 65536),
                        rng.choice(b"nf")))
        parts.append(rng.choice([b"trailer << /Size 9 >>", b"", b"garbage"]))
        both(b"".join(parts))

    p = "/root/reference/test-pdfs/Cold_Email_Hacks.pdf"
    if os.path.exists(p):
        data = open(p, "rb").read()
        from oxidizepdf_spark.kernel.xref import find_xref_offset

        off = find_xref_offset(data)
        if off is not None and data[off:off + 4] == b"xref":
            both(data, off)

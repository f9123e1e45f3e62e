"""Classic Type 1 (FontFile) metric read-back (kernel/type1.py +
fonts.py FontFile wiring).

BEYOND the reference (text/ttf_parser.rs is dead code; nothing there
opens FontFile). Fonts are built by construction: cleartext header,
eexec-encrypted private portion (binary and ASCII-hex forms, PFB
segmenting), /CharStrings entries with hsbw/sbw/div-leading widths,
lenIV overrides, and alternate RD/ND operator names.
"""

from __future__ import annotations

import binascii
import struct

import pytest

from oxidizepdf_spark.kernel import type1 as T1
from oxidizepdf_spark.kernel.type1 import (
    Type1Error,
    parse_type1_metrics,
)


def _t1num(v: int) -> bytes:
    if -107 <= v <= 107:
        return bytes([v + 139])
    if 108 <= v <= 1131:
        v -= 108
        return bytes([247 + (v >> 8), v & 0xFF])
    if -1131 <= v <= -108:
        v = -v - 108
        return bytes([251 + (v >> 8), v & 0xFF])
    return b"\xff" + struct.pack(">i", v)


def build_test_type1(glyphs, leniv=4, hex_form=False, pfb=False,
                     sbw=False, div=False, rd=b"RD", nd=b"ND",
                     matrix=b"0.001 0 0 0.001 0 0") -> bytes:
    """Minimal-but-real Type 1 program: the encrypted portion uses the
    module's own symmetric eexec/charstring ciphers (§7.2/§7.3)."""
    clear = (b"%!PS-AdobeFont-1.0: TestT1 001.001\n"
             b"11 dict begin\n"
             b"/FontName /TestT1 def\n"
             b"/FontMatrix [" + matrix + b"] def\n"
             b"/FontType 1 def\n"
             b"/Encoding StandardEncoding def\n"
             b"currentdict end\n"
             b"currentfile eexec\n")
    entries = []
    for name, w in glyphs:
        if div:
            # 0 (2w) 2 div hsbw endchar — leading arithmetic folds
            cs = (_t1num(0) + _t1num(w * 2) + _t1num(2)
                  + b"\x0c\x0c" + b"\x0d" + b"\x0e")
        elif sbw:
            cs = (_t1num(0) + _t1num(0) + _t1num(w) + _t1num(0)
                  + b"\x0c\x07" + b"\x0e")
        else:
            cs = _t1num(0) + _t1num(w) + b"\x0d" + b"\x0e"
        enc_cs = T1._encrypt(cs, T1._CS_R, pad=leniv)
        entries.append(b"/" + name.encode("latin-1")
                       + b" %d " % len(enc_cs) + rd + b" " + enc_cs
                       + b" " + nd + b"\n")
    priv = (b"dup /Private 8 dict dup begin\n"
            + (b"/lenIV %d def\n" % leniv if leniv != 4 else b"")
            + b"/BlueValues [] def\nend\n"
            b"/CharStrings %d dict dup begin\n" % len(glyphs)
            + b"".join(entries)
            + b"end\nend\nmark currentfile closefile\n")
    enc = T1._encrypt(priv, T1._EEXEC_R, pad=4)
    if hex_form:
        hx = binascii.hexlify(enc)
        enc = b"\n".join(hx[i:i + 64] for i in range(0, len(hx), 64))
    trailer = (b"\n" + (b"0" * 64 + b"\n") * 8 + b"cleartomark\n")
    if not pfb:
        return clear + enc + trailer
    def seg(t, payload):
        return bytes([0x80, t]) + struct.pack("<I", len(payload)) + payload
    return (seg(1, clear) + seg(2, enc) + seg(1, trailer)
            + bytes([0x80, 3]))


GLYPHS = [("l", 250), ("i", 125), ("n", 500), ("e", 450), ("space", 300)]


def test_widths_roundtrip():
    m = parse_type1_metrics(build_test_type1(GLYPHS))
    assert m.width_1000_for_char(ord("l")) == 250.0
    assert m.width_1000_for_char(ord("i")) == 125.0
    assert m.width_1000_for_char(ord(" ")) == 300.0
    assert m.width_1000_for_char(ord("Q")) is None
    assert m.num_glyphs == len(GLYPHS)


@pytest.mark.parametrize("kw", [
    {"sbw": True}, {"div": True}, {"leniv": 0}, {"leniv": 7},
    {"hex_form": True}, {"pfb": True}, {"rd": b"-|", "nd": b"|-"},
])
def test_variant_forms(kw):
    m = parse_type1_metrics(build_test_type1(GLYPHS, **kw))
    assert m.width_1000_for_char(ord("l")) == 250.0
    assert m.width_1000_for_char(ord("e")) == 450.0


def test_font_matrix_scales():
    # a /FontMatrix of 1/2048 (TrueType-flavoured Type 1) rescales the
    # charstring-space advances into 1000-unit text space
    m = parse_type1_metrics(build_test_type1(
        [("l", 512)], matrix=b"0.00048828125 0 0 0.00048828125 0 0"))
    assert m.width_1000_for_char(ord("l")) == 250.0


def test_big_and_negative_numbers():
    m = parse_type1_metrics(build_test_type1(
        [("a", 2000), ("b", 70000), ("c", 108), ("d", 1131)]))
    assert m.width_1000_for_name("a") == 2000.0
    assert m.width_1000_for_name("b") == 70000.0
    assert m.width_1000_for_name("c") == 108.0
    assert m.width_1000_for_name("d") == 1131.0


def test_garbage_raises():
    for bad in (b"", b"\x00\x01\x02", b"%!PS no eexec here",
                b"OTTO\x00\x01\x00\x00", b"\x01\x00\x04\x02"):
        with pytest.raises(Type1Error):
            parse_type1_metrics(bad)


def test_fuzz_never_escapes_type1error():
    import random

    rng = random.Random(31)
    base = bytearray(build_test_type1(GLYPHS))
    for _ in range(300):
        mutated = bytearray(base)
        op = rng.randrange(3)
        if op == 0:
            mutated = mutated[: rng.randrange(2, len(mutated))]
        elif op == 1:
            for _ in range(rng.randrange(1, 8)):
                mutated[rng.randrange(len(mutated))] = rng.randrange(256)
        else:
            at = rng.randrange(len(mutated))
            mutated[at:at] = bytes(rng.randrange(256)
                                   for _ in range(rng.randrange(1, 12)))
        try:
            parse_type1_metrics(bytes(mutated))
        except Type1Error:
            pass


def test_fontfile_wiring():
    # end-to-end: a simple font whose ONLY width source is the embedded
    # classic Type 1 program (no /Widths, not a Standard-14 name)
    from oxidizepdf_spark.corpus import (
        _stream_obj,
        build_pdf_with_content_stream,
    )
    from oxidizepdf_spark.kernel.fonts import extract_page_fonts
    from oxidizepdf_spark.kernel.pages import flatten_page_tree
    from oxidizepdf_spark.kernel.reader import PdfReader

    t1 = build_test_type1(GLYPHS)
    font = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Custom-T1 "
        b"/Encoding /WinAnsiEncoding /FontDescriptor 8 0 R >>"
    )
    desc = (
        b"<< /Type /FontDescriptor /FontName /Custom-T1 /Flags 32 "
        b"/MissingWidth 777 /FontFile 9 0 R >>"
    )
    pdf = build_pdf_with_content_stream(
        b"BT /F1 12 Tf 100 700 Td (line) Tj ET", font_obj=font,
        extra_objects={
            8: desc,
            9: _stream_obj(b"/Length1 100 /Length2 200 /Length3 0", t1),
        },
    )
    reader = PdfReader(pdf)
    page = flatten_page_tree(reader)[0]
    info = extract_page_fonts(page.resources, reader)["F1"]
    assert info.widths is not None
    assert info.widths[ord("l")] == 250.0
    assert info.widths[ord("i")] == 125.0
    assert info.widths[ord(" ")] == 300.0
    assert info.widths[ord("Q")] == 777.0  # unmapped -> /MissingWidth


def test_type1_widths_drive_space_synthesis():
    # the read-back advances feed fragment positions: a wide glyph at
    # a small Td gap synthesizes no space; the same gap after a narrow
    # glyph does (mirrors the CFF test both ways)
    from oxidizepdf_spark.corpus import (
        _stream_obj,
        build_pdf_with_content_stream,
    )
    from oxidizepdf_spark.kernel.extract import extract_pdf_bytes

    for w, expect in ((900, "AB"), (100, "A B")):
        t1 = build_test_type1([("A", w), ("B", 400)])
        font = (
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Custom-T1 "
            b"/Encoding /WinAnsiEncoding /FontDescriptor 8 0 R >>"
        )
        desc = (
            b"<< /Type /FontDescriptor /FontName /Custom-T1 "
            b"/Flags 32 /FontFile 9 0 R >>"
        )
        pdf = build_pdf_with_content_stream(
            b"BT /F1 10 Tf 100 700 Td (A) Tj 11 0 Td (B) Tj ET",
            font_obj=font,
            extra_objects={8: desc, 9: _stream_obj(b"", t1)},
        )
        text = "\n".join(extract_pdf_bytes(pdf).page_texts)
        assert expect in text.replace("\n", " "), (w, text)

"""CFF / Type1C metric read-back (kernel/cff.py + fonts.py FontFile3).

BEYOND the reference (nothing there opens FontFile3). CFF programs are
built by construction: header, INDEXes, Top/Private DICTs, format-0
charset, Type 2 charstrings with/without the leading width operand,
width hidden behind a local subr call (the hint-subr shape), and the
defaultWidthX path.
"""

from __future__ import annotations

import struct

import pytest

from oxidizepdf_spark.kernel.cff import (
    CffError,
    _STD_STRINGS,
    parse_cff_metrics,
)


def _dnum(v: int) -> bytes:  # DICT operand, fixed 5-byte form
    return bytes([29]) + struct.pack(">i", v)


def _cnum(v: int) -> bytes:  # charstring operand, 3-byte s16 form
    return bytes([28]) + struct.pack(">h", v)


def _index(objs: list[bytes]) -> bytes:
    if not objs:
        return struct.pack(">H", 0)
    out = struct.pack(">H", len(objs)) + bytes([2])
    off = 1
    offs = [off]
    for o in objs:
        off += len(o)
        offs.append(off)
    out += b"".join(struct.pack(">H", o) for o in offs)
    return out + b"".join(objs)


def build_test_cff(glyphs: list[tuple[str, int | None]],
                   default_width: int = 555, nominal_width: int = 100,
                   via_subr: bool = False) -> bytes:
    """``glyphs``: (standard glyph name, width-or-None) per GID 1..;
    None = omit the width operand (decoder must use defaultWidthX).
    ``via_subr``: push the width, then reach the moveto through a local
    subr (hint-subr shape) — the scanner must follow the call."""
    header = bytes([1, 0, 4, 2])
    name_index = _index([b"TestCFF"])
    string_index = _index([])
    gsubr_index = _index([])

    charstrings = [bytes([14])]  # .notdef: bare endchar
    subrs = []
    for _, wd in glyphs:
        if via_subr:
            # width (if any) + subr index (bias 107 -> push -107 for 0)
            body = (_cnum(wd - nominal_width) if wd is not None else b"")
            body += _cnum(-107) + bytes([10])  # callsubr
            charstrings.append(body)
        else:
            body = (_cnum(wd - nominal_width) if wd is not None else b"")
            body += _cnum(0) + _cnum(0) + bytes([21])  # rmoveto
            body += bytes([14])  # endchar
            charstrings.append(body)
    if via_subr:
        subrs = [_cnum(0) + _cnum(0) + bytes([21, 14])]
    cs_index = _index(charstrings)

    charset = bytes([0]) + b"".join(
        struct.pack(">H", _STD_STRINGS.index(nm)) for nm, _ in glyphs)

    private = (
        _dnum(default_width) + bytes([20]) +
        _dnum(nominal_width) + bytes([21]) +
        (_dnum(0) + bytes([19]) if via_subr else b"")  # Subrs follow
    )
    # private DICT Subrs offset is relative to the private dict start:
    # place local subrs right after, offset = len(private)
    if via_subr:
        private = (
            _dnum(default_width) + bytes([20]) +
            _dnum(nominal_width) + bytes([21]) +
            _dnum(0) + bytes([19])
        )
        private = private[:-6] + _dnum(len(private)) + bytes([19])
    subr_index = _index(subrs) if via_subr else b""

    # fixed-width operands make the Top DICT size independent of values
    top = (_dnum(0) + bytes([15]) +        # charset
           _dnum(0) + bytes([17]) +        # CharStrings
           _dnum(len(private)) + _dnum(0) + bytes([18]))  # Private
    top_index_size = len(_index([top]))
    base = (len(header) + len(name_index) + top_index_size +
            len(string_index) + len(gsubr_index))
    charset_off = base
    cs_off = charset_off + len(charset)
    priv_off = cs_off + len(cs_index)
    top = (_dnum(charset_off) + bytes([15]) +
           _dnum(cs_off) + bytes([17]) +
           _dnum(len(private)) + _dnum(priv_off) + bytes([18]))
    return (header + name_index + _index([top]) + string_index +
            gsubr_index + charset + cs_index + private + subr_index)


def test_widths_roundtrip():
    cff = build_test_cff([("A", 600), ("B", 720), ("space", None)])
    m = parse_cff_metrics(cff)
    assert m.num_glyphs == 4
    assert m.width_1000_for_char(ord("A")) == 600.0
    assert m.width_1000_for_char(ord("B")) == 720.0
    assert m.width_1000_for_char(ord(" ")) == 555.0  # defaultWidthX
    assert m.width_1000_for_char(ord("Q")) is None


def test_width_behind_local_subr():
    cff = build_test_cff([("A", 640)], via_subr=True)
    m = parse_cff_metrics(cff)
    assert m.width_1000_for_char(ord("A")) == 640.0


def test_negative_width_delta():
    # width below nominalWidthX encodes as a negative delta
    cff = build_test_cff([("A", 40)], nominal_width=500)
    m = parse_cff_metrics(cff)
    assert m.width_1000_for_char(ord("A")) == 40.0


def test_garbage_raises_cfferror():
    with pytest.raises(CffError):
        parse_cff_metrics(b"\x02\x00\x04\x02nope")
    with pytest.raises(CffError):
        parse_cff_metrics(b"")


def test_fuzz_never_escapes_cfferror():
    import random

    rng = random.Random(9)
    base = bytearray(build_test_cff([("A", 600), ("B", 700)]))
    for _ in range(300):
        mut = bytearray(base)
        for _ in range(rng.randrange(1, 5)):
            mut[rng.randrange(len(mut))] = rng.randrange(256)
        try:
            parse_cff_metrics(bytes(mut))
        except CffError:
            pass


def test_fontfile3_wiring():
    from oxidizepdf_spark.corpus import _stream_obj, build_pdf_with_content_stream
    from oxidizepdf_spark.kernel.fonts import extract_page_fonts
    from oxidizepdf_spark.kernel.pages import flatten_page_tree
    from oxidizepdf_spark.kernel.reader import PdfReader

    cff = build_test_cff([("l", 250), ("i", 125), ("n", 500),
                          ("e", 500), ("x", 500), ("t", 500)])
    font = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Custom-CFF "
        b"/Encoding /WinAnsiEncoding /FontDescriptor 8 0 R >>"
    )
    desc = (
        b"<< /Type /FontDescriptor /FontName /Custom-CFF /Flags 32 "
        b"/MissingWidth 888 /FontFile3 9 0 R >>"
    )
    pdf = build_pdf_with_content_stream(
        b"BT /F1 12 Tf 100 700 Td (li) Tj ET", font_obj=font,
        extra_objects={
            8: desc, 9: _stream_obj(b"/Subtype /Type1C", cff)},
    )
    reader = PdfReader(pdf)
    page = flatten_page_tree(reader)[0]
    info = extract_page_fonts(page.resources, reader)["F1"]
    assert info.widths is not None
    assert info.widths[ord("l")] == 250.0
    assert info.widths[ord("i")] == 125.0
    assert info.widths[ord("Q")] == 888.0  # unmapped -> /MissingWidth

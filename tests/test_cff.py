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


# ---------------------------------------------------------------------------
# CID-keyed CFF (FDArray/FDSelect) — round 10, r9 verdict ask #5
# ---------------------------------------------------------------------------


def build_test_cid_cff(glyphs: list[tuple[int, int | None, int]],
                       fd_params: list[tuple[int, int]],
                       fdselect_fmt: int = 0) -> bytes:
    """CID-keyed CFF: ``glyphs`` = (CID, width-or-None, fd_index) per
    GID 1.. (GID 0 = CID 0 .notdef on FD 0); ``fd_params`` =
    (defaultWidthX, nominalWidthX) per FD. Widths of None omit the
    charstring width operand (decoder must use the FD's defaultWidthX).
    ``fdselect_fmt``: 0 (per-glyph bytes) or 3 (ranges)."""
    header = bytes([1, 0, 4, 2])
    name_index = _index([b"TestCIDCFF"])
    string_index = _index([])
    gsubr_index = _index([])

    charstrings = [bytes([14])]  # .notdef
    fdsel_gids = [0]
    for _, wd, fd in glyphs:
        nominal = fd_params[fd][1]
        body = (_cnum(wd - nominal) if wd is not None else b"")
        body += _cnum(0) + _cnum(0) + bytes([21, 14])  # rmoveto endchar
        charstrings.append(body)
        fdsel_gids.append(fd)
    cs_index = _index(charstrings)
    n_glyphs = len(charstrings)

    charset = bytes([0]) + b"".join(
        struct.pack(">H", cid) for cid, _, _ in glyphs)
    if fdselect_fmt == 0:
        fdselect = bytes([0]) + bytes(fdsel_gids)
    else:  # format 3: collapse into runs
        runs = []
        for g, fd in enumerate(fdsel_gids):
            if not runs or runs[-1][1] != fd:
                runs.append((g, fd))
        fdselect = bytes([3]) + struct.pack(">H", len(runs))
        for first, fd in runs:
            fdselect += struct.pack(">HB", first, fd)
        fdselect += struct.pack(">H", n_glyphs)

    privates = [
        _dnum(dw) + bytes([20]) + _dnum(nw) + bytes([21])
        for dw, nw in fd_params
    ]

    # layout: header|name|top|strings|gsubrs|charset|fdselect|
    #         cs_index|privates...|fdarray_index  (5-byte nums keep all
    # DICT sizes value-independent, so one offset pass suffices)
    fd_dict_template = _dnum(0) + _dnum(0) + bytes([18])
    fdarray_size = len(_index([fd_dict_template] * len(fd_params)))
    top_template = (
        _dnum(0) + _dnum(0) + _dnum(0) + bytes([12, 30]) +  # ROS
        _dnum(0) + bytes([15]) +          # charset
        _dnum(0) + bytes([17]) +          # CharStrings
        _dnum(0) + bytes([12, 36]) +      # FDArray
        _dnum(0) + bytes([12, 37])        # FDSelect
    )
    base = (len(header) + len(name_index) + len(_index([top_template])) +
            len(string_index) + len(gsubr_index))
    charset_off = base
    fdselect_off = charset_off + len(charset)
    cs_off = fdselect_off + len(fdselect)
    priv_offs = []
    off = cs_off + len(cs_index)
    for p in privates:
        priv_offs.append(off)
        off += len(p)
    fdarray_off = off
    fd_dicts = [
        _dnum(len(p)) + _dnum(po) + bytes([18])
        for p, po in zip(privates, priv_offs)
    ]
    top = (
        _dnum(0) + _dnum(1) + _dnum(0) + bytes([12, 30]) +
        _dnum(charset_off) + bytes([15]) +
        _dnum(cs_off) + bytes([17]) +
        _dnum(fdarray_off) + bytes([12, 36]) +
        _dnum(fdselect_off) + bytes([12, 37])
    )
    return (header + name_index + _index([top]) + string_index +
            gsubr_index + charset + fdselect + cs_index +
            b"".join(privates) + _index(fd_dicts))


@pytest.mark.parametrize("fdselect_fmt", [0, 3])
def test_cid_cff_per_fd_widths(fdselect_fmt):
    # FD 0: nominal 100, default 555; FD 1: nominal 900, default 333 —
    # the same charstring delta decodes to DIFFERENT widths per FD,
    # and omitted widths take the FD's own defaultWidthX
    cff = build_test_cid_cff(
        [(17, 800, 0), (23, 800, 1), (31, None, 0), (47, None, 1)],
        fd_params=[(555, 100), (333, 900)], fdselect_fmt=fdselect_fmt)
    m = parse_cff_metrics(cff, allow_cid=True)
    assert m.is_cid and m.num_glyphs == 5
    assert m.width_1000_for_cid(17) == 800.0
    assert m.width_1000_for_cid(23) == 800.0
    assert m.width_1000_for_cid(31) == 555.0  # FD 0 defaultWidthX
    assert m.width_1000_for_cid(47) == 333.0  # FD 1 defaultWidthX
    assert m.width_1000_for_cid(999) is None  # unmapped CID


def test_cid_cff_default_raise_is_reference_parity():
    # without allow_cid the ROS raise stands (the reference's
    # decoded-char width model can't consume per-FD widths)
    cff = build_test_cid_cff([(17, 800, 0)], fd_params=[(555, 100)])
    with pytest.raises(CffError, match="CID-keyed"):
        parse_cff_metrics(cff)


_CID_TOUNICODE = b"""begincmap
1 begincodespacerange
<0000> <FFFF>
endcodespacerange
2 beginbfchar
<0011> <0041>
<0017> <0042>
endbfchar
endcmap"""


def _cid_pdf(content: bytes) -> bytes:
    from oxidizepdf_spark.corpus import _stream_obj, build_pdf_with_content_stream

    cff = build_test_cid_cff(
        [(0x11, 800, 0), (0x17, 760, 1)],
        fd_params=[(555, 100), (333, 900)])
    font = (
        b"<< /Type /Font /Subtype /Type0 /BaseFont /Test-CID "
        b"/Encoding /Identity-H /DescendantFonts [7 0 R] "
        b"/ToUnicode 8 0 R >>"
    )
    desc_font = (
        b"<< /Type /Font /Subtype /CIDFontType0 /BaseFont /Test-CID "
        b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
        b"/Supplement 0 >> /DW 444 /FontDescriptor 9 0 R >>"
    )
    descriptor = (
        b"<< /Type /FontDescriptor /FontName /Test-CID /Flags 4 "
        b"/FontFile3 10 0 R >>"
    )
    return build_pdf_with_content_stream(
        content, font_obj=font,
        extra_objects={
            7: desc_font,
            8: _stream_obj(b"", _CID_TOUNICODE),
            9: descriptor,
            10: _stream_obj(b"/Subtype /CIDFontType0C", cff),
        },
    )


def test_cid_cff_fontinfo_wiring():
    from oxidizepdf_spark.kernel.fonts import extract_page_fonts
    from oxidizepdf_spark.kernel.pages import flatten_page_tree
    from oxidizepdf_spark.kernel.reader import PdfReader

    reader = PdfReader(_cid_pdf(b"BT /F1 10 Tf 100 700 Td <0011> Tj ET"))
    page = flatten_page_tree(reader)[0]
    info = extract_page_fonts(page.resources, reader)["F1"]
    desc = info.descendant_font
    assert desc is not None and desc.cid_widths is not None
    assert desc.cid_widths[0x11] == 800.0
    assert desc.cid_widths[0x17] == 760.0
    assert desc.cid_default_width == 444.0  # /DW


def test_cid_cff_widths_drive_space_synthesis_both_ways():
    """The CID advances feed W4 space synthesis: CID 0x11 is 800/1000
    wide (8pt at size 10), so a 9pt Td move leaves a 1pt gap (< 0.3em
    threshold, NO space) while a 12pt move leaves 4pt (space). Under
    the reference's 0.5em fallback the first case would read 4pt and
    synthesize a spurious space — pinning that the embedded width is
    actually used."""
    from oxidizepdf_spark.kernel.extract import extract_pdf_bytes

    near = extract_pdf_bytes(_cid_pdf(
        b"BT /F1 10 Tf 100 700 Td <0011> Tj 9 0 Td <0017> Tj ET"))
    assert near.page_texts == ["AB"]
    far = extract_pdf_bytes(_cid_pdf(
        b"BT /F1 10 Tf 100 700 Td <0011> Tj 12 0 Td <0017> Tj ET"))
    assert far.page_texts == ["A B"]


def test_cid_cff_unmapped_cid_uses_dw():
    from oxidizepdf_spark.kernel.fonts import (
        calculate_text_width_from_codes,
        extract_page_fonts,
    )
    from oxidizepdf_spark.kernel.pages import flatten_page_tree
    from oxidizepdf_spark.kernel.reader import PdfReader

    reader = PdfReader(_cid_pdf(b"BT /F1 10 Tf 100 700 Td <0011> Tj ET"))
    page = flatten_page_tree(reader)[0]
    info = extract_page_fonts(page.resources, reader)["F1"]
    # CID 0x99 has no glyph: /DW 444 applies
    w = calculate_text_width_from_codes(b"\x00\x99", "?", 10.0, info)
    assert w == pytest.approx(4.44)
    # mapped CIDs: 800 + 760 -> 15.6pt at size 10
    w2 = calculate_text_width_from_codes(b"\x00\x11\x00\x17", "AB", 10.0, info)
    assert w2 == pytest.approx(15.6)

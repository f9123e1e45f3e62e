"""Deterministic synthetic-PDF fixture and corpus generation.

Python port of the reference's test builders (byte layout matched so the
structural parse path is exercised identically):

- 5-object skeleton: oxidize-pdf-core/tests/common/synthetic_pdf.rs:23-71
- generic assembler:  tests/common/pdf_assembler.rs:20-66
- case matrix:        FIXTURES.md §3 (C01-C20) and §4 (X01-X16), derived from
  the reference's own test assertions (extraction_tj_implicit_space_test.rs,
  extraction_artifact_test.rs, issue_341_xref_stream_double_decode_test.rs, …)

Everything is seeded/deterministic — no wall-clock, no external data.
"""

from __future__ import annotations

import base64
import random
import zlib

# ---------------------------------------------------------------------------
# builders
# ---------------------------------------------------------------------------

BINARY_MARKER = b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n"


def build_pdf_with_content_stream(
    content: bytes,
    content_filter: str | None = None,
    extra_objects: dict[int, bytes] | None = None,
    page_extra: str = "",
    font_obj: bytes | None = None,
    indirect_length: bool = False,
    length_delta: int = 0,
    info: dict[str, str] | None = None,
    xmp: dict[str, str] | None = None,
    page_labels_nums: bytes | None = None,
    page_dict_extra: str = "",
    catalog_extra: str = "",
) -> bytes:
    """Minimal 1-page PDF, /F1 Helvetica, classic xref
    (synthetic_pdf.rs:23-71 layout).

    ``content_filter``: encode the content stream with a named filter chain
    ('FlateDecode' | 'ASCIIHexDecode' | 'LZWDecode' | 'AHx+Fl').
    ``extra_objects``: {obj_num: body_bytes} appended before the xref
    (e.g. image XObjects); page_extra is spliced into the page dict
    (e.g. ``/XObject << /Im1 6 0 R >>`` inside /Resources needs page_extra).
    ``indirect_length``: /Length as ``7 0 R`` with object 7 = the int.
    ``length_delta``: corrupt the declared /Length by this much (X11).
    ``info``: document-information dictionary (Title/Author/...), written
    as object 20 and referenced from the trailer /Info key.
    ``xmp``: metadata written as an uncompressed XMP packet stream
    (object 21, catalog /Metadata) with dc:/pdf:/xmp: tags — keys
    title/author/subject/producer/creator.
    """
    extra_objects = dict(extra_objects or {})
    encoded, filter_clause = _encode_content(content, content_filter)

    out = bytearray()
    offsets: dict[int, int] = {}
    out += BINARY_MARKER

    def obj(num: int, body: bytes) -> None:
        offsets[num] = len(out)
        out.extend(b"%d 0 obj\n" % num)
        out.extend(body)
        if not body.endswith(b"\n"):
            out.extend(b"\n")
        out.extend(b"endobj\n")

    catalog = b"<< /Type /Catalog /Pages 2 0 R"
    if xmp:
        catalog += b" /Metadata 21 0 R"
    if page_labels_nums is not None:
        # §12.4.2 number tree, flat form: /PageLabels << /Nums [...] >>
        catalog += b" /PageLabels << /Nums [" + page_labels_nums + b"] >>"
    if catalog_extra:
        catalog += b" " + catalog_extra.encode("latin-1")
    obj(1, catalog + b" >>")
    obj(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    resources = b"<< /Font << /F1 4 0 R >> " + page_extra.encode("latin-1") + b">>"
    obj(
        3,
        b"<< /Type /Page /Parent 2 0 R /Resources "
        + resources
        + b" /Contents 5 0 R /MediaBox [0 0 612 792]"
        + page_dict_extra.encode("latin-1")
        + b" >>",
    )
    obj(4, font_obj or b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    declared_len = len(encoded) + length_delta
    length_entry = b"7 0 R" if indirect_length else b"%d" % declared_len
    offsets[5] = len(out)
    out.extend(b"5 0 obj\n<< /Length " + length_entry + filter_clause + b" >>\nstream\n")
    out.extend(encoded)
    out.extend(b"\nendstream\nendobj\n")
    if indirect_length:
        obj(7, b"%d" % declared_len)
    for num, body in sorted(extra_objects.items()):
        obj(num, body)
    if info:
        body = b"<< " + b" ".join(
            b"/%s (%s)" % (k.encode("latin-1"), escape_pdf_string(v))
            for k, v in sorted(info.items())
        ) + b" >>"
        obj(20, body)
    if xmp:
        obj(21, _stream_obj(b"/Type /Metadata /Subtype /XML", _xmp_packet(xmp)))

    max_obj = max(
        [5]
        + ([7] if indirect_length else [])
        + ([20] if info else [])
        + ([21] if xmp else [])
        + list(extra_objects)
    )
    xref_off = len(out)
    out.extend(b"xref\n0 %d\n" % (max_obj + 1))
    out.extend(b"0000000000 65535 f \n")
    for num in range(1, max_obj + 1):
        off = offsets.get(num, 0)
        kind = b"n" if num in offsets else b"f"
        out.extend(b"%010d 00000 %s \n" % (off, kind))
    info_entry = b" /Info 20 0 R" if info else b""
    out.extend(
        b"trailer\n<< /Size %d /Root 1 0 R%s >>\nstartxref\n%d\n%%%%EOF\n"
        % (max_obj + 1, info_entry, xref_off)
    )
    return bytes(out)


def _encode_content(content: bytes, content_filter: str | None) -> tuple[bytes, bytes]:
    if content_filter is None:
        return content, b""
    if content_filter == "FlateDecode":
        return zlib.compress(content), b" /Filter /FlateDecode"
    if content_filter == "ASCIIHexDecode":
        return content.hex().encode() + b">", b" /Filter /ASCIIHexDecode"
    if content_filter == "LZWDecode":
        return lzw_encode(content), b" /Filter /LZWDecode"
    if content_filter == "AHx+Fl":
        return (
            zlib.compress(content).hex().encode() + b">",
            b" /Filter [/ASCIIHexDecode /FlateDecode]",
        )
    if content_filter == "Crypt+Fl":
        # Crypt /Identity heads the chain (ISO 32000-1 §7.4.10 requires
        # the Crypt filter first) — a pass-through the reader must honor
        return (
            zlib.compress(content),
            b" /Filter [/Crypt /FlateDecode] /DecodeParms "
            b"[<< /Type /CryptFilterDecodeParms /Name /Identity >> null]",
        )
    raise ValueError(content_filter)


def lzw_encode(data: bytes, early_change: int = 1) -> bytes:
    """PDF-flavor LZW encoder (fixture-side only; decode parity is the
    kernel's decode_lzw)."""
    CLEAR, EOD = 256, 257
    dict_: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    out_bits: list[tuple[int, int]] = [(CLEAR, width)]
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in dict_:
            w = wc
        else:
            out_bits.append((dict_[w], width))
            dict_[wc] = next_code
            next_code += 1
            if next_code + early_change - 1 >= (1 << width) and width < 12:
                width += 1
            w = bytes([ch])
    if w:
        out_bits.append((dict_[w], width))
    out_bits.append((EOD, width))
    buf = 0
    nbits = 0
    out = bytearray()
    for code, wd in out_bits:
        buf = (buf << wd) | code
        nbits += wd
        while nbits >= 8:
            out.append((buf >> (nbits - 8)) & 0xFF)
            nbits -= 8
    if nbits:
        out.append((buf << (8 - nbits)) & 0xFF)
    return bytes(out)


def assemble_pdf(objects: dict[int, bytes], root: int = 1) -> bytes:
    """Generic assembler (pdf_assembler.rs:20-66): bodies between
    ``N 0 obj``/``endobj``, classic xref, /Root from ``root``."""
    out = bytearray(BINARY_MARKER)
    offsets: dict[int, int] = {}
    for num in sorted(objects):
        offsets[num] = len(out)
        out.extend(b"%d 0 obj\n" % num)
        out.extend(objects[num])
        if not objects[num].endswith(b"\n"):
            out.extend(b"\n")
        out.extend(b"endobj\n")
    max_obj = max(objects)
    xref_off = len(out)
    out.extend(b"xref\n0 %d\n0000000000 65535 f \n" % (max_obj + 1))
    for num in range(1, max_obj + 1):
        out.extend(
            b"%010d 00000 %s \n"
            % (offsets.get(num, 0), b"n" if num in offsets else b"f")
        )
    out.extend(
        b"trailer\n<< /Size %d /Root %d 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (max_obj + 1, root, xref_off)
    )
    return bytes(out)


def _stream_obj(dict_body: bytes, data: bytes) -> bytes:
    return (
        b"<< /Length %d %s >>\nstream\n" % (len(data), dict_body)
        + data
        + b"\nendstream"
    )


def build_pdf_xref_stream(content: bytes, use_objstm: bool = False) -> bytes:
    """PDF 1.5 file with a /Type /XRef stream (X06), optionally with the
    non-stream objects packed into a /Type /ObjStm container (X07).

    XRef stream uses /W [1 2 1] with FlateDecode + /Predictor 12 /Columns 4
    (the issue #341 shape, xref_stream.rs:61-221)."""
    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}

    bodies = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (
            b"<< /Type /Page /Parent 2 0 R /Resources << /Font << /F1 4 0 R >> >> "
            b"/Contents 5 0 R /MediaBox [0 0 612 792] >>"
        ),
        4: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    }

    def write_obj(num: int, body: bytes) -> None:
        offsets[num] = len(out)
        out.extend(b"%d 0 obj\n" % num)
        out.extend(body)
        out.extend(b"\nendobj\n")

    entries: dict[int, tuple] = {}  # num -> (type, f2, f3)
    if use_objstm:
        # objects 1-4 inside ObjStm #6; entries become type-2
        parts = []
        offs = []
        pos = 0
        for num in (1, 2, 3, 4):
            offs.append((num, pos))
            body = bodies[num]
            parts.append(body)
            pos += len(body) + 1
        header = " ".join(f"{n} {o}" for n, o in offs).encode() + b"\n"
        payload = header + b"\n".join(parts)
        compressed = zlib.compress(payload)
        write_obj(
            6,
            b"<< /Type /ObjStm /N 4 /First %d /Length %d /Filter /FlateDecode >>\nstream\n"
            % (len(header), len(compressed))
            + compressed
            + b"\nendstream",
        )
        for idx, (num, _) in enumerate(offs):
            entries[num] = (2, 6, idx)
    else:
        for num in (1, 2, 3, 4):
            write_obj(num, bodies[num])
            entries[num] = (1, offsets[num], 0)

    write_obj(5, b"<< /Length %d >>\nstream\n" % len(content) + content + b"\nendstream")
    entries[5] = (1, offsets[5], 0)
    if use_objstm:
        entries[6] = (1, offsets[6], 0)

    xref_num = 7 if use_objstm else 6
    xref_off_placeholder = len(out)
    entries[0] = (0, 0, 65535)
    entries[xref_num] = (1, xref_off_placeholder, 0)

    size = xref_num + 1
    rows = bytearray()
    for num in range(size):
        t, f2, f3 = entries.get(num, (0, 0, 0))
        rows += bytes([t]) + f2.to_bytes(2, "big") + bytes([f3 & 0xFF])
    # apply PNG Up predictor (Predictor 12, Columns 4)
    row_w = 4
    pred = bytearray()
    prev = bytes(row_w)
    for i in range(0, len(rows), row_w):
        row = rows[i : i + row_w]
        pred.append(2)  # Up
        pred += bytes((row[j] - prev[j]) & 0xFF for j in range(row_w))
        prev = row
    xref_data = zlib.compress(bytes(pred))
    xref_dict = (
        b"<< /Type /XRef /Size %d /W [1 2 1] /Index [0 %d] /Root 1 0 R "
        b"/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 4 >> "
        b"/Length %d >>" % (size, size, len(xref_data))
    )
    offsets[xref_num] = len(out)
    out.extend(b"%d 0 obj\n" % xref_num)
    out.extend(xref_dict)
    out.extend(b"\nstream\n")
    out.extend(xref_data)
    out.extend(b"\nendstream\nendobj\n")
    out.extend(b"startxref\n%d\n%%%%EOF\n" % offsets[xref_num])
    return bytes(out)


def build_pdf_incremental_update(new_content: bytes) -> bytes:
    """X08: classic base (content 'Hello World') + appended update body that
    overrides object 5, new xref section with /Prev (xref.rs:495-574)."""
    base = build_pdf_with_content_stream(b"BT /F1 12 Tf 100 700 Td (Hello World) Tj ET")
    base_xref_off = int(base.rsplit(b"startxref\n", 1)[1].split(b"\n", 1)[0])
    out = bytearray(base)
    new_obj5_off = len(out)
    out.extend(
        b"5 0 obj\n<< /Length %d >>\nstream\n" % len(new_content)
        + new_content
        + b"\nendstream\nendobj\n"
    )
    xref_off = len(out)
    out.extend(b"xref\n0 1\n0000000000 65535 f \n5 1\n%010d 00000 n \n" % new_obj5_off)
    out.extend(
        b"trailer\n<< /Size 6 /Root 1 0 R /Prev %d >>\nstartxref\n%d\n%%%%EOF\n"
        % (base_xref_off, xref_off)
    )
    return bytes(out)


def build_pdf_multipage(page_texts: list[str], nested: bool = True) -> bytes:
    """X15: /Pages tree with an intermediate node and inherited /Resources
    declared on the root Pages (page_tree.rs:199; document.rs:486-522)."""
    objects: dict[int, bytes] = {}
    n = len(page_texts)
    page_nums = list(range(10, 10 + n))
    content_nums = list(range(10 + n, 10 + 2 * n))
    if nested and n >= 3:
        # root Pages(2) -> [page0, intermediate(3) -> [page1..]], resources on root
        kids_top = [f"{page_nums[0]} 0 R", "3 0 R"]
        objects[2] = (
            b"<< /Type /Pages /Kids [%s] /Count %d /Resources << /Font << /F1 4 0 R >> >> >>"
            % (" ".join(kids_top).encode(), n)
        )
        inner = " ".join(f"{p} 0 R" for p in page_nums[1:])
        objects[3] = b"<< /Type /Pages /Parent 2 0 R /Kids [%s] /Count %d >>" % (
            inner.encode(),
            n - 1,
        )
        parents = [2] + [3] * (n - 1)
    else:
        kids = " ".join(f"{p} 0 R" for p in page_nums)
        objects[2] = (
            b"<< /Type /Pages /Kids [%s] /Count %d /Resources << /Font << /F1 4 0 R >> >> >>"
            % (kids.encode(), n)
        )
        parents = [2] * n
    objects[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objects[4] = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    for i, text in enumerate(page_texts):
        objects[page_nums[i]] = (
            b"<< /Type /Page /Parent %d 0 R /Contents %d 0 R /MediaBox [0 0 612 792] >>"
            % (parents[i], content_nums[i])
        )
        content = b"BT /F1 12 Tf 100 700 Td (%s) Tj ET" % escape_pdf_string(text)
        objects[content_nums[i]] = _stream_obj(b"", content)
    return assemble_pdf(objects)


def escape_pdf_string(text: str) -> bytes:
    """Escape for a PDF literal string; latin-1-safe payload."""
    raw = text.encode("latin-1", errors="replace")
    return raw.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")


def _xmp_packet(fields: dict[str, str]) -> bytes:
    """Minimal well-formed XMP packet (metadata/xmp.rs packet shape):
    dc:title/creator/description as rdf:li lists, pdf:Producer and
    xmp:CreatorTool as simple elements."""
    import html as _html

    def esc(v: str) -> str:
        return _html.escape(v, quote=False)

    parts = ['<?xpacket begin="\ufeff" id="W5M0MpCehiHzreSzNTczkc9d"?>',
             "<x:xmpmeta xmlns:x='adobe:ns:meta/'><rdf:RDF "
             "xmlns:rdf='http://www.w3.org/1999/02/22-rdf-syntax-ns#' "
             "xmlns:dc='http://purl.org/dc/elements/1.1/' "
             "xmlns:pdf='http://ns.adobe.com/pdf/1.3/' "
             "xmlns:xmp='http://ns.adobe.com/xap/1.0/'>"
             "<rdf:Description rdf:about=''>"]
    if "title" in fields:
        parts.append(
            f"<dc:title><rdf:Alt><rdf:li xml:lang='x-default'>"
            f"{esc(fields['title'])}</rdf:li></rdf:Alt></dc:title>"
        )
    if "author" in fields:
        parts.append(
            f"<dc:creator><rdf:Seq><rdf:li>{esc(fields['author'])}"
            f"</rdf:li></rdf:Seq></dc:creator>"
        )
    if "subject" in fields:
        parts.append(
            f"<dc:description><rdf:Alt><rdf:li xml:lang='x-default'>"
            f"{esc(fields['subject'])}</rdf:li></rdf:Alt></dc:description>"
        )
    if "producer" in fields:
        parts.append(f"<pdf:Producer>{esc(fields['producer'])}</pdf:Producer>")
    if "creator" in fields:
        parts.append(
            f"<xmp:CreatorTool>{esc(fields['creator'])}</xmp:CreatorTool>"
        )
    if "pdfaid_part" in fields:
        # PDF/A identification schema (pdfaid ns) — conformance claim
        parts[1] = parts[1].replace(
            "<rdf:Description rdf:about=''>",
            "<rdf:Description rdf:about='' "
            "xmlns:pdfaid='http://www.aiim.org/pdfa/ns/id/'>",
        )
        parts.append(f"<pdfaid:part>{esc(fields['pdfaid_part'])}</pdfaid:part>")
        if "pdfaid_conformance" in fields:
            parts.append(
                f"<pdfaid:conformance>{esc(fields['pdfaid_conformance'])}"
                f"</pdfaid:conformance>"
            )
    parts.append(
        "</rdf:Description></rdf:RDF></x:xmpmeta><?xpacket end='w'?>"
    )
    return "".join(parts).encode("utf-8")


def build_pdf_multipage_streams(page_streams: list[bytes]) -> bytes:
    """Multi-page PDF from raw per-page content streams (flat tree, shared
    /F1 Helvetica resource) — the general form of build_pdf_multipage_texts
    for builders that control positioning/font size per line."""
    objects: dict[int, bytes] = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        4: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    }
    n = len(page_streams)
    page_nums = list(range(10, 10 + n))
    content_nums = list(range(10 + n, 10 + 2 * n))
    kids = " ".join(f"{p} 0 R" for p in page_nums)
    objects[2] = (
        b"<< /Type /Pages /Kids [%s] /Count %d /Resources << /Font << /F1 4 0 R >> >> >>"
        % (kids.encode(), n)
    )
    for i, stream in enumerate(page_streams):
        objects[page_nums[i]] = (
            b"<< /Type /Page /Parent 2 0 R /Contents %d 0 R /MediaBox [0 0 612 792] >>"
            % content_nums[i]
        )
        objects[content_nums[i]] = _stream_obj(b"", stream)
    return assemble_pdf(objects)


# layout constants for build_sectioned_pdf — chosen so the A3/A4 layout
# passes reconstruct EXACTLY one paragraph element per rendered paragraph:
# body lines 20pt apart (gap 8 < 1.5*median_height 18 → merge), paragraphs
# 36pt apart (gap 24 > 18 → break), title separated 48pt (gap 36 > 27 even
# when a short page's median height is the 18pt title itself)
SECTION_TITLE_SIZE = 18
SECTION_BODY_SIZE = 12
_SECTION_LINE_STEP = 20
_SECTION_PARA_STEP = 36
_SECTION_TITLE_GAP = 48


def build_sectioned_pdf(
    sections: list[tuple[str, list[list[str]]]],
    words_per_line: int = 8,
) -> bytes:
    """Document with typed layout structure: one PAGE per section, each a
    TITLE line (18pt) followed by paragraphs of body lines (12pt). The
    vertical spacing constants above make the element segmentation
    deterministic, so oracle queries can recompute the typed elements from
    the word array alone (reference: pipeline/partition.rs font-ratio title
    classification over exactly this kind of layout).

    ``sections``: list of (title_text, [paragraph_word_lists])."""
    pages: list[bytes] = []
    for title, paragraphs in sections:
        parts = [
            b"BT /F1 %d Tf 72 720 Td (%s) Tj ET"
            % (SECTION_TITLE_SIZE, escape_pdf_string(title))
        ]
        y = 720 - _SECTION_TITLE_GAP
        for para in paragraphs:
            if not para:
                continue
            first = True
            for j in range(0, len(para), words_per_line):
                line = " ".join(para[j : j + words_per_line])
                if not first:
                    y -= _SECTION_LINE_STEP
                parts.append(
                    b"BT /F1 %d Tf 72 %d Td (%s) Tj ET"
                    % (SECTION_BODY_SIZE, y, escape_pdf_string(line))
                )
                first = False
            y -= _SECTION_PARA_STEP
        pages.append(b" ".join(parts))
    return build_pdf_multipage_streams(pages)


def build_scanned_pdf(payload: bytes, n_pages: int = 1) -> bytes:
    """'Scanned' PDF: pages with ONE full-page image XObject and no text
    operators at all — the fixture class the OCR SPI targets (text/ocr/).
    ``payload`` becomes the image's raw stream bytes (stands in for the
    encoded scan; a real corpus carries DCT/CCITT bytes here)."""
    pages = []
    extra: dict[int, bytes] = {}
    for i in range(n_pages):
        num = 30 + i
        extra[num] = (
            b"<< /Type /XObject /Subtype /Image /Width 612 /Height 792 "
            b"/ColorSpace /DeviceGray /BitsPerComponent 8 /Length %d >>\n"
            b"stream\n%s\nendstream" % (len(payload), payload)
        )
        pages.append(num)
    if n_pages != 1:
        raise NotImplementedError("single-page scanned fixture only")
    return build_pdf_with_content_stream(
        b"q 612 0 0 792 0 0 cm /Im1 Do Q",
        page_extra="/XObject << /Im1 30 0 R >>",
        extra_objects=extra,
    )


# grid geometry for build_table_pdf (oracle queries recompute cell
# positions from these constants)
TABLE_X0 = 72
TABLE_Y0 = 700
TABLE_COL_W = 160
TABLE_ROW_H = 40


def build_borderless_table_pdf(cells: list[list[str]]) -> bytes:
    """Same cell/text geometry as build_table_pdf, NO grid lines — the
    alignment-only fixture class for borderless table detection."""
    parts: list[bytes] = []
    for r, row in enumerate(cells):
        for c, text in enumerate(row):
            tx = TABLE_X0 + TABLE_COL_W * c + 8
            ty = TABLE_Y0 - TABLE_ROW_H * (r + 1) + 15
            parts.append(
                b"BT /F1 12 Tf %d %d Td (%s) Tj ET"
                % (tx, ty, escape_pdf_string(text))
            )
    return build_pdf_with_content_stream(b" ".join(parts))


def build_table_pdf(cells: list[list[str]]) -> bytes:
    """One-page PDF with a BORDERED table: stroked m/l grid lines plus one
    text run per cell (the fixture class text/table_detection.rs targets).
    ``cells`` is row-major, row 0 at the top."""
    n_rows = len(cells)
    n_cols = max(len(r) for r in cells) if cells else 0
    parts: list[bytes] = []
    x1 = TABLE_X0 + TABLE_COL_W * n_cols
    y_bot = TABLE_Y0 - TABLE_ROW_H * n_rows
    for r in range(n_rows + 1):
        y = TABLE_Y0 - TABLE_ROW_H * r
        parts.append(b"%d %d m %d %d l S" % (TABLE_X0, y, x1, y))
    for c in range(n_cols + 1):
        x = TABLE_X0 + TABLE_COL_W * c
        parts.append(b"%d %d m %d %d l S" % (x, TABLE_Y0, x, y_bot))
    for r, row in enumerate(cells):
        for c, text in enumerate(row):
            tx = TABLE_X0 + TABLE_COL_W * c + 8
            ty = TABLE_Y0 - TABLE_ROW_H * (r + 1) + 15
            parts.append(
                b"BT /F1 12 Tf %d %d Td (%s) Tj ET"
                % (tx, ty, escape_pdf_string(text))
            )
    return build_pdf_with_content_stream(b" ".join(parts))


def build_text_pdf(
    text: str,
    lines_per_page: int = 40,
    page_labels_nums: bytes | None = None,
    rotate: int | None = None,
    rotate_inherited: bool = False,
) -> bytes:
    """Build a PDF whose extraction round-trips ``text`` exactly (used by the
    documents-table oracle queries): each input line is one Tj; lines are
    placed 20pt apart (> newline_threshold 10 → '\\n' re-synthesis); pages
    of ``lines_per_page`` lines each. ``page_labels_nums``: raw /Nums array
    body for a catalog /PageLabels number tree (§12.4.2). ``rotate``: a
    /Rotate value, written on every page dict — or on the /Pages parent
    node only when ``rotate_inherited`` (the §7.7.3.4 inheritance path)."""
    lines = text.split("\n") if text else [""]
    if len(lines) <= lines_per_page:
        parts = []
        y = 720
        parts.append(b"BT /F1 12 Tf")
        first = True
        for ln in lines:
            if first:
                parts.append(b"100 %d Td (%s) Tj" % (y, escape_pdf_string(ln)))
                first = False
            else:
                parts.append(b"0 -20 Td (%s) Tj" % escape_pdf_string(ln))
        parts.append(b"ET")
        # single-page path: /Rotate always lands on the page dict (the
        # inheritance leg is exercised by the multipage builder); the
        # effective value a reader sees is identical either way
        extra = "" if rotate is None else f" /Rotate {rotate}"
        return build_pdf_with_content_stream(
            b" ".join(parts),
            page_labels_nums=page_labels_nums,
            page_dict_extra=extra,
        )
    pages = []
    for i in range(0, len(lines), lines_per_page):
        pages.append("\n".join(lines[i : i + lines_per_page]))
    return build_pdf_multipage_texts(
        pages,
        page_labels_nums=page_labels_nums,
        rotate=rotate,
        rotate_inherited=rotate_inherited,
    )


def build_pdf_multipage_texts(
    page_texts: list[str],
    page_labels_nums: bytes | None = None,
    rotate: int | None = None,
    rotate_inherited: bool = False,
) -> bytes:
    """Multi-line pages variant of build_pdf_multipage (flat tree).

    ``rotate``/``rotate_inherited``: /Rotate per page dict, or once on the
    /Pages node so pages receive it via attribute inheritance."""
    catalog = b"<< /Type /Catalog /Pages 2 0 R >>"
    if page_labels_nums is not None:
        catalog = (
            b"<< /Type /Catalog /Pages 2 0 R /PageLabels << /Nums ["
            + page_labels_nums + b"] >> >>"
        )
    objects: dict[int, bytes] = {
        1: catalog,
        4: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    }
    n = len(page_texts)
    page_nums = list(range(10, 10 + n))
    content_nums = list(range(10 + n, 10 + 2 * n))
    kids = " ".join(f"{p} 0 R" for p in page_nums)
    parent_rot = (
        b" /Rotate %d" % rotate if rotate is not None and rotate_inherited else b""
    )
    page_rot = (
        b" /Rotate %d" % rotate if rotate is not None and not rotate_inherited else b""
    )
    objects[2] = (
        b"<< /Type /Pages /Kids [%s] /Count %d%s /Resources << /Font << /F1 4 0 R >> >> >>"
        % (kids.encode(), n, parent_rot)
    )
    for i, text in enumerate(page_texts):
        objects[page_nums[i]] = (
            b"<< /Type /Page /Parent 2 0 R /Contents %d 0 R /MediaBox [0 0 612 792]%s >>"
            % (content_nums[i], page_rot)
        )
        parts = [b"BT /F1 12 Tf"]
        first = True
        for ln in text.split("\n"):
            if first:
                parts.append(b"100 720 Td (%s) Tj" % escape_pdf_string(ln))
                first = False
            else:
                parts.append(b"0 -20 Td (%s) Tj" % escape_pdf_string(ln))
        parts.append(b"ET")
        objects[content_nums[i]] = _stream_obj(b"", b" ".join(parts))
    return assemble_pdf(objects)


def build_outline_pdf(sections: list[tuple[str, list[str]]]) -> bytes:
    """One page per top-level section plus a 2-level /Outlines tree
    (structure/outline.rs:130 OutlineTree shape: /First//Last//Next//Prev
    sibling chains, /Parent back-links, /Count, /Dest [page /XYZ ...]):
    each section item Dest's its own page; its children share that page."""
    n = len(sections)
    objects: dict[int, bytes] = {
        1: b"<< /Type /Catalog /Pages 2 0 R /Outlines 20 0 R >>",
        4: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    }
    page_nums = list(range(30, 30 + n))
    content_nums = list(range(30 + n, 30 + 2 * n))
    kids = " ".join(f"{p} 0 R" for p in page_nums).encode()
    objects[2] = (
        b"<< /Type /Pages /Kids [%s] /Count %d "
        b"/Resources << /Font << /F1 4 0 R >> >> >>" % (kids, n)
    )
    item_nums: list[tuple[int, list[int]]] = []
    num = 50
    for _, subs in sections:
        top = num
        ch = list(range(num + 1, num + 1 + len(subs)))
        num += 1 + len(subs)
        item_nums.append((top, ch))
    total = sum(1 + len(ch) for _, ch in item_nums)
    objects[20] = b"<< /Type /Outlines /First %d 0 R /Last %d 0 R /Count %d >>" % (
        item_nums[0][0],
        item_nums[-1][0],
        total,
    )
    for i, ((title, subs), (top, ch)) in enumerate(zip(sections, item_nums)):
        objects[page_nums[i]] = (
            b"<< /Type /Page /Parent 2 0 R /Contents %d 0 R "
            b"/MediaBox [0 0 612 792] >>" % content_nums[i]
        )
        objects[content_nums[i]] = _stream_obj(
            b"",
            b"BT /F1 12 Tf 100 720 Td (%s) Tj ET" % escape_pdf_string(title),
        )
        # top items carry a full /XYZ (left top zoom), children a /FitH top
        # (structure/destination.rs:7-29 fit types exercised end-to-end)
        dest = b"[%d 0 R /XYZ 72 %d 1.5]" % (page_nums[i], 720 - 10 * i)
        parts = [
            b"/Title (%s)" % escape_pdf_string(title),
            b"/Parent 20 0 R",
            b"/Dest " + dest,
        ]
        if i > 0:
            parts.append(b"/Prev %d 0 R" % item_nums[i - 1][0])
        if i < n - 1:
            parts.append(b"/Next %d 0 R" % item_nums[i + 1][0])
        if ch:
            parts.append(
                b"/First %d 0 R /Last %d 0 R /Count %d"
                % (ch[0], ch[-1], len(ch))
            )
        objects[top] = b"<< " + b" ".join(parts) + b" >>"
        for j, (sub, cnum) in enumerate(zip(subs, ch)):
            # the LAST child of each section uses /FitR with a full
            # rectangle (structure/destination.rs FitR carries 4 coords;
            # top bound matches FitH's y so dest_y stays uniform);
            # earlier children keep /FitH
            if j == len(subs) - 1:
                dest_c = b"[%d 0 R /FitR 50 600 400 %d]" % (
                    page_nums[i], 700 - 10 * j,
                )
            else:
                dest_c = b"[%d 0 R /FitH %d]" % (page_nums[i], 700 - 10 * j)
            sparts = [
                b"/Title (%s)" % escape_pdf_string(sub),
                b"/Parent %d 0 R" % top,
                b"/Dest " + dest_c,
            ]
            if j > 0:
                sparts.append(b"/Prev %d 0 R" % ch[j - 1])
            if j < len(ch) - 1:
                sparts.append(b"/Next %d 0 R" % ch[j + 1])
            objects[cnum] = b"<< " + b" ".join(sparts) + b" >>"
    return assemble_pdf(objects)


def build_form_pdf(
    text_value: str, checked: bool, grp_value: str, b_value: str,
    sign: dict | None = None,
) -> bytes:
    """1-page PDF with a FILLED interactive form (forms/form_data.rs
    read-side shape): /AcroForm /Fields holds a text field f0, a checkbox
    f1 (/V as a PDF Name, /Yes or /Off), and a non-terminal parent 'grp'
    whose kid 'a' INHERITS /FT and /V from the parent while kid 'b'
    overrides /V — exercising qualified naming (grp.a) and the field
    attribute-inheritance walk.  ``sign``: kwargs for sign_pdf_objects —
    adds a signed /FT /Sig field 'Sig1' (55 0 R → /V 60 0 R) and embeds
    a real CMS signature over the assembled bytes."""
    fields = b"[50 0 R 51 0 R 52 0 R]" if sign is None else \
        b"[50 0 R 51 0 R 52 0 R 55 0 R]"
    objects: dict[int, bytes] = {
        1: (
            b"<< /Type /Catalog /Pages 2 0 R "
            b"/AcroForm << /Fields " + fields + b" >> >>"
        ),
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (
            b"<< /Type /Page /Parent 2 0 R /Contents 5 0 R "
            b"/MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 4 0 R >> >> >>"
        ),
        4: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        5: _stream_obj(b"", b"BT /F1 12 Tf 100 720 Td (form) Tj ET"),
        50: b"<< /FT /Tx /T (f0) /V (%s) >>" % escape_pdf_string(text_value),
        51: b"<< /FT /Btn /T (f1) /V /%s >>" % (b"Yes" if checked else b"Off"),
        52: (
            b"<< /T (grp) /FT /Tx /V (%s) /Kids [53 0 R 54 0 R] >>"
            % escape_pdf_string(grp_value)
        ),
        53: b"<< /T (a) /Parent 52 0 R >>",
        54: b"<< /T (b) /Parent 52 0 R /V (%s) >>" % escape_pdf_string(b_value),
    }
    if sign is not None:
        objects[55] = b"<< /FT /Sig /T (Sig1) /V 60 0 R >>"
        return sign_pdf_objects(objects, 60, **sign)
    return assemble_pdf(objects)


def build_invoice_pdf(
    vendor: str, invoice_no: str, date: str, total: str
) -> bytes:
    """1-page invoice-shaped PDF: vendor line (no colon), then colon-keyed
    fields 40pt apart so each line is its own layout fragment and the
    colon keyvalue pass sees one pair per line."""
    lines = [
        vendor,
        f"Invoice Number: {invoice_no}",
        f"Date: {date}",
        f"Total: {total}",
    ]
    parts = [b"BT /F1 12 Tf"]
    first = True
    for ln in lines:
        if first:
            parts.append(b"100 720 Td (%s) Tj" % escape_pdf_string(ln))
            first = False
        else:
            parts.append(b"0 -40 Td (%s) Tj" % escape_pdf_string(ln))
    parts.append(b"ET")
    return build_pdf_with_content_stream(b" ".join(parts))


def build_encrypted_pdf(
    text: str, method: str = "rc4-128", user_pw: bytes = b"",
    owner_pw: bytes = b"owner", p: int = -4,
    crypt_identity_content: bool = False,
) -> bytes:
    """One-page PDF encrypted with the standard security handler
    (fixture-side forward direction of kernel/crypto.py; ISO 32000 §7.6.3,
    reference: encryption_handler.rs + standard_security.rs).

    ``method``: 'rc4-40' (V1 R2) | 'rc4-128' (V2 R3) | 'aes-128' (V4 R4
    AESV2). The user password defaults to EMPTY — the class the reader
    auto-unlocks; pass a non-empty one to build refusal fixtures."""
    import hashlib

    from .kernel.crypto import (
        StandardSecurityHandler,
        aes_cbc_encrypt_nopad,
        compute_o_r2_r4,
        compute_u_r2_r4,
    )

    v, r, length = {
        "rc4-40": (1, 2, 40),
        "rc4-128": (2, 3, 128),
        "aes-128": (4, 4, 128),
    }[method]
    n = length // 8
    # default p=-4: every flag bit set except bits 1-2 (spec-reserved 0)
    file_id = hashlib.md5(b"fixture-id:" + text.encode("utf-8", "replace")).digest()
    o = compute_o_r2_r4(user_pw, user_pw, r, n) if not owner_pw else \
        compute_o_r2_r4(owner_pw, user_pw, r, n)

    enc: dict = {"V": v, "R": r, "Length": length, "O": o, "P": p}
    if v == 4:
        enc["CF"] = {"StdCF": {"CFM": "AESV2", "Length": 16}}
        enc["StmF"] = "StdCF"
        enc["StrF"] = "StdCF"
    probe = StandardSecurityHandler(enc | {"U": b"\x00" * 32}, file_id)
    key = probe._derive_key_r2_r4(user_pw)
    u = compute_u_r2_r4(key, r, file_id)
    enc["U"] = u

    handler = StandardSecurityHandler(enc, file_id)
    assert handler.try_empty_password() == (user_pw == b"")
    handler.key = key
    handler.unlocked = True

    def enc_stream(data: bytes, num: int, gen: int = 0) -> bytes:
        if v == 4:  # AESV2: IV || CBC(ciphertext), PKCS#5 pad
            okey = handler._object_key(num, gen, True)
            iv = hashlib.md5(b"iv:%d" % num).digest()
            pad = 16 - (len(data) % 16)
            return iv + aes_cbc_encrypt_nopad(okey, iv, data + bytes([pad]) * pad)
        from .kernel.crypto import rc4

        return rc4(handler._object_key(num, gen, False), data)

    lines = text.split("\n") if text else [""]
    parts = [b"BT /F1 12 Tf"]
    y = 720
    first = True
    for ln in lines:
        if first:
            parts.append(b"100 %d Td (%s) Tj" % (y, escape_pdf_string(ln)))
            first = False
        else:
            parts.append(b"0 -20 Td (%s) Tj" % escape_pdf_string(ln))
    parts.append(b"ET")
    if crypt_identity_content:
        # ISO 32000-1 §7.6.5: the content stream is marked with an
        # Identity /Crypt filter → stored IN THE CLEAR inside the
        # otherwise-encrypted document (exempt from the default StmF);
        # Flate follows in the chain so a wrongly-applied default
        # cipher is caught loudly by the inflate, not silently.
        import zlib as _zlib

        content = _zlib.compress(b" ".join(parts))
        content_dict = (
            b"<< /Length %d /Filter [/Crypt /FlateDecode]"
            b" /DecodeParms [<< /Type /CryptFilterDecodeParms"
            b" /Name /Identity >> null] >>" % len(content)
        )
    else:
        content = enc_stream(b" ".join(parts), 5)
        content_dict = b"<< /Length %d >>" % len(content)

    cf_clause = (
        b" /CF << /StdCF << /CFM /AESV2 /Length 16 >> >>"
        b" /StmF /StdCF /StrF /StdCF" if v == 4 else b""
    )
    objects = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Resources << /Font << /F1 4 0 R >> >>"
           b" /Contents 5 0 R /MediaBox [0 0 612 792] >>",
        4: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        5: content_dict + b"\nstream\n" + content + b"\nendstream",
        6: b"<< /Filter /Standard /V %d /R %d /Length %d /P %d"
           b" /O <%s> /U <%s>%s >>"
           % (v, r, length, p, o.hex().encode(), u.hex().encode(), cf_clause),
    }
    out = bytearray(BINARY_MARKER)
    offsets: dict[int, int] = {}
    for num in sorted(objects):
        offsets[num] = len(out)
        out.extend(b"%d 0 obj\n" % num)
        out.extend(objects[num])
        if not objects[num].endswith(b"\n"):
            out.extend(b"\n")
        out.extend(b"endobj\n")
    xref_off = len(out)
    out.extend(b"xref\n0 7\n0000000000 65535 f \n")
    for num in range(1, 7):
        out.extend(b"%010d 00000 n \n" % offsets[num])
    out.extend(
        b"trailer\n<< /Size 7 /Root 1 0 R /Encrypt 6 0 R"
        b" /ID [<%s> <%s>] >>\nstartxref\n%d\n%%%%EOF\n"
        % (file_id.hex().encode(), file_id.hex().encode(), xref_off)
    )
    return bytes(out)


def build_pubkey_encrypted_pdf(
    text: str, method: str = "aes-128", p: int = -4,
    junk_recipient: bool = True, length_in_cf_only: bool = False,
) -> bytes:
    """One-page PDF encrypted with the PUBLIC-KEY security handler
    (/Adobe.PubSec, ISO 32000-1 §7.6.5) for the embedded deterministic
    RSA test key — BEYOND the reference, whose reader only wires the
    standard handler (parser/encryption_handler.rs; its
    encryption/public_key.rs is never called on the read path).

    ``method``: 'rc4-128' (V2, SubFilter adbe.pkcs7.s4) | 'aes-128'
    (V4 AESV2, adbe.pkcs7.s5) | 'aes-256' (V5 AESV3, adbe.pkcs7.s5).
    ``junk_recipient`` prepends an envelope nobody can open (the
    multi-recipient walk).  ``length_in_cf_only`` drops the top-level
    /Length so the key size comes from the crypt filter's /Length (in
    bytes, §7.6.5) alone — a real-world adbe.pkcs7.s5 shape."""
    import hashlib

    from .kernel.crypto import PublicKeySecurityHandler, aes_cbc_encrypt_nopad, rc4
    from .kernel.signatures import TEST_RSA_D, TEST_RSA_N, build_recipient_envelope

    v, length, subfilter, cfm = {
        "rc4-128": (2, 128, "adbe.pkcs7.s4", None),
        "aes-128": (4, 128, "adbe.pkcs7.s5", "AESV2"),
        "aes-256": (5, 256, "adbe.pkcs7.s5", "AESV3"),
    }[method]
    seed = hashlib.sha1(b"pubsec-seed:" + text.encode("utf-8", "replace")).digest()
    blob = build_recipient_envelope(seed, p, junk_recipient=junk_recipient)
    recipients = [blob]

    enc: dict = {"Filter": "Adobe.PubSec", "SubFilter": subfilter,
                 "V": v, "Length": length, "P": p}
    if length_in_cf_only:
        if cfm is None:
            raise ValueError("length_in_cf_only needs a crypt filter")
        del enc["Length"]
    if cfm is None:
        enc["Recipients"] = recipients
    else:
        enc["CF"] = {"DefaultCryptFilter": {
            "CFM": cfm, "Length": length // 8, "Recipients": recipients}}
        enc["StmF"] = "DefaultCryptFilter"
        enc["StrF"] = "DefaultCryptFilter"
    file_id = hashlib.md5(b"pubsec-id:" + text.encode("utf-8", "replace")).digest()
    handler = PublicKeySecurityHandler(enc, file_id)
    assert handler.try_recipient_key(TEST_RSA_N, TEST_RSA_D)

    def enc_stream(data: bytes, num: int, gen: int = 0) -> bytes:
        if v == 5:  # AESV3: file key used directly
            iv = hashlib.md5(b"iv:%d" % num).digest()
            pad = 16 - (len(data) % 16)
            return iv + aes_cbc_encrypt_nopad(
                handler.key, iv, data + bytes([pad]) * pad)
        if cfm == "AESV2":
            okey = handler._object_key(num, gen, True)
            iv = hashlib.md5(b"iv:%d" % num).digest()
            pad = 16 - (len(data) % 16)
            return iv + aes_cbc_encrypt_nopad(okey, iv, data + bytes([pad]) * pad)
        return rc4(handler._object_key(num, gen, False), data)

    content = enc_stream(
        b"BT /F1 12 Tf 100 720 Td (%s) Tj ET" % escape_pdf_string(text), 5)
    if cfm is None:
        enc_clause = b" /Recipients [<%s>]" % blob.hex().encode()
    else:
        enc_clause = (
            b" /CF << /DefaultCryptFilter << /CFM /%s /Length %d"
            b" /Recipients [<%s>] >> >>"
            b" /StmF /DefaultCryptFilter /StrF /DefaultCryptFilter"
            % (cfm.encode(), length // 8, blob.hex().encode())
        )
    objects = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Resources << /Font << /F1 4 0 R >> >>"
           b" /Contents 5 0 R /MediaBox [0 0 612 792] >>",
        4: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        5: b"<< /Length %d >>\nstream\n" % len(content) + content + b"\nendstream",
        6: b"<< /Filter /Adobe.PubSec /SubFilter /%s /V %d%s /P %d%s >>"
           % (subfilter.encode(), v,
              b"" if length_in_cf_only else b" /Length %d" % length,
              p, enc_clause),
    }
    out = bytearray(BINARY_MARKER)
    offsets: dict[int, int] = {}
    for num in sorted(objects):
        offsets[num] = len(out)
        out.extend(b"%d 0 obj\n" % num)
        out.extend(objects[num])
        if not objects[num].endswith(b"\n"):
            out.extend(b"\n")
        out.extend(b"endobj\n")
    xref_off = len(out)
    out.extend(b"xref\n0 7\n0000000000 65535 f \n")
    for num in range(1, 7):
        out.extend(b"%010d 00000 n \n" % offsets[num])
    out.extend(
        b"trailer\n<< /Size 7 /Root 1 0 R /Encrypt 6 0 R"
        b" /ID [<%s> <%s>] >>\nstartxref\n%d\n%%%%EOF\n"
        % (file_id.hex().encode(), file_id.hex().encode(), xref_off)
    )
    return bytes(out)


def build_html_doc(
    text: str,
    with_image: bool = False,
    extra_links: list[tuple[str, str]] | None = None,
) -> str:
    """Wrap ``text`` (one <p> per line) in realistic boilerplate — nav,
    class-hinted sidebar, header, ad block, link farm, footer, script —
    so main-content extraction must strip everything but the paragraphs
    (north_rule: HTML boilerplate strip / DOM heuristics).
    ``extra_links``: extra in-content anchors appended after the link
    farm (for the out-link extraction fixtures); None keeps the template
    byte-identical to its pre-round-3 form."""
    paras = "\n".join(f"<p>{_esc_html(ln)}</p>" for ln in text.split("\n"))
    img = '<img src="media://img/inline1.png">' if with_image else ""
    if extra_links:
        anchors = " ".join(
            f'<a href="{href}">{_esc_html(label)}</a>'
            for href, label in extra_links
        )
        img += f"\n<p>{anchors}</p>"
    return f"""<!DOCTYPE html><html><head><title>t</title>
<script>var tracking = true;</script><style>.x{{color:red}}</style></head>
<body>
<nav><a href="/">Home</a> <a href="/a">About</a> <a href="/c">Contact</a></nav>
<header><h1>Site Title Banner</h1></header>
<div class="sidebar"><ul><li>Sponsored one</li><li>Sponsored two</li></ul></div>
<main>
{paras}
{img}
<div class="ad-banner">Great deals click here now</div>
<p><a href="1">more</a> <a href="2">links</a> <a href="3">nav</a></p>
</main>
<footer>copyright footer text here</footer>
</body></html>"""


def _esc_html(t: str) -> str:
    return t.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


# ---------------------------------------------------------------------------
# case matrix: (case_id, pdf_bytes, expected spans [(kind, text, media_ref)])
# ---------------------------------------------------------------------------

_C = b"BT /F1 12 Tf 100 700 Td (Hello World) Tj ET"  # canonical C01 content

_IMG_OBJ = (
    b"<< /Type /XObject /Subtype /Image /Width 2 /Height 2 /ColorSpace /DeviceGray "
    b"/BitsPerComponent 8 /Length 4 >>\nstream\n\x00\x01\x02\x03\nendstream"
)

_FORM_OBJ = (
    b"<< /Type /XObject /Subtype /Form /BBox [0 0 612 792] /Length %d >>\nstream\n%s\nendstream"
)


def _tounicode_font(cmap_body: bytes, type0: bool = False) -> dict[int, bytes]:
    """Font object(s) with a /ToUnicode stream as obj 8 (+ descendant 9)."""
    objs = {8: _stream_obj(b"", cmap_body)}
    if type0:
        objs[9] = (
            b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Dummy "
            b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) /Supplement 0 >> >>"
        )
    return objs


_TOUNICODE_BFCHAR = b"""/CIDInit /ProcSet findresource begin
12 dict begin
begincmap
1 begincodespacerange
<00> <FF>
endcodespacerange
2 beginbfchar
<41> <0041>
<42> <FFFD>
endbfchar
endcmap
CMapName currentdict /CMap defineresource pop
end
end"""

_TOUNICODE_BFRANGE = b"""begincmap
1 begincodespacerange
<00> <FF>
endcodespacerange
1 beginbfrange
<41> <43> <0061>
endbfrange
endcmap"""

_TOUNICODE_2BYTE = b"""begincmap
1 begincodespacerange
<0000> <FFFF>
endcodespacerange
2 beginbfchar
<0048> <0048>
<0069> <0069>
endbfchar
endcmap"""


def content_cases() -> list[tuple[str, bytes, list[tuple[str, str, str | None]]]]:
    """C01-C20 (FIXTURES.md §3): (case, content_bytes, expected spans).
    Expected text follows the reference defaults (thresholds 0.3/0.2/10.0).

    Span segmentation convention: kind='text' spans are the raw extracted-text
    slices between image-capture events, so concatenating a page's text spans
    reproduces the reference's extracted string exactly (incl. synthesized
    separators that precede a post-image show op)."""

    def T(s: str):
        return ("text", s, None)

    def I(ref: str):  # noqa: E743
        return ("image", "", ref)

    cases: list[tuple[str, bytes, list]] = [
        ("C01", b"BT /F1 12 Tf 100 700 Td (Hello World) Tj ET", [T("Hello World")]),
        (
            "C02",
            b"BT /F1 12 Tf 100 700 Td (Line one) Tj 0 -20 Td (Line two) Tj ET",
            [T("Line one\nLine two")],
        ),
        ("C03", b"BT /F1 12 Tf 100 700 Td (A) Tj 120 0 Td (B) Tj ET", [T("A B")]),
        (
            "C04",
            b"BT /F1 12 Tf 14 TL 100 700 Td (First) Tj T* (Second) Tj ET",
            [T("First\nSecond")],
        ),
        (
            "C05",
            b"BT /F1 12 Tf 14 TL 100 700 Td (First) Tj (Second) ' ET",
            [T("First\nSecond")],
        ),
        (
            "C06",
            b'BT /F1 12 Tf 14 TL 100 700 Td (First) Tj 1 2 (Second) " ET',
            [T("First\nSecond")],
        ),
        ("C07", b"BT /F1 12 Tf 1 0 0 1 100 700 Tm (Placed) Tj ET", [T("Placed")]),
        (
            "C08",
            b"BT /F1 12 Tf 100 700 Td [(Hello)-300(World)] TJ ET",
            [T("Hello World")],
        ),
        (
            "C09",
            b"BT /F1 12 Tf 100 700 Td [(W)-50(o)-50(r)-50(d)] TJ ET",
            [T("Word")],
        ),
        (
            "C10",
            b"BT /F1 12 Tf 100 700 Td [(Hello )-300(World)] TJ ET",
            [T("Hello World")],
        ),
        (
            "C11",
            b"BT /F1 12 Tf 100 700 Td [(One)-300(Two)-300(Three)-300(Four)] TJ ET",
            [T("One Two Three Four")],
        ),
        ("C12", b"BT /F1 12 Tf 100 700 Td <48656C6C6F> Tj ET", [T("Hello")]),
        (
            "C13",
            rb"BT /F1 12 Tf 100 700 Td (A\(B\)\\C\101) Tj ET",
            [T("A(B)\\CA")],
        ),
        ("C14", b"BT /F1 12 Tf 100 700 Td (a (b) c) Tj ET", [T("a (b) c")]),
        (
            "C15",
            b"q 2 0 0 2 0 0 cm BT /F1 12 Tf 50 350 Td (Scaled) Tj ET Q",
            [T("Scaled")],
        ),
        (
            "C16",
            b"/Artifact BMC BT /F1 12 Tf 100 20 Td (Page 1 of 9) Tj ET EMC "
            b"BT /F1 12 Tf 100 700 Td (Body) Tj ET",
            [T("Body")],
        ),
        (
            "C17",
            b"/P <</MCID 0>> BDC BT /F1 12 Tf 100 700 Td (Tagged) Tj ET EMC",
            [T("Tagged")],
        ),
        (
            "C18",
            b"0.5 w 100 100 m 200 200 l S 10 10 150 50 re f "
            b"BT /F1 12 Tf 100 700 Td (OnlyText) Tj ET",
            [T("OnlyText")],
        ),
        (
            "C20",
            b"BT /F1 12 Tf 100 700 Td (X) Tj ET BI /W 1 /H 1 /CS /G /BPC 8 ID \x00 EI",
            [T("X"), I("inline:0:0")],
        ),
    ]
    return cases


def structural_cases() -> list[tuple[str, bytes, list[tuple[str, str, str | None]]]]:
    """X01-X16 + C19 (whole-file variants, FIXTURES.md §4)."""

    def T(s: str):
        return ("text", s, None)

    def I(ref: str):  # noqa: E743
        return ("image", "", ref)

    hello = [T("Hello World")]
    cases: list[tuple[str, bytes, list]] = []
    cases.append(("X01", build_pdf_with_content_stream(_C), hello))
    cases.append(
        ("X02", build_pdf_with_content_stream(_C, content_filter="FlateDecode"), hello)
    )
    cases.append(
        (
            "X03",
            build_pdf_with_content_stream(_C, content_filter="ASCIIHexDecode"),
            hello,
        )
    )
    cases.append(
        ("X04", build_pdf_with_content_stream(_C, content_filter="LZWDecode"), hello)
    )
    cases.append(("X05", build_pdf_with_content_stream(_C, content_filter="AHx+Fl"), hello))
    cases.append(("X06", build_pdf_xref_stream(_C), hello))
    cases.append(("X07", build_pdf_xref_stream(_C, use_objstm=True), hello))
    cases.append(
        (
            "X08",
            build_pdf_incremental_update(
                b"BT /F1 12 Tf 100 700 Td (Updated) Tj ET"
            ),
            [T("Updated")],
        )
    )
    cases.append(
        ("X09", build_pdf_with_content_stream(_C, indirect_length=True), hello)
    )
    # X10: corrupt the startxref digits → recovery scan path
    x01 = build_pdf_with_content_stream(_C)
    head, sep, tail = x01.rpartition(b"startxref\n")
    digits_end = tail.find(b"\n")
    corrupt = head + sep + b"99999999" + tail[digits_end:]
    cases.append(("X10", corrupt, hello))
    cases.append(("X11", build_pdf_with_content_stream(_C, length_delta=-4), hello))
    # X12: ToUnicode bfchar (content shows bytes 0x41 0x42 → 'A' + U+FFFD)
    font12 = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Custom /ToUnicode 8 0 R >>"
    )
    cases.append(
        (
            "X12",
            build_pdf_with_content_stream(
                b"BT /F1 12 Tf 100 700 Td (AB) Tj ET",
                font_obj=font12,
                extra_objects=_tounicode_font(_TOUNICODE_BFCHAR),
            ),
            [T("A�")],
        )
    )
    cases.append(
        (
            "X13",
            build_pdf_with_content_stream(
                b"BT /F1 12 Tf 100 700 Td (ABC) Tj ET",
                font_obj=font12,
                extra_objects=_tounicode_font(_TOUNICODE_BFRANGE),
            ),
            [T("abc")],
        )
    )
    font14 = (
        b"<< /Type /Font /Subtype /Type0 /BaseFont /Dummy /Encoding /Identity-H "
        b"/DescendantFonts [9 0 R] /ToUnicode 8 0 R >>"
    )
    cases.append(
        (
            "X14",
            build_pdf_with_content_stream(
                b"BT /F1 12 Tf 100 700 Td <00480069> Tj ET",
                font_obj=font14,
                extra_objects=_tounicode_font(_TOUNICODE_2BYTE, type0=True),
            ),
            [T("Hi")],
        )
    )
    cases.append(
        (
            "X15",
            build_pdf_multipage(["Page one", "Page two", "Page three"]),
            [T("Page one"), T("Page two"), T("Page three")],
        )
    )
    form_content = b"BT /F1 12 Tf 100 600 Td (Inside) Tj ET"
    cases.append(
        (
            "X16",
            build_pdf_with_content_stream(
                b"BT /F1 12 Tf 100 700 Td (Outside) Tj ET /Fm1 Do",
                page_extra="/XObject << /Fm1 6 0 R >> ",
                extra_objects={6: _FORM_OBJ % (len(form_content), form_content)},
            ),
            [T("Outside\nInside")],
        )
    )
    cases.append(
        (
            "C19",
            build_pdf_with_content_stream(
                b"BT /F1 12 Tf 100 700 Td (Before) Tj ET "
                b"q 100 0 0 100 50 50 cm /Im1 Do Q "
                b"BT /F1 12 Tf 100 500 Td (After) Tj ET",
                page_extra="/XObject << /Im1 6 0 R >> ",
                extra_objects={6: _IMG_OBJ},
            ),
            [T("Before"), I("Im1"), T("\nAfter")],
        )
    )
    return cases


def all_cases() -> list[tuple[str, bytes, list[tuple[str, str, str | None]]]]:
    out = []
    for case, content, expected in content_cases():
        out.append((case, build_pdf_with_content_stream(content), expected))
    out.extend(structural_cases())
    return out


# ---------------------------------------------------------------------------
# corpus generator (input-table + expected-output-table rows)
# ---------------------------------------------------------------------------


def encode_raw_payload(pdf: bytes) -> str:
    """latin-1 text when lossless, else prefixed base85 (FIXTURES.md §1.1)."""
    try:
        text = pdf.decode("latin-1")
        if text.encode("latin-1") == pdf:
            return text
    except (UnicodeDecodeError, UnicodeEncodeError):  # pragma: no cover
        pass
    return "b85:" + base64.b85encode(pdf).decode("ascii")


def generate_corpus(
    n_docs: int = 100,
    seed: int = 42,
    pct_interleaved: float = 0.3,
    mega_doc_rate: float = 0.02,
    mega_pages: int = 50,
    corrupt_rate: float = 0.05,
    n_parts: int = 8,
):
    """Yield (input_row, expected_row) dict pairs (FIXTURES.md §5 knobs)."""
    cases = all_cases()
    for i in range(n_docs):
        yield gen_doc(
            i,
            seed,
            cases,
            pct_interleaved=pct_interleaved,
            mega_doc_rate=mega_doc_rate,
            mega_pages=mega_pages,
            corrupt_rate=corrupt_rate,
            n_parts=n_parts,
        )


def gen_doc(
    i: int,
    seed: int,
    cases=None,
    pct_interleaved: float = 0.3,
    mega_doc_rate: float = 0.02,
    mega_pages: int = 50,
    corrupt_rate: float = 0.05,
    html_rate: float = 0.15,
    n_parts: int = 8,
):
    """One deterministic (input_row, expected_row) pair for doc index ``i``.

    Keyed by (seed, i) only — independent of generation order, so corpus
    synthesis can run distributed (one Spark task generates any slice).
    Rows have the authoritative shape:
    {doc_id, part_id, spans:[{kind,text,media_ref,offset}]}.
    """
    if cases is None:
        cases = all_cases()
    if True:  # keep original body indentation
        rng = random.Random((seed << 32) ^ i)
        doc_id = f"doc-{i:06d}"
        part_id = hash_bucket(doc_id, n_parts)
        r = rng.random()
        if r < mega_doc_rate:
            # mega doc: many pages (skew tier)
            texts = [f"Mega page {p} of {doc_id}" for p in range(mega_pages)]
            pdf = build_pdf_multipage_texts(texts)
            expected = [("text", t, None) for t in texts]
            case = "MEGA"
        elif r < mega_doc_rate + corrupt_rate:
            case, pdf, expected = cases[rng.randrange(len(cases))]
            # truncate trailing bytes after %%EOF is harmless; corrupt the
            # startxref digits instead (recovery-tier)
            head, sep, tail = pdf.rpartition(b"startxref\n")
            if sep:
                nl = tail.find(b"\n")
                pdf = head + sep + b"00000000" + tail[nl:]
            case = case + "+corrupt"
        elif r < mega_doc_rate + corrupt_rate + html_rate:
            # HTML-payload document (north_rule html leg): boilerplate-wrapped
            # content lines; extraction must return exactly the lines + image
            lines = [
                " ".join(
                    f"w{rng.randrange(100)}word{k}" for k in range(6)
                )
                for _ in range(rng.randrange(2, 6))
            ]
            html = build_html_doc("\n".join(lines), with_image=True)
            expected = [("text", ln, None) for ln in lines] + [
                ("image", "", "media://img/inline1.png")
            ]
            case = "HTML"
            pdf = None
        else:
            case, pdf, expected = cases[rng.randrange(len(cases))]

        in_spans: list[dict] = []
        exp_spans: list[dict] = []

        def push_in(kind: str, text: str, media_ref: str | None):
            in_spans.append(
                {
                    "kind": kind,
                    "text": text,
                    "media_ref": media_ref,
                    "offset": len(in_spans),
                }
            )

        def push_exp(kind: str, text: str, media_ref: str | None):
            exp_spans.append(
                {
                    "kind": kind,
                    "text": text,
                    "media_ref": media_ref,
                    "offset": len(exp_spans),
                }
            )

        interleaved = rng.random() < pct_interleaved
        if interleaved:
            pre_text = f"lead-in for {doc_id}"
            push_in("text", pre_text, None)
            push_exp("text", pre_text, None)
        if case == "HTML":
            push_in("raw_html", html, None)
        else:
            push_in("raw_pdf", encode_raw_payload(pdf), None)
        for kind, text, media_ref in expected:
            push_exp(kind, text, media_ref)
        if interleaved:
            mref = f"media://img/{zlib.crc32((doc_id + ':m').encode()):012d}"
            push_in("media", "", mref)
            push_exp("media", "", mref)
            post_text = f"tail for {doc_id}"
            push_in("text", post_text, None)
            push_exp("text", post_text, None)

        return (
            {"doc_id": doc_id, "part_id": part_id, "case": case, "spans": in_spans},
            {"doc_id": doc_id, "part_id": part_id, "spans": exp_spans},
        )


def hash_bucket(doc_id: str, n: int) -> int:
    """Deterministic partition bucket (stand-in for Iceberg bucket(doc_id))."""
    import zlib as _z

    return _z.crc32(doc_id.encode()) % n


def build_composition_pdf(payload: bytes) -> bytes:
    """Three-page page-composition fixture (operations/page_analysis.rs
    PageType contract): page 0 is a full-page scanned image (image_ratio
    1.0 → Scanned), page 1 is dense text in a small MediaBox (text_ratio
    ~0.79 → Text), page 2 mixes one small text line with a 50x50pt image
    in a 200x200 page (both ratios low → Mixed). ``payload`` becomes the
    scan image's stream bytes so the OCR SPI path composes."""
    img0 = (
        b"<< /Type /XObject /Subtype /Image /Width 612 /Height 792 "
        b"/ColorSpace /DeviceGray /BitsPerComponent 8 /Length %d >>\n"
        b"stream\n%s\nendstream" % (len(payload), payload)
    )
    img2 = (
        b"<< /Type /XObject /Subtype /Image /Width 10 /Height 10 "
        b"/ColorSpace /DeviceGray /BitsPerComponent 8 /Length 3 >>\n"
        b"stream\nxyz\nendstream"
    )
    objects: dict[int, bytes] = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: (
            b"<< /Type /Pages /Count 3 /Kids [10 0 R 11 0 R 12 0 R] "
            b"/Resources << /Font << /F1 4 0 R >> >> >>"
        ),
        4: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        10: (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /XObject << /Im1 30 0 R >> >> /Contents 20 0 R >>"
        ),
        11: (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 120 50] "
            b"/Contents 21 0 R >>"
        ),
        12: (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 200 200] "
            b"/Resources << /Font << /F1 4 0 R >> "
            b"/XObject << /Im2 31 0 R >> >> /Contents 22 0 R >>"
        ),
        20: _stream_obj(b"", b"q 612 0 0 792 0 0 cm /Im1 Do Q"),
        21: _stream_obj(
            b"",
            b"BT /F1 24 Tf 5 8 Td (abcdefgh) Tj 0 24 Td (abcdefgh) Tj ET",
        ),
        22: _stream_obj(
            b"",
            b"BT /F1 12 Tf 10 150 Td (abcdefgh) Tj ET "
            b"q 50 0 0 50 100 20 cm /Im2 Do Q",
        ),
        30: img0,
        31: img2,
    }
    return assemble_pdf(objects)


# ---------------------------------------------------------------------------
# signed PDFs (signatures/ module forward direction — detection.rs +
# verification.rs fixtures; CMS/cert assembly in kernel/signatures.py)
# ---------------------------------------------------------------------------


def sign_pdf_objects(
    objects: dict[int, bytes],
    sig_obj: int,
    *,
    signer_cn: str = "Test Signer",
    digest_alg: str = "SHA-256",
    key_type: str = "rsa",
    signed_attrs: bool = False,
    unprefixed: bool = False,
    cades: bool = False,
    timestamp: bool = False,
    timestamp_bad_imprint: bool = False,
    reason: str | None = None,
    location: str | None = None,
    m_date: str | None = "D:20250106120000Z",
    sub_filter: str = "adbe.pkcs7.detached",
    tamper_find: bytes | None = None,
    incremental_tail: bytes = b"",
    contents_cap: int = 2048,
    root: int = 1,
    docmdp: int | None = None,
) -> bytes:
    """Add object ``sig_obj`` (a /Type /Sig dictionary with fixed-width
    /ByteRange and /Contents placeholders), assemble, then patch offsets,
    hash the two covered ranges, and embed a real CMS SignedData built
    with the deterministic test key (kernel/signatures.py).  The caller's
    ``objects`` must already reference ``sig_obj 0 R`` as a signature
    field's /V.  ``tamper_find``: after signing, a byte sequence inside
    the first range is altered so verification must fail (first char
    XORed into a different letter).  ``incremental_tail``: appended after
    signing — triggers has_incremental_update without breaking the hash."""
    import binascii

    from .kernel.signatures import build_cms_signature, _HASHERS

    extra = b""
    if reason is not None:
        extra += b" /Reason (%s)" % escape_pdf_string(reason)
    if location is not None:
        extra += b" /Location (%s)" % escape_pdf_string(location)
    if m_date is not None:
        extra += b" /M (%s)" % escape_pdf_string(m_date)
    if docmdp is not None:
        # certification signature (§12.8.2.2): DocMDP transform with
        # permission level P
        extra += (
            b" /Reference [ << /Type /SigRef /TransformMethod /DocMDP"
            b" /TransformParams << /Type /TransformParams /P %d /V /1.2"
            b" >> >> ]" % docmdp
        )
    objects = dict(objects)
    objects[sig_obj] = (
        b"<< /Type /Sig /Filter /Adobe.PPKLite /SubFilter /"
        + sub_filter.encode("latin-1")
        + b" /ByteRange [0 0000000000 0000000000 0000000000] /Contents <"
        + b"0" * (2 * contents_cap)
        + b">"
        + extra
        + b" >>"
    )
    pdf = bytearray(assemble_pdf(objects, root=root))
    cpos = pdf.index(b"/Contents <") + len(b"/Contents ")
    gap_end = cpos + 2 + 2 * contents_cap
    br = b"[0 %010d %010d %010d]" % (cpos, gap_end, len(pdf) - gap_end)
    bpos = pdf.index(b"/ByteRange ") + len(b"/ByteRange ")
    assert pdf[bpos : bpos + len(br)].startswith(b"[0 ")
    pdf[bpos : bpos + len(br)] = br
    h = _HASHERS[digest_alg]()
    h.update(pdf[:cpos])
    h.update(pdf[gap_end:])
    cms = build_cms_signature(
        h.digest(),
        cn=signer_cn,
        digest_alg=digest_alg,
        key_type=key_type,
        signed_attrs=signed_attrs,
        unprefixed=unprefixed,
        cades=cades,
        timestamp=timestamp,
        timestamp_bad_imprint=timestamp_bad_imprint,
    )
    hexs = binascii.hexlify(cms)
    if len(hexs) > 2 * contents_cap:
        raise ValueError("contents_cap too small for CMS payload")
    pdf[cpos + 1 : cpos + 1 + len(hexs)] = hexs
    if tamper_find is not None:
        at = pdf.index(tamper_find, 0, cpos)
        pdf[at] ^= 0x01  # same length, still a valid literal-string char
    if incremental_tail:
        pdf += incremental_tail
    return bytes(pdf)


CODEC_IMAGE_VARIANTS = 8


def build_codec_image_pdf(variant: int, text: str = "codec doc") -> bytes:
    """One-page PDF embedding a single image XObject whose stream is
    coded by one of the engine's image codecs (all by-construction
    in-repo encoders; pixel content is FIXED per variant so the decoded
    sample hash is a per-variant constant an oracle can enumerate):

    0. JBIG2 generic region, arithmetic template 0 (embedded stream)
    1. JBIG2 generic region, MMR
    2. CCITTFaxDecode G4 (K=-1)
    3. JPXDecode lossless gray (5/3 reversible)
    4. DCTDecode baseline gray (in-repo Huffman encoder)
    5. JPXDecode lossy gray (9/7 irreversible + scalar quantization)
    6. DCTDecode LOSSLESS gray (SOF3, T.81 Annex H, predictor 4 —
       decode is EXACT, so the sample hash equals the source pattern's)
    7. DCTDecode 12-bit extended-sequential gray (SOF1, 16-bit DQT;
       the PNG sink scales the decoded uint16 samples down by 4 bits)
    """
    import numpy as np

    variant %= CODEC_IMAGE_VARIANTS
    cached = _CODEC_STREAM_MEMO.get(variant)
    if cached is not None:
        return _codec_pdf_from_stream(variant, text, *cached)
    parms = b""
    if variant in (0, 1):
        from .kernel.jbig2 import (
            SEG_IMMEDIATE_GENERIC_REGION,
            SEG_PAGE_INFORMATION,
            build_generic_region_payload,
            build_page_info_payload,
            build_segment,
        )

        w, h = 24, 16
        rows = [[((x >> 1) ^ y) & 1 for x in range(w)] for y in range(h)]
        segs = build_segment(0, SEG_PAGE_INFORMATION, 1,
                             build_page_info_payload(w, h))
        segs += build_segment(1, SEG_IMMEDIATE_GENERIC_REGION, 1,
                              build_generic_region_payload(
                                  rows, w, h, mmr=variant == 1))
        payload, filt, bpc = segs, b"/JBIG2Decode", 1
    elif variant == 2:
        from .kernel.image_codecs import encode_ccitt_g4

        w, h = 24, 16
        rows = [[((x + y) // 3) & 1 for x in range(w)] for y in range(h)]
        payload = encode_ccitt_g4(rows, w)
        filt, bpc = b"/CCITTFaxDecode", 1
        parms = (b" /DecodeParms << /K -1 /Columns %d /Rows %d "
                 b"/BlackIs1 true >>" % (w, h))
    elif variant == 3:
        from .kernel.jp2k import encode_jp2k

        w, h = 16, 16
        pix = np.fromfunction(
            lambda y, x: (x * 11 + y * 29) % 256, (h, w)).astype(np.uint8)
        payload = encode_jp2k(pix, levels=1, cb_exp=4)
        filt, bpc = b"/JPXDecode", 8
    elif variant == 4:
        from .kernel.jpeg_codec import encode_jpeg

        w, h = 16, 16
        pix = np.fromfunction(
            lambda y, x: (x * 5 + y * 17) % 256, (h, w)).astype(np.uint8)
        payload = encode_jpeg(pix)
        filt, bpc = b"/DCTDecode", 8
    elif variant == 5:
        from .kernel.jp2k import encode_jp2k

        w, h = 16, 16
        pix = np.fromfunction(
            lambda y, x: (x * 13 + y * 7) % 256, (h, w)).astype(np.uint8)
        payload = encode_jp2k(pix, levels=1, cb_exp=4, reversible=False,
                              qstep=0.5)
        filt, bpc = b"/JPXDecode", 8
    elif variant == 6:
        from .kernel.jpeg_codec import encode_jpeg

        w, h = 16, 16
        pix = np.fromfunction(
            lambda y, x: (x * 3 + y * 19) % 256, (h, w)).astype(np.uint8)
        payload = encode_jpeg(pix, lossless=True, predictor=4)
        filt, bpc = b"/DCTDecode", 8
    else:
        from .kernel.jpeg_codec import encode_jpeg

        w, h = 16, 16
        pix = (np.fromfunction(
            lambda y, x: (x * 7 + y * 23) % 256,
            (h, w)).astype(np.uint16) << 4)
        payload = encode_jpeg(pix, quality=100, precision=12)
        filt, bpc = b"/DCTDecode", 8
    # the stream bytes are variant-deterministic (fixed pixel pattern,
    # deterministic encoders) — memoize them so per-document fixture
    # cost is PDF assembly, not re-running the MQ/DWT/Huffman encoders
    # (the JBIG2-arith encode alone is ~25 ms/doc unmemoized)
    _CODEC_STREAM_MEMO[variant] = (w, h, bpc, filt, parms, payload)
    return _codec_pdf_from_stream(variant, text, w, h, bpc, filt,
                                  parms, payload)


_CODEC_STREAM_MEMO: dict[int, tuple] = {}  # 6 entries max, tiny streams


def _codec_pdf_from_stream(variant: int, text: str, w: int, h: int,
                           bpc: int, filt: bytes, parms: bytes,
                           payload: bytes) -> bytes:
    img_obj = (
        b"<< /Type /XObject /Subtype /Image /Width %d /Height %d "
        b"/ColorSpace /DeviceGray /BitsPerComponent %d /Filter %s%s "
        b"/Length %d >>\nstream\n%s\nendstream"
        % (w, h, bpc, filt, parms, len(payload), payload)
    )
    content = (
        b"BT /F1 12 Tf 100 700 Td (%s) Tj ET "
        b"q 100 0 0 100 50 50 cm /Im1 Do Q" % escape_pdf_string(text)
    )
    return build_pdf_with_content_stream(
        content,
        page_extra="/XObject << /Im1 6 0 R >> ",
        extra_objects={6: img_obj},
    )


def build_signed_pdf(text: str = "signed doc", **kwargs) -> bytes:
    """One-page PDF carrying a single signed /FT /Sig AcroForm field
    ('Sig1', object 60).  All signing knobs pass through to
    sign_pdf_objects."""
    objects = {
        1: (
            b"<< /Type /Catalog /Pages 2 0 R "
            b"/AcroForm << /Fields [50 0 R] /SigFlags 3 >> >>"
        ),
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (
            b"<< /Type /Page /Parent 2 0 R /Contents 5 0 R "
            b"/MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 4 0 R >> >> >>"
        ),
        4: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        5: _stream_obj(
            b"", b"BT /F1 12 Tf 100 720 Td (%s) Tj ET" % escape_pdf_string(text)
        ),
        50: b"<< /FT /Sig /T (Sig1) /V 60 0 R >>",
    }
    return sign_pdf_objects(objects, 60, **kwargs)


def append_incremental_signature(
    pdf: bytes,
    updated_objects: dict[int, bytes],
    sig_obj: int,
    *,
    signer_cn: str = "Second Signer",
    digest_alg: str = "SHA-256",
    key_type: str = "rsa",
    signed_attrs: bool = False,
    sub_filter: str = "adbe.pkcs7.detached",
    contents_cap: int = 2048,
    root: int = 1,
) -> bytes:
    """Append an INCREMENTAL UPDATE revision carrying another signature —
    the real-world multi-signer shape (each signer adds a revision; the
    newest signature's /ByteRange spans the whole extended file, so the
    earlier signature reads has_incremental_update=True while remaining
    cryptographically valid over its own revision).

    ``updated_objects`` must re-declare every object the new revision
    changes (typically the catalog with the extended /AcroForm field
    list and the new field dict referencing ``sig_obj 0 R``)."""
    import binascii
    import re

    from .kernel.signatures import build_cms_signature, _HASHERS

    prev_xref = int(re.findall(rb"startxref\s+(\d+)", pdf)[-1])
    out = bytearray(pdf)
    if not out.endswith(b"\n"):
        out += b"\n"
    objects = dict(updated_objects)
    objects[sig_obj] = (
        b"<< /Type /Sig /Filter /Adobe.PPKLite /SubFilter /"
        + sub_filter.encode("latin-1")
        + b" /ByteRange [0 0000000000 0000000000 0000000000] /Contents <"
        + b"0" * (2 * contents_cap)
        + b"> >>"
    )
    offsets: dict[int, int] = {}
    for num in sorted(objects):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num
        out += objects[num]
        if not objects[num].endswith(b"\n"):
            out += b"\n"
        out += b"endobj\n"
    xref_off = len(out)
    out += b"xref\n"
    for num in sorted(offsets):  # one subsection per updated object
        out += b"%d 1\n%010d 00000 n \n" % (num, offsets[num])
    out += (
        b"trailer\n<< /Size %d /Root %d 0 R /Prev %d >>\nstartxref\n%d\n%%%%EOF\n"
        % (max(objects) + 1, root, prev_xref, xref_off)
    )

    cpos = out.rindex(b"/Contents <") + len(b"/Contents ")
    gap_end = cpos + 2 + 2 * contents_cap
    br = b"[0 %010d %010d %010d]" % (cpos, gap_end, len(out) - gap_end)
    bpos = out.rindex(b"/ByteRange ") + len(b"/ByteRange ")
    out[bpos : bpos + len(br)] = br
    h = _HASHERS[digest_alg]()
    h.update(out[:cpos])
    h.update(out[gap_end:])
    cms = build_cms_signature(
        h.digest(), cn=signer_cn, digest_alg=digest_alg,
        key_type=key_type, signed_attrs=signed_attrs,
    )
    hexs = binascii.hexlify(cms)
    if len(hexs) > 2 * contents_cap:
        raise ValueError("contents_cap too small for CMS payload")
    out[cpos + 1 : cpos + 1 + len(hexs)] = hexs
    return bytes(out)

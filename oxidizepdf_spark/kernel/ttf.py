"""Embedded TrueType font-program metric read-back (FontFile2).

BEYOND the reference: its text/ttf_parser.rs is explicitly dead code
("planned for future TrueType font support", #![allow(dead_code)]) and
nothing in the extraction path reads embedded font programs — a PDF
whose simple TrueType font omits /Widths falls back to the 0.5em guess
there. Here the sfnt program itself supplies the advances: table
directory -> head (unitsPerEm), hhea (numberOfHMetrics), maxp
(numGlyphs), hmtx (advances, last-entry run-out per the spec), cmap
(formats 0, 4, 6 and 12; (3,1)/(0,x) Unicode preferred, (1,0)/(3,0)
fallback) — everything is public ISO/IEC 14496-22 / Apple TrueType
structure.

PDF wiring (ISO 32000-1 §9.6.6.4): a simple TrueType font's character
code maps to a glyph through the font's effective encoding to Unicode,
then the cmap; widths come back in 1000-unit text space as
advance * 1000 / unitsPerEm.
"""

from __future__ import annotations

import struct

__all__ = ["TrueTypeMetrics", "parse_truetype_metrics"]


class TtfError(Exception):
    pass


# Max cumulative codepoints mapped while walking cmap subtables — all
# 17 Unicode planes fit in ~1.1M codes, so a legitimate full-repertoire
# CJK/emoji font stays intact while a crafted table stops in ~0.1 s.
_CMAP_CODE_BUDGET = 1_200_000


def _u16(b: bytes, o: int) -> int:
    return (b[o] << 8) | b[o + 1]


def _s16(b: bytes, o: int) -> int:
    v = _u16(b, o)
    return v - 0x10000 if v >= 0x8000 else v


def _u32(b: bytes, o: int) -> int:
    return struct.unpack_from(">I", b, o)[0]


class TrueTypeMetrics:
    """Parsed metric view of one sfnt program."""

    __slots__ = ("units_per_em", "num_glyphs", "advances", "cmap",
                 "ascender", "descender")

    def __init__(self):
        self.units_per_em = 1000
        self.num_glyphs = 0
        self.advances: list[int] = []
        self.cmap: dict[int, int] = {}
        self.ascender = 0
        self.descender = 0

    def glyph_for_char(self, cp: int) -> int | None:
        return self.cmap.get(cp)

    def advance_for_glyph(self, gid: int) -> int | None:
        """Font-unit advance; numberOfHMetrics run-out repeats the last
        entry for all higher glyph ids (OpenType hmtx)."""
        if not self.advances or gid < 0 or gid >= self.num_glyphs:
            return None
        if gid < len(self.advances):
            return self.advances[gid]
        return self.advances[-1]

    def width_1000_for_char(self, cp: int) -> float | None:
        """Advance for a Unicode codepoint in PDF 1000-unit text space."""
        gid = self.cmap.get(cp)
        if gid is None:
            return None
        adv = self.advance_for_glyph(gid)
        if adv is None:
            return None
        return adv * 1000.0 / (self.units_per_em or 1000)


def _parse_cmap(data: bytes, off: int, length: int) -> dict[int, int]:
    """Best subtable by PDF preference: (3,1) Windows Unicode / (0,*)
    Unicode first, then (1,0) Mac Roman / (3,0) symbol."""
    end = off + length
    if off + 4 > len(data):
        raise TtfError("cmap header out of range")
    n = _u16(data, off + 2)
    best = None  # (rank, subtable offset)
    for i in range(n):
        rec = off + 4 + 8 * i
        if rec + 8 > end:
            break
        pid = _u16(data, rec)
        eid = _u16(data, rec + 2)
        sub = off + _u32(data, rec + 4)
        if pid == 3 and eid in (1, 10):
            rank = 0
        elif pid == 0:
            rank = 1
        elif pid == 1 and eid == 0:
            rank = 2
        elif pid == 3 and eid == 0:
            rank = 3  # symbol: codes live at 0xF000+code
        else:
            rank = 9
        if best is None or rank < best[0]:
            best = (rank, sub, pid, eid)
    if best is None:
        return {}
    _, sub, pid, eid = best
    if sub + 2 > len(data):
        return {}
    fmt = _u16(data, sub)
    table: dict[int, int] = {}
    # Hostile-input budget: a crafted ~24KB font can declare format-12
    # groups spanning 0x10FFFF codepoints each (or ~32k format-4
    # segments x 65k codes) — unbounded, that hangs the executor and
    # balloons the dict to millions of entries. Cap cumulative mapped
    # codes; on overflow truncate (width lookups beyond the cap degrade
    # to /MissingWidth, same as an absent cmap entry).
    budget = _CMAP_CODE_BUDGET
    if fmt == 0:
        # byte encoding table: 256 glyph ids
        if sub + 6 + 256 > len(data):
            return {}
        for c in range(256):
            g = data[sub + 6 + c]
            if g:
                table[c] = g
    elif fmt == 4:
        segx2 = _u16(data, sub + 6)
        ends = sub + 14
        starts = ends + segx2 + 2  # +2: reservedPad
        deltas = starts + segx2
        ranges = deltas + segx2
        for s in range(0, segx2, 2):
            end_c = _u16(data, ends + s)
            start_c = _u16(data, starts + s)
            delta = _u16(data, deltas + s)
            roff = _u16(data, ranges + s)
            if start_c > end_c or end_c == 0xFFFF and start_c == 0xFFFF:
                continue
            budget -= end_c - start_c + 1
            if budget < 0:
                break
            for c in range(start_c, end_c + 1):
                if roff == 0:
                    g = (c + delta) & 0xFFFF
                else:
                    # glyphIdArray indexed relative to THIS range offset
                    gaddr = ranges + s + roff + 2 * (c - start_c)
                    if gaddr + 2 > len(data):
                        continue
                    g = _u16(data, gaddr)
                    if g:
                        g = (g + delta) & 0xFFFF
                if g:
                    table[c] = g
    elif fmt == 6:
        first = _u16(data, sub + 6)
        cnt = min(_u16(data, sub + 8), budget)
        for i in range(cnt):
            o = sub + 10 + 2 * i
            if o + 2 > len(data):
                break
            g = _u16(data, o)
            if g:
                table[first + i] = g
    elif fmt == 12:
        ngroups = _u32(data, sub + 12)
        for i in range(min(ngroups, 100_000)):
            o = sub + 16 + 12 * i
            if o + 12 > len(data):
                break
            sc, ec, sg = _u32(data, o), _u32(data, o + 4), _u32(data, o + 8)
            if ec < sc or ec - sc > 0x10FFFF:
                break
            budget -= ec - sc + 1
            if budget < 0:
                break
            for c in range(sc, ec + 1):
                table[c] = sg + (c - sc)
    if pid == 3 and eid == 0:
        # symbol subtable: codes 0x20..0xFF live at 0xF000+code
        remap = {}
        for c, g in table.items():
            remap[c & 0xFF if 0xF000 <= c <= 0xF0FF else c] = g
        table = remap
    return table


def parse_truetype_metrics(data: bytes, _dir_off: int = 0) -> TrueTypeMetrics:
    """Parse an sfnt (TrueType / OpenType-TT outline) program's metric
    tables. Raises TtfError on structural problems; callers degrade to
    the /MissingWidth path. Collections (ttcf) read their first face —
    table offsets are absolute into the collection, so the face's
    directory is parsed in place."""
    if len(data) < _dir_off + 12:
        raise TtfError("font program too short")
    tag = data[_dir_off:_dir_off + 4]
    if tag == b"ttcf" and _dir_off == 0:
        if len(data) < 16:
            raise TtfError("truncated collection header")
        return parse_truetype_metrics(data, _u32(data, 12))
    if tag not in (b"\x00\x01\x00\x00", b"true", b"OTTO"):
        raise TtfError(f"not an sfnt program: {tag!r}")
    n_tables = _u16(data, _dir_off + 4)
    if n_tables > 512:
        raise TtfError("implausible table count")
    tables: dict[bytes, tuple[int, int]] = {}
    for i in range(n_tables):
        rec = _dir_off + 12 + 16 * i
        if rec + 16 > len(data):
            raise TtfError("table directory out of range")
        t = data[rec:rec + 4]
        off = _u32(data, rec + 8)
        length = _u32(data, rec + 12)
        if off > len(data) or off + length > len(data):
            raise TtfError(f"table {t!r} out of range")
        tables[t] = (off, length)

    m = TrueTypeMetrics()
    head = tables.get(b"head")
    if head is None or head[1] < 54:
        raise TtfError("missing head table")
    m.units_per_em = _u16(data, head[0] + 18) or 1000

    maxp = tables.get(b"maxp")
    if maxp is None or maxp[1] < 6:
        raise TtfError("missing maxp table")
    m.num_glyphs = _u16(data, maxp[0] + 4)

    hhea = tables.get(b"hhea")
    if hhea is None or hhea[1] < 36:
        raise TtfError("missing hhea table")
    m.ascender = _s16(data, hhea[0] + 4)
    m.descender = _s16(data, hhea[0] + 6)
    num_h = _u16(data, hhea[0] + 34)

    hmtx = tables.get(b"hmtx")
    if hmtx is None:
        raise TtfError("missing hmtx table")
    num_h = min(num_h, m.num_glyphs, hmtx[1] // 4)
    adv = []
    base = hmtx[0]
    for i in range(num_h):
        adv.append(_u16(data, base + 4 * i))
    m.advances = adv

    cm = tables.get(b"cmap")
    if cm is not None:
        try:
            m.cmap = _parse_cmap(data, cm[0], cm[1])
        except (TtfError, IndexError, struct.error):
            m.cmap = {}
    return m

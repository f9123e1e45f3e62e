"""Embedded CFF / Type1C font-program metric read-back (FontFile3).

BEYOND the reference (its text/ttf_parser.rs is dead code and nothing
reads FontFile3): a bare CFF program (PDF /Subtype /Type1C) carries its
advances inside the Type 2 charstrings — the optional leading width
operand (delta from the Private DICT's nominalWidthX, absent meaning
defaultWidthX; CFF spec Appendix / Type 2 charstring format §3.1).
This parser reads the header, INDEX structures, Top and Private DICTs,
charset, and scans each charstring up to its first stack-clearing
operator (inlining local/global subrs so hint subrs don't hide the
width) — no outline execution.

Everything here follows the public Adobe CFF (#5176) and Type 2
charstring (#5177) specifications.
"""

from __future__ import annotations

import struct

__all__ = ["CffError", "CffMetrics", "parse_cff_metrics"]


class CffError(Exception):
    pass


# CFF standard strings, SIDs 0-228 (spec Appendix A). The expert-set
# tail (229-390) never maps to Unicode text, so it stays unnamed here.
_STD_STRINGS = (
    ".notdef space exclam quotedbl numbersign dollar percent ampersand "
    "quoteright parenleft parenright asterisk plus comma hyphen period "
    "slash zero one two three four five six seven eight nine colon "
    "semicolon less equal greater question at A B C D E F G H I J K L M "
    "N O P Q R S T U V W X Y Z bracketleft backslash bracketright "
    "asciicircum underscore quoteleft a b c d e f g h i j k l m n o p q "
    "r s t u v w x y z braceleft bar braceright asciitilde exclamdown "
    "cent sterling fraction yen florin section currency quotesingle "
    "quotedblleft guillemotleft guilsinglleft guilsinglright fi fl "
    "endash dagger daggerdbl periodcentered paragraph bullet "
    "quotesinglbase quotedblbase quotedblright guillemotright ellipsis "
    "perthousand questiondown grave acute circumflex tilde macron breve "
    "dotaccent dieresis ring cedilla hungarumlaut ogonek caron emdash "
    "AE ordfeminine Lslash Oslash OE ordmasculine ae dotlessi lslash "
    "oslash oe germandbls onesuperior logicalnot mu trademark Eth "
    "onehalf plusminus Thorn onequarter divide brokenbar degree thorn "
    "threequarters twosuperior registered minus eth multiply "
    "threesuperior copyright Aacute Acircumflex Adieresis Agrave Aring "
    "Atilde Ccedilla Eacute Ecircumflex Edieresis Egrave Iacute "
    "Icircumflex Idieresis Igrave Ntilde Oacute Ocircumflex Odieresis "
    "Ograve Otilde Scaron Uacute Ucircumflex Udieresis Ugrave Yacute "
    "Ydieresis Zcaron aacute acircumflex adieresis agrave aring atilde "
    "ccedilla eacute ecircumflex edieresis egrave iacute icircumflex "
    "idieresis igrave ntilde oacute ocircumflex odieresis ograve otilde "
    "scaron uacute ucircumflex udieresis ugrave yacute ydieresis zcaron"
).split()


def _read_index(data: bytes, pos: int) -> tuple[list[bytes], int]:
    if pos + 2 > len(data):
        raise CffError("INDEX header out of range")
    count = struct.unpack_from(">H", data, pos)[0]
    pos += 2
    if count == 0:
        return [], pos
    off_size = data[pos]
    pos += 1
    if not 1 <= off_size <= 4:
        raise CffError(f"bad INDEX offSize {off_size}")
    offs = []
    for i in range(count + 1):
        o = 0
        for b in data[pos:pos + off_size]:
            o = (o << 8) | b
        offs.append(o)
        pos += off_size
    base = pos - 1  # offsets are 1-based from the byte before the data
    out = []
    for i in range(count):
        s, e = base + offs[i], base + offs[i + 1]
        if not (base < s <= e <= len(data)):
            raise CffError("INDEX object out of range")
        out.append(data[s:e])
    return out, base + offs[count]


def _parse_dict(b: bytes) -> dict[int, list[float]]:
    """CFF DICT: operands then a 1- or 2-byte operator."""
    out: dict[int, list[float]] = {}
    stack: list[float] = []
    i = 0
    n = len(b)
    while i < n:
        b0 = b[i]
        if b0 <= 21:  # operator
            if b0 == 12:
                if i + 1 >= n:
                    raise CffError("truncated 2-byte DICT op")
                op = 0x0C00 | b[i + 1]
                i += 2
            else:
                op = b0
                i += 1
            out[op] = stack
            stack = []
        elif b0 == 28:
            stack.append(struct.unpack_from(">h", b, i + 1)[0])
            i += 3
        elif b0 == 29:
            stack.append(struct.unpack_from(">i", b, i + 1)[0])
            i += 5
        elif b0 == 30:  # real: packed BCD nibbles
            i += 1
            s = ""
            done = False
            while i < n and not done:
                for nib in (b[i] >> 4, b[i] & 0xF):
                    if nib <= 9:
                        s += chr(48 + nib)
                    elif nib == 0xA:
                        s += "."
                    elif nib == 0xB:
                        s += "E"
                    elif nib == 0xC:
                        s += "E-"
                    elif nib == 0xE:
                        s += "-"
                    elif nib == 0xF:
                        done = True
                        break
                i += 1
            try:
                stack.append(float(s or "0"))
            except ValueError:
                stack.append(0.0)
        elif 32 <= b0 <= 246:
            stack.append(b0 - 139)
            i += 1
        elif 247 <= b0 <= 250:
            stack.append((b0 - 247) * 256 + b[i + 1] + 108)
            i += 2
        elif 251 <= b0 <= 254:
            stack.append(-(b0 - 251) * 256 - b[i + 1] - 108)
            i += 2
        else:
            raise CffError(f"bad DICT byte {b0}")
    return out


def _subr_bias(n: int) -> int:
    return 107 if n < 1240 else (1131 if n < 33900 else 32768)


# Type 2 stack-clearing operators and their base arities (args consumed
# without a width). None = "even count" (stem pairs).
_CLEARING = {
    1: None, 3: None, 18: None, 23: None,    # h/vstem(hm): pairs
    19: None, 20: None,                      # hintmask/cntrmask
    21: 2,                                   # rmoveto
    22: 1, 4: 1,                             # hmoveto / vmoveto
    14: 0,                                   # endchar (or 4 for seac)
}


def _charstring_width_delta(cs: bytes, gsubrs: list[bytes],
                            lsubrs: list[bytes]) -> float | None:
    """Width operand of one Type 2 charstring, or None for
    defaultWidthX. Numbers accumulate on a value stack until the first
    stack-clearing operator; callsubr/callgsubr are followed (hint subrs
    routinely carry the stems), depth-limited."""
    stack: list[float] = []
    frames = [(cs, 0)]
    gbias = _subr_bias(len(gsubrs))
    lbias = _subr_bias(len(lsubrs))
    steps = 0
    while frames:
        b, i = frames.pop()
        n = len(b)
        while i < n:
            steps += 1
            if steps > 10_000:
                raise CffError("runaway charstring")
            b0 = b[i]
            if b0 in _CLEARING:
                base = _CLEARING[b0]
                cnt = len(stack)
                if base is None:  # stems / masks: width iff odd count
                    return stack[0] if cnt % 2 else None
                if b0 == 14:  # endchar: 0 or 4 (seac) regular args
                    return stack[0] if cnt in (1, 5) else None
                return stack[0] if cnt == base + 1 else None
            if b0 == 10 or b0 == 29:  # callsubr / callgsubr
                if not stack:
                    raise CffError("subr call with empty stack")
                idx = int(stack.pop())
                table, bias = ((lsubrs, lbias) if b0 == 10
                               else (gsubrs, gbias))
                idx += bias
                if not 0 <= idx < len(table):
                    raise CffError("subr index out of range")
                if len(frames) > 10:
                    raise CffError("subr recursion too deep")
                frames.append((b, i + 1))
                b, i, n = table[idx], 0, len(table[idx])
                continue
            if b0 == 11:  # return
                break
            if b0 == 28:
                stack.append(struct.unpack_from(">h", b, i + 1)[0])
                i += 3
            elif b0 == 255:
                stack.append(struct.unpack_from(">i", b, i + 1)[0] / 65536)
                i += 5
            elif 32 <= b0 <= 246:
                stack.append(b0 - 139)
                i += 1
            elif 247 <= b0 <= 250:
                stack.append((b0 - 247) * 256 + b[i + 1] + 108)
                i += 2
            elif 251 <= b0 <= 254:
                stack.append(-(b0 - 251) * 256 - b[i + 1] - 108)
                i += 2
            else:
                # any other operator clears the stack without a width
                # (flex etc. can't appear before the width position in a
                # valid charstring) — treat as no-width
                return None
        else:
            # fell off the end without return: nothing more to scan
            break
    return None


class CffMetrics:
    """Metric view of one bare-CFF (Type1C) program."""

    __slots__ = ("default_width_x", "nominal_width_x", "font_matrix_x",
                 "_widths_by_gid", "_gid_by_unicode", "num_glyphs",
                 "is_cid", "_gid_by_cid")

    def __init__(self):
        self.default_width_x = 0.0
        self.nominal_width_x = 0.0
        self.font_matrix_x = 0.001
        self._widths_by_gid: list[float] = []
        self._gid_by_unicode: dict[int, int] = {}
        self.num_glyphs = 0
        # CID-keyed programs (ROS + FDArray/FDSelect): the charset maps
        # GID -> CID instead of GID -> SID, and widths come from the
        # selected FD's private dict
        self.is_cid = False
        self._gid_by_cid: dict[int, int] = {}

    def width_1000_for_char(self, cp: int) -> float | None:
        gid = self._gid_by_unicode.get(cp)
        if gid is None or gid >= len(self._widths_by_gid):
            return None
        return self._widths_by_gid[gid] * self.font_matrix_x * 1000.0

    def width_1000_for_cid(self, cid: int) -> float | None:
        gid = self._gid_by_cid.get(cid)
        if gid is None or gid >= len(self._widths_by_gid):
            return None
        return self._widths_by_gid[gid] * self.font_matrix_x * 1000.0


def _parse_charset(data: bytes, off: int, n_glyphs: int) -> list[int]:
    """GID -> SID. Offset 0 = ISOAdobe (identity)."""
    if off == 0:
        return list(range(n_glyphs))
    sids = [0]
    fmt = data[off]
    pos = off + 1
    if fmt == 0:
        for _ in range(n_glyphs - 1):
            sids.append(struct.unpack_from(">H", data, pos)[0])
            pos += 2
    elif fmt in (1, 2):
        while len(sids) < n_glyphs:
            first = struct.unpack_from(">H", data, pos)[0]
            pos += 2
            if fmt == 1:
                nleft = data[pos]
                pos += 1
            else:
                nleft = struct.unpack_from(">H", data, pos)[0]
                pos += 2
            for k in range(nleft + 1):
                if len(sids) >= n_glyphs:
                    break
                sids.append(first + k)
    else:
        raise CffError(f"unknown charset format {fmt}")
    return sids


def parse_cff_metrics(data: bytes, allow_cid: bool = False) -> CffMetrics:
    """Parse a bare CFF program's widths. Raises CffError on structure
    problems; malformed bytes never escape with another exception type.

    CID-keyed programs (ROS in the Top DICT) raise by default — the
    reference's decoded-char width model (extraction.rs
    calculate_text_width) has no code->CID notion, so in parity
    contexts these widths are unusable. ``allow_cid=True`` (round 10,
    BEYOND the reference) reads them for the code->CID model: per-FD
    defaultWidthX/nominalWidthX via FDSelect (formats 0/3), charstring
    width deltas against FD-local subrs, charset mapping GID -> CID."""
    try:
        return _parse_cff_metrics(data, allow_cid)
    except CffError:
        raise
    except (IndexError, ValueError, OverflowError, struct.error) as e:
        raise CffError(f"malformed CFF program: {e}") from None


def _parse_fdselect(data: bytes, off: int, n_glyphs: int) -> list[int]:
    """GID -> FD index (CFF spec §19)."""
    fmt = data[off]
    if fmt == 0:
        sel = list(data[off + 1:off + 1 + n_glyphs])
        if len(sel) < n_glyphs:
            raise CffError("FDSelect format 0 truncated")
        return sel
    if fmt == 3:
        (n_ranges,) = struct.unpack_from(">H", data, off + 1)
        pos = off + 3
        sel = [0] * n_glyphs
        prev_first = None
        prev_fd = 0
        for _ in range(n_ranges):
            first, fd = struct.unpack_from(">HB", data, pos)
            pos += 3
            if prev_first is not None:
                for g in range(prev_first, min(first, n_glyphs)):
                    sel[g] = prev_fd
            prev_first, prev_fd = first, fd
        (sentinel,) = struct.unpack_from(">H", data, pos)
        if prev_first is not None:
            for g in range(prev_first, min(sentinel, n_glyphs)):
                sel[g] = prev_fd
        return sel
    raise CffError(f"unknown FDSelect format {fmt}")


def _read_private(data: bytes, priv) -> tuple[float, float, list[bytes]]:
    """(defaultWidthX, nominalWidthX, local subrs) from a Private
    DICT operand pair [size, offset]."""
    default_w = nominal_w = 0.0
    lsubrs: list[bytes] = []
    if priv and len(priv) >= 2:
        psize, poff = int(priv[0]), int(priv[1])
        if poff + psize > len(data):
            raise CffError("Private DICT out of range")
        pd = _parse_dict(data[poff:poff + psize])
        if 20 in pd and pd[20]:
            default_w = float(pd[20][0])
        if 21 in pd and pd[21]:
            nominal_w = float(pd[21][0])
        if 19 in pd and pd[19]:
            lsubrs, _ = _read_index(data, poff + int(pd[19][0]))
    return default_w, nominal_w, lsubrs


def _parse_cff_metrics(data: bytes, allow_cid: bool) -> CffMetrics:
    from .encodings import glyph_name_to_unicode

    if len(data) < 4 or data[0] != 1:
        raise CffError("not a CFF version 1 program")
    hdr_size = data[2]
    pos = hdr_size
    _names, pos = _read_index(data, pos)
    top_dicts, pos = _read_index(data, pos)
    strings, pos = _read_index(data, pos)
    gsubrs, pos = _read_index(data, pos)
    if not top_dicts:
        raise CffError("no Top DICT")
    top = _parse_dict(top_dicts[0])
    is_cid = 0x0C1E in top  # ROS
    if is_cid and not allow_cid:
        raise CffError("CID-keyed CFF: widths come from the PDF /W array")
    cs_off = top.get(17)
    if not cs_off:
        raise CffError("no CharStrings offset")
    charstrings, _ = _read_index(data, int(cs_off[0]))
    n_glyphs = len(charstrings)
    if n_glyphs == 0:
        raise CffError("empty CharStrings INDEX")

    m = CffMetrics()
    m.num_glyphs = n_glyphs
    m.is_cid = is_cid
    fm = top.get(0x0C07)
    if fm and len(fm) >= 1 and fm[0]:
        m.font_matrix_x = float(fm[0])

    if is_cid:
        fda = top.get(0x0C24)
        fds = top.get(0x0C25)
        if not fda or not fds:
            raise CffError("CID-keyed CFF missing FDArray/FDSelect")
        fd_dicts, _ = _read_index(data, int(fda[0]))
        if not fd_dicts:
            raise CffError("empty FDArray")
        fd_priv = [_read_private(data, _parse_dict(fd).get(18))
                   for fd in fd_dicts]
        fdsel = _parse_fdselect(data, int(fds[0]), n_glyphs)
        widths = []
        for gid, cs in enumerate(charstrings):
            fd = fdsel[gid] if fdsel[gid] < len(fd_priv) else 0
            default_w, nominal_w, lsubrs = fd_priv[fd]
            try:
                d = _charstring_width_delta(cs, gsubrs, lsubrs)
            except CffError:
                d = None
            widths.append(nominal_w + d if d is not None else default_w)
        m._widths_by_gid = widths
        # CID-keyed charset maps GID -> CID (9957.vol2 / CFF §18)
        charset_off = int(top.get(15, [0])[0])
        cids = _parse_charset(data, charset_off, n_glyphs)
        for gid, cid in enumerate(cids):
            m._gid_by_cid.setdefault(cid, gid)
        return m

    lsubrs: list[bytes] = []
    priv = top.get(18)
    if priv and len(priv) >= 2:
        m.default_width_x, m.nominal_width_x, lsubrs = \
            _read_private(data, priv)

    widths = []
    for cs in charstrings:
        try:
            d = _charstring_width_delta(cs, gsubrs, lsubrs)
        except CffError:
            d = None
        widths.append(m.nominal_width_x + d if d is not None
                      else m.default_width_x)
    m._widths_by_gid = widths

    charset_off = int(top.get(15, [0])[0])
    sids = _parse_charset(data, charset_off, n_glyphs)
    for gid, sid in enumerate(sids):
        if sid < len(_STD_STRINGS):
            name = _STD_STRINGS[sid]
        else:
            si = sid - 391
            if 0 <= si < len(strings):
                try:
                    name = strings[si].decode("latin-1")
                except Exception:
                    continue
            else:
                continue
        u = glyph_name_to_unicode(name)
        if u is not None and u:
            m._gid_by_unicode.setdefault(ord(u[0]), gid)
    return m

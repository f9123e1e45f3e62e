"""Classic Type 1 (``FontFile``) metric read-back — a documented
beyond-reference extension.

The reference never opens embedded font programs on its extraction
path (text/ttf_parser.rs is explicit dead code), so simple fonts whose
advances live only in an embedded Type 1 program fall back to guessed
widths there. Old PDFs embed classic Type 1 constantly (every
pre-2000s TeX/troff pipeline, Acrobat Distiller defaults), so this
module reads the real advances, completing the embedded-metrics
trio next to kernel/ttf.py (FontFile2) and kernel/cff.py (FontFile3):

- eexec decryption (Adobe Type 1 Font Format §7.2: r=55665, the first
  4 plaintext bytes are padding), binary or ASCII-hex form (the §7.2
  rule: ciphertext whose first four non-whitespace bytes are all hex
  digits is the hex form), with PFB segment headers stripped;
- ``/CharStrings`` parsing (``/name len RD <binary> ND`` entries, the
  RD/ND names vary per generator so ``-|``/``|-`` are accepted too);
- per-charstring decryption (r=4330, ``/lenIV`` padding, default 4);
- the width from the MANDATORY leading command (§2.1: the first
  command in every charstring must be ``hsbw`` (sbx wx) or
  ``sbw`` (sbx sby wx wy)), with leading ``div`` arithmetic folded.

Glyph names map to Unicode through the same table the CFF reader uses,
and widths land in 1000-unit text space through ``/FontMatrix``.
"""

from __future__ import annotations

import re
import struct

__all__ = ["Type1Error", "Type1Metrics", "parse_type1_metrics"]

_C1, _C2 = 52845, 22719
_EEXEC_R = 55665
_CS_R = 4330
_MAX_GLYPHS = 20_000  # hostile-input ceiling

_HEX_DIGITS = frozenset(b"0123456789abcdefABCDEF")
_CS_ENTRY = re.compile(rb"/([^\s/{}()\[\]<>%]{1,127})\s+(\d{1,7})\s+"
                       rb"(?:RD|-\|) ")
_LENIV = re.compile(rb"/lenIV\s+(\d+)")
_MATRIX = re.compile(rb"/FontMatrix\s*\[([^\]]*)\]")


class Type1Error(ValueError):
    """Raised when bytes are not a readable Type 1 program."""


def _decrypt(data: bytes, r: int, skip: int) -> bytes:
    out = bytearray(len(data))
    for i, c in enumerate(data):
        out[i] = c ^ (r >> 8)
        r = ((c + r) * _C1 + _C2) & 0xFFFF
    return bytes(out[skip:])


def _encrypt(data: bytes, r: int, pad: int = 4) -> bytes:
    """Inverse of ``_decrypt`` (fixture building): ``pad`` leading
    padding bytes are prepended before encryption."""
    plain = b"\x00" * pad + data
    out = bytearray(len(plain))
    for i, p in enumerate(plain):
        c = p ^ (r >> 8)
        out[i] = c
        r = ((c + r) * _C1 + _C2) & 0xFFFF
    return bytes(out)


def _charstring_width(cs: bytes) -> float | None:
    """Width from the leading hsbw/sbw command. Type 1 numbers only
    (no 16.16 form); ``div`` (12 12) folds so ``wx 1000 div``-style
    leading arithmetic still yields the width. Any other command
    before hsbw/sbw means no readable width."""
    stack: list[float] = []
    i, n = 0, len(cs)
    while i < n:
        v = cs[i]
        if v >= 32:
            if v <= 246:
                stack.append(float(v - 139))
                i += 1
            elif v <= 250:
                if i + 1 >= n:
                    return None
                stack.append(float((v - 247) * 256 + cs[i + 1] + 108))
                i += 2
            elif v <= 254:
                if i + 1 >= n:
                    return None
                stack.append(float(-(v - 251) * 256 - cs[i + 1] - 108))
                i += 2
            else:  # 255: 32-bit signed
                if i + 5 > n:
                    return None
                stack.append(float(struct.unpack(">i", cs[i + 1:i + 5])[0]))
                i += 5
        elif v == 13:  # hsbw: sbx wx
            return stack[1] if len(stack) >= 2 else None
        elif v == 12:
            if i + 1 >= n:
                return None
            v2 = cs[i + 1]
            if v2 == 7:  # sbw: sbx sby wx wy
                return stack[2] if len(stack) >= 3 else None
            if v2 == 12:  # div
                if len(stack) < 2:
                    return None
                b = stack.pop()
                a = stack.pop()
                stack.append(a / b if b else 0.0)
                i += 2
                continue
            return None
        else:
            return None
    return None


class Type1Metrics:
    """Metric view of one classic Type 1 program (mirrors
    cff.CffMetrics' lookup surface for the fonts.py wiring)."""

    __slots__ = ("font_matrix_x", "num_glyphs", "_width_by_unicode",
                 "_width_by_name")

    def __init__(self) -> None:
        self.font_matrix_x = 0.001
        self.num_glyphs = 0
        self._width_by_unicode: dict[int, float] = {}
        self._width_by_name: dict[str, float] = {}

    def width_1000_for_char(self, cp: int) -> float | None:
        w = self._width_by_unicode.get(cp)
        if w is None:
            return None
        return w * self.font_matrix_x * 1000.0

    def width_1000_for_name(self, name: str) -> float | None:
        w = self._width_by_name.get(name)
        if w is None:
            return None
        return w * self.font_matrix_x * 1000.0


def _strip_pfb(data: bytes) -> bytes:
    """Concatenate PFB segment payloads (0x80 0x01/0x02 <len LE32>);
    segment type 3 ends the file."""
    segs = []
    pos = 0
    while pos + 6 <= len(data) and data[pos] == 0x80:
        t = data[pos + 1]
        if t == 3:
            break
        if t not in (1, 2):
            raise Type1Error("bad PFB segment type")
        (ln,) = struct.unpack("<I", data[pos + 2:pos + 6])
        seg = data[pos + 6:pos + 6 + ln]
        if len(seg) < ln:
            raise Type1Error("truncated PFB segment")
        segs.append(seg)
        pos += 6 + ln
    if not segs:
        raise Type1Error("no PFB segments")
    return b"".join(segs)


def parse_type1_metrics(data: bytes) -> Type1Metrics:
    """Parse one classic Type 1 font program (PFA text, PDF FontFile
    binary, or PFB) into its glyph advances."""
    if not data:
        raise Type1Error("empty font program")
    if data[0] == 0x80:
        data = _strip_pfb(data)
    if not data.lstrip()[:2] == b"%!":
        raise Type1Error("not a Type 1 program (missing %! header)")
    at = data.find(b"eexec")
    if at < 0:
        raise Type1Error("no eexec section")
    clear = data[:at]
    enc = data[at + 5:]
    j = 0
    while j < len(enc) and enc[j] in b"\r\n\t ":
        j += 1
    enc = enc[j:]
    if len(enc) >= 4 and all(b in _HEX_DIGITS for b in enc[:4]):
        import binascii

        hexonly = re.sub(rb"[^0-9A-Fa-f]", b"", enc)
        if len(hexonly) % 2:
            hexonly = hexonly[:-1]
        enc = binascii.unhexlify(hexonly)
    if len(enc) < 8:
        raise Type1Error("eexec section too short")
    priv = _decrypt(enc, _EEXEC_R, 4)

    m = _LENIV.search(priv)
    leniv = int(m.group(1)) if m else 4
    if not 0 <= leniv <= 16:
        raise Type1Error("lenIV out of range")

    metrics = Type1Metrics()
    fm = _MATRIX.search(clear)
    if fm:
        try:
            metrics.font_matrix_x = float(fm.group(1).split()[0])
        except (ValueError, IndexError):
            pass

    cs_at = priv.find(b"/CharStrings")
    if cs_at < 0:
        raise Type1Error("no /CharStrings dictionary")
    from .encodings import glyph_name_to_unicode

    pos = cs_at + len(b"/CharStrings")
    count = 0
    while count < _MAX_GLYPHS:
        m = _CS_ENTRY.search(priv, pos)
        if m is None:
            break
        ln = int(m.group(2))
        start = m.end()
        if start + ln > len(priv):
            break
        cs = _decrypt(priv[start:start + ln], _CS_R, leniv) \
            if ln >= leniv else b""
        pos = start + ln
        count += 1
        name = m.group(1).decode("latin-1")
        w = _charstring_width(cs)
        if w is None or name in metrics._width_by_name:
            continue
        metrics._width_by_name[name] = w
        u = glyph_name_to_unicode(name)
        if u:
            metrics._width_by_unicode.setdefault(ord(u[0]), w)
    metrics.num_glyphs = count
    if not metrics._width_by_name:
        raise Type1Error("no readable charstring widths")
    return metrics

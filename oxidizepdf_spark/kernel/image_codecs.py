"""Image-stream filter codecs: DCTDecode (JPEG) and CCITTFaxDecode (T.4/T.6).

DCTDecode — reference parity (filter_impls/dct.rs). The reference does NOT
decompress JPEG pixels: ``decode_dct`` (dct.rs:57-68) extracts the clean
SOI..EOI byte window, validates the marker structure, and returns the JPEG
bytes as-is ("The PDF reader will handle the actual JPEG decoding").
``parse_jpeg_info`` (dct.rs:119-302) walks the marker stream for dimensions,
component count, bit depth and a colour space derived from the component
count plus the Adobe APP14 transform byte. This module mirrors that contract
exactly — same cleaning window, same validation laxity, same colour-space
derivation — so a caller of the reference switching here sees identical
bytes and metadata.

CCITTFaxDecode — beyond-reference correctness (filter_impls/ccitt.rs). The
reference's run-length tables are an explicitly "simplified" subset
(ccitt.rs:366-411 decodes only runs 0-3 exactly) and its Group 4 path is a
size-fitting pass-through (ccitt.rs:446-476). This module instead implements
the full public ITU-T T.4 Modified Huffman terminating + make-up code tables
and the T.6 (Group 4) two-dimensional modes (pass / horizontal / vertical),
so correctly-encoded streams round-trip bit-exactly. Parameter semantics
(K, Columns|Width, Rows|Height, BlackIs1, EncodedByteAlign, EndOfBlock
defaults) follow ccitt.rs:41-130 ``CcittDecodeParams::from_dict``, and the
packed 1-bpp output convention (internal black=1, emitted bit inverted
unless BlackIs1) follows ccitt.rs:286-312 ``add_row_to_result``.

Neither codec sits on the extraction hot path (image XObjects are captured
by reference, never decoded, per the north star) — these serve explicit
``Stream.decode()`` calls on image streams.
"""

from __future__ import annotations

import struct
from typing import NamedTuple

from .filters import FilterError


# ---------------------------------------------------------------------------
# DCTDecode (JPEG)
# ---------------------------------------------------------------------------

class JpegInfo(NamedTuple):
    width: int
    height: int
    components: int
    bits_per_component: int
    color_space: str  # "Gray" | "RGB" | "YCbCr" | "CMYK"


_SOF_MARKERS = (0xC0, 0xC1, 0xC2, 0xC9, 0xCA)  # dct.rs:12-17 baseline..arith


def extract_clean_jpeg(data: bytes) -> bytes:
    """SOI..EOI window extraction (dct.rs:74-117): PDF streams may carry
    extraneous bytes on either side of the actual JPEG."""
    soi = data.find(b"\xff\xd8")
    if soi < 0:
        raise FilterError("JPEG SOI marker (0xFFD8) not found in stream data")
    eoi = data.find(b"\xff\xd9", soi)
    if eoi < 0:
        raise FilterError("JPEG EOI marker (0xFFD9) not found in stream data")
    return data[soi : eoi + 2]


def parse_jpeg_info(data: bytes) -> JpegInfo:
    """Marker walk for dimensions/components/colour space (dct.rs:119-302)."""
    if len(data) < 4:
        raise FilterError("JPEG data too short")
    if data[0] != 0xFF or data[1] != 0xD8:
        raise FilterError("Invalid JPEG: missing SOI marker")
    pos = 2
    width = height = components = 0
    bits_per_component = 8
    has_adobe = False
    adobe_transform = 0
    n = len(data)
    while pos < n - 1:
        if data[pos] != 0xFF:
            raise FilterError(f"Invalid JPEG marker at position {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xFF:  # padding 0xFF run (dct.rs:155-160)
            pos -= 1
            continue
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7:  # RSTn standalone
            continue
        if pos + 2 > n:
            raise FilterError("JPEG segment length missing")
        length = (data[pos] << 8) | data[pos + 1]
        pos += 2
        if length < 2:
            raise FilterError("Invalid JPEG segment length")
        seg = length - 2
        if pos + seg > n:
            raise FilterError("JPEG segment extends beyond data")
        if marker in _SOF_MARKERS:
            if length < 8:
                raise FilterError("SOF segment too short")
            bits_per_component = data[pos]
            height = (data[pos + 1] << 8) | data[pos + 2]
            width = (data[pos + 3] << 8) | data[pos + 4]
            components = data[pos + 5]
        elif marker == 0xEE:  # APP14 Adobe (dct.rs:235-249)
            if seg >= 12 and data[pos : pos + 5] == b"Adobe":
                has_adobe = True
                adobe_transform = data[pos + 11]
        elif marker == 0xDA:  # SOS: skip entropy data to next real marker
            pos += seg
            while pos < n - 1:
                if data[pos] == 0xFF and data[pos + 1] != 0x00:
                    break
                pos += 1
            continue
        pos += seg
    if width == 0 or height == 0:
        raise FilterError("JPEG dimensions not found")
    if components == 1:
        color_space = "Gray"
    elif components == 3:
        # dct.rs:283-289: Adobe transform 0 declares RGB; default YCbCr
        color_space = "RGB" if (has_adobe and adobe_transform == 0) else "YCbCr"
    elif components == 4:
        color_space = "CMYK"
    else:
        raise FilterError(f"Unsupported JPEG component count: {components}")
    return JpegInfo(width, height, components, bits_per_component, color_space)


def validate_jpeg(data: bytes) -> None:
    """Lenient structural validation (dct.rs:305-343): SOI at start, EOI at
    (or back-searched before) the end; info parse failures are tolerated —
    'the PDF viewer will handle the actual JPEG decoding'."""
    if len(data) < 4:
        raise FilterError("JPEG data too short")
    if data[0] != 0xFF or data[1] != 0xD8:
        raise FilterError("Invalid JPEG: missing SOI marker")
    if not (data[-2] == 0xFF and data[-1] == 0xD9):
        if data.rfind(b"\xff\xd9") < 0:
            raise FilterError("Invalid JPEG: missing EOI marker")
    try:
        parse_jpeg_info(data)
    except FilterError:
        pass


def decode_dct(data: bytes) -> bytes:
    """DCTDecode = clean + validate, bytes returned as-is (dct.rs:57-68)."""
    clean = extract_clean_jpeg(data)
    validate_jpeg(clean)
    return clean


# ---------------------------------------------------------------------------
# CCITTFaxDecode (ITU-T T.4 / T.6)
# ---------------------------------------------------------------------------

class CcittParams(NamedTuple):
    k: int  # <0 Group 4 (T.6), 0 Group 3 1-D, >0 Group 3 2-D
    columns: int
    rows: int
    end_of_line: bool
    encoded_byte_align: bool
    end_of_block: bool
    black_is_1: bool
    damaged_rows_before_error: int


def ccitt_params_from_dict(d: dict | None) -> CcittParams:
    """DecodeParms semantics per ccitt.rs:57-130 (Columns|Width and
    Rows|Height fallbacks, standard fax defaults)."""

    def _int(key, alt=None):
        v = d.get(key) if d else None
        if v is None and alt is not None:
            v = d.get(alt) if d else None
        return v if isinstance(v, int) and not isinstance(v, bool) else None

    def _bool(key, default):
        v = d.get(key) if d else None
        return v if isinstance(v, bool) else default

    k = _int("K")
    k = 0 if k is None else (-1 if k < 0 else k)
    cols = _int("Columns", "Width")
    cols = 1728 if cols is None else max(cols, 1)
    rows = _int("Rows", "Height")
    rows = 0 if rows is None else max(rows, 0)
    dmg = _int("DamagedRowsBeforeError")
    return CcittParams(
        k=k,
        columns=cols,
        rows=rows,
        end_of_line=_bool("EndOfLine", False),
        encoded_byte_align=_bool("EncodedByteAlign", False),
        end_of_block=_bool("EndOfBlock", True),
        black_is_1=_bool("BlackIs1", False),
        damaged_rows_before_error=max(dmg, 0) if dmg is not None else 0,
    )


# Full ITU-T T.4 Modified Huffman tables (public standard, Tables 2-4).
# Entries: run length -> (bit-length, code value). Terminating codes 0-63,
# make-up codes 64-1728 per colour, extended make-up 1792-2560 shared.
_WHITE_CODES = {
    0: (8, 0b00110101), 1: (6, 0b000111), 2: (4, 0b0111), 3: (4, 0b1000),
    4: (4, 0b1011), 5: (4, 0b1100), 6: (4, 0b1110), 7: (4, 0b1111),
    8: (5, 0b10011), 9: (5, 0b10100), 10: (5, 0b00111), 11: (5, 0b01000),
    12: (6, 0b001000), 13: (6, 0b000011), 14: (6, 0b110100), 15: (6, 0b110101),
    16: (6, 0b101010), 17: (6, 0b101011), 18: (7, 0b0100111), 19: (7, 0b0001100),
    20: (7, 0b0001000), 21: (7, 0b0010111), 22: (7, 0b0000011), 23: (7, 0b0000100),
    24: (7, 0b0101000), 25: (7, 0b0101011), 26: (7, 0b0010011), 27: (7, 0b0100100),
    28: (7, 0b0011000), 29: (8, 0b00000010), 30: (8, 0b00000011),
    31: (8, 0b00011010), 32: (8, 0b00011011), 33: (8, 0b00010010),
    34: (8, 0b00010011), 35: (8, 0b00010100), 36: (8, 0b00010101),
    37: (8, 0b00010110), 38: (8, 0b00010111), 39: (8, 0b00101000),
    40: (8, 0b00101001), 41: (8, 0b00101010), 42: (8, 0b00101011),
    43: (8, 0b00101100), 44: (8, 0b00101101), 45: (8, 0b00000100),
    46: (8, 0b00000101), 47: (8, 0b00001010), 48: (8, 0b00001011),
    49: (8, 0b01010010), 50: (8, 0b01010011), 51: (8, 0b01010100),
    52: (8, 0b01010101), 53: (8, 0b00100100), 54: (8, 0b00100101),
    55: (8, 0b01011000), 56: (8, 0b01011001), 57: (8, 0b01011010),
    58: (8, 0b01011011), 59: (8, 0b01001010), 60: (8, 0b01001011),
    61: (8, 0b00110010), 62: (8, 0b00110011), 63: (8, 0b00110100),
    # white make-up
    64: (5, 0b11011), 128: (5, 0b10010), 192: (6, 0b010111),
    256: (7, 0b0110111), 320: (8, 0b00110110), 384: (8, 0b00110111),
    448: (8, 0b01100100), 512: (8, 0b01100101), 576: (8, 0b01101000),
    640: (8, 0b01100111), 704: (9, 0b011001100), 768: (9, 0b011001101),
    832: (9, 0b011010010), 896: (9, 0b011010011), 960: (9, 0b011010100),
    1024: (9, 0b011010101), 1088: (9, 0b011010110), 1152: (9, 0b011010111),
    1216: (9, 0b011011000), 1280: (9, 0b011011001), 1344: (9, 0b011011010),
    1408: (9, 0b011011011), 1472: (9, 0b010011000), 1536: (9, 0b010011001),
    1600: (9, 0b010011010), 1664: (6, 0b011000), 1728: (9, 0b010011011),
}

_BLACK_CODES = {
    0: (10, 0b0000110111), 1: (3, 0b010), 2: (2, 0b11), 3: (2, 0b10),
    4: (3, 0b011), 5: (4, 0b0011), 6: (4, 0b0010), 7: (5, 0b00011),
    8: (6, 0b000101), 9: (6, 0b000100), 10: (7, 0b0000100), 11: (7, 0b0000101),
    12: (7, 0b0000111), 13: (8, 0b00000100), 14: (8, 0b00000111),
    15: (9, 0b000011000), 16: (10, 0b0000010111), 17: (10, 0b0000011000),
    18: (10, 0b0000001000), 19: (11, 0b00001100111), 20: (11, 0b00001101000),
    21: (11, 0b00001101100), 22: (11, 0b00000110111), 23: (11, 0b00000101000),
    24: (11, 0b00000010111), 25: (11, 0b00000011000), 26: (12, 0b000011001010),
    27: (12, 0b000011001011), 28: (12, 0b000011001100), 29: (12, 0b000011001101),
    30: (12, 0b000001101000), 31: (12, 0b000001101001), 32: (12, 0b000001101010),
    33: (12, 0b000001101011), 34: (12, 0b000011010010), 35: (12, 0b000011010011),
    36: (12, 0b000011010100), 37: (12, 0b000011010101), 38: (12, 0b000011010110),
    39: (12, 0b000011010111), 40: (12, 0b000001101100), 41: (12, 0b000001101101),
    42: (12, 0b000011011010), 43: (12, 0b000011011011), 44: (12, 0b000001010100),
    45: (12, 0b000001010101), 46: (12, 0b000001010110), 47: (12, 0b000001010111),
    48: (12, 0b000001100100), 49: (12, 0b000001100101), 50: (12, 0b000001010010),
    51: (12, 0b000001010011), 52: (12, 0b000000100100), 53: (12, 0b000000110111),
    54: (12, 0b000000111000), 55: (12, 0b000000100111), 56: (12, 0b000000101000),
    57: (12, 0b000001011000), 58: (12, 0b000001011001), 59: (12, 0b000000101011),
    60: (12, 0b000000101100), 61: (12, 0b000001011010), 62: (12, 0b000001100110),
    63: (12, 0b000001100111),
    # black make-up
    64: (10, 0b0000001111), 128: (12, 0b000011001000), 192: (12, 0b000011001001),
    256: (12, 0b000001011011), 320: (12, 0b000000110011), 384: (12, 0b000000110100),
    448: (12, 0b000000110101), 512: (13, 0b0000001101100), 576: (13, 0b0000001101101),
    640: (13, 0b0000001001010), 704: (13, 0b0000001001011), 768: (13, 0b0000001001100),
    832: (13, 0b0000001001101), 896: (13, 0b0000001110010), 960: (13, 0b0000001110011),
    1024: (13, 0b0000001110100), 1088: (13, 0b0000001110101),
    1152: (13, 0b0000001110110), 1216: (13, 0b0000001110111),
    1280: (13, 0b0000001010010), 1344: (13, 0b0000001010011),
    1408: (13, 0b0000001010100), 1472: (13, 0b0000001010101),
    1536: (13, 0b0000001011010), 1600: (13, 0b0000001011011),
    1664: (13, 0b0000001100100), 1728: (13, 0b0000001100101),
}

# Extended make-up, shared by both colours (T.4 Table 4).
_EXT_CODES = {
    1792: (11, 0b00000001000), 1856: (11, 0b00000001100),
    1920: (11, 0b00000001101), 1984: (12, 0b000000010010),
    2048: (12, 0b000000010011), 2112: (12, 0b000000010100),
    2176: (12, 0b000000010101), 2240: (12, 0b000000010110),
    2304: (12, 0b000000010111), 2368: (12, 0b000000011100),
    2432: (12, 0b000000011101), 2496: (12, 0b000000011110),
    2560: (12, 0b000000011111),
}

_EOL_BITS = (12, 0b000000000001)

# T.6 two-dimensional mode codes (T.4 Table 7 / T.6 Table 1).
_MODE_PASS = (4, 0b0001)
_MODE_HORIZ = (3, 0b001)
_MODE_V0 = (1, 0b1)
_MODE_VR1 = (3, 0b011)
_MODE_VR2 = (6, 0b000011)
_MODE_VR3 = (7, 0b0000011)
_MODE_VL1 = (3, 0b010)
_MODE_VL2 = (6, 0b000010)
_MODE_VL3 = (7, 0b0000010)


def _decode_map(table: dict) -> dict:
    return {code: run for run, code in table.items()}


_WHITE_DECODE = _decode_map(_WHITE_CODES) | _decode_map(_EXT_CODES)
_BLACK_DECODE = _decode_map(_BLACK_CODES) | _decode_map(_EXT_CODES)
_MODE_DECODE = {
    _MODE_V0: "V0", _MODE_VR1: "VR1", _MODE_VR2: "VR2", _MODE_VR3: "VR3",
    _MODE_VL1: "VL1", _MODE_VL2: "VL2", _MODE_VL3: "VL3",
    _MODE_HORIZ: "H", _MODE_PASS: "P",
}
_MAX_CODE_BITS = 14


class _BitReader:
    __slots__ = ("data", "pos")  # pos in bits

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def bits_left(self) -> int:
        return len(self.data) * 8 - self.pos

    def read_bit(self) -> int:
        p = self.pos
        if p >= len(self.data) * 8:
            raise FilterError("Unexpected end of CCITT data")
        self.pos = p + 1
        return (self.data[p >> 3] >> (7 - (p & 7))) & 1

    def peek_bits(self, count: int) -> int | None:
        """Up to ``count`` bits without consuming; None if fewer remain."""
        if self.bits_left() < count:
            return None
        v = 0
        p = self.pos
        d = self.data
        for _ in range(count):
            v = (v << 1) | ((d[p >> 3] >> (7 - (p & 7))) & 1)
            p += 1
        return v

    def skip(self, count: int) -> None:
        self.pos += count

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _read_code(reader: _BitReader, table: dict) -> int:
    """One prefix code from ``table`` keyed (nbits, value)."""
    code = 0
    for nbits in range(1, _MAX_CODE_BITS + 1):
        code = (code << 1) | reader.read_bit()
        run = table.get((nbits, code))
        if run is not None:
            return run
    raise FilterError("Invalid CCITT code word")


def _read_run(reader: _BitReader, white: bool) -> int:
    """Full MH run: make-up chain (>=64) + one terminating code (<64)."""
    table = _WHITE_DECODE if white else _BLACK_DECODE
    total = 0
    while True:
        run = _read_code(reader, table)
        total += run
        if run < 64:
            return total


def _skip_eol(reader: _BitReader, required: bool) -> bool:
    """Consume fill zeros + one EOL if present at the cursor. EOL is eleven
    0s then a 1, with any number of extra leading fill 0s (T.4 §4.1.2)."""
    start = reader.pos
    zeros = 0
    while reader.bits_left() > 0:
        if reader.read_bit() == 1:
            if zeros >= 11:
                return True
            # not an EOL — rewind
            reader.pos = start
            if required:
                raise FilterError("CCITT EOL expected")
            return False
        zeros += 1
    reader.pos = start
    if required:
        raise FilterError("Unexpected end of CCITT data at EOL")
    return False


def _transitions(runs: list[int]) -> list[int]:
    """Alternating white-first run lengths -> changing-element positions.
    Even indices are white->black changes, odd black->white. Zero-width
    runs (legal in horizontal-mode coding) produce equal adjacent
    positions; those cancel in pairs so the changing elements stay
    strictly increasing with correct parity."""
    out: list[int] = []
    pos = 0
    for r in runs:
        pos += r
        if out and out[-1] == pos:
            out.pop()
        else:
            out.append(pos)
    return out


def _decode_1d_line(reader: _BitReader, columns: int) -> list[int]:
    """One T.4 1-D coded line -> white-first run lengths summing to
    ``columns`` (lines always start with a white run, possibly 0)."""
    runs = []
    total = 0
    white = True
    while total < columns:
        run = _read_run(reader, white)
        if total + run > columns:
            raise FilterError("CCITT run overflows row width")
        runs.append(run)
        total += run
        white = not white
    return runs


def _b1_index(ref: list[int], a0: int, white: bool) -> int:
    """Index in ``ref`` of b1: first changing element > a0 whose colour is
    opposite to the coding colour (even index = white->black change)."""
    # binary search for first transition strictly greater than a0
    lo, hi = 0, len(ref)
    while lo < hi:
        mid = (lo + hi) // 2
        if ref[mid] > a0:
            hi = mid
        else:
            lo = mid + 1
    idx = lo
    # parity: coding colour white needs an even index (transition to black)
    want_even = white
    if (idx % 2 == 0) != want_even:
        idx += 1
    return idx


def _decode_2d_line(
    reader: _BitReader, columns: int, ref: list[int]
) -> list[int]:
    """One T.6/T.4-2D coded line against reference transitions ``ref`` ->
    white-first run lengths. Implements P/H/V modes (T.6 §2.2)."""
    transitions: list[int] = []
    a0 = -1
    white = True
    while a0 < columns:
        mode = None
        code = 0
        for nbits in range(1, 8):
            code = (code << 1) | reader.read_bit()
            mode = _MODE_DECODE.get((nbits, code))
            if mode is not None:
                break
        if mode is None:
            raise FilterError("Invalid CCITT 2-D mode code")
        i1 = _b1_index(ref, a0, white)
        b1 = ref[i1] if i1 < len(ref) else columns
        if mode == "P":
            b2 = ref[i1 + 1] if i1 + 1 < len(ref) else columns
            a0 = b2
            continue
        if mode == "H":
            start = 0 if a0 < 0 else a0
            r1 = _read_run(reader, white)
            r2 = _read_run(reader, not white)
            a1 = start + r1
            a2 = a1 + r2
            if a2 > columns:
                raise FilterError("CCITT horizontal run overflows row width")
            transitions.append(a1)
            transitions.append(a2)
            a0 = a2
            continue
        # vertical modes
        offset = {"V0": 0, "VR1": 1, "VR2": 2, "VR3": 3,
                  "VL1": -1, "VL2": -2, "VL3": -3}[mode]
        a1 = b1 + offset
        if a1 < 0 or a1 > columns:
            raise FilterError("CCITT vertical mode out of row bounds")
        transitions.append(a1)
        a0 = a1
        white = not white
    # transitions -> white-first runs
    runs = []
    prev = 0
    for t in transitions:
        if t > columns:
            t = columns
        runs.append(t - prev)
        prev = t
    if prev < columns:
        runs.append(columns - prev)
    return runs


def _pack_rows(rows: list[list[int]], columns: int, black_is_1: bool) -> bytes:
    """Run-length rows -> packed 1 bpp MSB-first, each row byte-aligned
    (ccitt.rs:286-312: default emits black as 0)."""
    out = bytearray()
    stride = (columns + 7) // 8
    for runs in rows:
        row = bytearray(stride)
        pos = 0
        black = False
        for r in runs:
            if black:
                for p in range(pos, pos + r):
                    row[p >> 3] |= 0x80 >> (p & 7)
            pos += r
            black = not black
        if not black_is_1:  # invert: 0 bits represent black
            for i in range(stride):
                row[i] ^= 0xFF
            extra = stride * 8 - columns
            if extra:
                row[stride - 1] &= 0xFF << extra & 0xFF
                # keep padding bits 0 after inversion
        out += row
    return bytes(out)


def decode_ccitt(data: bytes, params: dict | None = None) -> bytes:
    """CCITTFaxDecode dispatch (ccitt.rs:481-505): K<0 Group 4, K=0 Group 3
    1-D, K>0 Group 3 2-D (EOL + tag bit selects 1-D/2-D per line)."""
    p = ccitt_params_from_dict(params)
    reader = _BitReader(data)
    rows: list[list[int]] = []
    columns = p.columns
    ref = _transitions([columns])  # imaginary all-white line above row 0
    try:
        while True:
            if p.rows and len(rows) >= p.rows:
                break
            if p.encoded_byte_align and p.k < 0:
                reader.align()
            if p.k >= 0:
                # optional (or required) EOL before each line
                had_eol = _skip_eol(reader, required=False)
                if p.end_of_line and not had_eol and rows:
                    raise FilterError("CCITT EOL expected")
                if p.encoded_byte_align and not had_eol:
                    reader.align()
            if reader.bits_left() < 1:
                break
            if p.k < 0:
                # Group 4: EOFB = two consecutive EOLs
                peek = reader.peek_bits(12)
                if peek is not None and peek == 1:
                    break
                runs = _decode_2d_line(reader, columns, ref)
            elif p.k == 0:
                runs = _decode_1d_line(reader, columns)
            else:
                # Group 3 2-D: tag bit after EOL picks the line coding
                one_d = True
                if reader.bits_left() >= 1:
                    one_d = reader.read_bit() == 1
                if one_d:
                    runs = _decode_1d_line(reader, columns)
                else:
                    runs = _decode_2d_line(reader, columns, ref)
            rows.append(runs)
            ref = _transitions(runs)
            if not p.rows and reader.bits_left() < 4:
                break
    except FilterError:
        if not rows or len(rows) < p.damaged_rows_before_error:
            raise
        # tolerate a trailing damaged row per DamagedRowsBeforeError
    if p.rows and len(rows) < p.rows:
        # pad missing rows as white (reference pads with zeros,
        # ccitt.rs:469-474; white-padding matches BlackIs1=false zeros
        # after inversion semantics are applied consistently)
        while len(rows) < p.rows:
            rows.append([columns])
    return _pack_rows(rows, columns, p.black_is_1)


# ---------------------------------------------------------------------------
# CCITT encoders (test/tooling support; the write side is out of scope for
# the extraction engine, but round-tripping is the only in-sandbox way to
# validate the decoder bit-exactly — no external codec ships here)
# ---------------------------------------------------------------------------

class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, nbits: int, value: int) -> None:
        self.acc = (self.acc << nbits) | value
        self.nbits += nbits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)

    def align(self) -> None:
        if self.nbits:
            self.write(8 - self.nbits, 0)

    def getvalue(self) -> bytes:
        out = bytearray(self.buf)
        if self.nbits:
            out.append((self.acc << (8 - self.nbits)) & 0xFF)
        return bytes(out)


def _write_run(w: _BitWriter, run: int, white: bool) -> None:
    table = _WHITE_CODES if white else _BLACK_CODES
    while run >= 64:
        if run >= 2624:  # chain max extended make-up
            w.write(*_EXT_CODES[2560])
            run -= 2560
            continue
        makeup = (run // 64) * 64
        if makeup > 1728:
            w.write(*_EXT_CODES[makeup])
        else:
            w.write(*table[makeup])
        run -= makeup
    w.write(*table[run])


def _row_runs(pixels: list[int], columns: int) -> list[int]:
    """Pixel row (1=black) -> white-first run lengths."""
    runs = []
    color = 0
    count = 0
    for px in pixels:
        if px == color:
            count += 1
        else:
            runs.append(count)
            color = px
            count = 1
    runs.append(count)
    total = sum(runs)
    if total != columns:
        raise ValueError("row length mismatch")
    return runs


def encode_ccitt_g3_1d(bitmap: list[list[int]], columns: int) -> bytes:
    """T.4 1-D encoder (test support): rows of 0/1 pixels, 1=black."""
    w = _BitWriter()
    for row in bitmap:
        white = True
        for run in _row_runs(row, columns):
            _write_run(w, run, white)
            white = not white
    return w.getvalue()


def encode_ccitt_g4(bitmap: list[list[int]], columns: int) -> bytes:
    """T.6 (Group 4) encoder (test support) with EOFB terminator."""
    w = _BitWriter()
    ref = _transitions([columns])
    for row in bitmap:
        cur = _transitions(_row_runs(row, columns))
        a0 = -1
        white = True
        while a0 < columns:
            ia1 = _b1_index(cur, a0, white)
            a1 = cur[ia1] if ia1 < len(cur) else columns
            ib1 = _b1_index(ref, a0, white)
            b1 = ref[ib1] if ib1 < len(ref) else columns
            b2 = ref[ib1 + 1] if ib1 + 1 < len(ref) else columns
            if b2 < a1:
                w.write(*_MODE_PASS)
                a0 = b2
                continue
            d = a1 - b1
            if -3 <= d <= 3:
                w.write(*{0: _MODE_V0, 1: _MODE_VR1, 2: _MODE_VR2,
                          3: _MODE_VR3, -1: _MODE_VL1, -2: _MODE_VL2,
                          -3: _MODE_VL3}[d])
                a0 = a1
                white = not white
                continue
            # horizontal: two runs from a0 (or 0 at line start)
            start = 0 if a0 < 0 else a0
            ia2 = ia1 + 1
            a2 = cur[ia2] if ia2 < len(cur) else columns
            w.write(*_MODE_HORIZ)
            _write_run(w, a1 - start, white)
            _write_run(w, a2 - a1, not white)
            a0 = a2
        ref = cur
    w.write(*_EOL_BITS)
    w.write(*_EOL_BITS)
    return w.getvalue()

"""JBIG2 symbol-dictionary / text-region / halftone pipeline (ITU-T T.88
§6.4-6.7 + Annex B), completing the segment coverage of kernel/jbig2.py.

Behavioral parity target: the reference's filter_impls/{symbol_dict,
text_region, halftone_region, huffman, bitstream}.rs — transcribed
faithfully, including its implementation-specific choices:

- Integer fields (HCDH/SCDW/IAEX/DT/FS/DS/IT) use the reference's own
  arithmetic integer scheme (mq_coder.rs decode_integer_arith — see
  jbig2.decode_integer_arith; NO OOB sentinel, so a symbol dictionary's
  non-final height classes terminate via a width delta driving the total
  non-positive, and the final class terminates on the symbol count).
- Symbol-dict refinement flag in ARITHMETIC mode decodes symbols as
  DIRECT bitmaps (symbol_dict.rs:365-371 falls back with a warning);
  the standalone refinement-region decoder (§6.3.5.6) is transcribed
  with the reference's own context layouts (symbol_dict.rs:218-275).
  In HUFFMAN mode §6.5.8.2 refinement/aggregation is decoded for real
  (REFAGGNINST=1: per-symbol byte-aligned MQ refinement, shared GR
  contexts; REFAGGNINST>1: the §6.5.8.2.1 one-strip refinement text
  region continuing the dictionary's bit stream) — beyond the
  reference and pdf.js, which both error. Text regions decode
  SBREFINE per-instance refinement, SBDSOFFSET and SBRTEMPLATE
  (§6.4.11) in both coding modes.
- Export table (symbol_dict.rs decode_export_table): num_exported >=
  total exports everything WITHOUT consuming IAEX runs; partial exports
  decode alternating skip/export runs as abs(integer); a shortfall is
  filled from the END of the symbol list (reference quirk).
- Huffman text regions hard-code tables B11/B6/B8 for DT/FS/DS
  (text_region.rs:344-347) regardless of the parsed table selectors,
  and read symbol IDs as raw fixed-width bits.
- Standard Huffman tables B.1-B.15 are the reference's renderings of
  T.88 Annex B (huffman.rs:359-620): canonical codes assigned by stable
  prefix-length sort, extra bits always ADDED to range_low (the spec's
  subtractive lower-range lines are rendered as ordinary additive rows).
- Halftone gray values assemble bit planes LSB-first (plane 0 = bit 0,
  halftone_region.rs:369-374; T.88 nominally decodes MSB-first with
  Gray coding), and grid placement uses x = HGX + (m*HRX)/256 +
  (n*HRY)/256, y = HGY + (m*HRY)/256 - (n*HRX)/256 in 1/256 fixed
  point. Bit planes advance by the *consumed* byte count of each
  generic-region decode (max 1).

Encoders (test/tooling support, same pattern as jbig2.MQEncoder): each
decoder here has a by-construction inverse so round trips validate the
transcription bit-exactly in-sandbox; multi-plane payload builders
measure each plane's consumed length through the decoder itself.
"""

from __future__ import annotations

from .filters import FilterError
from .image_codecs import _BitReader, _BitWriter
from .jbig2 import (
    Bitmap,
    GenericRegionParams,
    MQDecoder,
    MQEncoder,
    OP_OR,
    _combine_op_from_u8,
    _template_offsets,
    _TEMPLATE_BITS,
    compute_context,
    decode_generic_region_arith,
    decode_generic_region_mmr,
    decode_integer_arith,
    encode_generic_region_arith,
    encode_iaid,
    encode_integer_arith,
    new_contexts,
)

MAX_SYMBOL_COUNT = 1_000_000  # symbol_dict.rs:32
MAX_INSTANCE_COUNT = 10_000_000  # text_region.rs:30


# ---------------------------------------------------------------------------
# Consumed-length variants of the generic-region decoders
# (generic_region.rs:647-731) — the halftone bit-plane walk needs them
# ---------------------------------------------------------------------------


def decode_generic_region_arith_with_consumed(
    data: bytes, params: GenericRegionParams
) -> tuple:
    """Like jbig2.decode_generic_region_arith but also returns the MQ
    decoder's byte position (generic_region.rs:647-694)."""
    if not data:
        raise FilterError("Empty data for generic region decode")
    if len(data) < 2:
        raise FilterError("Generic region data too short for MQ decoder")
    bitmap = Bitmap(params.width, params.height, params.default_pixel)
    contexts = new_contexts(1 << _TEMPLATE_BITS[params.template])
    dec = MQDecoder(data)
    offsets = _template_offsets(params.template, params.at_pixels)
    tpgd_ctx = [0, 0]
    line_is_typical = False
    for y in range(params.height):
        if params.is_tpgd:
            if dec.decode(tpgd_ctx):
                line_is_typical = not line_is_typical
            if line_is_typical and y > 0:
                bitmap.copy_row(y, y - 1)
                continue
        for x in range(params.width):
            ctx_value = compute_context(bitmap, x, y, offsets)
            bitmap.set_pixel(x, y, dec.decode(contexts[ctx_value]))
    return bitmap, dec.position


def decode_generic_region_mmr_with_consumed(
    data: bytes, params: GenericRegionParams
) -> tuple:
    """MMR variant: byte-aligns after the last row and reports the byte
    position (generic_region.rs:699-731)."""
    from .image_codecs import _decode_2d_line, _transitions

    if not data:
        raise FilterError("Empty data for MMR generic region decode")
    bitmap = Bitmap(params.width, params.height, params.default_pixel)
    reader = _BitReader(data)
    ref = _transitions([params.width])
    for y in range(params.height):
        runs = _decode_2d_line(reader, params.width, ref)
        pos = 0
        black = False
        for r in runs:
            if black:
                for x in range(pos, pos + r):
                    bitmap.set_pixel(x, y, 1)
            pos += r
            black = not black
        ref = _transitions(runs)
    reader.align()
    return bitmap, reader.pos >> 3


# ---------------------------------------------------------------------------
# Huffman decoding (huffman.rs, bitstream.rs) — T.88 Annex B as the
# reference renders it
# ---------------------------------------------------------------------------

MAX_HUFFMAN_CODE_LEN = 32  # huffman.rs:17


class HuffmanOOB(Exception):
    """Out-of-band marker decoded (huffman.rs HuffmanError::OutOfBand)."""


# (prefix_len, range_len, range_low, is_oob) — huffman.rs:359-620,
# list order matters: canonical codes are assigned after a STABLE sort
# by prefix length, so same-length entries keep this order.
_OOB = True
STANDARD_TABLES = {
    1: ((1, 4, 0), (2, 8, 16), (3, 16, 272), (3, 32, 65808)),
    2: ((1, 0, 0), (2, 0, 1), (3, 0, 2), (4, 3, 3), (5, 6, 11),
        (6, 32, 75), (6, 0, 0, _OOB)),
    3: ((8, 8, -256), (1, 0, 0), (2, 0, 1), (3, 0, 2), (4, 3, 3),
        (5, 6, 11), (8, 32, -257)),
    4: ((1, 0, 1), (2, 0, 2), (3, 0, 3), (4, 3, 4), (5, 6, 12),
        (5, 32, 76)),
    5: ((7, 8, -255), (1, 0, 1), (2, 0, 2), (3, 0, 3), (4, 3, 4),
        (5, 6, 12), (7, 32, 76)),
    6: ((5, 10, -2048), (4, 9, -1024), (4, 8, -512), (4, 7, -256),
        (5, 6, -128), (5, 5, -64), (4, 5, -32), (2, 7, 0), (3, 7, 128),
        (3, 8, 256), (4, 9, 512), (4, 10, 1024), (6, 32, 2048),
        (6, 32, -2049)),
    7: ((4, 9, -1024), (3, 8, -512), (4, 7, -256), (5, 6, -128),
        (5, 5, -64), (4, 5, -32), (4, 5, 0), (5, 5, 32), (5, 6, 64),
        (4, 7, 128), (3, 8, 256), (3, 9, 512), (3, 10, 1024),
        (5, 32, 2048), (5, 32, -2048)),
    8: ((8, 3, -15), (9, 1, -7), (8, 1, -5), (9, 0, -3), (7, 0, -2),
        (4, 0, -1), (2, 1, 0), (5, 0, 2), (6, 0, 3), (3, 4, 4),
        (6, 1, 20), (4, 4, 22), (4, 5, 38), (5, 6, 70), (5, 7, 134),
        (6, 7, 262), (7, 8, 390), (6, 10, 646), (9, 32, 1670),
        (9, 32, -16), (2, 0, 0, _OOB)),
    9: ((8, 4, -31), (9, 2, -15), (8, 2, -11), (9, 1, -7), (7, 1, -5),
        (4, 1, -3), (3, 1, -1), (3, 1, 1), (5, 1, 3), (6, 1, 5),
        (3, 5, 7), (6, 2, 39), (4, 5, 43), (4, 6, 75), (5, 7, 139),
        (5, 8, 267), (6, 8, 523), (7, 9, 779), (6, 11, 1291),
        (9, 32, 3339), (9, 32, -32), (2, 0, 0, _OOB)),
    10: ((7, 4, -21), (8, 0, -5), (7, 0, -4), (5, 0, -3), (2, 2, -2),
         (5, 0, 2), (6, 0, 3), (7, 0, 4), (8, 0, 5), (2, 6, 6),
         (5, 5, 70), (6, 5, 102), (6, 6, 134), (6, 7, 198), (6, 8, 326),
         (6, 9, 582), (6, 10, 1094), (7, 11, 2118), (8, 32, 4166),
         (8, 32, -22), (2, 0, 0, _OOB)),
    11: ((1, 0, 0), (2, 1, 1), (4, 0, 3), (4, 1, 4), (5, 1, 6),
         (5, 2, 8), (6, 2, 12), (7, 2, 16), (7, 3, 20), (7, 4, 28),
         (7, 5, 44), (7, 6, 76), (7, 32, 140)),
    12: ((1, 0, 0), (2, 0, 1), (3, 1, 2), (5, 0, 4), (5, 1, 5),
         (6, 1, 7), (7, 0, 9), (7, 1, 10), (7, 2, 12), (7, 3, 16),
         (7, 4, 24), (8, 5, 40), (8, 32, 72)),
    13: ((1, 0, 0), (3, 0, 1), (4, 0, 2), (5, 0, 3), (4, 1, 4),
         (3, 3, 6), (6, 1, 14), (6, 2, 16), (6, 3, 20), (6, 4, 28),
         (6, 5, 44), (7, 6, 76), (7, 32, 140)),
    14: ((3, 0, -2), (3, 0, -1), (1, 0, 0), (3, 0, 1), (3, 0, 2)),
    15: ((3, 0, -2), (3, 0, -1), (1, 0, 0), (3, 0, 1), (3, 0, 2)),
    # T.88 Table B.3 as the SPEC writes it — the reference's rendering
    # (huffman.rs:382-392, key 3 above) omits the OOB and 75+ upper-range
    # entries, so a Huffman symbol dictionary's DW selector 1 could never
    # terminate a height class under it. The beyond-reference Huffman SD
    # path (T.88 §6.5) uses this complete table; key 3 stays pinned to
    # the reference rendering for everything reference-parity.
    # NB the lower-range line is SUBTRACTIVE per B.3: value = -257 - extra
    "3sd": ((8, 8, -256), (1, 0, 0), (2, 0, 1), (3, 0, 2), (4, 3, 3),
            (5, 6, 11), (8, 32, -257, False, -1), (7, 32, 75),
            (6, 0, 0, _OOB)),
}


def compile_huffman_table(entries) -> list:
    """Canonical codes via stable prefix-length sort (huffman.rs
    CompiledHuffmanTable::new). Returns [(code, code_len, entry), ...]."""
    sorted_entries = sorted(entries, key=lambda e: e[0])
    result = []
    code = 0
    last_len = 0
    for entry in sorted_entries:
        plen = entry[0]
        if plen > last_len:
            code <<= plen - last_len
            last_len = plen
        result.append((code, plen, entry))
        code += 1
    return result


_COMPILED = {k: compile_huffman_table(v) for k, v in STANDARD_TABLES.items()}
_DECODE_MAPS = {
    k: {(l, c): e for c, l, e in v} for k, v in _COMPILED.items()
}


class CustomHuffmanTable:
    """Compiled custom code table (T.88 §7.4.13 table segment / Annex
    B.5 assignment) — same canonical-code construction as the standard
    tables; entries may carry a 5th element sign=-1 for the SUBTRACTIVE
    lower range line (value = rangelow - extra), which T.88 defines but
    the reference's standard-table renderings flatten to additive."""

    __slots__ = ("entries", "compiled", "decode_map")

    def __init__(self, entries):
        self.entries = tuple(e for e in entries if e[0] > 0)
        self.compiled = compile_huffman_table(self.entries)
        self.decode_map = {(l, c): e for c, l, e in self.compiled}


def _entry_sign(entry) -> int:
    return entry[4] if len(entry) > 4 else 1


def _table_parts(table):
    """(decode_map, compiled, label) for an int standard-table key or a
    CustomHuffmanTable."""
    if isinstance(table, CustomHuffmanTable):
        return table.decode_map, table.compiled, "custom"
    return _DECODE_MAPS[table], _COMPILED[table], f"B{table}"


def decode_huffman_int(reader: _BitReader, table) -> int:
    """One integer from a standard table (huffman.rs
    decode_with_compiled_table) or a CustomHuffmanTable. Raises
    HuffmanOOB on the OOB marker, FilterError on invalid/over-long
    codes or end of data."""
    dmap, _, _ = _table_parts(table)
    code = 0
    code_len = 0
    while True:
        if code_len >= MAX_HUFFMAN_CODE_LEN:
            raise FilterError("Huffman code too long")
        code = (code << 1) | reader.read_bit()
        code_len += 1
        entry = dmap.get((code_len, code))
        if entry is not None:
            if len(entry) > 3 and entry[3]:
                raise HuffmanOOB()
            plen, rlen, rlow = entry[0], entry[1], entry[2]
            if rlen > 0:
                extra = 0
                for _ in range(rlen):
                    extra = (extra << 1) | reader.read_bit()
                return rlow + extra * _entry_sign(entry)
            return rlow


def encode_huffman_int(writer: _BitWriter, table, value: int) -> None:
    """Inverse of decode_huffman_int: first compiled entry whose range
    contains the value (matching the decode map's resolution order
    for same-(len,code) duplicates is moot — codes are unique)."""
    _, compiled, label = _table_parts(table)
    for code, plen, entry in compiled:
        if len(entry) > 3 and entry[3]:
            continue
        rlen, rlow = entry[1], entry[2]
        span = 1 << rlen if rlen < 32 else 1 << 32
        if _entry_sign(entry) < 0:
            hit = rlow - span < value <= rlow
        else:
            hit = rlow <= value < rlow + span
        if hit:
            writer.write(plen, code)
            if rlen:
                writer.write(rlen, abs(value - rlow))
            return
    raise ValueError(f"value {value} not representable in table {label}")


def encode_huffman_oob(writer: _BitWriter, table) -> None:
    _, compiled, _ = _table_parts(table)
    for code, plen, entry in compiled:
        if len(entry) > 3 and entry[3]:
            writer.write(plen, code)
            return
    raise ValueError(f"table {_table_parts(table)[2]} has no OOB entry")


# ---------------------------------------------------------------------------
# Refinement region (symbol_dict.rs:189-275, T.88 §6.3.5.6 as rendered)
# ---------------------------------------------------------------------------

# (decoded-bitmap offsets, reference-bitmap offsets) per template —
# bit i follows the reference's fill order: decoded first, then reference
_REFINE_T0 = (((-1, -1), (0, -1), (1, -1), (-1, 0)),
              ((-1, -1), (0, -1), (1, -1), (-1, 0), (0, 0), (1, 0), (0, 1)))
_REFINE_T1 = (((0, -1), (-1, 0)),
              ((-1, 0), (0, 0), (1, 0), (0, 1)))


def compute_refinement_context(decoded: Bitmap, reference: Bitmap,
                               x: int, y: int, dx: int, dy: int,
                               template: int) -> int:
    rx, ry = x + dx, y + dy
    dec_offs, ref_offs = _REFINE_T0 if template == 0 else _REFINE_T1
    ctx = 0
    bit = 0
    for ddx, ddy in dec_offs:
        ctx |= decoded.get_pixel_signed(x + ddx, y + ddy) << bit
        bit += 1
    for rdx, rdy in ref_offs:
        ctx |= reference.get_pixel_signed(rx + rdx, ry + rdy) << bit
        bit += 1
    return ctx


def decode_refinement_region(reference: Bitmap, dx: int, dy: int,
                             width: int, height: int,
                             refinement_template: int, at_pixels,
                             dec: MQDecoder, contexts: list) -> Bitmap:
    bitmap = Bitmap(width, height)
    for y in range(height):
        for x in range(width):
            ctx = compute_refinement_context(
                bitmap, reference, x, y, dx, dy, refinement_template)
            bitmap.set_pixel(x, y, dec.decode(contexts[ctx]))
    return bitmap


def refine_instance(symbol: Bitmap, rdw: int, rdh: int, rdx: int,
                    rdy: int, template: int, dec, contexts) -> Bitmap:
    """§6.4.11 step 3(c)(x) instance refinement: the placed bitmap is a
    refinement of the dictionary symbol, GRW/GRH grown by RDW/RDH and
    reference offset ((RDW>>1)+RDX, (RDH>>1)+RDY) — floor shifts, so
    negative deltas follow T.88's floor semantics."""
    from .jbig2 import MAX_BITMAP_HEIGHT, MAX_BITMAP_WIDTH

    grw, grh = symbol.width + rdw, symbol.height + rdh
    if not (0 < grw <= MAX_BITMAP_WIDTH and 0 < grh <= MAX_BITMAP_HEIGHT):
        raise FilterError("refined instance dimensions out of range")
    return decode_refinement_region(
        symbol, (rdw >> 1) + rdx, (rdh >> 1) + rdy, grw, grh,
        template, (), dec, contexts)


def encode_refinement_region(rows: list, reference: Bitmap, dx: int,
                             dy: int, width: int, height: int,
                             refinement_template: int,
                             enc: MQEncoder, contexts: list) -> None:
    """Mirror of decode_refinement_region's context walk (test support)."""
    bm = Bitmap(width, height)
    for y in range(height):
        for x in range(width):
            ctx = compute_refinement_context(
                bm, reference, x, y, dx, dy, refinement_template)
            px = rows[y][x]
            enc.encode(contexts[ctx], px)
            bm.set_pixel(x, y, px)


# ---------------------------------------------------------------------------
# Symbol dictionary (symbol_dict.rs, T.88 §6.5 as rendered)
# ---------------------------------------------------------------------------


class SymbolDictFlags:
    """16-bit flags field, T.88 Table 13 (symbol_dict.rs:109-143)."""

    __slots__ = ("uses_huffman", "uses_refinement", "huffman_dh_table",
                 "huffman_dw_table", "huffman_bmsize_table",
                 "huffman_aggrinst_table", "context_used",
                 "context_retained", "template", "refinement_template")

    @classmethod
    def from_u16(cls, flags: int) -> "SymbolDictFlags":
        f = cls()
        f.uses_huffman = bool(flags & 0x0001)
        f.uses_refinement = bool(flags & 0x0002)
        f.huffman_dh_table = (flags >> 2) & 0x03
        f.huffman_dw_table = (flags >> 4) & 0x03
        f.huffman_bmsize_table = (flags >> 6) & 0x01
        f.huffman_aggrinst_table = (flags >> 7) & 0x01
        f.context_used = bool(flags & 0x0100)
        f.context_retained = bool(flags & 0x0200)
        f.template = (flags >> 10) & 0x03
        f.refinement_template = (flags >> 12) & 0x01
        return f


class SymbolDictionary:
    __slots__ = ("exported_symbols", "all_symbols")

    def __init__(self):
        self.exported_symbols: list = []
        self.all_symbols: list = []


class SymbolDictParams:
    __slots__ = ("flags", "at_pixels", "refinement_at_pixels",
                 "num_exported", "num_new_symbols", "referred_symbols",
                 "custom_tables", "spec_refagg")

    def __init__(self, flags=None, at_pixels=(), refinement_at_pixels=(),
                 num_exported=0, num_new_symbols=0, referred_symbols=(),
                 custom_tables=(), spec_refagg=False):
        self.flags = flags or SymbolDictFlags.from_u16(0)
        self.at_pixels = tuple(at_pixels)
        self.refinement_at_pixels = tuple(refinement_at_pixels)
        self.num_exported = num_exported
        self.num_new_symbols = num_new_symbols
        self.referred_symbols = list(referred_symbols)
        # referred code-table segments (T.88 §7.4.3.1.6: consumed in
        # order by each selector that names a custom table)
        self.custom_tables = list(custom_tables)
        # opt-in SPEC §6.5.8 refinement/aggregation for ARITHMETIC
        # dictionaries; default False = the reference's direct-bitmap
        # fallback (symbol_dict.rs:365-371), which tests pin as parity
        self.spec_refagg = spec_refagg


def _decode_symbol_bitmap_arith(dec: MQDecoder, contexts: list, width: int,
                                height: int, offsets: tuple) -> Bitmap:
    # symbol_dict.rs:420-439 — shares the dictionary's MQ stream and
    # generic contexts; no TPGD
    bitmap = Bitmap(width, height)
    for y in range(height):
        for x in range(width):
            ctx = compute_context(bitmap, x, y, offsets)
            bitmap.set_pixel(x, y, dec.decode(contexts[ctx]))
    return bitmap


def decode_symbol_dict(data: bytes, params: SymbolDictParams) -> SymbolDictionary:
    """symbol_dict.rs decode_symbol_dict: height classes of width-delta
    runs; the reference's integer scheme has no OOB, so non-final height
    classes end on a non-positive running width and the final class ends
    on the symbol count. Huffman mode dispatches to the T.88 §6.5 Huffman
    decoder — BEYOND the reference, which errors on it explicitly
    (symbol_dict.rs:441-454) — including §6.5.8.2 refinement/
    aggregation with REFAGGNINST=1; in arithmetic mode the refinement
    flag decodes symbols directly (reference parity,
    symbol_dict.rs:420-439)."""
    if params.num_new_symbols > MAX_SYMBOL_COUNT:
        raise FilterError(
            f"Symbol count {params.num_new_symbols} exceeds maximum "
            f"{MAX_SYMBOL_COUNT}"
        )
    if params.flags.uses_huffman:
        return _decode_symbol_dict_huffman(data, params)
    if len(data) < 2:
        raise FilterError("Symbol dictionary data too short")

    dec = MQDecoder(data)
    iadh = new_contexts(512)
    iadw = new_contexts(512)
    iaex = new_contexts(512)
    generic = new_contexts(1 << _TEMPLATE_BITS[params.flags.template])
    offsets = _template_offsets(params.flags.template, params.at_pixels)
    # opt-in spec §6.5.8: arithmetic refinement/aggregation decoded for
    # real (IAAI instance count; one refinement via IAID+IARDX/IARDY in
    # the SAME MQ stream, or an embedded arith text region). Default
    # stays the reference's direct-bitmap fallback.
    refagg = params.flags.uses_refinement and params.spec_refagg
    if refagg:
        iaai = new_contexts(512)
        iardx = new_contexts(512)
        iardy = new_contexts(512)
        id_bits = compute_symbol_id_codewidth(
            len(params.referred_symbols) + params.num_new_symbols)
        iaid = new_contexts(max(1 << id_bits, 2))
        grctx = new_contexts(1 << 13)

    new_symbols: list = []
    current_height = 0
    symbols_decoded = 0

    while symbols_decoded < params.num_new_symbols:
        height_delta = decode_integer_arith(dec, iadh)
        if height_delta == 0 and symbols_decoded > 0 and not new_symbols:
            break
        current_height += height_delta
        if current_height <= 0:
            break
        total_width = 0
        height_class: list = []
        while True:
            if symbols_decoded >= params.num_new_symbols:
                break
            width_delta = decode_integer_arith(dec, iadw)
            total_width += width_delta
            if total_width <= 0:
                break
            if refagg:
                pool = (params.referred_symbols + new_symbols
                        + height_class)
                n_inst = decode_integer_arith(dec, iaai)
                if n_inst <= 0:
                    raise FilterError("non-positive REFAGGNINST")
                if n_inst == 1:
                    sym_id = dec.decode_iaid(iaid, id_bits)
                    if sym_id >= len(pool):
                        raise FilterError(
                            f"refinement reference {sym_id} out of range")
                    rdx = decode_integer_arith(dec, iardx)
                    rdy = decode_integer_arith(dec, iardy)
                    sym = decode_refinement_region(
                        pool[sym_id], rdx, rdy, total_width,
                        current_height, params.flags.refinement_template,
                        params.refinement_at_pixels, dec, grctx)
                else:
                    tr_flags = TextRegionFlags.from_u16(0x0002)
                    tr_flags.refinement_template = \
                        params.flags.refinement_template
                    tr = TextRegionParams(
                        flags=tr_flags, width=total_width,
                        height=current_height, num_instances=n_inst,
                        symbol_id_codewidth=id_bits,
                        available_symbols=pool)
                    sym = _decode_text_region_arith(
                        data, tr, dec=dec, gr_contexts=grctx)
                height_class.append(sym)
            else:
                height_class.append(_decode_symbol_bitmap_arith(
                    dec, generic, total_width, current_height, offsets))
            symbols_decoded += 1
        new_symbols.extend(height_class)

    out = SymbolDictionary()
    out.all_symbols = params.referred_symbols + new_symbols
    out.exported_symbols = _decode_export_table(
        out.all_symbols, params.num_exported, dec, iaex)
    return out


def _decode_export_table(all_symbols: list, num_exported: int,
                         dec: MQDecoder, contexts: list) -> list:
    # symbol_dict.rs decode_export_table
    return _walk_export_runs(
        all_symbols, num_exported,
        lambda: abs(decode_integer_arith(dec, contexts)))


def _walk_export_runs(all_symbols: list, num_exported: int,
                      next_run) -> list:
    """Alternating skip/export run walk shared by the arith export table
    (symbol_dict.rs decode_export_table) and the T.88 §6.5.10 Huffman
    variant (runs from Table B.1 instead of IAEX)."""
    if num_exported == 0:
        return []
    if num_exported >= len(all_symbols):
        return list(all_symbols)
    total = len(all_symbols)
    exported: list = []
    i = 0
    is_export_run = False
    while i < total and len(exported) < num_exported:
        run_length = next_run()
        if is_export_run:
            end = min(i + run_length, total)
            for sym in all_symbols[i:end]:
                if len(exported) < num_exported:
                    exported.append(sym)
            i = end
        else:
            i += run_length
        is_export_run = not is_export_run
    if len(exported) < num_exported and all_symbols:
        for sym in reversed(all_symbols):
            if len(exported) >= num_exported:
                break
            exported.append(sym)
    return exported


def encode_symbol_dict_arith(height_classes: list, template: int = 0,
                             at_pixels=(), export_runs=None) -> bytes:
    """By-construction inverse of decode_symbol_dict (test support).

    ``height_classes``: [(height, [rows_of_symbol, ...]), ...] in decode
    order; deltas between classes/widths must be representable in the
    reference's integer scheme ({0..3}, {64..79}, {81920..86015}).
    Non-final classes are closed with a -81920 width delta. The final
    class is left open (the decoder exits on the symbol count).
    ``export_runs``: alternating skip/export run lengths (omitted =
    export-all, which the decoder resolves without consuming IAEX)."""
    enc = MQEncoder()
    iadh = new_contexts(512)
    iadw = new_contexts(512)
    iaex = new_contexts(512)
    generic = new_contexts(1 << _TEMPLATE_BITS[template])
    offsets = _template_offsets(template, tuple(at_pixels))

    current_height = 0
    n_classes = len(height_classes)
    for ci, (height, symbols) in enumerate(height_classes):
        encode_integer_arith(enc, iadh, height - current_height)
        current_height = height
        total_width = 0
        for rows in symbols:
            width = len(rows[0])
            encode_integer_arith(enc, iadw, width - total_width)
            total_width = width
            bm = Bitmap(width, height)
            for y in range(height):
                for x in range(width):
                    ctx = compute_context(bm, x, y, offsets)
                    px = rows[y][x]
                    enc.encode(generic[ctx], px)
                    bm.set_pixel(x, y, px)
        if ci != n_classes - 1:
            encode_integer_arith(enc, iadw, -81920)  # close the class
    for run in export_runs or ():
        encode_integer_arith(enc, iaex, run)
    return enc.flush()


# ---------------------------------------------------------------------------
# Huffman symbol dictionary (T.88 §6.5 with SDHUFF=1) — BEYOND the
# reference: symbol_dict.rs:441-454 returns an explicit "not yet
# implemented" error for this mode. Height classes carry width deltas
# from the DH/DW standard tables (B.4/B.5, B.2/B.3 per the flag
# selectors), then ONE collective bitmap per height class (§6.5.9):
# BMSIZE==0 → stored uncompressed, row-padded to byte boundaries;
# BMSIZE>0 → MMR-coded (T.6) over exactly BMSIZE bytes. Export flags are
# Table B.1 run lengths (§6.5.10).
# ---------------------------------------------------------------------------

def parse_code_table_segment(data: bytes) -> CustomHuffmanTable:
    """T.88 §7.4.13 code-table segment (the reference skips type-53
    segments silently — BEYOND): flags byte (HTOOB, HTPS-1, HTRS-1),
    signed HTLOW/HTHIGH, then bit-packed (preflen, rangelen) lines
    covering [HTLOW, HTHIGH), a subtractive lower-range line, an upper-
    range line, and an OOB line when HTOOB. Zero prefix lengths mark
    unused lines (excluded from canonical-code assignment)."""
    if len(data) < 9:
        raise FilterError("code table segment too short")
    flags = data[0]
    htoob = bool(flags & 0x01)
    htps = ((flags >> 1) & 0x07) + 1
    htrs = ((flags >> 4) & 0x07) + 1
    htlow = int.from_bytes(data[1:5], "big", signed=True)
    hthigh = int.from_bytes(data[5:9], "big", signed=True)
    if hthigh <= htlow:
        raise FilterError("code table HTHIGH <= HTLOW")
    reader = _BitReader(data[9:])
    entries = []
    cur = htlow
    guard = 0
    while cur < hthigh:
        guard += 1
        if guard > 10_000:
            raise FilterError("code table line runaway")
        plen = 0
        for _ in range(htps):
            plen = (plen << 1) | reader.read_bit()
        rlen = 0
        for _ in range(htrs):
            rlen = (rlen << 1) | reader.read_bit()
        if rlen > 32:
            raise FilterError("code table range length > 32")
        entries.append((plen, rlen, cur))
        cur += 1 << rlen
    plen = 0
    for _ in range(htps):
        plen = (plen << 1) | reader.read_bit()
    if plen:
        entries.append((plen, 32, htlow - 1, False, -1))  # lower range
    plen = 0
    for _ in range(htps):
        plen = (plen << 1) | reader.read_bit()
    if plen:
        entries.append((plen, 32, hthigh))  # upper range
    if htoob:
        plen = 0
        for _ in range(htps):
            plen = (plen << 1) | reader.read_bit()
        if plen:
            entries.append((plen, 0, 0, True))
    table = CustomHuffmanTable(entries)
    if not table.entries:
        raise FilterError("code table has no usable lines")
    return table


def build_code_table_segment(lines: list, htlow: int, hthigh: int,
                             lower_plen: int = 0, upper_plen: int = 0,
                             oob_plen: int = 0, htps: int = 8,
                             htrs: int = 6) -> bytes:
    """Inverse of parse_code_table_segment (test support). ``lines``:
    (preflen, rangelen) pairs whose ranges tile [htlow, hthigh)."""
    flags = ((1 if oob_plen else 0)
             | ((htps - 1) << 1)
             | ((htrs - 1) << 4))
    out = bytearray([flags])
    out += htlow.to_bytes(4, "big", signed=True)
    out += hthigh.to_bytes(4, "big", signed=True)
    w = _BitWriter()
    for plen, rlen in lines:
        w.write(htps, plen)
        w.write(htrs, rlen)
    w.write(htps, lower_plen)
    w.write(htps, upper_plen)
    if oob_plen:
        w.write(htps, oob_plen)
    return bytes(out) + w.getvalue()


_SD_DH_TABLES = {0: 4, 1: 5}  # T.88 Table 13 SDHUFFDH selector
# SDHUFFDW selector 1 maps to the spec-complete B.3 ("3sd") — the
# reference's B.3 rendering has no OOB, and DW needs one to close each
# height class
_SD_DW_TABLES = {0: 2, 1: "3sd"}


def _decode_symbol_dict_huffman(data: bytes,
                                params: SymbolDictParams) -> SymbolDictionary:
    from .jbig2 import MAX_BITMAP_HEIGHT, MAX_BITMAP_WIDTH

    flags = params.flags
    tables_iter = iter(params.custom_tables)

    def _next_custom(which: str):
        t = next(tables_iter, None)
        if t is None:
            raise FilterError(
                f"JBIG2 Huffman symbol dictionary {which} selects a "
                "custom table but no referred table segment remains"
            )
        return t

    if flags.huffman_dh_table == 3:
        dh_table = _next_custom("DH")
    else:
        dh_table = _SD_DH_TABLES.get(flags.huffman_dh_table)
    if flags.huffman_dw_table == 3:
        dw_table = _next_custom("DW")
    else:
        dw_table = _SD_DW_TABLES.get(flags.huffman_dw_table)
    if dh_table is None or dw_table is None:
        raise FilterError(
            "JBIG2 Huffman symbol dictionary reserved table selector"
        )
    bmsize_table = (_next_custom("BMSIZE")
                    if flags.huffman_bmsize_table else 1)
    # §7.4.3.1.6 consumption order: DH, DW, BMSIZE, then AGGINST
    agg_table = (_next_custom("AGGINST")
                 if flags.huffman_aggrinst_table else 1)
    if not data:
        raise FilterError("Symbol dictionary data too short")

    reader = _BitReader(data)
    new_symbols: list = []
    current_height = 0
    # T.88 §6.5.8.2 refinement/aggregation with SDHUFF=1 (BEYOND the
    # reference AND pdf.js/most readers, which error here): each symbol
    # is its own byte-aligned arithmetic refinement of an
    # already-decoded symbol. GR contexts persist across the dictionary
    # (one fresh MQ decoder per symbol over its BMSIZE bytes).
    refagg = flags.uses_refinement
    ref_contexts = new_contexts(1 << 13) if refagg else None
    id_bits = compute_symbol_id_codewidth(
        len(params.referred_symbols) + params.num_new_symbols)

    while len(new_symbols) < params.num_new_symbols:
        current_height += decode_huffman_int(reader, dh_table)
        if current_height <= 0 or current_height > MAX_BITMAP_HEIGHT:
            raise FilterError(
                f"Huffman symbol dictionary height class {current_height} "
                "out of range"
            )
        widths: list = []
        sym_width = 0
        total_width = 0
        while True:
            try:
                sym_width += decode_huffman_int(reader, dw_table)
            except HuffmanOOB:
                break  # end of height class
            if sym_width <= 0 or sym_width > MAX_BITMAP_WIDTH:
                raise FilterError(
                    f"Huffman symbol dictionary width {sym_width} out of "
                    "range"
                )
            if len(new_symbols) + len(widths) >= params.num_new_symbols:
                raise FilterError(
                    "Huffman symbol dictionary decoded more symbols than "
                    "declared"
                )
            if refagg:
                new_symbols.append(_decode_refagg_symbol_huffman(
                    reader, data, params, agg_table, id_bits,
                    sym_width, current_height, new_symbols,
                    ref_contexts))
                continue
            widths.append(sym_width)
            total_width += sym_width
        if refagg or not widths:
            continue
        bmsize = decode_huffman_int(reader, bmsize_table)
        reader.align()
        start = reader.pos >> 3
        if bmsize == 0:
            # §6.5.9 uncompressed: rows padded to byte boundaries
            stride = (total_width + 7) >> 3
            need = stride * current_height
            if start + need > len(data):
                raise FilterError(
                    "Huffman symbol dictionary collective bitmap truncated"
                )
            collective = Bitmap(total_width, current_height)
            for y in range(current_height):
                base = start + y * stride
                for x in range(total_width):
                    bit = (data[base + (x >> 3)] >> (7 - (x & 7))) & 1
                    if bit:
                        collective.set_pixel(x, y, 1)
            reader.pos = (start + need) << 3
        else:
            chunk = data[start : start + bmsize]
            if len(chunk) < bmsize:
                raise FilterError(
                    "Huffman symbol dictionary MMR bitmap truncated"
                )
            collective = decode_generic_region_mmr(
                chunk,
                GenericRegionParams(total_width, current_height,
                                    is_mmr=True))
            reader.pos = (start + bmsize) << 3
        x0 = 0
        for wd in widths:
            sym = Bitmap(wd, current_height)
            for y in range(current_height):
                for x in range(wd):
                    if collective.get_pixel(x0 + x, y):
                        sym.set_pixel(x, y, 1)
            x0 += wd
            new_symbols.append(sym)

    out = SymbolDictionary()
    out.all_symbols = params.referred_symbols + new_symbols
    out.exported_symbols = _walk_export_runs(
        out.all_symbols, params.num_exported,
        lambda: decode_huffman_int(reader, 1))
    return out


def _decode_refagg_symbol_huffman(reader: "_BitReader", data: bytes,
                                  params: SymbolDictParams, agg_table,
                                  id_bits: int, sym_width: int,
                                  height: int, new_symbols: list,
                                  ref_contexts: list) -> Bitmap:
    """One §6.5.8.2 refinement/aggregation symbol under SDHUFF=1:
    REFAGGNINST from the AGGINST table (B.1 default), then — for the
    single-instance case — a raw SBSYMCODELEN-bit reference ID, RDX/RDY
    from Table B.15, BMSIZE from Table B.1, and a byte-aligned BMSIZE-
    byte arithmetic refinement stream (fresh MQ decoder per symbol,
    shared GR contexts, TPGRON=0)."""
    from .jbig2 import MQDecoder

    n_inst = decode_huffman_int(reader, agg_table)
    if n_inst <= 0:
        raise FilterError("non-positive REFAGGNINST")
    if n_inst > 1:
        # §6.5.8.2.1: the symbol is a ONE-STRIP refinement text region
        # of REFAGGNINST instances over the dictionary's symbol pool
        # (TRANSPOSED=0, REFCORNER=TOPLEFT, COMBOP=OR, DEFPIXEL=0,
        # STRIPS=1), continuing the dictionary's own bit stream and
        # sharing its GR contexts. NB corner code 0 IS the (s, t)
        # top-left placement in this engine's reference-parity
        # compute_placement rendering.
        tr_flags = TextRegionFlags.from_u16(0x0003)
        tr_flags.refinement_template = params.flags.refinement_template
        tr = TextRegionParams(
            flags=tr_flags, width=sym_width, height=height,
            num_instances=n_inst, symbol_id_codewidth=id_bits,
            available_symbols=params.referred_symbols + new_symbols,
        )
        return _decode_text_region_huffman(data, tr, reader=reader,
                                           gr_contexts=ref_contexts)
    sym_id = 0
    for _ in range(id_bits):
        sym_id = (sym_id << 1) | reader.read_bit()
    pool = params.referred_symbols
    if sym_id < len(pool):
        ref = pool[sym_id]
    elif sym_id - len(pool) < len(new_symbols):
        ref = new_symbols[sym_id - len(pool)]
    else:
        raise FilterError(
            f"Huffman symbol dictionary refinement reference {sym_id} "
            "out of range"
        )
    rdx = decode_huffman_int(reader, 15)
    rdy = decode_huffman_int(reader, 15)
    bmsize = decode_huffman_int(reader, 1)
    reader.align()
    start = reader.pos >> 3
    if bmsize <= 0 or start + bmsize > len(data):
        raise FilterError(
            "Huffman symbol dictionary refinement bitmap truncated")
    dec = MQDecoder(data[start:start + bmsize])
    sym = decode_refinement_region(
        ref, rdx, rdy, sym_width, height,
        params.flags.refinement_template, params.refinement_at_pixels,
        dec, ref_contexts)
    reader.pos = (start + bmsize) << 3
    return sym


def encode_symbol_dict_huffman(height_classes: list, export_runs=None,
                               dh_selector: int = 0, dw_selector: int = 0,
                               use_mmr: bool = False) -> bytes:
    """By-construction inverse of _decode_symbol_dict_huffman (test
    support). ``height_classes``: [(height, [rows_of_symbol, ...]), ...]
    in decode order; heights strictly follow the running-delta scheme and
    every class is closed with the DW table's OOB marker. ``use_mmr``
    emits the collective bitmap T.6-coded (BMSIZE = payload length);
    otherwise uncompressed with BMSIZE=0. ``export_runs``: alternating
    skip/export Table-B.1 run lengths (omitted = export-all, resolved
    without consuming runs)."""
    from .image_codecs import encode_ccitt_g4

    w = _BitWriter()
    dh_table = (dh_selector if isinstance(dh_selector, CustomHuffmanTable)
                else _SD_DH_TABLES[dh_selector])
    dw_table = (dw_selector if isinstance(dw_selector, CustomHuffmanTable)
                else _SD_DW_TABLES[dw_selector])
    current_height = 0
    for height, symbols in height_classes:
        encode_huffman_int(w, dh_table, height - current_height)
        current_height = height
        sym_width = 0
        widths = [len(rows[0]) for rows in symbols]
        for wd in widths:
            encode_huffman_int(w, dw_table, wd - sym_width)
            sym_width = wd
        encode_huffman_oob(w, dw_table)
        total_width = sum(widths)
        coll = [[0] * total_width for _ in range(height)]
        x0 = 0
        for rows in symbols:
            for y in range(height):
                row = rows[y]
                for x, v in enumerate(row):
                    coll[y][x0 + x] = v
            x0 += len(rows[0])
        if use_mmr:
            payload = encode_ccitt_g4(coll, total_width)
            encode_huffman_int(w, 1, len(payload))
            w.align()
            for b in payload:
                w.write(8, b)
        else:
            encode_huffman_int(w, 1, 0)
            w.align()
            for y in range(height):
                for x in range(total_width):
                    w.write(1, coll[y][x])
                w.align()
    for run in export_runs or ():
        encode_huffman_int(w, 1, run)
    return w.getvalue()


def encode_symbol_dict_huffman_refagg(height_classes: list,
                                      in_symbols: list,
                                      num_new_symbols: int,
                                      export_runs=None,
                                      refinement_template: int = 0) -> bytes:
    """By-construction inverse of the §6.5.8.2 SDHUFF=1 REFAGG decode
    path (test support). ``height_classes``:
    [(height, [symbol, ...]), ...] where each symbol is either
    (rows, ref_id, rdx, rdy) — a single refinement (REFAGGNINST=1:
    DW, 1 via B.1, raw SBSYMCODELEN-bit ID, RDX/RDY via B.15, BMSIZE
    via B.1, byte-aligned MQ refinement) — or
    (width, "agg", (dt, fs), instances, composed_rows) — a §6.5.8.2.1
    aggregate text region of [(curt, sid, ds, refine), ...] instances
    continuing the dictionary's bit stream. ref_id/sid index
    in_symbols + previously-encoded new symbols; GR contexts persist
    across the dictionary like the decoder's."""
    from .jbig2 import MQEncoder

    w = _BitWriter()
    id_bits = compute_symbol_id_codewidth(
        len(in_symbols) + num_new_symbols)
    pool = [(_bitmap_from_rows(r) if not isinstance(r, Bitmap) else r)
            for r in in_symbols]
    ref_contexts = new_contexts(1 << 13)
    current_height = 0
    for height, symbols in height_classes:
        encode_huffman_int(w, 4, height - current_height)
        current_height = height
        sym_width = 0
        for entry in symbols:
            if len(entry) == 5 and entry[1] == "agg":
                wd, _, (dt, fs), instances, composed = entry
                encode_huffman_int(w, 2, wd - sym_width)
                sym_width = wd
                encode_huffman_int(w, 1, len(instances))  # REFAGGNINST
                encode_text_region_huffman(
                    [(dt, fs, instances)], id_bits,
                    refine_symbols=pool,
                    refinement_template=refinement_template,
                    writer=w, gr_contexts=ref_contexts)
                pool.append(_bitmap_from_rows(composed))
                continue
            rows, ref_id, rdx, rdy = entry
            wd = len(rows[0])
            encode_huffman_int(w, 2, wd - sym_width)
            sym_width = wd
            encode_huffman_int(w, 1, 1)  # REFAGGNINST
            w.write(id_bits, ref_id)
            encode_huffman_int(w, 15, rdx)
            encode_huffman_int(w, 15, rdy)
            enc = MQEncoder()
            encode_refinement_region(
                rows, pool[ref_id], rdx, rdy, wd, height,
                refinement_template, enc, ref_contexts)
            payload = enc.flush() or b"\x00"
            encode_huffman_int(w, 1, len(payload))
            w.align()
            for b in payload:
                w.write(8, b)
            pool.append(_bitmap_from_rows(rows))
        encode_huffman_oob(w, 2)
    for run in export_runs or ():
        encode_huffman_int(w, 1, run)
    return w.getvalue()


def encode_symbol_dict_arith_refagg(height_classes: list,
                                    in_symbols: list,
                                    num_new_symbols: int,
                                    export_runs=None,
                                    refinement_template: int = 0) -> bytes:
    """By-construction inverse of the spec §6.5.8 ARITHMETIC REFAGG
    decode path (opt-in, SymbolDictParams.spec_refagg). Same entry
    shapes as encode_symbol_dict_huffman_refagg: (rows, ref_id, rdx,
    rdy) single refinements (IAAI=1, IAID, IARDX/IARDY, refinement in
    the SAME MQ stream) or (width, "agg", (dt, fs), instances,
    composed_rows) aggregate text regions; GR contexts persist across
    the dictionary, integer contexts are dictionary-level except the
    per-aggregate text-region set (mirroring the decoder)."""
    enc = MQEncoder()
    iadh = new_contexts(512)
    iadw = new_contexts(512)
    iaex = new_contexts(512)
    iaai = new_contexts(512)
    iardx = new_contexts(512)
    iardy = new_contexts(512)
    id_bits = compute_symbol_id_codewidth(
        len(in_symbols) + num_new_symbols)
    iaid = new_contexts(max(1 << id_bits, 2))
    grctx = new_contexts(1 << 13)
    pool = [(_bitmap_from_rows(r) if not isinstance(r, Bitmap) else r)
            for r in in_symbols]
    current_height = 0
    n_classes = len(height_classes)
    for ci, (height, symbols) in enumerate(height_classes):
        encode_integer_arith(enc, iadh, height - current_height)
        current_height = height
        total_width = 0
        for entry in symbols:
            if len(entry) == 5 and entry[1] == "agg":
                wd, _, (dt, fs), instances, composed = entry
                encode_integer_arith(enc, iadw, wd - total_width)
                total_width = wd
                encode_integer_arith(enc, iaai, len(instances))
                encode_text_region_arith(
                    [(dt, fs, instances)], id_bits,
                    refine_symbols=pool,
                    refinement_template=refinement_template,
                    enc=enc, gr_contexts=grctx)
                pool.append(_bitmap_from_rows(composed))
                continue
            rows, ref_id, rdx, rdy = entry
            wd = len(rows[0])
            encode_integer_arith(enc, iadw, wd - total_width)
            total_width = wd
            encode_integer_arith(enc, iaai, 1)
            encode_iaid(enc, iaid, ref_id, id_bits)
            encode_integer_arith(enc, iardx, rdx)
            encode_integer_arith(enc, iardy, rdy)
            encode_refinement_region(
                rows, pool[ref_id], rdx, rdy, wd, height,
                refinement_template, enc, grctx)
            pool.append(_bitmap_from_rows(rows))
        if ci != n_classes - 1:
            encode_integer_arith(enc, iadw, -81920)  # close the class
    for run in export_runs or ():
        encode_integer_arith(enc, iaex, run)
    return enc.flush()


def _bitmap_from_rows(rows: list) -> Bitmap:
    bm = Bitmap(len(rows[0]), len(rows))
    for y, row in enumerate(rows):
        for x, v in enumerate(row):
            if v:
                bm.set_pixel(x, y, 1)
    return bm


# ---------------------------------------------------------------------------
# Text region (text_region.rs, T.88 §6.4 as rendered)
# ---------------------------------------------------------------------------


class TextRegionFlags:
    """16-bit flags field, T.88 Table 9 (text_region.rs:61-84).
    SBDSOFFSET (bits 10-14, signed) and SBRTEMPLATE (bit 15) are parsed
    per spec since r9 — the reference ignores them (and ignores
    refinement entirely), so streams using them decode correctly only
    here."""

    __slots__ = ("uses_huffman", "uses_refinement", "log_strip_size",
                 "ref_corner", "is_transposed", "combination_operator",
                 "default_pixel", "s_offset", "refinement_template")

    @classmethod
    def from_u16(cls, flags: int) -> "TextRegionFlags":
        f = cls()
        f.uses_huffman = bool(flags & 0x0001)
        f.uses_refinement = bool(flags & 0x0002)
        f.log_strip_size = (flags >> 2) & 0x03
        f.ref_corner = (flags >> 4) & 0x03
        f.is_transposed = bool(flags & 0x0040)
        op = _combine_op_from_u8((flags >> 7) & 0x03)
        f.combination_operator = op if op >= 0 else OP_OR
        f.default_pixel = (flags >> 9) & 0x01
        ds_off = (flags >> 10) & 0x1F  # SBDSOFFSET: signed 5-bit
        f.s_offset = ds_off - 32 if ds_off > 15 else ds_off
        f.refinement_template = (flags >> 15) & 0x01
        return f


class TextRegionParams:
    __slots__ = ("flags", "width", "height", "num_instances",
                 "symbol_id_codewidth", "available_symbols", "at_pixels",
                 "huffman_tables", "spec_symbol_ids")

    def __init__(self, flags=None, width=0, height=0, num_instances=0,
                 symbol_id_codewidth=0, available_symbols=(),
                 at_pixels=(), huffman_tables=None,
                 spec_symbol_ids=False):
        self.flags = flags or TextRegionFlags.from_u16(0)
        self.width = width
        self.height = height
        self.num_instances = num_instances
        self.symbol_id_codewidth = symbol_id_codewidth
        self.available_symbols = list(available_symbols)
        self.at_pixels = tuple(at_pixels)
        self.huffman_tables = huffman_tables
        # T.88 §7.4.3.1.7: Huffman text regions carry a runcode-coded
        # symbol-ID code table before the instance data. The reference
        # reads raw fixed-width IDs instead (text_region.rs quirk,
        # pinned default); opt in for spec-conformant streams.
        self.spec_symbol_ids = spec_symbol_ids


def compute_symbol_id_codewidth(num_symbols: int) -> int:
    # text_region.rs:168-180: ceil(log2(n)), minimum 1
    if num_symbols <= 1:
        return 1
    return (num_symbols - 1).bit_length()


def compute_placement(s: int, t: int, symbol: Bitmap, ref_corner: int,
                      is_transposed: bool) -> tuple:
    # text_region.rs compute_placement
    sw, sh = symbol.width, symbol.height
    if is_transposed:
        if ref_corner == 1:
            return (t - sw, s)
        if ref_corner == 2:
            return (t, s - sh)
        if ref_corner == 3:
            return (t - sw, s - sh)
        return (t, s)
    if ref_corner == 1:
        return (s - sw, t)
    if ref_corner == 2:
        return (s, t - sh)
    if ref_corner == 3:
        return (s - sw, t - sh)
    return (s, t)


def decode_text_region(data: bytes, params: TextRegionParams) -> Bitmap:
    if params.num_instances > MAX_INSTANCE_COUNT:
        raise FilterError(
            f"Text region instance count {params.num_instances} exceeds "
            f"maximum {MAX_INSTANCE_COUNT}"
        )
    if params.flags.uses_huffman:
        return _decode_text_region_huffman(data, params)
    return _decode_text_region_arith(data, params)


def _decode_text_region_arith(data: bytes, params: TextRegionParams,
                              dec: "MQDecoder | None" = None,
                              gr_contexts: list | None = None) -> Bitmap:
    # text_region.rs decode_text_region_arith. ``dec``/``gr_contexts``:
    # the spec §6.5.8.2.1 symbol-dictionary aggregate composition
    # continues the dictionary's MQ stream and shares its GR contexts.
    if dec is None:
        if len(data) < 2:
            raise FilterError("Text region data too short")
        dec = MQDecoder(data)
    bitmap = Bitmap(params.width, params.height, params.flags.default_pixel)
    iadt = new_contexts(512)
    iafs = new_contexts(512)
    iads = new_contexts(512)
    iait = new_contexts(512)
    iaid = new_contexts(max(1 << params.symbol_id_codewidth, 2))
    # SBREFINE (§6.4.11 3(c)(viii-x)): per-instance RI bit, then the
    # placed bitmap refines the dictionary symbol in the SAME MQ stream
    # (GR contexts persist across the region) — beyond the reference,
    # whose text_region.rs ignores the refinement flag
    refine = params.flags.uses_refinement
    if refine:
        iari = new_contexts(512)
        iardw = new_contexts(512)
        iardh = new_contexts(512)
        iardx = new_contexts(512)
        iardy = new_contexts(512)
        grctx = gr_contexts if gr_contexts is not None \
            else new_contexts(1 << 13)

    strip_size = 1 << params.flags.log_strip_size
    stript = 0
    first_s = 0
    instances_decoded = 0
    symbols = params.available_symbols
    flags = params.flags

    while instances_decoded < params.num_instances:
        stript += decode_integer_arith(dec, iadt) * strip_size
        first_s += decode_integer_arith(dec, iafs)
        cur_s = first_s
        while True:
            if instances_decoded >= params.num_instances:
                break
            curt = (decode_integer_arith(dec, iait) if strip_size > 1 else 0)
            t = stript + curt
            if params.symbol_id_codewidth > 0:
                symbol_id = dec.decode_iaid(iaid, params.symbol_id_codewidth)
            else:
                symbol_id = 0
            symbol = symbols[symbol_id] if symbol_id < len(symbols) else None
            if refine and decode_integer_arith(dec, iari):
                # decode the refinement fields UNCONDITIONALLY: an
                # out-of-range symbol ID must not desynchronize the MQ
                # stream for every remaining instance.  With no symbol
                # the bitmap pass refines a 1x1 blank (best-effort
                # sync) and the result is discarded.
                rdw = decode_integer_arith(dec, iardw)
                rdh = decode_integer_arith(dec, iardh)
                rdx = decode_integer_arith(dec, iardx)
                rdy = decode_integer_arith(dec, iardy)
                refined = refine_instance(
                    symbol if symbol is not None else Bitmap(1, 1),
                    rdw, rdh, rdx, rdy, flags.refinement_template,
                    dec, grctx)
                if symbol is not None:
                    symbol = refined
            if symbol is not None:
                if flags.is_transposed:
                    px, py = compute_placement(t, cur_s, symbol,
                                               flags.ref_corner, True)
                else:
                    px, py = compute_placement(cur_s, t, symbol,
                                               flags.ref_corner, False)
                bitmap.combine(symbol, flags.combination_operator, px, py)
            instances_decoded += 1
            if instances_decoded >= params.num_instances:
                break
            cur_s += decode_integer_arith(dec, iads) + flags.s_offset
            if symbol is not None:
                cur_s += symbol.height if flags.is_transposed else symbol.width
    return bitmap


def _decode_symbol_id_table(reader: _BitReader,
                            n_syms: int) -> CustomHuffmanTable:
    """T.88 §7.4.3.1.7 symbol-ID code table: 35 four-bit runcode
    lengths, then per-symbol code lengths decoded with the runcode
    table (32 = repeat previous 3-6×, 33 = zeros 3-10×, 34 = zeros
    11-138×), byte-aligned at the end."""
    runlens = []
    for _ in range(35):
        v = 0
        for _ in range(4):
            v = (v << 1) | reader.read_bit()
        runlens.append(v)
    run_entries = [(l, 0, i) for i, l in enumerate(runlens) if l]
    if not run_entries:
        raise FilterError("symbol-ID runcode table is empty")
    run_table = CustomHuffmanTable(run_entries)
    lengths: list[int] = []
    prev = 0
    while len(lengths) < n_syms:
        c = decode_huffman_int(reader, run_table)
        if c < 32:
            lengths.append(c)
            if c:
                prev = c
        elif c == 32:
            rep = (reader.read_bit() << 1) | reader.read_bit()
            lengths.extend([prev] * (rep + 3))
        elif c == 33:
            rep = 0
            for _ in range(3):
                rep = (rep << 1) | reader.read_bit()
            lengths.extend([0] * (rep + 3))
        else:  # 34
            rep = 0
            for _ in range(7):
                rep = (rep << 1) | reader.read_bit()
            lengths.extend([0] * (rep + 11))
    entries = [(l, 0, i) for i, l in enumerate(lengths[:n_syms]) if l]
    if not entries:
        raise FilterError("symbol-ID code table has no coded symbols")
    reader.align()  # §7.4.3.1.7 step 7
    return CustomHuffmanTable(entries)


def _encode_symbol_id_table(w: _BitWriter,
                            lengths: list[int]) -> CustomHuffmanTable:
    """Inverse of _decode_symbol_id_table (test support): each distinct
    length value gets an equal-length runcode, no run-repeat codes."""
    used = sorted(set(lengths))
    run_len = max(1, (len(used) - 1).bit_length())
    runlens = [0] * 35
    for v in used:
        runlens[v] = run_len
    for l in runlens:
        w.write(4, l)
    run_table = CustomHuffmanTable([(run_len, 0, v) for v in used])
    for l in lengths:
        encode_huffman_int(w, run_table, l)
    w.align()
    return CustomHuffmanTable(
        [(l, 0, i) for i, l in enumerate(lengths) if l])


def _decode_text_region_huffman(data: bytes, params: TextRegionParams,
                                reader: "_BitReader | None" = None,
                                gr_contexts: list | None = None) -> Bitmap:
    # text_region.rs decode_text_region_huffman: DT/FS/DS hard-coded to
    # tables B11/B6/B8 (the parsed selectors are ignored — reference
    # quirk); symbol IDs are raw fixed-width bit reads by default, or
    # decoded through the §7.4.3.1.7 runcode table with spec_symbol_ids.
    # ``reader``/``gr_contexts``: the §6.5.8.2.1 symbol-dictionary
    # aggregate composition continues the dictionary's own bit stream
    # and shares its GR refinement contexts.
    if not data:
        raise FilterError("Empty data for Huffman text region")
    bitmap = Bitmap(params.width, params.height, params.flags.default_pixel)
    if reader is None:
        reader = _BitReader(data)
    refine = params.flags.uses_refinement
    if refine and gr_contexts is None:
        gr_contexts = new_contexts(1 << 13)
    sym_table = None
    if params.spec_symbol_ids:
        sym_table = _decode_symbol_id_table(
            reader, max(len(params.available_symbols), 1))
    strip_size = 1 << params.flags.log_strip_size
    stript = 0
    first_s = 0
    instances_decoded = 0
    symbols = params.available_symbols
    flags = params.flags

    while instances_decoded < params.num_instances:
        try:
            dt = decode_huffman_int(reader, 11)
        except (HuffmanOOB, FilterError):
            break
        stript += dt * strip_size
        try:
            fs = decode_huffman_int(reader, 6)
        except (HuffmanOOB, FilterError):
            break
        first_s += fs
        cur_s = first_s
        while True:
            if instances_decoded >= params.num_instances:
                break
            if strip_size > 1:
                try:
                    curt = decode_huffman_int(reader, 11)
                except (HuffmanOOB, FilterError):
                    curt = 0
            else:
                curt = 0
            t = stript + curt
            if sym_table is not None:
                try:
                    symbol_id = decode_huffman_int(reader, sym_table)
                except (HuffmanOOB, FilterError):
                    break
            elif params.symbol_id_codewidth > 0:
                try:
                    symbol_id = 0
                    for _ in range(params.symbol_id_codewidth):
                        symbol_id = (symbol_id << 1) | reader.read_bit()
                except FilterError:
                    break
            else:
                symbol_id = 0
            symbol = symbols[symbol_id] if symbol_id < len(symbols) else None
            if refine and reader.read_bit():
                # §6.4.11 SBHUFF refinement: RDW/RDH/RDX/RDY from Table
                # B.15, size from B.1 (SBHUFFRSIZE), then a byte-aligned
                # MQ refinement segment.  Fields are consumed even for
                # an out-of-range symbol ID (the length-prefixed bitmap
                # is simply skipped) so the bit stream stays in sync.
                rdw = decode_huffman_int(reader, 15)
                rdh = decode_huffman_int(reader, 15)
                rdx = decode_huffman_int(reader, 15)
                rdy = decode_huffman_int(reader, 15)
                bmsize = decode_huffman_int(reader, 1)
                reader.align()
                start = reader.pos >> 3
                if bmsize <= 0 or start + bmsize > len(data):
                    raise FilterError(
                        "text region refinement bitmap truncated")
                if symbol is not None:
                    symbol = refine_instance(
                        symbol, rdw, rdh, rdx, rdy,
                        flags.refinement_template,
                        MQDecoder(data[start:start + bmsize]), gr_contexts)
                reader.pos = (start + bmsize) << 3
            if symbol is not None:
                if flags.is_transposed:
                    px, py = compute_placement(t, cur_s, symbol,
                                               flags.ref_corner, True)
                else:
                    px, py = compute_placement(cur_s, t, symbol,
                                               flags.ref_corner, False)
                bitmap.combine(symbol, flags.combination_operator, px, py)
            instances_decoded += 1
            if instances_decoded >= params.num_instances:
                break
            try:
                ds = decode_huffman_int(reader, 8)
            except (HuffmanOOB, FilterError):
                break
            cur_s += ds + flags.s_offset
            if symbol is not None:
                cur_s += symbol.height if flags.is_transposed else symbol.width
    return bitmap


def encode_text_region_arith(strips: list, codewidth: int,
                             strip_size: int = 1,
                             refine_symbols: list | None = None,
                             refinement_template: int = 0,
                             enc: "MQEncoder | None" = None,
                             gr_contexts: list | None = None) -> bytes:
    """Inverse of _decode_text_region_arith (test support).

    ``strips``: [(dt, fs, [(curt, symbol_id[, ds]), ...]), ...]; dt is
    the pre-multiplication strip delta, fs the first-S delta. All
    emitted integers must be representable. The reference's integer
    scheme has NO OOB sentinel, so the arithmetic inner loop can only
    terminate on the total instance count — multi-strip regions are
    inexpressible in arith mode (use the Huffman encoder, whose B8
    table carries a real OOB)."""
    if len(strips) > 1:
        raise ValueError(
            "arith text regions cannot terminate a strip early "
            "(no OOB in the reference integer scheme) — single strip only"
        )
    shared = enc is not None
    if enc is None:
        enc = MQEncoder()
    iadt = new_contexts(512)
    iafs = new_contexts(512)
    iads = new_contexts(512)
    iait = new_contexts(512)
    iaid = new_contexts(max(1 << codewidth, 2))
    refine = refine_symbols is not None
    if refine:
        pool = [r if isinstance(r, Bitmap) else _bitmap_from_rows(r)
                for r in refine_symbols]
        iari = new_contexts(512)
        iardw = new_contexts(512)
        iardh = new_contexts(512)
        iardx = new_contexts(512)
        iardy = new_contexts(512)
        grctx = gr_contexts if gr_contexts is not None \
            else new_contexts(1 << 13)
    for dt, fs, instances in strips:
        encode_integer_arith(enc, iadt, dt)
        encode_integer_arith(enc, iafs, fs)
        for i, inst in enumerate(instances):
            curt, symbol_id = inst[0], inst[1]
            ds = inst[2] if len(inst) > 2 else 0
            rf = inst[3] if len(inst) > 3 else None
            if strip_size > 1:
                encode_integer_arith(enc, iait, curt)
            if codewidth > 0:
                encode_iaid(enc, iaid, symbol_id, codewidth)
            if refine:
                encode_integer_arith(enc, iari, 1 if rf else 0)
                if rf:
                    rows, rdx, rdy = rf
                    ref = pool[symbol_id]
                    rdw = len(rows[0]) - ref.width
                    rdh = len(rows) - ref.height
                    encode_integer_arith(enc, iardw, rdw)
                    encode_integer_arith(enc, iardh, rdh)
                    encode_integer_arith(enc, iardx, rdx)
                    encode_integer_arith(enc, iardy, rdy)
                    encode_refinement_region(
                        rows, ref, (rdw >> 1) + rdx, (rdh >> 1) + rdy,
                        ref.width + rdw, ref.height + rdh,
                        refinement_template, enc, grctx)
            if i != len(instances) - 1:
                encode_integer_arith(enc, iads, ds)
    return b"" if shared else enc.flush()


def encode_text_region_huffman(strips: list, codewidth: int,
                               strip_size: int = 1,
                               spec_symbol_ids: bool = False,
                               num_symbols: int = 0,
                               id_lengths: list | None = None,
                               refine_symbols: list | None = None,
                               refinement_template: int = 0,
                               writer: "_BitWriter | None" = None,
                               gr_contexts: list | None = None) -> bytes:
    """Inverse of _decode_text_region_huffman (tables B11/B6/B8). A
    non-final strip terminates with B8's OOB marker in the DS slot —
    the only strip terminator the decoder recognises.
    ``spec_symbol_ids`` prepends the §7.4.3.1.7 runcode symbol-ID table
    (``id_lengths`` per symbol, default uniform = fixed-width parity)
    and codes IDs through it. ``refine_symbols``: the symbol pool (row
    grids or Bitmaps) — enables SBREFINE emission; an instance may then
    carry a 4th element (rows, rdx, rdy) refining its symbol.
    ``writer``/``gr_contexts``: continue an outer bit stream (the
    §6.5.8.2.1 symbol-dictionary aggregate case)."""
    w = writer if writer is not None else _BitWriter()
    refine = refine_symbols is not None
    if refine:
        pool = [r if isinstance(r, Bitmap) else _bitmap_from_rows(r)
                for r in refine_symbols]
        if gr_contexts is None:
            gr_contexts = new_contexts(1 << 13)
    sym_table = None
    if spec_symbol_ids:
        lengths = id_lengths or [max(codewidth, 1)] * max(num_symbols, 1)
        sym_table = _encode_symbol_id_table(w, list(lengths))
    for si, (dt, fs, instances) in enumerate(strips):
        encode_huffman_int(w, 11, dt)
        encode_huffman_int(w, 6, fs)
        for i, inst in enumerate(instances):
            curt, symbol_id = inst[0], inst[1]
            ds = inst[2] if len(inst) > 2 else 0
            rf = inst[3] if len(inst) > 3 else None
            if strip_size > 1:
                encode_huffman_int(w, 11, curt)
            if sym_table is not None:
                encode_huffman_int(w, sym_table, symbol_id)
            elif codewidth > 0:
                w.write(codewidth, symbol_id)
            if refine:
                w.write(1, 1 if rf else 0)
                if rf:
                    rows, rdx, rdy = rf
                    ref = pool[symbol_id]
                    rdw = len(rows[0]) - ref.width
                    rdh = len(rows) - ref.height
                    for v in (rdw, rdh, rdx, rdy):
                        encode_huffman_int(w, 15, v)
                    enc = MQEncoder()
                    encode_refinement_region(
                        rows, ref, (rdw >> 1) + rdx, (rdh >> 1) + rdy,
                        ref.width + rdw, ref.height + rdh,
                        refinement_template, enc, gr_contexts)
                    payload = enc.flush() or b"\x00"
                    encode_huffman_int(w, 1, len(payload))
                    w.align()
                    for b in payload:
                        w.write(8, b)
            if i != len(instances) - 1:
                encode_huffman_int(w, 8, ds)
        if si != len(strips) - 1:
            encode_huffman_oob(w, 8)  # close the strip
    return w.getvalue()


# ---------------------------------------------------------------------------
# Pattern dictionary + halftone region (halftone_region.rs, T.88 §6.6-6.7)
# ---------------------------------------------------------------------------


class PatternDictionary:
    __slots__ = ("patterns", "pattern_width", "pattern_height")

    def __init__(self, width: int, height: int):
        self.patterns: list = []
        self.pattern_width = width
        self.pattern_height = height


class PatternDictFlags:
    __slots__ = ("uses_mmr", "template", "pattern_width", "pattern_height",
                 "gray_max")

    @classmethod
    def from_bytes(cls, data: bytes) -> "PatternDictFlags":
        # halftone_region.rs:103-137: 1 flag byte, width, height, gray max
        if len(data) < 7:
            raise FilterError("Pattern dictionary flags require 7 bytes")
        f = cls()
        f.uses_mmr = bool(data[0] & 0x01)
        f.template = (data[0] >> 1) & 0x03
        f.pattern_width = data[1]
        f.pattern_height = data[2]
        f.gray_max = int.from_bytes(data[3:7], "big")
        return f


def decode_pattern_dict(data: bytes, flags: PatternDictFlags) -> PatternDictionary:
    """One collective bitmap of width pw*(gray_max+1), split into
    patterns (halftone_region.rs decode_pattern_dict)."""
    num_patterns = flags.gray_max + 1
    pw, ph = flags.pattern_width, flags.pattern_height
    params = GenericRegionParams(pw * num_patterns, ph,
                                 template=flags.template,
                                 is_mmr=flags.uses_mmr)
    if flags.uses_mmr:
        collective = decode_generic_region_mmr(data, params)
    else:
        collective = decode_generic_region_arith(data, params)
    dict_ = PatternDictionary(pw, ph)
    for i in range(num_patterns):
        x_off = i * pw
        pattern = Bitmap(pw, ph)
        for y in range(ph):
            for x in range(pw):
                pattern.set_pixel(x, y, collective.get_pixel(x_off + x, y))
        dict_.patterns.append(pattern)
    return dict_


class HalftoneRegionFlags:
    __slots__ = ("uses_mmr", "template", "enable_skip",
                 "combination_operator", "default_pixel", "grid_width",
                 "grid_height", "grid_offset_x", "grid_offset_y",
                 "grid_vector_x", "grid_vector_y")

    @classmethod
    def from_bytes(cls, data: bytes) -> "HalftoneRegionFlags":
        # halftoneregion.rs:240-289 (vector fields optional past byte 17)
        if len(data) < 17:
            raise FilterError("Halftone region flags require at least 17 bytes")
        f = cls()
        b = data[0]
        f.uses_mmr = bool(b & 0x01)
        f.template = (b >> 1) & 0x03
        f.enable_skip = bool(b & 0x08)
        op = _combine_op_from_u8((b >> 4) & 0x07)
        f.combination_operator = op if op >= 0 else OP_OR
        f.default_pixel = (b >> 7) & 0x01
        f.grid_width = int.from_bytes(data[1:5], "big")
        f.grid_height = int.from_bytes(data[5:9], "big")
        f.grid_offset_x = int.from_bytes(data[9:13], "big", signed=True)
        f.grid_offset_y = int.from_bytes(data[13:17], "big", signed=True)
        f.grid_vector_x = int.from_bytes(data[17:19], "big") if len(data) >= 19 else 0
        f.grid_vector_y = int.from_bytes(data[19:21], "big") if len(data) >= 21 else 0
        return f


class HalftoneRegionParams:
    __slots__ = ("flags", "width", "height", "patterns", "at_pixels")

    def __init__(self, flags, width, height, patterns, at_pixels=()):
        self.flags = flags
        self.width = width
        self.height = height
        self.patterns = patterns
        self.at_pixels = tuple(at_pixels)


def decode_halftone_region(data: bytes, params: HalftoneRegionParams) -> Bitmap:
    """halftone_region.rs decode_halftone_region: bit planes LSB-first,
    each plane a generic region advanced by its consumed byte count."""
    flags = params.flags
    gw, gh = flags.grid_width, flags.grid_height
    num_patterns = len(params.patterns.patterns)
    if num_patterns == 0:
        return Bitmap(params.width, params.height, flags.default_pixel)
    num_planes = 1 if num_patterns <= 1 else (num_patterns - 1).bit_length()

    plane_params = GenericRegionParams(
        gw, gh, template=flags.template, is_mmr=flags.uses_mmr,
        at_pixels=params.at_pixels)
    planes = []
    offset = 0
    for _ in range(num_planes):
        remaining = data[min(offset, len(data)):]
        if flags.uses_mmr:
            plane, consumed = decode_generic_region_mmr_with_consumed(
                remaining, plane_params)
        else:
            plane, consumed = decode_generic_region_arith_with_consumed(
                remaining, plane_params)
        planes.append(plane)
        offset += max(consumed, 1)

    bitmap = Bitmap(params.width, params.height, flags.default_pixel)
    vx, vy = flags.grid_vector_x, flags.grid_vector_y
    patterns = params.patterns.patterns
    for gy in range(gh):
        for gx in range(gw):
            gray = 0
            for idx, plane in enumerate(planes):
                gray |= plane.get_pixel(gx, gy) << idx
            if gray < len(patterns):
                # non-negative operands: trunc-div == floor-div
                x = flags.grid_offset_x + (gx * vx) // 256 + (gy * vy) // 256
                y = flags.grid_offset_y + (gx * vy) // 256 - (gy * vx) // 256
                bitmap.combine(patterns[gray], flags.combination_operator, x, y)
    return bitmap


def measure_consumed(coded: bytes, params: GenericRegionParams) -> int:
    """Bytes the decoder actually reads from ``coded`` (payload builders
    concatenate planes at exactly this boundary — bytes past it are
    never read, so truncation preserves the decode)."""
    if params.is_mmr:
        _, consumed = decode_generic_region_mmr_with_consumed(coded, params)
    else:
        _, consumed = decode_generic_region_arith_with_consumed(coded, params)
    return consumed


def stable_plane_bytes(coded: bytes, params: GenericRegionParams) -> bytes:
    """Wire bytes for one bit plane whose consumed count survives
    concatenation. The MQ decoder's position is context-SENSITIVE at the
    buffer edge: an end-of-data BYTEIN consumes nothing, but the same
    BYTEIN consumes a real byte once more data follows (and after a wire
    0xFF the marker check peeks the next byte). Padding with zero slack
    until the measured position stops short of the buffer end guarantees
    the decode never reached end-of-data, so every BYTEIN consumed an
    in-plane byte and appending the next plane cannot shift the
    boundary."""
    if params.is_mmr:
        return coded[: measure_consumed(coded, params)]
    buf = coded + b"\x00" * 4
    while True:
        consumed = measure_consumed(buf, params)
        if consumed < len(buf):
            return buf[:consumed]
        buf += b"\x00" * 4


def encode_halftone_planes(gray_rows: list, gw: int, gh: int,
                           num_planes: int, template: int = 0,
                           mmr: bool = False) -> bytes:
    """Concatenated bit-plane payload (LSB plane first), each plane
    truncated to its measured consumed length (test support)."""
    out = bytearray()
    params = GenericRegionParams(gw, gh, template=template, is_mmr=mmr)
    for b in range(num_planes):
        rows = [[(gray_rows[y][x] >> b) & 1 for x in range(gw)]
                for y in range(gh)]
        if mmr:
            from .image_codecs import encode_ccitt_g4

            coded = encode_ccitt_g4(rows, gw)
        else:
            coded = encode_generic_region_arith(rows, gw, gh, template)
        out += stable_plane_bytes(coded, params)
    return bytes(out)


# ---------------------------------------------------------------------------
# Segment payload builders (wire formats jbig2.rs parses; test support)
# ---------------------------------------------------------------------------


def _at_bytes(at_pixels) -> bytes:
    out = bytearray()
    for dx, dy in at_pixels:
        out.append(dx & 0xFF)
        out.append(dy & 0xFF)
    return bytes(out)


def build_symbol_dict_payload(height_classes: list, num_exported: int,
                              template: int = 0, at_pixels=None,
                              export_runs=None) -> bytes:
    """Flags + AT pixels + counts + arith-coded data, shaped for
    Jbig2Decoder._process_symbol_dict."""
    if at_pixels is None:
        at_pixels = ([(3, -1), (-3, -1), (2, -2), (-2, -2)]
                     if template == 0 else [(3, -1)])
    flags = (template & 0x03) << 10
    num_new = sum(len(syms) for _, syms in height_classes)
    out = bytearray()
    out += flags.to_bytes(2, "big")
    out += _at_bytes(at_pixels)
    out += num_exported.to_bytes(4, "big")
    out += num_new.to_bytes(4, "big")
    out += encode_symbol_dict_arith(height_classes, template,
                                    tuple(at_pixels), export_runs)
    return bytes(out)


def build_symbol_dict_payload_huffman(height_classes: list,
                                      num_exported: int,
                                      export_runs=None,
                                      dh_selector: int = 0,
                                      dw_selector: int = 0,
                                      use_mmr: bool = False) -> bytes:
    """Huffman-SD variant of build_symbol_dict_payload: flags with
    SDHUFF=1 (+table selectors), counts, T.88 §6.5 Huffman-coded data —
    no AT pixels (not present when SDHUFF=1). Shaped for
    Jbig2Decoder._process_symbol_dict."""
    dh_bits = 3 if isinstance(dh_selector, CustomHuffmanTable) \
        else dh_selector & 0x03
    dw_bits = 3 if isinstance(dw_selector, CustomHuffmanTable) \
        else dw_selector & 0x03
    flags = 0x0001 | (dh_bits << 2) | (dw_bits << 4)
    num_new = sum(len(syms) for _, syms in height_classes)
    out = bytearray()
    out += flags.to_bytes(2, "big")
    out += num_exported.to_bytes(4, "big")
    out += num_new.to_bytes(4, "big")
    out += encode_symbol_dict_huffman(height_classes, export_runs,
                                      dh_selector, dw_selector, use_mmr)
    return bytes(out)


def build_symbol_dict_payload_huffman_refagg(
        height_classes: list, in_symbols: list, num_exported: int,
        export_runs=None, refinement_template: int = 0) -> bytes:
    """Segment payload for a SDHUFF=1 SDREFAGG=1 symbol dictionary:
    flags, refinement AT pixels (nominal, present only for template 0
    per §7.4.3.1.3), counts, then the §6.5.8.2 refinement-aggregated
    body. Shaped for Jbig2Decoder._process_symbol_dict; in_symbols
    must arrive via referred symbol-dictionary segments."""
    flags = 0x0003 | ((refinement_template & 1) << 12)
    num_new = sum(len(syms) for _, syms in height_classes)
    out = bytearray()
    out += flags.to_bytes(2, "big")
    if refinement_template == 0:
        # nominal GR AT positions (A1 = (-1, -1), A2 = (-1, -1))
        out += bytes([0xFF, 0xFF, 0xFF, 0xFF])
    out += num_exported.to_bytes(4, "big")
    out += num_new.to_bytes(4, "big")
    out += encode_symbol_dict_huffman_refagg(
        height_classes, in_symbols, num_new, export_runs,
        refinement_template)
    return bytes(out)


def build_text_region_payload(strips: list, width: int, height: int,
                              num_symbols: int, x: int = 0, y: int = 0,
                              combination_operator: int = 0,
                              ref_corner: int = 0, transposed: bool = False,
                              log_strip_size: int = 0,
                              place_operator: int = OP_OR,
                              default_pixel: int = 0,
                              huffman: bool = False,
                              huffman_table_bits: int = 0,
                              spec_symbol_ids: bool = False,
                              id_lengths: list | None = None,
                              refine_symbols: list | None = None,
                              refinement_template: int = 0,
                              s_offset: int = 0) -> bytes:
    """Region info + flags (+huffman tables) + instance count + coded
    placement data, shaped for Jbig2Decoder._process_text_region.
    ``refine_symbols`` enables SBREFINE: instances may carry a 4th
    element (rows, rdx, rdy) refining their symbol (§6.4.11)."""
    codewidth = compute_symbol_id_codewidth(num_symbols)
    num_instances = sum(len(insts) for _, _, insts in strips)
    refine = refine_symbols is not None
    flags = ((1 if huffman else 0)
             | (0x0002 if refine else 0)
             | ((log_strip_size & 0x03) << 2)
             | ((ref_corner & 0x03) << 4)
             | (0x0040 if transposed else 0)
             | ((place_operator & 0x03) << 7)
             | ((default_pixel & 0x01) << 9)
             | ((s_offset & 0x1F) << 10)
             | ((refinement_template & 0x01) << 15))
    out = bytearray()
    out += width.to_bytes(4, "big")
    out += height.to_bytes(4, "big")
    out += x.to_bytes(4, "big")
    out += y.to_bytes(4, "big")
    out.append(combination_operator & 0x07)
    out += flags.to_bytes(2, "big")
    if huffman:
        out += huffman_table_bits.to_bytes(2, "big")
    if refine and refinement_template == 0:
        out += bytes([0xFF, 0xFF, 0xFF, 0xFF])  # nominal GR AT pairs
    out += num_instances.to_bytes(4, "big")
    strip_size = 1 << log_strip_size
    if huffman:
        out += encode_text_region_huffman(
            strips, codewidth, strip_size,
            spec_symbol_ids=spec_symbol_ids, num_symbols=num_symbols,
            id_lengths=id_lengths, refine_symbols=refine_symbols,
            refinement_template=refinement_template)
    else:
        out += encode_text_region_arith(
            strips, codewidth, strip_size,
            refine_symbols=refine_symbols,
            refinement_template=refinement_template)
    return bytes(out)


def build_pattern_dict_payload(patterns: list, template: int = 0,
                               mmr: bool = False) -> bytes:
    """Flags + collective-bitmap data for _process_pattern_dict.
    ``patterns``: equal-sized 0/1 row-lists, index = gray value."""
    pw = len(patterns[0][0])
    ph = len(patterns[0])
    gray_max = len(patterns) - 1
    collective = [[patterns[i][y][x] for i in range(len(patterns))
                   for x in range(pw)] for y in range(ph)]
    out = bytearray()
    out.append((1 if mmr else 0) | ((template & 0x03) << 1))
    out.append(pw)
    out.append(ph)
    out += gray_max.to_bytes(4, "big")
    if mmr:
        from .image_codecs import encode_ccitt_g4

        out += encode_ccitt_g4(collective, pw * len(patterns))
    else:
        out += encode_generic_region_arith(
            collective, pw * len(patterns), ph, template)
    return bytes(out)


def build_halftone_payload(gray_rows: list, width: int, height: int,
                           num_patterns: int, x: int = 0, y: int = 0,
                           combination_operator: int = 0,
                           grid_offset_x: int = 0, grid_offset_y: int = 0,
                           grid_vector_x: int = 256, grid_vector_y: int = 0,
                           template: int = 0, mmr: bool = False,
                           place_operator: int = OP_OR,
                           default_pixel: int = 0) -> bytes:
    """Region info + halftone flags + bit-plane data for
    _process_halftone_region. ``gray_rows``: gh x gw gray values."""
    gh = len(gray_rows)
    gw = len(gray_rows[0])
    num_planes = 1 if num_patterns <= 1 else (num_patterns - 1).bit_length()
    flags = ((1 if mmr else 0) | ((template & 0x03) << 1)
             | ((place_operator & 0x07) << 4)
             | ((default_pixel & 0x01) << 7))
    out = bytearray()
    out += width.to_bytes(4, "big")
    out += height.to_bytes(4, "big")
    out += x.to_bytes(4, "big")
    out += y.to_bytes(4, "big")
    out.append(combination_operator & 0x07)
    out.append(flags)
    out += gw.to_bytes(4, "big")
    out += gh.to_bytes(4, "big")
    out += grid_offset_x.to_bytes(4, "big", signed=True)
    out += grid_offset_y.to_bytes(4, "big", signed=True)
    out += grid_vector_x.to_bytes(2, "big")
    out += grid_vector_y.to_bytes(2, "big")
    out += encode_halftone_planes(gray_rows, gw, gh, num_planes,
                                  template, mmr)
    return bytes(out)

"""JBIG2 symbol-dictionary / text-region / halftone tests
(kernel/jbig2_regions.py).

Parity target: reference filter_impls/{symbol_dict, text_region,
halftone_region, huffman, bitstream}.rs. Round-trip validation by
construction, as in test_jbig2.py: every encoder here mirrors the
transcribed decoder's walk, so green round trips pin the decoder.
"""

from __future__ import annotations

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from oxidizepdf_spark.kernel.filters import FilterError
from oxidizepdf_spark.kernel.image_codecs import _BitReader, _BitWriter
from oxidizepdf_spark.kernel.jbig2 import (
    SEG_IMMEDIATE_GENERIC_REGION,
    SEG_IMMEDIATE_HALFTONE_REGION,
    SEG_IMMEDIATE_LOSSLESS_TEXT_REGION,
    SEG_IMMEDIATE_TEXT_REGION,
    SEG_INTERMEDIATE_TEXT_REGION,
    SEG_PAGE_INFORMATION,
    SEG_PATTERN_DICTIONARY,
    SEG_SYMBOL_DICTIONARY,
    Bitmap,
    GenericRegionParams,
    Jbig2Decoder,
    MQDecoder,
    MQEncoder,
    OP_XOR,
    build_generic_region_payload,
    build_page_info_payload,
    build_segment,
    decode_jbig2,
    encode_generic_region_arith,
    new_contexts,
)
from oxidizepdf_spark.kernel.jbig2_regions import (
    HuffmanOOB,
    STANDARD_TABLES,
    SymbolDictFlags,
    SymbolDictParams,
    TextRegionFlags,
    build_halftone_payload,
    build_pattern_dict_payload,
    build_symbol_dict_payload,
    build_symbol_dict_payload_huffman,
    build_text_region_payload,
    compile_huffman_table,
    compute_symbol_id_codewidth,
    decode_generic_region_arith_with_consumed,
    decode_generic_region_mmr_with_consumed,
    decode_huffman_int,
    decode_refinement_region,
    decode_symbol_dict,
    encode_huffman_int,
    encode_huffman_oob,
    encode_refinement_region,
)


def _bm(rows):
    b = Bitmap(len(rows[0]), len(rows))
    for y, row in enumerate(rows):
        for x, v in enumerate(row):
            b.set_pixel(x, y, v)
    return b


def _grid(bm_bytes, w, h):
    stride = (w + 7) // 8
    return [[(bm_bytes[y * stride + (x >> 3)] >> (7 - (x & 7))) & 1
             for x in range(w)] for y in range(h)]


def _place(exp_rows, sym_rows, px, py):
    for yy, row in enumerate(sym_rows):
        for xx, v in enumerate(row):
            if v and 0 <= py + yy < len(exp_rows) and 0 <= px + xx < len(exp_rows[0]):
                exp_rows[py + yy][px + xx] |= v


# ---------------------------------------------------------------------------
# Huffman (T.88 Annex B as the reference renders it)
# ---------------------------------------------------------------------------


class TestHuffman:
    def test_canonical_codes_b1(self):
        # B.1 sorted lens 1,2,3,3 -> codes 0, 10, 110, 111
        compiled = compile_huffman_table(STANDARD_TABLES[1])
        assert [(c, l) for c, l, _ in compiled] == [
            (0b0, 1), (0b10, 2), (0b110, 3), (0b111, 3)]

    def test_stable_sort_preserves_same_length_order(self):
        # B.3 has an 8-bit entry FIRST in list order (range -256) and
        # another 8-bit LAST (-257); stable sort keeps that order, so
        # the first 8-bit code maps to -256's range
        compiled = compile_huffman_table(STANDARD_TABLES[3])
        eights = [(c, e) for c, l, e in compiled if l == 8]
        assert eights[0][1][2] == -256
        assert eights[1][1][2] == -257
        assert eights[1][0] == eights[0][0] + 1

    @pytest.mark.parametrize("table", sorted(STANDARD_TABLES, key=str))
    def test_roundtrip_representative_values(self, table):
        # every non-OOB entry: low end, mid, high end of its range
        values = []
        for entry in STANDARD_TABLES[table]:
            if len(entry) > 3 and entry[3]:
                continue
            plen, rlen, rlow = entry[0], entry[1], entry[2]
            span = (1 << rlen) if rlen < 32 else (1 << 20)  # cap the probe
            values.append(rlow)
            if rlen:
                values.append(rlow + span - 1)
                values.append(rlow + span // 2)
        w = _BitWriter()
        for v in values:
            encode_huffman_int(w, table, v)
        reader = _BitReader(w.getvalue())
        got = [decode_huffman_int(reader, table) for _ in values]
        assert got == values

    def test_oob_raises(self):
        w = _BitWriter()
        encode_huffman_oob(w, 2)
        reader = _BitReader(w.getvalue())
        with pytest.raises(HuffmanOOB):
            decode_huffman_int(reader, 2)

    def test_no_oob_entry_in_b1(self):
        with pytest.raises(ValueError):
            encode_huffman_oob(_BitWriter(), 1)

    def test_end_of_data_raises_filter_error(self):
        reader = _BitReader(b"")
        with pytest.raises(FilterError):
            decode_huffman_int(reader, 1)

    def test_3sd_lower_range_is_subtractive(self):
        # T.88 Table B.3's lower-range line decodes -257 - extra (the
        # reference's rendering omits the line entirely; the
        # spec-complete "3sd" must use the subtractive form, else a
        # conformant stream's width delta comes back wrong/positive).
        w = _BitWriter()
        encode_huffman_int(w, "3sd", -300)
        r = _BitReader(w.getvalue())
        assert decode_huffman_int(r, "3sd") == -300
        # and by raw construction: lower-range prefix + extra bits
        compiled = compile_huffman_table(STANDARD_TABLES["3sd"])
        (code, plen), = [(c, l) for c, l, e in compiled
                         if e[1] == 32 and e[2] == -257]
        w2 = _BitWriter()
        w2.write(plen, code)
        w2.write(32, 43)
        r2 = _BitReader(w2.getvalue())
        assert decode_huffman_int(r2, "3sd") == -257 - 43

    @given(st.lists(st.integers(-2048, 4000), min_size=1, max_size=60))
    @settings(max_examples=40, deadline=None)
    def test_roundtrip_hypothesis_b6(self, values):
        w = _BitWriter()
        for v in values:
            encode_huffman_int(w, 6, v)
        reader = _BitReader(w.getvalue())
        assert [decode_huffman_int(reader, 6) for _ in values] == values


# ---------------------------------------------------------------------------
# Refinement region (symbol_dict.rs:189-275)
# ---------------------------------------------------------------------------


class TestRefinementRegion:
    @pytest.mark.parametrize("template", [0, 1])
    @pytest.mark.parametrize("dx,dy", [(0, 0), (2, 3), (-1, -2)])
    def test_roundtrip(self, template, dx, dy):
        rng = random.Random(31 * template + dx + dy)
        w, h = 14, 9
        ref_rows = [[rng.randint(0, 1) for _ in range(w)] for _ in range(h)]
        rows = [r[:] for r in ref_rows]
        # flip a few pixels vs the reference
        for _ in range(6):
            x, y = rng.randrange(w), rng.randrange(h)
            rows[y][x] ^= 1
        reference = _bm(ref_rows)
        enc = MQEncoder()
        cx = new_contexts(1 << 13)
        encode_refinement_region(rows, reference, dx, dy, w, h, template,
                                 enc, cx)
        dec = MQDecoder(enc.flush())
        cx2 = new_contexts(1 << 13)
        got = decode_refinement_region(reference, dx, dy, w, h, template,
                                       (), dec, cx2)
        assert _grid(got.to_packed_bytes(), w, h) == rows


# ---------------------------------------------------------------------------
# Symbol dictionary
# ---------------------------------------------------------------------------

SYM_A = [[1, 0], [1, 0], [1, 1]]                       # 2x3
SYM_B = [[1, 1, 1], [0, 1, 0], [0, 1, 0]]              # 3x3
SYM_C = [[1, 1, 1]] * 2 + [[1, 0, 1]] * 2 + [[1, 1, 1]] * 2  # 3x6
CLASSES = [(3, [SYM_A, SYM_B]), (6, [SYM_C])]


def _decode_dict(payload, referred=()):
    flags = SymbolDictFlags.from_u16((payload[0] << 8) | payload[1])
    n_at = 4 if flags.template == 0 else 1
    offset = 2 + 2 * n_at
    at = []
    for i in range(n_at):
        dx = payload[2 + 2 * i]
        dy = payload[3 + 2 * i]
        at.append((dx - 256 if dx > 127 else dx, dy - 256 if dy > 127 else dy))
    num_exported = int.from_bytes(payload[offset : offset + 4], "big")
    num_new = int.from_bytes(payload[offset + 4 : offset + 8], "big")
    params = SymbolDictParams(flags=flags, at_pixels=at,
                              num_exported=num_exported,
                              num_new_symbols=num_new,
                              referred_symbols=list(referred))
    return decode_symbol_dict(payload[offset + 8 :], params)


class TestSymbolDict:
    def test_height_classes_roundtrip(self):
        d = _decode_dict(build_symbol_dict_payload(CLASSES, num_exported=3))
        assert len(d.all_symbols) == 3
        got = [_grid(s.to_packed_bytes(), s.width, s.height)
               for s in d.all_symbols]
        assert got == [SYM_A, SYM_B, SYM_C]
        assert len(d.exported_symbols) == 3  # export-all, no IAEX consumed

    @pytest.mark.parametrize("template", [0, 1, 2, 3])
    def test_templates(self, template):
        d = _decode_dict(build_symbol_dict_payload(
            CLASSES, num_exported=3, template=template))
        got = [_grid(s.to_packed_bytes(), s.width, s.height)
               for s in d.all_symbols]
        assert got == [SYM_A, SYM_B, SYM_C]

    def test_partial_export_runs(self):
        # skip 1, export 2: exports SYM_B and SYM_C
        payload = build_symbol_dict_payload(CLASSES, num_exported=2,
                                            export_runs=(1, 2))
        d = _decode_dict(payload)
        got = [_grid(s.to_packed_bytes(), s.width, s.height)
               for s in d.exported_symbols]
        assert got == [SYM_B, SYM_C]

    def test_export_shortfall_fills_from_end(self):
        # runs skip past everything: decoder refills from the END
        payload = build_symbol_dict_payload(CLASSES, num_exported=1,
                                            export_runs=(3, 0))
        d = _decode_dict(payload)
        assert len(d.exported_symbols) == 1
        s = d.exported_symbols[0]
        assert _grid(s.to_packed_bytes(), s.width, s.height) == SYM_C

    def test_referred_symbols_prepend(self):
        referred = [_bm(SYM_C)]
        payload = build_symbol_dict_payload([(3, [SYM_A])], num_exported=2)
        d = _decode_dict(payload, referred=referred)
        got = [_grid(s.to_packed_bytes(), s.width, s.height)
               for s in d.all_symbols]
        assert got == [SYM_C, SYM_A]

    def test_huffman_mode_malformed_raises(self):
        # b"\x00\x00" in Huffman mode decodes DH=1, then DW=0 -> running
        # width 0, out of range (formerly: Huffman SD was an explicit
        # not-implemented error matching symbol_dict.rs:441-454; the
        # decoder now goes beyond the reference — see
        # TestHuffmanSymbolDict)
        params = SymbolDictParams(flags=SymbolDictFlags.from_u16(0x0001),
                                  num_new_symbols=1)
        with pytest.raises(FilterError):
            decode_symbol_dict(b"\x00\x00", params)

    def test_symbol_count_cap(self):
        params = SymbolDictParams(num_new_symbols=1_000_001)
        with pytest.raises(FilterError):
            decode_symbol_dict(b"\x00\x00", params)

    def test_zero_export(self):
        d = _decode_dict(build_symbol_dict_payload(CLASSES, num_exported=0))
        assert d.exported_symbols == []
        assert len(d.all_symbols) == 3


# ---------------------------------------------------------------------------
# Huffman symbol dictionary (T.88 §6.5, SDHUFF=1) — BEYOND the reference,
# which errors explicitly (symbol_dict.rs:441-454). By-construction
# roundtrips through encode_symbol_dict_huffman; end-to-end through the
# segment router feeding a Huffman text region.
# ---------------------------------------------------------------------------


def _decode_dict_huffman(payload, referred=()):
    # Huffman SD layout: flags(2) + numex(4) + numnew(4) + data — no AT
    flags = SymbolDictFlags.from_u16((payload[0] << 8) | payload[1])
    num_exported = int.from_bytes(payload[2:6], "big")
    num_new = int.from_bytes(payload[6:10], "big")
    params = SymbolDictParams(flags=flags, num_exported=num_exported,
                              num_new_symbols=num_new,
                              referred_symbols=list(referred))
    return decode_symbol_dict(payload[10:], params)


class TestHuffmanSymbolDict:
    @pytest.mark.parametrize("use_mmr", [False, True])
    def test_height_classes_roundtrip(self, use_mmr):
        d = _decode_dict_huffman(build_symbol_dict_payload_huffman(
            CLASSES, num_exported=3, use_mmr=use_mmr))
        got = [_grid(s.to_packed_bytes(), s.width, s.height)
               for s in d.all_symbols]
        assert got == [SYM_A, SYM_B, SYM_C]
        assert len(d.exported_symbols) == 3

    @pytest.mark.parametrize("dh_sel,dw_sel", [(1, 0), (0, 1), (1, 1)])
    def test_table_selectors(self, dh_sel, dw_sel):
        # B.5 heights / B.3 widths decode the same classes
        d = _decode_dict_huffman(build_symbol_dict_payload_huffman(
            CLASSES, num_exported=3, dh_selector=dh_sel,
            dw_selector=dw_sel))
        got = [_grid(s.to_packed_bytes(), s.width, s.height)
               for s in d.all_symbols]
        assert got == [SYM_A, SYM_B, SYM_C]

    def test_decreasing_widths_need_b3(self):
        # DW selector 1 (spec-complete B.3) carries negative deltas:
        # a height class whose widths DECREASE roundtrips only there
        classes = [(3, [SYM_B, SYM_A])]  # widths 3 then 2: delta -1
        with pytest.raises(ValueError, match="not representable"):
            build_symbol_dict_payload_huffman(classes, num_exported=2)
        d = _decode_dict_huffman(build_symbol_dict_payload_huffman(
            classes, num_exported=2, dw_selector=1))
        got = [_grid(s.to_packed_bytes(), s.width, s.height)
               for s in d.all_symbols]
        assert got == [SYM_B, SYM_A]

    def test_partial_export_runs(self):
        # skip 1, export 2 via Table B.1 runs (§6.5.10)
        d = _decode_dict_huffman(build_symbol_dict_payload_huffman(
            CLASSES, num_exported=2, export_runs=(1, 2)))
        got = [_grid(s.to_packed_bytes(), s.width, s.height)
               for s in d.exported_symbols]
        assert got == [SYM_B, SYM_C]

    def test_referred_symbols_prepend(self):
        referred = [_bm(SYM_C)]
        d = _decode_dict_huffman(build_symbol_dict_payload_huffman(
            [(3, [SYM_A])], num_exported=2), referred=referred)
        got = [_grid(s.to_packed_bytes(), s.width, s.height)
               for s in d.all_symbols]
        assert got == [SYM_C, SYM_A]

    def _decode_refagg(self, payload, referred=()):
        # refagg segment layout: flags(2) + [GR AT(4) if template 0] +
        # numex(4) + numnew(4) + data (build_symbol_dict_payload_
        # huffman_refagg / §7.4.3.1)
        flags = SymbolDictFlags.from_u16((payload[0] << 8) | payload[1])
        off = 2
        ref_at = ()
        if flags.refinement_template == 0:
            ref_at = ((-1, -1), (-1, -1))
            off += 4
        num_exported = int.from_bytes(payload[off:off + 4], "big")
        num_new = int.from_bytes(payload[off + 4:off + 8], "big")
        params = SymbolDictParams(flags=flags,
                                  refinement_at_pixels=ref_at,
                                  num_exported=num_exported,
                                  num_new_symbols=num_new,
                                  referred_symbols=list(referred))
        return decode_symbol_dict(payload[off + 8:], params)

    @pytest.mark.parametrize("template", [0, 1])
    def test_refagg_roundtrip(self, template):
        # T.88 §6.5.8.2 with SDHUFF=1 (beyond the reference AND pdf.js,
        # which both error): symbol 1 refines referred SYM_B, symbol 2
        # refines symbol 1 (a NEW symbol, shifted), the second height
        # class refines SYM_B into the taller SYM_C (size change).
        from oxidizepdf_spark.kernel.jbig2_regions import (
            build_symbol_dict_payload_huffman_refagg)

        sym_a3 = [[1, 1, 1], [1, 0, 0], [1, 0, 0]]  # 3x3, differs from B
        classes = [
            (3, [(sym_a3, 0, 0, 0), (SYM_B, 1, 1, -1)]),
            (6, [(SYM_C, 0, 0, 2)]),
        ]
        payload = build_symbol_dict_payload_huffman_refagg(
            classes, [SYM_B], num_exported=4,
            refinement_template=template)
        d = self._decode_refagg(payload, referred=[_bm(SYM_B)])
        got = [_grid(s.to_packed_bytes(), s.width, s.height)
               for s in d.all_symbols]
        assert got == [SYM_B, sym_a3, SYM_B, SYM_C]
        assert len(d.exported_symbols) == 4

    def test_refagg_partial_export(self):
        from oxidizepdf_spark.kernel.jbig2_regions import (
            build_symbol_dict_payload_huffman_refagg)

        classes = [(3, [(SYM_A, 0, 1, 0), (SYM_B, 0, 0, 0)])]
        payload = build_symbol_dict_payload_huffman_refagg(
            classes, [SYM_B], num_exported=1, export_runs=(2, 1))
        d = self._decode_refagg(payload, referred=[_bm(SYM_B)])
        got = [_grid(s.to_packed_bytes(), s.width, s.height)
               for s in d.exported_symbols]
        assert got == [SYM_B]

    def test_refagg_aggregate_text_region(self):
        # REFAGGNINST=2 (§6.5.8.2.1): the new symbol composes a one-
        # strip refinement text region — instance 1 is a refined SYM_B,
        # instance 2 a plain SYM_B — continuing the dictionary's bit
        # stream with shared GR contexts; a second symbol then refines
        # the AGGREGATE result (pool growth across class members)
        from oxidizepdf_spark.kernel.jbig2_regions import (
            build_symbol_dict_payload_huffman_refagg)

        refined = [[1, 0, 1], [1, 1, 0], [0, 1, 1]]
        composed = [[0] * 8 for _ in range(3)]
        _place(composed, refined, 0, 0)
        _place(composed, SYM_B, 4, 0)  # 0 + ds 1 + refined width 3
        follow = [r[:] for r in composed]
        follow[1][6] ^= 1
        classes = [(3, [
            (8, "agg", (0, 0), [(0, 0, 1, (refined, 0, 0)), (0, 0)],
             composed),
            (follow, 1, 0, 0),  # refines the aggregate (new symbol 0)
        ])]
        payload = build_symbol_dict_payload_huffman_refagg(
            classes, [SYM_B], num_exported=3)
        d = self._decode_refagg(payload, referred=[_bm(SYM_B)])
        got = [_grid(s.to_packed_bytes(), s.width, s.height)
               for s in d.all_symbols]
        assert got == [SYM_B, composed, follow]

    def test_arith_spec_refagg_roundtrip(self):
        # opt-in SPEC §6.5.8 for ARITHMETIC dictionaries (default stays
        # the reference's direct-bitmap fallback): single refinements in
        # the dictionary's own MQ stream, plus an aggregate text region
        from oxidizepdf_spark.kernel.jbig2_regions import (
            encode_symbol_dict_arith_refagg)

        # NB deltas ride the reference's PARTIAL integer scheme
        # (magnitudes {0..3, 64..79, 81920..86015}) — widths chosen so
        # every DW/DS delta is representable
        sym_x = [[1, 1, 1], [1, 0, 1], [1, 1, 1]]
        refined = [[1, 0, 1], [1, 1, 0], [0, 1, 1]]
        composed = [[0] * 6 for _ in range(3)]
        _place(composed, refined, 0, 0)
        _place(composed, SYM_B, 3, 0)  # cur_s = 0 + ds 0 + width 3
        classes = [(3, [
            (sym_x, 0, 0, 0),
            (6, "agg", (0, 0), [(0, 0, 0, (refined, 0, 0)), (0, 0)],
             composed),
        ])]
        payload = encode_symbol_dict_arith_refagg(
            classes, [SYM_B], num_new_symbols=2)
        params = SymbolDictParams(
            flags=SymbolDictFlags.from_u16(0x0002),
            refinement_at_pixels=((-1, -1), (-1, -1)),
            num_exported=3, num_new_symbols=2,
            referred_symbols=[_bm(SYM_B)], spec_refagg=True)
        d = decode_symbol_dict(payload, params)
        got = [_grid(s.to_packed_bytes(), s.width, s.height)
               for s in d.all_symbols]
        assert got == [SYM_B, sym_x, composed]
        # the DEFAULT path still decodes the refinement flag as direct
        # bitmaps (reference parity, symbol_dict.rs:365-371) — the same
        # payload decodes DIFFERENTLY (garbage-or-different, not equal)
        params2 = SymbolDictParams(
            flags=SymbolDictFlags.from_u16(0x0002),
            num_exported=3, num_new_symbols=2,
            referred_symbols=[_bm(SYM_B)])
        try:
            d2 = decode_symbol_dict(payload, params2)
            got2 = [_grid(s.to_packed_bytes(), s.width, s.height)
                    for s in d2.all_symbols]
            assert got2 != got
        except FilterError:
            pass  # direct-bitmap misread of a refagg stream may error

    def test_refagg_mutation_fuzz_contained(self):
        # byte-flip fuzz over a refagg dictionary exercising both the
        # single-refinement and aggregate paths — only FilterError
        # escapes (a corrupt dict must never kill a Spark task)
        import random

        from oxidizepdf_spark.kernel.jbig2_regions import (
            build_symbol_dict_payload_huffman_refagg)

        refined = [[1, 0, 1], [1, 1, 0], [0, 1, 1]]
        composed = [[0] * 8 for _ in range(3)]
        _place(composed, refined, 0, 0)
        _place(composed, SYM_B, 4, 0)
        payload = build_symbol_dict_payload_huffman_refagg(
            [(3, [(8, "agg", (0, 0),
                   [(0, 0, 1, (refined, 0, 0)), (0, 0)], composed),
                  (composed, 1, 0, 0)])],
            [SYM_B], num_exported=3)
        rng = random.Random(17)
        for _ in range(250):
            mut = bytearray(payload)
            for _ in range(rng.randrange(1, 5)):
                mut[rng.randrange(len(mut))] = rng.randrange(256)
            try:
                self._decode_refagg(bytes(mut), referred=[_bm(SYM_B)])
            except FilterError:
                pass

    def test_refagg_zero_instances_raises(self):
        from oxidizepdf_spark.kernel.image_codecs import _BitWriter
        from oxidizepdf_spark.kernel.jbig2_regions import (
            encode_huffman_int)

        w = _BitWriter()
        encode_huffman_int(w, 4, 3)   # DH
        encode_huffman_int(w, 2, 2)   # DW -> width 2
        encode_huffman_int(w, 1, 0)   # REFAGGNINST = 0
        body = w.getvalue() + b"\x00\x00"
        payload = ((0x0003 | (1 << 12)).to_bytes(2, "big")
                   + (1).to_bytes(4, "big") + (1).to_bytes(4, "big")
                   + body)
        with pytest.raises(FilterError, match="non-positive REFAGGNINST"):
            self._decode_refagg(payload, referred=[_bm(SYM_B)])

    def test_refagg_bad_reference_id_raises(self):
        from oxidizepdf_spark.kernel.image_codecs import _BitWriter
        from oxidizepdf_spark.kernel.jbig2_regions import (
            encode_huffman_int)

        w = _BitWriter()
        encode_huffman_int(w, 4, 3)
        encode_huffman_int(w, 2, 2)
        encode_huffman_int(w, 1, 1)   # REFAGGNINST = 1
        w.write(1, 1)                 # ID = 1, but pool has 1 symbol
        body = w.getvalue() + b"\x00" * 8
        payload = ((0x0003 | (1 << 12)).to_bytes(2, "big")
                   + (1).to_bytes(4, "big") + (1).to_bytes(4, "big")
                   + body)
        with pytest.raises(FilterError, match="out of range"):
            self._decode_refagg(payload, referred=[_bm(SYM_B)])

    @pytest.mark.parametrize("flags_u16", [
        0x0001 | (3 << 2),   # SDHUFFDH = 3 (custom table)
        0x0001 | (3 << 4),   # SDHUFFDW = 3 (custom table)
        0x0001 | (1 << 6),   # SDHUFFBMSIZE = 1 (custom table)
    ])
    def test_custom_selector_without_table_raises(self, flags_u16):
        # selectors naming a custom table with NO referred table segment
        params = SymbolDictParams(flags=SymbolDictFlags.from_u16(flags_u16),
                                  num_new_symbols=1)
        with pytest.raises(FilterError,
                           match="custom table|no referred table"):
            decode_symbol_dict(b"\x00\x00\x00\x00", params)

    def test_truncated_collective_bitmap_raises(self):
        payload = build_symbol_dict_payload_huffman(CLASSES, num_exported=3)
        with pytest.raises(FilterError):
            _decode_dict_huffman(payload[:12])

    def test_more_symbols_than_declared_raises(self):
        # encode 2 symbols in ONE height class but declare 1: the width
        # loop overruns the declared count inside the class
        payload = bytearray(build_symbol_dict_payload_huffman(
            [(3, [SYM_A, SYM_B])], num_exported=1))
        payload[6:10] = (1).to_bytes(4, "big")
        with pytest.raises(FilterError, match="more symbols"):
            _decode_dict_huffman(bytes(payload))

    @given(st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=9),   # width
            st.integers(min_value=0, max_value=2**18 - 1)),  # pixel seed
        min_size=1, max_size=5),
        st.booleans())
    @settings(max_examples=25, deadline=None)
    def test_roundtrip_hypothesis(self, specs, use_mmr):
        # random same-height symbols, sorted by width — table B.2 (DW
        # selector 0) has no negative range, so widths must be
        # non-decreasing within a height class (what real encoders emit)
        height = 3
        symbols = []
        for wd, seed in sorted(specs):
            rows = [[(seed >> (y * wd + x)) & 1 if y * wd + x < 18 else 0
                     for x in range(wd)] for y in range(height)]
            symbols.append(rows)
        classes = [(height, symbols)]
        d = _decode_dict_huffman(build_symbol_dict_payload_huffman(
            classes, num_exported=len(symbols), use_mmr=use_mmr))
        got = [_grid(s.to_packed_bytes(), s.width, s.height)
               for s in d.all_symbols]
        assert got == symbols


# ---------------------------------------------------------------------------
# Custom code tables (T.88 §7.4.13 type-53 segments) — BEYOND the
# reference, which skips type 53 with the other unknown segment types.
# ---------------------------------------------------------------------------


class TestCustomCodeTables:
    def _table(self):
        from oxidizepdf_spark.kernel.jbig2_regions import (
            build_code_table_segment, parse_code_table_segment)

        seg = build_code_table_segment(
            [(2, 2), (2, 2), (3, 2), (3, 3)], 0, 20,
            lower_plen=4, upper_plen=5, oob_plen=5)
        return seg, parse_code_table_segment(seg)

    def test_roundtrip_all_ranges(self):
        _, t = self._table()
        w = _BitWriter()
        vals = [0, 3, 5, 9, 13, 19, -1, -42, 20, 999]
        for v in vals:
            encode_huffman_int(w, t, v)
        encode_huffman_oob(w, t)
        r = _BitReader(w.getvalue())
        assert [decode_huffman_int(r, t) for _ in vals] == vals
        with pytest.raises(HuffmanOOB):
            decode_huffman_int(r, t)

    def test_lower_range_is_subtractive(self):
        # T.88 B.5: the lower-range line decodes HTLOW-1 - extra (the
        # standard-table renderings flatten this to additive — pinned
        # there; custom tables follow the spec)
        _, t = self._table()
        w = _BitWriter()
        encode_huffman_int(w, t, -100)
        r = _BitReader(w.getvalue())
        assert decode_huffman_int(r, t) == -100

    def test_malformed_raises(self):
        from oxidizepdf_spark.kernel.jbig2_regions import (
            parse_code_table_segment)

        with pytest.raises(FilterError):
            parse_code_table_segment(b"\x00\x00\x00")
        with pytest.raises(FilterError):  # HTHIGH <= HTLOW
            parse_code_table_segment(
                b"\x00" + (5).to_bytes(4, "big") + (5).to_bytes(4, "big"))

    def test_symbol_dict_custom_dh_through_router(self):
        # full stream: type-53 table + Huffman SD whose DH selector is 3
        # (heights 3 and 6 need DH deltas 3 and 3 — both in the custom
        # table's [0,20) direct range) + Huffman text region
        from oxidizepdf_spark.kernel.jbig2 import SEG_TABLES
        from oxidizepdf_spark.kernel.jbig2_regions import (
            build_code_table_segment, parse_code_table_segment)

        tbl_seg = build_code_table_segment(
            [(2, 2), (2, 2), (3, 2), (3, 3)], 0, 20,
            lower_plen=4, upper_plen=5)
        table = parse_code_table_segment(tbl_seg)
        w, h = 32, 12
        segs = build_segment(0, SEG_PAGE_INFORMATION, 1,
                             build_page_info_payload(w, h))
        segs += build_segment(1, SEG_TABLES, 1, tbl_seg)
        segs += build_segment(2, SEG_SYMBOL_DICTIONARY, 1,
                              build_symbol_dict_payload_huffman(
                                  CLASSES, num_exported=3,
                                  dh_selector=table),
                              referred=(1,))
        strips = [(1, 1, [(0, 0, 2), (0, 2, 1), (0, 1)])]
        segs += build_segment(3, SEG_IMMEDIATE_TEXT_REGION, 1,
                              build_text_region_payload(
                                  strips, w, h, num_symbols=3,
                                  huffman=True),
                              referred=(2,))
        out = decode_jbig2(segs)
        exp = [[0] * w for _ in range(h)]
        _place(exp, SYM_A, 1, 1)
        _place(exp, SYM_C, 5, 1)
        _place(exp, SYM_B, 9, 1)
        assert _grid(out, w, h) == exp


# ---------------------------------------------------------------------------
# Text region (through the full segment router)
# ---------------------------------------------------------------------------


def _text_stream(strips, w, h, seg_type=SEG_IMMEDIATE_TEXT_REGION,
                 classes=CLASSES, num_exported=3, **tr_kw):
    segs = build_segment(0, SEG_PAGE_INFORMATION, 1,
                         build_page_info_payload(w, h))
    segs += build_segment(1, SEG_SYMBOL_DICTIONARY, 1,
                          build_symbol_dict_payload(classes, num_exported))
    segs += build_segment(2, seg_type, 1,
                          build_text_region_payload(
                              strips, w, h, num_symbols=num_exported,
                              **tr_kw),
                          referred=(1,))
    return segs


class TestTextRegion:
    def test_codewidth(self):
        # text_region.rs:168-180 pinned values
        assert [compute_symbol_id_codewidth(n)
                for n in (0, 1, 2, 3, 4, 5, 256)] == [1, 1, 1, 2, 2, 3, 8]

    @pytest.mark.parametrize("huffman", [False, True])
    def test_basic_placement(self, huffman):
        w, h = 32, 12
        strips = [(1, 1, [(0, 0, 2), (0, 2, 1), (0, 1)])]
        out = decode_jbig2(_text_stream(strips, w, h, huffman=huffman))
        exp = [[0] * w for _ in range(h)]
        # S walk: a at 1; 1+2+2=5 -> c; 5+1+3=9 -> b; strip T=1
        _place(exp, SYM_A, 1, 1)
        _place(exp, SYM_C, 5, 1)
        _place(exp, SYM_B, 9, 1)
        assert _grid(out, w, h) == exp

    @pytest.mark.parametrize("huffman", [False, True])
    def test_refined_instances(self, huffman):
        # SBREFINE (§6.4.11, r9 — the reference ignores the flag): the
        # middle instance is placed as a 4x4 refinement of SYM_B (3x3);
        # the S walk advances by the REFINED width
        w, h = 32, 12
        refined = [[1, 1, 1, 1], [0, 1, 0, 0], [0, 1, 0, 1], [1, 0, 0, 1]]
        pool = [SYM_A, SYM_B, SYM_C]
        strips = [(1, 1, [(0, 0, 2), (0, 1, 1, (refined, 0, 0)), (0, 2)])]
        out = decode_jbig2(_text_stream(strips, w, h, huffman=huffman,
                                        refine_symbols=pool))
        exp = [[0] * w for _ in range(h)]
        _place(exp, SYM_A, 1, 1)
        _place(exp, refined, 5, 1)   # 1 + ds 2 + SYM_A width 2
        _place(exp, SYM_C, 10, 1)    # 5 + ds 1 + REFINED width 4
        assert _grid(out, w, h) == exp

    @pytest.mark.parametrize("huffman", [False, True])
    def test_out_of_range_symbol_id_keeps_stream_in_sync(self, huffman):
        # r9 ADVICE: an out-of-range symbol ID whose instance carries
        # refinement must still consume the RI bit and the refinement
        # fields — skipping them desynchronized every remaining
        # instance.  The phantom encoder-side reference is 1x1 blank so
        # the arith best-effort decode (refining Bitmap(1,1)) walks the
        # exact same GR contexts and the stream stays bit-identical; the
        # Huffman path skips the length-prefixed bitmap outright.
        w, h = 32, 12
        refined = [[1, 0], [0, 1]]
        pool = [SYM_A, SYM_B, SYM_C, [[0]]]  # id 3 exists only here
        strips = [(1, 1, [(0, 0, 2), (0, 3, 1, (refined, 0, 0)), (0, 2)])]
        out = decode_jbig2(_text_stream(strips, w, h, huffman=huffman,
                                        refine_symbols=pool))
        exp = [[0] * w for _ in range(h)]
        _place(exp, SYM_A, 1, 1)
        # skipped instance adds ds only (no symbol width): 1 + 2 + 2 = 5
        # then 5 + 1 = 6
        _place(exp, SYM_C, 6, 1)
        assert _grid(out, w, h) == exp

    def test_refined_instance_growth_and_offsets(self):
        # negative RDW/RDH and nonzero RDX/RDY take T.88's floor-shift
        # reference offsets; roundtrip pins the convention both ways
        w, h = 20, 10
        shrunk = [[1, 1], [0, 1], [1, 0]]  # 3x3 -> 2x3: rdw=-1, rdh=0
        strips = [(1, 1, [(0, 1, 1, (shrunk, 1, -1))])]
        out = decode_jbig2(_text_stream(strips, w, h, huffman=True,
                                        refine_symbols=[SYM_A, SYM_B,
                                                        SYM_C]))
        exp = [[0] * w for _ in range(h)]
        _place(exp, shrunk, 1, 1)
        assert _grid(out, w, h) == exp

    @pytest.mark.parametrize("huffman", [False, True])
    def test_sbdsoffset_applies_to_s_walk(self, huffman):
        # SBDSOFFSET (flags bits 10-14, signed): every inter-instance S
        # delta grows by it — the reference ignores the field entirely
        w, h = 32, 12
        strips = [(1, 1, [(0, 0, 2), (0, 2, 1), (0, 1)])]
        out = decode_jbig2(_text_stream(strips, w, h, huffman=huffman,
                                        s_offset=3))
        exp = [[0] * w for _ in range(h)]
        _place(exp, SYM_A, 1, 1)
        _place(exp, SYM_C, 8, 1)    # 1 + (2+3) + 2
        _place(exp, SYM_B, 15, 1)   # 8 + (1+3) + 3
        assert _grid(out, w, h) == exp

    @pytest.mark.parametrize("use_mmr", [False, True])
    def test_huffman_dict_feeds_huffman_text_region(self, use_mmr):
        # the VERDICT r7 "done" shape: a text region decoding from a
        # Huffman-coded symbol dictionary, end-to-end through the
        # segment router (the reference errors on the dictionary)
        w, h = 32, 12
        segs = build_segment(0, SEG_PAGE_INFORMATION, 1,
                             build_page_info_payload(w, h))
        segs += build_segment(1, SEG_SYMBOL_DICTIONARY, 1,
                              build_symbol_dict_payload_huffman(
                                  CLASSES, num_exported=3,
                                  use_mmr=use_mmr))
        strips = [(1, 1, [(0, 0, 2), (0, 2, 1), (0, 1)])]
        segs += build_segment(2, SEG_IMMEDIATE_TEXT_REGION, 1,
                              build_text_region_payload(
                                  strips, w, h, num_symbols=3,
                                  huffman=True),
                              referred=(1,))
        out = decode_jbig2(segs)
        exp = [[0] * w for _ in range(h)]
        _place(exp, SYM_A, 1, 1)
        _place(exp, SYM_C, 5, 1)
        _place(exp, SYM_B, 9, 1)
        assert _grid(out, w, h) == exp

    @pytest.mark.parametrize("id_lengths", [None, [1, 2, 2]])
    def test_spec_symbol_id_table(self, id_lengths):
        # T.88 §7.4.3.1.7 (BEYOND the reference quirk of raw fixed-width
        # reads): the runcode-coded symbol-ID table decodes the same
        # placement — uniform lengths (None = fixed-width-parity codes)
        # and a non-uniform canonical code {0, 10, 11}
        w, h = 32, 12
        strips = [(1, 1, [(0, 0, 2), (0, 2, 1), (0, 1)])]
        segs = build_segment(0, SEG_PAGE_INFORMATION, 1,
                             build_page_info_payload(w, h))
        segs += build_segment(1, SEG_SYMBOL_DICTIONARY, 1,
                              build_symbol_dict_payload(CLASSES, 3))
        segs += build_segment(2, SEG_IMMEDIATE_TEXT_REGION, 1,
                              build_text_region_payload(
                                  strips, w, h, num_symbols=3,
                                  huffman=True, spec_symbol_ids=True,
                                  id_lengths=id_lengths),
                              referred=(1,))
        out = decode_jbig2(segs, {"SpecSymbolIDs": True})
        exp = [[0] * w for _ in range(h)]
        _place(exp, SYM_A, 1, 1)
        _place(exp, SYM_C, 5, 1)
        _place(exp, SYM_B, 9, 1)
        assert _grid(out, w, h) == exp

    def test_spec_symbol_id_run_repeats(self):
        # runcodes 32 (repeat prev) / 33 (zeros): craft the length list
        # by hand and check the decoder's repeat expansion
        from oxidizepdf_spark.kernel.jbig2_regions import (
            CustomHuffmanTable, _decode_symbol_id_table,
            encode_huffman_int)

        w = _BitWriter()
        # runcode table: code 3 (len 2), 32 (len 2), 33 (len 2)
        runlens = [0] * 35
        runlens[3] = runlens[32] = runlens[33] = 2
        for l in runlens:
            w.write(4, l)
        rt = CustomHuffmanTable([(2, 0, 3), (2, 0, 32), (2, 0, 33)])
        encode_huffman_int(w, rt, 3)    # sym0: len 3
        encode_huffman_int(w, rt, 32)   # repeat prev (3) ...
        w.write(2, 1)                   # ... 4 times -> syms 1-4
        encode_huffman_int(w, rt, 33)   # zeros ...
        w.write(3, 0)                   # ... 3 times -> syms 5-7
        w.align()
        r = _BitReader(w.getvalue())
        t = _decode_symbol_id_table(r, 8)
        got = {e[2]: e[0] for e in t.entries}
        assert got == {0: 3, 1: 3, 2: 3, 3: 3, 4: 3}  # zeros excluded

    def test_multiple_strips_huffman_only(self):
        # the arith integer scheme has no OOB, so a strip can never
        # terminate early: multi-strip regions exist only in Huffman
        # mode, closed by B8's OOB marker
        w, h = 24, 16
        strips = [(1, 2, [(0, 0)]),  # T=1: a at S=2
                  (2, 1, [(0, 1)])]  # OOB, then T=1+2=3, S=2+1=3: b
        out = decode_jbig2(_text_stream(strips, w, h, huffman=True))
        exp = [[0] * w for _ in range(h)]
        _place(exp, SYM_A, 2, 1)
        _place(exp, SYM_B, 3, 3)
        assert _grid(out, w, h) == exp

    def test_multiple_strips_arith_inexpressible(self):
        from oxidizepdf_spark.kernel.jbig2_regions import (
            encode_text_region_arith)

        with pytest.raises(ValueError):
            encode_text_region_arith([(1, 2, [(0, 0)]), (2, 1, [(0, 1)])], 2)

    @pytest.mark.parametrize("huffman", [False, True])
    def test_strip_size_with_it(self, huffman):
        # log_strip_size=2 -> strip 4; IT offsets within the strip
        w, h = 24, 16
        strips = [(1, 1, [(0, 0, 2), (3, 1)])]
        out = decode_jbig2(_text_stream(strips, w, h, huffman=huffman,
                                        log_strip_size=2))
        exp = [[0] * w for _ in range(h)]
        # stript = 1*4 = 4; a at (1, 4+0); b at S=1+2+2=5, T=4+3=7
        _place(exp, SYM_A, 1, 4)
        _place(exp, SYM_B, 5, 7)
        assert _grid(out, w, h) == exp

    @pytest.mark.parametrize("corner,expect_xy", [
        (0, (2, 2)), (1, (-1, 2)), (2, (2, -1)), (3, (-1, -1)),
    ])
    def test_ref_corners(self, corner, expect_xy):
        w, h = 16, 8
        strips = [(2, 2, [(0, 1)])]  # SYM_B (3x3) at S=2, T=2
        out = decode_jbig2(_text_stream(strips, w, h, ref_corner=corner))
        exp = [[0] * w for _ in range(h)]
        _place(exp, SYM_B, *expect_xy)  # negative coords clip
        assert _grid(out, w, h) == exp

    def test_transposed_double_swap(self):
        # reference quirk: the transposed call site swaps (s, t) AND
        # compute_placement swaps again, so corner 0 still lands at
        # x=cur_s, y=stript — transposed differs only in the corner
        # size adjustments and the S-advance using symbol height
        w, h = 16, 12
        strips = [(2, 3, [(0, 1)])]
        out = decode_jbig2(_text_stream(strips, w, h, transposed=True))
        exp = [[0] * w for _ in range(h)]
        _place(exp, SYM_B, 3, 2)  # (s, t), not (t, s)
        assert _grid(out, w, h) == exp

    def test_transposed_s_advance_uses_height(self):
        w, h = 16, 16
        strips = [(1, 2, [(0, 0, 1), (0, 1)])]
        out = decode_jbig2(_text_stream(strips, w, h, transposed=True))
        exp = [[0] * w for _ in range(h)]
        _place(exp, SYM_A, 2, 1)
        # next s = 2 + ds(1) + height(3) = 6
        _place(exp, SYM_B, 6, 1)
        assert _grid(out, w, h) == exp

    def test_xor_place_operator(self):
        # overlapping solid symbols XOR to a hole (ds=-1 pulls the
        # second instance back by one: s2 = 2 - 1 + 2 = 3)
        w, h = 16, 8
        classes = [(3, [[[1, 1], [1, 1], [1, 1]]])]
        strips = [(0, 2, [(0, 0, -1), (0, 0)])]
        out = decode_jbig2(_text_stream(strips, w, h, classes=classes,
                                        num_exported=1,
                                        place_operator=OP_XOR))
        exp = [[0] * w for _ in range(h)]
        for y in range(3):
            for x in (2, 3):
                exp[y][x] ^= 1
            for x in (3, 4):
                exp[y][x] ^= 1
        assert _grid(out, w, h) == exp

    def test_default_pixel_one(self):
        w, h = 8, 4
        classes = [(2, [[[1, 1], [1, 1]]])]
        strips = [(0, 0, [(0, 0)])]
        out = decode_jbig2(_text_stream(strips, w, h, classes=classes,
                                        num_exported=1, default_pixel=1))
        # default-1 region, OR-ed symbol invisible; page default 0 gets
        # the region OR-ed in -> all ones
        assert _grid(out, w, h) == [[1] * w for _ in range(h)]

    def test_intermediate_stored_not_composed(self):
        w, h = 16, 8
        strips = [(1, 1, [(0, 0)])]
        dec = Jbig2Decoder()
        out = dec.decode(_text_stream(strips, w, h,
                                      seg_type=SEG_INTERMEDIATE_TEXT_REGION))
        assert out == b"\x00" * (h * 2)
        assert isinstance(dec.segments[2], Bitmap)

    def test_lossless_immediate_composes(self):
        w, h = 16, 8
        strips = [(1, 1, [(0, 0)])]
        out = decode_jbig2(_text_stream(
            strips, w, h, seg_type=SEG_IMMEDIATE_LOSSLESS_TEXT_REGION))
        exp = [[0] * w for _ in range(h)]
        _place(exp, SYM_A, 1, 1)
        assert _grid(out, w, h) == exp

    def test_out_of_range_symbol_id_skipped(self):
        # codewidth 2 can name id 3 with only 3 symbols: placement is
        # skipped, the count still advances, S does NOT advance by a width
        w, h = 16, 8
        strips = [(1, 1, [(0, 3, 1), (0, 0)])]
        out = decode_jbig2(_text_stream(strips, w, h))
        exp = [[0] * w for _ in range(h)]
        # cur_s = 1, id 3 skipped; cur_s += ds(1) only -> 2; a at 2
        _place(exp, SYM_A, 2, 1)
        assert _grid(out, w, h) == exp

    def test_instance_count_cap(self):
        from oxidizepdf_spark.kernel.jbig2_regions import (
            TextRegionParams, decode_text_region)

        params = TextRegionParams(num_instances=10_000_001)
        with pytest.raises(FilterError):
            decode_text_region(b"\x00\x00", params)

    def test_failed_dict_skips_text_region_gracefully(self):
        # huffman symbol dict fails -> dict segment skipped -> text region
        # sees zero symbols and places nothing; page still returned
        w, h = 16, 8
        bad_dict = bytearray(build_symbol_dict_payload(CLASSES, 3))
        bad_dict[1] |= 0x01  # set uses_huffman
        segs = build_segment(0, SEG_PAGE_INFORMATION, 1,
                             build_page_info_payload(w, h))
        segs += build_segment(1, SEG_SYMBOL_DICTIONARY, 1, bytes(bad_dict))
        strips = [(1, 1, [(0, 0)])]
        segs += build_segment(2, SEG_IMMEDIATE_TEXT_REGION, 1,
                              build_text_region_payload(strips, w, h,
                                                        num_symbols=3),
                              referred=(1,))
        out = decode_jbig2(segs)
        assert out == b"\x00" * (h * 2)


# ---------------------------------------------------------------------------
# Pattern dictionary + halftone region
# ---------------------------------------------------------------------------

PAT_BLANK = [[0] * 4 for _ in range(4)]
PAT_SOLID = [[1] * 4 for _ in range(4)]
PAT_CHECK = [[1, 0, 1, 0], [0, 1, 0, 1], [1, 0, 1, 0], [0, 1, 0, 1]]
PAT_CROSS = [[0, 1, 1, 0], [1, 1, 1, 1], [1, 1, 1, 1], [0, 1, 1, 0]]


class TestPatternDict:
    @pytest.mark.parametrize("mmr", [False, True])
    def test_collective_split(self, mmr):
        from oxidizepdf_spark.kernel.jbig2_regions import (
            PatternDictFlags, decode_pattern_dict)

        patterns = [PAT_BLANK, PAT_SOLID, PAT_CHECK]
        payload = build_pattern_dict_payload(patterns, mmr=mmr)
        flags = PatternDictFlags.from_bytes(payload)
        assert flags.gray_max == 2 and flags.pattern_width == 4
        d = decode_pattern_dict(payload[7:], flags)
        got = [_grid(p.to_packed_bytes(), 4, 4) for p in d.patterns]
        assert got == patterns


class TestHalftoneRegion:
    @pytest.mark.parametrize("mmr", [False, True])
    def test_grid_placement(self, mmr):
        # 4 patterns -> 2 bit planes; axis-aligned grid via vx=pw*256
        # (reference formula: rows step NEGATIVE y, so offset_y
        # compensates and the row order flips)
        w, h = 16, 8
        patterns = [PAT_BLANK, PAT_SOLID, PAT_CHECK, PAT_CROSS]
        gray = [[0, 1, 2, 3], [3, 2, 1, 0]]
        segs = build_segment(0, SEG_PAGE_INFORMATION, 1,
                             build_page_info_payload(w, h))
        segs += build_segment(1, SEG_PATTERN_DICTIONARY, 1,
                              build_pattern_dict_payload(patterns, mmr=mmr))
        segs += build_segment(2, SEG_IMMEDIATE_HALFTONE_REGION, 1,
                              build_halftone_payload(
                                  gray, w, h, 4, grid_offset_y=4,
                                  grid_vector_x=4 * 256, mmr=mmr),
                              referred=(1,))
        out = decode_jbig2(segs)
        exp = [[0] * w for _ in range(h)]
        for gy, row in enumerate(gray):
            for gx, g in enumerate(row):
                # x = gx*4, y = 4 - gy*4
                _place(exp, patterns[g], gx * 4, 4 - gy * 4)
        assert _grid(out, w, h) == exp

    def test_empty_pattern_dict_yields_default(self):
        # no referred pattern dict -> empty default dict -> blank region
        w, h = 8, 4
        segs = build_segment(0, SEG_PAGE_INFORMATION, 1,
                             build_page_info_payload(w, h))
        segs += build_segment(2, SEG_IMMEDIATE_HALFTONE_REGION, 1,
                              build_halftone_payload([[0]], w, h, 1))
        out = decode_jbig2(segs)
        assert out == b"\x00" * h

    def test_gray_out_of_pattern_range_skipped(self):
        # 3 patterns need 2 planes; gray 3 has no pattern -> skipped
        w, h = 8, 4
        patterns = [PAT_BLANK, PAT_SOLID, PAT_CHECK]
        gray = [[3, 1]]
        segs = build_segment(0, SEG_PAGE_INFORMATION, 1,
                             build_page_info_payload(w, h))
        segs += build_segment(1, SEG_PATTERN_DICTIONARY, 1,
                              build_pattern_dict_payload(patterns))
        segs += build_segment(2, SEG_IMMEDIATE_HALFTONE_REGION, 1,
                              build_halftone_payload(
                                  gray, w, h, 3, grid_vector_x=4 * 256),
                              referred=(1,))
        out = decode_jbig2(segs)
        exp = [[0] * w for _ in range(h)]
        _place(exp, PAT_SOLID, 4, 0)
        assert _grid(out, w, h) == exp


# ---------------------------------------------------------------------------
# Consumed-length variants
# ---------------------------------------------------------------------------


class TestWithConsumed:
    def test_arith_truncation_preserves_decode(self):
        rng = random.Random(17)
        w, h = 21, 9
        rows = [[rng.randint(0, 1) for _ in range(w)] for _ in range(h)]
        coded = encode_generic_region_arith(rows, w, h, 0, (), False)
        params = GenericRegionParams(w, h)
        bm, consumed = decode_generic_region_arith_with_consumed(coded, params)
        assert consumed <= len(coded)
        assert _grid(bm.to_packed_bytes(), w, h) == rows
        # bytes past `consumed` were never read: truncation is lossless
        bm2, c2 = decode_generic_region_arith_with_consumed(
            coded[:consumed], params)
        assert bm2.to_packed_bytes() == bm.to_packed_bytes()
        assert c2 == consumed

    def test_mmr_consumed_byte_aligned(self):
        from oxidizepdf_spark.kernel.image_codecs import encode_ccitt_g4

        w, h = 24, 6
        rows = [[1 if (x // 4 + y) % 2 else 0 for x in range(w)]
                for y in range(h)]
        coded = encode_ccitt_g4(rows, w)
        params = GenericRegionParams(w, h, is_mmr=True)
        bm, consumed = decode_generic_region_mmr_with_consumed(coded, params)
        assert _grid(bm.to_packed_bytes(), w, h) == rows
        assert 0 < consumed <= len(coded)

    def test_multi_plane_concatenation(self):
        # the halftone walk's core property: planes decoded back-to-back
        # from one buffer, each advanced by its consumed count
        rng = random.Random(23)
        w, h = 13, 7
        planes = [[[rng.randint(0, 1) for _ in range(w)] for _ in range(h)]
                  for _ in range(3)]
        params = GenericRegionParams(w, h)
        buf = bytearray()
        for rows in planes:
            coded = encode_generic_region_arith(rows, w, h, 0, (), False)
            _, consumed = decode_generic_region_arith_with_consumed(
                coded, params)
            buf += coded[:consumed]
        offset = 0
        for rows in planes:
            bm, consumed = decode_generic_region_arith_with_consumed(
                bytes(buf[offset:]), params)
            assert _grid(bm.to_packed_bytes(), w, h) == rows
            offset += max(consumed, 1)
        assert offset == len(buf)


# ---------------------------------------------------------------------------
# Mixed-segment integration
# ---------------------------------------------------------------------------


class TestIntegration:
    def test_text_over_generic_background(self):
        w, h = 24, 10
        bg = [[1 if y == 0 else 0 for _ in range(w)] for y in range(h)]
        segs = build_segment(0, SEG_PAGE_INFORMATION, 1,
                             build_page_info_payload(w, h))
        segs += build_segment(1, SEG_IMMEDIATE_GENERIC_REGION, 1,
                              build_generic_region_payload(bg, w, h))
        segs += build_segment(2, SEG_SYMBOL_DICTIONARY, 1,
                              build_symbol_dict_payload(CLASSES, 3))
        strips = [(2, 3, [(0, 1)])]
        segs += build_segment(3, SEG_IMMEDIATE_TEXT_REGION, 1,
                              build_text_region_payload(strips, w, h,
                                                        num_symbols=3),
                              referred=(2,))
        out = decode_jbig2(segs)
        exp = [row[:] for row in bg]
        _place(exp, SYM_B, 3, 2)
        assert _grid(out, w, h) == exp

    def test_two_dicts_referred_in_order(self):
        # text region referring two dictionaries sees their exports
        # concatenated in referral order
        w, h = 24, 8
        segs = build_segment(0, SEG_PAGE_INFORMATION, 1,
                             build_page_info_payload(w, h))
        segs += build_segment(1, SEG_SYMBOL_DICTIONARY, 1,
                              build_symbol_dict_payload([(3, [SYM_A])], 1))
        segs += build_segment(2, SEG_SYMBOL_DICTIONARY, 1,
                              build_symbol_dict_payload([(3, [SYM_B])], 1))
        strips = [(1, 1, [(0, 1, 2), (0, 0)])]  # id1=B (from dict 2), id0=A
        segs += build_segment(3, SEG_IMMEDIATE_TEXT_REGION, 1,
                              build_text_region_payload(strips, w, h,
                                                        num_symbols=2),
                              referred=(1, 2))
        out = decode_jbig2(segs)
        exp = [[0] * w for _ in range(h)]
        _place(exp, SYM_B, 1, 1)
        # next s = 1 + 2 + width(B)=3 -> 6
        _place(exp, SYM_A, 6, 1)
        assert _grid(out, w, h) == exp

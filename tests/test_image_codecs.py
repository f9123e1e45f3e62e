"""DCTDecode / CCITTFaxDecode codec tests (kernel/image_codecs.py).

DCT parity target: reference filter_impls/dct.rs (clean SOI..EOI window,
marker-walk metadata, Adobe APP14 colour-space rule). CCITT target: the
public ITU-T T.4/T.6 standards — round-trips use this module's own
encoders, but the expected packed bytes come from an independent packer
below, so decode+pack is never compared against itself.
"""

from __future__ import annotations

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from oxidizepdf_spark.kernel.filters import FilterError, decode_stream_data
from oxidizepdf_spark.kernel.image_codecs import (
    JpegInfo,
    _BitWriter,
    _row_runs,
    _write_run,
    ccitt_params_from_dict,
    decode_ccitt,
    decode_dct,
    encode_ccitt_g3_1d,
    encode_ccitt_g4,
    extract_clean_jpeg,
    parse_jpeg_info,
    validate_jpeg,
)


# ---------------------------------------------------------------------------
# JPEG construction helpers
# ---------------------------------------------------------------------------


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload


def _sof0(width: int, height: int, components: int, bits: int = 8) -> bytes:
    body = bytes([bits]) + height.to_bytes(2, "big") + width.to_bytes(2, "big")
    body += bytes([components])
    for i in range(components):
        body += bytes([i + 1, 0x11, 0])
    return _seg(0xC0, body)


def _adobe_app14(transform: int) -> bytes:
    return _seg(0xEE, b"Adobe" + bytes([0, 100, 0, 0, 0, 0, transform]))


def _jpeg(width=16, height=8, components=3, bits=8, adobe=None, entropy=b"\x12\x34") -> bytes:
    out = b"\xff\xd8"  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    if adobe is not None:
        out += _adobe_app14(adobe)
    out += _sof0(width, height, components, bits)
    sos_body = bytes([components]) + bytes(
        b for i in range(components) for b in (i + 1, 0)
    ) + bytes([0, 63, 0])
    out += _seg(0xDA, sos_body)
    # entropy data with byte-stuffed 0xFF00 inside (RSTn mid-entropy is NOT
    # tolerated by the reference walk — after a standalone marker it expects
    # another marker, dct.rs:165-176 — so none appears here)
    out += entropy + b"\xff\x00" + entropy
    out += b"\xff\xd9"  # EOI
    return out


class TestDct:
    def test_clean_window_strips_junk(self):
        jpg = _jpeg()
        dirty = b"garbage%PDF" + jpg + b"\r\nendstream trailing"
        assert extract_clean_jpeg(dirty) == jpg
        assert decode_dct(dirty) == jpg

    def test_clean_passthrough_when_already_clean(self):
        jpg = _jpeg()
        assert decode_dct(jpg) == jpg

    def test_missing_soi_raises(self):
        with pytest.raises(FilterError):
            decode_dct(b"\x00\x01no jpeg here")

    def test_missing_eoi_raises(self):
        with pytest.raises(FilterError):
            decode_dct(b"\xff\xd8\xff\xe0\x00\x02")

    def test_info_gray(self):
        info = parse_jpeg_info(_jpeg(width=640, height=480, components=1))
        assert info == JpegInfo(640, 480, 1, 8, "Gray")

    def test_info_ycbcr_default_3comp(self):
        assert parse_jpeg_info(_jpeg(components=3)).color_space == "YCbCr"

    def test_info_rgb_via_adobe_transform0(self):
        # dct.rs:283-289 — 3 components + Adobe APP14 transform 0 declares RGB
        assert parse_jpeg_info(_jpeg(components=3, adobe=0)).color_space == "RGB"
        assert parse_jpeg_info(_jpeg(components=3, adobe=1)).color_space == "YCbCr"

    def test_info_cmyk_and_bits(self):
        info = parse_jpeg_info(_jpeg(width=3, height=5, components=4, bits=12))
        assert info.color_space == "CMYK"
        assert info.bits_per_component == 12
        assert (info.width, info.height) == (3, 5)

    def test_info_survives_stuffed_entropy(self):
        # 0xFF00 stuffing and RSTn inside the scan must not derail the walk
        jpg = _jpeg(entropy=b"\xfe\xff\x00\xab" * 7)
        assert parse_jpeg_info(jpg).width == 16

    def test_unsupported_component_count(self):
        with pytest.raises(FilterError):
            parse_jpeg_info(_jpeg(components=2))

    def test_validate_tolerates_unparseable_info(self):
        # dct.rs:305-343 laxity: SOI+EOI present is enough
        validate_jpeg(b"\xff\xd8\xff\xff\xff\xd9")

    def test_dispatch_via_filter_chain(self):
        jpg = _jpeg()
        assert decode_stream_data(b"xx" + jpg + b"yy", "DCTDecode", None) == jpg
        assert decode_stream_data(b"xx" + jpg, "DCT", None) == jpg


# ---------------------------------------------------------------------------
# CCITT helpers — independent expected-bytes packer
# ---------------------------------------------------------------------------


def _expected_packed(bitmap, columns, black_is_1):
    """Bitmap (1=black) -> packed 1 bpp rows, byte-aligned, independent of
    image_codecs._pack_rows."""
    out = bytearray()
    for row in bitmap:
        stride = (columns + 7) // 8
        acc = bytearray(stride)
        for i, px in enumerate(row):
            bit = px if black_is_1 else 1 - px
            if bit:
                acc[i >> 3] |= 0x80 >> (i & 7)
        out += acc
    return bytes(out)


def _random_bitmap(rng, rows, cols):
    # runs-biased rows (fax-like), not uniform noise
    bm = []
    for _ in range(rows):
        row = []
        color = rng.randint(0, 1)
        while len(row) < cols:
            run = min(rng.choice([1, 2, 3, 7, 15, 40]), cols - len(row))
            row.extend([color] * run)
            color ^= 1
        bm.append(row)
    return bm


class TestCcittParams:
    def test_defaults(self):
        p = ccitt_params_from_dict(None)
        assert (p.k, p.columns, p.rows) == (0, 1728, 0)
        assert p.black_is_1 is False and p.end_of_block is True

    def test_width_height_fallbacks(self):
        p = ccitt_params_from_dict({"Width": 100, "Height": 7, "K": -1})
        assert (p.columns, p.rows, p.k) == (100, 7, -1)
        # Columns wins over Width when both present
        p2 = ccitt_params_from_dict({"Columns": 64, "Width": 100})
        assert p2.columns == 64


class TestCcittG3:
    def test_single_row_roundtrip(self):
        cols = 24
        bm = [[0] * 5 + [1] * 10 + [0] * 9]
        enc = encode_ccitt_g3_1d(bm, cols)
        out = decode_ccitt(enc, {"K": 0, "Columns": cols, "Rows": 1, "BlackIs1": True})
        assert out == _expected_packed(bm, cols, True)

    def test_black_is_1_false_inverts(self):
        cols = 10
        bm = [[1] * 10]
        enc = encode_ccitt_g3_1d(bm, cols)
        out = decode_ccitt(enc, {"K": 0, "Columns": cols, "Rows": 1})
        # all-black row, BlackIs1 default false -> 0 bits, padding stays 0
        assert out == b"\x00\x00"

    def test_multirow_and_leading_black(self):
        cols = 16
        bm = [[1] * 4 + [0] * 12, [0] * 16, [1] * 16]
        enc = encode_ccitt_g3_1d(bm, cols)
        out = decode_ccitt(enc, {"K": 0, "Columns": cols, "Rows": 3, "BlackIs1": True})
        assert out == _expected_packed(bm, cols, True)

    def test_makeup_chain_long_runs(self):
        # width > 2560 exercises extended make-up chaining in both codecs
        cols = 6000
        bm = [[1] * 6000, [0] * 2700 + [1] * 3300]
        enc = encode_ccitt_g3_1d(bm, cols)
        out = decode_ccitt(enc, {"K": 0, "Columns": cols, "Rows": 2, "BlackIs1": True})
        assert out == _expected_packed(bm, cols, True)

    def test_eol_prefixed_lines_accepted(self):
        # T.4 streams may carry EOL (eleven 0s + 1) before each line
        cols = 8
        bm = [[0] * 8, [1] * 8]
        w = _BitWriter()
        for row in bm:
            w.write(12, 1)  # EOL
            white = True
            for run in _row_runs(row, cols):
                _write_run(w, run, white)
                white = not white
        out = decode_ccitt(w.getvalue(), {"K": 0, "Columns": cols, "Rows": 2, "BlackIs1": True})
        assert out == _expected_packed(bm, cols, True)

    def test_encoded_byte_align(self):
        cols = 12
        bm = [[0] * 3 + [1] * 6 + [0] * 3] * 3
        w = _BitWriter()
        for row in bm:
            w.align()
            white = True
            for run in _row_runs(row, cols):
                _write_run(w, run, white)
                white = not white
        out = decode_ccitt(
            w.getvalue(),
            {"K": 0, "Columns": cols, "Rows": 3, "BlackIs1": True, "EncodedByteAlign": True},
        )
        assert out == _expected_packed(bm, cols, True)

    def test_rows_truncation_and_padding(self):
        cols = 8
        bm = [[1] * 8, [0] * 8]
        enc = encode_ccitt_g3_1d(bm, cols)
        # Rows=1 truncates; Rows=4 pads missing rows white
        assert decode_ccitt(enc, {"K": 0, "Columns": cols, "Rows": 1, "BlackIs1": True}) == b"\xff"
        out = decode_ccitt(enc, {"K": 0, "Columns": cols, "Rows": 4, "BlackIs1": True})
        assert out == _expected_packed(bm + [[0] * 8, [0] * 8], cols, True)

    def test_garbage_raises(self):
        with pytest.raises(FilterError):
            decode_ccitt(b"\x5a\x5a\x5a\x5a", {"K": 0, "Columns": 8, "Rows": 4})

    def test_random_roundtrips(self):
        rng = random.Random(0xCC1)
        for cols in (8, 13, 64, 173, 1728):
            bm = _random_bitmap(rng, 5, cols)
            enc = encode_ccitt_g3_1d(bm, cols)
            got = decode_ccitt(enc, {"K": 0, "Columns": cols, "Rows": 5, "BlackIs1": True})
            assert got == _expected_packed(bm, cols, True), cols


class TestCcittG4:
    def test_basic_roundtrip(self):
        cols = 24
        bm = [
            [0] * 24,
            [0] * 6 + [1] * 12 + [0] * 6,
            [0] * 5 + [1] * 14 + [0] * 5,  # vertical modes vs previous row
            [1] * 2 + [0] * 20 + [1] * 2,  # horizontal + pass interplay
        ]
        enc = encode_ccitt_g4(bm, cols)
        out = decode_ccitt(enc, {"K": -1, "Columns": cols, "Rows": 4, "BlackIs1": True})
        assert out == _expected_packed(bm, cols, True)

    def test_eofb_terminates_without_rows(self):
        # no /Rows given: decoder must stop at EOFB, not read junk
        cols = 16
        bm = [[0] * 4 + [1] * 8 + [0] * 4, [1] * 16]
        enc = encode_ccitt_g4(bm, cols) + b"\x00\x00\xaa\x55"
        out = decode_ccitt(enc, {"K": -1, "Columns": cols, "BlackIs1": True})
        assert out == _expected_packed(bm, cols, True)

    def test_encoded_byte_align(self):
        from oxidizepdf_spark.kernel.image_codecs import (
            _b1_index,
            _EOL_BITS,
            _MODE_HORIZ,
            _MODE_PASS,
            _MODE_V0,
            _MODE_VL1,
            _MODE_VL2,
            _MODE_VL3,
            _MODE_VR1,
            _MODE_VR2,
            _MODE_VR3,
            _transitions,
        )

        cols = 20
        bm = _random_bitmap(random.Random(7), 4, cols)
        # G4 encode with per-row byte alignment
        w = _BitWriter()
        ref = _transitions([cols])
        for row in bm:
            w.align()
            cur = _transitions(_row_runs(row, cols))
            a0, white = -1, True
            while a0 < cols:
                ia1 = _b1_index(cur, a0, white)
                a1 = cur[ia1] if ia1 < len(cur) else cols
                ib1 = _b1_index(ref, a0, white)
                b1 = ref[ib1] if ib1 < len(ref) else cols
                b2 = ref[ib1 + 1] if ib1 + 1 < len(ref) else cols
                if b2 < a1:
                    w.write(*_MODE_PASS)
                    a0 = b2
                    continue
                d = a1 - b1
                if -3 <= d <= 3:
                    w.write(*{0: _MODE_V0, 1: _MODE_VR1, 2: _MODE_VR2, 3: _MODE_VR3,
                              -1: _MODE_VL1, -2: _MODE_VL2, -3: _MODE_VL3}[d])
                    a0 = a1
                    white = not white
                    continue
                start = 0 if a0 < 0 else a0
                ia2 = ia1 + 1
                a2 = cur[ia2] if ia2 < len(cur) else cols
                w.write(*_MODE_HORIZ)
                _write_run(w, a1 - start, white)
                _write_run(w, a2 - a1, not white)
                a0 = a2
            ref = cur
        w.write(*_EOL_BITS)
        w.write(*_EOL_BITS)
        out = decode_ccitt(
            w.getvalue(),
            {"K": -1, "Columns": cols, "Rows": 4, "BlackIs1": True, "EncodedByteAlign": True},
        )
        assert out == _expected_packed(bm, cols, True)

    def test_long_width_roundtrip(self):
        cols = 4096
        rng = random.Random(0xCC4)
        bm = _random_bitmap(rng, 3, cols)
        enc = encode_ccitt_g4(bm, cols)
        out = decode_ccitt(enc, {"K": -1, "Columns": cols, "Rows": 3, "BlackIs1": True})
        assert out == _expected_packed(bm, cols, True)

    def test_dispatch_with_decode_parms(self):
        cols = 16
        bm = [[0] * 8 + [1] * 8]
        enc = encode_ccitt_g4(bm, cols)
        parms = {"K": -1, "Columns": cols, "Rows": 1, "BlackIs1": True}
        assert decode_stream_data(enc, "CCITTFaxDecode", parms) == _expected_packed(bm, cols, True)
        assert decode_stream_data(enc, "CCF", parms) == _expected_packed(bm, cols, True)

    def test_jpx_still_pass_through(self):
        # JBIG2Decode now dispatches to kernel/jbig2.py (test_jbig2.py);
        # JPX remains the one opaque image filter
        blob = b"\x00\x00\x00\x0cjP  \r\n\x87\nopaque"
        assert decode_stream_data(blob, "JPXDecode", None) == blob


@settings(max_examples=60, deadline=None)
@given(
    data=st.data(),
    cols=st.integers(min_value=1, max_value=96),
    nrows=st.integers(min_value=1, max_value=6),
    g4=st.booleans(),
    black1=st.booleans(),
)
def test_ccitt_hypothesis_roundtrip(data, cols, nrows, g4, black1):
    bm = [
        [data.draw(st.integers(min_value=0, max_value=1)) for _ in range(cols)]
        for _ in range(nrows)
    ]
    if g4:
        enc = encode_ccitt_g4(bm, cols)
        parms = {"K": -1, "Columns": cols, "Rows": nrows, "BlackIs1": black1}
    else:
        enc = encode_ccitt_g3_1d(bm, cols)
        parms = {"K": 0, "Columns": cols, "Rows": nrows, "BlackIs1": black1}
    got = decode_ccitt(enc, parms)
    assert got == _expected_packed(bm, cols, black1)

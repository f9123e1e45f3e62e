"""Baseline JPEG pixel codec (kernel/jpeg_codec.py).

A beyond-reference extension: the reference's dct.rs:52-67 returns JPEG
bytes as-is ("The PDF reader will handle the actual JPEG decoding");
this codec actually decodes baseline, extended-sequential and
progressive streams.  All fixtures are built by the in-module encoder
(the sandbox has no image libraries), so every test is a
self-validating encoder/decoder pair plus hand-built marker streams for
the error paths; progressive correctness is pinned by exact pixel
equality against the baseline stream of the same quantized
coefficients.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from oxidizepdf_spark.kernel import image_codecs
from oxidizepdf_spark.kernel.jpeg_codec import (
    JpegError,
    decode_jpeg,
    decode_jpeg_to_rgb,
    encode_jpeg,
)


def maxerr(a, b):
    return int(np.abs(a.astype(np.int64) - b.astype(np.int64)).max())


def gradient_gray(h=40, w=64):
    return np.tile(np.linspace(0, 255, w).astype(np.uint8), (h, 1))


def smooth_rgb(h=37, w=53):
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([(xx * 3) % 256, (yy * 2) % 256, (xx + yy) % 256], axis=-1)
    return (img // 8 * 8).astype(np.uint8)


# ---------------------------------------------------------------------------
# Grayscale
# ---------------------------------------------------------------------------


def test_flat_gray_exact_roundtrip():
    img = np.full((16, 24), 130, dtype=np.uint8)
    dec, info = decode_jpeg(encode_jpeg(img, quality=100))
    assert (info["width"], info["height"], info["components"]) == (24, 16, 1)
    assert dec.shape == (16, 24, 1)
    assert maxerr(dec[..., 0], img) == 0


def test_gradient_gray_exact_at_q100():
    img = gradient_gray()
    dec, _ = decode_jpeg(encode_jpeg(img, quality=100))
    assert maxerr(dec[..., 0], img) == 0


def test_gray_decode_to_rgb_keeps_one_component():
    img = gradient_gray(17, 19)  # non-multiple-of-8 dims
    rgb, n = decode_jpeg_to_rgb(encode_jpeg(img, quality=95))
    assert n == 1 and rgb.shape == (17, 19, 1)
    assert maxerr(rgb[..., 0], img) <= 3


# ---------------------------------------------------------------------------
# RGB 4:4:4 and 4:2:0
# ---------------------------------------------------------------------------


def test_rgb_444_smooth_tolerance():
    img = smooth_rgb()
    rgb, n = decode_jpeg_to_rgb(encode_jpeg(img, quality=98))
    assert n == 3 and rgb.shape == img.shape
    err = np.abs(rgb.astype(int) - img.astype(int))
    assert err.max() <= 12 and err.mean() < 2.0


def test_rgb_420_odd_dimensions():
    img = smooth_rgb(37, 53)  # odd dims exercise crop-after-upsample
    rgb, n = decode_jpeg_to_rgb(
        encode_jpeg(img, quality=95, subsampling="4:2:0")
    )
    assert rgb.shape == (37, 53, 3)
    err = np.abs(rgb.astype(int) - img.astype(int))
    assert err.max() <= 20 and err.mean() < 4.0


def test_chroma_flat_420_exact():
    # Gray content through the full YCbCr 4:2:0 path: chroma planes are
    # constant 128, so subsampling loses nothing and q100 is exact.
    g = gradient_gray(32, 64)
    img = np.stack([g, g, g], axis=-1)
    rgb, _ = decode_jpeg_to_rgb(
        encode_jpeg(img, quality=100, subsampling="4:2:0")
    )
    assert maxerr(rgb, img) == 0


def test_solid_color_420_within_rounding():
    img = np.zeros((16, 16, 3), np.uint8)
    img[..., 0], img[..., 1], img[..., 2] = 200, 50, 100
    rgb, _ = decode_jpeg_to_rgb(
        encode_jpeg(img, quality=100, subsampling="4:2:0")
    )
    assert maxerr(rgb, img) <= 1  # YCbCr forward+inverse rounding


def test_byte_unstuffing_exercised():
    # High-contrast noise eventually produces a 0xFF entropy byte, which
    # the encoder stuffs as FF 00 and the decoder must unstuff.  Scan
    # seeds deterministically until one such stream appears, then prove
    # it still roundtrips.
    for seed in range(64):
        rng = np.random.default_rng(seed)
        img = (rng.integers(0, 2, (48, 48)) * 255).astype(np.uint8)
        enc = encode_jpeg(img, quality=50)
        sos = enc.index(b"\xff\xda")
        if b"\xff\x00" in enc[sos:]:
            break
    else:
        pytest.fail("no seed produced a stuffed 0xFF byte")
    dec, _ = decode_jpeg(enc)
    assert dec.shape == (48, 48, 1)
    # And a q100 re-encode of the decoded pixels stays within FDCT/IDCT
    # rounding (stability check on the unstuffing path).
    again, _ = decode_jpeg(encode_jpeg(dec[..., 0], quality=100))
    assert maxerr(again[..., 0], dec[..., 0]) <= 1


# ---------------------------------------------------------------------------
# Restart intervals
# ---------------------------------------------------------------------------


def test_restart_interval_stream_decodes_identically():
    img = gradient_gray(24, 64)
    plain = decode_jpeg(encode_jpeg(img, quality=85))[0]
    enc_rst = encode_jpeg(img, quality=85, restart_interval=2)
    assert b"\xff\xdd" in enc_rst  # DRI segment
    sos = enc_rst.index(b"\xff\xda")
    assert any(
        bytes([0xFF, 0xD0 + i]) in enc_rst[sos:] for i in range(8)
    )
    assert np.array_equal(decode_jpeg(enc_rst)[0], plain)


def test_restart_interval_interleaved_rgb():
    img = smooth_rgb(33, 49)
    plain = decode_jpeg(encode_jpeg(img, quality=90, subsampling="4:2:0"))[0]
    rst = decode_jpeg(
        encode_jpeg(img, quality=90, subsampling="4:2:0", restart_interval=1)
    )[0]
    assert np.array_equal(plain, rst)


def test_wrong_restart_marker_raises():
    img = gradient_gray(24, 64)
    enc = bytearray(encode_jpeg(img, quality=85, restart_interval=2))
    sos = enc.index(b"\xff\xda")
    # Corrupt the first RSTn (cycle starts at D0) to RST5.
    idx = enc.index(bytes([0xFF, 0xD0]), sos)
    enc[idx + 1] = 0xD5
    with pytest.raises(JpegError, match="restart marker"):
        decode_jpeg(bytes(enc))


# ---------------------------------------------------------------------------
# Colour-space policy (dct.rs:277-293 parity at the pixel level)
# ---------------------------------------------------------------------------


def adobe_app14(transform: int) -> bytes:
    seg = b"Adobe" + b"\x00\x64" + b"\x00\x00\x00\x00" + bytes([transform])
    return b"\xff\xee" + struct.pack(">H", len(seg) + 2) + seg


def insert_after_soi(jpeg: bytes, segment: bytes) -> bytes:
    assert jpeg[:2] == b"\xff\xd8"
    return jpeg[:2] + segment + jpeg[2:]


def test_adobe_transform0_rgb_passthrough():
    img = smooth_rgb(24, 24)
    enc = encode_jpeg(img, quality=95)
    native = decode_jpeg(enc)[0]  # YCbCr planes as stored
    tagged = insert_after_soi(enc, adobe_app14(0))
    rgb, n = decode_jpeg_to_rgb(tagged)
    assert n == 3
    # Transform 0 means "already RGB": planes returned unconverted.
    assert np.array_equal(rgb, native)
    info = image_codecs.parse_jpeg_info(tagged)
    assert info.color_space == "RGB"


def test_cmyk_native_roundtrip():
    # 4 native planes, no Adobe marker: direct CMYK (no inversion).
    img = np.zeros((16, 16, 4), np.uint8)
    rgb, n = decode_jpeg_to_rgb(encode_jpeg(img, quality=100, native=True))
    assert n == 3
    assert np.array_equal(rgb[0, 0], [255, 255, 255])  # zero ink = white
    img[..., 0] = 255  # full cyan
    rgb, _ = decode_jpeg_to_rgb(encode_jpeg(img, quality=100, native=True))
    assert np.array_equal(rgb[0, 0], [0, 255, 255])
    info = image_codecs.parse_jpeg_info(
        encode_jpeg(img, quality=100, native=True)
    )
    assert info.components == 4 and info.color_space == "CMYK"


def test_cmyk_adobe_inverted_convention():
    # With an Adobe APP14 (transform 0) the samples are inverted: a
    # stored 255 means zero ink.
    img = np.full((16, 16, 4), 255, np.uint8)
    enc = insert_after_soi(
        encode_jpeg(img, quality=100, native=True), adobe_app14(0)
    )
    rgb, _ = decode_jpeg_to_rgb(enc)
    assert np.array_equal(rgb[0, 0], [255, 255, 255])


# ---------------------------------------------------------------------------
# Header agreement with the dct.rs-parity parser
# ---------------------------------------------------------------------------


def test_info_agrees_with_parse_jpeg_info():
    img = smooth_rgb(21, 45)
    enc = encode_jpeg(img, quality=90, subsampling="4:2:0")
    ours = decode_jpeg(enc)[1]
    ref = image_codecs.parse_jpeg_info(enc)
    assert (ref.width, ref.height, ref.components) == (
        ours["width"], ours["height"], ours["components"]
    ) == (45, 21, 3)
    assert ref.color_space == "YCbCr"


# ---------------------------------------------------------------------------
# Error paths
# ---------------------------------------------------------------------------


def test_missing_soi_raises():
    with pytest.raises(JpegError, match="SOI"):
        decode_jpeg(b"\x00\x01\x02\x03")


def test_truncated_entropy_raises():
    enc = encode_jpeg(gradient_gray(), quality=90)
    with pytest.raises(JpegError):
        decode_jpeg(enc[: len(enc) * 2 // 3])


def test_arithmetic_sof9_raises():
    # Minimal SOF9 (arithmetic) stream: the Huffman decoder must refuse
    # rather than mis-decode.
    data = bytes([
        0xFF, 0xD8,
        0xFF, 0xC9, 0x00, 0x0B,
        0x08, 0x00, 0x20, 0x00, 0x20, 0x01, 0x01, 0x11, 0x00,
        0xFF, 0xD9,
    ])
    with pytest.raises(JpegError, match="unsupported JPEG process"):
        decode_jpeg(data)
    # ...while the dct.rs-parity metadata parser still reads it.
    info = image_codecs.parse_jpeg_info(data)
    assert (info.width, info.height) == (32, 32)


def test_progressive_header_without_scans_raises():
    data = bytes([
        0xFF, 0xD8,
        0xFF, 0xC2, 0x00, 0x0B,
        0x08, 0x00, 0x20, 0x00, 0x20, 0x01, 0x01, 0x11, 0x00,
        0xFF, 0xD9,
    ])
    with pytest.raises(JpegError, match="no decoded scan data"):
        decode_jpeg(data)


# ---------------------------------------------------------------------------
# Progressive (SOF2): every scan kind, validated against the baseline
# stream of the same quantized coefficients
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("name,img_fn,kw", [
    ("gray-smooth", lambda: gradient_gray(40, 64), dict(quality=90)),
    ("gray-noise", lambda: (
        np.random.default_rng(5).integers(0, 256, (48, 48)).astype(np.uint8)
    ), dict(quality=50)),
    ("rgb-444", lambda: smooth_rgb(37, 53), dict(quality=95)),
    ("rgb-420", lambda: smooth_rgb(37, 53),
     dict(quality=90, subsampling="4:2:0")),
    ("rgb-noise-420", lambda: (
        np.random.default_rng(5).integers(0, 256, (33, 47, 3))
        .astype(np.uint8)
    ), dict(quality=40, subsampling="4:2:0")),
])
def test_progressive_equals_baseline(name, img_fn, kw):
    # Both streams carry identical quantized coefficients, so the
    # progressive scans (DC first Al=1, DC refine, AC first Al=1, AC
    # refine) must reconstruct EXACTLY the baseline pixels.
    img = img_fn()
    base = decode_jpeg(encode_jpeg(img, **kw))
    prog = decode_jpeg(encode_jpeg(img, progressive=True, **kw))
    assert base[0].shape == prog[0].shape
    assert np.array_equal(base[0], prog[0])
    assert prog[1]["components"] == base[1]["components"]


def test_progressive_eobrun_accumulation():
    # A flat image makes every AC block empty: the AC-first scan is one
    # accumulated EOB run over all blocks, and the AC-refine scan one
    # EOBn with no correction bits.
    img = np.full((64, 64), 77, dtype=np.uint8)
    prog = encode_jpeg(img, quality=90, progressive=True)
    base = decode_jpeg(encode_jpeg(img, quality=90))[0]
    assert np.array_equal(decode_jpeg(prog)[0], base)


def test_progressive_truncated_raises():
    enc = encode_jpeg(smooth_rgb(24, 24), quality=80, progressive=True)
    with pytest.raises(JpegError):
        decode_jpeg(enc[: len(enc) * 3 // 4])


def test_oversubscribed_dht_raises():
    img = gradient_gray(8, 8)
    enc = bytearray(encode_jpeg(img, quality=90))
    dht = enc.index(b"\xff\xc4")
    # BITS starts 5 bytes in (FF C4 len2 tcth); claim 3 codes of length 1.
    enc[dht + 5] = 3
    with pytest.raises(JpegError):
        decode_jpeg(bytes(enc))


def test_scan_without_tables_raises():
    img = gradient_gray(8, 8)
    enc = encode_jpeg(img, quality=90)
    # Strip every DHT segment.
    out = bytearray()
    pos = 0
    data = enc
    out += data[:2]
    pos = 2
    while pos + 1 < len(data):
        marker = data[pos + 1]
        if marker == 0xDA:
            out += data[pos:]
            break
        seg_len = struct.unpack(">H", data[pos + 2:pos + 4])[0]
        if marker != 0xC4:
            out += data[pos:pos + 2 + seg_len]
        pos += 2 + seg_len
    with pytest.raises(JpegError, match="Huffman table"):
        decode_jpeg(bytes(out))


def test_mutation_fuzz_contained():
    # Arbitrary corruption of a valid stream must either decode or
    # raise JpegError — never leak IndexError/struct.error to callers
    # feeding untrusted PDF bytes.
    import random

    rng = random.Random(1234)
    base = bytearray(encode_jpeg(smooth_rgb(24, 24), quality=80))
    for _ in range(400):
        mutated = bytearray(base)
        op = rng.randrange(3)
        if op == 0:  # truncate
            mutated = mutated[: rng.randrange(2, len(mutated))]
        elif op == 1:  # flip bytes
            for _ in range(rng.randrange(1, 6)):
                mutated[rng.randrange(len(mutated))] = rng.randrange(256)
        else:  # splice random garbage
            at = rng.randrange(len(mutated))
            mutated[at:at] = bytes(
                rng.randrange(256) for _ in range(rng.randrange(1, 16))
            )
        try:
            decode_jpeg(bytes(mutated))
        except JpegError:
            pass


def test_progressive_equals_baseline_hypothesis():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        h=st.integers(8, 40),
        w=st.integers(8, 40),
        q=st.integers(25, 100),
        nc=st.sampled_from([1, 3]),
        sub=st.sampled_from(["4:4:4", "4:2:0"]),
        seed=st.integers(0, 2**31 - 1),
    )
    def run(h, w, q, nc, sub, seed):
        rng = np.random.default_rng(seed)
        shape = (h, w) if nc == 1 else (h, w, 3)
        img = rng.integers(0, 256, shape).astype(np.uint8)
        base = decode_jpeg(encode_jpeg(img, quality=q, subsampling=sub))[0]
        prog = decode_jpeg(
            encode_jpeg(img, quality=q, subsampling=sub, progressive=True)
        )[0]
        assert np.array_equal(base, prog)

    run()


def test_rgb_422_subsampling():
    # 4:2:2 (horizontal-only chroma decimation) exercises the
    # axis-specific upsample path; progressive must still match.
    img = smooth_rgb(37, 53)
    enc = encode_jpeg(img, quality=95, subsampling="4:2:2")
    rgb, _ = decode_jpeg_to_rgb(enc)
    err = np.abs(rgb.astype(int) - img.astype(int))
    assert rgb.shape == img.shape and err.max() <= 20 and err.mean() < 4.0
    prog = encode_jpeg(img, quality=95, subsampling="4:2:2",
                       progressive=True)
    assert np.array_equal(decode_jpeg(enc)[0], decode_jpeg(prog)[0])


# ---------------------------------------------------------------------------
# 12-bit precision (round 10): T.81 Table B.2 — extended sequential
# (SOF1) and progressive (SOF2) allow P=12; baseline stays 8-bit
# ---------------------------------------------------------------------------


def gradient_gray12(h=32, w=48):
    yy, xx = np.mgrid[0:h, 0:w]
    return ((xx * 83 + yy * 51) % 4096).astype(np.uint16)


def smooth_rgb12(h=32, w=40):
    yy, xx = np.mgrid[0:h, 0:w]
    g = ((np.sin(xx / 9) + np.cos(yy / 7)) * 1000 + 2048)
    return np.stack([g, np.roll(g, 3, 1), 4095 - g], -1).astype(np.uint16)


def test_12bit_gray_flat_exact():
    img = np.full((16, 24), 2071, dtype=np.uint16)
    dec, info = decode_jpeg(encode_jpeg(img, quality=100, precision=12))
    assert info["precision"] == 12
    assert dec.dtype == np.uint16
    assert int(np.abs(dec[..., 0].astype(int) - img.astype(int)).max()) == 0


def test_12bit_smooth_tolerance_scales():
    # quant steps scale 16x with the samples, so the RELATIVE error
    # matches the 8-bit case: bounds are the 8-bit ones times 16
    img = smooth_rgb12()
    rgb, n = decode_jpeg_to_rgb(encode_jpeg(img, quality=98, precision=12))
    assert n == 3 and rgb.dtype == np.uint16
    err = np.abs(rgb.astype(int) - img.astype(int))
    assert err.max() <= 12 * 16 and err.mean() < 2.0 * 16


def test_12bit_stream_shape():
    enc = encode_jpeg(gradient_gray12(), quality=80, precision=12)
    # SOF1 marker, 12-bit precision byte, 16-bit DQT (Pq=1)
    assert b"\xff\xc1" in enc and b"\xff\xc0" not in enc
    at = enc.index(b"\xff\xc1")
    assert enc[at + 4] == 12
    dqt_at = enc.index(b"\xff\xdb")
    assert enc[dqt_at + 4] >> 4 == 1  # Pq = 1: 16-bit elements
    assert struct.unpack(">H", enc[dqt_at + 2:dqt_at + 4])[0] == 131


def test_12bit_progressive_equals_sequential():
    for img, kw in ((gradient_gray12(), dict(quality=85)),
                    (smooth_rgb12(), dict(quality=90,
                                          subsampling="4:2:0"))):
        base = decode_jpeg(encode_jpeg(img, precision=12, **kw))
        prog = decode_jpeg(encode_jpeg(img, precision=12,
                                       progressive=True, **kw))
        assert np.array_equal(base[0], prog[0])
        assert prog[1]["precision"] == 12


def test_12bit_baseline_marker_rejected():
    # patch SOF1 -> SOF0: a 12-bit BASELINE frame is not a legal
    # process (T.81 Table B.2) and must be loud
    enc = bytearray(encode_jpeg(gradient_gray12(), precision=12))
    at = bytes(enc).index(b"\xff\xc1")
    enc[at + 1] = 0xC0
    with pytest.raises(JpegError, match="precision"):
        decode_jpeg(bytes(enc))


def test_12bit_cmyk_native_roundtrip():
    rng = np.random.default_rng(17)
    planes = (rng.integers(0, 4096, (24, 24, 4)) // 64 * 64).astype(
        np.uint16)
    enc = encode_jpeg(planes, quality=100, native=True, precision=12)
    dec, info = decode_jpeg(enc)
    assert info["components"] == 4 and info["precision"] == 12
    assert int(np.abs(dec.astype(int) - planes.astype(int)).max()) <= 64


def test_12bit_encoder_guards():
    with pytest.raises(JpegError, match="precision"):
        encode_jpeg(np.zeros((8, 8), np.uint8), precision=10)
    with pytest.raises(JpegError, match="exceed range"):
        encode_jpeg(np.full((8, 8), 5000, np.uint16), precision=12)


# ---------------------------------------------------------------------------
# Lossless process (SOF3, T.81 Annex H; round 10)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("predictor", [1, 2, 3, 4, 5, 6, 7])
def test_lossless_exact_all_predictors(predictor):
    rng = np.random.default_rng(predictor)
    img = rng.integers(0, 256, (23, 31)).astype(np.uint8)
    enc = encode_jpeg(img, lossless=True, predictor=predictor)
    dec, info = decode_jpeg(enc)
    assert info["lossless"] is True and info["precision"] == 8
    assert np.array_equal(dec[..., 0], img)


def test_lossless_16bit_rgb_exact():
    rng = np.random.default_rng(23)
    img = rng.integers(0, 1 << 16, (20, 28, 3)).astype(np.uint16)
    dec, info = decode_jpeg(encode_jpeg(img, lossless=True, precision=16))
    assert info["precision"] == 16 and dec.dtype == np.uint16
    assert np.array_equal(dec, img)
    # 12-bit too, with the SOF3 marker on the wire
    img12 = (img >> 4).astype(np.uint16)
    enc = encode_jpeg(img12, lossless=True, precision=12)
    assert b"\xff\xc3" in enc and b"\xff\xdb" not in enc  # no DQT
    dec12, _ = decode_jpeg(enc)
    assert np.array_equal(dec12, img12)


def test_lossless_point_transform():
    rng = np.random.default_rng(29)
    img = (rng.integers(0, 256, (16, 16)) & 0xFC).astype(np.uint8)
    # Pt=2: samples are coded downshifted; decode upshifts — exact for
    # samples whose low bits are zero
    dec, _ = decode_jpeg(encode_jpeg(img, lossless=True,
                                     point_transform=2))
    assert np.array_equal(dec[..., 0], img)


def test_lossless_restart_intervals():
    rng = np.random.default_rng(31)
    img = rng.integers(0, 4096, (17, 19, 3)).astype(np.uint16)
    enc = encode_jpeg(img, lossless=True, precision=12,
                      restart_interval=7)
    assert b"\xff\xdd" in enc and b"\xff\xd0" in enc
    dec, _ = decode_jpeg(enc)
    assert np.array_equal(dec, img)


def test_lossless_ssss16_wraparound():
    # a 0 -> 32768 jump at P=16 exercises the SSSS=16 no-extra-bits
    # category and the modulo-65536 reconstruction (H.1.2.1/2)
    img = np.array([[0, 32768], [65535, 0]], dtype=np.uint16)
    dec, _ = decode_jpeg(encode_jpeg(img, lossless=True, precision=16,
                                     predictor=1))
    assert np.array_equal(dec[..., 0], img)


def test_lossless_guards():
    img8 = np.zeros((8, 8), np.uint8)
    with pytest.raises(JpegError, match="predictor"):
        encode_jpeg(img8, lossless=True, predictor=0)
    with pytest.raises(JpegError, match="point transform"):
        encode_jpeg(img8, lossless=True, point_transform=8)
    with pytest.raises(JpegError, match="progressive"):
        encode_jpeg(img8, lossless=True, progressive=True)
    # decoder: predictor 0 on the wire is loud
    enc = bytearray(encode_jpeg(img8, lossless=True))
    at = bytes(enc).index(b"\xff\xda")
    ln = struct.unpack(">H", enc[at + 2:at + 4])[0]
    enc[at + ln - 1] = 0  # Ss byte (third from the segment end)
    with pytest.raises(JpegError, match="predictor"):
        decode_jpeg(bytes(enc))


def test_lossless_mutation_fuzz_contained():
    import random

    rng = random.Random(37)
    img = (np.random.default_rng(41).integers(0, 4096, (20, 24))
           .astype(np.uint16))
    base = bytearray(encode_jpeg(img, lossless=True, precision=12,
                                 restart_interval=5))
    decode_jpeg(bytes(base))  # sanity
    for _ in range(300):
        mutated = bytearray(base)
        op = rng.randrange(3)
        if op == 0:
            mutated = mutated[: rng.randrange(2, len(mutated))]
        elif op == 1:
            for _ in range(rng.randrange(1, 6)):
                mutated[rng.randrange(len(mutated))] = rng.randrange(256)
        else:
            at = rng.randrange(len(mutated))
            mutated[at:at] = bytes(rng.randrange(256)
                                   for _ in range(rng.randrange(1, 10)))
        try:
            decode_jpeg(bytes(mutated))
        except JpegError:
            pass


def test_lossless_restart_first_line_uses_ra_predictor():
    """T.81 H.1.2.1 (ADVICE r10): after an RSTn the remainder of the
    restart interval's first line predicts with the 1-D Ra predictor,
    never a 2-D predictor reaching rows decoded before the marker.
    With one restart per line this makes every line self-contained:
    the encoded segment for a line must not change when OTHER lines'
    samples do."""
    import numpy as np

    rng = np.random.default_rng(5)
    w, h = 16, 6
    img = rng.integers(0, 256, (h, w), dtype=np.uint8)
    img2 = img.copy()
    img2[2] = (img2[2] + 97) % 256  # perturb only line 2

    def segments(stream: bytes) -> list[bytes]:
        # split the entropy-coded data at RSTn markers
        sos = stream.find(b"\xff\xda")
        body = stream[sos:]
        out, cur, i = [], bytearray(), 0
        while i < len(body):
            if body[i] == 0xFF and i + 1 < len(body) and \
                    0xD0 <= body[i + 1] <= 0xD7:
                out.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            cur.append(body[i])
            i += 1
        out.append(bytes(cur))
        return out

    for predictor in (4, 5, 7):
        enc1 = encode_jpeg(img, lossless=True, predictor=predictor,
                           restart_interval=w)
        enc2 = encode_jpeg(img2, lossless=True, predictor=predictor,
                           restart_interval=w)
        # exact roundtrip still holds
        dec1, info = decode_jpeg(enc1)
        assert info["lossless"] and np.array_equal(dec1[..., 0], img)
        dec2, _ = decode_jpeg(enc2)
        assert np.array_equal(dec2[..., 0], img2)
        s1, s2 = segments(enc1), segments(enc2)
        # h-1 RSTn markers -> h segments (s[0] = SOS header + line 0)
        assert len(s1) == len(s2) == h
        # every line except the perturbed one encodes identically —
        # impossible if line y still predicted from line y-1
        for y in range(h):
            if y == 2:
                assert s1[y] != s2[y]
            else:
                assert s1[y] == s2[y], y


def test_lossless_restart_midline_roundtrip_exact():
    """Restart intervals that end mid-line exercise the Ra-forced tail
    of the interval's first line; the shared-rule encoder/decoder pair
    must stay exact."""
    import numpy as np

    rng = np.random.default_rng(9)
    img = rng.integers(0, 4096, (5, 11), dtype=np.uint16)
    for dri in (3, 7, 11, 13):
        enc = encode_jpeg(img, lossless=True, predictor=6, precision=12,
                          restart_interval=dri)
        dec, info = decode_jpeg(enc)
        assert info["precision"] == 12
        assert np.array_equal(dec[..., 0], img)


def test_png_sink_scales_lossless_by_precision():
    """ADVICE r10: the PNG sink must shift decoded uint16 samples by
    (precision - 8), not a fixed 4 bits — a 16-bit lossless JPEG
    previously wrapped modulo 256; sub-8-bit output upscales."""
    import numpy as np

    from oxidizepdf_spark.kernel.extract_images import (
        ExtractImagesOptions,
        extract_images_from_pdf,
    )
    from tests.test_extract_images import image_pdf, parse_png

    w, h = 16, 12
    img16 = (np.arange(w * h, dtype=np.uint16).reshape(h, w) * 341)
    jpeg = encode_jpeg(img16, lossless=True, precision=16)
    body = (
        b"<< /Type /XObject /Subtype /Image /Width %d /Height %d "
        b"/ColorSpace /DeviceGray /BitsPerComponent 16 /Filter /DCTDecode "
        b"/Length %d >>\nstream\n%s\nendstream" % (w, h, len(jpeg), jpeg)
    )
    images = extract_images_from_pdf(
        image_pdf(body), ExtractImagesOptions(decode_jpeg_images=True)
    )
    assert images[0].format == "png"
    _pw, _ph, depth, _ct, pixels = parse_png(images[0].data)
    assert depth == 8
    assert pixels == (img16 >> 8).astype(np.uint8).tobytes()

    img6 = (np.arange(w * h, dtype=np.uint16).reshape(h, w) % 64)
    jpeg6 = encode_jpeg(img6, lossless=True, precision=6)
    body6 = (
        b"<< /Type /XObject /Subtype /Image /Width %d /Height %d "
        b"/ColorSpace /DeviceGray /BitsPerComponent 8 /Filter /DCTDecode "
        b"/Length %d >>\nstream\n%s\nendstream" % (w, h, len(jpeg6), jpeg6)
    )
    images6 = extract_images_from_pdf(
        image_pdf(body6), ExtractImagesOptions(decode_jpeg_images=True)
    )
    assert images6[0].format == "png"
    _pw, _ph, depth6, _ct, pixels6 = parse_png(images6[0].data)
    assert depth6 == 8
    assert pixels6 == (img6.astype(np.uint8) << 2).tobytes()

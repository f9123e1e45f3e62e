"""JPEG 2000 lossless codec (kernel/jp2k.py).

A beyond-reference extension: the reference ERRORS on JPXDecode
(operations/extract_images.rs "Unsupported image filter"); this module
really decodes the lossless Part-1 profile.  No JPEG 2000 library
exists in the sandbox, so — exactly like the JBIG2 suite — every
decoder path is pinned by exact roundtrips through the in-module
by-construction encoder, layer by layer: DWT, tag trees, packet bit IO,
Tier-1 codeblocks, then full codestreams.  The MQ coder itself is the
JBIG2-shared transcription already proven against mq_coder.rs.
"""

from __future__ import annotations

import numpy as np
import pytest

from oxidizepdf_spark.kernel import jp2k as K
from oxidizepdf_spark.kernel.jp2k import Jp2kError, decode_jp2k, encode_jp2k


# ---------------------------------------------------------------------------
# Layer 1: DWT / RCT
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n", [1, 2, 3, 4, 5, 7, 8, 16, 17, 33, 100])
def test_dwt53_1d_roundtrip(n):
    rng = np.random.default_rng(n)
    x = rng.integers(-1000, 1000, (n, 3)).astype(np.int64)
    lo, hi = K._dwt53_1d_forward(x)
    assert lo.shape[0] == (n + 1) // 2 and hi.shape[0] == n // 2
    assert np.array_equal(K._dwt53_1d_inverse(lo, hi), x)


@pytest.mark.parametrize("h,w", [(1, 1), (1, 9), (9, 1), (8, 8),
                                 (7, 13), (37, 53)])
def test_dwt53_2d_roundtrip(h, w):
    rng = np.random.default_rng(h * 100 + w)
    a = rng.integers(-500, 500, (h, w)).astype(np.int64)
    assert np.array_equal(K.dwt53_inverse_2d(*K.dwt53_forward_2d(a)), a)


def test_dwt53_multilevel_roundtrip():
    rng = np.random.default_rng(5)
    a = rng.integers(0, 256, (37, 53)).astype(np.int64)
    cur, details = a, []
    for _ in range(3):
        ll, hl, lh, hh = K.dwt53_forward_2d(cur)
        details.append((hl, lh, hh))
        cur = ll
    for hl, lh, hh in reversed(details):
        cur = K.dwt53_inverse_2d(cur, hl, lh, hh)
    assert np.array_equal(cur, a)


def test_rct_roundtrip():
    rng = np.random.default_rng(6)
    rgb = rng.integers(0, 256, (10, 10, 3)).astype(np.int64)
    assert np.array_equal(K.rct_inverse(K.rct_forward(rgb)), rgb)


# ---------------------------------------------------------------------------
# Layer 2: packet bit IO + tag trees
# ---------------------------------------------------------------------------


def test_packet_bit_io_stuffing():
    rng = np.random.default_rng(7)
    for trial in range(100):
        bits = [int(b) for b in rng.integers(0, 2, int(rng.integers(1, 120)))]
        if trial % 3 == 0:  # force 0xFF bytes to exercise stuffing
            bits = [1] * int(rng.integers(8, 40)) + bits
        w = K._PacketBitWriter()
        for b in bits:
            w.write_bit(b)
        r = K._PacketBitReader(w.flush() + b"BODY")
        assert [r.read_bit() for _ in bits] == bits


def test_tag_tree_roundtrip():
    rng = np.random.default_rng(8)
    for trial in range(50):
        h, w = int(rng.integers(1, 7)), int(rng.integers(1, 7))
        leaves = rng.integers(0, 6, (h, w))
        enc = K.TagTreeEncoder(leaves)
        bw = K._PacketBitWriter()
        for t in range(1, 8):
            for y in range(h):
                for x in range(w):
                    enc.encode(bw, y, x, t)
        dec = K.TagTreeDecoder(h, w)
        br = K._PacketBitReader(bw.flush() + b"\xff")
        for t in range(1, 8):
            for y in range(h):
                for x in range(w):
                    assert dec.decode(br, y, x, t) == (leaves[y, x] < t)


# ---------------------------------------------------------------------------
# Layer 3: Tier-1 codeblocks
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("band", ["LL", "HL", "LH", "HH"])
def test_codeblock_roundtrip(band):
    rng = np.random.default_rng(hash(band) % 2**31)
    for trial in range(25):
        h, w = int(rng.integers(1, 20)), int(rng.integers(1, 20))
        scale = int(rng.choice([1, 3, 40, 1000]))
        coefs = rng.integers(-scale, scale + 1, (h, w)).astype(np.int64)
        if trial % 7 == 0:
            coefs[:] = 0
        if trial % 5 == 0:
            coefs *= rng.random((h, w)) < 0.05  # sparse: run-length mode
        data, n_passes, max_plane = K.encode_codeblock(coefs, band)
        got = K.decode_codeblock(data, h, w, band, max_plane, n_passes)
        assert np.array_equal(got, coefs)


def test_codeblock_all_zero():
    data, n_passes, max_plane = K.encode_codeblock(
        np.zeros((8, 8), np.int64), "HH"
    )
    assert (data, n_passes, max_plane) == (b"", 0, -1)
    assert not K.decode_codeblock(b"", 8, 8, "HH", -1, 0).any()


# ---------------------------------------------------------------------------
# Layer 4: full codestreams
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("h,w", [(1, 1), (1, 17), (16, 1), (5, 5),
                                 (37, 53), (100, 130)])
def test_full_roundtrip_gray(h, w):
    rng = np.random.default_rng(h * 1000 + w)
    img = rng.integers(0, 256, (h, w)).astype(np.uint8)
    for levels in (0, 2):
        dec, info = decode_jp2k(encode_jp2k(img, levels=levels))
        assert np.array_equal(dec[..., 0], img)
        assert (info["width"], info["height"]) == (w, h)


def test_full_roundtrip_small_codeblocks():
    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, (37, 53)).astype(np.uint8)
    # 16x16 codeblocks force multi-codeblock subbands (tag-tree grids)
    dec, _ = decode_jp2k(encode_jp2k(img, levels=2, cb_exp=4))
    assert np.array_equal(dec[..., 0], img)


def test_full_roundtrip_rgb_mct_both_ways():
    rng = np.random.default_rng(22)
    rgb = rng.integers(0, 256, (29, 31, 3)).astype(np.uint8)
    for mct in (True, False):
        dec, info = decode_jp2k(encode_jp2k(rgb, mct=mct))
        assert np.array_equal(dec, rgb)
        assert info["mct"] is mct


def test_full_roundtrip_four_components():
    rng = np.random.default_rng(23)
    rgba = rng.integers(0, 256, (20, 22, 4)).astype(np.uint8)
    dec, info = decode_jp2k(encode_jp2k(rgba))
    assert np.array_equal(dec, rgba) and info["components"] == 4


def test_full_roundtrip_16bit():
    rng = np.random.default_rng(24)
    img = rng.integers(0, 65536, (23, 19)).astype(np.uint16)
    dec, info = decode_jp2k(encode_jp2k(img, levels=2))
    assert dec.dtype == np.uint16 and info["depth"] == 16
    assert np.array_equal(dec[..., 0], img)


def test_smooth_image_compresses_and_empty_packets():
    # A smooth ramp leaves high-frequency subbands all-zero: their
    # packets take the empty-packet path AND the stream actually
    # compresses (sanity that this is a real entropy coder).
    yy, xx = np.mgrid[0:40, 0:60]
    img = ((xx + yy) // 4).astype(np.uint8)
    enc = encode_jp2k(img, levels=3)
    assert len(enc) < img.size // 4
    dec, _ = decode_jp2k(enc)
    assert np.array_equal(dec[..., 0], img)


def test_flat_and_zero_images():
    for img in (np.zeros((30, 30), np.uint8),
                np.full((30, 30), 200, np.uint8)):
        dec, _ = decode_jp2k(encode_jp2k(img, levels=2))
        assert np.array_equal(dec[..., 0], img)


def test_jp2_container_roundtrip():
    rng = np.random.default_rng(25)
    img = rng.integers(0, 256, (25, 35)).astype(np.uint8)
    enc = encode_jp2k(img, jp2_container=True)
    assert enc[:8] == b"\x00\x00\x00\x0cjP  "
    dec, _ = decode_jp2k(enc)
    assert np.array_equal(dec[..., 0], img)


# ---------------------------------------------------------------------------
# Error paths + containment
# ---------------------------------------------------------------------------


def test_missing_soc_raises():
    with pytest.raises(Jp2kError, match="SOC"):
        decode_jp2k(b"\x00\x01\x02\x03")


def test_truncated_stream_raises():
    enc = encode_jp2k(
        np.random.default_rng(1).integers(0, 256, (20, 20)).astype(np.uint8)
    )
    with pytest.raises(Jp2kError):
        decode_jp2k(enc[: len(enc) // 2])


def test_irreversible_claim_on_unquantized_stream_rejected():
    # 9/7 decodes since round 8 — but claiming it on a style-0
    # (no-quantization) stream is inconsistent and still rejects
    enc = bytearray(encode_jp2k(np.zeros((8, 8), np.uint8)))
    cod_at = enc.index(b"\xff\x52")
    enc[cod_at + 13] = 0  # SPcod transform byte: 0 = 9/7 irreversible
    with pytest.raises(Jp2kError, match="quantization"):
        decode_jp2k(bytes(enc))


def test_mutation_fuzz_contained():
    import random

    rng = random.Random(99)
    base = bytearray(encode_jp2k(
        np.random.default_rng(2).integers(0, 256, (24, 24, 3))
        .astype(np.uint8)
    ))
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
            mutated[at:at] = bytes(
                rng.randrange(256) for _ in range(rng.randrange(1, 12))
            )
        try:
            decode_jp2k(bytes(mutated))
        except Jp2kError:
            pass


def test_round9_features_compose():
    # the r9 additions interact: POC volumes over precincted multi-layer
    # streams, ROI under tiles + packed headers, PCRL over per-res grids
    # with SOP/EPH, mixed depths with POC — every pair that is legal
    rng = np.random.default_rng(61)
    img = rng.integers(0, 256, (48, 64)).astype(np.uint8)
    rgb = rng.integers(0, 256, (40, 56, 3)).astype(np.uint8)
    # POC + precincts + layers (res-split volumes over a real grid)
    dec, _ = decode_jp2k(encode_jp2k(
        img, levels=2, layers=2, precincts=(4, 4),
        poc=[(0, 0, 2, 1, 1, 1), (0, 0, 2, 3, 1, 0)]))
    assert np.array_equal(dec[..., 0], img)
    # ROI + tiles + PPT packed headers + layers
    dec2, _ = decode_jp2k(encode_jp2k(
        img, levels=1, layers=2, tile_size=(24, 32),
        packed_headers="ppt", roi=[0]))
    assert np.array_equal(dec2[..., 0], img)
    # PCRL + real grid + SOP/EPH + multi-component
    dec3, _ = decode_jp2k(encode_jp2k(
        rgb, levels=1, progression=3, precincts=(4, 4),
        sop=True, eph=True))
    assert np.array_equal(dec3, rgb)
    # mixed depths + POC component-split volumes (no MCT)
    md = np.stack([rng.integers(0, 1024, (32, 40)),
                   rng.integers(0, 256, (32, 40))], -1).astype(np.uint16)
    dec4, info4 = decode_jp2k(encode_jp2k(
        md, levels=1, layers=2, mct=False,
        comp_depths={0: 10, 1: 8},
        poc=[(0, 0, 2, 2, 1, 0), (0, 0, 2, 2, 2, 4)]))
    assert info4["depths"] == [10, 8]
    assert np.array_equal(dec4, md)
    # ROI + irreversible + subsampling
    ycc = rng.integers(0, 256, (32, 40, 3)).astype(np.uint8)
    dec5, _ = decode_jp2k(encode_jp2k(
        ycc, levels=1, mct=False, reversible=False, qstep=0.25,
        comp_subsampling={1: (2, 2), 2: (2, 2)}, roi=[0]))
    assert dec5.shape == ycc.shape


def test_round9_mutation_fuzz_contained():
    # mutation fuzz over a stream exercising ALL the new r9 paths
    # (POC volumes, RGN, precincts, PCRL) — only Jp2kError escapes
    import random

    rng = random.Random(101)
    img = (np.random.default_rng(7).integers(0, 256, (40, 48))
           .astype(np.uint8))
    base = bytearray(encode_jp2k(
        img, levels=1, layers=2, precincts=(4, 4), progression=3,
        roi=[0], eph=True))
    decode_jp2k(bytes(base))  # sanity: the unmutated stream decodes
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
            mutated[at:at] = bytes(
                rng.randrange(256) for _ in range(rng.randrange(1, 12)))
        try:
            decode_jp2k(bytes(mutated))
        except Jp2kError:
            pass


def test_full_roundtrip_hypothesis():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(1, 40),
        w=st.integers(1, 40),
        nc=st.sampled_from([1, 3]),
        levels=st.integers(0, 3),
        seed=st.integers(0, 2**31 - 1),
    )
    def run(h, w, nc, levels, seed):
        rng = np.random.default_rng(seed)
        shape = (h, w) if nc == 1 else (h, w, nc)
        img = rng.integers(0, 256, shape).astype(np.uint8)
        dec, _ = decode_jp2k(encode_jp2k(img, levels=levels))
        ref = img[..., None] if img.ndim == 2 else img
        assert np.array_equal(dec, ref)

    run()


@pytest.mark.parametrize("layers", [2, 3, 5])
@pytest.mark.parametrize("progression", [0, 1, 2, 3, 4])
def test_multilayer_progressions_roundtrip(layers, progression):
    # Coding passes split across quality layers with staggered inclusion
    # layers, packets sequenced per progression order — the decoder
    # accumulates each codeblock's segments and must reproduce the
    # single-layer pixels exactly.
    rng = np.random.default_rng(layers * 10 + progression)
    rgb = rng.integers(0, 256, (29, 31, 3)).astype(np.uint8)
    enc = encode_jp2k(rgb, levels=2, layers=layers, progression=progression)
    dec, _ = decode_jp2k(enc)
    assert np.array_equal(dec, rgb)


def test_multilayer_gray_small_codeblocks():
    rng = np.random.default_rng(41)
    img = rng.integers(0, 256, (37, 53)).astype(np.uint8)
    enc = encode_jp2k(img, levels=2, cb_exp=4, layers=4)
    dec, _ = decode_jp2k(enc)
    assert np.array_equal(dec[..., 0], img)


def test_multilayer_smooth_empty_packets():
    yy, xx = np.mgrid[0:40, 0:60]
    img = ((xx + yy) // 4).astype(np.uint8)
    enc = encode_jp2k(img, levels=3, layers=3)
    dec, _ = decode_jp2k(enc)
    assert np.array_equal(dec[..., 0], img)


@pytest.mark.parametrize("style", [0x01, 0x02, 0x04, 0x05, 0x08, 0x20,
                                   0x2A, 0x2F])
def test_codeblock_style_flags_roundtrip(style):
    # 0x01 = selective arithmetic bypass (raw passes + terminated
    # segments), 0x02 = per-pass context reset, 0x04 = per-pass
    # termination, 0x08 = vertically-causal contexts, 0x20 =
    # segmentation symbols, 0x2A / 0x2F = combinations.
    rng = np.random.default_rng(style)
    img = rng.integers(0, 256, (37, 53)).astype(np.uint8)
    rgb = rng.integers(0, 256, (29, 31, 3)).astype(np.uint8)
    for src in (img, rgb):
        enc = encode_jp2k(src, levels=2, cb_style=style)
        dec, _ = decode_jp2k(enc)
        ref = src[..., None] if src.ndim == 2 else src
        assert np.array_equal(dec, ref)


def test_segmentation_symbol_detects_corruption():
    # Flipping bits in an entropy segment of a segsym stream must either
    # surface as a Jp2kError (often "segmentation symbol mismatch") or
    # decode — never escape with another exception type.
    import random

    rng = random.Random(7)
    img = np.random.default_rng(20).integers(0, 256, (24, 24)).astype(np.uint8)
    enc = bytearray(encode_jp2k(img, levels=1, cb_style=0x20))
    sod = bytes(enc).index(b"\xff\x93") + 2
    mismatches = 0
    for _ in range(60):
        mutated = bytearray(enc)
        mutated[rng.randrange(sod, len(mutated) - 2)] ^= 1 << rng.randrange(8)
        try:
            decode_jp2k(bytes(mutated))
        except Jp2kError as exc:
            if "segmentation symbol" in str(exc):
                mismatches += 1
    assert mismatches > 0  # the marker really fires on corruption


def test_predictable_termination_accepted_undefined_bits_rejected():
    # 0x10 (predictable termination) only constrains HOW the encoder
    # terminates — the arithmetic replay is unchanged, so decode
    # accepts it (all six defined flags now decode); undefined bits
    # still reject
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (20, 24)).astype(np.uint8)
    for style in (0x10, 0x15, 0x3F):
        enc = encode_jp2k(img, levels=1, cb_style=style)
        dec, _ = decode_jp2k(enc)
        assert np.array_equal(dec[..., 0], img)
    with pytest.raises(Jp2kError, match="codeblock style"):
        encode_jp2k(np.zeros((8, 8), np.uint8), cb_style=0x40)
    enc = bytearray(encode_jp2k(np.zeros((8, 8), np.uint8)))
    cod_at = enc.index(b"\xff\x52")
    enc[cod_at + 12] = 0x40  # SPcod codeblock-style byte
    with pytest.raises(Jp2kError, match="codeblock style"):
        decode_jp2k(bytes(enc))


@pytest.mark.parametrize("style", [0x01, 0x05])
def test_bypass_multilayer_segment_lengths(style):
    # bypass splits a codeblock's codewords into terminated segments;
    # multi-layer streams must signal one length per segment part and
    # reassemble across packets (T.800 B.10.7.2)
    rng = np.random.default_rng(11)
    src = rng.integers(0, 256, (48, 48, 3)).astype(np.uint8)
    for layers in (2, 5):
        enc = encode_jp2k(src, levels=2, cb_style=style, layers=layers)
        dec, _ = decode_jp2k(enc)
        assert np.array_equal(dec, src)


def test_bypass_raw_passes_actually_raw():
    # deep bitplanes force passes >= 11: the bypass stream must differ
    # from the MQ-only stream AND produce more codeword segments
    from oxidizepdf_spark.kernel.jp2k import encode_codeblock

    rng = np.random.default_rng(3)
    coefs = rng.integers(-4000, 4000, (32, 32)).astype(np.int64)
    plain, n0, mp0 = encode_codeblock(coefs, "HH", 0)
    segs, n1, mp1 = encode_codeblock(coefs, "HH", 0x01)
    assert (n0, mp0) == (n1, mp1)
    assert isinstance(segs, list) and len(segs) > 1
    assert b"".join(segs) != plain


# ---------------------------------------------------------------------------
# Irreversible path (9/7 + scalar quantization + ICT) — round 8
# ---------------------------------------------------------------------------


def test_dwt97_roundtrip_exact():
    rng = np.random.default_rng(1)
    from oxidizepdf_spark.kernel.jp2k import dwt97_forward_2d, dwt97_inverse_2d

    for shape in ((16, 16), (17, 23), (1, 9), (8, 1), (5, 5)):
        a = rng.normal(0, 100, shape)
        back = dwt97_inverse_2d(*dwt97_forward_2d(a))
        assert back.shape == a.shape
        assert np.abs(back - a).max() < 1e-9


def test_dwt97_dc_gain_is_one():
    # constant image -> LL stays the constant (analysis lowpass DC gain
    # 1 pins the low x 1/K scaling convention), details ~0
    from oxidizepdf_spark.kernel.jp2k import dwt97_forward_2d

    ll, hl, lh, hh = dwt97_forward_2d(np.full((16, 16), 55.0))
    assert np.abs(ll - 55.0).max() < 1e-9
    assert max(np.abs(hl).max(), np.abs(lh).max(), np.abs(hh).max()) < 1e-9


def test_ict_roundtrip():
    from oxidizepdf_spark.kernel.jp2k import ict_forward, ict_inverse

    rng = np.random.default_rng(3)
    rgb = rng.uniform(-128, 127, (7, 9, 3))
    # the published inverse constants (1.402, 0.344136, ...) are rounded
    # renderings of the exact matrix inverse — identity holds to ~1e-4
    assert np.abs(ict_inverse(ict_forward(rgb)) - rgb).max() < 1e-3


@pytest.mark.parametrize("qstep,tol", [(0.125, 1), (0.5, 2), (2.0, 6)])
def test_lossy_gray_error_bound(qstep, tol):
    yy, xx = np.mgrid[0:40, 0:56]
    img = ((np.sin(xx / 9) + np.cos(yy / 7)) * 60 + 128).astype(np.uint8)
    enc = encode_jp2k(img, levels=2, reversible=False, qstep=qstep)
    dec, info = decode_jp2k(enc)
    assert info["reversible"] is False
    err = np.abs(dec[..., 0].astype(int) - img.astype(int)).max()
    assert err <= tol, err


def test_lossy_rgb_ict_and_fine_step_noise():
    rng = np.random.default_rng(2)
    yy, xx = np.mgrid[0:40, 0:56]
    g = ((np.sin(xx / 9) + np.cos(yy / 7)) * 60 + 128).astype(np.uint8)
    rgb = np.stack([g, np.roll(g, 5, 1), 255 - g], -1)
    dec, _ = decode_jp2k(encode_jp2k(rgb, levels=2, reversible=False,
                                     qstep=0.25))
    assert np.abs(dec.astype(int) - rgb.astype(int)).max() <= 4
    noise = rng.integers(0, 256, (33, 29)).astype(np.uint8)
    dec2, _ = decode_jp2k(encode_jp2k(noise, levels=1, reversible=False,
                                      qstep=0.0625))
    # step 1/16 quantizes finer than the final integer rounding
    assert np.array_equal(dec2[..., 0], noise)


def test_lossy_layers_progressions_and_styles():
    yy, xx = np.mgrid[0:32, 0:32]
    img = ((xx * 3 + yy * 5) % 256).astype(np.uint8)
    for layers, prog, style in ((3, 0, 0), (2, 2, 0x01), (1, 4, 0x25)):
        enc = encode_jp2k(img, levels=2, reversible=False, qstep=0.25,
                          layers=layers, progression=prog, cb_style=style)
        dec, _ = decode_jp2k(enc)
        assert np.abs(dec[..., 0].astype(int) - img.astype(int)).max() <= 2


def test_lossy_quantization_styles_wire():
    # expounded (style 2) is what the encoder writes; a hand-patched
    # derived (style 1) stream with the same step decodes equivalently
    # for a 0-level image (single band, eps_b == eps_0)
    import struct

    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    enc = bytearray(encode_jp2k(img, levels=0, reversible=False,
                                qstep=0.25))
    qcd_at = bytes(enc).index(b"\xff\x5c")
    assert enc[qcd_at + 4] & 0x1F == 2
    dec_exp, _ = decode_jp2k(bytes(enc))
    # rewrite as derived: style 1, single (eps, mu) — same first value
    lqcd = (enc[qcd_at + 2] << 8) | enc[qcd_at + 3]
    first_val = bytes(enc[qcd_at + 5:qcd_at + 7])
    patched = (bytes(enc[:qcd_at + 2]) + struct.pack(">H", 5)
               + bytes([(enc[qcd_at + 4] & 0xE0) | 1]) + first_val
               + bytes(enc[qcd_at + 2 + lqcd:]))
    dec_der, _ = decode_jp2k(patched)
    assert np.array_equal(dec_exp, dec_der)


def test_mixed_transform_quantization_rejected():
    img = np.zeros((8, 8), np.uint8)
    enc = bytearray(encode_jp2k(img, levels=1))  # reversible, style 0
    cod_at = bytes(enc).index(b"\xff\x52")
    enc[cod_at + 13] = 0  # claim 9/7 on an unquantized stream
    with pytest.raises(Jp2kError, match="scalar quantization"):
        decode_jp2k(bytes(enc))


@pytest.mark.parametrize("sop,eph", [(True, False), (False, True),
                                     (True, True)])
def test_sop_eph_markers(sop, eph):
    # A.8: SOP marker segments may precede packets (Scod bit 1), EPH
    # follows every packet header (bit 2) — real encoders emit both
    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, (33, 41)).astype(np.uint8)
    enc = encode_jp2k(img, levels=2, layers=3, sop=sop, eph=eph)
    if sop:
        assert b"\xff\x91" in enc
    if eph:
        assert b"\xff\x92" in enc
    dec, _ = decode_jp2k(enc)
    assert np.array_equal(dec[..., 0], img)
    # lossy + bypass combinations keep the marker framing
    enc2 = encode_jp2k(img, levels=1, reversible=False, qstep=0.25,
                       cb_style=0x01, sop=sop, eph=eph)
    dec2, _ = decode_jp2k(enc2)
    assert np.abs(dec2[..., 0].astype(int) - img.astype(int)).max() <= 2


def test_eph_missing_detected():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    enc = bytearray(encode_jp2k(img, levels=1, eph=True))
    at = bytes(enc).index(b"\xff\x92")
    enc[at] = 0x00  # corrupt the first EPH
    with pytest.raises(Jp2kError, match="EPH"):
        decode_jp2k(bytes(enc))


def test_qcc_per_component_quantization():
    # QCC overrides quantize chroma-ish components coarser; error per
    # component is bounded by ITS step
    yy, xx = np.mgrid[0:32, 0:40]
    g = ((np.sin(xx / 8) + np.cos(yy / 6)) * 60 + 128).astype(np.uint8)
    rgb = np.stack([g, np.roll(g, 3, 1), 255 - g], -1)
    enc = encode_jp2k(rgb, levels=2, mct=False, reversible=False,
                      qstep=0.125, qcc_steps={1: 1.0, 2: 2.0})
    assert b"\xff\x5d" in enc  # QCC marker present
    dec, _ = decode_jp2k(enc)
    errs = [np.abs(dec[..., c].astype(int) - rgb[..., c].astype(int)).max()
            for c in range(3)]
    assert errs[0] <= 1          # fine step: near exact
    assert errs[1] <= 3 and errs[2] <= 5
    # without MCT the per-component bound ordering shows the override
    assert errs[0] <= errs[2]


def test_coc_per_component_styles_lossless():
    rng = np.random.default_rng(9)
    rgb = rng.integers(0, 256, (24, 28, 3)).astype(np.uint8)
    enc = encode_jp2k(rgb, levels=2, coc_styles={1: 0x01, 2: 0x04})
    assert b"\xff\x53" in enc  # COC marker present
    dec, _ = decode_jp2k(enc)
    assert np.array_equal(dec, rgb)


def test_coc_qcc_combined_with_markers():
    yy, xx = np.mgrid[0:32, 0:40]
    g = ((np.sin(xx / 8) + np.cos(yy / 6)) * 60 + 128).astype(np.uint8)
    rgb = np.stack([g, np.roll(g, 3, 1), 255 - g], -1)
    enc = encode_jp2k(rgb, levels=1, reversible=False, qstep=0.25,
                      qcc_steps={2: 0.5}, coc_styles={0: 0x05},
                      sop=True, eph=True)
    dec, _ = decode_jp2k(enc)
    assert np.abs(dec.astype(int) - rgb.astype(int)).max() <= 2


def test_coc_divergent_levels_now_decode():
    # r10: a COC may carry its OWN decomposition levels (A.6.2) — the
    # r9 reject is gone. Mutating the COC levels byte changes the
    # packet walk for that component (B.12.1.1: fewer resolutions);
    # with an all-zeros image every packet is empty, so the shorter
    # walk still reconstructs exactly and the header is honored.
    img = np.zeros((16, 16, 3), np.uint8)
    enc = bytearray(encode_jp2k(img, levels=2, coc_styles={1: 0}))
    coc_at = bytes(enc).index(b"\xff\x53")
    enc[coc_at + 6] = 1  # COC decomposition levels != COD's 2
    dec, info = decode_jp2k(bytes(enc))
    assert info["comp_levels"] == [2, 1, 2]
    assert np.array_equal(dec, img)


# ---------------------------------------------------------------------------
# Multiple tiles (round 8): SIZ tile grid, one tile-part per tile
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("ts", [(16, 16), (32, 24), (17, 19)])
def test_multi_tile_lossless_roundtrip(ts):
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (50, 70)).astype(np.uint8)
    enc = encode_jp2k(img, levels=2, tile_size=ts)
    dec, info = decode_jp2k(enc)
    assert np.array_equal(dec[..., 0], img)
    assert info["tiles"] == (-(-50 // ts[0]), -(-70 // ts[1]))


def test_multi_tile_rgb_layers_markers_and_lossy():
    rng = np.random.default_rng(12)
    rgb = rng.integers(0, 256, (45, 61, 3)).astype(np.uint8)
    enc = encode_jp2k(rgb, levels=2, tile_size=(20, 20), layers=3,
                      sop=True, eph=True)
    dec, info = decode_jp2k(enc)
    assert np.array_equal(dec, rgb) and info["tiles"] == (3, 4)
    yy, xx = np.mgrid[0:45, 0:61]
    g = ((np.sin(xx / 8) + np.cos(yy / 6)) * 60 + 128).astype(np.uint8)
    rgb2 = np.stack([g, np.roll(g, 3, 1), 255 - g], -1)
    enc2 = encode_jp2k(rgb2, levels=1, tile_size=(16, 24),
                       reversible=False, qstep=0.25, qcc_steps={2: 0.5})
    dec2, _ = decode_jp2k(enc2)
    assert np.abs(dec2.astype(int) - rgb2.astype(int)).max() <= 3


def test_missing_tile_detected():
    img = np.arange(2500, dtype=np.uint8).reshape(50, 50) % 256
    enc = encode_jp2k(img.astype(np.uint8), levels=1, tile_size=(25, 50))
    # chop the second tile-part: truncate at its SOT, keep EOC
    second_sot = enc.index(b"\xff\x90", enc.index(b"\xff\x90") + 2)
    with pytest.raises(Jp2kError, match="missing tiles"):
        decode_jp2k(enc[:second_sot] + b"\xff\xd9")


def test_duplicate_tile_index_detected():
    img = np.zeros((20, 40), np.uint8)
    enc = bytearray(encode_jp2k(img, levels=1, tile_size=(20, 20)))
    # patch the second SOT's Isot to 0: with tile-part support this
    # reads as a repeated FIRST part of tile 0 — out of sequence
    at = bytes(enc).index(b"\xff\x90", bytes(enc).index(b"\xff\x90") + 2)
    enc[at + 4:at + 6] = b"\x00\x00"
    with pytest.raises(Jp2kError, match="out of sequence|tile index"):
        decode_jp2k(bytes(enc))


def test_tile_header_plt_com_skipped_and_poc_rejected():
    import struct

    img = np.arange(400, dtype=np.uint8).reshape(20, 20)
    enc = bytearray(encode_jp2k(img, levels=1))
    sot_at = bytes(enc).index(b"\xff\x90")
    sod_at = bytes(enc).index(b"\xff\x93")
    # splice PLT + COM between the SOT header and SOD; grow Psot
    plt = b"\xff\x58" + struct.pack(">H", 5) + b"\x00\x00\x07"
    com = b"\xff\x64" + struct.pack(">H", 6) + b"\x00\x01ok"
    psot = struct.unpack(">I", enc[sot_at + 6:sot_at + 10])[0]
    enc[sot_at + 6:sot_at + 10] = struct.pack(
        ">I", psot + len(plt) + len(com))
    patched = bytes(enc[:sod_at]) + plt + com + bytes(enc[sod_at:])
    dec, _ = decode_jp2k(patched)
    assert np.array_equal(dec[..., 0], img)
    # a main-header RGN with shift 0 decodes as a no-op (r9: RGN is
    # honored, no longer rejected)
    soc_end = 2
    rgn = b"\xff\x5e" + struct.pack(">H", 5) + b"\x00" * 3
    dec_rgn, _ = decode_jp2k(patched[:soc_end] + rgn + patched[soc_end:])
    assert np.array_equal(dec_rgn[..., 0], img)
    # an unknown tile-part marker is a targeted error too
    unk = bytes(enc[:sod_at]) + b"\xff\x71" + struct.pack(">H", 4) + \
        b"\x00\x00" + bytes(enc[sod_at:])
    with pytest.raises(Jp2kError, match="tile-part header"):
        decode_jp2k(unk)


# ---------------------------------------------------------------------------
# User-defined precincts (round 8)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("prog", [0, 1, 2])
@pytest.mark.parametrize("pp", [(5, 5), (4, 6)])
def test_precincts_roundtrip(prog, pp):
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (70, 90)).astype(np.uint8)
    enc = encode_jp2k(img, levels=2, progression=prog, precincts=pp)
    dec, _ = decode_jp2k(enc)
    assert np.array_equal(dec[..., 0], img)


def test_precincts_per_resolution_and_cb_clipping():
    rng = np.random.default_rng(14)
    img = rng.integers(0, 256, (70, 90)).astype(np.uint8)
    enc = encode_jp2k(img, levels=2,
                      precincts=[(6, 6), (5, 5), (4, 4)])
    dec, _ = decode_jp2k(enc)
    assert np.array_equal(dec[..., 0], img)
    # 64x64 signalled codeblocks clip to 8x8 precinct cells at res 1
    enc2 = encode_jp2k(img, levels=1, precincts=(4, 4), cb_exp=6)
    dec2, _ = decode_jp2k(enc2)
    assert np.array_equal(dec2[..., 0], img)


def test_precincts_compose_with_everything():
    rng = np.random.default_rng(15)
    rgb = rng.integers(0, 256, (50, 66, 3)).astype(np.uint8)
    enc = encode_jp2k(rgb, levels=2, precincts=(5, 5), layers=3,
                      tile_size=(40, 40), sop=True, eph=True)
    dec, info = decode_jp2k(enc)
    assert np.array_equal(dec, rgb) and info["tiles"] == (2, 2)
    yy, xx = np.mgrid[0:50, 0:66]
    g = ((np.sin(xx / 8) + np.cos(yy / 6)) * 60 + 128).astype(np.uint8)
    rgb2 = np.stack([g, np.roll(g, 3, 1), 255 - g], -1)
    enc2 = encode_jp2k(rgb2, levels=2, precincts=(4, 4),
                       reversible=False, qstep=0.25, qcc_steps={2: 0.5},
                       coc_styles={1: 0x01}, cb_style=0x04)
    dec2, _ = decode_jp2k(enc2)
    assert np.abs(dec2.astype(int) - rgb2.astype(int)).max() <= 2


def test_precincts_position_first_roundtrip():
    # r9: PCRL/CPRL over a REAL multi-precinct grid — precincts of
    # DIFFERENT resolutions interleave by their top-left reference-grid
    # position (B.12.1.4/5)
    rng = np.random.default_rng(59)
    img = rng.integers(0, 256, (80, 80)).astype(np.uint8)
    rgb = rng.integers(0, 256, (70, 90, 3)).astype(np.uint8)
    for prog in (3, 4):
        dec, _ = decode_jp2k(encode_jp2k(img, levels=1, progression=prog,
                                         precincts=(5, 5)))
        assert np.array_equal(dec[..., 0], img)
        # multi-component + layers + per-res grids + EPH
        dec2, _ = decode_jp2k(encode_jp2k(
            rgb, levels=2, progression=prog, layers=2,
            precincts=[(5, 5), (4, 5), (5, 4)], eph=True))
        assert np.array_equal(dec2, rgb)
    # PCRL and CPRL genuinely differ on multi-component streams
    e3 = encode_jp2k(rgb, levels=1, progression=3, precincts=(5, 5))
    e4 = encode_jp2k(rgb, levels=1, progression=4, precincts=(5, 5))
    assert e3 != e4
    # a 1x1 grid still degenerates to the no-precinct order
    tiny = np.zeros((16, 16), np.uint8)
    dec, _ = decode_jp2k(encode_jp2k(tiny, levels=1, progression=3,
                                     precincts=(5, 5)))
    assert np.array_equal(dec[..., 0], tiny)


def test_multiple_tile_parts_per_tile():
    # a tile's packet stream split across two tile-parts (TPsot 0, 1)
    # reassembles byte-wise; out-of-sequence parts reject
    import struct

    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, (50, 70)).astype(np.uint8)
    enc = bytearray(encode_jp2k(img, levels=1))
    sot = bytes(enc).index(b"\xff\x90")
    _, isot, psot, _, _ = struct.unpack(">HHIBB", enc[sot + 2:sot + 12])
    sod = bytes(enc).index(b"\xff\x93")
    body = bytes(enc[sod + 2:sot + psot])
    split = len(body) // 2
    head = bytes(enc[:sot])

    def tp(idx, tot, b):
        return struct.pack(">HHHIBB", 0xFF90, 10, isot, 14 + len(b),
                           idx, tot) + b"\xff\x93" + b

    stream = head + tp(0, 2, body[:split]) + tp(1, 2, body[split:]) + \
        b"\xff\xd9"
    dec, _ = decode_jp2k(stream)
    assert np.array_equal(dec[..., 0], img)
    bad = head + tp(1, 2, body[:split]) + tp(0, 2, body[split:]) + \
        b"\xff\xd9"
    with pytest.raises(Jp2kError, match="out of sequence"):
        decode_jp2k(bad)


# ---------------------------------------------------------------------------
# Component subsampling (round 8): the scanner-YCC 4:2:0 shape
# ---------------------------------------------------------------------------


def test_subsampling_420_exact_vs_independent_reconstruction():
    # chroma decimated 2x2 after RCT; the decode (replicate, inverse
    # RCT) must equal an INDEPENDENT numpy reconstruction of the same
    # pipeline — pins the B.3 component grids, not just self-roundtrip
    from oxidizepdf_spark.kernel.jp2k import rct_forward, rct_inverse

    yy, xx = np.mgrid[0:48, 0:64]
    g = ((np.sin(xx / 8) + np.cos(yy / 6)) * 60 + 128).astype(np.uint8)
    rgb = np.stack([g, np.roll(g, 3, 1), 255 - g], -1)
    dec, _ = decode_jp2k(encode_jp2k(
        rgb, levels=2, comp_subsampling={1: (2, 2), 2: (2, 2)}))
    ycc = rct_forward(rgb.astype(np.int64) - 128)
    u, v = ycc[..., 1][::2, ::2], ycc[..., 2][::2, ::2]
    ridx = np.minimum(np.arange(48) // 2, u.shape[0] - 1)
    cidx = np.minimum(np.arange(64) // 2, u.shape[1] - 1)
    ycc2 = np.stack([ycc[..., 0], u[ridx][:, cidx], v[ridx][:, cidx]], -1)
    exp = np.clip(rct_inverse(ycc2) + 128, 0, 255)
    assert np.array_equal(dec.astype(int), exp)


def test_subsampling_sampled_positions_exact_and_combos():
    rng = np.random.default_rng(19)
    img = rng.integers(0, 256, (33, 41)).astype(np.uint8)
    dec, _ = decode_jp2k(encode_jp2k(img, levels=1,
                                     comp_subsampling={0: (2, 1)}))
    assert np.array_equal(dec[:, ::2, 0], img[:, ::2])
    yy, xx = np.mgrid[0:48, 0:64]
    g = ((np.sin(xx / 8) + np.cos(yy / 6)) * 60 + 128).astype(np.uint8)
    rgb = np.stack([g, np.roll(g, 3, 1), 255 - g], -1)
    dec2, _ = decode_jp2k(encode_jp2k(
        rgb, levels=1, reversible=False, qstep=0.25, tile_size=(24, 32),
        comp_subsampling={1: (2, 2), 2: (2, 2)}))
    assert dec2.shape == rgb.shape
    # luma error stays bounded by the quantizer; chroma adds replication
    assert np.abs(dec2[..., 0].astype(int)
                  - rgb[..., 0].astype(int)).max() <= 90  # ICT mixes comps


def test_subsampling_precincts_compose():
    # r10: precinct grids live on each component's resolution grids
    # (B.6), projected to the reference grid through Rsiz for the
    # position walks — the former reject is gone. Subsampled decode
    # replicates, so pin against the SAME independent reconstruction
    # as the no-precinct 4:2:0 test (identical pixels, different
    # packetization).
    rng = np.random.default_rng(61)
    rgb = rng.integers(0, 256, (41, 53, 3)).astype(np.uint8)
    base, _ = decode_jp2k(encode_jp2k(
        rgb, levels=2, comp_subsampling={1: (2, 2), 2: (2, 2)}))
    for prog in (0, 2, 3, 4):
        enc = encode_jp2k(rgb, levels=2, progression=prog,
                          precincts=(4, 4), layers=2, eph=True,
                          comp_subsampling={1: (2, 2), 2: (2, 2)})
        dec, _ = decode_jp2k(enc)
        assert np.array_equal(dec, base), prog
    # the position walks interleave the DIFFERENT reference-grid
    # moduli (chroma precincts are 2x wider on the reference grid):
    # PCRL and CPRL genuinely disagree on the packet order
    e3 = encode_jp2k(rgb, levels=1, progression=3, precincts=(4, 4),
                     comp_subsampling={1: (2, 2), 2: (2, 2)})
    e4 = encode_jp2k(rgb, levels=1, progression=4, precincts=(4, 4),
                     comp_subsampling={1: (2, 2), 2: (2, 2)})
    assert e3 != e4
    d3, _ = decode_jp2k(e3)
    d4, _ = decode_jp2k(e4)
    assert np.array_equal(d3, d4)
    # asymmetric sampling + per-component grids + multiple tiles
    enc5 = encode_jp2k(rgb, levels=1, progression=2, precincts=(5, 5),
                       coc_precincts={1: [(4, 4), (4, 4)]},
                       comp_subsampling={1: (2, 1)},
                       tile_size=(32, 32))
    ref5, _ = decode_jp2k(encode_jp2k(rgb, levels=1,
                                      comp_subsampling={1: (2, 1)},
                                      tile_size=(32, 32)))
    dec5, _ = decode_jp2k(enc5)
    assert np.array_equal(dec5, ref5)


# ---------------------------------------------------------------------------
# Packed packet headers (PPT / PPM, round 8)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("mode", ["ppt", "ppm"])
def test_packed_packet_headers_roundtrip(mode):
    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, (40, 56)).astype(np.uint8)
    rgb = rng.integers(0, 256, (30, 44, 3)).astype(np.uint8)
    marker = b"\xff\x61" if mode == "ppt" else b"\xff\x60"
    enc = encode_jp2k(img, levels=2, packed_headers=mode)
    assert marker in enc
    dec, _ = decode_jp2k(enc)
    assert np.array_equal(dec[..., 0], img)
    # layers + tiles + EPH (EPH lives INSIDE the packed stream)
    dec2, _ = decode_jp2k(encode_jp2k(rgb, levels=1, layers=3,
                                      tile_size=(20, 22),
                                      packed_headers=mode, eph=True))
    assert np.array_equal(dec2, rgb)
    # SOP markers stay in the BODY stream; bypass adds multi-segment
    # length signalling through the packed headers
    dec3, _ = decode_jp2k(encode_jp2k(img, levels=1, packed_headers=mode,
                                      sop=True, cb_style=0x01))
    assert np.array_equal(dec3[..., 0], img)


def test_ppm_chunk_exhaustion_is_loud():
    # more tile-parts than (Nppm, chunk) pairs: the tile-part must NOT
    # silently fall back to in-body header parsing (garbage) — it raises
    import struct as _s

    rng = np.random.default_rng(31)
    img = rng.integers(0, 256, (40, 40)).astype(np.uint8)
    enc = encode_jp2k(img, levels=1, tile_size=(20, 40),
                      packed_headers="ppm")
    at = enc.index(b"\xff\x60")
    (lppm,) = _s.unpack(">H", enc[at + 2:at + 4])
    blob = enc[at + 5:at + 2 + lppm]  # after Zppm byte
    (n0,) = _s.unpack(">I", blob[:4])
    first = blob[:4 + n0]  # keep only tile 0's chunk
    new_seg = b"\xff\x60" + _s.pack(">H", len(first) + 3) + b"\x00" + first
    mutated = enc[:at] + new_seg + enc[at + 2 + lppm:]
    with pytest.raises(Jp2kError, match="PPM chunk list exhausted"):
        decode_jp2k(mutated)


def test_canvas_bytes_bomb_guard():
    # 3 comps x 16384 x 16384 passes the raw pixel cap (== 2^28) but
    # would allocate ~6 GiB of float64 canvases — refused before any
    # codestream data is touched
    import struct as _s

    img = np.zeros((16, 16, 3), np.uint8)
    enc = bytearray(encode_jp2k(img, levels=1))
    siz_at = bytes(enc).index(b"\xff\x51")
    enc[siz_at + 6:siz_at + 10] = _s.pack(">I", 16384)   # Xsiz
    enc[siz_at + 10:siz_at + 14] = _s.pack(">I", 16384)  # Ysiz
    with pytest.raises(Jp2kError, match="dimensions out of supported"):
        decode_jp2k(bytes(enc))


def test_signed_components_decode_offset_binary():
    # Ssiz bit 7: a signed plane's offset-binary display mapping is
    # bit-identical to the unsigned G.1 level shift, so the stream
    # decodes without a branch
    import struct as _s

    img = np.arange(400, dtype=np.uint8).reshape(20, 20)
    enc = bytearray(encode_jp2k(img, levels=1))
    siz_at = bytes(enc).index(b"\xff\x51")
    enc[siz_at + 4 + 36] |= 0x80
    dec, _ = decode_jp2k(bytes(enc))
    assert np.array_equal(dec[..., 0], img)


def test_poc_whole_stream_override():
    # POC in its common degenerate shape — one volume covering the whole
    # stream — overrides the COD progression. Prove it's HONORED by
    # mislabeling the COD (RLCP) on an LRCP-sequenced stream and letting
    # the POC restore the truth; partial volumes stay rejected.
    import struct

    rng = np.random.default_rng(29)
    img = rng.integers(0, 256, (30, 40)).astype(np.uint8)
    enc = bytearray(encode_jp2k(img, levels=2, layers=3, progression=0))
    cod_at = bytes(enc).index(b"\xff\x52")
    enc[cod_at + 5] = 1  # COD now claims RLCP
    poc = (b"\xff\x5f" + struct.pack(">H", 9) + bytes([0, 0])
           + struct.pack(">H", 3) + bytes([3, 1, 0]))
    dec, _ = decode_jp2k(bytes(enc[:cod_at]) + poc + bytes(enc[cod_at:]))
    assert np.array_equal(dec[..., 0], img)
    bad = (b"\xff\x5f" + struct.pack(">H", 9) + bytes([1, 0])
           + struct.pack(">H", 3) + bytes([3, 1, 0]))
    with pytest.raises(Jp2kError, match="cover the full packet set"):
        decode_jp2k(bytes(enc[:cod_at]) + bad + bytes(enc[cod_at:]))


def test_poc_multi_volume_roundtrip():
    # B.12 with real mid-stream order changes: volume 1 walks res 0 in
    # RLCP, volume 2 the remaining resolutions in LRCP (first containing
    # volume wins on overlap — volume 2's bounds re-cover res 0).
    rng = np.random.default_rng(37)
    img = rng.integers(0, 256, (30, 40)).astype(np.uint8)
    enc = encode_jp2k(img, levels=2, layers=3,
                      poc=[(0, 0, 3, 1, 1, 1), (0, 0, 3, 3, 1, 0)])
    assert b"\xff\x5f" in enc
    dec, _ = decode_jp2k(enc)
    assert np.array_equal(dec[..., 0], img)
    # layer-split volumes: layer 0 first (all res), then the rest
    enc2 = encode_jp2k(img, levels=1, layers=4,
                       poc=[(0, 0, 1, 2, 1, 0), (0, 0, 4, 2, 1, 2)])
    dec2, _ = decode_jp2k(enc2)
    assert np.array_equal(dec2[..., 0], img)
    # component-split volumes on an untransformed 3-comp image
    rgb = rng.integers(0, 256, (20, 24, 3)).astype(np.uint8)
    enc3 = encode_jp2k(rgb, levels=1, layers=2, mct=False,
                       poc=[(0, 0, 2, 2, 1, 4), (0, 1, 2, 2, 3, 0)])
    dec3, _ = decode_jp2k(enc3)
    assert np.array_equal(dec3, rgb)


def test_poc_in_tile_headers_overrides():
    # A.6.6: a tile-part POC overrides the COD progression for that
    # tile. Proof by the mislabel trick per tile: encode LRCP 2-tile,
    # claim RLCP in COD, splice a whole-stream LRCP POC volume into
    # EACH tile-part header — decodes iff the per-tile override is used.
    import struct as _s

    rng = np.random.default_rng(67)
    img = rng.integers(0, 256, (40, 40)).astype(np.uint8)
    enc = bytearray(encode_jp2k(img, levels=1, layers=3,
                                tile_size=(20, 40), progression=0))
    cod_at = bytes(enc).index(b"\xff\x52")
    enc[cod_at + 5] = 1  # COD now claims RLCP
    poc = (b"\xff\x5f" + _s.pack(">H", 9) + bytes([0, 0])
           + _s.pack(">H", 3) + bytes([2, 1, 0]))
    out = bytearray()
    pos = 0
    data = bytes(enc)
    while True:
        sot = data.find(b"\xff\x90", pos)
        if sot < 0:
            out += data[pos:]
            break
        lsot = _s.unpack(">H", data[sot + 2:sot + 4])[0]
        psot = _s.unpack(">I", data[sot + 6:sot + 10])[0]
        hdr_end = sot + 2 + lsot  # tile-part header starts here
        out += data[pos:sot]
        patched = bytearray(data[sot:hdr_end])
        patched[6:10] = _s.pack(">I", psot + len(poc))
        out += patched + poc
        pos = hdr_end
    # without the per-tile POC the stream mis-walks (RLCP vs LRCP)
    dec, _ = decode_jp2k(bytes(out))
    assert np.array_equal(dec[..., 0], img)


def test_poc_multi_volume_not_covering_raises():
    img = np.zeros((16, 16), np.uint8)
    with pytest.raises(Jp2kError, match="cover the full packet set"):
        encode_jp2k(img, levels=2, layers=2,
                    poc=[(0, 0, 2, 1, 1, 0), (1, 0, 2, 2, 1, 0),
                         (2, 0, 1, 3, 1, 0)])  # res 2 misses layer 1


def test_rectangular_codeblocks_roundtrip():
    # A.6.1 allows xcb != ycb (xcb+ycb <= 12) — previously a raise
    rng = np.random.default_rng(71)
    img = rng.integers(0, 256, (40, 56)).astype(np.uint8)
    for he, we in ((3, 5), (6, 4), (2, 10)):
        dec, _ = decode_jp2k(encode_jp2k(img, levels=2, cb_exp=(he, we)))
        assert np.array_equal(dec[..., 0], img), (he, we)
    # composed with layers + precincts (codeblocks clip to cells) and
    # with the irreversible path
    dec2, _ = decode_jp2k(encode_jp2k(img, levels=1, cb_exp=(4, 6),
                                      layers=2, precincts=(5, 5)))
    assert np.array_equal(dec2[..., 0], img)
    dec3, _ = decode_jp2k(encode_jp2k(img, levels=1, cb_exp=(3, 6),
                                      reversible=False, qstep=0.5))
    assert int(np.abs(dec3[..., 0].astype(np.int64)
                      - img.astype(np.int64)).max()) <= 2
    # the A.6.1 area limit is enforced both ways
    with pytest.raises(Jp2kError, match="out of range"):
        encode_jp2k(img, cb_exp=(7, 7))
    enc = bytearray(encode_jp2k(img, levels=1))
    cod_at = bytes(enc).index(b"\xff\x52")
    enc[cod_at + 10] = 8  # xcb-2: now 10 with ycb 6 -> 16 > 12
    with pytest.raises(Jp2kError, match="A.6.1"):
        decode_jp2k(bytes(enc))


def test_roi_maxshift_roundtrip():
    # Annex H maxshift: the encoder scales ROI coefficients above the
    # background's magnitude range; the decoder recognizes them purely
    # by magnitude (>= 2^SPrgn) and scales back — exact for reversible.
    rng = np.random.default_rng(47)
    img = rng.integers(0, 256, (32, 40)).astype(np.uint8)
    enc = encode_jp2k(img, levels=2, roi=[0])
    assert b"\xff\x5e" in enc  # RGN emitted
    dec, _ = decode_jp2k(enc)
    assert np.array_equal(dec[..., 0], img)
    # ROI on one component of an untransformed 3-comp image, layered
    rgb = rng.integers(0, 256, (24, 28, 3)).astype(np.uint8)
    dec2, _ = decode_jp2k(encode_jp2k(rgb, levels=1, layers=3,
                                      mct=False, roi=[1]))
    assert np.array_equal(dec2, rgb)
    # irreversible: the shift rides on quantized values, error bound holds
    dec3, _ = decode_jp2k(encode_jp2k(img, levels=1, reversible=False,
                                      qstep=0.5, roi=[0]))
    assert int(np.abs(dec3[..., 0].astype(np.int64)
                      - img.astype(np.int64)).max()) <= 2


def test_roi_in_tile_header():
    # RGN may live in a tile-part header (A.6.3) — move it there
    import struct as _s

    rng = np.random.default_rng(53)
    img = rng.integers(0, 256, (20, 24)).astype(np.uint8)
    enc = bytes(encode_jp2k(img, levels=1, roi=[0]))
    at = enc.index(b"\xff\x5e")
    rgn, enc2 = enc[at:at + 7], enc[:at] + enc[at + 7:]
    sot_at = enc2.index(b"\xff\x90")
    sod_at = enc2.index(b"\xff\x93")
    enc2 = bytearray(enc2)
    psot = _s.unpack(">I", enc2[sot_at + 6:sot_at + 10])[0]
    enc2[sot_at + 6:sot_at + 10] = _s.pack(">I", psot + len(rgn))
    dec, _ = decode_jp2k(bytes(enc2[:sod_at]) + rgn + bytes(enc2[sod_at:]))
    assert np.array_equal(dec[..., 0], img)


def test_roi_unknown_style_raises():
    img = np.zeros((16, 16), np.uint8)
    enc = bytearray(encode_jp2k(img, levels=1, roi=[0]))
    at = bytes(enc).index(b"\xff\x5e")
    enc[at + 5] = 1  # Srgn = 1: not a Part-1 ROI style
    with pytest.raises(Jp2kError, match="unknown ROI style"):
        decode_jp2k(bytes(enc))
    enc[at + 5] = 0
    enc[at + 4] = 3  # Crgn out of range (1-comp image)
    with pytest.raises(Jp2kError, match="component out of range"):
        decode_jp2k(bytes(enc))


def test_mixed_component_depths_roundtrip():
    rng = np.random.default_rng(41)
    img = np.stack([
        rng.integers(0, 4096, (24, 28)),   # 12-bit
        rng.integers(0, 256, (24, 28)),    # 8-bit
        rng.integers(0, 16, (24, 28)),     # 4-bit
    ], axis=-1).astype(np.uint16)
    depths = {0: 12, 1: 8, 2: 4}
    enc = encode_jp2k(img, levels=2, mct=False, comp_depths=depths)
    dec, info = decode_jp2k(enc)
    assert info["depths"] == [12, 8, 4]
    assert dec.dtype == np.uint16
    assert np.array_equal(dec, img)
    # irreversible: per-component R_b scales the step per declared depth
    enc2 = encode_jp2k(img, levels=1, mct=False, reversible=False,
                       qstep=0.5, comp_depths=depths)
    dec2, _ = decode_jp2k(enc2)
    assert int(np.abs(dec2.astype(np.int64)
                      - img.astype(np.int64)).max()) <= 2


def test_mixed_depths_guards():
    rng = np.random.default_rng(43)
    rgb = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    # samples exceeding the declared depth refuse to encode
    with pytest.raises(Jp2kError, match="exceed declared depth"):
        encode_jp2k(rgb, mct=False, comp_depths={0: 4})
    # MCT across unequal depths refuses on encode...
    with pytest.raises(Jp2kError, match="MCT requires equal depths"):
        encode_jp2k(rgb // 16, mct=True, comp_depths={0: 4})
    # ...and on decode (mutated SIZ)
    import struct as _s

    enc = bytearray(encode_jp2k(rgb, levels=1, mct=True))
    siz_at = bytes(enc).index(b"\xff\x51")
    enc[siz_at + 4 + 36 + 3] = 9  # comp 1 now claims 10-bit
    with pytest.raises(Jp2kError, match="MCT requires equal depths"):
        decode_jp2k(bytes(enc))


# ---------------------------------------------------------------------------
# Per-component decomposition levels (A.6.2 COC; r10)
# ---------------------------------------------------------------------------


def test_coc_levels_roundtrip_and_meta():
    # a COC replaces the component's wavelet depth; packet walks skip
    # resolutions the component does not have (B.12.1.1)
    rng = np.random.default_rng(71)
    rgb = rng.integers(0, 256, (40, 52, 3)).astype(np.uint8)
    enc = encode_jp2k(rgb, levels=2, coc_levels={1: 1, 2: 3})
    dec, info = decode_jp2k(enc)
    assert info["comp_levels"] == [2, 1, 3]
    assert np.array_equal(dec, rgb)
    # the stream genuinely carries COC segments (one per override)
    assert enc.count(b"\xff\x53") >= 2
    # levels 0 = no wavelet at all for that component
    dec0, info0 = decode_jp2k(
        encode_jp2k(rgb, levels=2, coc_levels={0: 0}))
    assert info0["comp_levels"] == [0, 2, 2]
    assert np.array_equal(dec0, rgb)


@pytest.mark.parametrize("prog", [0, 1, 2, 3, 4])
def test_coc_levels_all_progressions(prog):
    rng = np.random.default_rng(72 + prog)
    rgb = rng.integers(0, 256, (33, 47, 3)).astype(np.uint8)
    enc = encode_jp2k(rgb, levels=3, progression=prog,
                      coc_levels={0: 1, 2: 2}, layers=2)
    dec, info = decode_jp2k(enc)
    assert info["comp_levels"] == [1, 3, 2]
    assert np.array_equal(dec, rgb)


def test_coc_levels_with_precinct_grids():
    # a custom-levels component must carry its own precinct list (its
    # length is levels+1); the position walks interleave the grids
    rng = np.random.default_rng(77)
    rgb = rng.integers(0, 256, (64, 64, 3)).astype(np.uint8)
    enc = encode_jp2k(rgb, levels=2, precincts=(5, 5),
                      coc_levels={1: 3},
                      coc_precincts={1: [(5, 5)] * 4},
                      progression=2)
    dec, info = decode_jp2k(enc)
    assert info["comp_levels"] == [2, 3, 2]
    assert np.array_equal(dec, rgb)
    # PCRL over differing depths + grids
    enc2 = encode_jp2k(rgb, levels=2, precincts=(4, 4),
                       coc_levels={2: 1},
                       coc_precincts={2: [(4, 4)] * 2},
                       progression=3, eph=True)
    dec2, _ = decode_jp2k(enc2)
    assert np.array_equal(dec2, rgb)
    # without an explicit per-component grid the encoder refuses
    with pytest.raises(Jp2kError, match="its own"):
        encode_jp2k(rgb, levels=2, precincts=(5, 5), coc_levels={1: 3})
    # maximal precincts for the override component are fine
    enc3 = encode_jp2k(rgb, levels=2, precincts=(5, 5),
                       coc_levels={1: 3}, coc_precincts={1: None})
    dec3, _ = decode_jp2k(enc3)
    assert np.array_equal(dec3, rgb)


def test_coc_levels_lossy_emits_qcc():
    yy, xx = np.mgrid[0:48, 0:40]
    g = ((np.sin(xx / 7) + np.cos(yy / 5)) * 60 + 128).astype(np.uint8)
    rgb = np.stack([g, np.roll(g, 5, 0), 255 - g], -1)
    enc = encode_jp2k(rgb, levels=2, reversible=False, qstep=0.25,
                      coc_levels={1: 3})
    dec, info = decode_jp2k(enc)
    assert info["comp_levels"] == [2, 3, 2]
    assert np.abs(dec.astype(int) - rgb.astype(int)).max() <= 2
    # the override component's band exponents travel in a QCC
    assert b"\xff\x5d" in enc
    # reversible too: the QCC carries style-0 exponents
    enc2 = encode_jp2k(rgb, levels=1, coc_levels={0: 2})
    assert b"\xff\x5d" in enc2
    dec2, _ = decode_jp2k(enc2)
    assert np.array_equal(dec2, rgb)


def test_coc_levels_compose_multitile_poc_depths():
    rng = np.random.default_rng(79)
    img = np.stack([
        rng.integers(0, 4096, (30, 44)),
        rng.integers(0, 256, (30, 44)),
    ], axis=-1).astype(np.uint16)
    enc = encode_jp2k(img, levels=2, mct=False,
                      comp_depths={0: 12, 1: 8},
                      coc_levels={1: 1}, tile_size=(20, 24))
    dec, info = decode_jp2k(enc)
    assert info["comp_levels"] == [2, 1]
    assert np.array_equal(dec, img)
    # POC volumes sweep the MAX resolution count; absent resolutions
    # of shallower components simply contribute no packets
    rgb = rng.integers(0, 256, (26, 26, 3)).astype(np.uint8)
    enc2 = encode_jp2k(rgb, levels=2, coc_levels={1: 1}, layers=2,
                       poc=[(0, 0, 2, 2, 3, 1), (0, 0, 2, 3, 3, 0)])
    dec2, _ = decode_jp2k(enc2)
    assert np.array_equal(dec2, rgb)


def test_coc_levels_validation():
    rng = np.random.default_rng(80)
    rgb = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    with pytest.raises(Jp2kError, match="component out of range"):
        encode_jp2k(rgb, coc_levels={5: 1})
    with pytest.raises(Jp2kError, match="levels out of range"):
        encode_jp2k(rgb, coc_levels={0: 40})
    # decoder: a COC levels byte past the spec ceiling is loud
    enc = bytearray(encode_jp2k(rgb, levels=1, coc_levels={1: 2}))
    at = bytes(enc).index(b"\xff\x53")
    enc[at + 6] = 60  # SPcoc levels byte
    with pytest.raises(Jp2kError, match="levels out of range"):
        decode_jp2k(bytes(enc))


def test_round10_mutation_fuzz_contained():
    # mutation fuzz over a stream exercising ALL the new r10 paths
    # (per-component decomposition levels, precincts x subsampling,
    # per-component grids, nonzero offsets) — only Jp2kError escapes
    import random

    rng = random.Random(107)
    img = (np.random.default_rng(9).integers(0, 256, (40, 48, 3))
           .astype(np.uint8))
    base = bytearray(encode_jp2k(
        img, levels=2, layers=2, precincts=(4, 4), progression=2,
        coc_levels={1: 1}, coc_precincts={1: [(4, 4)] * 2},
        comp_subsampling={2: (2, 2)}, image_offset=(1, 3),
        eph=True))
    decode_jp2k(bytes(base))  # sanity: the unmutated stream decodes
    for _ in range(400):
        mutated = bytearray(base)
        op = rng.randrange(3)
        if op == 0:
            mutated = mutated[: rng.randrange(2, len(mutated))]
        elif op == 1:
            for _ in range(rng.randrange(1, 6)):
                mutated[rng.randrange(len(mutated))] = rng.randrange(256)
        else:
            at = rng.randrange(len(mutated))
            mutated[at:at] = bytes(
                rng.randrange(256) for _ in range(rng.randrange(1, 12)))
        try:
            decode_jp2k(bytes(mutated))
        except Jp2kError:
            pass

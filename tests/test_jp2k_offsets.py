"""JPEG 2000 nonzero image/tile offsets (ISO/IEC 15444-1 B.3-B.7) and
per-component precinct grids — the last two legal-stream rejects.

The reference's extract path errors on ALL JPX (extract_images.rs), so
everything here is beyond-reference capability; parity anchor is the
spec text. The vectorized parity-aware DWT is pinned against a
brute-force spec-direct implementation (lifting over a PSE-extended
window, T.800 F.4.8) plus one hand-computed example, so the
encoder/decoder roundtrips below can't share a mirrored origin bug in
the transform itself.
"""

from __future__ import annotations

import numpy as np
import pytest

from oxidizepdf_spark.kernel import jp2k as K
from oxidizepdf_spark.kernel.jp2k import Jp2kError, decode_jp2k, encode_jp2k

# ---------------------------------------------------------------------------
# Brute-force 1D_SD / 1D_SR over arbitrary [i0, i1) — spec-direct
# ---------------------------------------------------------------------------

_M = 8  # extension window, past any lifting reach


def _ext_val(arr, i0, k):
    """PSE value of a sequence anchored at i0 at any absolute pos k."""
    n = len(arr)
    if n == 1:
        return arr[0]
    t = (k - i0) % (2 * (n - 1))
    return arr[t if t < n else 2 * (n - 1) - t]


def brute_sd(x, i0, rev):
    """Forward transform of signal x at [i0, i0+len(x)): scalar lifting
    over an extended window (extension samples participate as regular
    samples, which is exactly the T.800 extension semantics)."""
    n = len(x)
    i1 = i0 + n
    if n == 1:
        if i0 % 2 == 0:
            return [x[0]], []
        return [], [2 * x[0]] if rev else [x[0] * K._K97]
    lo = {k: float(_ext_val(x, i0, k)) for k in range(i0 - _M, i1 + _M)
          if k % 2 == 0}
    hi = {k: float(_ext_val(x, i0, k)) for k in range(i0 - _M, i1 + _M)
          if k % 2 == 1}
    if rev:
        hi = {k: int(v) - ((int(lo[k - 1]) + int(lo[k + 1])) >> 1)
              for k, v in hi.items() if k - 1 in lo and k + 1 in lo}
        lo = {k: int(v) + ((hi[k - 1] + hi[k + 1] + 2) >> 2)
              for k, v in lo.items() if k - 1 in hi and k + 1 in hi}
        return ([lo[2 * m] for m in range(-(-i0 // 2), -(-i1 // 2))],
                [hi[2 * m + 1] for m in range(i0 // 2, i1 // 2)])
    for coef, which in ((K._A97, "hi"), (K._B97, "lo"),
                        (K._G97, "hi"), (K._D97, "lo")):
        if which == "hi":
            hi = {k: v + coef * (lo[k - 1] + lo[k + 1])
                  for k, v in hi.items() if k - 1 in lo and k + 1 in lo}
        else:
            lo = {k: v + coef * (hi[k - 1] + hi[k + 1])
                  for k, v in lo.items() if k - 1 in hi and k + 1 in hi}
    return ([lo[2 * m] / K._K97 for m in range(-(-i0 // 2), -(-i1 // 2))],
            [hi[2 * m + 1] * K._K97 for m in range(i0 // 2, i1 // 2)])


def brute_sr(low, high, i0, rev):
    """Inverse: interleave the coefficients at their absolute
    positions, PSE-extend the interleaved sequence, reverse-lift."""
    n = len(low) + len(high)
    i1 = i0 + n
    if n == 1:
        if i0 % 2 == 0:
            return [low[0]]
        return [high[0] >> 1] if rev else [high[0] / K._K97]
    inter = [0.0] * n
    for m, v in enumerate(low):
        inter[(-(-i0 // 2) + m) * 2 - i0] = v
    for m, v in enumerate(high):
        inter[(i0 // 2 + m) * 2 + 1 - i0] = v
    lo = {k: float(_ext_val(inter, i0, k))
          for k in range(i0 - _M, i1 + _M) if k % 2 == 0}
    hi = {k: float(_ext_val(inter, i0, k))
          for k in range(i0 - _M, i1 + _M) if k % 2 == 1}
    if rev:
        lo = {k: int(v) - ((int(hi[k - 1]) + int(hi[k + 1]) + 2) >> 2)
              for k, v in lo.items() if k - 1 in hi and k + 1 in hi}
        hi = {k: int(v) + ((lo[k - 1] + lo[k + 1]) >> 1)
              for k, v in hi.items() if k - 1 in lo and k + 1 in lo}
    else:
        lo = {k: v * K._K97 for k, v in lo.items()}
        hi = {k: v / K._K97 for k, v in hi.items()}
        for coef, which in ((-K._D97, "lo"), (-K._G97, "hi"),
                            (-K._B97, "lo"), (-K._A97, "hi")):
            if which == "lo":
                lo = {k: v + coef * (hi[k - 1] + hi[k + 1])
                      for k, v in lo.items()
                      if k - 1 in hi and k + 1 in hi}
            else:
                hi = {k: v + coef * (lo[k - 1] + lo[k + 1])
                      for k, v in hi.items()
                      if k - 1 in lo and k + 1 in lo}
    return [(lo if k % 2 == 0 else hi)[k] for k in range(i0, i1)]


@pytest.mark.parametrize("rev", [True, False])
@pytest.mark.parametrize("p", [0, 1])
def test_dwt1d_matches_brute_force(rev, p):
    rng = np.random.default_rng(42 + p)
    for n in list(range(1, 12)) + [17, 24, 33]:
        x = rng.integers(-200, 200, size=n).astype(np.int64)
        lo, hi = K._dwt1d_forward(x, p, rev)
        blo, bhi = brute_sd(list(x), p, rev)
        if rev:
            assert list(lo) == blo and list(hi) == bhi, (n, p)
        else:
            np.testing.assert_allclose(lo, blo, atol=1e-9)
            np.testing.assert_allclose(hi, bhi, atol=1e-9)
        out = K._dwt1d_inverse(np.asarray(lo), np.asarray(hi), p, rev)
        bout = brute_sr(list(lo), list(hi), p, rev)
        if rev:
            assert list(out) == [int(v) for v in bout], (n, p)
            assert list(out) == list(x), (n, p)  # perfect reconstruction
        else:
            np.testing.assert_allclose(out, bout, atol=1e-9)
            np.testing.assert_allclose(out, x, atol=1e-6)


def test_dwt53_odd_origin_hand_example():
    # x at absolute positions 1..4 (i0 = 1, odd): spec extension about
    # i0 gives X(0)=X(2), lifting per F.4.8.1 computed by hand
    x = np.array([7, 3, 5, 9], dtype=np.int64)
    lo, hi = K._dwt1d_forward(x, 1, True)
    assert list(lo) == [4, 9]   # low at abs 2, 4
    assert list(hi) == [4, -1]  # high at abs 1, 3
    assert list(K._dwt1d_inverse(lo, hi, 1, True)) == [7, 3, 5, 9]


@pytest.mark.parametrize("rev", [True, False])
def test_dwt2d_origin_parities(rev):
    rng = np.random.default_rng(7)
    fwd = K.dwt53_forward_2d if rev else K.dwt97_forward_2d
    inv = K.dwt53_inverse_2d if rev else K.dwt97_inverse_2d
    for v0, u0 in [(0, 0), (0, 1), (1, 0), (1, 1), (3, 5)]:
        for h, w in [(1, 1), (1, 7), (6, 1), (5, 8), (9, 9)]:
            a = rng.integers(-100, 100, size=(h, w)).astype(np.int64)
            ll, hl, lh, hh = fwd(a, origin=(v0, u0))
            # band dims follow the B.5 coordinate ranges
            assert ll.shape == (-(-(v0 + h) // 2) - -(-v0 // 2),
                                -(-(u0 + w) // 2) - -(-u0 // 2))
            assert hl.shape[1] == (u0 + w) // 2 - u0 // 2
            out = inv(ll, hl, lh, hh, origin=(v0, u0))
            if rev:
                assert (out == a).all(), (v0, u0, h, w)
            else:
                np.testing.assert_allclose(out, a, atol=1e-6)
            # each axis independently matches the brute force
            blo, bhi = brute_sd(list(a[:, 0]), v0, rev)
            alo, ahi = K._dwt1d_forward(a[:, 0], v0 & 1, rev)
            np.testing.assert_allclose(alo, blo, atol=1e-9)
            np.testing.assert_allclose(ahi, bhi, atol=1e-9)


def test_dwt2d_zero_origin_unchanged():
    # origin (0, 0) must stay bit-identical to the historical path
    rng = np.random.default_rng(3)
    a = rng.integers(-300, 300, size=(13, 10)).astype(np.int64)
    ll, hl, lh, hh = K.dwt53_forward_2d(a)
    l2 = K._dwt53_1d_forward(a.T)
    ll2, lh2 = K._dwt53_1d_forward(l2[0].T)
    assert (ll == ll2).all() and (lh == lh2).all()
    assert (K.dwt53_inverse_2d(ll, hl, lh, hh) == a).all()


# ---------------------------------------------------------------------------
# Codestream roundtrips at nonzero XOsiz/YOsiz/XTOsiz/YTOsiz
# ---------------------------------------------------------------------------


def _rand(h=23, w=27, c=3, seed=5):
    return np.random.default_rng(seed).integers(
        0, 256, size=(h, w, c)).astype(np.uint8)


@pytest.mark.parametrize("off,toff,kw", [
    ((1, 1), (0, 0), {}),
    ((3, 5), (1, 2), {}),
    ((7, 9), (3, 4), {"layers": 3}),
    ((1, 0), (1, 0), {"tile_size": (7, 9)}),
    ((5, 3), (2, 1), {"tile_size": (8, 8)}),
    ((1, 3), (0, 1), {"layers": 2,
                      "poc": [(0, 0, 2, 2, 3, 1), (0, 0, 2, 3, 3, 0)]}),
    ((1, 1), (0, 0), {"roi": [0]}),
    ((3, 3), (1, 1), {"packed_headers": "ppt", "tile_size": (12, 12)}),
    ((3, 3), (1, 1), {"packed_headers": "ppm", "tile_size": (12, 12)}),
    ((1, 2), (0, 0), {"comp_depths": {0: 8, 1: 8, 2: 8}}),
])
def test_offset_roundtrip_lossless(off, toff, kw):
    px = _rand()
    img, info = decode_jp2k(encode_jp2k(
        px, levels=2, image_offset=off, tile_offset=toff, **kw))
    assert img.shape[:2] == px.shape[:2]
    assert (img[..., :3] == px).all()
    assert info["offsets"] == (off[0], off[1], toff[0], toff[1])


@pytest.mark.parametrize("progression", range(5))
@pytest.mark.parametrize("off,toff,ts", [
    ((3, 1), (1, 1), None),
    ((5, 7), (2, 3), (16, 16)),  # unaligned tile origins, multi-tile
])
def test_offset_precincts_all_progressions(progression, off, toff, ts):
    # the B.12.1.3-5 position walks anchor at reference-grid absolute
    # positions: an offset tile's first precinct row/col fires at the
    # tile edge (this is the r9-ADVICE PCRL/CPRL anchoring fix)
    px = _rand(seed=6 + progression)
    img, _ = decode_jp2k(encode_jp2k(
        px, levels=2, cb_exp=3, precincts=(3, 3),
        progression=progression, image_offset=off, tile_offset=toff,
        **({"tile_size": ts} if ts else {})))
    assert (img == px).all()


def test_offset_sop_eph_precinct_pcrl():
    px = _rand(seed=11)
    img, _ = decode_jp2k(encode_jp2k(
        px, levels=2, cb_exp=3, precincts=(3, 3), progression=3,
        sop=True, eph=True, image_offset=(2, 1), tile_offset=(1, 0)))
    assert (img == px).all()


@pytest.mark.parametrize("off,toff,ts", [
    ((1, 1), (0, 0), None),
    ((3, 5), (1, 2), (10, 14)),
])
def test_offset_lossy_error_bound(off, toff, ts):
    px = _rand(seed=13)
    img, info = decode_jp2k(encode_jp2k(
        px, levels=2, reversible=False, qstep=0.125,
        image_offset=off, tile_offset=toff,
        **({"tile_size": ts} if ts else {})))
    assert not info["reversible"]
    assert np.abs(img.astype(int) - px.astype(int)).max() <= 3


def test_offset_subsampling_exact_vs_independent_reconstruction():
    # decimation/replication on the B.3 component grids with a nonzero
    # origin: ceil(Osiz/Rsiz) starts the component region, so an odd
    # offset SHIFTS which image rows are sampled — pinned against an
    # independent numpy pipeline, not a self-roundtrip
    from oxidizepdf_spark.kernel.jp2k import rct_forward, rct_inverse

    yy, xx = np.mgrid[0:30, 0:34]
    g = ((np.sin(xx / 8) + np.cos(yy / 6)) * 60 + 128).astype(np.uint8)
    rgb = np.stack([g, np.roll(g, 3, 1), 255 - g], -1)
    h, w = rgb.shape[:2]
    for yo, xo, yto, xto, ts in [(1, 1, 0, 0, None),
                                 (3, 2, 1, 1, (12, 12)),
                                 (5, 7, 2, 3, None)]:
        dec, _ = decode_jp2k(encode_jp2k(
            rgb, levels=2, comp_subsampling={1: (2, 2), 2: (2, 2)},
            image_offset=(yo, xo), tile_offset=(yto, xto),
            **({"tile_size": ts} if ts else {})))
        ycc = rct_forward(rgb.astype(np.int64) - 128)
        ysiz, xsiz = yo + h, xo + w
        cy0, cx0 = -(-yo // 2), -(-xo // 2)
        rows = np.minimum(np.arange(cy0, -(-ysiz // 2)) * 2 - yo, h - 1)
        cols = np.minimum(np.arange(cx0, -(-xsiz // 2)) * 2 - xo, w - 1)
        u = ycc[..., 1][rows][:, cols]
        v = ycc[..., 2][rows][:, cols]
        ridx = np.clip((yo + np.arange(h)) // 2 - cy0, 0, u.shape[0] - 1)
        cidx = np.clip((xo + np.arange(w)) // 2 - cx0, 0, u.shape[1] - 1)
        ycc2 = np.stack([ycc[..., 0], u[ridx][:, cidx],
                         v[ridx][:, cidx]], -1)
        exp = np.clip(rct_inverse(ycc2) + 128, 0, 255)
        assert np.array_equal(dec.astype(int), exp), (yo, xo)


def test_invalid_offsets_rejected():
    import struct as _s

    px = _rand(8, 8)
    base = encode_jp2k(px, levels=1)
    # XTOsiz > XOsiz violates A.5.1
    with pytest.raises(Jp2kError, match="offset"):
        encode_jp2k(px, levels=1, image_offset=(0, 0), tile_offset=(0, 1))
    # patch YOsiz >= Ysiz into the SIZ: structured reject
    i = base.find(b"\xff\x51")
    mut = bytearray(base)
    _s.pack_into(">I", mut, i + 4 + 8, 99)  # YOsiz field (after Lsiz+Rsiz+Xsiz... offset: marker+len+Rsiz(2)+Xsiz(4)=8 -> Ysiz; +12 -> XOsiz
    with pytest.raises(Jp2kError):
        decode_jp2k(bytes(mut))


def test_offset_streams_mutation_fuzz_contained():
    import random

    rng = random.Random(99)
    base = encode_jp2k(_rand(16, 18, 3, seed=21), levels=2,
                       precincts=(3, 3), cb_exp=3, progression=3,
                       image_offset=(3, 5), tile_offset=(1, 2),
                       tile_size=(12, 12))
    for _ in range(300):
        mut = bytearray(base)
        for _ in range(rng.randrange(1, 4)):
            mut[rng.randrange(len(mut))] = rng.randrange(256)
        try:
            decode_jp2k(bytes(mut))
        except Jp2kError:
            pass  # structured failure is the contract


# ---------------------------------------------------------------------------
# Per-component precinct grids (COC) — the final targeted reject
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("progression", range(5))
def test_coc_precinct_grid_differs_from_cod(progression):
    px = _rand(seed=40 + progression)
    img, _ = decode_jp2k(encode_jp2k(
        px, levels=2, cb_exp=3, precincts=(4, 4),
        coc_precincts={1: (3, 3)}, progression=progression))
    assert (img == px).all()


def test_coc_maximal_precincts_under_explicit_cod_grid():
    # Scoc without the precinct flag = maximal precincts, a DIFFERENT
    # grid from the COD's explicit one (previously a targeted error)
    px = _rand(seed=50)
    img, _ = decode_jp2k(encode_jp2k(
        px, levels=2, cb_exp=3, precincts=(3, 3),
        coc_precincts={2: None}, progression=3))
    assert (img == px).all()


def test_coc_only_precincts_no_cod_grid():
    px = _rand(seed=51)
    img, _ = decode_jp2k(encode_jp2k(
        px, levels=2, cb_exp=3, coc_precincts={0: (3, 3)},
        progression=4))
    assert (img == px).all()


def test_coc_precincts_with_offsets_tiles_and_styles():
    px = _rand(seed=52)
    img, _ = decode_jp2k(encode_jp2k(
        px, levels=2, cb_exp=3, precincts=(4, 4),
        coc_precincts={1: (3, 3), 2: None}, coc_styles={1: 0x08},
        progression=3, tile_size=(16, 16),
        image_offset=(3, 5), tile_offset=(1, 2)))
    assert (img == px).all()


def test_coc_precinct_wire_bytes():
    # the COC actually carries its own grid (Scoc bit 0 + PP bytes)
    import struct as _s

    s = encode_jp2k(_rand(16, 16, 3, seed=53), levels=1, cb_exp=3,
                    precincts=(4, 4), coc_precincts={1: (3, 3)})
    i = s.find(b"\xff\x53")
    assert i > 0
    (ln,) = _s.unpack(">H", s[i + 2:i + 4])
    body = s[i + 4:i + 2 + ln]
    assert body[0] == 1 and body[1] & 0x01  # component 1, explicit grid
    assert list(body[7:9]) == [0x33, 0x33]  # (ppy<<4)|ppx per res


def test_short_qcd_raises_jp2k_error_not_indexerror():
    """ADVICE r10 #4 pin: a QCD whose exponent list is shorter than the
    component's band count must raise Jp2kError at parse time, never a
    bare IndexError from band table assembly. (The length validation
    already landed with the COC/QCC work — this pins it.)"""
    import struct

    import numpy as np

    from oxidizepdf_spark.kernel.jp2k import (
        Jp2kError,
        decode_jp2k,
        encode_jp2k,
    )

    img = np.arange(256, dtype=np.uint8).reshape(16, 16)[..., None]
    data = encode_jp2k(img, levels=2)
    i = data.find(b"\xff\x5c")
    ln = struct.unpack(">H", data[i + 2:i + 4])[0]
    trunc = (data[:i + 2] + struct.pack(">H", ln - 2)
             + data[i + 4:i + 2 + ln - 2] + data[i + 2 + ln:])
    try:
        decode_jp2k(trunc)
        raise AssertionError("short QCD decoded")
    except Jp2kError:
        pass

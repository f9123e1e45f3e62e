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

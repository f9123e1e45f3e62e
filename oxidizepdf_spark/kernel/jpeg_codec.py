"""Baseline JPEG (DCTDecode) pixel codec — a documented beyond-reference
extension.

The reference deliberately does NOT decode JPEG pixels: its
``decode_dct`` (oxidize-pdf-core/src/parser/filter_impls/dct.rs:52-67)
extracts the SOI..EOI byte window, validates the marker structure, and
returns the JPEG bytes as-is ("The PDF reader will handle the actual
JPEG decoding").  That surface is already mirrored 1:1 in
``image_codecs.py`` (extract_clean_jpeg / parse_jpeg_info /
validate_jpeg / decode_dct).

This module goes further, the same way the JBIG2 decoder does: a real
JPEG decoder covering baseline (SOF0), extended-sequential (SOF1) and
progressive (SOF2) Huffman processes with 8-bit samples — and, per
T.81 Table B.2, 12-bit samples on the extended/progressive processes
(16-bit DQT form, uint16 output; the medical/scanner shape) — so the
extraction pipeline can hand a training-data consumer decoded pixels
(re-encoded as PNG) instead of an opaque ``.jpg`` blob.  Everything is
pure Python + numpy:

- entropy decode: canonical Huffman via the spec's DECODE procedure
  (F.2.2.3 — mincode/maxcode/valptr per code length) over a bit reader
  that performs 0xFF00 byte-unstuffing and recognises RSTn markers;
- block transform: all 8x8 blocks of a component are dequantized and
  inverse-DCT'd in one numpy einsum against the precomputed DCT-II
  basis (no per-pixel Python);
- sampling: integer-ratio chroma upsampling via np.repeat (covers
  4:4:4, 4:2:2, 4:2:0 and any Hi/Vi dividing hmax/vmax);
- colour: JFIF YCbCr->RGB, Adobe APP14 transform honoured (0 = RGB
  pass-through for 3 components, 2 = YCCK for 4), CMYK->RGB helper for
  the PNG path.

A minimal baseline ENCODER lives here too, used only to build
self-validating test fixtures (the sandbox has no image libraries).
It emits per-image canonical Huffman tables computed from the actual
symbol histogram — all codes of one length L with n < 2^L — which is a
valid DHT per B.2.4.2 and exercises the decoder's general table walk
rather than the two well-known Annex K tables.

Progressive streams decode through the T.81 G.1.2/G.2 scan procedures:
spectral selection, successive approximation (DC first/refine, AC
first/refine with EOB-run accumulation and buffered correction bits).
The SOF3 LOSSLESS process decodes too (Annex H: per-sample Huffman
difference coding over predictors 1-7, point transform, 2-16 bit
samples, modulo-65536 reconstruction). Arithmetic (SOF9/10) and
hierarchical streams raise ``JpegError`` — the caller falls back to
the reference behaviour (raw JPEG bytes pass through). Arithmetic is
a DELIBERATE reject, not an omission: the QM-coder's 113-state
probability table (T.81 Table D.3) cannot be verified in this
sandbox, and a mis-remembered table would still roundtrip perfectly
against an in-repo encoder sharing it while silently mis-decoding
real files — the one failure mode this codebase refuses. A loud
raise keeps the raw bytes flowing instead.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "JpegError",
    "decode_jpeg",
    "decode_jpeg_to_rgb",
    "encode_jpeg",
]


class JpegError(ValueError):
    """Raised for streams this baseline codec cannot decode."""


# Zigzag scan order: _ZIGZAG[k] = natural (row-major) index of the k-th
# coefficient in zigzag order (ISO 10918-1 Figure 5).
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

# 8-point DCT-II basis: _BASIS[u, x] = c(u)/2 * cos((2x+1) u pi / 16).
# IDCT of block B (natural order) = _BASIS.T @ B @ _BASIS.
_BASIS = np.zeros((8, 8))
for _u in range(8):
    _c = (0.5 / np.sqrt(2.0)) if _u == 0 else 0.5
    for _x in range(8):
        _BASIS[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)
del _u, _c, _x


def _idct_blocks(coefs: np.ndarray) -> np.ndarray:
    """(n, 8, 8) dequantized coefficients -> (n, 8, 8) float samples."""
    return np.einsum("ux,nuv,vy->nxy", _BASIS, coefs, _BASIS, optimize=True)


def _fdct_blocks(samples: np.ndarray) -> np.ndarray:
    """(n, 8, 8) level-shifted samples -> (n, 8, 8) DCT coefficients."""
    return np.einsum("ux,nxy,vy->nuv", _BASIS, samples, _BASIS, optimize=True)


# ---------------------------------------------------------------------------
# Huffman tables
# ---------------------------------------------------------------------------


class _HuffTable:
    """Canonical JPEG Huffman table (spec F.2.2.3 DECODE state)."""

    __slots__ = ("mincode", "maxcode", "valptr", "huffval")

    def __init__(self, bits: list[int], huffval: bytes):
        # bits[l-1] = number of codes of length l (1..16)
        if len(bits) != 16:
            raise JpegError("DHT BITS list must have 16 entries")
        if sum(bits) != len(huffval) or sum(bits) == 0:
            raise JpegError("DHT symbol count mismatch")
        self.huffval = huffval
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            n = bits[length - 1]
            if n:
                self.valptr[length] = k
                self.mincode[length] = code
                code += n
                k += n
                self.maxcode[length] = code - 1
            else:
                self.maxcode[length] = -1
            if code > (1 << length):
                raise JpegError("DHT over-subscribed code lengths")
            code <<= 1


# ---------------------------------------------------------------------------
# Entropy-coded segment bit reader (with 0xFF00 unstuffing + RSTn)
# ---------------------------------------------------------------------------


class _BitReader:
    __slots__ = ("data", "pos", "acc", "nbits", "marker")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker = None  # marker byte that terminated the segment

    def _fill(self) -> bool:
        d = self.data
        p = self.pos
        if p >= len(d):
            return False
        b = d[p]
        if b == 0xFF:
            if p + 1 >= len(d):
                return False
            nxt = d[p + 1]
            if nxt == 0x00:  # stuffed FF
                self.pos = p + 2
            else:
                # A real marker (RSTn or segment-terminating): consume
                # it into self.marker; reset_restart()/_decode_scan()
                # decide what it means.
                self.marker = nxt
                self.pos = p + 2
                return False
        else:
            self.pos = p + 1
        self.acc = ((self.acc & ((1 << self.nbits) - 1)) << 8) | b
        self.nbits += 8
        return True

    def read_bit(self) -> int:
        if self.nbits == 0 and not self._fill():
            raise JpegError("unexpected end of entropy-coded data")
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        while self.nbits < n:
            if not self._fill():
                raise JpegError("unexpected end of entropy-coded data")
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        return v

    def decode_huff(self, table: _HuffTable) -> int:
        code = self.read_bit()
        length = 1
        while code > table.maxcode[length]:
            if length >= 16:
                raise JpegError("invalid Huffman code")
            code = (code << 1) | self.read_bit()
            length += 1
        return table.huffval[table.valptr[length] + code - table.mincode[length]]

    def reset_restart(self, expected: int) -> None:
        """Consume an RSTn marker between restart intervals."""
        # Discard any bits left in the accumulator (byte alignment).
        self.acc = 0
        self.nbits = 0
        d = self.data
        p = self.pos
        # The marker may already have been consumed by _fill(), or sit
        # just ahead of pos (possibly after pad bits).
        if self.marker is None:
            while p + 1 < len(d) and not (d[p] == 0xFF and d[p + 1] != 0x00):
                p += 1
            if p + 1 >= len(d):
                raise JpegError("missing restart marker")
            self.marker = d[p + 1]
            self.pos = p + 2
        if self.marker != 0xD0 + (expected & 7):
            raise JpegError(
                f"restart marker mismatch: got {self.marker:#x}, "
                f"expected {0xD0 + (expected & 7):#x}"
            )
        self.marker = None


def _extend(v: int, n: int) -> int:
    """EXTEND (spec F.2.2.1): map n received bits to a signed value."""
    if n == 0:
        return 0
    return v if v >= (1 << (n - 1)) else v - (1 << n) + 1


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


class _Component:
    __slots__ = ("cid", "h", "v", "tq", "td", "ta", "pred", "coefs",
                 "bx", "by", "bx_eff", "by_eff", "plane")

    def __init__(self, cid, h, v, tq):
        self.cid = cid
        self.h = h
        self.v = v
        self.tq = tq
        self.td = 0
        self.ta = 0
        self.pred = 0
        self.coefs = None  # (by*bx, 64) int32, natural order
        self.bx = 0        # padded (MCU-aligned) block-grid width
        self.by = 0
        self.bx_eff = 0    # ceil(component-width/8): non-interleaved walk
        self.by_eff = 0
        self.plane = None  # lossless process: (h, w) int32 samples


def _parse_dqt(seg: bytes, qtables: dict) -> None:
    i = 0
    while i < len(seg):
        pqtq = seg[i]
        pq, tq = pqtq >> 4, pqtq & 15
        i += 1
        if pq == 0:
            if i + 64 > len(seg):
                raise JpegError("DQT truncated")
            vals = np.frombuffer(seg[i:i + 64], dtype=np.uint8).astype(np.int32)
            i += 64
        elif pq == 1:
            if i + 128 > len(seg):
                raise JpegError("DQT truncated")
            vals = np.frombuffer(seg[i:i + 128], dtype=">u2").astype(np.int32)
            i += 128
        else:
            raise JpegError(f"invalid DQT precision {pq}")
        nat = np.empty(64, dtype=np.int32)
        nat[_ZIGZAG] = vals
        qtables[tq] = nat


def _parse_dht(seg: bytes, dc: dict, ac: dict) -> None:
    i = 0
    while i < len(seg):
        tcth = seg[i]
        tc, th = tcth >> 4, tcth & 15
        if i + 17 > len(seg):
            raise JpegError("DHT truncated")
        bits = list(seg[i + 1:i + 17])
        n = sum(bits)
        if i + 17 + n > len(seg):
            raise JpegError("DHT truncated")
        huffval = seg[i + 17:i + 17 + n]
        i += 17 + n
        table = _HuffTable(bits, huffval)
        (dc if tc == 0 else ac)[th] = table


def decode_jpeg(data: bytes) -> tuple[np.ndarray, dict]:
    """Decode a baseline JPEG to pixel planes.

    Returns ``(pixels, info)`` where pixels is a (height, width, ncomp)
    uint8 (8-bit) or uint16 (12-bit extended/progressive) array in the
    stream's native colour space (no YCbCr->RGB) and info carries
    ``{"width","height","components","adobe_transform","precision"}``
    (adobe_transform None when no APP14 marker is present).

    Every malformed-stream failure surfaces as ``JpegError`` — callers
    feeding untrusted PDF bytes need exactly one exception type.
    """
    try:
        return _decode_jpeg(data)
    except JpegError:
        raise
    except (IndexError, ValueError, OverflowError, struct.error) as exc:
        raise JpegError(f"malformed JPEG stream: {exc}") from exc


def _decode_jpeg(data: bytes) -> tuple[np.ndarray, dict]:
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        raise JpegError("missing SOI marker")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    dc_tables: dict[int, _HuffTable] = {}
    ac_tables: dict[int, _HuffTable] = {}
    comps: list[_Component] = []
    width = height = 0
    restart_interval = 0
    adobe_transform = None
    frame_seen = False
    precision = 8
    scan_seen = False
    progressive = False
    lossless = False
    hmax = vmax = 1
    mcus_x = mcus_y = 0

    while pos + 1 < len(data):
        if data[pos] != 0xFF:
            raise JpegError(f"expected marker at offset {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xFF:  # padding
            pos -= 1
            continue
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:
            continue
        if pos + 2 > len(data):
            raise JpegError("segment length missing")
        seg_len = struct.unpack(">H", data[pos:pos + 2])[0]
        if seg_len < 2 or pos + seg_len > len(data):
            raise JpegError("segment extends beyond data")
        seg = data[pos + 2:pos + seg_len]
        pos += seg_len

        if marker == 0xDB:
            _parse_dqt(seg, qtables)
        elif marker == 0xC4:
            _parse_dht(seg, dc_tables, ac_tables)
        elif marker == 0xDD:
            if len(seg) < 2:
                raise JpegError("DRI truncated")
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xEE and seg[:5] == b"Adobe" and len(seg) >= 12:
            adobe_transform = seg[11]
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3):
            if frame_seen:
                raise JpegError("multiple frames")
            frame_seen = True
            progressive = marker == 0xC2
            lossless = marker == 0xC3
            if len(seg) < 6:
                raise JpegError("SOF truncated")
            precision = seg[0]
            # T.81 Table B.2: baseline (SOF0) is 8-bit; the extended
            # sequential and progressive processes allow 12-bit too;
            # the lossless process (SOF3, Annex H) allows 2-16
            if lossless:
                if not 2 <= precision <= 16:
                    raise JpegError(
                        f"unsupported sample precision {precision}")
            elif precision not in (8, 12) or (
                    precision == 12 and marker == 0xC0):
                raise JpegError(f"unsupported sample precision {precision}")
            height = struct.unpack(">H", seg[1:3])[0]
            width = struct.unpack(">H", seg[3:5])[0]
            nc = seg[5]
            if nc not in (1, 3, 4):
                raise JpegError(f"unsupported component count {nc}")
            if len(seg) < 6 + 3 * nc:
                raise JpegError("SOF truncated")
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                h, v = hv >> 4, hv & 15
                if not (1 <= h <= 4 and 1 <= v <= 4):
                    raise JpegError(f"invalid sampling factors {h}x{v}")
                if lossless and (h, v) != (1, 1):
                    raise JpegError(
                        "lossless scans with subsampling not supported")
                comps.append(_Component(cid, h, v, tq))
            if lossless:
                if not width or not height:
                    raise JpegError("empty frame")
                for c in comps:
                    c.plane = np.zeros((height, width), dtype=np.int32)
            else:
                # Allocate every component's (padded) coefficient grid
                # up front: progressive scans accumulate into it,
                # sequential scans fill it once.
                hmax = max(c.h for c in comps)
                vmax = max(c.v for c in comps)
                mcus_x = -(-width // (8 * hmax))
                mcus_y = -(-height // (8 * vmax))
                for c in comps:
                    c.bx = mcus_x * c.h
                    c.by = mcus_y * c.v
                    c.bx_eff = -(-width * c.h // (hmax * 8))
                    c.by_eff = -(-height * c.v // (vmax * 8))
                    c.coefs = np.zeros((c.by * c.bx, 64), dtype=np.int32)
        elif marker in (0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegError(
                f"unsupported JPEG process (SOF marker {marker:#x}); "
                "only baseline/extended-sequential/progressive/lossless "
                "Huffman is decoded"
            )
        elif marker == 0xDA:
            if not frame_seen:
                raise JpegError("SOS before SOF")
            ns = seg[0]
            if len(seg) < 4 + 2 * ns:
                raise JpegError("SOS truncated")
            if not progressive and ns != len(comps) and ns != 1:
                raise JpegError("unsupported sequential scan layout")
            by_id = {c.cid: c for c in comps}
            scan_order = []
            for s in range(ns):
                cs, tdta = seg[1 + 2 * s:3 + 2 * s]
                comp = by_id.get(cs)
                if comp is None:
                    raise JpegError(f"scan references unknown component {cs}")
                comp.td, comp.ta = tdta >> 4, tdta & 15
                scan_order.append(comp)
            ss, se, ahal = seg[1 + 2 * ns:4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 15
            if lossless:
                # Annex H: Ss = predictor selector, Al = point transform
                if not 1 <= ss <= 7:
                    raise JpegError(f"invalid lossless predictor {ss}")
                if al >= precision:
                    raise JpegError("point transform exceeds precision")
                pos = _decode_lossless_scan(
                    data, pos, scan_order, width, height, dc_tables,
                    restart_interval, ss, al, precision,
                )
                scan_seen = True
                continue
            if not progressive:
                ss, se, ah, al = 0, 63, 0, 0
            elif ss > se or se > 63 or (ss == 0 and se != 0):
                raise JpegError("invalid progressive spectral band")
            elif ss > 0 and ns != 1:
                raise JpegError("progressive AC scans must be single-component")
            pos = _decode_scan(
                data, pos, scan_order, mcus_x, mcus_y,
                dc_tables, ac_tables, restart_interval,
                progressive, ss, se, ah, al,
            )
            scan_seen = True
        # APPn / COM: ignored

    if not frame_seen or not comps or not scan_seen:
        raise JpegError("no decoded scan data")

    if lossless:
        maxv = (1 << precision) - 1
        odt = np.uint8 if precision <= 8 else np.uint16
        pixels = np.stack(
            [np.clip(c.plane, 0, maxv).astype(odt) for c in comps],
            axis=-1)
        return pixels, {
            "width": width,
            "height": height,
            "components": len(comps),
            "adobe_transform": adobe_transform,
            "precision": precision,
            "lossless": True,
        }

    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    planes = []
    for c in comps:
        q = qtables.get(c.tq)
        if q is None:
            raise JpegError(f"missing quantization table {c.tq}")
        deq = (c.coefs * q).reshape(-1, 8, 8).astype(np.float64)
        blocks = _idct_blocks(deq) + float(1 << (precision - 1))
        # (by*bx, 8, 8) -> (by*8, bx*8)
        plane = (
            blocks.reshape(c.by, c.bx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c.by * 8, c.bx * 8)
        )
        plane = np.clip(np.round(plane), 0, (1 << precision) - 1).astype(
            np.uint8 if precision == 8 else np.uint16)
        # Crop to the component's true size, then upsample to full frame.
        ch = -(-height * c.v // vmax)  # ceil
        cw = -(-width * c.h // hmax)
        plane = plane[:ch, :cw]
        if c.v != vmax:
            plane = np.repeat(plane, vmax // c.v, axis=0)
        if c.h != hmax:
            plane = np.repeat(plane, hmax // c.h, axis=1)
        planes.append(plane[:height, :width])
    pixels = np.stack(planes, axis=-1)
    info = {
        "width": width,
        "height": height,
        "components": len(comps),
        "adobe_transform": adobe_transform,
        "precision": precision,
        "lossless": False,
    }
    return pixels, info


class _ScanState:
    """Per-scan mutable entropy state (EOB run spans blocks)."""

    __slots__ = ("eobrun",)

    def __init__(self):
        self.eobrun = 0


def _decode_scan(data, start, scan_order, mcus_x, mcus_y,
                 dc_tables, ac_tables, restart_interval,
                 progressive, ss, se, ah, al):
    """Decode one entropy-coded segment (sequential or progressive).

    Interleaved when the scan lists >1 component (MCU walk over the
    frame's MCU grid); otherwise a non-interleaved walk over the single
    component's effective block grid.  Returns the offset of the 0xFF
    of the terminating marker so the main loop resumes there.
    """
    single = len(scan_order) == 1
    if single:
        c = scan_order[0]
        total_mcus = c.bx_eff * c.by_eff
    else:
        total_mcus = mcus_x * mcus_y

    if progressive:
        if ss == 0:
            block_fn = _dc_first_block if ah == 0 else _dc_refine_block
        else:
            block_fn = _ac_first_block if ah == 0 else _ac_refine_block
    else:
        block_fn = _sequential_block

    state = _ScanState()
    for c in scan_order:
        c.pred = 0

    reader = _BitReader(data, start)
    rst_count = 0
    mcus_since_restart = 0
    for mcu in range(total_mcus):
        if restart_interval and mcus_since_restart == restart_interval:
            reader.reset_restart(rst_count)
            rst_count += 1
            mcus_since_restart = 0
            state.eobrun = 0
            for c in scan_order:
                c.pred = 0
        if single:
            c = scan_order[0]
            my, mx = divmod(mcu, c.bx_eff)
            block_fn(reader, c, my * c.bx + mx,
                     dc_tables.get(c.td), ac_tables.get(c.ta),
                     ss, se, ah, al, state)
        else:
            my, mx = divmod(mcu, mcus_x)
            for c in scan_order:
                dct = dc_tables.get(c.td)
                act = ac_tables.get(c.ta)
                for v in range(c.v):
                    for h in range(c.h):
                        bidx = (my * c.v + v) * c.bx + (mx * c.h + h)
                        block_fn(reader, c, bidx, dct, act,
                                 ss, se, ah, al, state)
        mcus_since_restart += 1

    # Resume main-loop parsing at the 0xFF of the terminating marker.
    if reader.marker is None:
        d = data
        p = reader.pos
        while p + 1 < len(d) and not (d[p] == 0xFF and d[p + 1] != 0x00):
            p += 1
        return p
    # _fill consumed the marker's two bytes; step back onto the 0xFF.
    return reader.pos - 2


def _lossless_predict(plane, y, x, predictor, default):
    """Annex H.1.2 prediction: the first sample (and the one after a
    restart, handled by the caller) uses 2^(P-Pt-1); the rest of the
    first line predicts from Ra, the first column from Rb, and the
    interior from the selected predictor over Ra/Rb/Rc."""
    if y == 0:
        return default if x == 0 else int(plane[0, x - 1])
    if x == 0:
        return int(plane[y - 1, 0])
    ra = int(plane[y, x - 1])
    rb = int(plane[y - 1, x])
    if predictor == 1:
        return ra
    if predictor == 2:
        return rb
    rc = int(plane[y - 1, x - 1])
    if predictor == 3:
        return rc
    if predictor == 4:
        return ra + rb - rc
    if predictor == 5:
        return ra + ((rb - rc) >> 1)
    if predictor == 6:
        return rb + ((ra - rc) >> 1)
    return (ra + rb) >> 1  # 7


def _decode_lossless_scan(data, start, scan_order, width, height,
                          dc_tables, restart_interval, predictor, pt,
                          precision):
    """One lossless scan (T.81 Annex H): a sample per component per
    MCU position (1x1 sampling only), DC-style difference categories
    (SSSS 16 = +32768, no extra bits), reconstruction modulo 2^16
    (H.1.2.1), the decoded plane upshifted by the point transform at
    the end. Restarts reset the prediction to the default, and the
    REMAINDER of the restart interval's first line predicts with the
    1-D Ra predictor (H.1.2.1: "the one-dimensional horizontal
    predictor is used for the first line of samples at the start of
    the scan and at the beginning of each restart interval") — a
    2-D predictor there would reach across the restart boundary into
    rows decoded before the marker (ADVICE r10 fix, mirrored in
    ``_encode_lossless_stream``)."""
    for c in scan_order:
        if c.plane is None:
            raise JpegError("lossless scan before SOF")
        if dc_tables.get(c.td) is None:
            raise JpegError("scan references undefined Huffman table")
    default = 1 << (precision - pt - 1)
    reader = _BitReader(data, start)
    rst_count = 0
    since = 0
    fresh = {c.cid: True for c in scan_order}  # default-predict next
    rst_line = -1  # line the current restart interval began on
    for idx in range(height * width):
        if restart_interval and since == restart_interval:
            reader.reset_restart(rst_count)
            rst_count += 1
            since = 0
            for c in scan_order:
                fresh[c.cid] = True
            rst_line = idx // width
        y, x = divmod(idx, width)
        pred_sel = 1 if y == rst_line else predictor
        for c in scan_order:
            t = reader.decode_huff(dc_tables[c.td])
            if t > 16:
                raise JpegError("invalid lossless difference category")
            if t == 16:
                diff = 32768
            else:
                diff = _extend(reader.receive(t), t) if t else 0
            px = default if fresh[c.cid] else _lossless_predict(
                c.plane, y, x, pred_sel, default)
            fresh[c.cid] = False
            c.plane[y, x] = (px + diff) & 0xFFFF
        since += 1
    for c in scan_order:
        if pt:
            c.plane <<= pt
    if reader.marker is None:
        d = data
        p = reader.pos
        while p + 1 < len(d) and not (d[p] == 0xFF and d[p + 1] != 0x00):
            p += 1
        return p
    return reader.pos - 2


def _sequential_block(reader, comp, bidx, dc_table, ac_table,
                      ss, se, ah, al, state):
    if dc_table is None or ac_table is None:
        raise JpegError("scan references undefined Huffman table")
    coefs = comp.coefs[bidx]
    t = reader.decode_huff(dc_table)
    if t > 15:
        raise JpegError("invalid DC magnitude category")
    diff = _extend(reader.receive(t), t) if t else 0
    comp.pred += diff
    coefs[0] = comp.pred
    k = 1
    zz = _ZIGZAG
    while k < 64:
        rs = reader.decode_huff(ac_table)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise JpegError("AC coefficient index out of range")
        coefs[zz[k]] = _extend(reader.receive(s), s)
        k += 1


# --- progressive block procedures (ITU T.81 G.1.2 / G.2) ----------------


def _dc_first_block(reader, comp, bidx, dc_table, ac_table,
                    ss, se, ah, al, state):
    if dc_table is None:
        raise JpegError("scan references undefined Huffman table")
    t = reader.decode_huff(dc_table)
    if t > 15:
        raise JpegError("invalid DC magnitude category")
    diff = _extend(reader.receive(t), t) if t else 0
    comp.pred += diff
    comp.coefs[bidx, 0] = comp.pred << al


def _dc_refine_block(reader, comp, bidx, dc_table, ac_table,
                     ss, se, ah, al, state):
    if reader.read_bit():
        comp.coefs[bidx, 0] |= 1 << al


def _ac_first_block(reader, comp, bidx, dc_table, ac_table,
                    ss, se, ah, al, state):
    if state.eobrun > 0:
        state.eobrun -= 1
        return
    if ac_table is None:
        raise JpegError("scan references undefined Huffman table")
    coefs = comp.coefs[bidx]
    zz = _ZIGZAG
    k = ss
    while k <= se:
        rs = reader.decode_huff(ac_table)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            state.eobrun = (1 << r) - 1
            if r:
                state.eobrun += reader.receive(r)
            break
        k += r
        if k > se:
            raise JpegError("AC coefficient outside spectral band")
        coefs[zz[k]] = _extend(reader.receive(s), s) << al
        k += 1


def _ac_refine_block(reader, comp, bidx, dc_table, ac_table,
                     ss, se, ah, al, state):
    """Successive-approximation AC refinement (T.81 G.1.2.3): runs
    count ZERO-history positions; every nonzero-history coefficient
    crossed receives one correction bit."""
    if ac_table is None:
        raise JpegError("scan references undefined Huffman table")
    coefs = comp.coefs[bidx]
    zz = _ZIGZAG
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if state.eobrun == 0:
        while k <= se:
            rs = reader.decode_huff(ac_table)
            r, s = rs >> 4, rs & 15
            newval = 0
            if s == 0:
                if r != 15:
                    state.eobrun = (1 << r)
                    if r:
                        state.eobrun += reader.receive(r)
                    break
                # ZRL: advance over 15 zero-history positions
            else:
                if s != 1:
                    raise JpegError("invalid AC refinement magnitude")
                newval = p1 if reader.read_bit() else m1
            while k <= se:
                z = zz[k]
                cur = coefs[z]
                if cur != 0:
                    if reader.read_bit() and (cur & p1) == 0:
                        coefs[z] = cur + (p1 if cur >= 0 else m1)
                else:
                    if r == 0:
                        if newval:
                            coefs[z] = newval
                        k += 1
                        break
                    r -= 1
                k += 1
    if state.eobrun > 0:
        while k <= se:
            z = zz[k]
            cur = coefs[z]
            if cur != 0:
                if reader.read_bit() and (cur & p1) == 0:
                    coefs[z] = cur + (p1 if cur >= 0 else m1)
            k += 1
        state.eobrun -= 1


# ---------------------------------------------------------------------------
# Colour conversion
# ---------------------------------------------------------------------------


def _ycbcr_to_rgb(pix: np.ndarray, precision: int = 8) -> np.ndarray:
    half = float(1 << (precision - 1))
    maxv = (1 << precision) - 1
    y = pix[..., 0].astype(np.float64)
    cb = pix[..., 1].astype(np.float64) - half
    cr = pix[..., 2].astype(np.float64) - half
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, maxv).astype(
        np.uint8 if precision == 8 else np.uint16)


def decode_jpeg_to_rgb(data: bytes) -> tuple[np.ndarray, int]:
    """Decode to display pixels: (h, w, 1) gray or (h, w, 3) RGB — see
    ``decode_jpeg_to_rgb_px`` (this keeps the historical 2-tuple API)."""
    pix, nc, _p = decode_jpeg_to_rgb_px(data)
    return pix, nc


def decode_jpeg_to_rgb_px(data: bytes) -> tuple[np.ndarray, int, int]:
    """Decode to display pixels: (h, w, 1) gray or (h, w, 3) RGB.

    Colour-space policy mirrors dct.rs:277-293: 1 component = Gray;
    3 components = YCbCr unless an Adobe APP14 marker says transform 0
    (RGB pass-through); 4 components = CMYK (Adobe transform 2 = YCCK
    first), then converted to RGB for the PNG sink.  Returns
    (pixels, n_output_components, sample_precision) — the precision is
    what the PNG sink needs to scale 9-16-bit (and sub-8-bit lossless,
    T.81 Annex H allows 2-16) samples into its 8-bit output.
    """
    pix, info = decode_jpeg(data)
    nc = info["components"]
    tr = info["adobe_transform"]
    p = info["precision"]
    maxf = float((1 << p) - 1)
    odt = np.uint8 if p == 8 else np.uint16
    if nc == 1:
        return pix, 1, p
    if nc == 3:
        if tr == 0:
            return pix, 3, p
        if info.get("lossless") and tr != 1:
            # lossless 3-component streams carry source planes (no
            # implied JFIF YCbCr); only an explicit Adobe transform 1
            # requests the conversion
            return pix, 3, p
        return _ycbcr_to_rgb(pix, p), 3, p
    # CMYK: Adobe 4-component JPEGs store inverted samples; honour the
    # convention only when an Adobe marker is present (transform 2 also
    # layers YCCK on top).
    if tr == 2:
        rgbk = np.concatenate(
            [_ycbcr_to_rgb(pix[..., :3], p), pix[..., 3:]], axis=-1)
        cmyk = rgbk.astype(np.float64)
        cmyk[..., :3] = maxf - cmyk[..., :3]
    else:
        cmyk = pix.astype(np.float64)
    if tr is not None:
        cmyk = maxf - cmyk  # Adobe inverted convention
    c, m, y_, k = (cmyk[..., i] for i in range(4))
    r = (maxf - c) * (maxf - k) / maxf
    g = (maxf - m) * (maxf - k) / maxf
    b = (maxf - y_) * (maxf - k) / maxf
    return np.clip(np.round(np.stack([r, g, b], axis=-1)),
                   0, maxf).astype(odt), 3, p


# ---------------------------------------------------------------------------
# Encoder (fixture generation only)
# ---------------------------------------------------------------------------

# Annex K.1/K.2 base quantization tables (natural order via zigzag fill).
_K_LUMA_ZZ = [
    16, 11, 12, 14, 12, 10, 16, 14, 13, 14, 18, 17, 16, 19, 24, 40,
    26, 24, 22, 22, 24, 49, 35, 37, 29, 40, 58, 51, 61, 60, 57, 51,
    56, 55, 64, 72, 92, 78, 64, 68, 87, 69, 55, 56, 80, 109, 81, 87,
    95, 98, 103, 104, 103, 62, 77, 113, 121, 112, 100, 120, 92, 101,
    103, 99,
]
_K_CHROMA_ZZ = [
    17, 18, 18, 24, 21, 24, 47, 26, 26, 47, 99, 66, 56, 66, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
]


def _quant_table(base_zz: list[int], quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    nat = np.empty(64, dtype=np.int32)
    vals = [min(255, max(1, (b * scale + 50) // 100)) for b in base_zz]
    nat[_ZIGZAG] = vals
    return nat


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per F.1.2.3


def _magnitude(v: int) -> int:
    return int(abs(v)).bit_length()


def _block_symbols(coefs: np.ndarray, pred: int) -> tuple[list, int]:
    """Quantized natural-order block -> [(symbol, extra_bits, nbits)...],
    split into DC symbol first, then AC run-length symbols."""
    syms = []
    dc = int(coefs[0])
    diff = dc - pred
    s = _magnitude(diff)
    extra = diff if diff >= 0 else diff + (1 << s) - 1
    syms.append(("dc", s, extra & ((1 << s) - 1), s))
    zz = coefs[_ZIGZAG]
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            syms.append(("ac", 0xF0, 0, 0))
            run -= 16
        s = _magnitude(v)
        extra = v if v >= 0 else v + (1 << s) - 1
        syms.append(("ac", (run << 4) | s, extra & ((1 << s) - 1), s))
        run = 0
    if last_nz < 63:
        syms.append(("ac", 0x00, 0, 0))  # EOB
    return syms, dc


def _build_fixed_table(symbols: set[int]) -> tuple[list[int], bytes]:
    """All-one-length canonical table over the used symbols (n < 2^L)."""
    vals = sorted(symbols)
    n = len(vals)
    length = 1
    while n >= (1 << length):  # smallest L with n < 2^L (no all-ones code)
        length += 1
    bits = [0] * 16
    bits[length - 1] = n
    return bits, bytes(vals)


def _code_map(bits: list[int], huffval: bytes) -> dict[int, tuple[int, int]]:
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


def encode_jpeg(pixels: np.ndarray, quality: int = 90,
                subsampling: str = "4:4:4",
                restart_interval: int = 0,
                native: bool = False,
                progressive: bool = False,
                precision: int = 8,
                lossless: bool = False,
                predictor: int = 4,
                point_transform: int = 0) -> bytes:
    """Encode (h, w) / (h, w, 1) gray or (h, w, 3) RGB uint8 pixels as a
    baseline JFIF JPEG.  With ``native=True`` the 1-4 input planes are
    entropy-coded as-is (no RGB->YCbCr), which is how 4-component CMYK
    streams are built.  With ``progressive=True`` a SOF2 stream is
    emitted (DC first Al=1 → DC refine → per-component AC first Al=1 →
    AC refine to Al=0), exercising every successive-approximation
    decoder branch.  ``precision=12`` emits the 12-bit extended
    sequential (SOF1) or progressive process from uint16 samples, with
    16x-scaled quantization tables in the 16-bit DQT form (T.81 B.4.1
    Pq=1).  ``lossless=True`` emits the SOF3 lossless process (Annex
    H: per-sample difference coding under ``predictor`` 1-7 with
    ``point_transform`` downshifted samples; 2-16 bit precision, no
    quantization, exact by construction).  Fixture generation only —
    favours clarity."""
    if lossless:
        if not 2 <= precision <= 16:
            raise JpegError(f"unsupported encoder precision {precision}")
        if progressive:
            raise JpegError("lossless excludes progressive")
        if not 1 <= predictor <= 7:
            raise JpegError(f"invalid lossless predictor {predictor}")
        if not 0 <= point_transform < precision:
            raise JpegError("point transform exceeds precision")
    elif precision not in (8, 12):
        raise JpegError(f"unsupported encoder precision {precision}")
    half = float(1 << (precision - 1))
    pix = np.asarray(pixels,
                     dtype=np.uint8 if precision <= 8 else np.uint16)
    if int(pix.max(initial=0)) >= (1 << precision):
        raise JpegError(f"{precision}-bit samples exceed range")
    if pix.ndim == 2:
        pix = pix[..., None]
    h, w, nc = pix.shape
    if lossless:
        if not 1 <= nc <= 4:
            raise JpegError("lossless supports 1-4 planes")
        return _encode_lossless_stream(
            pix, precision, predictor, point_transform,
            restart_interval)
    if native:
        if not 1 <= nc <= 4:
            raise JpegError("native mode supports 1-4 planes")
    elif nc not in (1, 3):
        raise JpegError("encoder supports gray or RGB input only")
    factors = {"4:4:4": (1, 1), "4:2:2": (2, 1), "4:2:0": (2, 2)}
    if subsampling not in factors:
        raise JpegError(f"unsupported subsampling {subsampling}")
    sh, sv = factors[subsampling] if (nc == 3 and not native) else (1, 1)

    # Colour transform.
    if nc == 3 and not native:
        r = pix[..., 0].astype(np.float64)
        g = pix[..., 1].astype(np.float64)
        b = pix[..., 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + half
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + half
        planes = [y, cb, cr]
    else:
        planes = [pix[..., i].astype(np.float64) for i in range(nc)]

    qt_luma = _quant_table(_K_LUMA_ZZ, quality)
    qt_chroma = _quant_table(_K_CHROMA_ZZ, quality)
    if precision == 12 and quality < 100:
        # keep the relative quality: samples are 16x bigger, so are the
        # steps — which also pushes the tables into the 16-bit DQT form
        # (quality 100 keeps unit steps so the roundtrip stays exact)
        qt_luma = qt_luma * 16
        qt_chroma = qt_chroma * 16

    comp_cfg = []  # (plane, hsamp, vsamp, tq)
    for ci, plane in enumerate(planes):
        if ci == 0:
            comp_cfg.append((plane, sh, sv, 0))
        else:
            # Chroma downsample by box mean.
            if sh > 1 or sv > 1:
                ph = -(-h // sv) * sv
                pw = -(-w // sh) * sh
                padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
                plane = padded.reshape(
                    ph // sv, sv, pw // sh, sh
                ).mean(axis=(1, 3))
            comp_cfg.append((plane, 1, 1, 1 if nc >= 2 else 0))

    hmax = max(c[1] for c in comp_cfg)
    vmax = max(c[2] for c in comp_cfg)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # Quantize every block of every component.
    comp_blocks = []  # per comp: (by, bx, 64) int32 natural order
    for plane, hs, vs, tq in comp_cfg:
        bx = mcus_x * hs
        by = mcus_y * vs
        ph, pw = by * 8, bx * 8
        padded = np.pad(
            plane,
            ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
            mode="edge",
        )
        blocks = (
            padded.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)
            .reshape(-1, 8, 8) - half
        )
        coefs = _fdct_blocks(blocks)
        q = (qt_luma if tq == 0 else qt_chroma).reshape(8, 8)
        quant = np.round(coefs / q).astype(np.int32).reshape(by, bx, 64)
        comp_blocks.append(quant)

    if progressive:
        if restart_interval:
            raise JpegError("progressive encoder does not support restarts")
        return _encode_progressive_stream(
            h, w, nc, comp_cfg, comp_blocks, qt_luma, qt_chroma,
            mcus_x, mcus_y, precision,
        )

    # Walk MCUs once to gather symbols, again to emit (canonical tables
    # need the full histogram first).
    def mcu_blocks():
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci, (_, hs, vs, _) in enumerate(comp_cfg):
                    for v in range(vs):
                        for hh in range(hs):
                            yield ci, comp_blocks[ci][my * vs + v, mx * hs + hh]

    dc_syms: list[set] = [set(), set()]
    ac_syms: list[set] = [set(), set()]
    all_syms = []
    preds = [0] * len(comp_cfg)
    per_mcu = sum(c[1] * c[2] for c in comp_cfg)
    for i, (ci, block) in enumerate(mcu_blocks()):
        if restart_interval and i % per_mcu == 0:
            mcu_idx = i // per_mcu
            if mcu_idx and mcu_idx % restart_interval == 0:
                preds = [0] * len(comp_cfg)
        tid = 0 if ci == 0 else 1
        syms, dc = _block_symbols(block.reshape(64), preds[ci])
        preds[ci] = dc
        for kind, sym, extra, nbits in syms:
            (dc_syms if kind == "dc" else ac_syms)[tid].add(sym)
        all_syms.append((ci, tid, syms))

    n_tables = 2 if nc >= 2 else 1
    dc_tables = [_build_fixed_table(dc_syms[t] or {0}) for t in range(n_tables)]
    ac_tables = [_build_fixed_table(ac_syms[t] or {0}) for t in range(n_tables)]
    dc_maps = [_code_map(*t) for t in dc_tables]
    ac_maps = [_code_map(*t) for t in ac_tables]

    # --- assemble the stream ---
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + \
        struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tq, table in ((0, qt_luma), (1, qt_chroma))[:n_tables]:
        _emit_dqt(out, tq, table)
    out += (b"\xff\xc0" if precision == 8 else b"\xff\xc1")
    out += struct.pack(">H", 8 + 3 * nc) + bytes([precision])
    out += struct.pack(">HH", h, w) + bytes([nc])
    for ci, (_, hs, vs, tq) in enumerate(comp_cfg):
        out += bytes([ci + 1, (hs << 4) | vs, tq])
    for tc, tables in ((0, dc_tables), (1, ac_tables)):
        for th, (bits, huffval) in enumerate(tables):
            out += b"\xff\xc4" + struct.pack(">H", 19 + len(huffval))
            out += bytes([(tc << 4) | th]) + bytes(bits) + huffval
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">H", 4)
        out += struct.pack(">H", restart_interval)
    out += b"\xff\xda" + struct.pack(">H", 6 + 2 * nc) + bytes([nc])
    for ci in range(nc):
        tid = 0 if ci == 0 else 1
        out += bytes([ci + 1, (tid << 4) | tid])
    out += b"\x00\x3f\x00"

    writer = _BitWriter()
    rst = 0
    blocks_per_mcu = per_mcu
    for i, (ci, tid, syms) in enumerate(all_syms):
        if restart_interval and i and i % blocks_per_mcu == 0:
            mcu_idx = i // blocks_per_mcu
            if mcu_idx % restart_interval == 0:
                writer.flush()
                out += writer.out
                writer = _BitWriter()
                out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
        for kind, sym, extra, nbits in syms:
            code, length = (dc_maps if kind == "dc" else ac_maps)[tid][sym]
            writer.write(code, length)
            if nbits:
                writer.write(extra, nbits)
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Progressive encoder (fixture generation; mirrors T.81 G.1.2 scans)
# ---------------------------------------------------------------------------


def _sig_mag(v: int) -> tuple[int, int]:
    """(size-category, extra-bits) for a signed value, sequential style."""
    s = abs(v).bit_length()
    extra = v if v >= 0 else v + (1 << s) - 1
    return s, extra & ((1 << s) - 1)


def _dc_first_events(walk, al):
    """walk yields (ci, tid, block64); returns event list + used symbols.
    Events: ('sym', tid, s) / ('bits', value, nbits)."""
    ev = []
    used = {}
    preds = {}
    for ci, tid, block in walk:
        v = int(block[0]) >> al  # arithmetic shift, libjpeg convention
        diff = v - preds.get(ci, 0)
        preds[ci] = v
        s, extra = _sig_mag(diff)
        ev.append(("sym", tid, s))
        used.setdefault(tid, set()).add(s)
        if s:
            ev.append(("bits", extra, s))
    return ev, used


def _dc_refine_events(walk, al):
    return [("bits", (int(block[0]) >> al) & 1, 1) for _, _, block in walk]


def _ac_this_scan(block, al):
    """Zigzag band 1..63 as (signed this-scan value, correction bit)."""
    zz = block[_ZIGZAG][1:]
    out = []
    for v in zz:
        v = int(v)
        a = abs(v) >> al
        out.append((a if v >= 0 else -a, a & 1))
    return out


def _flush_eobrun(ev, used, tid, eobrun, br):
    while eobrun > 0:
        chunk = min(eobrun, 0x7FFF)
        nbits = chunk.bit_length() - 1
        ev.append(("sym", tid, nbits << 4))
        used.add(nbits << 4)
        if nbits:
            ev.append(("bits", chunk - (1 << nbits), nbits))
        for bit in br:
            ev.append(("bits", bit, 1))
        br.clear()
        eobrun -= chunk
    return 0


def _ac_first_events(blocks, al, tid):
    ev = []
    used = set()
    eobrun = 0
    br = []  # unused for first scans; shared flush helper
    for block in blocks:
        tvals = [t for t, _ in _ac_this_scan(block, al)]
        last = -1
        for i in range(62, -1, -1):
            if tvals[i]:
                last = i
                break
        if last < 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                eobrun = _flush_eobrun(ev, used, tid, eobrun, br)
            continue
        eobrun = _flush_eobrun(ev, used, tid, eobrun, br)
        r = 0
        for t in tvals[: last + 1]:
            if t == 0:
                r += 1
                continue
            while r > 15:
                ev.append(("sym", tid, 0xF0))
                used.add(0xF0)
                r -= 16
            s, extra = _sig_mag(t)
            ev.append(("sym", tid, (r << 4) | s))
            used.add((r << 4) | s)
            ev.append(("bits", extra, s))
            r = 0
        if last < 62:
            eobrun += 1
    _flush_eobrun(ev, used, tid, eobrun, br)
    return ev, used


def _ac_refine_events(blocks, al, tid):
    """Mirror of the decoder's _ac_refine_block: runs count zero-history
    positions, correction bits for crossed nonzero-history coefficients
    are buffered and emitted after the next symbol (or after the EOBn
    that closes a run of blocks)."""
    ev = []
    used = set()
    eobrun = 0
    br = []  # correction bits owed after the next symbol/EOBn
    for block in blocks:
        vals = _ac_this_scan(block, al)
        eob_idx = -1
        for i in range(62, -1, -1):
            if abs(vals[i][0]) == 1:
                eob_idx = i
                break
        r = 0
        pending = []
        emitted_any = False
        for idx, (t, bit) in enumerate(vals):
            a = abs(t)
            if a == 0:
                r += 1
                continue
            # ZRLs must be emitted at ANY nonzero position once r > 15
            # (and only while a newly-nonzero coefficient still follows
            # — otherwise the zeros fold into the EOB run): each ZRL's
            # decoder walk spans exactly 16 zero-history positions, so
            # the buffered correction bits have to be flushed here to
            # stay inside that window.
            while r > 15 and idx <= eob_idx:
                eobrun = _flush_eobrun(ev, used, tid, eobrun, br)
                ev.append(("sym", tid, 0xF0))
                used.add(0xF0)
                for b in pending:
                    ev.append(("bits", b, 1))
                pending.clear()
                r -= 16
            if a > 1:  # history-nonzero: owes one correction bit
                pending.append(bit)
                continue
            # newly-nonzero (|value| == 1): emit a symbol
            eobrun = _flush_eobrun(ev, used, tid, eobrun, br)
            ev.append(("sym", tid, (r << 4) | 1))
            used.add((r << 4) | 1)
            ev.append(("bits", 1 if t > 0 else 0, 1))
            for b in pending:
                ev.append(("bits", b, 1))
            pending.clear()
            r = 0
            emitted_any = True
        if r > 0 or pending or not emitted_any:
            eobrun += 1
            br.extend(pending)
            if eobrun == 0x7FFF:
                eobrun = _flush_eobrun(ev, used, tid, eobrun, br)
    _flush_eobrun(ev, used, tid, eobrun, br)
    return ev, used


def _emit_scan(out, comps_hdr, ss, se, ah, al, ev, tables):
    """tables: {(tc, th): (bits, huffval)} redefined before this scan."""
    for (tc, th), (bits, huffval) in sorted(tables.items()):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(huffval))
        out += bytes([(tc << 4) | th]) + bytes(bits) + huffval
    out += b"\xff\xda" + struct.pack(">H", 6 + 2 * len(comps_hdr))
    out += bytes([len(comps_hdr)])
    for cid, tdta in comps_hdr:
        out += bytes([cid, tdta])
    out += bytes([ss, se, (ah << 4) | al])
    maps = {
        th: _code_map(*tbl) for (tc, th), tbl in tables.items() if tc == 1
    } or {}
    dc_maps = {
        th: _code_map(*tbl) for (tc, th), tbl in tables.items() if tc == 0
    }
    writer = _BitWriter()
    for item in ev:
        if item[0] == "sym":
            _, tid, sym = item
            table = dc_maps.get(tid) if tid in dc_maps else None
            if table is None:
                table = maps[tid]
            code, length = table[sym]
            writer.write(code, length)
        else:
            _, value, nbits = item
            if nbits:
                writer.write(value, nbits)
    writer.flush()
    out += writer.out


def _emit_dqt(out: bytearray, tq: int, table) -> None:
    """DQT in 8- or 16-bit element form (T.81 B.4.1: Pq follows the
    element range)."""
    zz = table[_ZIGZAG]
    if int(zz.max()) > 255:
        out += b"\xff\xdb" + struct.pack(">H", 131) + bytes([0x10 | tq])
        out += b"".join(struct.pack(">H", int(v)) for v in zz)
    else:
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq])
        out += bytes(int(v) for v in zz)


def _encode_progressive_stream(h, w, nc, comp_cfg, comp_blocks,
                               qt_luma, qt_chroma, mcus_x, mcus_y,
                               precision=8):
    n_tables = 2 if nc >= 2 else 1
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + \
        struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tq, table in ((0, qt_luma), (1, qt_chroma))[:n_tables]:
        _emit_dqt(out, tq, table)
    out += b"\xff\xc2" + struct.pack(">H", 8 + 3 * nc) + bytes([precision])
    out += struct.pack(">HH", h, w) + bytes([nc])
    for ci, (_, hs, vs, tq) in enumerate(comp_cfg):
        out += bytes([ci + 1, (hs << 4) | vs, tq])

    def dc_walk():
        # Decoder walk order: single-component frames are always
        # non-interleaved (effective grid); multi-component DC scans
        # interleave over the padded MCU grid.
        if nc == 1:
            plane, hs, vs, _ = comp_cfg[0]
            bx_eff = -(-plane.shape[1] // 8)
            by_eff = -(-plane.shape[0] // 8)
            for my in range(by_eff):
                for mx in range(bx_eff):
                    yield 0, 0, comp_blocks[0][my, mx]
        else:
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    for ci, (_, hs, vs, _) in enumerate(comp_cfg):
                        tid = 0 if ci == 0 else 1
                        for v in range(vs):
                            for hh in range(hs):
                                yield ci, tid, comp_blocks[ci][
                                    my * vs + v, mx * hs + hh
                                ]

    def ac_blocks(ci):
        plane = comp_cfg[ci][0]
        bx_eff = -(-plane.shape[1] // 8)
        by_eff = -(-plane.shape[0] // 8)
        for my in range(by_eff):
            for mx in range(bx_eff):
                yield comp_blocks[ci][my, mx]

    # Scan 1: DC first, Al=1.
    ev, used = _dc_first_events(dc_walk(), 1)
    tables = {
        (0, tid): _build_fixed_table(syms or {0})
        for tid, syms in used.items()
    }
    comps_hdr = [
        (ci + 1, ((0 if ci == 0 else 1) << 4) | 0) for ci in range(nc)
    ]
    _emit_scan(out, comps_hdr, 0, 0, 0, 1, ev, tables)

    # Scan 2: DC refine to Al=0 (raw bits, no tables).
    ev = _dc_refine_events(dc_walk(), 0)
    _emit_scan(out, comps_hdr, 0, 0, 1, 0, ev, {})

    # Per component: AC first (Al=1) then AC refine (Ah=1 → Al=0).
    for ci in range(nc):
        tid = 0 if ci == 0 else 1
        ev, used = _ac_first_events(ac_blocks(ci), 1, tid)
        _emit_scan(
            out, [(ci + 1, tid)], 1, 63, 0, 1, ev,
            {(1, tid): _build_fixed_table(used or {0})},
        )
    for ci in range(nc):
        tid = 0 if ci == 0 else 1
        ev, used = _ac_refine_events(ac_blocks(ci), 0, tid)
        _emit_scan(
            out, [(ci + 1, tid)], 1, 63, 1, 0, ev,
            {(1, tid): _build_fixed_table(used or {0})},
        )

    out += b"\xff\xd9"
    return bytes(out)


def _encode_lossless_stream(pix, precision, predictor, pt,
                            restart_interval):
    """SOF3 lossless stream (Annex H). The encoder predicts over the
    SAME downshifted plane the decoder reconstructs (exactness makes
    them identical), so both sides walk one shared rule set."""
    h, w, nc = pix.shape
    planes = [(pix[..., i].astype(np.int64) >> pt) for i in range(nc)]
    default = 1 << (precision - pt - 1)
    n_tables = 2 if nc >= 2 else 1

    # one pass to gather symbols, one to emit
    events = []  # (tid, ssss, extra, nbits) in stream order; None = RST
    dc_syms = [set() for _ in range(n_tables)]
    since = 0
    fresh = [True] * nc
    rst_line = -1  # H.1.2.1: Ra for the rest of the interval's 1st line
    for idx in range(h * w):
        if restart_interval and since == restart_interval:
            events.append(None)
            since = 0
            fresh = [True] * nc
            rst_line = idx // w
        y, x = divmod(idx, w)
        pred_sel = 1 if y == rst_line else predictor
        for ci in range(nc):
            tid = 0 if ci == 0 else 1
            px = default if fresh[ci] else _lossless_predict(
                planes[ci], y, x, pred_sel, default)
            fresh[ci] = False
            diff = (int(planes[ci][y, x]) - px) & 0xFFFF
            if diff > 32768:
                diff -= 65536
            if diff == 32768:  # SSSS 16: no extra bits (H.1.2.2)
                ssss, extra, nbits = 16, 0, 0
            else:
                ssss = _magnitude(diff)
                extra = (diff if diff >= 0
                         else diff + (1 << ssss) - 1) & ((1 << ssss) - 1)
                nbits = ssss
            dc_syms[tid].add(ssss)
            events.append((tid, ssss, extra, nbits))
        since += 1

    tables = [_build_fixed_table(s or {0}) for s in dc_syms]
    maps = [_code_map(*t) for t in tables]

    out = bytearray(b"\xff\xd8")
    for th, (bits, huffval) in enumerate(tables):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(huffval))
        out += bytes([th]) + bytes(bits) + huffval
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">H", 4)
        out += struct.pack(">H", restart_interval)
    out += b"\xff\xc3" + struct.pack(">H", 8 + 3 * nc) + bytes([precision])
    out += struct.pack(">HH", h, w) + bytes([nc])
    for ci in range(nc):
        out += bytes([ci + 1, 0x11, 0])  # Hi=Vi=1, Tq unused
    out += b"\xff\xda" + struct.pack(">H", 6 + 2 * nc) + bytes([nc])
    for ci in range(nc):
        out += bytes([ci + 1, (0 if ci == 0 else 1) << 4])
    out += bytes([predictor, 0, pt])  # Ss=selector, Se=0, AhAl=Pt

    writer = _BitWriter()
    rst = 0
    for ev in events:
        if ev is None:
            writer.flush()
            out += writer.out
            out += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            writer = _BitWriter()
            continue
        tid, ssss, extra, nbits = ev
        code, length = maps[tid][ssss]
        writer.write(code, length)
        if nbits:
            writer.write(extra, nbits)
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"
    return bytes(out)

"""Baseline JPEG (ITU-T T.81) codec in pure numpy + stdlib — the last
mainstream still-image format with no in-container decode path
(VERDICT r07 item 6). Pillow remains the preferred backend when
installed; this module exists so ``open_image`` accepts SOI/JFIF
payloads in THIS media-library-free container, with an env-gated
Pillow cross-check (``RIPPLE_REAL_CODECS=1``) validating both
directions against the reference implementation wherever one exists.

Scope (the baseline profile that covers the overwhelming majority of
web/corpus JPEGs):

- **decode** (:func:`parse_jpeg`): baseline sequential DCT (SOF0; the
  Huffman-identical extended-sequential SOF1 is accepted too) AND
  progressive DCT (SOF2, round 10) — full T.81 Annex G spectral
  selection + successive approximation, DC/AC first and refinement
  scans, EOBn run decoding, interleaved DC scans, non-interleaved AC
  scans over true component block dims; 8-bit samples, grayscale,
  YCbCr, and 4-component CMYK/YCCK (round 10: APP14 Adobe transform
  honored — transform 2 undoes the YCCK color rotation, marker
  presence selects Adobe's inverted-ink storage, markerless 4-comp
  frames decode as plain CMYK ink) with any h/v sampling factors ≤ 2
  (4:4:4, 4:2:2, 4:2:0, 4:4:0), restart markers, 0xFF00 byte
  unstuffing. Rejected with ValueError: arithmetic coding (SOF9+),
  12-bit precision, lossless/hierarchical modes.
- **encode** (:func:`encode_jpeg`): baseline 4:4:4/4:2:0 with the
  T.81 Annex K quantization (quality-scaled, the same IJG curve every
  encoder uses) and Annex K Huffman tables — deterministic bytes for
  fixtures and digest pins; its output decodes with Pillow (the
  env-gated cross-check asserts it). ``progressive=True`` emits SOF2
  with libjpeg's standard scan script (jcparam.c
  ``jpeg_simple_progression``: DC Al=1 interleaved; banded AC first
  scans at Al=2/1; AC+DC refinement passes to Al=0), so the decoder's
  every progressive path has an in-container fixture generator. The
  progressive entropy coder ends each block's EOB run immediately
  (EOB0 only — Annex K AC tables carry no EOBn>0 symbols), which is
  spec-legal and costs a little compression; the DECODER handles
  arbitrary EOBn runs as real encoders emit them. ``cmyk=True``
  (round 10) converts RGB to Adobe-inverted YCCK (APP14 transform 2,
  K' = max channel so the ink split is exactly invertible) and emits
  the 4-component frame, baseline or progressive — the fixture
  generator for the CMYK decode paths.

JPEG is lossy: round-trip tests assert bounded error (quantization at
quality q bounds each DCT coefficient's error by Q[u,v]/2) plus pinned
digests, never byte equality.

Performance note: entropy decode is a per-bit Python loop — fine for
the thumbnail-sized payloads this in-container path serves (the same
contract as the PNG/netpbm codecs here); bulk corpora use Pillow,
which short-circuits ahead of this module in ``open_image``.
"""

from __future__ import annotations

import numpy as np

# -- 8x8 DCT basis (orthonormal DCT-II matrix) ------------------------------

_A = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(0.125) if _u == 0 else np.sqrt(0.25)
    for _x in range(8):
        _A[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)

# -- T.81 Annex K reference tables ------------------------------------------

_Q_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ]
).reshape(8, 8)

_Q_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ]
).reshape(8, 8)

# Annex K Huffman specs: (BITS[1..16], HUFFVAL)
_DC_LUMA_SPEC = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA_SPEC = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHROMA_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, str]:
    """T.81 C.2 canonical code assignment: {symbol: bitstring}."""
    codes: dict[int, str] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = format(code, f"0{length}b")
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decoder(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """{(length, code): symbol} lookup for the per-bit decoder."""
    out: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


# -- decoder -----------------------------------------------------------------


class _BitReader:
    """MSB-first reader over entropy-coded bytes (already unstuffed)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("jpeg: entropy stream truncated")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("jpeg: invalid Huffman code")


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map s received bits to a signed value."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _split_entropy(b: bytes, start: int) -> tuple[list[bytes], int]:
    """Unstuff the entropy stream from ``start``: returns the list of
    restart-interval segments (0xFF00 unstuffed, RSTn boundaries split)
    and the offset of the terminating marker."""
    segs: list[bytearray] = [bytearray()]
    i = start
    n = len(b)
    while i < n:
        c = b[i]
        if c != 0xFF:
            segs[-1].append(c)
            i += 1
            continue
        if i + 1 >= n:
            raise ValueError("jpeg: truncated entropy stream")
        m = b[i + 1]
        if m == 0x00:
            segs[-1].append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn: segment boundary
            segs.append(bytearray())
            i += 2
        else:
            return [bytes(s) for s in segs], i
    raise ValueError("jpeg: entropy stream missing terminating marker")


def _parse_sof(seg: bytes):
    """SOF payload -> (h, w, [(cid, hs, vs, tq)]) with profile checks."""
    if seg[0] != 8:
        raise ValueError(f"jpeg: only 8-bit precision supported, got {seg[0]}")
    h = int.from_bytes(seg[1:3], "big")
    w = int.from_bytes(seg[3:5], "big")
    nc = seg[5]
    if nc not in (1, 3, 4):
        raise ValueError(f"jpeg: {nc}-component images unsupported")
    comps = []
    for c in range(nc):
        cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
        hs, vs = hv >> 4, hv & 0x0F
        if not (1 <= hs <= 2 and 1 <= vs <= 2):
            raise ValueError(f"jpeg: sampling factors {hs}x{vs} unsupported")
        comps.append((cid, hs, vs, tq))
    return (h, w, comps)


def parse_jpeg(b: bytes):
    """Decode baseline or progressive JPEG bytes -> ImageHandle (uint8
    gray or RGB); None when the magic says this is not JPEG;
    ValueError on malformed/truncated/unsupported streams. See module
    docstring for the supported profile."""
    from ripple_server_spark.codecs import ImageHandle

    if len(b) < 2 or b[0] != 0xFF or b[1] != 0xD8:
        return None
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None  # (h, w, [(cid, hs, vs, tq)])
    progressive = False
    coef = None  # progressive coefficient store {cid: (hb, wb, 64) int32}
    scans_done = 0
    restart_interval = 0
    adobe_transform = None  # APP14 color transform (None = no marker)
    i = 2
    n = len(b)
    while i + 2 <= n:
        if b[i] != 0xFF:
            raise ValueError(f"jpeg: expected marker at offset {i}")
        m = b[i + 1]
        if m == 0xD8:
            i += 2
            continue
        if m == 0xD9:  # EOI
            if progressive and scans_done:
                return _finish_progressive(
                    frame, coef, qt, ImageHandle, adobe_transform
                )
            raise ValueError("jpeg: no scan data before EOI")
        if i + 4 > n:
            raise ValueError(f"jpeg: truncated marker 0xFF{m:02X}")
        ln = int.from_bytes(b[i + 2 : i + 4], "big")
        seg = b[i + 4 : i + 2 + ln]
        if len(seg) != ln - 2:
            raise ValueError(f"jpeg: truncated segment 0xFF{m:02X}")
        if m == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                if pq != 0:
                    raise ValueError("jpeg: 16-bit quantization tables unsupported")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[_ZIGZAG] = np.frombuffer(seg[p + 1 : p + 65], dtype=np.uint8)
                qt[tq] = tbl.reshape(8, 8)
                p += 65
        elif m == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                cnt = sum(bits)
                vals = list(seg[p + 17 : p + 17 + cnt])
                (huff_dc if tc == 0 else huff_ac)[th] = _build_decoder(bits, vals)
                p += 17 + cnt
        elif m in (0xC0, 0xC1):  # SOF0 baseline / SOF1 extended sequential
            frame = _parse_sof(seg)
        elif m == 0xC2:  # SOF2 progressive DCT
            frame = _parse_sof(seg)
            progressive = True
            coef = {
                cid: np.zeros((hb, wb, 64), dtype=np.int32)
                for cid, hb, wb, *_ in _prog_geometry(frame)
            }
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"jpeg: SOF 0xFF{m:02X} mode not supported")
        elif m == 0xEE and seg[:5] == b"Adobe" and len(seg) >= 12:
            # APP14: transform byte — 0 plain CMYK/RGB, 1 YCbCr, 2 YCCK;
            # presence of the marker also flags Adobe's INVERTED CMYK
            # storage convention for 4-component frames
            adobe_transform = seg[11]
        elif m == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif m == 0xDA:  # SOS -> entropy data follows
            if frame is None:
                raise ValueError("jpeg: SOS before SOF")
            ns = seg[0]
            scan_ids = []
            scan = {}
            for c in range(ns):
                cid, tdta = seg[1 + 2 * c], seg[2 + 2 * c]
                scan[cid] = (tdta >> 4, tdta & 0x0F)
                scan_ids.append(cid)
            if progressive:
                ss, se, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
                ah, al = ahal >> 4, ahal & 0x0F
                segs, end = _split_entropy(b, i + 2 + ln)
                _decode_prog_scan(
                    frame, scan_ids, scan, ss, se, ah, al,
                    huff_dc, huff_ac, restart_interval, segs, coef,
                )
                scans_done += 1
                i = end
                continue
            if ns != len(frame[2]):
                # spec-legal but out of profile: baseline images encoded
                # as multiple single-component scans — reject with the
                # module's uniform error type instead of a KeyError
                # deep in the MCU loop (review r08)
                raise ValueError(
                    "jpeg: non-interleaved (multi-scan) baseline streams "
                    f"not supported (scan has {ns} of {len(frame[2])} "
                    "components)"
                )
            segs, _end = _split_entropy(b, i + 2 + ln)
            return _decode_scan(
                frame, scan, qt, huff_dc, huff_ac, restart_interval, segs,
                ImageHandle, adobe_transform,
            )
        # APPn / COM / others: skip
        i += 2 + ln
    raise ValueError("jpeg: no SOS marker found")


def _decode_scan(
    frame, scan, qt, huff_dc, huff_ac, restart_interval, segs, handle_cls,
    adobe_transform=None,
):
    h, w, comps = frame
    if h <= 0 or w <= 0:
        raise ValueError(f"jpeg: bad dimensions {w}x{h}")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-w // mcu_w)
    mcus_y = -(-h // mcu_h)
    planes = {}
    for cid, hs, vs, _tq in comps:
        planes[cid] = np.zeros((mcus_y * vs * 8, mcus_x * hs * 8), dtype=np.float64)

    n_mcus = mcus_x * mcus_y
    per_seg = restart_interval if restart_interval else n_mcus
    mcu = 0
    for seg in segs:
        if mcu >= n_mcus:
            break
        reader = _BitReader(seg)
        pred = {cid: 0 for cid, *_ in comps}
        for _ in range(min(per_seg, n_mcus - mcu)):
            my, mx = divmod(mcu, mcus_x)
            for cid, hs, vs, tq in comps:
                td, ta = scan[cid]
                if td not in huff_dc or ta not in huff_ac or tq not in qt:
                    raise ValueError("jpeg: scan references undefined table")
                for by in range(vs):
                    for bx in range(hs):
                        blk = _decode_block(
                            reader, huff_dc[td], huff_ac[ta], qt[tq], pred, cid
                        )
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = blk
            mcu += 1
    if mcu < n_mcus:
        raise ValueError(f"jpeg: scan ended after {mcu}/{n_mcus} MCUs")
    return _assemble(frame, planes, handle_cls, adobe_transform)


def _assemble(frame, planes, handle_cls, adobe_transform=None):
    """Upsample subsampled planes, crop to true dims, color-convert."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    out = []
    for cid, hs, vs, _tq in comps:
        p = planes[cid]
        if hs < hmax or vs < vmax:
            p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        out.append(p[:h, :w])
    if len(out) == 1:
        arr = np.clip(np.round(out[0]), 0, 255).astype(np.uint8)[:, :, None]
        return handle_cls(arr)
    if len(out) == 4:
        # Adobe CMYK / YCCK (round 10): transform 2 stores the first
        # three channels YCbCr-transformed (YCCK) — invert that first;
        # then the APP14 marker flags Adobe's INVERTED storage, where
        # stored value v = 255 - ink, so R = C'*K'/255 directly (the
        # libjpeg+Pillow convention); markerless 4-comp frames are
        # plain CMYK ink values: R = (255-C)(255-K)/255.
        c0, c1, c2, kk = out
        if adobe_transform == 2:
            c0, c1, c2 = (
                c0 + 1.402 * (c2 - 128.0),
                c0 - 0.344136 * (c1 - 128.0) - 0.714136 * (c2 - 128.0),
                c0 + 1.772 * (c1 - 128.0),
            )
        chans = [np.clip(p, 0.0, 255.0) for p in (c0, c1, c2)]
        kc = np.clip(kk, 0.0, 255.0)
        if adobe_transform is not None:
            rgb = [p * kc / 255.0 for p in chans]
        else:
            rgb = [(255.0 - p) * (255.0 - kc) / 255.0 for p in chans]
        arr = np.clip(np.round(np.stack(rgb, axis=2)), 0, 255).astype(np.uint8)
        return handle_cls(arr)
    y, cb, cr = out
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bl = y + 1.772 * (cb - 128.0)
    arr = np.clip(np.round(np.stack([r, g, bl], axis=2)), 0, 255).astype(np.uint8)
    return handle_cls(arr)


def _decode_block(reader, dc_tbl, ac_tbl, q, pred, cid) -> np.ndarray:
    coef = np.zeros(64, dtype=np.float64)
    s = reader.decode(dc_tbl)
    diff = _extend(reader.read_bits(s), s) if s else 0
    pred[cid] += diff
    coef[0] = pred[cid]
    k = 1
    while k < 64:
        rs = reader.decode(ac_tbl)
        r, sz = rs >> 4, rs & 0x0F
        if sz == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("jpeg: AC run past end of block")
        coef[k] = _extend(reader.read_bits(sz), sz)
        k += 1
    # dequantize in zigzag order (coef[k] pairs with Q at zigzag
    # position k), scatter to natural order, then inverse DCT
    dq = np.zeros(64, dtype=np.float64)
    dq[_ZIGZAG] = coef * q.reshape(-1)[_ZIGZAG]
    block = _A.T @ dq.reshape(8, 8) @ _A
    return block + 128.0


# -- progressive decoder (T.81 Annex G, jdphuff.c semantics) -----------------


def _prog_geometry(frame):
    """Per-component block geometry: [(cid, hb_pad, wb_pad, hb_true,
    wb_true, hs, vs, tq)]. Interleaved (DC) scans cover the PADDED
    MCU grid; non-interleaved scans cover only the component's TRUE
    block dims (T.81 A.2.2/A.2.3 — real encoders depend on this)."""
    h, w, comps = frame
    if h <= 0 or w <= 0:
        raise ValueError(f"jpeg: bad dimensions {w}x{h}")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    out = []
    for cid, hs, vs, tq in comps:
        cw = -(-w * hs // hmax)
        ch = -(-h * vs // vmax)
        out.append(
            (cid, mcus_y * vs, mcus_x * hs, -(-ch // 8), -(-cw // 8), hs, vs, tq)
        )
    return out


def _decode_prog_scan(
    frame, scan_ids, scan, ss, se, ah, al, huff_dc, huff_ac,
    restart_interval, segs, coef,
):
    """One progressive scan into the coefficient store (zigzag-index
    space). Four scan kinds: DC first (Ss=Se=0, Ah=0; Huffman diff
    coding of DC>>Al), DC refine (Ah>0; one raw bit per block), AC
    first (Ss>0, Ah=0; EOBn runs + ZRL + values<<Al), AC refine (Ah>0;
    correction bits, jdphuff.c decode_mcu_AC_refine semantics)."""
    geo = {g[0]: g for g in _prog_geometry(frame)}
    comps = frame[2]
    if ss > se or se > 63:
        raise ValueError(f"jpeg: bad spectral band {ss}..{se}")
    is_dc = ss == 0
    if is_dc and se != 0:
        raise ValueError("jpeg: progressive scan mixing DC and AC bands")
    if not is_dc and len(scan_ids) != 1:
        raise ValueError("jpeg: progressive AC scans must be non-interleaved")

    # block visit order for this scan
    if len(scan_ids) > 1:
        # interleaved DC scan: MCU order over the padded grid
        order = []  # (cid, by, bx)
        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        h, w, _ = frame
        mcus_x = -(-w // (8 * hmax))
        mcus_y = -(-h // (8 * vmax))
        bycomp = {cid: (hs, vs) for cid, hs, vs, _tq in comps}
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for cid in scan_ids:
                    hs, vs = bycomp[cid]
                    for by in range(vs):
                        for bx in range(hs):
                            order.append((cid, my * vs + by, mx * hs + bx))
        per_unit = sum(bycomp[c][0] * bycomp[c][1] for c in scan_ids)
        n_units = mcus_x * mcus_y
    else:
        cid = scan_ids[0]
        _cid, _hbp, _wbp, hb, wb, *_ = geo[cid]
        order = [(cid, by, bx) for by in range(hb) for bx in range(wb)]
        per_unit = 1
        n_units = hb * wb

    per_seg = restart_interval if restart_interval else n_units
    unit = 0
    pos = 0
    for seg in segs:
        if unit >= n_units:
            break
        reader = _BitReader(seg)
        pred = {c: 0 for c in scan_ids}
        eobrun = [0]
        for _ in range(min(per_seg, n_units - unit)):
            for _k in range(per_unit):
                cid, by, bx = order[pos]
                pos += 1
                blk = coef[cid][by, bx]
                if is_dc:
                    if ah == 0:
                        td = scan[cid][0]
                        if td not in huff_dc:
                            raise ValueError("jpeg: scan references undefined table")
                        s = reader.decode(huff_dc[td])
                        diff = _extend(reader.read_bits(s), s) if s else 0
                        pred[cid] += diff
                        blk[0] = pred[cid] << al
                    else:
                        if reader.read_bit():
                            blk[0] |= 1 << al
                else:
                    ta = scan[cid][1]
                    if ta not in huff_ac:
                        raise ValueError("jpeg: scan references undefined table")
                    if ah == 0:
                        _prog_ac_first(reader, huff_ac[ta], blk, ss, se, al, eobrun)
                    else:
                        _prog_ac_refine(reader, huff_ac[ta], blk, ss, se, al, eobrun)
            unit += 1
    if unit < n_units:
        raise ValueError(f"jpeg: progressive scan ended after {unit}/{n_units} units")


def _prog_ac_first(reader, ac_tbl, blk, ss, se, al, eobrun) -> None:
    if eobrun[0] > 0:
        eobrun[0] -= 1
        return
    k = ss
    while k <= se:
        rs = reader.decode(ac_tbl)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun[0] = (1 << r) - 1
            if r:
                eobrun[0] += reader.read_bits(r)
            return
        k += r
        if k > se:
            raise ValueError("jpeg: AC run past end of band")
        blk[k] = _extend(reader.read_bits(s), s) << al
        k += 1


def _prog_ac_refine(reader, ac_tbl, blk, ss, se, al, eobrun) -> None:
    p1 = 1 << al
    m1 = -(1 << al)
    k = ss
    if eobrun[0] == 0:
        while k <= se:
            rs = reader.decode(ac_tbl)
            r, s = rs >> 4, rs & 0x0F
            newval = 0
            if s == 0:
                if r != 15:
                    eobrun[0] = 1 << r
                    if r:
                        eobrun[0] += reader.read_bits(r)
                    break
                # r == 15: skip 16 zero-history positions (correcting
                # nonzero-history coefficients passed along the way)
            else:
                if s != 1:
                    raise ValueError("jpeg: AC refinement size must be 1")
                newval = p1 if reader.read_bit() else m1
            while k <= se:
                v = int(blk[k])
                if v != 0:
                    if reader.read_bit() and (v & p1) == 0:
                        blk[k] = v + (p1 if v >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval:
                if k > se:
                    raise ValueError("jpeg: AC refinement run past end of band")
                blk[k] = newval
            k += 1
    if eobrun[0] > 0:
        # EOB run covers this block: remaining nonzero-history
        # coefficients in the band still receive correction bits
        while k <= se:
            v = int(blk[k])
            if v != 0 and reader.read_bit() and (v & p1) == 0:
                blk[k] = v + (p1 if v >= 0 else m1)
            k += 1
        eobrun[0] -= 1


def _finish_progressive(frame, coef, qt, handle_cls, adobe_transform=None):
    """All scans consumed: dequantize + IDCT every block (padded grid,
    so interleaved-DC padding blocks reconstruct too) and assemble."""
    h, w, comps = frame
    planes = {}
    for cid, hbp, wbp, _hb, _wb, _hs, _vs, tq in _prog_geometry(frame):
        if tq not in qt:
            raise ValueError("jpeg: frame references undefined quant table")
        qflat = qt[tq].reshape(-1)[_ZIGZAG].astype(np.float64)
        plane = np.zeros((hbp * 8, wbp * 8), dtype=np.float64)
        blocks = coef[cid]
        for by in range(hbp):
            for bx in range(wbp):
                dq = np.zeros(64, dtype=np.float64)
                dq[_ZIGZAG] = blocks[by, bx].astype(np.float64) * qflat
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _A.T @ dq.reshape(8, 8) @ _A + 128.0
                )
        planes[cid] = plane
    return _assemble(frame, planes, handle_cls, adobe_transform)


# -- encoder -----------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, bits: str) -> None:
        for ch in bits:
            self.acc = (self.acc << 1) | (ch == "1")
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        while self.nbits:
            self.write("1")  # pad with 1s per spec


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality curve (the one every libjpeg-compatible encoder
    uses): 50 -> Annex K verbatim, 100 -> all-ones (DCT-only loss)."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - quality * 2
    return np.clip((q * scale + 50) // 100, 1, 255).astype(np.int32)


def _mag_bits(v: int) -> tuple[int, str]:
    """(size category, magnitude bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, ""
    s = int(abs(v)).bit_length()
    code = v if v >= 0 else v + (1 << s) - 1
    return s, format(code, f"0{s}b")


def _pad_replicate(ch: np.ndarray, ph: int, pw: int) -> np.ndarray:
    h, w = ch.shape
    p = np.empty((ph, pw))
    p[:h, :w] = ch
    p[h:, :w] = ch[h - 1 : h, :]  # edge replicate (deterministic pad)
    p[:, w:] = p[:, w - 1 : w]
    return p


def _encode_block(writer, blk, qtab, dc_codes, ac_codes, pred, ci) -> None:
    coef = _A @ (blk - 128.0) @ _A.T
    qz = np.round(coef / qtab).astype(np.int64)
    zz = qz.reshape(-1)[_ZIGZAG]
    s, mb = _mag_bits(int(zz[0]) - pred[ci])
    pred[ci] = int(zz[0])
    writer.write(dc_codes[s] + mb)
    k = 1
    run = 0
    last = 63
    while last > 0 and zz[last] == 0:
        last -= 1
    while k <= last:
        if zz[k] == 0:
            run += 1
            k += 1
            continue
        while run > 15:
            writer.write(ac_codes[0xF0])  # ZRL
            run -= 16
        s, mb = _mag_bits(int(zz[k]))
        writer.write(ac_codes[(run << 4) | s] + mb)
        run = 0
        k += 1
    if last < 63:
        writer.write(ac_codes[0x00])  # EOB


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
    progressive: bool = False,
    cmyk: bool = False,
) -> bytes:
    """(h, w, c) uint8 -> baseline JFIF bytes, Annex K tables
    quality-scaled. c=1 gray, c=3 RGB (c=2/4 drop alpha first, like
    encode_netpbm). ``subsampling``: "444" (one block per component
    per MCU) or "420" (Y at 2x2 sampling, chroma box-downsampled —
    the dominant web-JPEG layout, which also exercises the decoder's
    upsampling path in-container). ``restart_interval`` > 0 emits a
    DRI segment and RSTn markers every N MCUs (resetting DC predictors
    and byte alignment — exercises the decoder's restart path; baseline
    only). ``progressive=True`` emits SOF2 with libjpeg's standard
    successive-approximation scan script (see module docstring);
    decoding it yields EXACTLY the pixels of the equivalent baseline
    encode, because the script delivers every coefficient bit.
    Deterministic: pure integer/float math, no library variance —
    safe to pin digests on."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.shape[2] == 4:
        arr = arr[:, :, :3]
    elif arr.shape[2] == 2:
        arr = arr[:, :, :1]
    h, w, c = arr.shape
    if c not in (1, 3):
        raise ValueError(f"jpeg encodes 1 or 3 channels, got {c}")
    if subsampling not in ("444", "420"):
        raise ValueError(f"jpeg: subsampling {subsampling!r} not supported")
    if cmyk:
        if c != 3:
            raise ValueError("jpeg: cmyk=True takes RGB input")
        if subsampling != "444":
            raise ValueError("jpeg: cmyk encodes 4:4:4 only")
        # RGB -> Adobe-inverted CMYK (stored v = 255 - ink; K' = max
        # channel so R = C'*K'/255 reconstructs exactly), then the
        # YCCK transform (forward YCbCr over C'M'Y') — the Photoshop
        # layout (APP14 transform=2)
        r, g, bl = (arr[:, :, k].astype(np.float64) for k in range(3))
        kp = np.maximum(np.maximum(r, g), bl)
        safe = np.maximum(kp, 1e-12)
        cp = np.where(kp > 0, r * 255.0 / safe, 0.0)
        mp = np.where(kp > 0, g * 255.0 / safe, 0.0)
        yp = np.where(kp > 0, bl * 255.0 / safe, 0.0)
        yy = 0.299 * cp + 0.587 * mp + 0.114 * yp
        cb = -0.168736 * cp - 0.331264 * mp + 0.5 * yp + 128.0
        cr = 0.5 * cp - 0.418688 * mp - 0.081312 * yp + 128.0
        chans = [yy, cb, cr, kp]
    elif c == 3:
        r, g, bl = (arr[:, :, k].astype(np.float64) for k in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * bl
        cb = -0.168736 * r - 0.331264 * g + 0.5 * bl + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * bl + 128.0
        chans = [y, cb, cr]
    else:
        chans = [arr[:, :, 0].astype(np.float64)]

    sub = subsampling == "420" and c == 3 and not cmyk
    samp = [(2, 2), (1, 1), (1, 1)] if sub else [(1, 1)] * len(chans)
    hmax = max(hs for hs, _ in samp)
    vmax = max(vs for _, vs in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    ql = _quality_scale(_Q_LUMA, quality)
    qc = _quality_scale(_Q_CHROMA, quality)
    multi = len(chans) > 1
    qtabs = [ql] + ([qc] if multi else [])
    dc_codes = [_build_codes(*_DC_LUMA_SPEC)] + (
        [_build_codes(*_DC_CHROMA_SPEC)] if multi else []
    )
    ac_codes = [_build_codes(*_AC_LUMA_SPEC)] + (
        [_build_codes(*_AC_CHROMA_SPEC)] if multi else []
    )

    planes = []
    for ci, ch in enumerate(chans):
        hs, vs = samp[ci]
        full = _pad_replicate(ch, mcus_y * vmax * 8, mcus_x * hmax * 8)
        if (hs, vs) != (hmax, vmax):
            fy, fx = vmax // vs, hmax // hs
            ph, pw = full.shape
            # box mean downsample (what libjpeg's h2v2 downsampler does)
            full = full.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
        planes.append(full)

    if progressive:
        if restart_interval:
            raise ValueError(
                "jpeg: progressive encode does not emit restart markers "
                "(decode supports them)"
            )
        return _encode_progressive(
            h, w, planes, samp, qtabs, mcus_x, mcus_y, hmax, vmax,
            dc_codes, ac_codes, adobe_ycck=cmyk,
        )

    writer = _BitWriter()
    pred = [0] * len(chans)
    mcu_idx = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                writer.flush()
                writer.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred = [0] * len(chans)
            mcu_idx += 1
            for ci, p in enumerate(planes):
                hs, vs = samp[ci]
                ti = min(ci, 1)
                for by in range(vs):
                    for bx in range(hs):
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        _encode_block(
                            writer,
                            p[y0 : y0 + 8, x0 : x0 + 8],
                            qtabs[ti],
                            dc_codes[ti],
                            ac_codes[ti],
                            pred,
                            ci,
                        )
    writer.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    out = bytearray(b"\xff\xd8")  # SOI
    if cmyk:
        # Adobe APP14 (version 100, transform 2 = YCCK); CMYK files
        # carry the Adobe marker instead of JFIF (JFIF is 1/3-comp)
        out += seg(0xEE, b"Adobe" + bytes([0, 100, 0, 0, 0, 0, 2]))
    else:
        out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for ti, q in enumerate(qtabs):
        zz = np.zeros(64, dtype=np.uint8)
        zz[:] = q.reshape(-1)[_ZIGZAG]
        out += seg(0xDB, bytes([ti]) + zz.tobytes())
    nc = len(chans)
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([nc])
    for ci in range(nc):
        hs, vs = samp[ci]
        sof += bytes([ci + 1, (hs << 4) | vs, min(ci, 1)])
    out += seg(0xC0, sof)
    specs = [(_DC_LUMA_SPEC, 0x00), (_AC_LUMA_SPEC, 0x10)]
    if nc > 1:
        specs += [(_DC_CHROMA_SPEC, 0x01), (_AC_CHROMA_SPEC, 0x11)]
    for (bits, vals), tcth in specs:
        out += seg(0xC4, bytes([tcth]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytes([nc])
    for ci in range(nc):
        t = min(ci, 1)
        sos += bytes([ci + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# -- progressive encoder (T.81 Annex G, jcphuff.c semantics) -----------------


def _emit_ac_first_block(writer, zz, ss, se, al, ac_codes) -> None:
    """AC first pass (Ah=0): code sign(c)*(|c|>>Al) for the band, ZRL
    for 16-zero runs, EOB0 when the band ends in zeros (the encoder
    never accumulates EOBn>0 runs — Annex K tables carry no EOBn
    symbols; spec-legal, see module docstring)."""
    run = 0
    for k in range(ss, se + 1):
        t = int(zz[k])
        a = abs(t) >> al
        if a == 0:
            run += 1
            continue
        while run > 15:
            writer.write(ac_codes[0xF0])  # ZRL
            run -= 16
        s, mb = _mag_bits(a if t >= 0 else -a)
        writer.write(ac_codes[(run << 4) | s] + mb)
        run = 0
    if run > 0:
        writer.write(ac_codes[0x00])  # EOB0


def _emit_ac_refine_block(writer, zz, ss, se, al, ac_codes) -> None:
    """AC refinement pass (Ah=Al+1): newly-significant coefficients
    (|c|>>Al == 1) as (run,1)+sign, correction bits for already-
    significant ones BUFFERED until the next symbol (jcphuff.c order —
    the decoder reads them while advancing past those positions), EOB0
    flush per block."""
    absv = [abs(int(zz[k])) >> al for k in range(64)]
    eob = 0  # index of the LAST newly-significant coefficient (0 if none)
    for k in range(ss, se + 1):
        if absv[k] == 1:
            eob = k
    r = 0
    br: list[str] = []
    for k in range(ss, se + 1):
        temp = absv[k]
        if temp == 0:
            r += 1
            continue
        while r > 15 and k <= eob:
            writer.write(ac_codes[0xF0])
            r -= 16
            for bit in br:
                writer.write(bit)
            br = []
        if temp > 1:
            # already significant: one correction bit, run unaffected
            br.append("1" if (temp & 1) else "0")
            continue
        writer.write(ac_codes[(r << 4) | 1])
        writer.write("1" if int(zz[k]) >= 0 else "0")
        for bit in br:
            writer.write(bit)
        br = []
        r = 0
    if r > 0 or br:
        writer.write(ac_codes[0x00])
        for bit in br:
            writer.write(bit)


def _encode_progressive(
    h, w, planes, samp, qtabs, mcus_x, mcus_y, hmax, vmax, dc_codes, ac_codes,
    adobe_ycck=False,
):
    nc = len(planes)
    # quantized zigzag coefficients per component, padded MCU grid
    coefs = []
    true_dims = []
    for ci, p in enumerate(planes):
        hs, vs = samp[ci]
        q = qtabs[min(ci, 1)].astype(np.float64)
        hbp, wbp = p.shape[0] // 8, p.shape[1] // 8
        zz = np.zeros((hbp, wbp, 64), dtype=np.int64)
        for by in range(hbp):
            for bx in range(wbp):
                c8 = _A @ (p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0) @ _A.T
                zz[by, bx] = np.round(c8 / q).astype(np.int64).reshape(-1)[_ZIGZAG]
        coefs.append(zz)
        cw = -(-w * hs // hmax)
        ch = -(-h * vs // vmax)
        true_dims.append((-(-ch // 8), -(-cw // 8)))

    out = bytearray(b"\xff\xd8")
    if adobe_ycck:
        out += _seg(0xEE, b"Adobe" + bytes([0, 100, 0, 0, 0, 0, 2]))
    else:
        out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for ti, q in enumerate(qtabs):
        z = np.zeros(64, dtype=np.uint8)
        z[:] = q.reshape(-1)[_ZIGZAG]
        out += _seg(0xDB, bytes([ti]) + z.tobytes())
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([nc])
    for ci in range(nc):
        hs, vs = samp[ci]
        sof += bytes([ci + 1, (hs << 4) | vs, min(ci, 1)])
    out += _seg(0xC2, sof)  # SOF2: progressive DCT
    specs = [(_DC_LUMA_SPEC, 0x00), (_AC_LUMA_SPEC, 0x10)]
    if nc > 1:
        specs += [(_DC_CHROMA_SPEC, 0x01), (_AC_CHROMA_SPEC, 0x11)]
    for (bits, vals), tcth in specs:
        out += _seg(0xC4, bytes([tcth]) + bytes(bits) + bytes(vals))

    # libjpeg's standard script (jcparam.c jpeg_simple_progression)
    if nc == 4:
        script = [
            ([0, 1, 2, 3], 0, 0, 0, 1),
            ([0], 1, 63, 0, 1),
            ([1], 1, 63, 0, 1),
            ([2], 1, 63, 0, 1),
            ([3], 1, 63, 0, 1),
            ([0, 1, 2, 3], 0, 0, 1, 0),
            ([0], 1, 63, 1, 0),
            ([1], 1, 63, 1, 0),
            ([2], 1, 63, 1, 0),
            ([3], 1, 63, 1, 0),
        ]
    elif nc == 3:
        script = [
            ([0, 1, 2], 0, 0, 0, 1),  # DC first, Al=1, interleaved
            ([0], 1, 5, 0, 2),        # Y AC low band, Al=2
            ([2], 1, 63, 0, 1),       # Cr AC, Al=1
            ([1], 1, 63, 0, 1),       # Cb AC, Al=1
            ([0], 6, 63, 0, 2),       # Y AC high band, Al=2
            ([0], 1, 63, 2, 1),       # Y AC refine 2->1
            ([0, 1, 2], 0, 0, 1, 0),  # DC refine 1->0
            ([2], 1, 63, 1, 0),       # Cr AC refine 1->0
            ([1], 1, 63, 1, 0),       # Cb AC refine 1->0
            ([0], 1, 63, 1, 0),       # Y AC refine 1->0
        ]
    else:
        script = [
            ([0], 0, 0, 0, 1),
            ([0], 1, 5, 0, 2),
            ([0], 6, 63, 0, 2),
            ([0], 1, 63, 2, 1),
            ([0], 0, 0, 1, 0),
            ([0], 1, 63, 1, 0),
        ]

    for comp_idx, ss, se, ah, al in script:
        sos = bytes([len(comp_idx)])
        for ci in comp_idx:
            t = min(ci, 1)
            sos += bytes([ci + 1, (t << 4) | t])
        sos += bytes([ss, se, (ah << 4) | al])
        writer = _BitWriter()
        if ss == 0:  # DC scan
            if len(comp_idx) > 1:  # interleaved: padded MCU order
                pred = [0] * nc
                for my in range(mcus_y):
                    for mx in range(mcus_x):
                        for ci in comp_idx:
                            hs, vs = samp[ci]
                            for by in range(vs):
                                for bx in range(hs):
                                    dc = int(coefs[ci][my * vs + by, mx * hs + bx, 0])
                                    if ah == 0:
                                        v = dc >> al
                                        s, mb = _mag_bits(v - pred[ci])
                                        pred[ci] = v
                                        writer.write(dc_codes[min(ci, 1)][s] + mb)
                                    else:
                                        writer.write(str((dc >> al) & 1))
            else:  # non-interleaved DC: true block dims
                ci = comp_idx[0]
                hb, wb = true_dims[ci]
                pred0 = 0
                for by in range(hb):
                    for bx in range(wb):
                        dc = int(coefs[ci][by, bx, 0])
                        if ah == 0:
                            v = dc >> al
                            s, mb = _mag_bits(v - pred0)
                            pred0 = v
                            writer.write(dc_codes[min(ci, 1)][s] + mb)
                        else:
                            writer.write(str((dc >> al) & 1))
        else:  # AC scan: non-interleaved, true block dims
            ci = comp_idx[0]
            hb, wb = true_dims[ci]
            codes = ac_codes[min(ci, 1)]
            for by in range(hb):
                for bx in range(wb):
                    blk = coefs[ci][by, bx]
                    if ah == 0:
                        _emit_ac_first_block(writer, blk, ss, se, al, codes)
                    else:
                        _emit_ac_refine_block(writer, blk, ss, se, al, codes)
        writer.flush()
        out += _seg(0xDA, sos)
        out += writer.out
    out += b"\xff\xd9"
    return bytes(out)

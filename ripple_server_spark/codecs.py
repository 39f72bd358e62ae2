"""Image codecs for the multimodal kernels: Pillow when installed,
plus a pure-numpy netpbm (PPM ``P6`` / PGM ``P5``) codec that needs no
media library at all.

Why netpbm: the container ships no media libraries, so the kernels'
real (``fake=False``) paths used to raise ``NotImplementedError``
unconditionally here — the one part of the multimodal surface whose
real branch never executed in CI. Netpbm is a public, uncompressed
format (header ``P6\\n<width> <height>\\n<maxval>\\n`` followed by raw
big-endian RGB samples; ``P5`` is single-channel; ``#`` comments are
legal anywhere in the header whitespace) simple enough to decode with
numpy alone. With it, decode -> resize -> embed -> re-encode runs REAL
end-to-end in this environment — the same code shape a Pillow/JPEG
deployment executes — while compressed formats still require Pillow.

Both backends hide behind :func:`open_image`, which returns a uniform
handle; kernels never branch on the backend. maxval > 255 (16-bit
samples) is rejected rather than silently squashed.
"""

from __future__ import annotations

import io

import numpy as np

_GRAY_WEIGHTS = (0.299, 0.587, 0.114)  # ITU-R 601 luma, what PIL "L" uses


class ImageHandle:
    """Uniform decoded-image handle over the Pillow and numpy backends.

    ``arr`` is always (height, width, channels) uint8 — normalizing at
    the boundary keeps every kernel backend-agnostic.
    """

    def __init__(self, arr: np.ndarray, prefer_png: bool = False):
        if arr.ndim == 2:
            arr = arr[:, :, None]
        self.arr = np.ascontiguousarray(arr, dtype=np.uint8)
        self._prefer_png = prefer_png

    @property
    def width(self) -> int:
        return self.arr.shape[1]

    @property
    def height(self) -> int:
        return self.arr.shape[0]

    @property
    def channels(self) -> int:
        return self.arr.shape[2]

    def resize(self, w: int, h: int) -> "ImageHandle":
        """Nearest-neighbor resample (pixel-center rule): deterministic,
        allocation-bounded by the TARGET dims — the property that makes
        thumbnailing at scale an output-bounded pass."""
        if w <= 0 or h <= 0:
            raise ValueError(f"resize target must be positive, got {w}x{h}")
        src_h, src_w = self.arr.shape[:2]
        rows = np.minimum(((np.arange(h) + 0.5) * src_h / h).astype(np.int64), src_h - 1)
        cols = np.minimum(((np.arange(w) + 0.5) * src_w / w).astype(np.int64), src_w - 1)
        return ImageHandle(self.arr[rows[:, None], cols[None, :]], self._prefer_png)

    def gray_row(self, dim: int) -> list[float]:
        """Model-free visual feature: mean luma of ``dim`` vertical
        column bands, normalized to [0,1] — every pixel contributes
        (an image differing only off-center still embeds differently;
        a center-row sample would be blind to it).

        Memory shape: rows are reduced FIRST (``sum(axis=0)`` on the
        uint8 array, output is one W x C row), so no full-image float
        copy is ever allocated — O(W*H) reads, O(W) scratch.
        """
        sums = self.arr.sum(axis=0, dtype=np.float64)  # (w, c)
        if self.channels >= 3:
            col_luma = sums[:, :3] @ np.asarray(_GRAY_WEIGHTS)
        else:
            col_luma = sums[:, 0]
        w = col_luma.shape[0]
        # band b covers columns [floor(b*w/dim), floor((b+1)*w/dim));
        # reduceat needs strictly valid starts, so clamp for dim > w
        starts = np.minimum((np.arange(dim) * w) // dim, w - 1)
        band_sums = np.add.reduceat(col_luma, starts)
        ends = np.minimum(((np.arange(dim) + 1) * w) // dim, w)
        widths = np.maximum(ends - starts, 1)
        # reduceat folds equal adjacent starts (dim > w) into width-1
        # bands automatically; duplicated starts re-read the same column
        return [
            float(s) / (wd * self.height * 255.0)
            for s, wd in zip(band_sums, widths)
        ]

    def to_bytes(self) -> bytes:
        """Re-encode: PNG when the Pillow backend decoded this image
        (keeps the historical real-path output format), netpbm raw
        otherwise — always losslessly re-decodable by open_image."""
        if self._prefer_png:
            arr = self.arr[:, :, 0] if self.channels == 1 else self.arr
            sink = io.BytesIO()
            _PIL_IMAGE.fromarray(arr).save(sink, format="PNG")  # prefer_png implies Pillow present
            return sink.getvalue()
        return encode_netpbm(self.arr)


def encode_netpbm(arr: np.ndarray) -> bytes:
    """(h, w, c) uint8 -> P6 (c==3) or P5 (c==1) bytes per the public
    netpbm spec; 2- or 4-channel arrays drop to luma/RGB first (netpbm
    has no alpha)."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    if c == 4:
        arr, c = arr[:, :, :3], 3
    elif c == 2:
        arr, c = arr[:, :, :1], 1
    if c not in (1, 3):
        raise ValueError(f"netpbm encodes 1 or 3 channels, got {c}")
    magic = b"P6" if c == 3 else b"P5"
    return magic + b"\n%d %d\n255\n" % (w, h) + arr.tobytes()


def parse_netpbm(b: bytes) -> ImageHandle | None:
    """Decode P5/P6 bytes -> ImageHandle; None when the magic number
    says this is not netpbm (lets callers fall through to their
    not-decodable error); ValueError on malformed/truncated netpbm."""
    if len(b) < 2 or b[:1] != b"P" or b[1:2] not in (b"5", b"6"):
        return None
    # the spec requires whitespace (or a comment) after the magic; a
    # glued header like b"P63 3..." means a byte was dropped — width
    # would silently mis-parse as 33, so refuse it
    if len(b) < 3 or not (b[2:3].isspace() or b[2:3] == b"#"):
        raise ValueError("netpbm: magic number not followed by whitespace")
    channels = 3 if b[1:2] == b"6" else 1

    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        # skip whitespace and '#' comments (legal anywhere in the header)
        while pos < len(b) and (b[pos : pos + 1].isspace() or b[pos : pos + 1] == b"#"):
            if b[pos : pos + 1] == b"#":
                nl = b.find(b"\n", pos)
                if nl < 0:
                    raise ValueError("netpbm: unterminated header comment")
                pos = nl
            pos += 1
        start = pos
        while pos < len(b) and b[pos : pos + 1].isdigit():
            pos += 1
        if pos == start:
            raise ValueError("netpbm: malformed header")
        fields.append(int(b[start:pos]))
    w, h, maxval = fields
    if w <= 0 or h <= 0:
        raise ValueError(f"netpbm: bad dimensions {w}x{h}")
    if maxval != 255:
        raise ValueError(f"netpbm: only maxval=255 supported, got {maxval}")
    # exactly ONE whitespace byte separates header from raster (spec);
    # anything else means the raster offset is wrong — refuse rather
    # than decode misaligned garbage pixels
    if pos >= len(b) or not b[pos : pos + 1].isspace():
        raise ValueError("netpbm: missing whitespace between header and raster")
    pos += 1
    n = w * h * channels
    raster = b[pos : pos + n]
    if len(raster) < n:
        raise ValueError(f"netpbm: truncated raster ({len(raster)} < {n} bytes)")
    arr = np.frombuffer(raster, dtype=np.uint8, count=n).reshape(h, w, channels)
    return ImageHandle(arr)


# Backend resolved ONCE at import: a failed `import PIL` is not cached
# by Python, so retrying it per payload costs a sys.path scan per
# image (~10x the netpbm decode itself for small payloads).
try:
    import PIL.Image as _PIL_IMAGE  # noqa: N812
except ImportError:
    _PIL_IMAGE = None


def open_image(b: bytes) -> ImageHandle:
    """Real decode with backend fallback: Pillow when installed (any
    format it knows), else the numpy netpbm codec. A netpbm payload
    that a given Pillow release refuses (ppm plugin strictness varies)
    still falls back to the numpy codec, so installing Pillow never
    breaks payloads that decoded without it. Anything else raises the
    documented codec boundary."""
    if _PIL_IMAGE is not None:
        try:
            im = _PIL_IMAGE.open(io.BytesIO(b))
            if im.mode not in ("L", "RGB", "RGBA"):
                im = im.convert("RGB")
            return ImageHandle(np.asarray(im), prefer_png=True)
        except Exception:
            pbm = parse_netpbm(b)
            if pbm is not None:
                return pbm
            raise
    im = parse_netpbm(b)
    if im is None:
        raise NotImplementedError(
            "payload is not netpbm (P5/P6) and no media library is "
            "installed: compressed formats need Pillow (pip install pillow)"
        )
    return im

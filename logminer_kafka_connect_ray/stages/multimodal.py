"""Multimodal columns: image / audio / video as opaque binary columns.

Media payloads are carried as Arrow ``binary`` columns with typed
metadata; decode / feature-extract / resize / frame-sample run as
actor-pool ``map_batches`` stages (codec state loaded once per actor in
``__init__``).  The Ray-side plumbing -- schemas, batch sizing for wide
binary rows, actor signatures, output layout -- is real and tested.

Codec status (round 3):

* **BMP is REAL**: a dependency-free encoder/decoder for uncompressed
  BI_RGB Windows bitmaps (BITMAPFILEHEADER + BITMAPINFOHEADER, 24/32
  bpp, bottom-up or top-down, 4-byte row padding) implemented here in
  numpy -- ``encode_bmp`` / ``decode_bmp``.  The image stages decode
  and resize real BMP bytes end-to-end, and ``media_pipeline`` (the
  driver-gated query) runs on real BMP containers.
* compressed formats (JPEG/PNG) and audio/video codecs (libsndfile /
  ffmpeg) are NOT in this container -> honest ``NotImplementedError``,
  with the deterministic FAKE containers below standing in for the
  plumbing tests.

FAKE container formats (deterministic, self-describing):

* image: ``b"FIMG" + w:uint16 + h:uint16 + c:uint8 + pixel bytes``
* audio: ``b"FAUD" + rate:uint32 + n:uint32 + int16 samples``
* video: ``b"FVID" + n_frames:uint16 + <image payload per frame>``

Scale note: a media row can be 10-100 KB+, so these stages should run
with a small ``batch_size`` (config ``media_batch_size``) so
batch x concurrency fits worker heaps; blocks of binary columns are
kept in ``batch_format="pyarrow"`` end-to-end (pandas would copy to
object dtype).
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),          # 'image' | 'audio' | 'video'
        ("payload", pa.binary()),
        ("meta", pa.string()),          # JSON sidecar metadata
    ]
)

#: recommended map_batches batch_size for media stages (wide rows)
MEDIA_BATCH_SIZE = 256


# ---------------------------------------------------------------------------
# FAKE payload codecs (deterministic stand-ins; see module doc)
# ---------------------------------------------------------------------------
def encode_fake_image(w: int, h: int, c: int = 3, seed: int = 0) -> bytes:
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=w * h * c, dtype=np.uint8).tobytes()
    return b"FIMG" + struct.pack("<HHB", w, h, c) + px


def encode_fake_audio(rate: int, n: int, seed: int = 0) -> bytes:
    rng = np.random.default_rng(seed)
    samples = rng.integers(-32768, 32767, size=n, dtype=np.int16).tobytes()
    return b"FAUD" + struct.pack("<II", rate, n) + samples


def encode_fake_video(frames: list[bytes]) -> bytes:
    return b"FVID" + struct.pack("<H", len(frames)) + b"".join(
        struct.pack("<I", len(f)) + f for f in frames
    )


def _decode_fake_image(b: bytes) -> tuple[int, int, int, np.ndarray]:
    w, h, c = struct.unpack_from("<HHB", b, 4)
    px = np.frombuffer(b, dtype=np.uint8, count=w * h * c, offset=9)
    return w, h, c, px.reshape(h, w, c)


# ---------------------------------------------------------------------------
# REAL codec: uncompressed BI_RGB Windows bitmap (pure numpy)
# ---------------------------------------------------------------------------
def encode_bmp(px: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bpp bottom-up BI_RGB .bmp bytes.

    Standard layout: 14-byte BITMAPFILEHEADER + 40-byte
    BITMAPINFOHEADER, pixel rows stored bottom-up in BGR order, each
    row padded to a 4-byte boundary."""
    px = np.ascontiguousarray(px, dtype=np.uint8)
    h, w, c = px.shape
    if c != 3:
        raise ValueError("encode_bmp expects (h, w, 3) RGB")
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    data = rows.tobytes()
    file_size = 14 + 40 + len(data)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return header + info + data


def decode_bmp(b: bytes) -> tuple[int, int, int, np.ndarray]:
    """BI_RGB .bmp bytes -> (w, h, channels, (h, w, c) uint8 RGB[A]).

    Supports the common uncompressed forms: BITMAPINFOHEADER (or
    larger V4/V5 headers), 24/32 bpp, positive (bottom-up) or negative
    (top-down) height.  Vectorized: one frombuffer + strided reshape."""
    if b[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_off,) = struct.unpack_from("<I", b, 10)
    (hdr_size,) = struct.unpack_from("<I", b, 14)
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER bitmaps not supported")
    w, h_raw = struct.unpack_from("<ii", b, 18)
    bpp, = struct.unpack_from("<H", b, 28)
    comp, = struct.unpack_from("<I", b, 30)
    if comp != 0 or bpp not in (24, 32):
        raise NotImplementedError(
            f"only uncompressed 24/32-bpp BI_RGB supported (bpp={bpp}, "
            f"compression={comp})"
        )
    bottom_up = h_raw > 0
    h = abs(h_raw)
    c = bpp // 8
    stride = (w * c + 3) & ~3
    raw = np.frombuffer(b, np.uint8, count=h * stride, offset=data_off)
    rows = raw.reshape(h, stride)[:, : w * c].reshape(h, w, c)
    if bottom_up:
        rows = rows[::-1]
    # BGR(A) -> RGB(A)
    rgb = rows[:, :, [2, 1, 0] + ([3] if c == 4 else [])]
    return w, h, c, np.ascontiguousarray(rgb)


# ---------------------------------------------------------------------------
# Stages
# ---------------------------------------------------------------------------
class ImageDecodeStage:
    """payload -> (width, height, channels, mean_luma).

    REAL for BMP (the pure-numpy ``decode_bmp`` above) and for the
    FIMG fake container; compressed formats (JPEG/PNG/...) need an
    image library that is not in this container ->
    ``NotImplementedError``.  Actor-pool stage: pass the CLASS to
    ``map_batches`` with ``concurrency=N, batch_size=MEDIA_BATCH_SIZE``.
    """

    def __init__(self):
        try:  # pragma: no cover - not installed here
            from PIL import Image  # noqa: F401

            self._pil = True
        except ImportError:
            self._pil = False

    def _decode(self, b: bytes):
        if b[:2] == b"BM":
            return decode_bmp(b)
        if b[:4] == b"FIMG":
            return _decode_fake_image(b)
        raise NotImplementedError(
            "compressed image formats need PIL, which is not available "
            "in this environment; supported payloads: BMP (real codec) "
            "and the FIMG fake container (stages/multimodal.py)"
        )

    def __call__(self, t: pa.Table) -> pa.Table:
        ws, hs, cs, luma = [], [], [], []
        for b in t.column("payload").to_pylist():
            w, h, c, px = self._decode(b)
            ws.append(w)
            hs.append(h)
            cs.append(c)
            luma.append(float(px.mean()))
        return pa.table(
            {
                "media_id": t.column("media_id"),
                "width": pa.array(ws, pa.int32()),
                "height": pa.array(hs, pa.int32()),
                "channels": pa.array(cs, pa.int32()),
                "mean_luma": pa.array(luma, pa.float64()),
            }
        )


class ImageResizeStage:
    """payload -> payload resized to (out_w, out_h), nearest-neighbor,
    re-encoded in the SAME container it arrived in (BMP in -> BMP out,
    FIMG in -> FIMG out); compressed formats: NotImplementedError."""

    def __init__(self, out_w: int, out_h: int):
        self.out_w = out_w
        self.out_h = out_h

    def __call__(self, t: pa.Table) -> pa.Table:
        out = []
        for b in t.column("payload").to_pylist():
            if b[:2] == b"BM":
                w, h, c, px = decode_bmp(b)
                is_bmp = True
            elif b[:4] == b"FIMG":
                w, h, c, px = _decode_fake_image(b)
                is_bmp = False
            else:
                raise NotImplementedError(
                    "compressed image resize requires PIL; supported: "
                    "BMP (real codec), FIMG fake container"
                )
            xi = (np.arange(self.out_w) * w // self.out_w)
            yi = (np.arange(self.out_h) * h // self.out_h)
            res = px[yi][:, xi]
            if is_bmp:
                out.append(encode_bmp(res[:, :, :3]))
            else:
                out.append(
                    b"FIMG"
                    + struct.pack("<HHB", self.out_w, self.out_h, c)
                    + res.tobytes()
                )
        return pa.table(
            {
                "media_id": t.column("media_id"),
                "payload": pa.array(out, pa.binary()),
            }
        )


class AudioFeatureStage:
    """payload -> (sample_rate, n_samples, rms) features."""

    def __call__(self, t: pa.Table) -> pa.Table:
        rates, ns, rms = [], [], []
        for b in t.column("payload").to_pylist():
            if b[:4] != b"FAUD":
                raise NotImplementedError(
                    "real audio decoding requires libsndfile/soundfile"
                )
            rate, n = struct.unpack_from("<II", b, 4)
            samples = np.frombuffer(b, dtype=np.int16, count=n, offset=12)
            rates.append(rate)
            ns.append(n)
            rms.append(float(np.sqrt(np.mean(samples.astype(np.float64) ** 2))))
        return pa.table(
            {
                "media_id": t.column("media_id"),
                "sample_rate": pa.array(rates, pa.int32()),
                "n_samples": pa.array(ns, pa.int64()),
                "rms": pa.array(rms, pa.float64()),
            }
        )


class FrameSampleStage:
    """video payload -> one row per sampled frame (every k-th), frame
    re-emitted as an image payload: a flat_map-shaped stage expressed
    as map_batches returning more rows than it received."""

    def __init__(self, every_k: int = 2):
        self.every_k = every_k

    def __call__(self, t: pa.Table) -> pa.Table:
        mids, fidx, frames = [], [], []
        for mid, b in zip(
            t.column("media_id").to_pylist(), t.column("payload").to_pylist()
        ):
            if b[:4] != b"FVID":
                raise NotImplementedError("real video demux requires ffmpeg")
            (n_frames,) = struct.unpack_from("<H", b, 4)
            off = 6
            for i in range(n_frames):
                (flen,) = struct.unpack_from("<I", b, off)
                off += 4
                frame = b[off : off + flen]
                off += flen
                if i % self.every_k == 0:
                    mids.append(mid)
                    fidx.append(i)
                    frames.append(frame)
        return pa.table(
            {
                "media_id": pa.array(mids, pa.int64()),
                "frame_index": pa.array(fidx, pa.int32()),
                "payload": pa.array(frames, pa.binary()),
            }
        )

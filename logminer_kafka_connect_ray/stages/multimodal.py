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
  and resize real BMP bytes end-to-end.
* **WAV is REAL**: canonical RIFF/WAVE 16-bit PCM (mono or
  interleaved multi-channel), chunk-walking decoder that skips
  unknown chunks and word-alignment pad bytes -- ``encode_wav`` /
  ``decode_wav``.  ``AudioFeatureStage`` computes features from real
  WAV bytes.
* **AVI is REAL** (uncompressed): RIFF 'AVI ' with hdrl
  (avih + strl{strh 'vids'/'DIB ', strf BITMAPINFOHEADER}) and a movi
  list of ``00db`` raw-DIB frames -- ``encode_avi`` / ``decode_avi``.
  ``FrameSampleStage`` demuxes real AVI and re-emits sampled frames
  as real BMP payloads, so the video->image handoff is byte-real.
  ``media_pipeline`` (the driver-gated query) runs on real BMP + AVI
  + WAV containers end-to-end.
* **PNG is REAL** (8-bit grey / truecolor / palette / +alpha): chunk
  walker + stdlib ``zlib`` inflate + numpy scanline un-filtering
  (None/Sub/Up vectorized, Sub as an exact cumsum-mod-256;
  Average/Paeth per-pixel along x only); palette indices map through
  PLTE with ``tRNS`` widening to RGBA -- ``encode_png`` /
  ``encode_png_palette`` / ``encode_png_grey`` / ``decode_png``.
  16-bit/interlaced raise with the feature named.
* **JPEG is REAL** (baseline sequential, round 5): a pure-numpy
  ITU-T T.81 codec in ``stages/jpeg.py`` -- marker parser, canonical
  Huffman with flat 16-bit prefix LUTs, vectorized (n,8,8) DCT/IDCT
  stacks, 4:4:4/4:2:2/4:2:0 sampling, restart intervals, JFIF color
  transform; encoder emits standard Annex K tables.  Progressive /
  arithmetic / 12-bit raise with the feature named.
* remaining transform-coded formats (WebP/MP3/H.264 ...) need codec
  libraries that are NOT in this container -> honest
  ``NotImplementedError``, with the deterministic FAKE containers
  below retained for plumbing tests.

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
# REAL codec: PNG, 8-bit truecolor (pure numpy + stdlib zlib)
# ---------------------------------------------------------------------------
_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png(px: np.ndarray) -> bytes:
    """(h, w, 3|4) uint8 -> real PNG bytes (8-bit truecolor / +alpha,
    filter 0 scanlines, one zlib IDAT).  Readable by any PNG viewer."""
    import struct as _s
    import zlib

    px = np.ascontiguousarray(px, dtype=np.uint8)
    h, w, c = px.shape
    if c not in (3, 4):
        raise ValueError("encode_png expects (h, w, 3|4)")
    ctype = 2 if c == 3 else 6

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            _s.pack(">I", len(data)) + tag + data
            + _s.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = _s.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    raw = np.zeros((h, 1 + w * c), np.uint8)
    raw[:, 1:] = px.reshape(h, w * c)  # filter byte 0 per scanline
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw.tobytes(), 6))
        + chunk(b"IEND", b"")
    )


def encode_png_palette(
    idx: np.ndarray, palette: np.ndarray, trns: np.ndarray | None = None
) -> bytes:
    """(h, w) uint8 indices + (n, 3) palette (+ optional per-entry
    alpha) -> real color-type-3 PNG bytes (PLTE [+ tRNS] + filter-0
    IDAT).  The fixture encoder for the palette decode path."""
    import struct as _s
    import zlib

    idx = np.ascontiguousarray(idx, dtype=np.uint8)
    palette = np.ascontiguousarray(palette, dtype=np.uint8)
    h, w = idx.shape
    if palette.ndim != 2 or palette.shape[1] != 3 or len(palette) > 256:
        raise ValueError("palette must be (n<=256, 3) uint8")

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            _s.pack(">I", len(data)) + tag + data
            + _s.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = _s.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    raw = np.zeros((h, 1 + w), np.uint8)
    raw[:, 1:] = idx
    out = _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"PLTE", palette.tobytes())
    if trns is not None:
        out += chunk(b"tRNS", np.ascontiguousarray(trns, np.uint8).tobytes())
    return out + chunk(b"IDAT", zlib.compress(raw.tobytes(), 6)) + chunk(
        b"IEND", b""
    )


def encode_png_grey(px: np.ndarray) -> bytes:
    """(h, w) uint8 -> real color-type-0 (greyscale) PNG bytes."""
    import struct as _s
    import zlib

    px = np.ascontiguousarray(px, dtype=np.uint8)
    h, w = px.shape

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            _s.pack(">I", len(data)) + tag + data
            + _s.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = _s.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = np.zeros((h, 1 + w), np.uint8)
    raw[:, 1:] = px
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw.tobytes(), 6))
        + chunk(b"IEND", b"")
    )


def decode_png(b: bytes) -> tuple[int, int, int, np.ndarray]:
    """Real PNG bytes -> (w, h, channels, (h, w, c) uint8).

    Pure numpy + stdlib ``zlib``: walks the chunk stream, inflates the
    concatenated IDATs, and un-filters scanlines.  Supports the web
    forms at 8-bit depth, non-interlaced: greyscale (color type 0,
    returns c=1), truecolor (2), palette (3 -- indices mapped through
    PLTE, with a ``tRNS`` chunk widening to RGBA), and
    truecolor+alpha (6).  Filters: None/Up are vectorized whole-row
    ops, Sub is an exact per-row ``cumsum mod 256`` over pixel
    groups, Average/Paeth fall back to a per-PIXEL loop along x only
    (vectorized across channels) -- the recurrence on the
    left-neighbor reconstruction is inherently sequential.
    16-bit/interlaced raise ``NotImplementedError`` with the exact
    unsupported feature named."""
    import struct as _s
    import zlib

    if b[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    w = h = depth = ctype = interlace = None
    idat = []
    plte = None
    trns = None
    while pos + 8 <= len(b):
        (ln,) = _s.unpack_from(">I", b, pos)
        tag = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # skip crc
        if tag == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = _s.unpack(
                ">IIBBBBB", data
            )
        elif tag == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif tag == b"tRNS":
            trns = np.frombuffer(data, np.uint8)
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    if depth != 8 or ctype not in (0, 2, 3, 6) or interlace != 0:
        raise NotImplementedError(
            f"PNG depth={depth} color_type={ctype} interlace={interlace} "
            "not supported (8-bit grey/truecolor/palette/truecolor+alpha, "
            "non-interlaced only)"
        )
    c = {0: 1, 2: 3, 3: 1, 6: 4}[ctype]
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    stride = 1 + w * c
    if len(raw) != h * stride:
        raise ValueError("PNG IDAT length mismatch")
    rows = raw.reshape(h, stride)
    filt = rows[:, 0]
    cur = rows[:, 1:].astype(np.int64).reshape(h, w, c)
    out = np.zeros((h, w, c), np.int64)
    for y in range(h):
        f = int(filt[y])
        up = out[y - 1] if y else np.zeros((w, c), np.int64)
        if f == 0:
            out[y] = cur[y]
        elif f == 1:  # Sub: recon = cumsum of raw over pixels, mod 256
            out[y] = np.cumsum(cur[y], axis=0) % 256
        elif f == 2:  # Up
            out[y] = (cur[y] + up) % 256
        elif f == 3:  # Average
            left = np.zeros(c, np.int64)
            for x in range(w):
                left = (cur[y, x] + (left + up[x]) // 2) % 256
                out[y, x] = left
        elif f == 4:  # Paeth
            left = np.zeros(c, np.int64)
            ul = np.zeros(c, np.int64)
            for x in range(w):
                a, bb, cc = left, up[x], ul
                p = a + bb - cc
                pa_, pb, pcq = np.abs(p - a), np.abs(p - bb), np.abs(p - cc)
                pred = np.where(
                    (pa_ <= pb) & (pa_ <= pcq), a, np.where(pb <= pcq, bb, cc)
                )
                left = (cur[y, x] + pred) % 256
                out[y, x] = left
                ul = bb
        else:
            raise ValueError(f"PNG filter {f} invalid")
    px = out.astype(np.uint8)
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE chunk")
        idx = px[:, :, 0]
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("palette index out of range")
        rgb = plte[idx]  # (h, w, 3)
        if trns is not None:
            alpha = np.full(len(plte), 255, np.uint8)
            alpha[: len(trns)] = trns
            return w, h, 4, np.dstack([rgb, alpha[idx]])
        return w, h, 3, rgb
    return w, h, c, px


# ---------------------------------------------------------------------------
# REAL codec: RIFF/WAVE 16-bit PCM (pure numpy)
# ---------------------------------------------------------------------------
def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """int16 PCM samples ((n,) mono or (n, ch) interleaved) -> canonical
    RIFF/WAVE bytes (fmt chunk 1=PCM, 16-bit, then data chunk)."""
    samples = np.asarray(samples, dtype="<i2")
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    data = np.ascontiguousarray(samples).tobytes()  # frame-interleaved
    block_align = ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * block_align, block_align, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(b: bytes) -> tuple[int, int, np.ndarray]:
    """RIFF/WAVE bytes -> (rate, channels, (n_frames, ch) int16).

    Walks the chunk list (skipping unknown chunks such as LIST/INFO and
    the word-alignment pad byte after odd-sized chunks); 16-bit
    integer PCM only -- compressed/float WAVs raise."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    off, rate, ch, data = 12, None, None, None
    while off + 8 <= len(b):
        cid, size = struct.unpack_from("<4sI", b, off)
        off += 8
        if cid == b"fmt ":
            audio_fmt, ch, rate, _, _, bits = struct.unpack_from("<HHIIHH", b, off)
            if audio_fmt != 1 or bits != 16:
                raise NotImplementedError(
                    f"only 16-bit integer PCM WAV supported "
                    f"(format={audio_fmt}, bits={bits})"
                )
        elif cid == b"data":
            data = b[off : off + size]
        off += size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("WAV missing fmt / data chunk")
    samples = np.frombuffer(data, dtype="<i2")
    return rate, ch, samples.reshape(-1, ch)


# ---------------------------------------------------------------------------
# REAL codec: uncompressed AVI ('vids'/'DIB ', 24-bpp 00db frames)
# ---------------------------------------------------------------------------
def _riff_chunk(cid: bytes, payload: bytes) -> bytes:
    return (
        cid
        + struct.pack("<I", len(payload))
        + payload
        + (b"\x00" if len(payload) % 2 else b"")
    )


def encode_avi(frames: list[np.ndarray], fps: int = 25) -> bytes:
    """Same-sized (h, w, 3) uint8 RGB frames -> minimal uncompressed AVI.

    Standard layout: RIFF 'AVI ' { LIST hdrl { avih, LIST strl { strh
    'vids'/'DIB ', strf BITMAPINFOHEADER } }, LIST movi { 00db raw DIB
    bits per frame } }.  DIB bits are bottom-up BGR rows padded to
    4 bytes -- the same pixel layout the BMP codec uses."""
    if not frames:
        raise ValueError("encode_avi needs at least one frame")
    h, w, c = frames[0].shape
    if c != 3:
        raise ValueError("encode_avi expects (h, w, 3) RGB frames")
    stride = (w * 3 + 3) & ~3
    dibs = []
    for px in frames:
        if px.shape != (h, w, 3):
            raise ValueError("all AVI frames must share one size")
        rows = np.zeros((h, stride), np.uint8)
        rows[:, : w * 3] = np.ascontiguousarray(px, np.uint8)[::-1, :, ::-1].reshape(
            h, w * 3
        )
        dibs.append(rows.tobytes())
    frame_bytes = stride * h
    avih = struct.pack(
        "<14I", 1_000_000 // fps, frame_bytes * fps, 0, 0x10, len(frames),
        0, 1, frame_bytes, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHH8I4h", b"vids", b"DIB ", 0, 0, 0,
        0, 1, fps, 0, len(frames), frame_bytes, 0, 0,
        0, 0, w, h,
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_bytes, 0, 0, 0, 0
    )
    strl = _riff_chunk(b"LIST", b"strl" + _riff_chunk(b"strh", strh)
                       + _riff_chunk(b"strf", strf))
    hdrl = _riff_chunk(b"LIST", b"hdrl" + _riff_chunk(b"avih", avih) + strl)
    movi = _riff_chunk(
        b"LIST", b"movi" + b"".join(_riff_chunk(b"00db", d) for d in dibs)
    )
    payload = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(payload)) + payload


def decode_avi(b: bytes) -> tuple[int, int, list[np.ndarray]]:
    """Uncompressed AVI bytes -> (w, h, [(h, w, 3) uint8 RGB frames]).

    Recursive RIFF walk: LIST chunks recurse, ``strf`` pins the frame
    format (24-bpp BI_RGB only), ``00db``/``00dc`` chunks are frames.
    Tolerates extra chunks (idx1, JUNK, INFO)."""
    if b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    dims: list[tuple[int, int, bool]] = []
    frame_spans: list[tuple[int, int]] = []

    def walk(lo: int, hi: int) -> None:
        off = lo
        while off + 8 <= hi:
            cid, size = struct.unpack_from("<4sI", b, off)
            off += 8
            if cid == b"LIST":
                walk(off + 4, off + size)
            elif cid == b"strf" and not dims:
                w_, h_ = struct.unpack_from("<ii", b, off + 4)
                (bpp,) = struct.unpack_from("<H", b, off + 14)
                (comp,) = struct.unpack_from("<I", b, off + 16)
                if comp != 0 or bpp != 24:
                    raise NotImplementedError(
                        f"only uncompressed 24-bpp AVI video supported "
                        f"(bpp={bpp}, compression={comp}) -- compressed "
                        f"codecs need ffmpeg, absent from this container"
                    )
                dims.append((w_, abs(h_), h_ > 0))
            elif cid in (b"00db", b"00dc"):
                frame_spans.append((off, size))
            off += size + (size & 1)

    walk(12, len(b))
    if not dims:
        raise ValueError("AVI missing strf stream format")
    w, h, bottom_up = dims[0]
    stride = (w * 3 + 3) & ~3
    frames = []
    for off, _size in frame_spans:
        raw = np.frombuffer(b, np.uint8, count=h * stride, offset=off)
        rows = raw.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
        if bottom_up:
            rows = rows[::-1]
        frames.append(np.ascontiguousarray(rows[:, :, ::-1]))  # BGR -> RGB
    return w, h, frames


# ---------------------------------------------------------------------------
# Stages
# ---------------------------------------------------------------------------
class ImageDecodeStage:
    """payload -> (width, height, channels, mean_luma).

    REAL for BMP, PNG and baseline JPEG (the pure-numpy codecs in
    this module and ``stages/jpeg.py``) plus the FIMG fake container;
    remaining compressed formats (WebP/AVIF/...) need libraries not
    in this container -> ``NotImplementedError``.  Actor-pool stage:
    pass the CLASS to ``map_batches`` with ``concurrency=N,
    batch_size=MEDIA_BATCH_SIZE``.
    """

    def __init__(self):
        # codec state built once per actor: the JPEG Huffman prefix
        # LUTs live in the module, imported here so workers pay the
        # import exactly once
        from logminer_kafka_connect_ray.stages import jpeg as _jpeg

        self._jpeg = _jpeg

    def _decode(self, b: bytes):
        if b[:2] == b"BM":
            return decode_bmp(b)
        if b[:8] == _PNG_SIG:
            return decode_png(b)
        if b[:2] == b"\xff\xd8":
            return self._jpeg.decode_jpeg(b)
        if b[:4] == b"FIMG":
            return _decode_fake_image(b)
        raise NotImplementedError(
            "unsupported image container; supported payloads: BMP, "
            "PNG, baseline JPEG (real pure-numpy codecs) and the FIMG "
            "fake container (stages/multimodal.py, stages/jpeg.py)"
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
    JPEG in -> JPEG out, FIMG in -> FIMG out); remaining compressed
    formats: NotImplementedError."""

    def __init__(self, out_w: int, out_h: int, jpeg_quality: int = 85):
        from logminer_kafka_connect_ray.stages import jpeg as _jpeg

        self.out_w = out_w
        self.out_h = out_h
        self.jpeg_quality = jpeg_quality
        self._jpeg = _jpeg

    def __call__(self, t: pa.Table) -> pa.Table:
        out = []
        for b in t.column("payload").to_pylist():
            if b[:2] == b"BM":
                w, h, c, px = decode_bmp(b)
                fmt = "bmp"
            elif b[:8] == _PNG_SIG:
                w, h, c, px = decode_png(b)
                fmt = "png"
            elif b[:2] == b"\xff\xd8":
                w, h, c, px = self._jpeg.decode_jpeg(b)
                fmt = "jpeg"
            elif b[:4] == b"FIMG":
                w, h, c, px = _decode_fake_image(b)
                fmt = "fimg"
            else:
                raise NotImplementedError(
                    "unsupported image container for resize; supported: "
                    "BMP, PNG, baseline JPEG (real codecs), FIMG fake"
                )
            xi = (np.arange(self.out_w) * w // self.out_w)
            yi = (np.arange(self.out_h) * h // self.out_h)
            res = px[yi][:, xi]
            if fmt == "bmp":
                out.append(encode_bmp(res[:, :, :3]))
            elif fmt == "png":
                out.append(encode_png(res))
            elif fmt == "jpeg":
                img = res[:, :, 0] if c == 1 else res[:, :, :3]
                out.append(
                    self._jpeg.encode_jpeg(img, quality=self.jpeg_quality)
                )
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
    """payload -> (sample_rate, n_samples, rms) features.

    REAL for RIFF/WAVE 16-bit PCM (``decode_wav`` above) and for the
    FAUD fake container; compressed audio (MP3/AAC/FLAC) needs codec
    libraries absent from this container.  ``n_samples`` counts frames
    (per-channel samples); ``rms`` is over all channels."""

    def __call__(self, t: pa.Table) -> pa.Table:
        rates, ns, rms = [], [], []
        for b in t.column("payload").to_pylist():
            if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
                rate, _ch, frames = decode_wav(b)
                n = frames.shape[0]
                samples = frames.reshape(-1)
            elif b[:4] == b"FAUD":
                rate, n = struct.unpack_from("<II", b, 4)
                samples = np.frombuffer(b, dtype=np.int16, count=n, offset=12)
            else:
                raise NotImplementedError(
                    "compressed audio needs codec libs absent here; "
                    "supported payloads: WAV 16-bit PCM (real codec) and "
                    "the FAUD fake container (stages/multimodal.py)"
                )
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
    as map_batches returning more rows than it received.

    REAL for uncompressed AVI (``decode_avi`` above; sampled frames
    re-encode as real BMP payloads, so downstream image stages run on
    them byte-for-byte) and for the FVID fake container; compressed
    video needs ffmpeg, absent from this container."""

    def __init__(self, every_k: int = 2):
        self.every_k = every_k

    def __call__(self, t: pa.Table) -> pa.Table:
        mids, fidx, frames = [], [], []
        for mid, b in zip(
            t.column("media_id").to_pylist(), t.column("payload").to_pylist()
        ):
            if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
                _w, _h, pxs = decode_avi(b)
                for i in range(0, len(pxs), self.every_k):
                    mids.append(mid)
                    fidx.append(i)
                    frames.append(encode_bmp(pxs[i]))
                continue
            if b[:4] != b"FVID":
                raise NotImplementedError(
                    "compressed video demux requires ffmpeg; supported "
                    "payloads: uncompressed AVI (real codec) and the "
                    "FVID fake container (stages/multimodal.py)"
                )
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

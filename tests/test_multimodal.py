"""Multimodal stage plumbing tests (fake container codecs)."""

import numpy as np
import pyarrow as pa
import pytest

from logminer_kafka_connect_ray.stages import multimodal as mm


def make_media_ds(ray_session, payloads, kind):
    import ray.data as rd

    t = pa.table(
        {
            "media_id": pa.array(range(len(payloads)), pa.int64()),
            "kind": pa.array([kind] * len(payloads)),
            "payload": pa.array(payloads, pa.binary()),
            "meta": pa.array(["{}"] * len(payloads)),
        },
        schema=mm.MEDIA_SCHEMA,
    )
    return rd.from_arrow(t)


def test_image_decode_pipeline(ray_session):
    payloads = [mm.encode_fake_image(8, 6, 3, seed=i) for i in range(10)]
    ds = make_media_ds(ray_session, payloads, "image")
    out = ds.map_batches(
        mm.ImageDecodeStage,
        concurrency=2,
        batch_size=mm.MEDIA_BATCH_SIZE,
        batch_format="pyarrow",
    ).to_pandas()
    assert len(out) == 10
    assert (out["width"] == 8).all() and (out["height"] == 6).all()
    assert (out["channels"] == 3).all()
    assert out["mean_luma"].between(0, 255).all()


def test_image_resize_roundtrip(ray_session):
    payloads = [mm.encode_fake_image(16, 16, 1, seed=1)]
    ds = make_media_ds(ray_session, payloads, "image")
    resized = ds.map_batches(
        mm.ImageResizeStage,
        fn_constructor_args=(4, 4),
        concurrency=1,
        batch_format="pyarrow",
    )
    decoded = resized.map_batches(
        mm.ImageDecodeStage, concurrency=1, batch_format="pyarrow"
    ).to_pandas()
    assert decoded.loc[0, "width"] == 4 and decoded.loc[0, "height"] == 4


def test_audio_features(ray_session):
    payloads = [mm.encode_fake_audio(16000, 1000, seed=i) for i in range(4)]
    ds = make_media_ds(ray_session, payloads, "audio")
    out = ds.map_batches(
        mm.AudioFeatureStage, concurrency=1, batch_format="pyarrow"
    ).to_pandas()
    assert (out["sample_rate"] == 16000).all()
    assert (out["n_samples"] == 1000).all()
    assert (out["rms"] > 0).all()


def test_video_frame_sampling(ray_session):
    frames = [mm.encode_fake_image(4, 4, 1, seed=i) for i in range(6)]
    payloads = [mm.encode_fake_video(frames)]
    ds = make_media_ds(ray_session, payloads, "video")
    sampled = ds.map_batches(
        mm.FrameSampleStage, fn_constructor_args=(2,), concurrency=1,
        batch_format="pyarrow",
    )
    out = sampled.map_batches(
        mm.ImageDecodeStage, concurrency=1, batch_format="pyarrow"
    ).to_pandas()
    assert len(out) == 3  # frames 0, 2, 4


def test_real_codec_raises():
    stage = mm.ImageDecodeStage()
    t = pa.table(
        {
            "media_id": pa.array([0], pa.int64()),
            "payload": pa.array([b"\x89PNG\r\n..."], pa.binary()),
        }
    )
    with pytest.raises(NotImplementedError):
        stage(t)


def test_wav_roundtrip_exact():
    """Real WAV codec: encode -> decode is sample-exact for mono and
    interleaved stereo, and the decoder skips unknown chunks."""
    import struct

    rng = np.random.default_rng(11)
    mono = rng.integers(-32768, 32767, size=777, dtype=np.int16)
    b = mm.encode_wav(mono, 22050)
    assert b[:4] == b"RIFF" and b[8:12] == b"WAVE"
    rate, ch, out = mm.decode_wav(b)
    assert (rate, ch) == (22050, 1)
    assert np.array_equal(out[:, 0], mono)

    stereo = rng.integers(-32768, 32767, size=(100, 2), dtype=np.int16)
    rate, ch, out = mm.decode_wav(mm.encode_wav(stereo, 48000))
    assert (rate, ch) == (48000, 2)
    assert np.array_equal(out, stereo)

    # insert a LIST/INFO chunk between fmt and data: decoder must skip it
    b = mm.encode_wav(mono, 8000)
    fmt_end = 12 + 8 + 16
    junk = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    patched = b[:fmt_end] + junk + b[fmt_end:]
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    rate, ch, out = mm.decode_wav(patched)
    assert rate == 8000 and np.array_equal(out[:, 0], mono)

    with pytest.raises(NotImplementedError):
        # float PCM (format 3) rejected honestly
        bad = bytearray(mm.encode_wav(mono, 8000))
        struct.pack_into("<H", bad, 20, 3)
        mm.decode_wav(bytes(bad))


def test_avi_roundtrip_exact():
    """Real AVI codec: encode -> decode is pixel-exact per frame,
    including padded strides (w=5)."""
    rng = np.random.default_rng(12)
    frames = [
        rng.integers(0, 256, size=(4, 5, 3), dtype=np.uint8) for _ in range(6)
    ]
    b = mm.encode_avi(frames, fps=10)
    assert b[:4] == b"RIFF" and b[8:12] == b"AVI "
    w, h, out = mm.decode_avi(b)
    assert (w, h) == (5, 4) and len(out) == 6
    for a, e in zip(out, frames):
        assert np.array_equal(a, e)


def test_avi_through_frame_sample_stage(ray_session):
    """FrameSampleStage demuxes REAL AVI bytes and emits sampled
    frames as REAL BMP payloads that the image decode stage accepts."""
    rng = np.random.default_rng(13)
    frames = [
        rng.integers(0, 256, size=(6, 8, 3), dtype=np.uint8) for _ in range(5)
    ]
    t = pa.table(
        {"media_id": pa.array([7], pa.int64()),
         "payload": pa.array([mm.encode_avi(frames)], pa.binary())}
    )
    sampled = mm.FrameSampleStage(every_k=2)(t)
    assert sampled.column("frame_index").to_pylist() == [0, 2, 4]
    for i, payload in zip([0, 2, 4], sampled.column("payload").to_pylist()):
        w, h, c, px = mm.decode_bmp(payload)
        assert (w, h, c) == (8, 6, 3)
        assert np.array_equal(px, frames[i])
    dec = mm.ImageDecodeStage()(sampled)
    assert dec.column("width").to_pylist() == [8, 8, 8]


def test_wav_through_audio_stage(ray_session):
    """AudioFeatureStage computes features from REAL WAV bytes."""
    rng = np.random.default_rng(14)
    s = rng.integers(-32768, 32767, size=1234, dtype=np.int16)
    t = pa.table(
        {"media_id": pa.array([1], pa.int64()),
         "payload": pa.array([mm.encode_wav(s, 16000)], pa.binary())}
    )
    out = mm.AudioFeatureStage()(t)
    assert out.column("sample_rate").to_pylist() == [16000]
    assert out.column("n_samples").to_pylist() == [1234]
    expect = float(np.sqrt(np.mean(s.astype(np.float64) ** 2)))
    assert abs(out.column("rms")[0].as_py() - expect) < 1e-9


def test_media_pipeline_gate_values(ray_session, tmp_path):
    """The media_pipeline driver gate: dims are pure functions of
    doc_id (what the SQL oracle restates); n_sampled = every-2nd frame."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from logminer_kafka_connect_ray.pipelines.dataops import media_pipeline

    ids = list(range(9))
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(["x"] * len(ids))}),
        str(tmp_path / "documents.parquet"),
    )
    out = {r["media_id"]: r for r in media_pipeline(str(tmp_path)).to_pylist()}
    for i in ids:
        r = out[i]
        assert r["width"] == 16 + i % 48
        assert r["height"] == 16 + i % 32
        assert r["channels"] == 3
        assert (r["resized_w"], r["resized_h"]) == (8, 8)
        assert r["n_frames"] == 1 + i % 4
        assert r["n_sampled"] == (1 + i % 4 + 1) // 2
        assert r["audio_rate"] == 16000
        assert r["audio_n"] == 800 + (i % 5) * 200


def test_bmp_roundtrip_exact():
    """Real BMP codec: encode -> decode is pixel-exact, including
    non-multiple-of-4 widths (row padding)."""
    from logminer_kafka_connect_ray.stages.multimodal import decode_bmp, encode_bmp

    rng = np.random.default_rng(5)
    for w, h in [(7, 3), (16, 16), (33, 2), (1, 1)]:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        b = encode_bmp(px)
        assert b[:2] == b"BM"
        w2, h2, c2, out = decode_bmp(b)
        assert (w2, h2, c2) == (w, h, 3)
        assert np.array_equal(out, px)


def test_bmp_topdown_and_32bpp():
    """Decoder handles negative-height (top-down) and 32-bpp BMPs."""
    import struct

    from logminer_kafka_connect_ray.stages.multimodal import decode_bmp, encode_bmp

    rng = np.random.default_rng(6)
    px = rng.integers(0, 256, size=(4, 5, 3), dtype=np.uint8)
    b = bytearray(encode_bmp(px))
    # flip to top-down: negate height, reverse stored rows
    h_raw, = struct.unpack_from("<i", b, 22)
    struct.pack_into("<i", b, 22, -h_raw)
    stride = (5 * 3 + 3) & ~3
    rows = np.frombuffer(bytes(b[54:]), np.uint8).reshape(4, stride)
    b[54:] = rows[::-1].tobytes()
    w2, h2, c2, out = decode_bmp(bytes(b))
    assert (w2, h2, c2) == (5, 4, 3) and np.array_equal(out, px)

    # hand-built 2x2 32-bpp BGRA
    pix = bytes([255, 0, 0, 9,  0, 255, 0, 9,   # bottom row: B,G
                 0, 0, 255, 9,  10, 20, 30, 9]) # top row
    hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pix), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 32, 0, len(pix), 0, 0, 0, 0)
    w2, h2, c2, out = decode_bmp(hdr + info + pix)
    assert (w2, h2, c2) == (2, 2, 4)
    assert out[1, 0].tolist() == [0, 0, 255, 9]   # bottom-left, RGB(A)
    assert out[0, 0].tolist() == [255, 0, 0, 9]   # top-left


def test_bmp_through_decode_and_resize_stages(ray_session):
    """The image stages run REAL BMP bytes end-to-end: decode reports
    true dims; resize re-encodes valid BMP at the target size with
    nearest-neighbor-exact pixels."""
    from logminer_kafka_connect_ray.stages.multimodal import (
        ImageDecodeStage,
        ImageResizeStage,
        decode_bmp,
        encode_bmp,
    )

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(12, 18, 3), dtype=np.uint8)
    t = pa.table(
        {"media_id": pa.array([1], pa.int64()),
         "payload": pa.array([encode_bmp(px)], pa.binary())}
    )
    dec = ImageDecodeStage()(t)
    assert dec.column("width").to_pylist() == [18]
    assert dec.column("height").to_pylist() == [12]
    assert dec.column("mean_luma").to_pylist() == [float(px.mean())]

    res = ImageResizeStage(6, 4)(t)
    out = res.column("payload")[0].as_py()
    w2, h2, c2, rpx = decode_bmp(out)
    assert (w2, h2) == (6, 4)
    xi = np.arange(6) * 18 // 6
    yi = np.arange(4) * 12 // 4
    assert np.array_equal(rpx, px[yi][:, xi])


def test_png_roundtrip_exact():
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, (13, 17, 3), dtype=np.uint8)
    b = mm.encode_png(px)
    assert b[:8] == b"\x89PNG\r\n\x1a\n"
    w, h, c, out = mm.decode_png(b)
    assert (w, h, c) == (17, 13, 3)
    assert np.array_equal(out, px)
    # RGBA round-trip
    pxa = rng.integers(0, 256, (5, 4, 4), dtype=np.uint8)
    w, h, c, out = mm.decode_png(mm.encode_png(pxa))
    assert (w, h, c) == (4, 5, 4) and np.array_equal(out, pxa)


def test_png_all_filter_types():
    """Hand-filter scanlines with every PNG filter (0..4) and check the
    decoder reconstructs the original pixels (reference filter math
    from the PNG spec, applied forward here in the test)."""
    import struct
    import zlib

    rng = np.random.default_rng(11)
    h, w, c = 6, 5, 3
    px = rng.integers(0, 256, (h, w, c), dtype=np.int64)
    filters = [0, 1, 2, 3, 4, 2]
    raw = bytearray()
    for y in range(h):
        f = filters[y]
        raw.append(f)
        up = px[y - 1] if y else np.zeros((w, c), np.int64)
        left = np.zeros(c, np.int64)
        ul = np.zeros(c, np.int64)
        for x in range(w):
            cur = px[y, x]
            if f == 0:
                enc = cur
            elif f == 1:
                enc = (cur - left) % 256
            elif f == 2:
                enc = (cur - up[x]) % 256
            elif f == 3:
                enc = (cur - (left + up[x]) // 2) % 256
            else:
                a, b_, cc = left, up[x], ul
                p = a + b_ - cc
                pa_, pb, pcq = abs(p - a), abs(p - b_), abs(p - cc)
                pred = np.where((pa_ <= pb) & (pa_ <= pcq), a,
                                np.where(pb <= pcq, b_, cc))
                enc = (cur - pred) % 256
            raw.extend(int(v) for v in enc)
            left = cur
            ul = up[x]

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    b = (b"\x89PNG\r\n\x1a\n"
         + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
         + chunk(b"IDAT", zlib.compress(bytes(raw)))
         + chunk(b"IEND", b""))
    dw, dh, dc, out = mm.decode_png(b)
    assert (dw, dh, dc) == (w, h, c)
    assert np.array_equal(out, px.astype(np.uint8))


def test_png_unsupported_features_raise():
    import struct
    import zlib

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    # 16-bit depth must name the feature, not crash
    b = (b"\x89PNG\r\n\x1a\n"
         + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0))
         + chunk(b"IEND", b""))
    with pytest.raises(NotImplementedError, match="depth=16"):
        mm.decode_png(b)
    # interlaced must name the feature
    b = (b"\x89PNG\r\n\x1a\n"
         + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1))
         + chunk(b"IEND", b""))
    with pytest.raises(NotImplementedError, match="interlace=1"):
        mm.decode_png(b)


def test_png_palette_roundtrip():
    rng = np.random.default_rng(11)
    pal = rng.integers(0, 256, (7, 3), dtype=np.uint8)
    idx = rng.integers(0, 7, (9, 5), dtype=np.uint8)
    w, h, c, px = mm.decode_png(mm.encode_png_palette(idx, pal))
    assert (w, h, c) == (5, 9, 3)
    assert np.array_equal(px, pal[idx])


def test_png_palette_trns_widens_to_rgba():
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    trns = np.array([10, 200], np.uint8)  # entry 2 defaults to 255
    idx = np.array([[0, 1, 2]], np.uint8)
    w, h, c, px = mm.decode_png(mm.encode_png_palette(idx, pal, trns))
    assert (w, h, c) == (3, 1, 4)
    assert px[0, :, 3].tolist() == [10, 200, 255]
    assert np.array_equal(px[0, :, :3], pal[[0, 1, 2]])


def test_png_palette_missing_plte_raises():
    import struct
    import zlib

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    raw = np.zeros((2, 3), np.uint8)
    body = np.zeros((2, 4), np.uint8)
    body[:, 1:] = raw
    b = (b"\x89PNG\r\n\x1a\n"
         + chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0))
         + chunk(b"IDAT", zlib.compress(body.tobytes()))
         + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="missing PLTE"):
        mm.decode_png(b)


def test_png_greyscale_roundtrip():
    rng = np.random.default_rng(12)
    px = rng.integers(0, 256, (6, 11), dtype=np.uint8)
    w, h, c, out = mm.decode_png(mm.encode_png_grey(px))
    assert (w, h, c) == (11, 6, 1)
    assert np.array_equal(out[:, :, 0], px)


def test_png_through_decode_and_resize_stages(ray_session):
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (16, 12, 3), dtype=np.uint8)
    t = pa.table(
        {"media_id": pa.array([1], pa.int64()),
         "payload": pa.array([mm.encode_png(px)], pa.binary())}
    )
    dec = mm.ImageDecodeStage()(t)
    assert dec.column("width").to_pylist() == [12]
    assert dec.column("height").to_pylist() == [16]
    assert abs(dec.column("mean_luma").to_pylist()[0] - float(px.mean())) < 1e-9
    res = mm.ImageResizeStage(6, 8)(t)
    rb = res.column("payload").to_pylist()[0]
    assert rb[:8] == b"\x89PNG\r\n\x1a\n"  # PNG in -> PNG out
    w, h, c, rp = mm.decode_png(rb)
    assert (w, h) == (6, 8)
    # nearest-neighbor: resized pixels are exact source samples
    xi = np.arange(6) * 12 // 6
    yi = np.arange(8) * 16 // 8
    assert np.array_equal(rp, px[yi][:, xi])


# ---------------------------------------------------------------------------
# baseline JPEG codec (stages/jpeg.py)
# ---------------------------------------------------------------------------
def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(xx * 255 // max(w - 1, 1)).astype(np.uint8),
         (yy * 255 // max(h - 1, 1)).astype(np.uint8),
         (((xx + yy) * 255) // max(w + h - 2, 1)).astype(np.uint8)],
        axis=-1,
    )


def test_jpeg_roundtrip_444_and_420():
    from logminer_kafka_connect_ray.stages import jpeg

    px = _gradient(41, 67)
    for sub, bound in [(False, 6), (True, 12)]:
        b = jpeg.encode_jpeg(px, quality=90, subsample=sub)
        assert b[:2] == b"\xff\xd8" and b[-2:] == b"\xff\xd9"
        w, h, c, out = jpeg.decode_jpeg(b)
        assert (w, h, c) == (67, 41, 3) and out.shape == (41, 67, 3)
        err = np.abs(out.astype(int) - px.astype(int)).max()
        assert err <= bound, (sub, err)
        # decode is deterministic
        assert np.array_equal(jpeg.decode_jpeg(b)[3], out)


def test_jpeg_grayscale_and_odd_dims():
    from logminer_kafka_connect_ray.stages import jpeg

    g = _gradient(33, 49)[:, :, 0]
    b = jpeg.encode_jpeg(g, quality=90)
    w, h, c, out = jpeg.decode_jpeg(b)
    assert (w, h, c) == (49, 33, 1)
    assert np.abs(out[:, :, 0].astype(int) - g.astype(int)).max() <= 4


def test_jpeg_restart_markers_lossless_plumbing():
    """RST segmentation + DC predictor reset must not change a single
    decoded pixel vs the same image without restarts."""
    from logminer_kafka_connect_ray.stages import jpeg

    px = _gradient(37, 53)
    base = jpeg.decode_jpeg(jpeg.encode_jpeg(px, quality=85))[3]
    for ri in (1, 2, 5):
        b = jpeg.encode_jpeg(px, quality=85, restart_interval=ri)
        assert b"\xff\xdd" in b  # DRI present
        assert np.array_equal(jpeg.decode_jpeg(b)[3], base)


def test_jpeg_unsupported_modes_raise_named():
    from logminer_kafka_connect_ray.stages import jpeg

    b = bytearray(jpeg.encode_jpeg(_gradient(16, 16), quality=85))
    i = bytes(b).find(b"\xff\xc0")
    b[i + 1] = 0xC2  # flip SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError, match="progressive"):
        jpeg.decode_jpeg(bytes(b))
    with pytest.raises(ValueError, match="SOI"):
        jpeg.decode_jpeg(b"\x00\x01")


def test_image_stages_decode_and_resize_jpeg():
    from logminer_kafka_connect_ray.stages import jpeg
    from logminer_kafka_connect_ray.stages.multimodal import (
        ImageDecodeStage,
        ImageResizeStage,
    )

    px = _gradient(24, 40)
    t = pa.table(
        {
            "media_id": pa.array([1], pa.int64()),
            "payload": pa.array(
                [jpeg.encode_jpeg(px, quality=85, subsample=True)],
                pa.binary(),
            ),
        }
    )
    dec = ImageDecodeStage()(t)
    assert dec.column("width")[0].as_py() == 40
    assert dec.column("height")[0].as_py() == 24
    assert dec.column("channels")[0].as_py() == 3
    res = ImageResizeStage(8, 8)(t)
    out_b = res.column("payload")[0].as_py()
    assert out_b[:2] == b"\xff\xd8"  # JPEG in -> JPEG out
    w, h, c, out = jpeg.decode_jpeg(out_b)
    assert (w, h, c) == (8, 8, 3)


def test_jpeg_fill_bytes_and_component_guard():
    """Review findings (round 5): T.81 B.1.1.2 fill bytes (FF FF ...
    before a marker) must not desync the parser, and component counts
    other than 1/3 (Adobe CMYK = 4) must raise the named error
    instead of decoding to silent garbage."""
    from logminer_kafka_connect_ray.stages import jpeg

    px = _gradient(16, 24)
    b = jpeg.encode_jpeg(px, quality=85)
    base = jpeg.decode_jpeg(b)[3]
    # inject fill bytes before the SOF0 marker
    i = b.find(b"\xff\xc0")
    filled = b[:i] + b"\xff\xff\xff" + b[i:]
    assert np.array_equal(jpeg.decode_jpeg(filled)[3], base)
    # flip component count to 4 (CMYK shape)
    mut = bytearray(b)
    mut[i + 9] = 4  # SOF payload: len(2) + prec(1) + h(2) + w(2) -> nc
    with pytest.raises(NotImplementedError, match="CMYK"):
        jpeg.decode_jpeg(bytes(mut))


def test_jpeg_extreme_geometries_and_truncation():
    """Seeded sweep over degenerate dims (1x1 up to single-row/column,
    non-multiples of 8 and 16) x subsampling x restart intervals: dims
    always round-trip; truncating the stream at ANY prefix raises
    ValueError (or the named NotImplementedError), never a raw
    struct.error / IndexError."""
    from logminer_kafka_connect_ray.stages import jpeg

    rng = np.random.default_rng(1)
    for (h, w) in [(1, 1), (1, 9), (8, 8), (7, 16), (16, 7), (64, 1), (9, 9)]:
        for sub in (False, True):
            px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            b = jpeg.encode_jpeg(px, 85, sub, restart_interval=2)
            W, H, C, out = jpeg.decode_jpeg(b)
            assert (W, H, C) == (w, h, 3) and out.shape == (h, w, 3)
    b = jpeg.encode_jpeg(
        rng.integers(0, 256, (24, 24, 3), dtype=np.uint8), 85
    )
    # EVERY proper prefix: cuts inside segment payloads (SOF/DHT/SOS)
    # must fail like cuts at marker boundaries -- ValueError, never a
    # raw struct.error / IndexError (round-5 review finding)
    for cut in range(2, len(b)):
        try:
            jpeg.decode_jpeg(b[:cut])
        except (ValueError, NotImplementedError):
            pass
        # any other exception type propagates and fails the test


def test_jpeg_decoder_against_hand_assembled_spec_vector():
    """Decoder vs the SPEC, not vs our own encoder (rules out
    symmetric zigzag/Huffman/DCT-scale bugs): a single-component 8x8
    baseline JPEG is assembled BY HAND -- quant table all ones,
    Annex K tables, entropy bits written from first-principles
    canonical codes (DC cat-4 = '101', diff +8 = '1000', EOB =
    '1010' -> bytes B1 5F) -- and must decode to the analytically
    derived constant: DC coeff 8 x quant 1 -> orthonormal-IDCT
    constant 1 -> level-shift 129."""
    import struct

    from logminer_kafka_connect_ray.stages import jpeg

    def seg(marker, payload):
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    def canon(bits, vals):
        out, code, k = {}, 0, 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                out[vals[k]] = (code, ln)
                code += 1
                k += 1
            code <<= 1
        return out

    dc = canon(jpeg.DC_LUMA_BITS, jpeg.DC_LUMA_VALS)
    ac = canon(jpeg.AC_LUMA_BITS, jpeg.AC_LUMA_VALS)
    bits = []
    c, ln = dc[4]
    bits += [(c >> (ln - 1 - i)) & 1 for i in range(ln)]
    bits += [1, 0, 0, 0]                 # diff = +8
    c, ln = ac[0]
    bits += [(c >> (ln - 1 - i)) & 1 for i in range(ln)]
    while len(bits) % 8:
        bits.append(1)
    entropy = bytes(
        int("".join(map(str, bits[i:i + 8])), 2)
        for i in range(0, len(bits), 8)
    )
    assert entropy == b"\xb1\x5f"

    b = (
        b"\xff\xd8"
        + seg(0xFFDB, bytes([0]) + bytes([1] * 64))
        + seg(0xFFC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
        + seg(0xFFC4, bytes([0x00]) + bytes(jpeg.DC_LUMA_BITS)
              + bytes(jpeg.DC_LUMA_VALS))
        + seg(0xFFC4, bytes([0x10]) + bytes(jpeg.AC_LUMA_BITS)
              + bytes(jpeg.AC_LUMA_VALS))
        + seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + entropy
        + b"\xff\xd9"
    )
    w, h, c_, px = jpeg.decode_jpeg(b)
    assert (w, h, c_) == (8, 8, 1)
    assert np.all(px == 129)


def test_jpeg_vectorized_encoder_pinned_bytes():
    """The vectorized entropy coder (round 5: numpy symbol-stream +
    bit-packing, no per-symbol Python) was proven BIT-IDENTICAL to
    the scalar reference coder it replaced across noise/smooth/grey x
    quality x sampling x restart combinations; this pins one such
    stream so any future change to symbol order, ZRL expansion,
    padding or stuffing fails loudly."""
    import hashlib

    from logminer_kafka_connect_ray.stages import jpeg

    rng = np.random.default_rng(7)
    noise = rng.integers(0, 256, (40, 60, 3), dtype=np.uint8)
    b = jpeg.encode_jpeg(noise, 85, subsample=True, restart_interval=2)
    assert hashlib.md5(b).hexdigest() == "6abab44b20f5e2c159777c98096bd410"
    # pin the DECODE of that stream too (not a decode-vs-decode
    # tautology): any change to dequant/IDCT/upsampling/color math
    # fails here
    out = jpeg.decode_jpeg(b)[3]
    assert hashlib.md5(out.tobytes()).hexdigest() == (
        "23f058d39273c662a31d8c288b05bdb6"
    )

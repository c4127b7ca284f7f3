"""Multimodal stage plumbing tests (fake container codecs)."""

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

"""Multimodal stub stages (real plumbing, fake codecs) + per-stage
metrics actor."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.stages.multimodal import (AudioFeatures, VideoFrameSample,
                                        _decode_audio, _decode_frame,
                                        audio_corpus, encode_pcm16,
                                        video_corpus)


def test_pcm_roundtrip():
    sr = 8000
    t = np.arange(1600) / sr
    x = 0.5 * np.sin(2 * np.pi * 440 * t)
    data = encode_pcm16(x, sr)
    y, sr2 = _decode_audio(data, "pcm16")
    assert sr2 == sr
    np.testing.assert_allclose(y, x, atol=1 / 32767 + 1e-9)


def test_unknown_codecs_raise_not_implemented():
    with pytest.raises(NotImplementedError):
        _decode_audio(b"\xffMETA...", "mp3")
    with pytest.raises(NotImplementedError):
        _decode_frame(b"H264....", 0)


def test_audio_features_stage(ray_session):
    import ray.data

    ds = ray.data.from_arrow(audio_corpus(12)).repartition(3)
    out = ds.map_batches(AudioFeatures, batch_format="pyarrow", batch_size=4,
                         concurrency=2)
    t = pa.concat_tables(
        list(out.iter_batches(batch_size=None, batch_format="pyarrow")),
        promote_options="default")
    assert t.num_rows == 12
    assert set(t.column_names) == {"media_id", "n_samples", "rms", "zcr",
                                   "band_energy", "caption"}
    rms = t["rms"].to_numpy()
    assert (rms > 0.1).all() and (rms < 1.0).all()
    be = t["band_energy"].to_pylist()
    assert all(len(b) == 8 for b in be)
    # captions ride through byte-equal (the invariant)
    src = audio_corpus(12)
    assert dict(zip(t["media_id"].to_pylist(), t["caption"].to_pylist())) == \
        dict(zip(src["media_id"].to_pylist(), src["caption"].to_pylist()))


def test_video_frame_sample_stage(ray_session):
    import ray.data

    ds = ray.data.from_arrow(video_corpus(10)).repartition(2)
    out = ds.map_batches(VideoFrameSample, fn_constructor_kwargs=dict(k=3),
                         batch_format="pyarrow", batch_size=4, concurrency=2)
    t = pa.concat_tables(
        list(out.iter_batches(batch_size=None, batch_format="pyarrow")),
        promote_options="default")
    assert t.num_rows == 10 * 3
    # deterministic: same frame -> same phash
    t2 = pa.concat_tables(
        list(ds.map_batches(VideoFrameSample, fn_constructor_kwargs=dict(k=3),
                            batch_format="pyarrow", batch_size=4, concurrency=2)
             .iter_batches(batch_size=None, batch_format="pyarrow")),
        promote_options="default")
    a = sorted(zip(t["media_id"].to_pylist(), t["frame_idx"].to_pylist(),
                   t["phash"].to_pylist()))
    b = sorted(zip(t2["media_id"].to_pylist(), t2["frame_idx"].to_pylist(),
                   t2["phash"].to_pylist()))
    assert a == b


def test_stage_metrics_instrument(ray_session):
    import ray.data

    from gdal_ray.state.lineage import instrument, metrics_reset, metrics_snapshot

    metrics_reset()
    ds = ray.data.range(1000, override_num_blocks=4)
    ds = ds.map_batches(
        lambda b: pa.table({"x": pa.array(np.asarray(b["id"]) * 2)}),
        batch_format="numpy")
    ds = instrument(ds, "double")
    assert ds.count() == 1000
    import time

    snap = {}
    for _ in range(20):  # fire-and-forget adds race the snapshot
        snap = metrics_snapshot()
        if snap.get("double", {}).get("rows") == 1000:
            break
        time.sleep(0.2)
    assert snap["double"]["rows"] == 1000
    assert snap["double"]["batches"] >= 1


def test_wav_pcm_decode_real():
    """RIFF/WAVE is a REAL format path now: 8/16-bit + stereo mixdown
    + float32 decode exactly."""
    import struct as _struct

    from gdal_ray.stages.multimodal import decode_wav, encode_wav

    x = np.sin(np.arange(4000) / 15.0) * 0.5
    y, sr = decode_wav(encode_wav(x, 8000))
    q = np.clip(x * 32767.0, -32768, 32767).astype("<i2")
    assert sr == 8000
    assert np.array_equal(y, q.astype(np.float64) / 32767.0)
    y8, _ = decode_wav(encode_wav(x, 8000, bits=8))
    assert np.abs(y8 - x).max() < 1 / 64
    # stereo float32 mixes to mono
    inter = np.empty(200, np.float32)
    inter[0::2] = 0.25
    inter[1::2] = 0.75
    fmt = _struct.pack("<HHIIHH", 3, 2, 8000, 8000 * 8, 8, 32)
    body = (b"WAVEfmt " + _struct.pack("<I", len(fmt)) + fmt
            + b"data" + _struct.pack("<I", inter.nbytes)
            + inter.tobytes())
    wav = b"RIFF" + _struct.pack("<I", len(body)) + body
    ym, _ = decode_wav(wav)
    assert np.allclose(ym, 0.5)


def test_avi_mjpeg_real_video_path():
    """AVI/MJPEG end to end: container roundtrip is byte-exact and
    frames decode through the engine's real JPEG codec."""
    from gdal_ray.functions.jpeg import decode_jpeg, encode_jpeg
    from gdal_ray.stages.multimodal import (_decode_frame,
                                            build_avi_mjpeg,
                                            parse_avi_mjpeg)

    rng = np.random.default_rng(9)
    raws = [rng.integers(0, 255, (32, 48, 3)).astype(np.uint8)
            for _ in range(4)]
    frames = [encode_jpeg(r, quality=90) for r in raws]
    avi = build_avi_mjpeg(frames, 48, 32, fps=24)
    assert parse_avi_mjpeg(avi) == frames
    fr = _decode_frame(avi, 2)
    ref = decode_jpeg(frames[2])
    lum = (0.299 * ref[:, :, 0] + 0.587 * ref[:, :, 1]
           + 0.114 * ref[:, :, 2]).astype(np.uint8)
    assert np.array_equal(fr, lum)


def test_unsupported_codecs_still_raise():
    from gdal_ray.stages.multimodal import _decode_audio, _decode_frame

    with pytest.raises(NotImplementedError):
        _decode_audio(b"\xff\xfb\x90\x00" + b"\x00" * 64, "mp3")
    with pytest.raises(NotImplementedError):
        _decode_frame(b"\x00\x00\x00\x20ftypisom" + b"\x00" * 64, 0)

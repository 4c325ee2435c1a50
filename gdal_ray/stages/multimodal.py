"""Multimodal (audio/video) actor-pool stages — real Ray plumbing,
stubbed codecs.

No audio/video codec library exists in this container, so per the
multimodal-stub contract the decode kernels are either (a) a real
deterministic fake codec ("pcm16" sine synthesis / "fakeframes" hash
frames) or (b) a clearly-marked ``NotImplementedError`` for real-world
formats (mp3/aac/h264/...). Everything around them — schemas, batch
sizes, actor signatures, output layout — is the real engine surface
and is tested; swapping in pyav/librosa replaces only the two
``_decode_*`` functions.

Schemas:
    audio in : media_id:string, bytes:binary, fmt:string,
               sample_rate:int32, caption:string
    audio out: media_id, n_samples:int64, rms:double, zcr:double,
               band_energy:list<float64>[8], caption
    video in : media_id:string, bytes:binary, fmt:string, fps:int32,
               n_frames:int32, caption:string
    video out: media_id, frame_idx:int32, phash:int64, mean_lum:double
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np
import pyarrow as pa

_PCM_MAGIC = b"PCM\x00"
_VID_MAGIC = b"FVID"

AUDIO_SCHEMA = pa.schema([
    ("media_id", pa.string()), ("bytes", pa.binary()), ("fmt", pa.string()),
    ("sample_rate", pa.int32()), ("caption", pa.string()),
])
VIDEO_SCHEMA = pa.schema([
    ("media_id", pa.string()), ("bytes", pa.binary()), ("fmt", pa.string()),
    ("fps", pa.int32()), ("n_frames", pa.int32()), ("caption", pa.string()),
])


# ------------------------------------------------------------- fake codecs


def encode_pcm16(samples: np.ndarray, sample_rate: int) -> bytes:
    s16 = np.clip(samples * 32767.0, -32768, 32767).astype("<i2")
    return _PCM_MAGIC + struct.pack("<II", sample_rate, len(s16)) \
        + zlib.compress(s16.tobytes(), 1)


def _decode_audio(data: bytes, fmt: str) -> tuple[np.ndarray, int]:
    if data[:4] == _PCM_MAGIC:
        sr, n = struct.unpack_from("<II", data, 4)
        s16 = np.frombuffer(zlib.decompress(data[12:]), "<i2", count=n)
        return s16.astype(np.float64) / 32767.0, sr
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return decode_wav(data)
    raise NotImplementedError(
        f"audio codec {fmt!r}: no decoder library in this container "
        "(swap in librosa/soundfile here)")


def encode_fakeframes(media_id: str, n_frames: int, w: int = 32, h: int = 32) -> bytes:
    """Deterministic 'video': per-frame pixels derived from
    blake2b(media_id, frame_idx)."""
    return _VID_MAGIC + struct.pack("<III", n_frames, w, h) + media_id.encode()


def _decode_frame(data: bytes, frame_idx: int) -> np.ndarray:
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        from ..functions.jpeg import decode_jpeg

        frames = parse_avi_mjpeg(data)
        px = decode_jpeg(frames[frame_idx])
        if px.ndim == 3:
            px = (0.299 * px[:, :, 0] + 0.587 * px[:, :, 1]
                  + 0.114 * px[:, :, 2]).astype(np.uint8)
        return px
    if data[:4] != _VID_MAGIC:
        raise NotImplementedError(
            "video codec: mp3/h264-class formats stay unsupported "
            "(real paths: RIFF/WAVE PCM audio, RIFF/AVI MJPEG video)")
    n, w, h = struct.unpack_from("<III", data, 4)
    if not 0 <= frame_idx < n:
        raise IndexError(frame_idx)
    media_id = data[16:].decode()
    seed = int.from_bytes(
        hashlib.blake2b(f"{media_id}:{frame_idx}".encode(), digest_size=8).digest(),
        "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w), np.uint8)


# ------------------------------------------------------------- actor stages


class AudioFeatures:
    """Actor: decode + vectorized feature extraction per batch (RMS,
    zero-crossing rate, 8 FFT band energies). FFT plan state would be
    held here per actor with a real codec."""

    BANDS = 8

    def __call__(self, t: pa.Table) -> pa.Table:
        out = {"media_id": [], "n_samples": [], "rms": [], "zcr": [],
               "band_energy": [], "caption": []}
        for rec in t.to_pylist():
            x, sr = _decode_audio(rec["bytes"], rec["fmt"])
            out["media_id"].append(rec["media_id"])
            out["caption"].append(rec["caption"])
            out["n_samples"].append(len(x))
            out["rms"].append(float(np.sqrt(np.mean(x * x))) if len(x) else 0.0)
            out["zcr"].append(
                float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if len(x) > 1 else 0.0)
            spec = np.abs(np.fft.rfft(x)) ** 2
            bands = np.array_split(spec, self.BANDS)
            out["band_energy"].append([float(b.sum()) for b in bands])
        return pa.table({
            "media_id": pa.array(out["media_id"], pa.string()),
            "n_samples": pa.array(out["n_samples"], pa.int64()),
            "rms": pa.array(out["rms"], pa.float64()),
            "zcr": pa.array(out["zcr"], pa.float64()),
            "band_energy": pa.array(out["band_energy"], pa.list_(pa.float64())),
            "caption": pa.array(out["caption"], pa.string()),
        })


class VideoFrameSample:
    """Actor: sample k evenly-spaced frames per video, emit per-frame
    rows (phash + mean luminance) — the frame-sample layout of a
    video training pipeline."""

    def __init__(self, k: int = 4):
        self.k = k

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..sources.images import phash64

        out = {"media_id": [], "frame_idx": [], "phash": [], "mean_lum": []}
        for rec in t.to_pylist():
            n = int(rec["n_frames"])
            idxs = np.unique(np.linspace(0, n - 1, min(self.k, n)).astype(int))
            for fi in idxs.tolist():
                fr = _decode_frame(rec["bytes"], fi)
                out["media_id"].append(rec["media_id"])
                out["frame_idx"].append(fi)
                out["phash"].append(phash64(fr[:, :, None].repeat(3, axis=2)))
                out["mean_lum"].append(float(fr.mean()))
        return pa.table({
            "media_id": pa.array(out["media_id"], pa.string()),
            "frame_idx": pa.array(out["frame_idx"], pa.int32()),
            "phash": pa.array(out["phash"], pa.int64()),
            "mean_lum": pa.array(out["mean_lum"], pa.float64()),
        })


# ------------------------------------------------------------- corpora


def audio_corpus(n: int) -> pa.Table:
    """Deterministic audio rows: per-id sine mixes at 8 kHz."""
    rows = {f.name: [] for f in AUDIO_SCHEMA}
    for i in range(n):
        rng = np.random.default_rng(31337 + i)
        sr = 8000
        dur = int(sr * rng.uniform(0.2, 1.0))
        tt = np.arange(dur) / sr
        f0, f1 = rng.uniform(100, 2000, 2)
        x = 0.5 * np.sin(2 * np.pi * f0 * tt) + 0.3 * np.sin(2 * np.pi * f1 * tt)
        rows["media_id"].append(f"aud{i:06d}")
        # alternate the engine's compact PCM container with REAL
        # RIFF/WAVE — identical 16-bit quantization, so features are
        # container-invariant (and the oracle stays format-blind)
        if i % 2:
            rows["bytes"].append(encode_wav(x, sr))
            rows["fmt"].append("wav")
        else:
            rows["bytes"].append(encode_pcm16(x, sr))
            rows["fmt"].append("pcm16")
        rows["sample_rate"].append(sr)
        rows["caption"].append(f"audio clip {i} f0={f0:.0f}")
    return pa.table({f.name: pa.array(rows[f.name], f.type) for f in AUDIO_SCHEMA})


def video_corpus(n: int) -> pa.Table:
    rows = {f.name: [] for f in VIDEO_SCHEMA}
    for i in range(n):
        nf = 8 + (i % 5) * 4
        rows["media_id"].append(f"vid{i:06d}")
        rows["bytes"].append(encode_fakeframes(f"vid{i:06d}", nf))
        rows["fmt"].append("fakeframes")
        rows["fps"].append(24)
        rows["n_frames"].append(nf)
        rows["caption"].append(f"video clip {i}")
    return pa.table({f.name: pa.array(rows[f.name], f.type) for f in VIDEO_SCHEMA})


def audio_features_query(sf_dir: str):
    """queries() entry: audio decode->features over the deterministic
    corpus (actor pool; rows-only)."""
    import ray.data

    ds = ray.data.from_arrow(audio_corpus(64)).repartition(8)
    out = ds.map_batches(AudioFeatures, batch_format="pyarrow", batch_size=16,
                         concurrency=2)
    tabs = list(out.iter_batches(batch_size=None, batch_format="pyarrow"))
    t = pa.concat_tables(tabs, promote_options="default")
    # stable scalar projection for the driver's rows check
    import pyarrow.compute as pc

    return pa.table({
        "media_id": t["media_id"],
        "n_samples": t["n_samples"],
        "rms": pc.round(t["rms"], 4),
        "zcr": pc.round(t["zcr"], 4),
    })


def video_frames_query(sf_dir: str):
    import ray.data

    ds = ray.data.from_arrow(video_corpus(48)).repartition(8)
    out = ds.map_batches(VideoFrameSample, fn_constructor_kwargs=dict(k=4),
                         batch_format="pyarrow", batch_size=16, concurrency=2)
    tabs = list(out.iter_batches(batch_size=None, batch_format="pyarrow"))
    return pa.concat_tables(tabs, promote_options="default")


# --------------------------------------------------- real containers
# (round 4: the multimodal surface graduates from fake codecs to real
# formats that need no external library — RIFF/WAVE PCM audio and
# RIFF/AVI MJPEG video whose frames decode through the engine's
# bit-exact JPEG codec. mp3/AAC/H.264 remain honestly unsupported.)


def encode_wav(samples: np.ndarray, sample_rate: int,
               bits: int = 16) -> bytes:
    """RIFF/WAVE PCM writer (mono; 8/16-bit)."""
    if bits == 16:
        pcm = np.clip(samples * 32767.0, -32768, 32767).astype("<i2")
        raw = pcm.tobytes()
        block = 2
    elif bits == 8:
        pcm = np.clip(samples * 127.0 + 128.0, 0, 255).astype(np.uint8)
        raw = pcm.tobytes()
        block = 1
    else:
        raise ValueError("encode_wav: bits must be 8 or 16")
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate,
                      sample_rate * block, block, bits)
    body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(raw)) + raw)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM reader: integer PCM 8/16/24/32 and float32/64,
    multi-channel mixed to mono by averaging. -> (float64 in [-1,1],
    sample_rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    raw = None
    n = len(data)
    while pos + 8 <= n:
        cid = data[pos:pos + 4]
        ln = struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8:pos + 8 + ln]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body)
        elif cid == b"data":
            raw = body
        pos += 8 + ln + (ln & 1)
    if fmt is None or raw is None:
        raise ValueError("WAV: missing fmt/data chunk")
    tag, nch, sr, _, _, bits = fmt
    if tag == 3:        # IEEE float
        dt = "<f4" if bits == 32 else "<f8"
        x = np.frombuffer(raw, dt).astype(np.float64)
    elif tag == 1:
        if bits == 8:
            x = (np.frombuffer(raw, np.uint8).astype(np.float64)
                 - 128.0) / 127.0
        elif bits == 16:
            x = np.frombuffer(raw, "<i2").astype(np.float64) / 32767.0
        elif bits == 24:
            b = np.frombuffer(raw, np.uint8).reshape(-1, 3)
            v = (b[:, 0].astype(np.int32)
                 | (b[:, 1].astype(np.int32) << 8)
                 | (b[:, 2].astype(np.int32) << 16))
            v = np.where(v >= 1 << 23, v - (1 << 24), v)
            x = v.astype(np.float64) / float((1 << 23) - 1)
        elif bits == 32:
            x = np.frombuffer(raw, "<i4").astype(np.float64) / 2147483647.0
        else:
            raise NotImplementedError(f"WAV PCM {bits}-bit")
    else:
        raise NotImplementedError(f"WAV format tag {tag}")
    if nch > 1:
        x = x[: len(x) // nch * nch].reshape(-1, nch).mean(axis=1)
    return x, sr


def build_avi_mjpeg(frames: list[bytes], w: int, h: int,
                    fps: int = 24) -> bytes:
    """Minimal RIFF/AVI with an MJPG video stream: avih + strh/strf
    headers, LIST movi of 00dc chunks, idx1 index."""
    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    nfr = len(frames)
    maxb = max((len(f) for f in frames), default=0)
    avih = struct.pack("<14I", 1000000 // fps, maxb * fps, 0, 0x10,
                       nfr, 0, 1, maxb, w, h, 0, 0, 0, 0)
    strh = struct.pack("<4s4sIHHIIIIIIIIhhhh", b"vids", b"MJPG", 0,
                       0, 0, 0, 1, fps, 0, nfr, maxb, 0xFFFFFFFF, 0,
                       0, 0, w, h)
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh)
                     + chunk(b"strf", strf)))
    movi_items = b"".join(chunk(b"00dc", f) for f in frames)
    movi = lst(b"movi", movi_items)
    # idx1: offsets relative to the 'movi' fourcc
    idx = b""
    off = 4
    for f in frames:
        idx += struct.pack("<4sIII", b"00dc", 0x10, off, len(f))
        off += 8 + len(f) + (len(f) & 1)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_avi_mjpeg(data: bytes) -> list[bytes]:
    """00dc frame payloads of a RIFF/AVI MJPG stream, in order."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            cid = data[pos:pos + 4]
            ln = struct.unpack_from("<I", data, pos + 4)[0]
            if cid == b"LIST":
                walk(pos + 12, pos + 8 + ln)
            elif cid == b"00dc":
                frames.append(data[pos + 8:pos + 8 + ln])
            pos += 8 + ln + (ln & 1)

    walk(12, len(data))
    return frames


def multimodal_real_query(sf_dir: str):
    """queries() entry (round 4): the REAL container paths — WAV PCM
    clips through the AudioFeatures actor and AVI/MJPEG container
    extraction — distributed via map_batches. Rows (case, value):
    wav rows scale rms/zcr by 1e4; avi rows crc32 the extracted
    frame payloads (container extraction is byte-exact)."""
    import pyarrow as pa
    import ray.data

    def f(t: pa.Table) -> pa.Table:
        cases, values = [], []
        for rec in t.to_pylist():
            i = rec["i"]
            if rec["kind"] == "wav":
                rng = np.random.default_rng(5150 + i)
                sr = 8000
                dur = int(sr * rng.uniform(0.25, 0.75))
                tt = np.arange(dur) / sr
                f0 = rng.uniform(200, 1500)
                x = 0.6 * np.sin(2 * np.pi * f0 * tt)
                y, _ = _decode_audio(encode_wav(x, sr), "wav")
                rms = float(np.sqrt(np.mean(y * y)))
                zcr = float(np.mean(np.signbit(y[1:])
                                    != np.signbit(y[:-1])))
                cases.append(f"wav{i:03d}:n")
                values.append(len(y))
                cases.append(f"wav{i:03d}:rms4")
                values.append(round(rms * 1e4))
                cases.append(f"wav{i:03d}:zcr4")
                values.append(round(zcr * 1e4))
            else:
                import hashlib

                payloads = [hashlib.blake2b(
                    f"avi{i}:{k}".encode(), digest_size=32).digest() * 8
                    for k in range(4)]
                avi = build_avi_mjpeg(payloads, 16, 16)
                back = parse_avi_mjpeg(avi)
                for k, fr in enumerate(back):
                    cases.append(f"avi{i:03d}:{k}")
                    values.append(zlib.crc32(fr))
        return pa.table({"case": pa.array(cases, pa.string()),
                         "value": pa.array(values, pa.int64())})

    items = ([{"kind": "wav", "i": i} for i in range(8)]
             + [{"kind": "avi", "i": i} for i in range(4)])
    return ray.data.from_items(items).map_batches(
        f, batch_format="pyarrow", batch_size=2)

"""Multimodal column plumbing — image/audio/video as opaque binary columns
with typed metadata, processed in Arrow-batched ``mapInPandas`` stages.

The input-hint documents table interleaves text and media spans
(kind='media', media_ref). At 100 TB the media bytes live in this sidecar
table, bucketed by media_id so span→media joins are co-partitioned:

    media(media_id string, kind string,           -- image|audio|video
          media_bytes binary, width int, height int,
          sample_rate int, duration_ms int, codec string)

Decode/resize/frame-sample are pandas-UDF stages over that table. Codecs:

* REAL numpy decoders for library-free formats — binary PPM (P6) images
  with nearest-neighbor resize, RIFF/WAV PCM16 audio (RMS / zero-crossing
  features), and a multi-frame PPM container for video frame sampling
  (decode every stride-th frame, average its image features).
* ``decode_stub`` remains for real-world codecs (png/h264/...) that need
  PIL/ffmpeg — NOT installed here; it raises NotImplementedError unless
  ``deterministic_fake=True`` (sha256-derived feature), keeping the stage
  honest about what is and isn't decoded.

Synthetic media bytes are real PPM/WAV/PPMV payloads derived purely from
media_ref (same determinism contract as crawler/synth.py).
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("media_bytes", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("codec", T.StringType(), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id string, kind string, feature array<float>, "
    "thumb_w int, thumb_h int, n_frames_sampled int"
)


def _ref_rng_bytes(media_ref: str, n: int) -> bytes:
    """n deterministic pseudo-random bytes from sha256 counter mode."""
    out = bytearray()
    ctr = 0
    while len(out) < n:
        out += hashlib.sha256(f"{media_ref}|{ctr}".encode()).digest()
        ctr += 1
    return bytes(out[:n])


def encode_ppm(pixels: np.ndarray) -> bytes:
    """Binary PPM (P6, maxval 255) from a (h, w, 3) uint8 array."""
    h, w = pixels.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.astype(np.uint8).tobytes()


def decode_ppm(raw: bytes) -> np.ndarray:
    """Parse binary PPM (P6) -> (h, w, 3) uint8. Pure numpy, no codecs."""
    if not raw.startswith(b"P6"):
        raise ValueError("not a binary PPM payload")
    # header = magic, width, height, maxval separated by whitespace, then
    # exactly one whitespace byte before the pixel data
    parts, idx, token = [], 2, b""
    while len(parts) < 3:
        c = raw[idx : idx + 1]
        idx += 1
        if c.isspace():
            if token:
                parts.append(int(token))
                token = b""
        elif c == b"#":  # comment to end of line
            while raw[idx : idx + 1] not in (b"\n", b""):
                idx += 1
        else:
            token += c
    w, h, maxval = parts
    if maxval != 255:
        raise ValueError("only maxval=255 PPMs supported")
    pix = np.frombuffer(raw, dtype=np.uint8, count=w * h * 3, offset=idx)
    return pix.reshape(h, w, 3)


def resize_nearest(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize via index gathers — the deterministic,
    library-free thumbnail path."""
    h, w = pixels.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return pixels[ys][:, xs]


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Minimal RIFF/WAVE PCM16 mono encoder."""
    data = samples.astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16, 1, 1,
        sample_rate, sample_rate * 2, 2, 16, b"data", len(data),
    )
    return hdr + data


def decode_wav_pcm16(raw: bytes) -> tuple[np.ndarray, int]:
    """Parse RIFF/WAVE PCM16 mono -> (int16 samples, sample_rate)."""
    if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt = struct.unpack_from("<HHI", raw, 20)
    if fmt[0] != 1 or fmt[1] != 1:
        raise ValueError("only PCM16 mono supported")
    sample_rate = fmt[2]
    data_len = struct.unpack_from("<I", raw, 40)[0]
    samples = np.frombuffer(raw, dtype="<i2", count=data_len // 2, offset=44)
    return samples, sample_rate


# Multi-frame PPM container ("ppmv"): a frame-count header followed by
# concatenated equal-size P6 frames — enough structure for REAL frame
# sampling without a video codec.
def encode_ppmv(frames: list[np.ndarray]) -> bytes:
    body = b"".join(encode_ppm(f) for f in frames)
    return b"PPMV%d\n" % len(frames) + body


def decode_ppmv_frames(raw: bytes, stride: int = 1) -> list[np.ndarray]:
    if not raw.startswith(b"PPMV"):
        raise ValueError("not a PPMV payload")
    nl = raw.index(b"\n")
    n_frames = int(raw[4:nl])
    body = raw[nl + 1 :]
    frame_len = len(body) // n_frames if n_frames else 0
    return [
        decode_ppm(body[i * frame_len : (i + 1) * frame_len])
        for i in range(0, n_frames, max(1, stride))
    ]


def synthetic_media_bytes(media_ref: str, size: int = 256) -> bytes:
    """Deterministic REAL payload for a media_ref: a P6 PPM image, a PCM16
    WAV clip, or a PPMV frame stack, chosen by the ref hash (the same
    kind selection as media_table_from_spans)."""
    h = int(hashlib.sha256(media_ref.encode()).hexdigest()[:8], 16)
    kind = ("image", "audio", "video")[h % 3]
    if kind == "image":
        w, hgt = 8 + h % 9, 8 + (h >> 4) % 9
        pix = np.frombuffer(_ref_rng_bytes(media_ref, w * hgt * 3), dtype=np.uint8)
        return encode_ppm(pix.reshape(hgt, w, 3))
    if kind == "audio":
        n = 160 + h % 160
        raw = np.frombuffer(_ref_rng_bytes(media_ref, n * 2), dtype="<i2")
        return encode_wav_pcm16(raw, 16000)
    n_frames = 2 + h % 6
    w = hgt = 8
    frames = [
        np.frombuffer(
            _ref_rng_bytes(f"{media_ref}#f{i}", w * hgt * 3), dtype=np.uint8
        ).reshape(hgt, w, 3)
        for i in range(n_frames)
    ]
    return encode_ppmv(frames)


def media_table_from_spans(docs: DataFrame) -> DataFrame:
    """Build the media sidecar table from the documents' media spans.

    Plan: explode media spans → distinct media_ref (one fetch/decode per
    asset regardless of how many documents embed it) → synthesize bytes +
    metadata in one mapInPandas pass. At scale: repartition by media_id so
    downstream decode stages are shard-local.
    """
    refs = (
        docs.select(F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "media")
        .select(F.col("s.media_ref").alias("media_ref"))
        .distinct()
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = []
            for ref in pdf["media_ref"]:
                h = int(hashlib.sha256(ref.encode()).hexdigest()[:8], 16)
                kind = ("image", "audio", "video")[h % 3]
                raw = synthetic_media_bytes(ref)
                width = height = sample_rate = duration_ms = None
                if kind == "image":
                    img = decode_ppm(raw)
                    height, width = int(img.shape[0]), int(img.shape[1])
                elif kind == "audio":
                    samples, sample_rate = decode_wav_pcm16(raw)
                    duration_ms = int(len(samples) * 1000 / sample_rate)
                else:
                    frames = decode_ppmv_frames(raw)
                    height, width = int(frames[0].shape[0]), int(frames[0].shape[1])
                    duration_ms = len(frames) * 1000  # synthetic 1 fps
                out.append(
                    dict(
                        media_id=hashlib.sha256(ref.encode()).hexdigest()[:16],
                        kind=kind,
                        media_bytes=raw,
                        width=width,
                        height=height,
                        sample_rate=sample_rate,
                        duration_ms=duration_ms,
                        codec={"image": "ppm", "audio": "wav", "video": "ppmv"}[kind],
                    )
                )
            yield pd.DataFrame(out)

    return refs.mapInPandas(gen, schema=MEDIA_SCHEMA)


def image_features(img: np.ndarray) -> list[float]:
    """8-dim image feature: per-channel means + stds (unit-scaled),
    aspect signal, overall brightness."""
    f = img.astype(np.float64) / 255.0
    means = f.mean(axis=(0, 1))
    stds = f.std(axis=(0, 1))
    h, w = img.shape[:2]
    return [
        round(float(x), 6)
        for x in (*means, *stds, w / (w + h), float(f.mean()))
    ]


def audio_features(samples: np.ndarray, sample_rate: int) -> list[float]:
    """8-dim audio feature: RMS, mean-abs, zero-crossing rate, peak,
    duration signal, DC offset (unit-scaled), padded."""
    if len(samples) == 0:
        return [0.0] * 8
    s = samples.astype(np.float64) / 32768.0
    zcr = float(np.mean(np.abs(np.diff(np.signbit(s).astype(np.int8)))))
    dur = len(samples) / sample_rate
    return [
        round(float(x), 6)
        for x in (
            np.sqrt(np.mean(s * s)), np.mean(np.abs(s)), zcr,
            np.max(np.abs(s)), min(dur / 30.0, 1.0), np.mean(s), 0.0, 0.0,
        )
    ]


def decode_stub(media_bytes: bytes, kind: str, deterministic_fake: bool) -> list[float]:
    """STUB: real deployments decode via PIL/ffmpeg here (not installed in
    this environment). The fake derives an 8-dim feature from the payload
    hash — deterministic, so downstream plumbing is testable."""
    if not deterministic_fake:
        raise NotImplementedError(
            "media codecs (PIL/ffmpeg) are not available in this environment; "
            "pass deterministic_fake=True to exercise the pipeline"
        )
    h = hashlib.sha256(media_bytes or b"").digest()
    return [round(b / 255.0, 6) for b in h[:8]]


def extract_features(
    media: DataFrame,
    thumb: tuple[int, int] = (32, 32),
    frame_stride_ms: int = 1000,
    deterministic_fake: bool = True,
) -> DataFrame:
    """Decode → feature/thumbnail/frame-sample stage (mapInPandas).

    ppm/wav/ppmv payloads REALLY decode (numpy-only codecs above):
    images resize to the thumb size (nearest-neighbor) and emit channel
    statistics; audio emits RMS/ZCR-family features; video samples every
    stride-th frame and averages its frames' image features. Unsupported
    codecs fall through to decode_stub (NotImplementedError unless
    deterministic_fake). Batch shape: one Arrow batch of (media_id, kind,
    bytes, metadata) rows in, one batch of fixed-width feature rows out —
    the layout a real GPU/codec stage would consume."""
    cols = media.select(
        "media_id", "kind", "media_bytes", "codec", "width", "height", "duration_ms"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            feats, n_frames, tw, th = [], [], [], []
            for row in pdf.itertuples(index=False):
                raw = bytes(row.media_bytes) if row.media_bytes is not None else b""
                if row.codec == "ppm":
                    small = resize_nearest(decode_ppm(raw), thumb[0], thumb[1])
                    feats.append(image_features(small))
                    n_frames.append(1)
                    tw.append(thumb[0]); th.append(thumb[1])
                elif row.codec == "wav":
                    samples, rate = decode_wav_pcm16(raw)
                    feats.append(audio_features(samples, rate))
                    n_frames.append(0)
                    tw.append(None); th.append(None)
                elif row.codec == "ppmv":
                    stride = max(1, frame_stride_ms // 1000)  # synthetic 1 fps
                    frames = decode_ppmv_frames(raw, stride=stride)
                    per = [
                        image_features(resize_nearest(f, thumb[0], thumb[1]))
                        for f in frames
                    ]
                    feats.append(
                        [round(float(x), 6) for x in np.mean(per, axis=0)]
                    )
                    n_frames.append(len(frames))
                    tw.append(thumb[0]); th.append(thumb[1])
                else:
                    feats.append(decode_stub(raw, row.kind, deterministic_fake))
                    n_frames.append(
                        max(1, int(row.duration_ms or 0) // frame_stride_ms)
                        if row.kind == "video"
                        else (1 if row.kind == "image" else 0)
                    )
                    tw.append(thumb[0] if row.kind != "audio" else None)
                    th.append(thumb[1] if row.kind != "audio" else None)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "thumb_w": tw,
                    "thumb_h": th,
                    "n_frames_sampled": n_frames,
                }
            )

    return cols.mapInPandas(run, schema=FEATURE_SCHEMA)

"""Multimodal column plumbing — image/audio/video as opaque binary columns
with typed metadata, processed in Arrow-batched ``mapInPandas`` stages.

The input-hint documents table interleaves text and media spans
(kind='media', media_ref). At 100 TB the media bytes live in this sidecar
table, bucketed by media_id so span→media joins are co-partitioned:

    media(media_id string, kind string,           -- image|audio|video
          media_bytes binary, width int, height int,
          sample_rate int, duration_ms int, codec string)

Decode/resize/frame-sample are pandas-UDF stages over that table. The
actual codecs (PIL/ffmpeg/torchaudio) are NOT in this environment, so the
decode step is stubbed: ``decode_stub`` raises NotImplementedError unless
``deterministic_fake=True``, in which case it derives features from
sha256(media_bytes) — the Spark-side plumbing (schemas, batch shapes,
partitioning) is real and tested either way.

Synthetic media bytes are a pure function of media_ref (same determinism
contract as crawler/synth.py).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

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


def synthetic_media_bytes(media_ref: str, size: int = 256) -> bytes:
    """Deterministic opaque payload for a media_ref (no real codec data)."""
    h = hashlib.sha256(media_ref.encode()).digest()
    reps = (size + len(h) - 1) // len(h)
    return (h * reps)[:size]


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
                out.append(
                    dict(
                        media_id=hashlib.sha256(ref.encode()).hexdigest()[:16],
                        kind=kind,
                        media_bytes=synthetic_media_bytes(ref),
                        width=64 + h % 512 if kind != "audio" else None,
                        height=64 + (h >> 4) % 512 if kind != "audio" else None,
                        sample_rate=16000 if kind == "audio" else None,
                        duration_ms=(h % 30000) if kind != "image" else None,
                        codec={"image": "png", "audio": "pcm16", "video": "h264"}[kind],
                    )
                )
            yield pd.DataFrame(out)

    return refs.mapInPandas(gen, schema=MEDIA_SCHEMA)


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

    Batch shape: one Arrow batch of (media_id, kind, bytes, metadata) rows
    in, one batch of fixed-width feature rows out — the layout a real
    GPU/codec stage would consume."""
    cols = media.select(
        "media_id", "kind", "media_bytes", "width", "height", "duration_ms"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            feats, n_frames = [], []
            for row in pdf.itertuples(index=False):
                feats.append(decode_stub(row.media_bytes, row.kind, deterministic_fake))
                if row.kind == "video" and row.duration_ms:
                    n_frames.append(max(1, int(row.duration_ms) // frame_stride_ms))
                elif row.kind == "image":
                    n_frames.append(1)
                else:
                    n_frames.append(0)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "thumb_w": [thumb[0] if k != "audio" else None for k in pdf["kind"]],
                    "thumb_h": [thumb[1] if k != "audio" else None for k in pdf["kind"]],
                    "n_frames_sampled": n_frames,
                }
            )

    return cols.mapInPandas(run, schema=FEATURE_SCHEMA)

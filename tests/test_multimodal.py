"""Multimodal plumbing: media sidecar from spans, stubbed decode stage,
schema/batch-shape guarantees."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from earcrawler_spark.crawler.spans import SPANS_SCHEMA
from earcrawler_spark.multimodal import (
    decode_stub,
    extract_features,
    media_table_from_spans,
    synthetic_media_bytes,
)


@pytest.fixture(scope="module")
def docs_with_media(spark):
    rows = [
        (
            "d1",
            [
                ("text", "hello world", "", 0),
                ("media", "", "https://bis.doc.gov/media/2.bin", 1),
                ("media", "", "https://bis.doc.gov/media/3.bin", 2),
            ],
        ),
        ("d2", [("media", "", "https://bis.doc.gov/media/2.bin", 0)]),  # shared asset
        ("d3", [("text", "no media here", "", 0)]),
    ]
    return spark.createDataFrame(rows, f"doc_id string, spans {SPANS_SCHEMA}")


def test_media_table_dedups_assets(spark, docs_with_media):
    media = media_table_from_spans(docs_with_media)
    rows = media.collect()
    assert len(rows) == 2  # media/2.bin shared by d1+d2 decoded once
    assert {r["kind"] for r in rows} <= {"image", "audio", "video"}
    for r in rows:
        assert isinstance(bytes(r["media_bytes"]), bytes)
        if r["kind"] == "audio":
            assert r["sample_rate"] == 16000 and r["width"] is None
            assert r["codec"] == "wav"
        else:
            # metadata comes from REALLY decoding the payload header
            assert r["width"] >= 8 and r["height"] >= 8
            assert r["codec"] in ("ppm", "ppmv")


def test_extract_features_deterministic(spark, docs_with_media):
    media = media_table_from_spans(docs_with_media)
    f1 = {r["media_id"]: r for r in extract_features(media).collect()}
    f2 = {r["media_id"]: r for r in extract_features(media).collect()}
    assert set(f1) == set(f2) and len(f1) == 2
    for mid, r in f1.items():
        assert len(r["feature"]) == 8
        assert r["feature"] == f2[mid]["feature"]
        if r["kind"] == "audio":
            assert r["n_frames_sampled"] == 0 and r["thumb_w"] is None
        else:
            assert r["n_frames_sampled"] >= 1 and r["thumb_w"] == 32


def test_numpy_codecs_roundtrip():
    import numpy as np

    from earcrawler_spark.multimodal import (
        audio_features,
        decode_ppm,
        decode_ppmv_frames,
        decode_wav_pcm16,
        encode_ppm,
        encode_ppmv,
        encode_wav_pcm16,
        image_features,
        resize_nearest,
    )

    img = np.arange(10 * 6 * 3, dtype=np.uint8).reshape(10, 6, 3)
    assert (decode_ppm(encode_ppm(img)) == img).all()
    small = resize_nearest(img, 4, 4)
    assert small.shape == (4, 4, 3)
    assert len(image_features(small)) == 8

    samples = (np.sin(np.linspace(0, 20, 320)) * 20000).astype(np.int16)
    dec, rate = decode_wav_pcm16(encode_wav_pcm16(samples, 16000))
    assert rate == 16000 and (dec == samples).all()
    af = audio_features(dec, rate)
    assert len(af) == 8 and af[0] > 0.1  # real RMS, not a hash artifact

    frames = [img, img[::-1].copy(), img]
    got = decode_ppmv_frames(encode_ppmv(frames), stride=2)
    assert len(got) == 2 and (got[0] == img).all()


def test_video_frame_sampling_strides():
    import hashlib

    from earcrawler_spark.multimodal import (
        decode_ppmv_frames,
        synthetic_media_bytes,
    )

    # find a ref that hashes to 'video'
    ref = next(
        r
        for r in (f"https://x.org/m/{i}" for i in range(50))
        if int(hashlib.sha256(r.encode()).hexdigest()[:8], 16) % 3 == 2
    )
    raw = synthetic_media_bytes(ref)
    all_frames = decode_ppmv_frames(raw, stride=1)
    sampled = decode_ppmv_frames(raw, stride=2)
    assert len(sampled) == (len(all_frames) + 1) // 2


def test_decode_stub_gates_real_codecs():
    payload = synthetic_media_bytes("x")
    with pytest.raises(NotImplementedError):
        decode_stub(payload, "image", deterministic_fake=False)
    assert decode_stub(payload, "image", deterministic_fake=True) == decode_stub(
        payload, "image", deterministic_fake=True
    )


def test_media_pipeline_over_synthetic_crawl(spark, tmp_path):
    """End-to-end: crawl output documents (interleaved spans) → media
    sidecar → features; every media span resolves to exactly one asset."""
    from earcrawler_spark.crawler import synth
    from earcrawler_spark.crawler.runner import Crawler, CrawlConfig

    c = Crawler(spark, str(tmp_path / "mm"), CrawlConfig(max_iters=1, n_partitions=4))
    c.init_seeds(synth.seed_list())
    c.run(max_iters=1)
    docs = c.state.read_all("documents", 1)
    media = media_table_from_spans(docs)
    feats = extract_features(media)
    n_refs = (
        docs.select(F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "media")
        .select("s.media_ref")
        .distinct()
        .count()
    )
    assert media.count() == n_refs == feats.count()
    assert n_refs > 0


def test_media_features_query(spark):
    from earcrawler_spark.queries_media import q_media_features

    r1 = [tuple(r) for r in q_media_features(spark, "/root/testdata/sf0.001").collect()]
    r2 = [tuple(r) for r in q_media_features(spark, "/root/testdata/sf0.001").collect()]
    assert r1 == r2
    kinds = [r[0] for r in r1]
    assert kinds == sorted(kinds) and set(kinds) <= {"image", "audio", "video"}
    # distinct assets after sidecar dedup: primary pool d%120 restricted
    # by d%4!=3 (120%4==0 -> 90 reachable refs) + secondary d%40+200
    # restricted by d%8==0 (-> 5 reachable refs)
    assert sum(r[1] for r in r1) == 95
    by_kind = {r[0]: r for r in r1}
    # decode metadata (the round-6 oracled columns): images sample one
    # frame each, audio zero; video samples every synthetic frame
    assert by_kind["image"][2] == by_kind["image"][1]
    assert by_kind["audio"][2] == 0
    assert by_kind["video"][2] >= 2 * by_kind["video"][1]
    # audio carries no thumbnail; image/video thumbs are 32x32
    assert by_kind["audio"][3] is None
    assert by_kind["image"][3] == 32.0 and by_kind["video"][3] == 32.0
    # every asset's feature vector honors the fixed 8-wide contract
    assert all(r[7] == 8 for r in r1)


def test_media_manifest_matches_sidecar_identity(spark):
    """media_manifest's relational identity/kind routing must agree with
    the mapInPandas sidecar build row-for-row (same sha256-derived
    media_id and kind)."""
    from earcrawler_spark.multimodal import media_table_from_spans
    from earcrawler_spark.queries_media import _span_docs, q_media_manifest

    sf = "/root/testdata/sf0.001"
    docs = _span_docs(spark.read.parquet(f"{sf}/documents.parquet"))
    sidecar = media_table_from_spans(docs).select("media_id", "kind", "codec")
    manifest = q_media_manifest(spark, sf).select(
        "media_id", F.col("kind").alias("mkind"), F.col("codec").alias("mcodec")
    )
    joined = sidecar.join(manifest, "media_id", "full").collect()
    assert len(joined) == sidecar.count() == manifest.count()
    for r in joined:
        assert r["kind"] == r["mkind"], r
        assert r["codec"] == r["mcodec"], r

"""Unit tests for crawl-engine components (reference test style:
literal expected values — tests/core/test_ear_crawler.py:25-71)."""

from __future__ import annotations

import numpy as np

from earcrawler_spark.crawler.bloom import BloomShard, shard_of
from earcrawler_spark.crawler.canonicalize import canonicalize_one
from earcrawler_spark.crawler.robots import parse_robots_txt
from earcrawler_spark.crawler.spans import parse_html


def test_span_extraction_matches_reference_semantics():
    # reference: find_all("p") → whitespace-normalize → drop empty,
    # order preserved; media interleaved in document position.
    html = (
        "<html><body>"
        "<p>  Export   Administration\nRegulations </p>"
        '<img src="https://bis.doc.gov/media/1.bin">'
        "<p>See 85 FR 12345 for details.</p>"
        "<p>   </p><p></p>"
        '<video src="https://bis.doc.gov/media/3.bin">'
        '<a href="https://bis.doc.gov/page/2">next</a>'
        "<p>contact compliance@example.com or 202-555-1212</p>"
        "</body></html>"
    )
    spans, links = parse_html(html)
    assert spans == [
        {"kind": "text", "text": "Export Administration Regulations", "media_ref": "", "offset": 0},
        {"kind": "media", "text": "", "media_ref": "https://bis.doc.gov/media/1.bin", "offset": 1},
        {"kind": "text", "text": "See 85 FR 12345 for details.", "media_ref": "", "offset": 2},
        {"kind": "media", "text": "", "media_ref": "https://bis.doc.gov/media/3.bin", "offset": 3},
        {"kind": "text", "text": "contact compliance@example.com or 202-555-1212", "media_ref": "", "offset": 4},
    ]
    assert links == ["https://bis.doc.gov/page/2"]


def test_canonicalize():
    cases = {
        "HTTPS://BIS.DOC.GOV/page/1#frag": "https://bis.doc.gov/page/1",
        "https://bis.doc.gov:443/page/1": "https://bis.doc.gov/page/1",
        "http://example.com:8080/a//b": "http://example.com:8080/a/b",
        "https://x.org/p?b=2&a=1": "https://x.org/p?a=1&b=2",
        "https://x.org/p?utm_source=feed&a=1": "https://x.org/p?a=1",
        "https://x.org": "https://x.org/",
    }
    for raw, want in cases.items():
        assert canonicalize_one(raw) == want, raw
    # idempotent
    for want in cases.values():
        assert canonicalize_one(want) == want


def test_bloom_no_false_negatives():
    import hashlib

    keys = [hashlib.sha256(f"url-{i}".encode()).hexdigest() for i in range(5000)]
    b = BloomShard(1 << 16, 7)
    b.add_many(keys)
    assert b.contains_many(keys).all()
    other = [hashlib.sha256(f"other-{i}".encode()).hexdigest() for i in range(5000)]
    fp = b.contains_many(other).mean()
    assert fp < 0.05, f"false-positive rate too high: {fp}"
    # OR-merge preserves membership
    b2 = BloomShard(1 << 16, 7)
    b2.add_many(other)
    merged = b.union(b2)
    assert merged.contains_many(keys).all() and merged.contains_many(other).all()
    # serialization round-trip
    back = BloomShard.from_bytes(merged.to_bytes())
    assert np.array_equal(back.bits, merged.bits)
    assert 0 <= shard_of(keys[0], 16) < 16


def test_robots_parse():
    dis, delay = parse_robots_txt(
        "User-agent: *\nDisallow: /private\nDisallow: /tmp\nCrawl-delay: 2.5\n# c"
    )
    assert dis == ["/private", "/tmp"]
    assert delay == 2.5
    assert parse_robots_txt("") == ([], 1.0)

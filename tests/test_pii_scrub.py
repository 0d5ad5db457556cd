"""PII scrub parity vectors vs an independent model of the reference
redaction chain (privacy/redaction.py:7-45): phone variants (+1, dots,
spaces), UNC/home/unix/windows paths, bearer and 20+-char tokens, URL
query stripping, GUID/SSN/email."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from earcrawler_spark.functions.text import pii_scrub


def model(text: str) -> str:
    value = text
    value = re.sub(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>", value)
    value = re.sub(
        r"[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}",
        "<GUID>", value,
    )
    value = re.sub(r"(?:bearer\s+)?[A-Za-z0-9\-_=]{20,}", "<TOKEN>", value, flags=re.I)
    value = re.sub(
        r"https?://[^\s?]+(?:\?[^\s#]+)",
        lambda m: m.group(0).partition("?")[0].partition("#")[0], value,
    )
    value = re.sub(
        r"(?:[A-Za-z]:\\[^\s]+|\\\\[^\s]+|~/[^\s]+|(?<![A-Za-z0-9:/])/(?!/)[^\s]+)",
        "<PATH>", value,
    )
    value = re.sub(
        r"\b(?:\+?1[-.\s]?)?(?:\(\d{3}\)|\d{3})[-.\s]?\d{3}[-.\s]?\d{4}\b",
        "<PHONE>", value,
    )
    value = re.sub(r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>", value)
    return " ".join(value.split())


CASES = [
    "call +1 202.555.1212 or 202 555 1212 or 202-555-1212",
    "see \\\\host\\share\\f.txt and ~/secrets/id and /etc/passwd and C:\\Users\\x",
    "auth bearer abcdefghijklmnopqrstuvwx and raw 12345678901234567890- done",
    "mail a.b@c.org visit https://x.org/a?q=1#frag keep http://y.io/p",
    "id 550e8400-e29b-41d4-a716-446655440000 ssn 123-45-6789",
    "ratio 1/2 and a/b and x//y stay; (/tmp/x) goes",
    "nothing sensitive here at all",
]


def test_scrub_matches_reference_model(spark):
    df = spark.createDataFrame(list(enumerate(CASES)), "i int, t string")
    got = {
        r["i"]: r["s"]
        for r in df.select("i", pii_scrub(F.col("t")).alias("s")).collect()
    }
    for i, c in enumerate(CASES):
        assert got[i] == model(c), (c, got[i], model(c))

"""Seeded grammar-fuzz sweeps for the reference-fidelity scalar
operators: each generates a few hundred random inputs, runs ONE Spark
pass, and compares row-exact against an independent Python model of the
reference rules (the chunking sweep in test_chunking_sections.py caught
two real divergences this way)."""

from __future__ import annotations

import random
import re
from datetime import datetime
from urllib.parse import quote

import pytest
from pyspark.sql import functions as F

SEED = 20260816


def test_fuzz_mention_scoring(spark):
    from earcrawler_spark.operators.mentions import mention_score
    from tests.test_mentions import VECTORS  # reuse nothing; model below

    stop = {"inc", "corp", "co", "co.", "company", "companies", "corporation",
            "group", "limited", "ltd", "llc", "holding", "holdings",
            "international"}

    def model(text, cand, window=8):
        tok = lambda s: [t.lower() for t in re.findall(r"[A-Za-z0-9']+", s)]
        tt, ct = tok(text), tok(cand)
        core = [t for t in ct if t not in stop]
        if not core or not tt:
            return 0.0
        def seq(p):
            return any(tt[i:i + len(p)] == p for i in range(len(tt) - len(p) + 1))
        if ct and seq(ct):
            return 1.0
        if seq(core):
            return 0.85
        target = set(core)
        for s in range(len(tt)):
            if target <= set(tt[s:s + window]):
                return 0.65
        acr = "".join(t[0] for t in core)
        initials = "".join(t[0] for t in tt)
        if len(acr) >= 2 and acr in initials:
            return 0.45
        return 0.0

    rng = random.Random(SEED)
    words = ["acme", "timber", "Inc", "export", "a1", "o'brien", "LLC",
             "beta", "x", "Corp", "trade", "holdings"]
    cases = []
    for i in range(250):
        text = " ".join(rng.choice(words) for _ in range(rng.randint(0, 14)))
        cand = " ".join(rng.choice(words) for _ in range(rng.randint(0, 4)))
        cases.append((i, text, cand))
    df = spark.createDataFrame(cases, "i int, t string, c string")
    got = {
        r["i"]: r["s"]
        for r in df.select("i", mention_score(F.col("t"), F.col("c")).alias("s")).collect()
    }
    for i, t, c in cases:
        assert got[i] == pytest.approx(model(t, c)), (t, c, got[i], model(t, c))


def test_fuzz_pii_scrub(spark):
    from earcrawler_spark.functions.text import pii_scrub
    from tests.test_pii_scrub import model

    rng = random.Random(SEED)
    atoms = [
        "plain", "words", "a.b@c.org", "x@y.io", "550e8400-e29b-41d4-a716-446655440000",
        "bearer abcdefghijklmnopqrstuvwx", "12345678901234567890-", "shorttok",
        "https://x.org/a?q=1#f", "http://y.io/p", "C:\\Users\\x", "\\\\host\\share",
        "~/sec/id", "/etc/passwd", "a/b", "1/2", "(/tmp/x)",
        "+1 202.555.1212", "202-555-1212", "(202) 555-1212", "202 555 1212",
        "123-45-6789", "12-345", "end.",
    ]
    cases = [
        (i, " ".join(rng.choice(atoms) for _ in range(rng.randint(1, 8))))
        for i in range(250)
    ]
    df = spark.createDataFrame(cases, "i int, t string")
    got = {
        r["i"]: r["s"]
        for r in df.select("i", pii_scrub(F.col("t")).alias("s")).collect()
    }
    for i, t in cases:
        assert got[i] == model(t), (t, got[i], model(t))


def test_fuzz_date_normalization(spark):
    from earcrawler_spark.functions.text import DEFAULT_DATE, normalise_date

    def model(value):
        date_str = (value or DEFAULT_DATE).strip()
        try:
            return datetime.fromisoformat(date_str).date().isoformat()
        except ValueError:
            if len(date_str) == 10 and date_str[4] == "-" and date_str[7] == "-":
                return date_str
            return DEFAULT_DATE

    rng = random.Random(SEED)

    def rand_date():
        kind = rng.random()
        y, m, d = rng.randint(1969, 2030), rng.randint(0, 19), rng.randint(0, 39)
        if kind < 0.35:
            return f"{y:04d}-{m:02d}-{d:02d}"
        if kind < 0.5:
            return f"{y:04d}-{m:02d}-{d:02d}T{rng.randint(0,23):02d}:{rng.randint(0,59):02d}:00"
        if kind < 0.6:
            return f"{y:04d}{m:02d}{d:02d}"
        if kind < 0.7:
            return rng.choice(["", "  ", None])
        if kind < 0.8:
            return f"{y}-{m}-{d}"  # unpadded
        return rng.choice(["garbage", "2024/01/02", "01-02-2024", "2024-1"])

    cases = [(i, rand_date()) for i in range(300)]
    df = spark.createDataFrame(cases, "i int, v string")
    got = {
        r["i"]: r["n"]
        for r in df.select("i", normalise_date(F.col("v")).alias("n")).collect()
    }
    for i, v in cases:
        assert got[i] == model(v), (v, got[i], model(v))


def test_fuzz_record_entity_merge(spark):
    from pyspark.sql.types import (
        ArrayType, LongType, MapType, StringType, StructField, StructType,
    )

    from earcrawler_spark.operators.records import merge_corpus_records

    def model(frags):
        out = {}
        by_rid = {}
        for f in frags:
            by_rid.setdefault(f[0], []).append(f)
        for rid, fs in by_rid.items():
            fs_sorted = sorted(fs, key=lambda f: f[1])
            ids = sorted({f[2] for f in fs})
            def first_nonempty(idx):
                for f in fs_sorted:
                    if f[idx]:
                        return f[idx]
                return None
            ents = {}
            for f in fs:
                for bucket_raw, vals in (f[5] or {}).items():
                    b = bucket_raw.strip().upper()
                    if not b:
                        continue
                    clean = {v.strip() for v in vals if v and v.strip()}
                    if clean:
                        ents.setdefault(b, set()).update(clean)
            out[rid] = {
                "identifiers": ids,
                "source_url": first_nonempty(4),
                # empty fingerprints neither conflict nor participate
                "conflict": len({f[3] for f in fs if f[3]}) > 1,
                "entities": {b: sorted(v) for b, v in ents.items()},
            }
        return out

    rng = random.Random(SEED)
    buckets = ["ORG", " org ", "PROGRAM", "", "x"]
    names = ["Acme", " Beta ", "", "Gamma", "D-1"]
    frags = []
    for i in range(300):
        rid = f"r{rng.randint(0, 40)}"
        ents = {
            rng.choice(buckets): [rng.choice(names) for _ in range(rng.randint(0, 3))]
            for _ in range(rng.randint(0, 2))
        }
        frags.append((
            rid, i, f"id{i}",
            rng.choice(["fp0", "fp0", "fp0", "fp1", ""]),
            rng.choice([None, "", f"https://u/{i}"]), ents,
        ))
    schema = StructType([
        StructField("record_id", StringType()),
        StructField("seq", LongType()),
        StructField("identifier", StringType()),
        StructField("content_sha256", StringType()),
        StructField("source_url", StringType()),
        StructField("entities", MapType(StringType(), ArrayType(StringType()))),
    ])
    rows = [
        (rid, seq, ident, fp, url, ents, None, None, None, "t")
        for rid, seq, ident, fp, url, ents in frags
    ]
    full_schema = StructType(
        schema.fields[:5]
        + [StructField(c, StringType()) for c in ("date", "provider", "section", "paragraph")]
        + [schema.fields[5]]
    )
    df = spark.createDataFrame(
        [(r[0], r[1], r[2], r[3], r[4], r[6], r[7], r[8], r[9], r[5]) for r in rows],
        full_schema,
    )
    got = {
        r["record_id"]: r.asDict() for r in merge_corpus_records(df).collect()
    }
    want = model(frags)
    assert set(got) == set(want)
    for rid, w in want.items():
        g = got[rid]
        assert g["identifiers"] == w["identifiers"], rid
        assert g["source_url"] == w["source_url"], (rid, g["source_url"], w["source_url"])
        assert g["conflict"] == w["conflict"], rid
        assert g["entities"] == w["entities"], (rid, g["entities"], w["entities"])


def test_fuzz_temporal_classification(spark):
    import datetime as dt

    from earcrawler_spark.operators.temporal import classify_temporal

    AS_OF = "2020-06-15"

    def model(rows):
        as_of = dt.date.fromisoformat(AS_OF)
        chosen = {}
        for r in rows:
            _, sec, snap, _, _ = r
            if sec and snap and snap <= as_of:
                if sec not in chosen or snap > chosen[sec]:
                    chosen[sec] = snap
        out = {}
        for doc_id, sec, snap, eff_from, eff_to in rows:
            if eff_from or eff_to:
                if eff_from and as_of < eff_from:
                    st = ("future", "effective_from_after_query_date")
                elif eff_to and as_of > eff_to:
                    st = ("expired", "effective_to_before_query_date")
                else:
                    st = ("applicable", "within_effective_window")
            elif sec and snap:
                c = chosen.get(sec)
                if c is None:
                    st = ("future", "no_snapshot_at_or_before_query_date")
                elif snap == c:
                    st = ("applicable", "latest_snapshot_at_or_before_query_date")
                elif snap > as_of:
                    st = ("future", "snapshot_after_query_date")
                else:
                    st = ("superseded", "older_snapshot_superseded_for_query_date")
            else:
                st = ("unknown", "no_temporal_metadata")
            out[doc_id] = st
        return out

    rng = random.Random(SEED)

    def rand_date():
        if rng.random() < 0.3:
            return None
        return dt.date(2020, rng.randint(1, 12), rng.randint(1, 28))

    rows = []
    for i in range(300):
        sec = rng.choice([None, "A", "B", "C", "D"])
        rows.append((i, sec, rand_date(), rand_date(), rand_date()))
    schema = ("doc_id long, section_id string, snapshot_date date, "
              "effective_from date, effective_to date")
    got = {
        r["doc_id"]: (r["temporal_status"], r["temporal_reason"])
        for r in classify_temporal(spark.createDataFrame(rows, schema), AS_OF).collect()
    }
    want = model(rows)
    for i in range(300):
        assert got[i] == want[i], (rows[i], got[i], want[i])


def test_fuzz_iri_quote_and_sections(spark):
    from earcrawler_spark.functions import iri as I

    def model_section(value):
        raw = str(value or "").strip()
        if not raw:
            return None
        if raw.upper().startswith("EAR-"):
            if "#" in raw:
                raw = raw.split("#", 1)[0].strip()
            return raw
        m = re.match(r"^(?:15\s*CFR\s*)?(\d{3}(?:\.\S+)?)$", raw, re.IGNORECASE)
        if m:
            return f"EAR-{m.group(1)}"
        return raw

    rng = random.Random(SEED)
    frags = ["736", "744.11", "15 CFR 740.2", "EAR-734.3#p1", "Part 9",
             "§x", "a b#c", "15cfr736", "903.1a", "73"]

    cases = [(i, rng.choice(frags) + rng.choice(["", " ", "#z", ".x"]))
             for i in range(200)]
    df = spark.createDataFrame(cases, "i int, v string")
    got = {
        r["i"]: (r["s"], r["q"])
        for r in df.select(
            "i",
            I.canonical_section_id(F.col("v")).alias("s"),
            I.quote_segment(F.col("v")).alias("q"),
        ).collect()
    }
    for i, v in cases:
        assert got[i][0] == model_section(v), (v, got[i][0], model_section(v))
        assert got[i][1] == quote(v, safe="-._~"), (v, got[i][1])

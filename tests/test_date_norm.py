"""normalise_date vs a model of corpus/metadata.py:24-31 on edge vectors."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from earcrawler_spark.queries_fidelity import DEFAULT_DATE, normalise_date


def model(value):
    date_str = (value or DEFAULT_DATE).strip()
    try:
        return datetime.fromisoformat(date_str).date().isoformat()
    except ValueError:
        if len(date_str) == 10 and date_str[4] == "-" and date_str[7] == "-":
            return date_str
        return DEFAULT_DATE


CASES = [
    None, "", "   ", "1998-07-04", "1998-07-04T10:30:00",
    "1998-07-04 10:30:00", "1998-07-04T10:30:00+05:00",
    "1998-13-45",        # shaped but unparseable -> kept verbatim
    "1998-02-30",        # shaped, invalid day -> kept verbatim
    "not a date", "19980102", "98-07-04",
    "1998-7-4",          # unpadded: fromisoformat rejects -> DEFAULT
    "1998-07-04T10",     # hour-only time, fromisoformat accepts
    "1998-07-04T10+05:00",
    "1998-07-04T10:30:00,123456",  # comma fractional seconds
    "1998-07-04T10:30:00.123456",
]


def test_date_norm_matches_model(spark):
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(CASES)], "i int, v string"
    )
    got = {
        r["i"]: r["n"]
        for r in df.select("i", normalise_date(F.col("v")).alias("n")).collect()
    }
    for i, c in enumerate(CASES):
        assert got[i] == model(c), (c, got[i], model(c))

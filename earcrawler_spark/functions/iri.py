"""Canonical IRI minting + legacy-IRI canonicalization — reference parity
with earCrawler/kg/iri.py:21-122 (namespaces kg/namespaces.py:12-20).

All builders are native Column expressions. Percent-encoding is the
RFC3986 unreserved-set quote re-expressed as a per-character transform
(split -> when(unreserved) -> %XX via ascii/hex) — byte-identical to
urllib.parse.quote on ASCII input (this engine's corpus domain; non-ASCII
would need per-UTF-8-byte encoding, noted here rather than hidden).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SCHEMA_NS = "https://ear.example.org/schema#"
RESOURCE_NS = "https://ear.example.org/resource/"
GRAPH_NS = "https://ear.example.org/graph/"
ENTITY_NS = "https://ear.example.org/entity/"
LEGACY_EAR = "https://example.org/ear#"
LEGACY_ENT = "https://example.org/entity#"

_UNRESERVED = r"^[A-Za-z0-9._~-]$"
_SECTION_RE = r"^(?i)(?:15\s*CFR\s*)?(\d{3}(?:\.\S+)?)$"
_SHA256_RE = r"^[0-9a-fA-F]{64}$"


def quote_segment(col: Column) -> Column:
    """urllib.parse.quote(value, safe='-._~'): unreserved characters pass
    through, everything else percent-encodes its UTF-8 BYTES (hex(encode)
    gives the byte string; '%' is injected per byte pair) — byte-identical
    to urllib for any input, fuzz-verified."""
    chars = F.filter(F.split(col, ""), lambda c: c != "")
    return F.array_join(
        F.transform(
            chars,
            lambda c: F.when(c.rlike(_UNRESERVED), c).otherwise(
                F.regexp_replace(F.hex(F.encode(c, "UTF-8")), "(..)", r"%$1")
            ),
        ),
        "",
    )


def canonical_section_id(col: Column) -> Column:
    """iri.py:21-32: 'EAR-' passthrough (fragment stripped), '15 CFR ddd'
    or bare 'ddd[.x]' -> 'EAR-ddd[.x]', anything else unchanged; empty ->
    null."""
    raw = F.trim(col)
    ear = F.trim(F.element_at(F.split(raw, "#", 2), 1))
    sec = F.regexp_extract(raw, _SECTION_RE, 1)
    return (
        F.when(raw == "", F.lit(None).cast("string"))
        .when(F.upper(raw).startswith("EAR-"), ear)
        .when(sec != "", F.concat(F.lit("EAR-"), sec))
        .otherwise(raw)
    )


def section_iri(col: Column) -> Column:
    canonical = F.coalesce(canonical_section_id(col), F.trim(col))
    return F.concat(F.lit(RESOURCE_NS + "ear/section/"), quote_segment(canonical))


def paragraph_iri(col: Column) -> Column:
    """iri.py:46-55: sha256 identity tokens shorten to their first 16 hex
    chars (lowered); other tokens percent-encode."""
    token = F.trim(col)
    encoded = F.when(
        token.rlike(_SHA256_RE), F.lower(F.substring(token, 1, 16))
    ).otherwise(quote_segment(token))
    return F.concat(F.lit(RESOURCE_NS + "ear/paragraph/"), encoded)


def entity_iri(col: Column) -> Column:
    norm = F.regexp_replace(F.trim(col), " ", "_")
    return F.concat(F.lit(ENTITY_NS), quote_segment(norm))


def resource_iri_segments(col: Column) -> Column:
    """resource IRI from a path-like string: split on '/', quote each
    non-empty segment (iri.py:66-72 applied to a pre-split fragment)."""
    segs = F.filter(
        F.transform(F.split(col, "/"), lambda s: F.trim(s)), lambda s: s != ""
    )
    return F.concat(
        F.lit(RESOURCE_NS),
        F.array_join(F.transform(segs, lambda s: quote_segment(s)), "/"),
    )


def canonicalize_iri(col: Column) -> Column:
    """Legacy-namespace rewrite (iri.py:82-122): idempotent, best-effort;
    unknown IRIs pass through unchanged."""
    raw = F.trim(col)
    ear_frag = F.substring(raw, len(LEGACY_EAR) + 1, 1 << 20)
    ent_frag = F.substring(raw, len(LEGACY_ENT) + 1, 1 << 20)
    ear_rewrite = (
        F.when(ear_frag == "reg", F.lit(RESOURCE_NS + "ear/reg"))
        .when(
            ear_frag.startswith("p_"),
            paragraph_iri(F.substring(ear_frag, 3, 1 << 20)),
        )
        .when(
            ear_frag.startswith("s_"),
            section_iri(
                F.regexp_replace(F.substring(ear_frag, 3, 1 << 20), "_", ".")
            ),
        )
        .when(
            ear_frag.startswith("entity/"),
            entity_iri(F.substring(ear_frag, 8, 1 << 20)),
        )
        .when(
            ear_frag.contains("/"),
            resource_iri_segments(F.concat(F.lit("ear/"), ear_frag)),
        )
        .otherwise(F.concat(F.lit(SCHEMA_NS), ear_frag))
    )
    ent_rewrite = F.when(
        (ent_frag == "Entity") | ent_frag.endswith("Shape"),
        F.concat(F.lit(SCHEMA_NS), ent_frag),
    ).otherwise(entity_iri(ent_frag))
    return (
        F.when(raw == "", raw)
        .when(
            raw.startswith(RESOURCE_NS)
            | raw.startswith(ENTITY_NS)
            | raw.startswith(GRAPH_NS)
            | raw.startswith(SCHEMA_NS),
            raw,
        )
        .when(raw.startswith(LEGACY_EAR), ear_rewrite)
        .when(raw.startswith(LEGACY_ENT), ent_rewrite)
        .otherwise(raw)
    )


def apply_version_suffix(doc_id, version_suffix) -> Column:
    """rag/temporal.py:70-83 apply_version_suffix: attach a version
    suffix while preserving existing '#'-suffixes — 'id' -> 'id#v',
    'id#p1' -> 'id#v:p1', already-versioned ids ('id#v' / 'id#v:rest')
    pass through; empty id or suffix is a no-op."""
    did = F.regexp_replace(F.coalesce(doc_id, F.lit("")), r"^\s+|\s+$", "")
    suf = F.regexp_replace(F.coalesce(version_suffix, F.lit("")), r"^\s+|\s+$", "")
    left = F.substring_index(did, "#", 1)
    right = F.substring(did, F.length(left) + 2, 1 << 20)
    return (
        F.when((did == "") | (suf == ""), did)
        .when(~did.contains("#"), F.concat(did, F.lit("#"), suf))
        .when(
            (right == suf) | right.startswith(F.concat(suf, F.lit(":"))),
            did,
        )
        .otherwise(F.concat(left, F.lit("#"), suf, F.lit(":"), right))
    )

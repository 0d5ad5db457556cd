"""Identifier-consistency gate — reference parity with
scripts/eval/check_id_consistency.py (earCrawler).

The reference checks that every expected EAR section id referenced by the
eval datasets (ear_sections, expected.citations, evidence doc-span ids)
exists exactly once in the retrieval corpus and exactly once in the KG
under its canonical IRI — classifying each section as ok /
missing_in_corpus / duplicate_in_corpus / missing_in_kg /
duplicate_in_kg / noncanonical_in_kg, and counting dataset references
that fail normalization (check_id_consistency.py:348-471).

Spark shape: the KG is scanned as a line relation with ONE
regexp_extract_all pass per pattern (canonical section IRIs, legacy
``ear:s_*`` tokens — :17-21, :244-261); sections classify via
broadcast-sized joins keyed by section id (the section dimension is
metadata-scale even when the KG line relation is billions of rows), and
every aggregate is a partial-agg-friendly sum of flags — no windows, no
driver-side iteration.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from earcrawler_spark.functions.iri import RESOURCE_NS
from earcrawler_spark.sources import normalize_ear_section_id

SECTION_IRI_PREFIX = RESOURCE_NS + "ear/section/"
# check_id_consistency.py:18-21
_CANONICAL_RE = (
    r"https://ear\.example\.org/resource/ear/section/([A-Za-z0-9\-._~%]+)"
)
_LEGACY_RE = r"\bear:s_([A-Za-z0-9_]+)\b"


def pct_unquote(col: Column) -> Column:
    """urllib.parse.unquote on the ASCII domain: '%'-split; each later
    fragment decodes its 2-hex head (decode(unhex(..))) and keeps its
    tail; a fragment without a decodable head keeps its literal '%'.
    Only ASCII-range pairs (00-7F) decode — a pair >= 0x80 stays
    literal rather than crashing the scan on an invalid standalone
    UTF-8 byte (urllib would splice multi-byte sequences across
    fragments; same corpus-domain caveat as
    functions.iri.quote_segment, and a malformed KG line must never
    kill the job)."""
    parts = F.split(col, "%")
    head = F.element_at(parts, 1)
    rest = F.slice(parts, 2, F.greatest(F.size(parts) - 1, F.lit(0)))
    return F.concat(
        head,
        F.array_join(
            F.transform(
                rest,
                lambda p: F.when(
                    F.substring(p, 1, 2).rlike("^[0-7][0-9a-fA-F]$"),
                    F.concat(
                        F.decode(F.unhex(F.substring(p, 1, 2)), "UTF-8"),
                        F.substring(p, 3, 1 << 20),
                    ),
                ).otherwise(F.concat(F.lit("%"), p)),
            ),
            "",
        ),
    )


def legacy_token_to_section(col: Column) -> Column:
    """_legacy_token_to_section_id (check_id_consistency.py:229-241):
    '_'-split tokens; first must be a 3-digit part, second numeric; the
    rest append as lowercase paren tails; then the strict normalizer."""
    toks = F.filter(F.split(col, "_"), lambda t: t != "")
    t0 = F.element_at(toks, 1)
    t1 = F.when(F.size(toks) >= 2, F.element_at(toks, 2))
    tails = F.when(
        F.size(toks) >= 3,
        F.array_join(
            F.transform(
                F.slice(toks, 3, F.greatest(F.size(toks) - 2, F.lit(0))),
                lambda t: F.concat(F.lit("("), F.lower(t), F.lit(")")),
            ),
            "",
        ),
    ).otherwise(F.lit(""))
    body = F.concat(t0, F.lit("."), t1, tails)
    ok = (F.size(toks) >= 2) & t0.rlike(r"^\d{3}$") & t1.rlike(r"^\d+$")
    return F.when(ok, normalize_ear_section_id(body))


def scan_kg_sections(lines: DataFrame, line_col: str = "line"):
    """_scan_kg_sections (check_id_consistency.py:244-261) as two
    single-pass extract+explode relations over the raw KG line relation:
    distinct canonical (section_id, iri) pairs and distinct legacy
    section ids (tokens that fail the part/number grammar drop, exactly
    like the reference's None returns)."""
    c = F.col(line_col)
    # Dedup the RAW extracted token before the (very large) normalizer
    # expression runs: (a) the heavy unquote+normalize tree then executes
    # once per distinct token instead of once per occurrence — the right
    # cost model when the same section IRI appears on billions of KG
    # lines — and (b) it keeps the Generate stage's codegen method small
    # (explode+string only); fusing the normalizer into the explode
    # consume path overflows janino's 64 KB method limit and silently
    # drops the whole stage to interpreted mode.
    canonical = (
        lines.select(
            F.explode(F.regexp_extract_all(c, F.lit(_CANONICAL_RE), 1)).alias(
                "encoded"
            )
        )
        .distinct()
        .select(
            normalize_ear_section_id(pct_unquote(F.col("encoded"))).alias(
                "section_id"
            ),
            F.concat(F.lit(SECTION_IRI_PREFIX), F.col("encoded")).alias("iri"),
        )
        .filter(F.col("section_id").isNotNull())
        .distinct()
    )
    legacy = (
        lines.select(
            F.explode(F.regexp_extract_all(c, F.lit(_LEGACY_RE), 1)).alias(
                "tok"
            )
        )
        .distinct()
        .select(legacy_token_to_section(F.col("tok")).alias("section_id"))
        .filter(F.col("section_id").isNotNull())
        .distinct()
    )
    return canonical, legacy

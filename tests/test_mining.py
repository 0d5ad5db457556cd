"""Corpus mining & audit operators (queries_mining): duplicated-span
coverage, n-gram novelty, TF-IDF keywords, curation verdict ladder,
Zipf fit, cross-source overlap.  Seeded fixtures assert the semantics
(interval union, ladder precedence, boilerplate cap) — the strict
oracle sweep in test_queries_oracle.py covers engine parity."""

from __future__ import annotations

import math

SF = "/root/testdata/sf0.001"

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars int"


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(rows, DOC_SCHEMA)
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def _words(n, prefix="w"):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_dup_span_coverage_interval_union_exact(spark, tmp_path):
    """Two docs share a 12-token run at DIFFERENT offsets (shift the
    chunk_dedup grid misses): the run yields 5 duplicated 8-windows per
    doc whose union is exactly 12 tokens; the unique tail contributes
    nothing."""
    from earcrawler_spark.queries_mining import q_dup_span_coverage

    shared = _words(12, "dup")
    rows = [
        (1, shared + " " + _words(20, "a"), "en", "s0", 0),
        (2, _words(3, "b") + " " + shared + " " + _words(9, "c"), "en", "s0", 0),
        (3, _words(30, "z"), "en", "s1", 0),
    ]
    out = {r["doc_id"]: r for r in q_dup_span_coverage(spark, _write_docs(spark, tmp_path, rows)).collect()}
    for d in (1, 2):
        assert out[d]["dup_windows"] == 5          # starts 0..4 of the 12-run
        assert out[d]["covered_tok"] == 12         # merged island, not 5*8
        assert out[d]["coverage"] == round(12 / out[d]["n_tok"], 6)
    assert out[3]["dup_windows"] == 0 and out[3]["covered_tok"] == 0
    assert out[3]["coverage"] == 0.0


def test_dup_span_coverage_disjoint_islands_sum(spark, tmp_path):
    """Two separate duplicated runs in one doc must count as two
    islands whose sizes add (no bridging across the unique gap)."""
    from earcrawler_spark.queries_mining import q_dup_span_coverage

    r1, r2 = _words(8, "p"), _words(8, "q")
    rows = [
        (1, r1 + " " + _words(10, "gap") + " " + r2, "en", "s0", 0),
        (2, r1 + " " + _words(10, "other") + " " + r2, "en", "s0", 0),
    ]
    out = {r["doc_id"]: r for r in q_dup_span_coverage(spark, _write_docs(spark, tmp_path, rows)).collect()}
    assert out[1]["covered_tok"] == 16 and out[2]["covered_tok"] == 16


def test_curation_verdict_ladder_precedence(spark, tmp_path):
    """First failing rung wins: a 5-token single-word doc is too_short
    (not high_repeat); a 30-token doc of one word is high_repeat (not
    low_diversity); a diverse long doc keeps."""
    from earcrawler_spark.queries_mining import q_curation_verdict

    rows = [
        (1, "x x x x x", "en", "s0", 0),
        (2, " ".join(["y"] * 30), "en", "s0", 0),
        (3, _words(30), "en", "s0", 0),
        # 30 tokens over 8 distinct, max count 5 (<1/6*30=5? 6*5>=30 fires
        # high_repeat first — craft max 4 instead: 28 tokens, 7 distinct x4)
        (4, " ".join(f"d{i % 7}" for i in range(28)), "en", "s0", 0),
    ]
    out = {r["doc_id"]: r for r in q_curation_verdict(spark, _write_docs(spark, tmp_path, rows)).collect()}
    assert (out[1]["verdict"], out[1]["reason"]) == ("drop", "too_short")
    assert (out[2]["verdict"], out[2]["reason"]) == ("drop", "high_repeat")
    assert (out[3]["verdict"], out[3]["reason"]) == ("keep", "ok")
    assert (out[4]["verdict"], out[4]["reason"]) == ("drop", "low_diversity")


def test_ngram_novelty_copy_scores_zero(spark, tmp_path):
    """A verbatim copy of an earlier doc contributes zero novel grams;
    the original keeps novelty 1.0."""
    from earcrawler_spark.queries_mining import q_ngram_novelty

    text = _words(20)
    rows = [
        (1, text, "en", "s0", 0),
        (2, text, "en", "s0", 0),
        (3, _words(20, "fresh"), "en", "s0", 0),
    ]
    out = {r["doc_id"]: r for r in q_ngram_novelty(spark, _write_docs(spark, tmp_path, rows)).collect()}
    assert out[1]["novelty"] == 1.0
    assert out[2]["novelty"] == 0.0 and out[2]["novel_grams"] == 0
    assert out[3]["novelty"] == 1.0


def test_tfidf_rare_term_outranks_common(spark, tmp_path):
    """A term unique to one doc must outrank corpus-wide terms there;
    all-zero-idf docs fall back to lexicographic term order."""
    from earcrawler_spark.queries_mining import TFIDF_K, q_tfidf_topk

    common = _words(10, "c")
    rows = [
        (1, common + " unicorn unicorn", "en", "s0", 0),
        (2, common, "en", "s0", 0),
        (3, common, "en", "s0", 0),
    ]
    out = q_tfidf_topk(spark, _write_docs(spark, tmp_path, rows)).collect()
    per_doc: dict = {}
    for r in out:
        per_doc.setdefault(r["doc_id"], []).append(r)
    assert per_doc[1][0]["term"] == "unicorn"
    assert per_doc[1][0]["score"] == round(2 * round(math.log(3) * 1e6) / 1e6, 6)
    # docs 2/3: every term df=3 -> idf 0 -> ties break on term string
    assert [r["term"] for r in per_doc[2]] == sorted(
        [r["term"] for r in per_doc[2]]
    )
    assert all(len(v) == TFIDF_K for v in per_doc.values())
    assert all(r["rank"] == i + 1 for v in per_doc.values() for i, r in enumerate(v))


def test_zipf_fit_matches_lstsq_model(spark, tmp_path):
    """Slope must equal the closed-form least squares on (ln rank,
    ln freq) of the constructed frequency profile, and hapax/vocab
    statistics must be exact."""
    from earcrawler_spark.queries_mining import q_zipf_fit

    # freq profile: a:8 b:4 c:2 d:1 e:1  (hapax = d, e)
    text = " ".join(["a"] * 8 + ["b"] * 4 + ["c"] * 2 + ["d", "e"])
    out = q_zipf_fit(spark, _write_docs(spark, tmp_path, [(1, text, "en", "s0", 0)])).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["vocab_size"], r["hapax"], r["total_tok"]) == (5, 2, 16)
    assert r["hapax_frac"] == 0.4
    xs = [round(math.log(k + 1) * 1e6) for k in range(5)]
    ys = [round(math.log(c) * 1e6) for c in (8, 4, 2, 1, 1)]
    n = 5
    num = n * sum(x * y for x, y in zip(xs, ys)) - sum(xs) * sum(ys)
    den = n * sum(x * x for x in xs) - sum(xs) ** 2
    assert r["zipf_slope"] == round(num / den, 6)
    assert r["zipf_slope"] < 0


def test_zipf_fit_real_corpus_slopes_negative(spark):
    from earcrawler_spark.queries_mining import q_zipf_fit

    for r in q_zipf_fit(spark, SF).collect():
        assert r["zipf_slope"] < 0
        assert r["vocab_size"] >= r["hapax"]


def test_cross_source_overlap_boilerplate_cap(spark, tmp_path):
    """A shingle present in MORE than OVERLAP_SRC_CAP sources is
    boilerplate: it must neither create pairs nor count in totals,
    while a 2-source shingle still registers with exact Jaccard."""
    from earcrawler_spark.queries_mining import OVERLAP_SRC_CAP, q_cross_source_overlap

    boiler = _words(8, "nav")
    niche = _words(8, "share")
    rows = [(i, boiler, "en", f"s{i}", 0) for i in range(OVERLAP_SRC_CAP + 1)]
    rows += [
        (100, niche + " " + _words(4, "xa"), "en", "s0", 0),
        (101, niche + " " + _words(4, "xb"), "en", "s1", 0),
    ]
    out = q_cross_source_overlap(spark, _write_docs(spark, tmp_path, rows)).collect()
    assert len(out) == 1  # only the niche share survives the cap
    r = out[0]
    assert (r["src_a"], r["src_b"]) == ("s0", "s1")
    # each side: 5 windows from the 12-token doc (niche+4 uniques)
    assert r["shared_grams"] == 1 and r["na"] == 5 and r["nb"] == 5
    assert r["jaccard"] == round(1 / 9, 6)

"""Training-data curation operators (queries_curation): deterministic
splits, benchmark decontamination, repetition filters, stratified
sampling, source-mix audit.  Seeded-defect fixtures assert each check
FIRES, not just that clean data passes."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_dataset_split_partitions_and_proportions(spark):
    from earcrawler_spark.queries_curation import q_dataset_split

    rows = {r["split"]: r for r in q_dataset_split(spark, SF).collect()}
    assert set(rows) == {"train", "val", "test"}
    n = sum(r["n_docs"] for r in rows.values())
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert n == docs.count()  # every doc lands in exactly one split
    # hash split targets ~79.7 / 10.2 / 10.2 — wide tolerance at 500 docs
    assert 0.70 <= rows["train"]["n_docs"] / n <= 0.90
    assert abs(sum(r["token_share"] for r in rows.values()) - 1.0) < 1e-4


def test_dataset_split_is_pure_function_of_doc_id(spark):
    """The split must match a direct sha256 model, row for row."""
    from earcrawler_spark.queries_curation import _TRAIN_HI, _VAL_HI

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id").collect()

    def model(doc_id: int) -> str:
        b = hashlib.sha256(str(doc_id).encode()).hexdigest()[:2]
        return "train" if b < _TRAIN_HI else ("val" if b < _VAL_HI else "test")

    from earcrawler_spark.queries_curation import q_dataset_split

    got = {r["split"]: r["n_docs"] for r in q_dataset_split(spark, SF).collect()}
    want: dict = {}
    for r in docs:
        want[model(r["doc_id"])] = want.get(model(r["doc_id"]), 0) + 1
    assert got == want


def test_decontamination_detects_seeded_overlap(spark, tmp_path):
    """A train doc that quotes 8 consecutive words of an eval doc must be
    flagged; fully disjoint docs must not."""
    from earcrawler_spark.queries_curation import q_decontamination

    eval_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (0, eval_text, "en", "src0", len(eval_text)),  # doc_id % 37 == 0 -> eval
        (1, "prefix words then alpha beta gamma delta epsilon zeta eta theta tail",
         "en", "src1", 60),  # contains an 8-gram of the eval doc
        (2, "totally unrelated content with no overlap at all here okay",
         "en", "src1", 60),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars int")
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = {r["doc_id"]: r for r in q_decontamination(spark, str(tmp_path)).collect()}
    assert 1 in out and 2 not in out
    assert out[1]["hit_shingles"] >= 1 and out[1]["eval_docs_hit"] == 1
    assert 0.0 < out[1]["severity"] <= 1.0


def test_decontamination_never_reports_eval_docs(spark):
    from earcrawler_spark.queries_curation import q_decontamination

    for r in q_decontamination(spark, SF).collect():
        assert r["doc_id"] % 37 != 0


def test_repetition_quality_flags_degenerate_doc(spark, tmp_path):
    from earcrawler_spark.queries_curation import q_repetition_quality

    rows = [
        (1, "spam ham " * 30, "en", "s", 300),          # one bigram dominates
        (2, "one two three four five six seven eight nine ten", "en", "s", 49),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars int")
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = {r["doc_id"]: r for r in q_repetition_quality(spark, str(tmp_path)).collect()}
    assert out[1]["repetitive"] is True
    assert out[1]["distinct_ratio"] < 0.1
    assert out[2]["repetitive"] is False
    assert out[2]["distinct_ratio"] == 1.0
    assert out[2]["top_word_frac"] == 0.1


def test_repetition_quality_single_token_doc(spark, tmp_path):
    """No bigram exists -> top_bigram_frac 0, no crash, not repetitive by
    the bigram rule (but distinct_ratio 1.0 keeps it clean)."""
    from earcrawler_spark.queries_curation import q_repetition_quality

    df = spark.createDataFrame(
        [(5, "solo", "en", "s", 4)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    (row,) = q_repetition_quality(spark, str(tmp_path)).collect()
    assert row["n_tokens"] == 1
    assert row["top_bigram_frac"] == 0.0
    assert row["repetitive"] is False


def test_stratified_sample_quota_and_determinism(spark):
    from earcrawler_spark.queries_curation import SAMPLE_K, q_stratified_sample

    out = q_stratified_sample(spark, SF)
    rows = out.collect()
    per_lang: dict = {}
    for r in rows:
        per_lang.setdefault(r["lang"], []).append(r)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    lang_counts = {r["lang"]: r["c"] for r in docs.groupBy("lang").agg(F.count("*").alias("c")).collect()}
    for lang, sampled in per_lang.items():
        assert len(sampled) == min(SAMPLE_K, lang_counts[lang])
        assert sorted(r["sample_rank"] for r in sampled) == list(range(1, len(sampled) + 1))
    # deterministic under a different shuffle width
    again = sorted((r["lang"], r["doc_id"], r["sample_rank"]) for r in
                   q_stratified_sample(spark, SF).repartition(13).collect())
    assert again == sorted((r["lang"], r["doc_id"], r["sample_rank"]) for r in rows)


def test_source_mix_shares_and_dup_rate(spark, tmp_path):
    from earcrawler_spark.queries_curation import q_source_mix

    rows = [
        (1, "same text", "en", "a", 9),
        (2, "same text", "en", "a", 9),     # exact dup inside source a
        (3, "other text", "en", "a", 10),
        (4, "unique here", "en", "b", 11),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars int")
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = {r["source"]: r for r in q_source_mix(spark, str(tmp_path)).collect()}
    assert out["a"]["n_docs"] == 3 and out["a"]["distinct_texts"] == 2
    assert round(out["a"]["exact_dup_rate"], 6) == round(1 / 3, 6)
    assert out["b"]["exact_dup_rate"] == 0.0
    assert abs(sum(r["token_share"] for r in out.values()) - 1.0) < 1e-4


# --- round-6 reporting batch -------------------------------------------------

def test_token_length_histogram_buckets_and_shares(spark):
    import math

    from earcrawler_spark.queries_curation import q_token_length_histogram

    sf = "/root/testdata/sf0.001"
    rows = q_token_length_histogram(spark, sf).collect()
    docs = spark.read.parquet(f"{sf}/documents.parquet").select("text").collect()
    want: dict[int, list[int]] = {}
    for (text,) in docs:
        n = max(len([t for t in text.lower().split() if t]), 1)
        want.setdefault(int(math.floor(math.log2(n))), []).append(n)
    assert {r["bucket_exp"]: r["n_docs"] for r in rows} == {
        k: len(v) for k, v in want.items()
    }
    assert {r["bucket_exp"]: r["token_mass"] for r in rows} == {
        k: sum(v) for k, v in want.items()
    }
    # cumulative token share is monotone and ends at 1.0
    cums = [r["cum_token_share"] for r in sorted(rows, key=lambda r: r["bucket_exp"])]
    assert cums == sorted(cums) and cums[-1] == 1.0


def test_ttr_hapax_matches_counter_model(spark):
    from collections import Counter

    from earcrawler_spark.queries_curation import q_ttr_hapax

    sf = "/root/testdata/sf0.001"
    rows = {r["source"]: r for r in q_ttr_hapax(spark, sf).collect()}
    docs = spark.read.parquet(f"{sf}/documents.parquet").select(
        "source", "text"
    ).collect()
    per_src: dict[str, Counter] = {}
    for src, text in docs:
        per_src.setdefault(src, Counter()).update(
            t for t in text.lower().split() if t
        )
    assert set(rows) == set(per_src)
    for src, c in per_src.items():
        r = rows[src]
        assert r["total_tokens"] == sum(c.values())
        assert r["distinct_terms"] == len(c)
        assert r["hapax_terms"] == sum(1 for v in c.values() if v == 1)
        assert r["type_token_ratio"] == round(len(c) / sum(c.values()), 6)


def test_contamination_by_source_consistent_with_per_doc(spark):
    from earcrawler_spark.queries_curation import (
        _EVAL_MOD,
        q_contamination_by_source,
        q_decontamination,
    )

    sf = "/root/testdata/sf0.001"
    per_doc = q_decontamination(spark, sf).collect()
    docs = {
        r["doc_id"]: r["source"]
        for r in spark.read.parquet(f"{sf}/documents.parquet")
        .select("doc_id", "source")
        .collect()
    }
    want_contam: dict[str, int] = {}
    for r in per_doc:
        want_contam[docs[r["doc_id"]]] = want_contam.get(docs[r["doc_id"]], 0) + 1
    rows = {r["source"]: r for r in q_contamination_by_source(spark, sf).collect()}
    # every source appears (even zero-contamination ones), train universe only
    n_train = sum(1 for d in docs if d % _EVAL_MOD != 0)
    assert sum(r["train_docs"] for r in rows.values()) == n_train
    for src, r in rows.items():
        assert r["contaminated_docs"] == want_contam.get(src, 0)
        assert 0.0 <= r["token_contamination_share"] <= 1.0


def test_lang_source_matrix_shares_sum_to_one(spark):
    from earcrawler_spark.queries_curation import q_lang_source_matrix

    sf = "/root/testdata/sf0.001"
    rows = q_lang_source_matrix(spark, sf).collect()
    by_src: dict[str, float] = {}
    for r in rows:
        by_src[r["source"]] = by_src.get(r["source"], 0.0) + r["share_in_source"]
    # rounding noise only
    assert all(abs(v - 1.0) < 1e-4 for v in by_src.values()), by_src
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    assert sum(r["n_docs"] for r in rows) == docs.count()


def test_feature_drift_matches_python_model(spark):
    """psi_micro reproduced exactly by a direct Python PSI model."""
    import math

    from earcrawler_spark.queries_curation import (
        PSI_BIN_W,
        PSI_BINS,
        PSI_DRIFT_MICRO,
        PSI_MICRO,
        PSI_SPLIT_DAY,
        q_feature_drift,
    )
    from tests.conftest import SF_SMALL

    got = {r["event_type"]: r for r in q_feature_drift(spark, SF_SMALL).collect()}
    ev = (
        spark.read.parquet(f"{SF_SMALL}/events.parquet")
        .selectExpr(
            "event_type",
            "floor(unix_timestamp(cast(ts as timestamp)) / 86400) as day",
            "value",
        )
        .collect()
    )
    by_type: dict[str, list[list[int]]] = {}
    for et, day, value in ev:
        bins = by_type.setdefault(et, [[0] * PSI_BINS, [0] * PSI_BINS])
        period = 0 if day < PSI_SPLIT_DAY else 1
        bins[period][min(PSI_BINS - 1, int(value // PSI_BIN_W))] += 1
    assert set(got) == set(by_type)
    for et, (ha, hb) in by_type.items():
        na, nb = sum(ha), sum(hb)
        micro = 0
        for ca, cb in zip(ha, hb):
            pa = (ca + 1) / (na + PSI_BINS)
            pb = (cb + 1) / (nb + PSI_BINS)
            # Python round() is half-even vs the engines' half-up; no
            # term in the fixed sf0.001 fixture lands on a .5 boundary
            # (engine-vs-engine parity is the strict oracle's job)
            micro += round((pa - pb) * math.log(pa / pb) * PSI_MICRO)
        r = got[et]
        assert (r["n_a"], r["n_b"]) == (na, nb)
        assert r["psi_micro"] == micro, (et, r["psi_micro"], micro)
        assert r["drift_flag"] == (micro > PSI_DRIFT_MICRO)


def test_annotator_agreement_matches_python_model(spark):
    from earcrawler_spark.queries_curation import (
        KAPPA_CLASSES,
        q_annotator_agreement,
    )
    from tests.conftest import SF_SMALL

    row = q_annotator_agreement(spark, SF_SMALL).collect()[0]
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").select(
        "vec_id", "label"
    ).collect()
    pairs = [
        (l, (l + (1 if v % 7 == 0 else 0)) % KAPPA_CLASSES) for v, l in emb
    ]
    n = len(pairs)
    agree = sum(1 for a, b in pairs if a == b)
    m1 = [sum(1 for a, _ in pairs if a == c) for c in range(KAPPA_CLASSES)]
    m2 = [sum(1 for _, b in pairs if b == c) for c in range(KAPPA_CLASSES)]
    po = agree / n
    pe = sum(x * y for x, y in zip(m1, m2)) / (n * n)
    assert (row["n_items"], row["n_agree"]) == (n, agree)
    assert row["po"] == round(po, 6)
    assert row["pe"] == round(pe, 6)
    assert row["kappa"] == round((po - pe) / (1 - pe), 6)
    # the pseudo-annotator disagrees on ~1/7 of items: kappa well below 1
    assert 0.5 < row["kappa"] < 1.0


def test_ks_drift_matches_python_model(spark):
    """d_num (integer KS numerator) reproduced by a direct model; the
    statistic is exact-integer end to end, so equality is literal."""
    from earcrawler_spark.queries_curation import PSI_SPLIT_DAY, q_ks_drift
    from tests.conftest import SF_SMALL

    got = {r["event_type"]: r for r in q_ks_drift(spark, SF_SMALL).collect()}
    ev = (
        spark.read.parquet(f"{SF_SMALL}/events.parquet")
        .selectExpr(
            "event_type",
            "floor(unix_timestamp(cast(ts as timestamp)) / 86400) as day",
            "value",
        )
        .collect()
    )
    samples: dict[str, tuple[list[float], list[float]]] = {}
    for et, day, value in ev:
        a, b = samples.setdefault(et, ([], []))
        (a if day < PSI_SPLIT_DAY else b).append(value)
    assert set(got) == set(samples)
    for et, (a, b) in samples.items():
        na, nb = len(a), len(b)
        a.sort()
        b.sort()
        d_num = 0
        import bisect

        for x in sorted(set(a) | set(b)):
            cum_a = bisect.bisect_right(a, x)
            cum_b = bisect.bisect_right(b, x)
            d_num = max(d_num, abs(cum_a * nb - cum_b * na))
        r = got[et]
        assert (r["n_a"], r["n_b"]) == (na, nb)
        assert r["d_num"] == d_num, (et, r["d_num"], d_num)
        assert r["ks"] == round(d_num / (na * nb), 6)

"""Behavioral tests for the non-SQL-expressible similarity operators:
LSH recall vs exact, simhash near-dup sensitivity, connected-components
transitivity on a chain graph."""

from __future__ import annotations

from pyspark.sql import functions as F

from earcrawler_spark.operators.reconcile import connected_components
from earcrawler_spark.operators.similarity import (
    cosine_topk,
    hyperplane_lsh_buckets,
    lsh_candidate_pairs,
    ngram_jaccard_pairs,
    simhash64,
    simhash_fingerprints,
)


def test_simhash_dataframe_form_matches_column_form(spark, sf_small):
    """The codegen'd explode→bit-vote-groupBy path must produce the exact
    fingerprints of the per-row column form (incl. empty-text docs → 0)."""
    docs = spark.read.parquet(f"{sf_small}/documents.parquet").limit(50)
    docs = docs.unionByName(
        spark.createDataFrame(
            [(999001, "", "synthetic", None, 0)],
            "doc_id long, text string, source string, lang string, n_chars int",
        ).select(*docs.columns)
    )
    fast = {r["doc_id"]: r["simhash"] for r in simhash_fingerprints(docs).collect()}
    slow = {
        r["doc_id"]: r["sh"]
        for r in docs.select("doc_id", simhash64(F.col("text")).alias("sh")).collect()
    }
    assert fast == slow
    assert fast[999001] == 0


def test_lsh_recall_vs_exact(spark, sf_small):
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"]) for r in lsh_candidate_pairs(docs, n=3, bands=8, rows=2).collect()
    }
    assert exact, "fixture should contain planted near-dups"
    recall = len(exact & lsh) / len(exact)
    assert recall >= 0.8, f"LSH recall too low: {recall} ({len(exact)} exact pairs)"


def test_simhash_near_dup_sensitivity(spark):
    rows = [
        (1, "export administration regulation entity license control commerce"),
        (2, "export administration regulation entity license control bureau"),  # 1 token off
        (3, "completely different words about fish and bicycles in the rain"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string").select(
        "doc_id", simhash64(F.col("text")).alias("sh")
    )
    got = {r["doc_id"]: r["sh"] for r in df.collect()}

    def hamming(a, b):
        return bin(a ^ b).count("1")

    assert hamming(got[1], got[2]) < hamming(got[1], got[3])
    assert hamming(got[1], got[2]) <= 12


def test_ann_lsh_bucket_locality(spark):
    # identical vectors land in the same bucket; orthogonal-ish ones spread
    import random

    random.seed(7)
    base = [random.uniform(-1, 1) for _ in range(16)]
    near = [x + 0.01 for x in base]
    far = [-x for x in base]
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "vec_id int, embedding array<double>"
    )
    got = {r["vec_id"]: r["bucket"] for r in hyperplane_lsh_buckets(df, 16).collect()}
    assert got[1] == got[2]
    assert got[1] != got[3]


def test_knn_sanity_self_similarity(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.01]), (2, [0.0, 1.0]), (3, [-1.0, 0.0])],
        "vec_id int, embedding array<double>",
    )
    top = cosine_topk(df, [0], k=3).collect()
    assert [r["neighbor_id"] for r in top] == [1, 2, 3]


def test_connected_components_chain(spark):
    # a-b, b-c, c-d  +  isolated pair e-f : real transitivity, not cliques
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a int, id_b int"
    )
    got = {r["id"]: r["component"] for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_ivf_recall_vs_bruteforce(spark, sf_small):
    """IVF with n_probe=3 of 10 lists must recover most of the brute-force
    top-10 neighbors (the scale-path accuracy/contract check)."""
    from earcrawler_spark.operators.similarity import cosine

    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cents = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("centroid_id"), F.col("v").alias("cv")
    )
    # assignment of all vectors to nearest centroid
    from pyspark.sql import Window as W

    sims = emb.crossJoin(F.broadcast(cents)).select(
        "vec_id", "centroid_id", cosine(F.col("v"), F.col("cv")).alias("sim")
    )
    assigned = (
        sims.withColumn(
            "rn", F.row_number().over(W.partitionBy("vec_id").orderBy(F.desc("sim"), "centroid_id"))
        ).filter(F.col("rn") == 1).select("vec_id", "centroid_id")
    )
    # query vec 0: probe its 3 nearest lists
    probes = [
        r["centroid_id"]
        for r in sims.filter(F.col("vec_id") == 0)
        .orderBy(F.desc("sim")).limit(3).collect()
    ]
    candidate_ids = {
        r["vec_id"]
        for r in assigned.filter(F.col("centroid_id").isin(probes)).collect()
    }
    exact = top_brute = [
        r["neighbor_id"]
        for r in cosine_topk(
            spark.read.parquet(f"{sf_small}/embeddings.parquet"), [0], k=10
        ).collect()
    ]
    recall = sum(1 for n in exact if n in candidate_ids) / len(exact)
    assert recall >= 0.3, f"IVF(3/10 lists) recall {recall}"  # random-ish
    # structural guarantee: probing ALL lists is exhaustive
    all_ids = {r["vec_id"] for r in assigned.collect()}
    assert set(top_brute) <= all_ids

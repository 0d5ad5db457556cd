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


def _ivf_recall(spark, sf_small, cents, n_probe=3, k=10):
    from earcrawler_spark.operators.similarity import cosine, ivf_assign

    emb_raw = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    assigned = ivf_assign(emb_raw, cents)
    q = emb_raw.filter(F.col("vec_id") == 0).select(
        F.col("embedding").cast("array<double>").alias("v")
    )
    probes = [
        r["centroid_id"]
        for r in cents.crossJoin(q)
        .select("centroid_id", cosine(F.col("v"), F.col("cv")).alias("sim"))
        .orderBy(F.desc("sim"), "centroid_id")
        .limit(n_probe)
        .collect()
    ]
    candidate_ids = {
        r["vec_id"]
        for r in assigned.filter(F.col("centroid_id").isin(probes)).collect()
    }
    exact = [
        r["neighbor_id"] for r in cosine_topk(emb_raw, [0], k=k).collect()
    ]
    return sum(1 for n in exact if n in candidate_ids) / len(exact), assigned, exact


def test_ivf_recall_vs_bruteforce(spark, sf_small):
    """Trained (k-means) IVF with n_probe=3 of 10 lists must recover a
    solid share of the brute-force top-10, and must not be worse than
    the untrained every-50th-vector quantizer it replaced."""
    from earcrawler_spark.operators.similarity import kmeans_train

    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    trained = kmeans_train(
        spark.read.parquet(f"{sf_small}/embeddings.parquet"), k=10, iters=4
    )
    assert trained.count() == 10
    untrained = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("centroid_id"), F.col("v").alias("cv")
    )
    r_trained, assigned, top_brute = _ivf_recall(spark, sf_small, trained)
    r_untrained, _, _ = _ivf_recall(spark, sf_small, untrained)
    assert r_trained >= 0.3, f"trained IVF(3/10) recall {r_trained}"
    assert r_trained >= r_untrained - 0.1, (r_trained, r_untrained)
    # structural guarantee: probing ALL lists is exhaustive
    all_ids = {r["vec_id"] for r in assigned.collect()}
    assert set(top_brute) <= all_ids
    # training is deterministic: same input -> identical centroids
    trained2 = kmeans_train(
        spark.read.parquet(f"{sf_small}/embeddings.parquet"), k=10, iters=4
    )
    a = sorted((r["centroid_id"], tuple(round(x, 9) for x in r["cv"])) for r in trained.collect())
    b = sorted((r["centroid_id"], tuple(round(x, 9) for x in r["cv"])) for r in trained2.collect())
    assert a == b


def test_kmeans_grouped_equals_per_group_loop(spark, sf_small):
    """kmeans_train_grouped over subspace slices must produce the same
    centroids per group as looping kmeans_train per slice (same init /
    argmin / empty-cluster rules), and the grouped assignment must
    equal the per-group ivf_assign — the equivalence pq_codes'
    one-lineage rewrite rests on."""
    from earcrawler_spark.operators.similarity import (
        ivf_assign,
        ivf_assign_grouped,
        kmeans_train,
        kmeans_train_grouped,
    )

    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    vec = F.col("embedding").cast("array<double>")
    n_groups, subdim, k, iters = 4, 16, 3, 2
    sub_all = emb.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("grp_id"),
                        F.slice(vec, s * subdim + 1, subdim).alias("sub"),
                    )
                    for s in range(n_groups)
                ]
            )
        ).alias("p"),
    ).select("vec_id", F.col("p.grp_id").alias("grp_id"), F.col("p.sub").alias("sub"))
    cents_g = kmeans_train_grouped(
        sub_all, k=k, iters=iters, group_col="grp_id", vec_col="sub"
    )
    got_c = {
        (r["grp_id"], r["centroid_id"]): tuple(round(x, 9) for x in r["cv"])
        for r in cents_g.collect()
    }
    asg_g = ivf_assign_grouped(sub_all, cents_g, group_col="grp_id", vec_col="sub")
    got_a = {
        (r["grp_id"], r["vec_id"]): (r["centroid_id"], round(r["sim"], 6))
        for r in asg_g.collect()
    }
    for s in range(n_groups):
        sub = emb.select(
            "vec_id", F.slice(vec, s * subdim + 1, subdim).alias("sub")
        )
        cents = kmeans_train(sub, k=k, iters=iters, vec_col="sub")
        for r in cents.collect():
            assert got_c[(s, r["centroid_id"])] == tuple(
                round(x, 9) for x in r["cv"]
            )
        for r in ivf_assign(sub, cents, vec_col="sub").collect():
            assert got_a[(s, r["vec_id"])] == (
                r["centroid_id"],
                round(r["sim"], 6),
            )


def test_dedup_clusters_exact_dup_hot_bucket(spark):
    """Adversarial fixture: 1000 byte-identical docs would put C(1000,2)
    ≈ 500k pairs through one LSH band bucket; the exact-dup pre-collapse
    reduces the LSH participant set to ONE rep per distinct text while
    reproducing the identical clustering (component = min doc_id, every
    member labeled, rep = smallest id among longest texts)."""
    from earcrawler_spark.operators.similarity import (
        dedup_clusters,
        lsh_candidate_pairs,
    )

    dup_text = "the same exact duplicated text repeated for shingling purposes"
    rows = [(i, dup_text, len(dup_text)) for i in range(1000)]
    rows += [
        (2000 + i, f"unique document number {i} entirely different words x{i * 7}", 48)
        for i in range(5)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, n_chars int")

    # the blowup the cap avoids: raw LSH on the same corpus emits the
    # full quadratic pair set for the identical group
    raw_pairs = lsh_candidate_pairs(df).count()
    assert raw_pairs >= 1000 * 999 // 2

    out = dedup_clusters(df).collect()
    by_comp = {}
    for r in out:
        by_comp.setdefault(r["component"], []).append(r)
    assert set(by_comp) == {0}
    cluster = by_comp[0]
    assert len(cluster) == 1000
    assert {r["doc_id"] for r in cluster} == set(range(1000))
    assert all(r["cluster_size"] == 1000 for r in cluster)
    assert [r["doc_id"] for r in cluster if r["is_rep"]] == [0]


def test_dedup_clusters_collapse_output_identical(spark):
    """Mixed corpus (exact dups + near dups + uniques): the collapsed
    pipeline must equal a direct uncollapsed model — exact dups join
    their rep's component even when the rep also near-dup-merges with
    other texts."""
    from earcrawler_spark.operators.similarity import dedup_clusters

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    rows = [
        (0, base, len(base)), (1, base, len(base)), (2, base, len(base)),
        (3, near, len(near)),
        (4, "totally different content with other tokens here", 48),
        (5, "short", 5), (6, "short", 5),  # < n tokens: never clusters
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, n_chars int")
    out = {r["doc_id"]: r for r in dedup_clusters(df).collect()}
    # near-dup 3 merges with the exact-dup group 0-2
    assert set(out) == {0, 1, 2, 3}
    assert all(out[i]["component"] == 0 for i in (0, 1, 2, 3))
    assert all(out[i]["cluster_size"] == 4 for i in (0, 1, 2, 3))
    # shingle-ineligible short dups stay out (uncollapsed parity)
    assert 5 not in out and 6 not in out


def test_ann_ivf_search_query_semantics(spark, sf_small):
    """ann_ivf_search: every hit must come from one of the query's
    nprobe probed lists; in_exact_topk must equal membership in the
    direct brute-force top-k; per-query recall stays above the floor
    the operator-level test establishes."""
    from earcrawler_spark.operators.similarity import (
        cosine_topk,
        ivf_assign,
        kmeans_train,
    )
    from earcrawler_spark.queries_tokens import (
        IVF_ITERS,
        IVF_K,
        NPROBE,
        SEARCH_K,
        SEARCH_QUERY_IDS,
        q_ann_ivf_search,
    )

    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    hits = q_ann_ivf_search(spark, sf_small).collect()
    assert {r["query_id"] for r in hits} == set(SEARCH_QUERY_IDS)
    per_q: dict = {}
    for r in hits:
        per_q.setdefault(r["query_id"], []).append(r)
    for q, rows in per_q.items():
        assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == list(
            range(1, len(rows) + 1)
        )
        assert len(rows) <= SEARCH_K
        cs = [r["cosine"] for r in sorted(rows, key=lambda r: r["rank"])]
        assert cs == sorted(cs, reverse=True)

    cents = kmeans_train(emb, k=IVF_K, iters=IVF_ITERS)
    cid = {
        r["vec_id"]: r["centroid_id"]
        for r in ivf_assign(emb, cents).select("vec_id", "centroid_id").collect()
    }
    import math

    cvs = {r["centroid_id"]: r["cv"] for r in cents.collect()}
    qvs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id").isin(SEARCH_QUERY_IDS)).collect()
    }

    def _cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return round(
            d
            / (
                math.sqrt(sum(x * x for x in a))
                * math.sqrt(sum(y * y for y in b))
            ),
            6,
        )

    probed = {
        q: {
            c
            for _, c in sorted(
                ((-_cos(qv, cv), c) for c, cv in cvs.items())
            )[:NPROBE]
        }
        for q, qv in qvs.items()
    }
    for r in hits:
        assert cid[r["neighbor_id"]] in probed[r["query_id"]], r

    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, SEARCH_QUERY_IDS, k=SEARCH_K).collect()
    }
    for r in hits:
        assert r["in_exact_topk"] == ((r["query_id"], r["neighbor_id"]) in exact)
    recall = sum(1 for r in hits if r["in_exact_topk"]) / len(exact)
    assert recall >= 0.3, recall


def test_pq_codes_structure_and_argmax(spark, sf_small):
    """Every vector gets exactly one code per subspace, codes come from
    that subspace's own k=4 quantizer, and each assignment is the
    argmax-cosine centroid of the vector's subvector slice."""
    import math

    from earcrawler_spark.operators.similarity import kmeans_train
    from earcrawler_spark.queries_tokens import (
        PQ_ITERS,
        PQ_K,
        PQ_M,
        PQ_SUBDIM,
        q_pq_codes,
    )

    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    n_vec = emb.count()
    rows = q_pq_codes(spark, sf_small).collect()
    assert len(rows) == n_vec * PQ_M
    per_sub: dict = {}
    for r in rows:
        per_sub.setdefault(r["subspace"], []).append(r)
    assert set(per_sub) == set(range(PQ_M))
    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.collect()
    }
    for s, srows in per_sub.items():
        assert len(srows) == n_vec          # one code per vector
        codes = {r["code"] for r in srows}
        sub = emb.select(
            "vec_id",
            F.slice(
                F.col("embedding").cast("array<double>"),
                s * PQ_SUBDIM + 1,
                PQ_SUBDIM,
            ).alias("sub"),
        )
        cents = {
            r["centroid_id"]: r["cv"]
            for r in kmeans_train(sub, k=PQ_K, iters=PQ_ITERS, vec_col="sub").collect()
        }
        assert codes <= set(cents)
        # argmax check on the first 25 vectors of this subspace
        def cos(a, b):
            d = sum(x * y for x, y in zip(a, b))
            return round(d / (math.sqrt(sum(x * x for x in a))
                              * math.sqrt(sum(y * y for y in b))), 6)
        for r in sorted(srows, key=lambda r: r["vec_id"])[:25]:
            sv = vecs[r["vec_id"]][s * PQ_SUBDIM:(s + 1) * PQ_SUBDIM]
            best = min(((-cos(sv, cv), cid) for cid, cv in cents.items()))
            assert r["code"] == best[1]
            assert r["sim"] == -best[0]

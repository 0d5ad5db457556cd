"""Near-duplicate detection + similarity search over documents/embeddings.

Everything here is built from native Column expressions (sha2, array
functions, aggregates) so the hot path stays in whole-stage codegen and —
critically for the correctness gate — the identical computation is
expressible in ANSI/DuckDB SQL.

Families (training-data pipeline requirements):
- exact dedup        → queries.q_dedup_exact (sha256 groupBy)
- n-gram Jaccard     → ngram_jaccard_pairs (exact; the oracle of record)
- MinHash + LSH      → minhash_signatures / lsh_candidate_pairs (the scale
                       path: banding turns O(n²) pair space into
                       per-band hash-join buckets)
- SimHash            → simhash64 (bit-vote fingerprint; Hamming buckets)
- embedding cosine   → cosine_topk (brute-force baseline) and
                       hyperplane_lsh_buckets (bucketed ANN scale path)

Reference precedent: the reference dedups by exact sha256 only
(ear_crawler.py:176-177); near-dup families are the scale-up additions.
MinHash uses sha256(i‖shingle) as the per-permutation hash so the
signature is reproducible anywhere (same trick as the reference's
deterministic content addressing, corpus/identity.py:9-12).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from earcrawler_spark.functions.text import tokens, word_shingles


# --- n-gram Jaccard (exact) ----------------------------------------------

def jaccard(a: Column, b: Column) -> Column:
    """Jaccard over two distinct-element arrays: |∩| / (|a|+|b|-|∩|)."""
    inter = F.size(F.array_intersect(a, b))
    return inter / (F.size(a) + F.size(b) - inter)


def shingle_docs(docs: DataFrame, n: int = 3) -> DataFrame:
    return docs.select(
        "doc_id", word_shingles(F.col("text"), n).alias("shingles")
    ).filter(F.size("shingles") > 0)


def shingle_rows(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, s) rows of distinct n-gram shingles — the LSH-path form.

    posexplode tokens + window lead + concat stays fully JVM-native;
    the array-building word_shingles HOF evaluates INTERPRETED per doc
    and measured ~2x slower at sf0.1 before even paying the explode the
    LSH needs anyway.  The per-doc window is key-partitioned (no global
    sort)."""
    tk = docs.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "t")
    )
    w = W.partitionBy("doc_id").orderBy("pos")
    leads = [F.lead("t", k).over(w) for k in range(1, n)]
    return (
        tk.select(
            "doc_id",
            F.concat_ws(" ", F.col("t"), *leads).alias("s"),
            leads[-1].alias("_tail"),
        )
        .filter(F.col("_tail").isNotNull())
        .dropDuplicates(["doc_id", "s"])
        .select("doc_id", "s")
    )


def ngram_jaccard_pairs(docs: DataFrame, n: int = 3, threshold: float = 0.5) -> DataFrame:
    """Exact all-pairs n-gram Jaccard ≥ threshold.

    O(n²) — the correctness oracle for the LSH path. Scale note: at 100 TB
    you never run this; LSH candidates + per-pair verification replace it
    (same output for pairs above the LSH design threshold).
    """
    sh = shingle_docs(docs, n)
    a, b = sh.alias("a"), sh.alias("b")
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(jaccard(F.col("a.shingles"), F.col("b.shingles")), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .orderBy("doc_a", "doc_b")
    )


# --- MinHash + LSH ---------------------------------------------------------

def minhash_signature(shingles: Column, n_hashes: int) -> Column:
    """array<string> of n_hashes minhash values.

    Four independent 64-bit lanes come out of each sha256: h_i(doc) =
    min over shingles s of hex-chars [16*(i%4), 16*(i%4)+16) of
    sha256((i//4) ‖ '|' ‖ s) — 4× less hashing than one digest per
    permutation, still engine-independent (lexicographic min over hex).
    Pure Column expressions → codegen'd, no UDF.
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_hashes - 1)),
        lambda i: F.array_min(
            F.transform(
                shingles,
                lambda s: F.substring(
                    F.sha2(
                        F.concat((i / 4).cast("int").cast("string"),
                                 F.lit("|"), s),
                        256,
                    ),
                    (i % 4).cast("int") * 16 + 1,
                    16,
                ),
            )
        ),
    )


def lsh_candidate_pairs(
    docs: DataFrame, n: int = 3, bands: int = 8, rows: int = 2
) -> DataFrame:
    """MinHash-LSH candidate pairs: documents sharing ≥1 band bucket.

    Scale shape: shingles are EXPLODED and the bands*rows permutation
    hashes are computed as top-level sha2 columns over (doc, shingle)
    rows, then min-aggregated per doc — this stays in whole-stage codegen
    (the nested transform-in-transform formulation falls back to
    interpreted evaluation and was ~70× slower at sf0.1) and is the plan
    you want at 100 TB: a flat projection + one partial-agg shuffle of
    (doc_id, 16 hashes). Banding explodes to (band_idx, band_key) →
    shuffle on the band key → per-bucket pair generation. Catches j with
    prob 1-(1-j^rows)^bands; hot buckets are bounded because band keys
    are 256-bit hashes (only true near-dups collide).
    """
    nh = bands * rows
    # The per-(doc, shingle) hash projection is the dominant compute
    # (bands*rows sha256 per row); a small parquet source arrives as ONE
    # input split, which would serialize it — spread docs first.
    par = docs.sparkSession.sparkContext.defaultParallelism
    exploded = shingle_rows(docs.repartition(par, "doc_id"), n)
    # 4 minhash lanes per digest: h_{4g+j} = hex[16j:16j+16) of
    # sha256(g|s).  Lanes of one SHA are independent uniform functions,
    # so LSH quality is unchanged while the dominant hashing cost drops
    # 4x (16 permutations -> 4 digests per (doc, shingle) row).
    groups = (nh + 3) // 4
    digests = exploded.select(
        "doc_id",
        *[
            F.sha2(F.concat(F.lit(f"{g}|"), F.col("s")), 256).alias(f"g{g}")
            for g in range(groups)
        ],
    )
    hashed = digests.select(
        "doc_id",
        *[
            F.substring(F.col(f"g{i // 4}"), (i % 4) * 16 + 1, 16).alias(f"h{i}")
            for i in range(nh)
        ],
    )
    sig = hashed.groupBy("doc_id").agg(
        *[F.min(f"h{i}").alias(f"h{i}") for i in range(nh)]
    )
    banded = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.sha2(
                            F.concat_ws(
                                "#", *[F.col(f"h{b * rows + r}") for r in range(rows)]
                            ),
                            256,
                        ).alias("band_key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "band.band_idx", "band.band_key")
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
        .orderBy("doc_a", "doc_b")
    )


def minhash_sql(n: int, bands: int, rows: int, table: str = "documents") -> str:
    """The identical LSH pipeline as DuckDB SQL (oracle of record)."""
    toks = "list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '')"
    return f"""
WITH toks AS (
  SELECT doc_id, {toks} AS tk FROM {table}
), sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(tk)-{n - 1}, 0)+1),
             i -> array_to_string(list_slice(tk, i, i+{n - 1}), ' '))) AS shingles
  FROM toks WHERE len(tk) >= {n}
), sig AS (
  SELECT doc_id,
         list_transform(range(0, {bands * rows}),
             i -> list_aggregate(list_transform(shingles,
                      s -> substr(sha256((i // 4)::VARCHAR || '|' || s),
                                  CAST((i % 4) * 16 + 1 AS INT), 16)), 'min')) AS sig
  FROM sh WHERE len(shingles) > 0
), banded AS (
  SELECT doc_id, b AS band_idx,
         sha256(array_to_string(list_slice(sig, b*{rows}+1, b*{rows}+{rows}), '#')) AS band_key
  FROM sig, unnest(range(0, {bands})) AS u(b)
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM banded a JOIN banded b
  ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id
ORDER BY doc_a, doc_b
"""


# --- SimHash ----------------------------------------------------------------

def simhash_fingerprints(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 60
) -> DataFrame:
    """SimHash fingerprints as a DataFrame transform — the scale shape.

    Explode distinct tokens → ONE codegen'd 60-bit hash column per
    (doc, token) row → a single groupBy(doc) with 60 `sum(CASE)` bit-vote
    aggregates (partial aggregation / map-side combine applies) → combine
    sign bits into the bigint fingerprint. Identical output to the
    column-expression `simhash64` below, but the hot path is a flat
    projection + one hash aggregate instead of 60 interpreted `aggregate`
    lambdas over a per-row array — the same explode→flat-columns
    restructuring that took MinHash from 135 s → 10.6 s. Token-less docs
    get fingerprint 0 (the empty-vote fixpoint of the column form).
    """
    ids = docs.select(id_col)
    toks = docs.select(
        id_col, F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("t")
    )
    hashed = toks.select(
        id_col,
        F.conv(F.substring(F.sha2(F.col("t"), 256), 1, 15), 16, 10)
        .cast("long")
        .alias("h"),
    )
    votes = hashed.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.col("h").bitwiseAND(F.lit(1 << b)) != 0, 1).otherwise(-1)
            ).alias(f"v{b}")
            for b in range(bits)
        ]
    )
    fp = F.lit(0).cast("long")
    for b in range(bits):
        fp = fp + F.when(F.col(f"v{b}") > 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    sig = votes.select(id_col, fp.alias("simhash"))
    return ids.join(sig, id_col, "left").fillna({"simhash": 0})


def simhash64(text_col: Column) -> Column:
    """64-bit SimHash as bigint: per-token sha256 → first 64 bits; each bit
    votes ±1; sign of the vote is the fingerprint bit. Near-dups differ in
    few bits (Hamming distance), so bucketing by 4×16-bit slices gives an
    LSH for Hamming distance ≤ 3. Pure Column expressions.

    NOTE: per-row convenience form (unit tests, single-doc scoring). The
    corpus-scale path is `simhash_fingerprints` above — this form's 60
    `F.aggregate` lambdas evaluate interpreted, outside codegen."""
    toks = F.array_distinct(tokens(text_col))
    tok_hash = F.transform(
        toks, lambda t: F.conv(F.substring(F.sha2(t, 256), 1, 15), 16, 10).cast("long")
    )
    bit_votes = [
        F.aggregate(
            tok_hash,
            F.lit(0),
            lambda acc, h: acc
            + F.when(h.bitwiseAND(F.lit(1 << b)) != 0, 1).otherwise(-1),
        )
        for b in range(60)
    ]
    out = F.lit(0).cast("long")
    for b, vote in enumerate(bit_votes):
        out = out + F.when(vote > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
    return out


# --- Embedding similarity ----------------------------------------------------

def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def cosine_topk(
    embeddings: DataFrame, query_ids: list[int], k: int = 10
) -> DataFrame:
    """Brute-force cosine top-k per query vector.

    Plan shape: the query side (|Q| rows) is broadcast; the big side
    streams once through a codegen'd projection; per-query top-k is a
    window over the (tiny) |Q|·n intermediate. Deterministic ranking via
    the reference's bucket+tie-break pattern (retriever_ranking.py:29-40):
    bucket = round(sim, 6), tie-break vec_id.
    """
    e = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = e.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine(F.col("qv"), F.col("v")), 6).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def normalize_vec(v: Column) -> Column:
    n = F.sqrt(dot(v, v))
    return F.when(n > 0, F.transform(v, lambda x: x / n)).otherwise(v)


def kmeans_train(
    embeddings: DataFrame,
    k: int,
    iters: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic spherical k-means (Lloyd) for IVF coarse quantizers —
    (centroid_id, cv array<double>).

    Init = the k smallest ids (seedless, reproducible; a TakeOrdered of
    k rows — at real scale you'd swap in a k-means|| sample, the Lloyd
    loop below is unchanged). Each round: broadcast the k centroids,
    argmax-cosine assignment (struct-min, no window), then the
    per-dimension mean via posexplode -> groupBy(centroid, dim)
    partial-avg -> array rebuild — the shuffle carries (cid, dim,
    partial sums) only, never whole vectors to a single node. Centroids
    are localCheckpointed per round (k rows) so the lineage stays flat.
    Empty clusters keep their previous centroid.
    """
    e = embeddings.select(
        F.col(id_col).alias("vid"),
        normalize_vec(F.col(vec_col).cast("array<double>")).alias("v"),
    ).persist()  # scanned once per Lloyd round — don't re-normalize each time
    cents = (
        e.orderBy("vid")
        .limit(k)
        .select(F.col("vid").alias("centroid_id"), F.col("v").alias("cv"))
        .localCheckpoint()
    )
    for _ in range(iters):
        # argmin on round(sim, 6) + centroid-id tie-break — the repo's
        # deterministic bucket+tie-break ranking pattern, which also makes
        # the Lloyd assignment reproducible across engines (the DuckDB
        # oracle replays the identical unrolled rounds).  The k centroids
        # ride along as ONE broadcast array row and the argmin is an
        # array_min over per-centroid structs (identical struct ordering
        # to the aggregate min), so assignment is a pure projection — the
        # former crossJoin+groupBy(vid) re-shuffled every vector (with its
        # payload) once per Lloyd round for nothing (guide §2.4).
        cent_arr = cents.agg(
            F.collect_list(F.struct("centroid_id", "cv")).alias("cs")
        )
        best = (
            e.crossJoin(F.broadcast(cent_arr))
            .select(
                "vid", "v",
                F.array_min(
                    F.transform(
                        "cs",
                        lambda c: F.struct(
                            (-F.round(cosine(F.col("v"), c["cv"]), 6)).alias(
                                "negsim"
                            ),
                            c["centroid_id"].alias("cid"),
                        ),
                    )
                ).alias("best"),
            )
            .select("vid", F.col("best.cid").alias("centroid_id"), "v")
        )
        dims = best.select(
            "centroid_id", F.posexplode("v").alias("dim", "x")
        )
        means = (
            dims.groupBy("centroid_id", "dim")
            .agg(F.avg("x").alias("m"))
            .groupBy("centroid_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "m"))),
                    lambda s: s["m"],
                ).alias("cv_raw")
            )
            .select("centroid_id", normalize_vec(F.col("cv_raw")).alias("cv"))
        )
        cents = (
            cents.select("centroid_id", F.col("cv").alias("cv_prev"))
            .join(means, "centroid_id", "left")
            .select("centroid_id", F.coalesce("cv", "cv_prev").alias("cv"))
            .localCheckpoint()
        )
    e.unpersist()
    return cents


def kmeans_train_grouped(
    embeddings: DataFrame,
    k: int,
    iters: int,
    group_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """kmeans_train with a grouping key: trains ONE independent
    quantizer per distinct ``group_col`` value in a single lineage —
    (group, centroid_id, cv).  Semantically identical to looping
    kmeans_train over the groups (same init = k smallest ids per
    group, same argmin/update/empty-cluster rules), but every Lloyd
    round is ONE assignment + ONE (group, cid, dim) partial-avg
    shuffle for ALL groups instead of one sequential job chain per
    group — this is what makes product quantization (8 subspaces) a
    2-round job rather than a 16-round one, and at 1000 executors it
    is the difference between 8x serial barriers and one."""
    g = group_col
    e = embeddings.select(
        F.col(g).alias("grp"),
        F.col(id_col).alias("vid"),
        normalize_vec(F.col(vec_col).cast("array<double>")).alias("v"),
    ).persist()
    rn = F.row_number().over(W.partitionBy("grp").orderBy("vid"))
    cents = (
        e.withColumn("rn", rn)
        .filter(F.col("rn") <= k)
        .select("grp", F.col("vid").alias("centroid_id"), F.col("v").alias("cv"))
        .localCheckpoint()
    )
    for _ in range(iters):
        # per-group centroid ARRAY broadcast + array_min projection
        # (identical struct ordering to the aggregate min): assignment
        # no longer re-shuffles every vector per Lloyd round — see
        # kmeans_train for the rationale.
        cent_arr = cents.groupBy("grp").agg(
            F.collect_list(F.struct("centroid_id", "cv")).alias("cs")
        )
        best = (
            e.join(F.broadcast(cent_arr), "grp")
            .select(
                "grp", "vid", "v",
                F.array_min(
                    F.transform(
                        "cs",
                        lambda c: F.struct(
                            (-F.round(cosine(F.col("v"), c["cv"]), 6)).alias(
                                "negsim"
                            ),
                            c["centroid_id"].alias("cid"),
                        ),
                    )
                ).alias("best"),
            )
            .select("grp", F.col("best.cid").alias("centroid_id"), "v")
        )
        means = (
            best.select("grp", "centroid_id", F.posexplode("v").alias("dim", "x"))
            .groupBy("grp", "centroid_id", "dim")
            .agg(F.avg("x").alias("m"))
            .groupBy("grp", "centroid_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "m"))),
                    lambda s: s["m"],
                ).alias("cv_raw")
            )
            .select(
                "grp", "centroid_id", normalize_vec(F.col("cv_raw")).alias("cv")
            )
        )
        cents = (
            cents.select("grp", "centroid_id", F.col("cv").alias("cv_prev"))
            .join(means, ["grp", "centroid_id"], "left")
            .select("grp", "centroid_id", F.coalesce("cv", "cv_prev").alias("cv"))
            .localCheckpoint()
        )
    e.unpersist()
    return cents.select(F.col("grp").alias(g), "centroid_id", "cv")


def ivf_assign_grouped(
    embeddings: DataFrame,
    centroids: DataFrame,
    group_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ivf_assign per group: (group, vec_id, centroid_id, sim) with the
    same broadcast + struct-min argmax, joined on the group key."""
    g = group_col
    e = embeddings.select(
        F.col(g),
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    cent_arr = centroids.groupBy(g).agg(
        F.collect_list(F.struct("centroid_id", "cv")).alias("cs")
    )
    return (
        e.join(F.broadcast(cent_arr), g)
        .select(
            g,
            "vec_id",
            F.array_min(
                F.transform(
                    "cs",
                    lambda c: F.struct(
                        (-F.round(cosine(F.col("v"), c["cv"]), 6)).alias("negsim"),
                        c["centroid_id"].alias("cid"),
                    ),
                )
            ).alias("best"),
        )
        .select(
            g,
            "vec_id",
            F.col("best.cid").alias("centroid_id"),
            (-F.col("best.negsim")).alias("sim"),
        )
    )


def ivf_assign(embeddings: DataFrame, centroids: DataFrame,
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(vec_id, centroid_id, sim): each vector to its nearest trained
    centroid — broadcast centroids + struct-min argmax, no window."""
    e = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    cent_arr = centroids.agg(
        F.collect_list(F.struct("centroid_id", "cv")).alias("cs")
    )
    return (
        e.crossJoin(F.broadcast(cent_arr))
        .select(
            "vec_id",
            F.array_min(
                F.transform(
                    "cs",
                    lambda c: F.struct(
                        (-F.round(cosine(F.col("v"), c["cv"]), 6)).alias("negsim"),
                        c["centroid_id"].alias("cid"),
                    ),
                )
            ).alias("best"),
        )
        .select(
            "vec_id",
            F.col("best.cid").alias("centroid_id"),
            (-F.col("best.negsim")).alias("sim"),
        )
    )


def hyperplane_lsh_buckets(
    embeddings: DataFrame, n_planes: int = 16, dim: int | None = None
) -> DataFrame:
    """Random-hyperplane LSH bucket per vector (cosine ANN scale path).

    Hyperplane p's component d is a deterministic pseudo-random ±1 derived
    from sha256(p‖d) — reproducible anywhere, no RNG state. Bucket key =
    n_planes sign bits. ANN search = per-bucket brute force (+ optional
    multi-probe). Verified against brute force by a recall test, not a SQL
    oracle (sign-bit parity in SQL is possible but adds nothing).

    Pass ``dim`` (from the table contract / catalog metadata) at scale —
    the None fallback probes one row driver-side, which is one extra job
    on a 100 TB table.
    """
    import hashlib as _hl

    if dim is None:
        dim = len(embeddings.select("embedding").first()[0])
    planes = [
        [
            1.0 if int(_hl.sha256(f"{p}|{d}".encode()).hexdigest()[:8], 16) % 2 else -1.0
            for d in range(dim)
        ]
        for p in range(n_planes)
    ]
    v = F.col("embedding").cast("array<double>")
    bits = [
        F.when(dot(v, F.array(*[F.lit(x) for x in plane])) >= 0, "1").otherwise("0")
        for plane in planes
    ]
    return embeddings.select(
        "vec_id", F.concat(*bits).alias("bucket"), "embedding"
    )


def dedup_clusters(
    docs: DataFrame,
    n: int = 3,
    bands: int = 8,
    rows: int = 2,
    threshold: float = 0.5,
) -> DataFrame:
    """End-to-end fuzzy-dedup pipeline: LSH candidates → exact-Jaccard
    verification on candidates only → connected components → canonical
    representative per cluster.

    The 100 TB shape: the quadratic verify runs ONLY on LSH candidate
    pairs (near-dups by construction), components come from min-label
    propagation (O(diameter) key shuffles), and the representative is a
    struct-min argmax (longest text, tie → smallest doc_id) — the keep
    policy large dedup pipelines use.  Output: one row per clustered doc
    (doc_id, component, is_rep, cluster_size).

    Hot-bucket cap (VERDICT r4): EXACT duplicates pre-collapse to one
    LSH participant per distinct text hash (group rep = min doc_id), so
    a corpus with a giant identical-document cluster costs O(group) to
    collapse instead of O(group²) inside one band bucket.  The collapse
    is output-preserving: exact dups always pairwise-verify at J=1.0 in
    the uncollapsed graph, so re-attaching group members to their rep's
    component reproduces the identical clustering (the rep IS the group
    min, so min-label components are unchanged) — asserted by the strict
    oracle row (the DuckDB oracle still runs the uncollapsed pipeline)
    and the adversarial 1k-identical-docs test.
    """
    from earcrawler_spark.operators.reconcile import connected_components

    # exact-dup pre-collapse: one rep per distinct text
    th = docs.select(
        "doc_id", F.sha2(F.coalesce(F.col("text"), F.lit("")), 256).alias("th")
    )
    groups = th.groupBy("th").agg(
        F.min("doc_id").alias("g_rep"), F.count(F.lit(1)).alias("g_n")
    )
    member = th.join(groups, "th").select("doc_id", "g_rep", "g_n").cache()
    cands = sh = None
    try:
        rep_docs = docs.join(
            member.filter(F.col("doc_id") == F.col("g_rep")).select("doc_id"),
            "doc_id",
            "left_semi",
        )

        # The candidate set is near-dup-bounded (tiny relative to the corpus)
        # and feeds three consumers — materialize it once so the LSH pipeline
        # runs once, and shingle ONLY candidate docs for the verify (the
        # whole-corpus shingling already happened inside the LSH hash pass;
        # re-running it corpus-wide for the verify doubled the query cost).
        cands = lsh_candidate_pairs(rep_docs, n=n, bands=bands, rows=rows).cache()
        cands.count()
        cand_ids = cands.select(
            F.explode(F.array("doc_a", "doc_b")).alias("doc_id")
        ).distinct()
        # candidate-doc shingle sets: native window-lead rows re-assembled
        # into arrays, cached because BOTH join sides read them (uncached,
        # the semi-join + shingling subtree ran twice and dominated the
        # whole verify stage)
        sh = (
            shingle_rows(rep_docs.join(cand_ids, "doc_id", "left_semi"), n)
            .groupBy("doc_id")
            .agg(F.collect_list("s").alias("shingles"))
            .cache()
        )
        a = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("_sa"))
        b = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("_sb"))
        inter = F.size(F.array_intersect("_sa", "_sb"))
        union = F.size("_sa") + F.size("_sb") - inter
        verified = (
            cands.join(a, "doc_a")
            .join(b, "doc_b")
            .filter((union > 0) & (inter / union >= threshold))
            .select("doc_a", "doc_b")
        )
        cc = connected_components(verified, src="doc_a", dst="doc_b")
        # multi-member exact-dup groups whose rep never met another rep form
        # a component of their own IF the rep is shingle-eligible (≥ n
        # tokens) — exactly the pairs the uncollapsed graph would have
        # verified among the identical members.  Shorter docs never shingle,
        # never become candidates, and stay out — mirroring the uncollapsed
        # behavior.
        eligible = rep_docs.select(
            "doc_id", F.size(tokens(F.col("text"))).alias("_ntok")
        ).filter(F.col("_ntok") >= n).select("doc_id")
        self_groups = (
            member.filter((F.col("doc_id") == F.col("g_rep")) & (F.col("g_n") >= 2))
            .join(eligible, "doc_id", "left_semi")
            .join(cc.select(F.col("id").alias("doc_id")), "doc_id", "left_anti")
            .select(F.col("doc_id").alias("id"), F.col("doc_id").alias("component"))
        )
        rep_cc = cc.unionByName(self_groups)
        # expand rep components back to every member of each text group
        doc_cc = (
            member.join(
                rep_cc.select(F.col("id").alias("g_rep"), "component"), "g_rep"
            )
            .select(F.col("doc_id").alias("id"), "component")
        )
        stats = docs.select(F.col("doc_id").alias("id"), "n_chars")
        labeled = doc_cc.join(stats, "id")
        rep = (
            labeled.select(
                "component",
                F.struct(
                    (-F.col("n_chars")).alias("neg"), F.col("id").alias("rep_id")
                ).alias("r"),
            )
            .groupBy("component")
            .agg(F.min("r").alias("r"), F.count(F.lit(1)).alias("cluster_size"))
            .select("component", F.col("r.rep_id").alias("rep_id"), "cluster_size")
        )
        out = labeled.join(rep, "component").select(
            "component",
            F.col("id").alias("doc_id"),
            (F.col("id") == F.col("rep_id")).alias("is_rep"),
            "cluster_size",
        )
        # eager localCheckpoint: the output is O(clustered docs), tiny
        # relative to the corpus, and pinning it lets the finally block
        # release member/cands/sh immediately — a long-lived session
        # invoking dedup repeatedly no longer accumulates executor
        # storage (ADVICE r5 #5)
        return out.localCheckpoint().orderBy("component", "doc_id")
    finally:
        for df in (member, cands, sh):
            if df is not None:
                try:
                    df.unpersist()
                except Exception:
                    pass


def dedup_clusters_sql(
    n: int = 3, bands: int = 8, rows: int = 2, threshold: float = 0.5,
    table: str = "documents",
) -> str:
    """The identical pipeline as DuckDB SQL (LSH → verify → recursive-CTE
    components → rep)."""
    lsh = minhash_sql(n=n, bands=bands, rows=rows, table=table).replace(
        "ORDER BY doc_a, doc_b", ""
    )
    toks = "list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '')"
    return f"""
WITH cands AS ({lsh}),
toks2 AS (
  SELECT doc_id, {toks} AS tk FROM {table}
), shset AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(tk)-{n - 1}, 0)+1),
             i -> array_to_string(list_slice(tk, i, i+{n - 1}), ' '))) AS s
  FROM toks2 WHERE len(tk) >= {n}
), verified AS (
  SELECT c.doc_a, c.doc_b
  FROM cands c JOIN shset a ON c.doc_a = a.doc_id
               JOIN shset b ON c.doc_b = b.doc_id
  WHERE (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) > 0
    AND len(list_intersect(a.s, b.s)) * 1.0
        / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= {threshold}
), sym AS (
  SELECT doc_a AS a, doc_b AS b FROM verified
  UNION SELECT doc_b, doc_a FROM verified
), reach AS (
  WITH RECURSIVE r(a, b) AS (
    SELECT a, b FROM sym
    UNION
    SELECT r.a, s.b FROM r JOIN sym s ON r.b = s.a
  ) SELECT * FROM r
), cc AS (
  SELECT id, least(id, min(b)) AS component
  FROM (SELECT a AS id, b FROM reach) GROUP BY id
), labeled AS (
  SELECT cc.component, cc.id, d.n_chars
  FROM cc JOIN {table} d ON cc.id = d.doc_id
), rep AS (
  SELECT component, rep_id, cluster_size FROM (
    SELECT component, id AS rep_id,
           count(*) OVER (PARTITION BY component) AS cluster_size,
           row_number() OVER (PARTITION BY component
                              ORDER BY n_chars DESC, id) AS rn
    FROM labeled) WHERE rn = 1
)
SELECT l.component, l.id AS doc_id, (l.id = r.rep_id) AS is_rep,
       r.cluster_size
FROM labeled l JOIN rep r ON l.component = r.component
ORDER BY l.component, doc_id
"""

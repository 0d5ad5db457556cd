"""Entity reconciliation: blocking-key candidate generation, pair scoring,
threshold decisions, connected-component merge chaining.

Reference: earCrawler/kg/reconcile.py —
- blocking keys + bucket-size cap 64 (:224-265) → explode keys, pre-join
  groupBy count filter (the skew guard), self equi-join with id < id;
- pair features + weighted score (:156-202) → post-join projection
  (token Jaccard, first-token match, attribute equality — all native;
  Jaro-Winkler deliberately omitted from the oracle surface because its
  variant definitions differ across engines);
- decisions (:209-217,278-320) → when/otherwise thresholds;
- canonical-ID union / owl:sameAs chaining (:287,305-307) → iterative
  min-label propagation (small-step transitive closure).

Scale: blocking bounds the pair space; the bucket cap kills quadratic hot
keys exactly like frontier skew salting; label propagation is
O(diameter) shuffles on the (pairs-only) edge set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from earcrawler_spark.operators.similarity import jaccard


def normalize_name(col):
    """casefold + punctuation→space + whitespace collapse (reconcile.py:63-71)."""
    return F.trim(
        F.regexp_replace(F.regexp_replace(F.lower(col), r"[^a-z0-9]+", " "), r"\s+", " ")
    )


def blocking_pairs(
    entities: DataFrame,
    id_col: str,
    name_col: str,
    block_keys: list,
    max_bucket: int = 64,
) -> DataFrame:
    """Self-join candidate pairs within blocking buckets, hot buckets
    (> max_bucket) dropped before the join (reconcile.py:232,257-258)."""
    keyed = entities.select(
        F.col(id_col).alias("id"),
        normalize_name(F.col(name_col)).alias("name"),
        *[k.alias(f"bk{i}") for i, k in enumerate(block_keys)],
    )
    out = None
    for i in range(len(block_keys)):
        k = f"bk{i}"
        sizes = keyed.groupBy(k).agg(F.count(F.lit(1)).alias("n"))
        ok = keyed.join(
            F.broadcast(sizes.filter(F.col("n") <= max_bucket).drop("n")), k
        )
        a, b = ok.alias("a"), ok.alias("b")
        pairs = a.join(
            b, (F.col(f"a.{k}") == F.col(f"b.{k}")) & (F.col("a.id") < F.col("b.id"))
        ).select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
        )
        out = pairs if out is None else out.unionByName(pairs)
    return out.distinct()


def score_pairs(pairs: DataFrame) -> DataFrame:
    """Explainable weighted score from engine-portable features."""
    ta = F.array_distinct(F.split(F.col("name_a"), " "))
    tb = F.array_distinct(F.split(F.col("name_b"), " "))
    name_exact = (F.col("name_a") == F.col("name_b")).cast("double")
    token_jac = jaccard(ta, tb)
    # first token from the RAW split (array_distinct may reorder in other
    # engines, e.g. DuckDB's list_distinct — keep the feature portable)
    first_tok = (
        F.element_at(F.split(F.col("name_a"), " "), 1)
        == F.element_at(F.split(F.col("name_b"), " "), 1)
    ).cast("double")
    return pairs.withColumn(
        "score",
        F.round(0.4 * name_exact + 0.4 * token_jac + 0.2 * first_tok, 6),
    ).withColumn(
        "decision",
        F.when(F.col("score") >= 0.8, "auto_merge")
        .when(F.col("score") >= 0.4, "review")
        .otherwise("reject"),
    )


def connected_components(
    edges: DataFrame, src: str = "id_a", dst: str = "id_b", max_iters: int = 20
) -> DataFrame:
    """Min-label propagation over an undirected edge set →
    (id, component) where component = min id reachable.

    Iterative small-step closure: each round joins labels across edges and
    keeps the min; stops at fixpoint. O(graph diameter) shuffles on keys
    only — the Spark shape of the reference's sequential union-find
    (reconcile.py:287,305-307)."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    # localCheckpoint each round: truncates the lineage chain so round k
    # re-executes k's join only, not the cumulative plan of rounds 1..k
    # (the unbroken chain re-runs quadratically at large edge sets). The
    # convergence check is batched every CHECK_EVERY rounds to amortize the
    # driver action; the final rounds cost at most CHECK_EVERY-1 no-op
    # propagations past the fixpoint.
    CHECK_EVERY = 3
    sym = sym.localCheckpoint()
    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint()
    )
    for it in range(max_iters):
        prop = (
            sym.join(labels, sym.a == labels.id)
            .select(F.col("b").alias("id"), "component")
            .unionByName(labels)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
        ).localCheckpoint()
        if (it + 1) % CHECK_EVERY == 0 or it == max_iters - 1:
            changed = (
                prop.alias("n")
                .join(labels.alias("o"), "id")
                .filter(F.col("n.component") != F.col("o.component"))
                .limit(1)
                .count()
            )
            labels = prop
            if changed == 0:
                break
        else:
            labels = prop
    return labels.orderBy("id")

"""Index ↔ corpus binding: digest-bound index metadata + refusal check.

Reference:
- rag/build_corpus.py:61-73 `compute_corpus_digest`: sha256 over
  `doc_id\\n text\\n` in str(doc_id) order — the binding token.
- rag/index_builder.py:42,87: the index build refuses an invalid corpus
  and stamps `corpus_digest` + `doc_count` (+ embedding model) into the
  index metadata sidecar.
- rag/snapshot_index.py:77-120 `_verify_meta_contract`: retrieval
  refuses when the sidecar's embedding_model, corpus_digest, or
  doc_count disagree with the live corpus — checked in that order.

Scale note: the reference digest is an inherently SEQUENTIAL sha256
over the ordered byte stream, so exact parity costs one single-reducer
pass (fine for the manifest-sized corpora it guards).  At 100 TB the
engine's order-insensitive per-source digest (queries_corpus.
q_corpus_digest — sha256 of sorted content hashes) is the scale path;
verify_index_binding is digest-scheme agnostic, it only compares.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_corpus_digest(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """compute_corpus_digest parity: 1 row (digest, doc_count).

    Deliberate single-reducer plan (repartition(1) + in-partition sort)
    — the sequential hash cannot be parallelized without changing the
    reference's byte stream.

    Reference quirk (build_corpus.py:64-68): the id goes through
    `str(doc.get('doc_id') or '')`, so FALSY ids coerce to '' in both
    the sort key and the hashed bytes.  Falsiness is Python-typed:
    numeric 0 is falsy, the string "0" is not — mirrored here off the
    column's dtype.
    """
    col = F.col(id_col)
    if dict(docs.dtypes).get(id_col) == "string":
        key = F.when(col.isNull() | (col == ""), F.lit("")).otherwise(col)
    else:
        key = (
            F.when(col.isNull() | (col == F.lit(0)), F.lit(""))
            .otherwise(col.cast("string"))
        )
    line = F.concat_ws("", key, F.lit("\n"),
                       F.coalesce(F.col(text_col), F.lit("")), F.lit("\n"))
    return (
        docs.select(key.alias("_k"), line.alias("_line"))
        .repartition(1)
        .sortWithinPartitions("_k")
        .agg(
            F.sha2(F.concat_ws("", F.collect_list("_line")), 256).alias(
                "digest"
            ),
            F.count(F.lit(1)).alias("doc_count"),
        )
    )


def verify_index_binding(
    corpus_digest: DataFrame,
    index_meta: DataFrame,
    expected_model: str,
) -> DataFrame:
    """_verify_meta_contract's model → digest → doc_count refusal chain.

    corpus_digest: 1 row (digest, doc_count) — the live corpus truth.
    index_meta: (index_id, embedding_model, corpus_digest, doc_count).
    -> per index: match flags, binding_ok, and the first refusal reason
    in reference check order (or null when bound).
    """
    truth = corpus_digest.select(
        F.col("digest").alias("expected_digest"),
        F.col("doc_count").alias("expected_doc_count"),
    )
    j = index_meta.crossJoin(F.broadcast(truth))
    model_match = F.coalesce(F.col("embedding_model"), F.lit("")) == expected_model
    # eqNullSafe: a missing sidecar digest/doc_count must REFUSE (the
    # reference's _verify_meta_contract refuses on any disagreement) —
    # a plain == would yield NULL and skip the refusal CASE branch.
    digest_match = F.col("corpus_digest").eqNullSafe(F.col("expected_digest"))
    count_match = F.col("doc_count").eqNullSafe(F.col("expected_doc_count"))
    refusal = (
        F.when(~model_match, F.lit("embedding_model mismatch"))
        .when(~digest_match, F.lit("corpus_digest mismatch"))
        .when(~count_match, F.lit("doc_count mismatch"))
        .otherwise(F.lit(None).cast("string"))
    )
    return j.select(
        "index_id",
        "expected_digest",
        F.col("corpus_digest").alias("meta_digest"),
        "expected_doc_count",
        F.col("doc_count").alias("meta_doc_count"),
        model_match.alias("model_match"),
        digest_match.alias("digest_match"),
        count_match.alias("count_match"),
        (model_match & digest_match & count_match).alias("binding_ok"),
        refusal.alias("refusal"),
    ).orderBy("index_id")

"""Scale-machinery tests: delta compaction and the bucketed seen-set
anti-join (the 10^10-URL plan shape)."""

from __future__ import annotations

import io
import contextlib

from pyspark.sql import functions as F

from earcrawler_spark.crawler import synth
from earcrawler_spark.crawler.runner import Crawler, CrawlConfig


def test_compaction_preserves_state_and_resume(spark, tmp_path):
    d = str(tmp_path / "c")
    c = Crawler(spark, d, CrawlConfig(max_iters=2, n_partitions=4))
    c.init_seeds(synth.seed_list())
    c.run(max_iters=2)
    seen_before = {r["url_hash"] for r in c.seen_set().collect()}
    visits_before = c.visits_ordered().count()

    compacted = c.state.compact()
    assert compacted.get("seen") == 2

    # reads after compaction see identical state
    assert {r["url_hash"] for r in c.seen_set().collect()} == seen_before
    assert c.visits_ordered().count() == visits_before

    # and the crawl resumes correctly on top of the compacted base
    c2 = Crawler(spark, d, CrawlConfig(max_iters=3, n_partitions=4))
    c2.run(max_iters=3)
    ref = Crawler(spark, str(tmp_path / "ref"), CrawlConfig(max_iters=3, n_partitions=4))
    ref.init_seeds(synth.seed_list())
    ref.run()
    assert c2.state.manifest()["chain_hash"] == ref.state.manifest()["chain_hash"]
    assert {r["url_hash"] for r in c2.seen_set().collect()} == {
        r["url_hash"] for r in ref.seen_set().collect()
    }


def test_bucketed_seen_anti_join_avoids_probe_shuffle(spark, tmp_path):
    """At 10^10 URLs the seen table is bucketed by url_hash so the per-wave
    anti-join never reshuffles the (huge) seen side: both sides bucketed
    on the join key → SortMergeJoin with zero Exchange operators."""
    spark.sql("DROP TABLE IF EXISTS seen_bucketed")
    spark.sql("DROP TABLE IF EXISTS incoming_bucketed")
    base = spark.range(20000).select(
        F.sha2(F.col("id").cast("string"), 256).alias("url_hash")
    )
    (base.write.mode("overwrite").bucketBy(8, "url_hash").sortBy("url_hash")
         .saveAsTable("seen_bucketed"))
    inc = spark.range(15000, 25000).select(
        F.sha2(F.col("id").cast("string"), 256).alias("url_hash")
    )
    (inc.write.mode("overwrite").bucketBy(8, "url_hash").sortBy("url_hash")
        .saveAsTable("incoming_bucketed"))

    seen = spark.table("seen_bucketed")
    incoming = spark.table("incoming_bucketed")
    new = incoming.join(seen.hint("merge"), "url_hash", "left_anti")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        new.explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan, f"bucketed anti-join still shuffles:\n{plan}"
    assert new.count() == 5000  # ids 20000..24999 are new
    spark.sql("DROP TABLE IF EXISTS seen_bucketed")
    spark.sql("DROP TABLE IF EXISTS incoming_bucketed")

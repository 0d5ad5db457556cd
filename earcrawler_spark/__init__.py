"""earcrawler_spark — a brand-new PySpark-native crawl + analytics engine.

Re-expresses the capabilities of the reference system
(cfrydenlund01/earCrawler, a single-process requests/JSONL crawler +
KG/RAG stack) as an idiomatic Spark engine:

- ``crawler``   — salted, partitioned URL frontier + fetch scheduler with a
                  bloom-filtered URL-seen set, per-host politeness,
                  robots.txt caching and checkpointed, resumable state.
- ``functions`` — vectorized scalar surface (text normalization, PII scrub,
                  citation extraction, hashing, URL canonicalization).
- ``operators`` — relational operator library (dedup families, ranking/BM25/
                  RRF, as-of temporal selection, record merge, reconcile,
                  similarity search, analytics aggregations).
- ``streaming`` — incremental change-detection (monitor delta) semantics.

Everything is DataFrame-first: Catalyst plans the physical execution; Python
appears only inside Arrow-batched pandas UDFs (never per-row).
"""

__version__ = "0.1.0"

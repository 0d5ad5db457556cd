"""Checkpointed crawl state with per-iteration deltas + atomic manifest.

Layout (one directory per run):

    state_dir/
      manifest.json                 # {"completed_iter": N, "chain_hash": …}
      frontier/iter=NNNNN/          # full rewrite per iteration
      seen/iter=NNNNN/              # append-only url_hash deltas
      content_seen/iter=NNNNN/      # append-only content-hash deltas
      bloom/iter=NNNNN/             # (shard, bits) — full rewrite
      robots/iter=NNNNN/            # full rewrite (host rules cache)
      documents/iter=NNNNN/         # append-only crawled docs (spans)
      visits/iter=NNNNN/            # append-only ordered visit log
      metrics/iter=NNNNN/           # append-only per-partition lineage

Crash safety: an iteration's directories are written first; the manifest
(update via write-temp + atomic rename) is the commit point. A run killed
mid-iteration resumes from the last committed manifest and recomputes the
partial iteration from identical inputs — determinism makes the redo
byte-equivalent (proven by tests/test_crawler_resume.py).

On a production deployment every append-only table here is an Iceberg
table (snapshot = manifest) and `seen` is MERGE'd; the store keeps that
swap behind ``read_all`` / ``write_delta`` so the engine code is
layout-agnostic.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

APPEND_TABLES = ("seen", "content_seen", "documents", "visits", "metrics")
FULL_TABLES = ("frontier", "bloom", "robots", "fetch_cache")


class CrawlState:
    def __init__(self, spark: SparkSession, state_dir: str):
        self.spark = spark
        self.dir = state_dir
        os.makedirs(state_dir, exist_ok=True)

    # -- manifest -----------------------------------------------------
    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.dir, "manifest.json")

    def manifest(self) -> dict:
        if not os.path.exists(self._manifest_path):
            return {"completed_iter": -1, "chain_hash": ""}
        with open(self._manifest_path) as f:
            return json.load(f)

    def commit(self, iteration: int, chain_hash: str, extra: dict | None = None) -> None:
        prev = self.manifest()
        m = {
            **{k: v for k, v in prev.items() if k == "compacted"},
            "completed_iter": iteration,
            "chain_hash": chain_hash,
            **(extra or {}),
        }
        self._write_manifest(m)

    def _write_manifest(self, m: dict) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.dir, suffix=".manifest")
        with os.fdopen(fd, "w") as f:
            json.dump(m, f, sort_keys=True)
        os.replace(tmp, self._manifest_path)  # atomic commit point

    # -- table io -----------------------------------------------------
    def _iter_dir(self, table: str, iteration: int) -> str:
        return os.path.join(self.dir, table, f"iter={iteration:05d}")

    def write(self, table: str, iteration: int, df: DataFrame, n_files: int | None = None) -> None:
        if n_files is not None and n_files > 0:
            df = df.coalesce(n_files)
        df.write.mode("overwrite").parquet(self._iter_dir(table, iteration))

    def read_latest(self, table: str, upto_iter: int) -> DataFrame | None:
        """Latest full-rewrite snapshot of a FULL_TABLES table."""
        for i in range(upto_iter, -1, -1):
            p = self._iter_dir(table, i)
            if os.path.exists(os.path.join(p, "_SUCCESS")):
                return self.spark.read.parquet(p)
        return None

    def expire(self, upto_iter: int, keep_full_last: int = 1) -> list[str]:
        """Retention GC (reference utils/retention.py:77-130 age-based
        deletion): full-rewrite tables only need their latest snapshot —
        drop iteration dirs older than the last ``keep_full_last``
        committed ones. Append-only tables are history and are kept
        (Iceberg snapshot expiry would handle both).

        Returns the deleted directory paths."""
        import shutil

        assert keep_full_last >= 1
        deleted: list[str] = []
        for table in FULL_TABLES:
            committed = [
                i
                for i in range(upto_iter + 1)
                if os.path.exists(os.path.join(self._iter_dir(table, i), "_SUCCESS"))
            ]
            for i in committed[:-keep_full_last]:
                path = self._iter_dir(table, i)
                shutil.rmtree(path, ignore_errors=True)
                deleted.append(path)
        return deleted

    def _base_dir(self, table: str, upto: int) -> str:
        return os.path.join(self.dir, table, f"base={upto:05d}")

    def read_all(self, table: str, upto_iter: int) -> DataFrame | None:
        """Union of committed deltas of an APPEND_TABLES table — a
        compacted base (if the manifest records one) plus the deltas
        after it, so read fan-in stays bounded over long crawls."""
        base_iter = self.manifest().get("compacted", {}).get(table, -1)
        paths = []
        if base_iter >= 0 and base_iter <= upto_iter:
            base = self._base_dir(table, base_iter)
            if os.path.exists(os.path.join(base, "_SUCCESS")):
                paths.append(base)
        paths += [
            self._iter_dir(table, i)
            for i in range(base_iter + 1, upto_iter + 1)
            if os.path.exists(os.path.join(self._iter_dir(table, i), "_SUCCESS"))
        ]
        if not paths:
            return None
        return self.spark.read.parquet(*paths)

    def compact(self, tables: tuple[str, ...] = APPEND_TABLES, n_files: int = 8) -> dict:
        """Compact append-only deltas into one base snapshot per table
        (Iceberg rewrite_data_files analog). Crash-safe: the base dir is
        written first; the manifest update is the commit point; old
        delta dirs are removed only after it. A crash in between leaves
        both base and deltas readable (read_all prefers base + tail).
        """
        import shutil

        m = self.manifest()
        upto = m["completed_iter"]
        compacted = dict(m.get("compacted", {}))
        for table in tables:
            df = self.read_all(table, upto)
            if df is None:
                continue
            df.coalesce(n_files).write.mode("overwrite").parquet(
                self._base_dir(table, upto)
            )
            compacted[table] = upto
        m["compacted"] = compacted
        self._write_manifest(m)
        # post-commit cleanup of superseded deltas + old bases
        for table in tables:
            upto_t = compacted.get(table, -1)
            for i in range(upto_t + 1):
                shutil.rmtree(self._iter_dir(table, i), ignore_errors=True)
            tdir = os.path.join(self.dir, table)
            if os.path.isdir(tdir):
                for d in os.listdir(tdir):
                    if d.startswith("base=") and d != f"base={upto_t:05d}":
                        shutil.rmtree(os.path.join(tdir, d), ignore_errors=True)
        return compacted

"""Link-graph PageRank (queries_graph) + mergeable sketches
(queries_sketches): each query is checked against a hand-rolled pure
Python reference model implementing the identical micro-integer
recurrences; strict engine parity is covered by the oracle sweep."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

SF = "/root/testdata/sf0.001"

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars int"


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(rows, DOC_SCHEMA).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    return str(tmp_path)


def _pagerank_model(doc_ids):
    from earcrawler_spark.queries_graph import (
        PR_BASE,
        PR_DAMP_NUM,
        PR_FANOUT,
        PR_ITERS,
        _STRIDE,
    )

    n = len(doc_ids)
    edges = set()
    for d in doc_ids:
        for j in range(1, PR_FANOUT + 1):
            dst = (d * _STRIDE + 11 * j) % n
            if dst != d:
                edges.add((d, dst))
    outdeg = Counter(s for s, _ in edges)
    indeg = Counter(t for _, t in edges)
    r = {d: 1_000_000 for d in doc_ids}
    for _ in range(PR_ITERS):
        s: dict = defaultdict(int)
        for src, dst in edges:
            s[dst] += r[src] // outdeg[src]
        r = {d: PR_BASE + (PR_DAMP_NUM * s.get(d, 0)) // 100 for d in doc_ids}
    return r, outdeg, indeg


def test_pagerank_matches_model_fixture(spark, tmp_path):
    """12-node derived graph: ranks, degrees and the micro recurrence
    must equal the sequential model exactly."""
    from earcrawler_spark.queries_graph import q_link_pagerank

    rows = [(i, f"doc {i}", "en", "s0", 0) for i in range(12)]
    out = q_link_pagerank(spark, _write_docs(spark, tmp_path, rows)).collect()
    r, outdeg, indeg = _pagerank_model(list(range(12)))
    assert len(out) == 12
    for row in out:
        assert row["pr_micro"] == r[row["node"]]
        assert row["out_deg"] == outdeg.get(row["node"], 0)
        assert row["in_deg"] == indeg.get(row["node"], 0)
        assert row["pagerank"] == row["pr_micro"] / 1_000_000


def test_pagerank_mass_and_floor(spark):
    """Every node keeps at least the damping base; hubs (higher in_deg)
    hold more mass than the base on the real corpus graph."""
    from earcrawler_spark.queries_graph import PR_BASE, q_link_pagerank

    rows = q_link_pagerank(spark, SF).collect()
    assert all(r["pr_micro"] >= PR_BASE for r in rows)
    assert any(r["pr_micro"] > PR_BASE for r in rows)
    # leak-only inequality: total mass never exceeds the initial total
    assert sum(r["pr_micro"] for r in rows) <= 1_000_000 * len(rows)


def _cms_bucket_model(i: int, t: str) -> int:
    from earcrawler_spark.queries_sketches import CMS_W

    return int(hashlib.sha256(f"{i}:{t}".encode()).hexdigest()[:2], 16) % CMS_W


def test_cms_estimates_match_model_and_overestimate(spark):
    """Sketch counts and per-term min-row estimates must equal the
    sequential CMS model on the sf0.001 corpus; the one-sided
    guarantee est >= exact must hold for every candidate row."""
    from earcrawler_spark.queries_sketches import CMS_D, q_cms_heavy_hitters

    import duckdb

    toks = [
        t
        for (txt,) in duckdb.sql(
            f"SELECT text FROM '{SF}/documents.parquet'"
        ).fetchall()
        for t in txt.lower().split()
    ]
    exact = Counter(toks)
    cms: dict = defaultdict(int)
    for t, c in exact.items():
        for i in range(CMS_D):
            cms[(i, _cms_bucket_model(i, t))] += c
    rows = q_cms_heavy_hitters(spark, SF).collect()
    assert rows, "no candidates"
    for r in rows:
        assert r["exact_c"] == exact[r["term"]]
        est = min(cms[(i, _cms_bucket_model(i, r["term"]))] for i in range(CMS_D))
        assert r["est_c"] == est
        assert r["overestimate"] is True
        assert r["inflation"] == r["est_c"] - r["exact_c"] >= 0
    # candidates are the exact top-k by (count desc, term)
    got = [(r["exact_c"], r["term"]) for r in rows]
    want = sorted(((c, t) for t, c in exact.items()), key=lambda x: (-x[0], x[1]))
    assert got == [(c, t) for c, t in want[: len(rows)]]


def test_weighted_sample_matches_es_model(spark, tmp_path):
    """The per-source top-8 must equal the sequential Efraimidis-
    Spirakis model (same sha-derived uniform, micro-rounded ln,
    l_micro/w ordering), and a heavyweight doc must beat lightweights
    into the sample."""
    from earcrawler_spark.queries_curation import WS_K, q_weighted_sample

    rows = [(i, " ".join(f"w{i}x{j}" for j in range(5)), "en", "s0", 0) for i in range(20)]
    rows.append((99, " ".join(f"h{j}" for j in range(2000)), "en", "s0", 0))
    out = q_weighted_sample(spark, _write_docs(spark, tmp_path, rows)).collect()

    def prio(doc_id, w):
        u32 = int(hashlib.sha256(f"{doc_id}:ws".encode()).hexdigest()[:8], 16)
        l_micro = round(math.log((u32 + 1) / 4294967296) * 1_000_000)
        return l_micro / w

    model = sorted(
        ((prio(d, w), d, w) for d, w in [(i, 5) for i in range(20)] + [(99, 2000)]),
        key=lambda t: (-t[0], t[1]),
    )[:WS_K]
    assert [(r["doc_id"], r["w"], r["priority"]) for r in out] == [
        (d, w, p) for p, d, w in model
    ]
    assert [r["sample_rank"] for r in out] == list(range(1, WS_K + 1))
    assert any(r["doc_id"] == 99 for r in out), "heavyweight doc missed the sample"


def test_histogram_quantiles_bound_and_exact_rank(spark):
    """The estimate must sit on a bin lower edge at most one bin below
    the exact k-th order statistic, and the exact column must equal the
    sequential order-statistic model per event_type."""
    from earcrawler_spark.queries_sketches import HQ_BINS, HQ_PS, q_histogram_quantiles

    import duckdb

    ev = duckdb.sql(
        f"SELECT event_type, round(value * 1000000, 0)::BIGINT AS vm, event_id"
        f" FROM '{SF}/events.parquet'"
    ).fetchall()
    by_type: dict = defaultdict(list)
    for et, vm, eid in ev:
        by_type[et].append((vm, eid))
    rows = q_histogram_quantiles(spark, SF).collect()
    assert len(rows) == len(by_type) * len(HQ_PS)
    for r in rows:
        vals = sorted(by_type[r["event_type"]])
        n = len(vals)
        assert r["n"] == n
        k = math.ceil(r["p"] * n / 100)
        assert r["k"] == k
        exact_m = vals[k - 1][0]
        assert r["exact"] == exact_m / 1_000_000
        assert r["within_bound"] is True
        assert r["est"] <= r["exact"] < r["est"] + r["bin_width"]
        lo = min(v for v, _ in vals)
        hi = max(v for v, _ in vals)
        wi = (hi - lo) // HQ_BINS + 1
        assert r["bin_width"] == wi / 1_000_000


def test_graph_triangles_matches_bruteforce(spark):
    """n_triangles / n_wedges / clustering reproduced by a direct
    adjacency-set model over the same synthesized graph."""
    from itertools import combinations

    from earcrawler_spark.queries_graph import _STRIDE, PR_FANOUT, q_graph_triangles
    from tests.conftest import SF_SMALL

    row = q_graph_triangles(spark, SF_SMALL).collect()[0]
    ids = [
        r["doc_id"]
        for r in spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    n = len(ids)
    und = set()
    for s in ids:
        for j in range(1, PR_FANOUT + 1):
            d = (s * _STRIDE + 11 * j) % n
            if d != s:
                und.add((min(s, d), max(s, d)))
    adj: dict[int, set[int]] = {}
    for u, v in und:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    wedges = sum(len(s) * (len(s) - 1) // 2 for s in adj.values())
    tris = sum(
        1
        for node, nbrs in adj.items()
        for a, b in combinations(sorted(nbrs), 2)
        if node < a and b in adj[a]
    )
    assert row["n_nodes"] == len(adj)
    assert row["n_edges"] == len(und)
    assert row["n_wedges"] == wedges
    assert row["n_triangles"] == tris
    assert row["clustering"] == round(3 * tris / wedges, 6)

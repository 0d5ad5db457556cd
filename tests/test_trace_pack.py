"""Trace-pack provenance hash vs a reference model (trace/trace_pack.py)."""

import hashlib
import json
import re

from pyspark.sql import functions as F

from earcrawler_spark.operators.trace import provenance_hash

_SEC_RE = re.compile(
    r"(?i)^(?:15\s*CFR\s*)?(?:§+\s*)?(?P<section>\d{3}(?:\.\S+)?)$"
)


def _norm_sec(value):
    raw = str(value or "").strip()
    if not raw:
        return None
    if raw.upper().startswith("EAR-"):
        return raw.split("#", 1)[0].strip() if "#" in raw else raw
    cleaned = re.sub(r"^§+\s*", "", raw.rstrip(".,;:")).strip()
    m = _SEC_RE.match(cleaned)
    return f"EAR-{m.group('section')}" if m else raw


def _s(v):
    return str(v or "").strip()


def _model_payload(pack):
    # canonical_provenance_payload transcribed (trace_pack.py:73-225)
    quotes = []
    for row in pack.get("section_quotes") or []:
        sid, quote = _norm_sec(row.get("section_id")), _s(row.get("quote"))
        if not sid or not quote:
            continue
        quotes.append(
            {
                "section_id": sid,
                "quote": quote,
                "source_url": _s(row.get("source_url")) or None,
                "score": float(row["score"]) if row.get("score") is not None else None,
            }
        )
    quotes.sort(
        key=lambda i: (
            str(i["section_id"] or ""), str(i["quote"] or ""),
            str(i["source_url"] or ""),
            float(i["score"]) if i["score"] is not None else -1.0,
        )
    )
    paths = []
    for p in pack.get("kg_paths") or []:
        pid = _s(p.get("path_id"))
        edges = [
            {"source": _s(e.get("source")), "predicate": _s(e.get("predicate")),
             "target": _s(e.get("target"))}
            for e in p.get("edges") or []
            if _s(e.get("source")) and _s(e.get("predicate")) and _s(e.get("target"))
        ]
        if not pid or not edges:
            continue
        edges.sort(key=lambda e: (e["source"], e["predicate"], e["target"]))
        paths.append({"path_id": pid, "edges": edges})
    paths.sort(key=lambda i: str(i["path_id"] or ""))
    cits = []
    for c in pack.get("citations") or []:
        sid = _norm_sec(c.get("section_id"))
        if not sid:
            continue
        cits.append(
            {"section_id": sid, "quote": _s(c.get("quote")),
             "span_id": _s(c.get("span_id")), "source": _s(c.get("source"))}
        )
    cits.sort(
        key=lambda i: (str(i["section_id"] or ""), str(i["quote"] or ""),
                       str(i["span_id"] or ""), str(i["source"] or ""))
    )
    meta = []
    for r in pack.get("retrieval_metadata") or []:
        rid = _s(r.get("id"))
        section = _norm_sec(r.get("section") or r.get("id"))
        if not rid and not section:
            continue
        meta.append(
            {"id": rid or section, "section": section,
             "score": float(r["score"]) if r.get("score") is not None else None,
             "source": _s(r.get("source")), "url": _s(r.get("url")),
             "title": _s(r.get("title"))}
        )
    meta.sort(
        key=lambda i: (str(i["id"] or ""), str(i["section"] or ""),
                       float(i["score"]) if i["score"] is not None else -1.0)
    )
    prov = {}
    for k in (
        "snapshot_id", "snapshot_sha256", "corpus_digest", "index_path",
        "index_sha256", "index_meta_path", "index_meta_sha256",
        "index_meta_schema_version", "index_build_timestamp_utc",
        "embedding_model", "llm_provider", "llm_model",
    ):
        v = _s((pack.get("run_provenance") or {}).get(k))
        if v:
            prov[k] = v
    return {
        "section_quotes": quotes, "kg_paths": paths, "citations": cits,
        "retrieval_metadata": meta, "run_provenance": prov,
    }


def _model_hash(pack):
    blob = json.dumps(
        _model_payload(pack), ensure_ascii=False, sort_keys=True,
        separators=(",", ":"),
    )
    return hashlib.sha256(blob.encode("utf-8")).hexdigest()


_SCHEMA = (
    "section_quotes array<struct<section_id:string,quote:string,"
    "source_url:string,score:double>>, "
    "kg_paths array<struct<path_id:string,edges:array<struct<source:string,"
    "predicate:string,target:string>>>>, "
    "citations array<struct<section_id:string,quote:string,span_id:string,"
    "source:string>>, "
    "retrieval_metadata array<struct<id:string,section:string,score:double,"
    "source:string,url:string,title:string>>, "
    "run_provenance struct<snapshot_id:string,snapshot_sha256:string,"
    "corpus_digest:string,index_path:string,index_sha256:string,"
    "index_meta_path:string,index_meta_sha256:string,"
    "index_meta_schema_version:string,index_build_timestamp_utc:string,"
    "embedding_model:string,llm_provider:string,llm_model:string>, "
    "idx int"
)


def test_provenance_hash_matches_reference_model(spark):
    packs = [
        {  # full pack, unsorted inputs, droppable entries
            "section_quotes": [
                {"section_id": "§ 736.2", "quote": " beta ", "source_url": None, "score": 0.5},
                # NBSP/em-space padding strips like str.strip()
                {"section_id": "EAR-701.9", "quote": "\u00a0nb\u2003", "source_url": None, "score": None},
                {"section_id": "EAR-701.8", "quote": "\u00a0\u00a0", "source_url": None, "score": None},
                {"section_id": "EAR-700.1", "quote": "alpha", "source_url": "https://x", "score": None},
                {"section_id": "", "quote": "orphan", "source_url": None, "score": 1.5},
                {"section_id": "EAR-700.1", "quote": "", "source_url": None, "score": None},
            ],
            "kg_paths": [
                {"path_id": "p2", "edges": [
                    {"source": "b", "predicate": "r", "target": "c"},
                    {"source": "a", "predicate": "r", "target": "b"},
                    {"source": "", "predicate": "x", "target": "y"},
                ]},
                {"path_id": "p1", "edges": [
                    {"source": "n1", "predicate": "cites", "target": "n2"},
                ]},
                {"path_id": "", "edges": [
                    {"source": "q", "predicate": "q", "target": "q"},
                ]},
            ],
            "citations": [
                {"section_id": "736.2", "quote": "z", "span_id": "s1", "source": "faiss"},
                {"section_id": "EAR-700.1#frag", "quote": "", "span_id": "", "source": "kg"},
                {"section_id": "", "quote": "drop", "span_id": "", "source": ""},
            ],
            "retrieval_metadata": [
                {"id": "d2", "section": "EAR-736.2", "score": 1.5, "source": "faiss", "url": "https://u", "title": "T"},
                {"id": "", "section": "15 CFR 700.1", "score": None, "source": "kg", "url": "", "title": ""},
                {"id": "", "section": "", "score": 0.25, "source": "x", "url": "", "title": ""},
                # whitespace-only section is TRUTHY in the reference's
                # `section or id` — it must NOT fall back to the id
                {"id": "d9", "section": " ", "score": None, "source": "f", "url": "", "title": ""},
            ],
            "run_provenance": {
                "snapshot_id": "snap-1", "snapshot_sha256": "a" * 64,
                "corpus_digest": "b" * 64, "index_path": "/idx",
                "index_sha256": "", "index_meta_path": None,
                "index_meta_sha256": None, "index_meta_schema_version": None,
                "index_build_timestamp_utc": None,
                "embedding_model": "mini", "llm_provider": "", "llm_model": "m",
            },
        },
        {  # empty lists
            "section_quotes": [], "kg_paths": [], "citations": [],
            "retrieval_metadata": [], "run_provenance": {},
        },
        {  # stable-sort ties (ADVICE r5): entries equal on the reference
            # sort keys but serializing differently must keep arrival
            # order, exactly like Python's stable sorted() — input order
            # chosen so a lexicographic tiebreak on the JSON would flip it
            "section_quotes": [
                # score None vs -1.0 both key as -1.0; "null" > "-1.0"
                {"section_id": "EAR-700.1", "quote": "q", "source_url": None, "score": None},
                {"section_id": "EAR-700.1", "quote": "q", "source_url": None, "score": -1.0},
            ],
            "kg_paths": [
                # same path_id, different edges: arrival order wins
                {"path_id": "p1", "edges": [
                    {"source": "z", "predicate": "r", "target": "z"}]},
                {"path_id": "p1", "edges": [
                    {"source": "a", "predicate": "r", "target": "a"}]},
            ],
            "citations": [],
            "retrieval_metadata": [
                # tie on (id, section, score); url/title differ
                {"id": "d1", "section": "EAR-736.2", "score": 0.5,
                 "source": "faiss", "url": "https://z", "title": "zz"},
                {"id": "d1", "section": "EAR-736.2", "score": 0.5,
                 "source": "kg", "url": "https://a", "title": "aa"},
            ],
            "run_provenance": {},
        },
    ]

    def row(pack, idx):
        def prov(k):
            return (pack.get("run_provenance") or {}).get(k)

        return (
            [tuple(e.get(k) for k in ("section_id", "quote", "source_url", "score"))
             for e in pack["section_quotes"]],
            [(p.get("path_id"),
              [tuple(e.get(k) for k in ("source", "predicate", "target"))
               for e in p.get("edges") or []])
             for p in pack["kg_paths"]],
            [tuple(c.get(k) for k in ("section_id", "quote", "span_id", "source"))
             for c in pack["citations"]],
            [tuple(r.get(k) for k in ("id", "section", "score", "source", "url", "title"))
             for r in pack["retrieval_metadata"]],
            tuple(prov(k) for k in (
                "snapshot_id", "snapshot_sha256", "corpus_digest", "index_path",
                "index_sha256", "index_meta_path", "index_meta_sha256",
                "index_meta_schema_version", "index_build_timestamp_utc",
                "embedding_model", "llm_provider", "llm_model")),
            idx,
        )

    df = spark.createDataFrame([row(p, i) for i, p in enumerate(packs)], _SCHEMA)
    got = {
        r["idx"]: r["h"]
        for r in df.select(
            "idx",
            provenance_hash(
                F.col("section_quotes"), F.col("kg_paths"), F.col("citations"),
                F.col("retrieval_metadata"), F.col("run_provenance"),
            ).alias("h"),
        ).collect()
    }
    for i, p in enumerate(packs):
        assert got[i] == _model_hash(p), f"pack {i}"

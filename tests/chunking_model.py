"""Sequential model of the section_subsection chunking rules, used as the
test oracle for operators/chunking.py (same role as tests/reference_model.py
for the crawler). Implements the documented contract of
earCrawler/rag/chunking.py:144-286 independently — marker grammar, roman and
duplicate-label guards, digit nesting, paragraph/newline/whitespace split
ladder, greedy kept-prefix containers, #pNNNN children.

Emits dict rows shaped like the Spark operator's output columns so tests can
compare directly (chunk_id, section_id, parent_id, chunk_kind, ordinal,
chunk_text, split_error).
"""

from __future__ import annotations

import re

LETTER = re.compile(r"(?m)^\s*\(\s*([a-z])\s*\)\s")
DIGIT = re.compile(r"(?m)^\s*\(\s*(\d+)\s*\)\s")


def pack_words(text: str, max_chars: int) -> list[str]:
    out: list[str] = []
    cur = ""
    for w in text.split():
        if not cur:
            if len(w) <= max_chars:
                cur = w
            else:
                out += [w[i : i + max_chars] for i in range(0, len(w), max_chars)]
            continue
        if len(cur) + 1 + len(w) <= max_chars:
            cur += " " + w
        else:
            out.append(cur)
            cur = ""
            if len(w) <= max_chars:
                cur = w
            else:
                out += [w[i : i + max_chars] for i in range(0, len(w), max_chars)]
    if cur:
        out.append(cur)
    return out


def split_ladder(text: str, max_chars: int) -> list[str]:
    paras = [p.strip() for p in re.split(r"\n\s*\n", text) if p.strip()]
    if len(paras) <= 1:
        paras = [p.strip() for p in re.split(r"\n+", text) if p.strip()]
    if len(paras) <= 1:
        paras = pack_words(text, max_chars)
    return paras


def emit(row: dict, max_chars: int) -> list[dict]:
    text = row["chunk_text"].strip()
    row = dict(row, chunk_text=text, split_error=False)
    if len(text) <= max_chars:
        return [row]
    paras = split_ladder(text, max_chars)
    if len(paras) <= 1 or any(len(p) > max_chars for p in paras):
        return [dict(row, split_error=True)]
    kept, used = [], 0
    for p in paras:
        need = len(p) + (2 if kept else 0)
        if used + need > max_chars:
            break
        kept.append(p)
        used += need
    if not kept:
        kept = [paras[0]]
    out = [dict(row, chunk_text="\n\n".join(kept))]
    base = row["chunk_id"]
    for i, p in enumerate(paras, start=1):
        out.append(
            {
                "chunk_id": f"{base}#p{i:04d}",
                "section_id": base,
                "parent_id": base,
                "chunk_kind": "paragraph",
                "ordinal": i,
                "chunk_text": p,
                "split_error": False,
            }
        )
    return out


def chunk_model(sec: str, text: str, max_chars: int) -> list[dict]:
    rows: list[dict] = []

    def container(cid, sid, parent, kind, ordinal, body):
        rows.extend(
            emit(
                {
                    "chunk_id": cid,
                    "section_id": sid,
                    "parent_id": parent,
                    "chunk_kind": kind,
                    "ordinal": ordinal,
                    "chunk_text": body,
                },
                max_chars,
            )
        )

    container(sec, sec, None, "section", 0, text.strip())

    marks = [m for m in LETTER.finditer(text) if m.group(1) not in ("i", "v", "x")]
    labels = [m.group(1) for m in marks]
    if len(set(labels)) != len(labels):
        marks = []
    for i, m in enumerate(marks):
        end = marks[i + 1].start() if i + 1 < len(marks) else len(text)
        block = text[m.start() : end].strip()
        lid = f"{sec}({m.group(1)})"
        dmarks = list(DIGIT.finditer(block))
        dlabels = [d.group(1) for d in dmarks]
        if len(set(dlabels)) != len(dlabels):
            dmarks = []
        if not dmarks:
            container(lid, lid, sec, "subsection", i + 1, block)
            continue
        lead = block[: dmarks[0].start()].strip()
        if lead:
            container(lid, lid, sec, "subsection", i + 1, lead)
        for j, d in enumerate(dmarks):
            dend = dmarks[j + 1].start() if j + 1 < len(dmarks) else len(block)
            did = f"{lid}({d.group(1)})"
            container(did, did, lid, "subsection", j + 1, block[d.start() : dend].strip())
    return rows

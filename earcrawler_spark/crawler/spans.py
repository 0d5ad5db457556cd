"""Vectorized HTML → interleaved span extraction.

Reference semantics (earCrawler/core/ear_crawler.py:126-131): BeautifulSoup
``find_all("p")`` → ``" ".join(text.split())`` → drop empties, paragraph
order preserved. This engine extends the unit to the input-hint document
shape — an ordered sequence of interleaved spans:

    spans: array<struct<kind:string, text:string, media_ref:string, offset:int>>

  kind='text'  → one whitespace-normalized <p> paragraph (empty ones dropped)
  kind='media' → one <img>/<video>/<audio> src, in document position

``offset`` is the 0-based index in the surviving span sequence, so the
per-row invariant vs the reference parse is exactly (kind, text,
media_ref, order).

Parsing runs inside ``mapInPandas``/pandas-UDF batches on stdlib
``html.parser`` (no bs4 in this environment) — one Python parser instance
per row *inside* an Arrow batch, never a per-row Spark UDF round trip.
Link extraction rides the same parse pass so HTML is parsed once.
"""

from __future__ import annotations

from html.parser import HTMLParser

MEDIA_TAGS = {"img", "video", "audio"}


class _SpanParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.spans: list[tuple[str, str, str]] = []  # (kind, text, media_ref)
        self.links: list[str] = []
        self._in_p = False
        self._buf: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag == "p":
            self._flush_p()
            self._in_p = True
        elif tag in MEDIA_TAGS:
            src = dict(attrs).get("src", "")
            if src:
                self.spans.append(("media", "", src))
        elif tag == "a":
            href = dict(attrs).get("href", "")
            if href:
                self.links.append(href)

    def handle_endtag(self, tag):
        if tag == "p":
            self._flush_p()

    def handle_data(self, data):
        if self._in_p:
            self._buf.append(data)

    def _flush_p(self):
        if self._in_p:
            text = " ".join("".join(self._buf).split())
            if text:
                self.spans.append(("text", text, ""))
            self._buf = []
            self._in_p = False


def parse_html(html: str) -> tuple[list[dict], list[str]]:
    """→ (spans with offsets, raw outgoing links). Pure; shared with the
    sequential reference model in tests."""
    p = _SpanParser()
    p.feed(html or "")
    p._flush_p()
    spans = [
        {"kind": k, "text": t, "media_ref": m, "offset": i}
        for i, (k, t, m) in enumerate(p.spans)
    ]
    return spans, p.links


SPANS_SCHEMA = (
    "array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)

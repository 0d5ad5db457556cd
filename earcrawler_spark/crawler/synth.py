"""Deterministic synthetic web — the crawl target for tests and benchmarks.

No external data: every page, link, robots.txt and media ref is a pure
function of its URL via sha256, so any process (Spark executor, the
sequential reference model in tests, the benchmark at two parallelism
levels) regenerates the identical web. Mirrors the reference's seeded
synthetic-corpus precedent (perf/synth/generator.py:23-74, seed=12345).

A ``Universe`` parameterizes the web's shape (host counts/sizes, skew,
politeness delays); it is a plain picklable dataclass, so executors can
evaluate pages inside pandas UDF closures. The module-level DEFAULT
mirrors the reference's crawl domain:
- two HOT hosts (bis.doc.gov, federalregister.gov) with many pages —
  the designed frontier skew the north rule requires salting for;
- several cold hosts;
- pages are HTML with <p> paragraphs (some containing FR citations and
  PII for scrub tests), <img>/<video> media interleaved (the
  'interleaved text + media documents' payload), and <a> links whose
  raw form is deliberately non-canonical (uppercase host, utm params,
  fragments) to exercise canonicalization;
- ~1/9 of pages duplicate another page's body (content-dedup exercise);
- robots.txt per host disallows a /private prefix and sets crawl-delay.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

WORDS = (
    "export administration regulation entity license control commerce "
    "bureau federal register notice rule amendment security review "
    "technology transfer restriction compliance enforcement penalty "
    "the a of to in and for with under"
).split()


def _h(s: str) -> int:
    return int(hashlib.sha256(s.encode()).hexdigest()[:16], 16)


@dataclass(frozen=True)
class Universe:
    hot_hosts: dict[str, int] = field(
        default_factory=lambda: {"bis.doc.gov": 2000, "federalregister.gov": 1500}
    )
    cold_hosts: dict[str, int] = field(
        default_factory=lambda: {
            "ori.hhs.gov": 60,
            "trade.gov": 50,
            "example-univ.edu": 40,
            "research-lab.org": 40,
            "nsf.gov": 30,
            "grants.gov": 30,
        }
    )
    hot_delay: float = 2.0
    cold_delay: float = 1.0
    seeds_per_hot: int = 3
    seeds_per_cold: int = 1
    n_paras_base: int = 2

    @property
    def all_hosts(self) -> dict[str, int]:
        return {**self.hot_hosts, **self.cold_hosts}

    # -- pages ---------------------------------------------------------
    def page_url(self, host: str, idx: int) -> str:
        return f"https://{host}/page/{idx}"

    def page_exists(self, url: str) -> bool:
        """404 simulation: ~1/29 of referenced pages don't exist."""
        return _h("exists|" + url) % 29 != 0

    def page_body_seed(self, host: str, idx: int) -> str:
        """Duplicate-content exercise: ~1/9 pages clone page idx%7's body."""
        h = _h(f"dup|{host}|{idx}")
        if h % 9 == 0 and idx >= 7:
            return f"{host}|{idx % 7}"
        return f"{host}|{idx}"

    def _paragraph(self, seed: str, j: int) -> str:
        h = _h(f"{seed}|para|{j}")
        n = 8 + h % 12
        toks = [WORDS[(h + i * 7) % len(WORDS)] for i in range(n)]
        if h % 5 == 0:
            toks.append(f"{1 + h % 99} FR {1000 + h % 90000}")
        if h % 11 == 0:
            toks.append("contact compliance@example.com or 202-555-1212")
        return " ".join(toks)

    def page_html(self, url: str) -> str:
        parts = url.split("/")
        host, idx = parts[2], int(parts[-1])
        seed = self.page_body_seed(host, idx)
        h = _h(seed)
        n_paras = self.n_paras_base + h % 5
        hosts_sorted = sorted(self.all_hosts)

        chunks = [f"<html><head><title>{host} page {idx}</title></head><body>"]
        for j in range(n_paras):
            chunks.append(f"<p>{self._paragraph(seed, j)}</p>")
            if _h(f"{seed}|media|{j}") % 3 == 0:
                mid = _h(f"{seed}|mediaid|{j}") % 10_000
                kind = "img" if mid % 2 == 0 else "video"
                chunks.append(f'<{kind} src="https://{host}/media/{mid}.bin">')

        hlink = _h(f"link|{host}|{idx}")
        for k in range(2 + hlink % 6):
            lh = _h(f"link|{host}|{idx}|{k}")
            if lh % 4 == 0:  # cross-host
                tgt_host = hosts_sorted[lh % len(hosts_sorted)]
            else:
                tgt_host = host
            tgt_idx = lh % self.all_hosts[tgt_host]
            raw = self.page_url(tgt_host, tgt_idx)
            if lh % 5 == 0:
                raw = raw.replace(tgt_host, tgt_host.upper())
            if lh % 7 == 0:
                raw += "?utm_source=feed&utm_campaign=x"
            if lh % 6 == 0:
                raw += "#section-2"
            chunks.append(f'<a href="{raw}">link {k}</a>')
        if hlink % 13 == 0:
            chunks.append(f'<a href="https://{host}/private/{idx}">private</a>')
        chunks.append("<p></p><p>   </p>")  # empty paragraphs must be dropped
        chunks.append("</body></html>")
        return "".join(chunks)

    # -- transport + robots ----------------------------------------------
    def fetch(self, url: str) -> tuple[int, str]:
        if not self.page_exists(url):
            return 404, ""
        return 200, self.page_html(url)

    def robots_txt(self, host: str) -> str:
        delay = self.hot_delay if host in self.hot_hosts else self.cold_delay
        return "\n".join(
            ["User-agent: *", "Disallow: /private", f"Crawl-delay: {delay}"]
        )

    def seed_list(self) -> list[tuple[str, int, int]]:
        """(url, priority, seq) — hot hosts get higher priority + extra seeds."""
        seeds: list[tuple[str, int, int]] = []
        seq = 0
        for host in sorted(self.all_hosts):
            hot = host in self.hot_hosts
            n_seeds = min(
                self.seeds_per_hot if hot else self.seeds_per_cold,
                self.all_hosts[host],
            )
            prio = 10 if hot else 5
            for i in range(n_seeds):
                seeds.append((self.page_url(host, i), prio, seq))
                seq += 1
        return seeds


DEFAULT = Universe()

HOT_HOSTS = DEFAULT.hot_hosts
COLD_HOSTS = DEFAULT.cold_hosts
ALL_HOSTS = DEFAULT.all_hosts


# module-level shims: tests, the reference model and the default crawler
# all target the DEFAULT universe
def page_url(host: str, idx: int) -> str:
    return DEFAULT.page_url(host, idx)


def page_exists(url: str) -> bool:
    return DEFAULT.page_exists(url)


def page_html(url: str) -> str:
    return DEFAULT.page_html(url)


def robots_txt(host: str) -> str:
    return DEFAULT.robots_txt(host)


def seed_list() -> list[tuple[str, int, int]]:
    return DEFAULT.seed_list()

"""Single-threaded reference-semantics crawler — the executable oracle
(SURVEY.md §5.3). /root/reference is empty (SURVEY.md §0), so this ~150-line
heapq/set simulator IS the operational definition of "matches the reference's
crawl ordering and URL-seen set" (BASELINE.json:6,14): it implements rounds
R1-R9 of plans/crawl.py with plain Python dicts, calling the SAME pure
functions (canonicalize_url, extract_*, budget_for_delay, robots_allowed)
the engine's UDFs call — agreement is therefore meaningful, not circular:
the distributed plan must reproduce what a serial crawler does.
"""

from __future__ import annotations

from opps_feedcrawler_spark.functions.extract import (
    extract_entries_py,
    extract_links_py,
    extract_text_py,
)
from opps_feedcrawler_spark.functions.urlnorm import canonicalize_url, host_of
from opps_feedcrawler_spark.operators.politeness import budget_for_delay
from opps_feedcrawler_spark.operators.robots import robots_allowed


def _path_of(url_norm: str) -> str:
    rest = url_norm.split("://", 1)[1]
    slash = rest.find("/")
    return rest[slash:] if slash >= 0 else "/"


class OracleCrawler:
    def __init__(self, pages_pdf, robots_pdf, seed_urls: list[str]) -> None:
        # corpus: canonical url -> html bytes (first-wins like dropDuplicates
        # after canonicalization in prepare_pages)
        self.pages: dict[str, bytes] = {}
        for u, h in zip(pages_pdf["url"], pages_pdf["html"]):
            cu = canonicalize_url(u)
            if cu is not None and cu not in self.pages:
                self.pages[cu] = bytes(h)
        self.robots: dict[str, tuple[float | None, list]] = {}
        if robots_pdf is not None and len(robots_pdf):
            for _, r in robots_pdf.iterrows():
                self.robots[r["host"]] = (r["crawl_delay"], list(r["rules"]))
        # frontier: url_norm -> min depth
        self.frontier: dict[str, int] = {}
        for u in seed_urls:
            cu = canonicalize_url(u)
            if cu is not None and cu not in self.frontier:
                self.frontier[cu] = 0
        self.seen: set[str] = set()
        self.schedule: list[tuple[int, int, str]] = []  # (round, seq, url)
        self.texts: dict[str, str] = {}
        self.entries: list[dict] = []

    def _allowed(self, url_norm: str) -> bool:
        host = host_of(url_norm)
        if host not in self.robots:
            return True
        _, rules = self.robots[host]
        return robots_allowed(_path_of(url_norm), rules)

    def _budget(self, host: str) -> int:
        delay = self.robots.get(host, (None, None))[0]
        return budget_for_delay(delay)

    def run_round(self, round_no: int) -> list[str]:
        # R2 robots
        disallowed = [u for u in self.frontier if not self._allowed(u)]
        for u in disallowed:
            self.seen.add(u)
            del self.frontier[u]
        # R3-R4 per-host budgeted top-k by (priority DESC, url ASC)
        by_host: dict[str, list[tuple[float, str, int]]] = {}
        for u, depth in self.frontier.items():
            prio = 1.0 / (1.0 + depth)
            by_host.setdefault(host_of(u), []).append((-prio, u, depth))
        scheduled: list[tuple[float, str, int]] = []
        for host, items in by_host.items():
            items.sort()
            scheduled.extend(items[: self._budget(host)])
        scheduled.sort()  # global order (priority DESC, url ASC)
        order = [u for _, u, _ in scheduled]
        self.schedule.extend(
            (round_no, i + 1, u) for i, u in enumerate(order)
        )
        # R5 seen'
        for u in order:
            self.seen.add(u)
            del self.frontier[u]
        # R6-R8 fetch + extract + grow
        for negp, u, depth in scheduled:
            html = self.pages.get(u)
            if html is None:
                continue
            self.texts[u] = extract_text_py(html)
            for e in extract_entries_py(html):
                self.entries.append({"page_url": u, **e})
            for raw in extract_links_py(html, u):
                cu = canonicalize_url(raw)
                if cu is None or cu in self.seen:
                    continue
                nd = depth + 1
                if cu not in self.frontier or self.frontier[cu] > nd:
                    self.frontier[cu] = nd
        return order

    def run(self, rounds: int) -> None:
        for r in range(rounds):
            if not self.frontier:
                break
            self.run_round(r)

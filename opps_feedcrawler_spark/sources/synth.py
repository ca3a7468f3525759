"""Deterministic synthetic web corpus (FIXTURES.md §B) — pages / seeds /
robots, shape-exact to BASELINE.json:16. No external data; everything is a
pure function of (seed, n_hosts, n_pages).

Invariants (FIXTURES.md §B "Invariants"):
1. same seed → byte-identical content (explicit random.Random, stable order),
2. pages.text = extract_text_py(pages.html) at generation time,
3. every seed URL canonicalizes to exactly one pages url_norm or is a 404,
4. host frequencies are zipfian (s≈1.2) so skew paths are exercised.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import pandas as pd

from ..functions.extract import extract_text_py
from ..functions.urlnorm import canonicalize_url

VOCAB = (
    "spark frontier crawl feed entry atom rss parquet shuffle salt bloom "
    "cuckoo robots polite budget snapshot lineage resume murmur arrow pandas "
    "vector batch host url canonical priority queue depth link anchor title "
    "summary content web page corpus iceberg round commit manifest metric"
).split()

T0 = datetime(2024, 3, 1, 0, 0, 0)


def _zipf_host(rng: random.Random, n_hosts: int, s: float = 1.2) -> int:
    weights = [1.0 / (i + 1) ** s for i in range(n_hosts)]
    return rng.choices(range(n_hosts), weights=weights, k=1)[0]


def _words(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(VOCAB) for _ in range(n))


def _mess_up(url: str, rng: random.Random) -> str:
    """Produce a non-canonical alias of a canonical URL (tests A2)."""
    scheme, rest = url.split("://", 1)
    host, _, path = rest.partition("/")
    path = "/" + path
    choice = rng.randrange(5)
    if choice == 0:
        host = host.upper()
    elif choice == 1:
        host = host + ":80"
    elif choice == 2:
        path = "/./" + path.lstrip("/")
    elif choice == 3:
        path = path + "?utm_source=synth&utm_medium=test"
    else:
        path = path + "#frag"
    return f"{scheme}://{host}{path}"


def _page_html(
    rng: random.Random, url: str, pid: int, flavor: str, link_targets: list[str]
) -> bytes:
    if flavor == "html":
        paras = "".join(
            f"<p>{_words(rng, rng.randint(8, 30))}</p>" for _ in range(rng.randint(2, 6))
        )
        anchors = "".join(f'<a href="{t}">{_words(rng, 2)}</a> ' for t in link_targets)
        doc = (
            f"<html><head><title>page {pid}</title>"
            f"<script>var x={pid};</script><style>p{{margin:0}}</style></head>"
            f"<body><nav>home about {_words(rng, 3)}</nav>"
            f"<h1>{_words(rng, 4)}</h1>{paras}<div>{anchors}</div>"
            f"<footer>copyright {_words(rng, 2)}</footer></body></html>"
        )
    elif flavor == "rss":
        items = []
        for i, t in enumerate(link_targets or [url]):
            ts = T0 + timedelta(hours=pid % 720, minutes=i)
            items.append(
                f"<item><guid>urn:item:{pid}:{i}</guid>"
                f"<title>{_words(rng, 4)}</title><link>{t}</link>"
                f"<pubDate>{ts.strftime('%a, %d %b %Y %H:%M:%S')} GMT</pubDate>"
                f"<description>{_words(rng, 10)}</description></item>"
            )
        doc = (
            '<?xml version="1.0"?><rss version="2.0"><channel>'
            f"<title>feed {pid}</title>{''.join(items)}</channel></rss>"
        )
    else:  # atom
        entries = []
        for i, t in enumerate(link_targets or [url]):
            ts = T0 + timedelta(hours=pid % 720, minutes=i)
            entries.append(
                f"<entry><id>urn:entry:{pid}:{i}</id>"
                f"<title>{_words(rng, 4)}</title><link href=\"{t}\"/>"
                f"<updated>{ts.strftime('%Y-%m-%dT%H:%M:%S')}Z</updated>"
                f"<summary>{_words(rng, 10)}</summary></entry>"
            )
        doc = (
            '<?xml version="1.0"?><feed xmlns="http://www.w3.org/2005/Atom">'
            f"<title>feed {pid}</title>{''.join(entries)}</feed>"
        )
    return doc.encode("utf-8")


def gen_corpus(
    n_hosts: int = 50,
    n_pages: int = 2000,
    n_seeds: int = 100,
    seed: int = 42,
) -> tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    """Return (pages, seeds, robots) pandas frames.

    pages: url warc_ts html text lang (BASELINE.json:16 exact shape);
    ~10% RSS, ~10% Atom, rest HTML; ~1/7 of rows stored under a
    non-canonical url alias. Links are drawn from the whole url space
    (including a few dangling → 404) so the frontier grows across rounds.
    """
    rng = random.Random(seed)
    canon_urls = []
    host_of_pid = []
    for pid in range(n_pages):
        h = _zipf_host(rng, n_hosts)
        host_of_pid.append(h)
        canon_urls.append(f"http://host{h}.example/p/{pid}")

    langs = ["en", "en", "en", "es", "de", "zh"]
    rows = []
    for pid in range(n_pages):
        url = canon_urls[pid]
        flavor = "rss" if pid % 10 == 0 else ("atom" if pid % 10 == 1 else "html")
        n_links = rng.randint(2, 6)
        targets = []
        for _ in range(n_links):
            t = canon_urls[rng.randrange(n_pages)]
            if rng.random() < 0.25:
                t = _mess_up(t, rng)
            targets.append(t)
        if rng.random() < 0.03:  # dangling link → 404 path exercise
            targets.append(f"http://host{rng.randrange(n_hosts)}.example/missing/{pid}")
        html = _page_html(rng, url, pid, flavor, targets)
        stored_url = _mess_up(url, rng) if pid % 7 == 3 else url
        rows.append(
            {
                "url": stored_url,
                "warc_ts": T0 + timedelta(minutes=(pid * 37) % (30 * 24 * 60)),
                "html": html,
                "text": extract_text_py(html),
                "lang": langs[pid % len(langs)],
            }
        )
    pages = pd.DataFrame(rows)

    seed_urls = []
    for i in range(n_seeds):
        u = canon_urls[(i * 13) % n_pages]
        if i % 5 == 3:
            u = _mess_up(u, rng)
        seed_urls.append(u)
    seed_urls.append(f"http://host0.example/missing/seed404")
    seeds = pd.DataFrame({"url": seed_urls})

    robot_rows = []
    for h in range(n_hosts):
        kind = h % 4
        if kind == 0:
            continue  # no robots row → everything allowed, default delay
        if kind == 1:
            rules = [{"allow": False, "prefix": "/private/"}]
        elif kind == 2:
            rules = [
                {"allow": False, "prefix": "/p/1"},
                {"allow": True, "prefix": "/p/1/ok"},
            ]
        else:
            rules = []  # row present, no restrictions
        robot_rows.append(
            {
                "host": f"host{h}.example",
                "crawl_delay": [0.5, 1.0, 2.0][h % 3],
                "rules": rules,
            }
        )
    robots = pd.DataFrame(robot_rows)

    # Invariant 3: every seed canonicalizes to a pages url_norm or is a 404.
    page_norms = {canonicalize_url(u) for u in pages["url"]}
    for u in seed_urls[:-1]:
        assert canonicalize_url(u) in page_norms, u
    return pages, seeds, robots


def pages_from_documents(spark, sf_dir: str):
    """Adapter: derive an input_hint-shaped pages table from the driver's
    read-only ``documents`` parquet (FIXTURES.md §A — documents is the
    sandbox stand-in for the page corpus: url≈(source, doc_id), text, lang).
    Used by __spark_entry__.entry() so the flagship query runs on driver
    data without synthesizing anything at verify time."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.concat(
            F.lit("http://"), F.col("source"), F.lit(".example/doc/"), F.col("doc_id")
        ).alias("url"),
        F.to_timestamp(F.lit("2024-03-01 00:00:00")).alias("warc_ts"),
        F.encode(
            F.concat(
                F.lit("<html><head><title>d</title></head><body><p>"),
                F.col("text"),
                F.lit("</p></body></html>"),
            ),
            "UTF-8",
        ).alias("html"),
        F.col("text"),
        F.col("lang"),
    )

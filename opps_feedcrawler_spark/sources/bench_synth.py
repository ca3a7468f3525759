"""Bench-scale deterministic corpus generator (FIXTURES.md §B5).

Differences from gen_corpus (the pytest-scale generator): every page is a
pure function of (seed, pid) — independent of chunking — so generation
parallelizes over a process pool and caches to Parquet chunk files. Nothing
is random run-to-run; the cache key encodes all parameters.
"""

from __future__ import annotations

import bisect
import os
import random
from datetime import timedelta
from functools import lru_cache
from multiprocessing import Pool

from .synth import VOCAB, T0

ZIPF_S = 1.2


@lru_cache(maxsize=4)
def _zipf_cum(n_hosts: int) -> tuple[list[float], float]:
    cum, acc = [], 0.0
    for i in range(n_hosts):
        acc += 1.0 / (i + 1) ** ZIPF_S
        cum.append(acc)
    return cum, acc


def _page_rng(seed: int, pid: int) -> random.Random:
    return random.Random((seed << 34) ^ (pid * 0x9E3779B97F4A7C15) ^ 0xC0FFEE)


def _host_for(seed: int, pid: int, n_hosts: int) -> int:
    cum, total = _zipf_cum(n_hosts)
    r = _page_rng(seed, pid).random() * total
    return bisect.bisect_left(cum, r)


def _canon_url(seed: int, pid: int, n_hosts: int) -> str:
    return f"http://host{_host_for(seed, pid, n_hosts)}.example/p/{pid}"


def _words(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(VOCAB) for _ in range(n))


def _page(seed: int, pid: int, n_hosts: int, n_pages: int) -> dict:
    rng = _page_rng(seed, pid)
    rng.random()  # burn the host draw so content differs from host choice
    url = _canon_url(seed, pid, n_hosts)
    n_links = rng.randint(5, 15)
    targets = [
        _canon_url(seed, rng.randrange(n_pages), n_hosts) for _ in range(n_links)
    ]
    flavor = "rss" if pid % 20 == 0 else ("atom" if pid % 20 == 1 else "html")
    if flavor == "html":
        paras = "".join(
            f"<p>{_words(rng, rng.randint(12, 30))}</p>"
            for _ in range(rng.randint(40, 100))
        )
        anchors = "".join(f'<a href="{t}">{_words(rng, 2)}</a> ' for t in targets)
        doc = (
            f"<html><head><title>page {pid}</title><script>var x={pid};</script>"
            f"<style>p{{margin:0}}</style></head><body>"
            f"<nav>home about {_words(rng, 3)}</nav><h1>{_words(rng, 4)}</h1>"
            f"{paras}<div>{anchors}</div>"
            f"<footer>copyright {_words(rng, 2)}</footer></body></html>"
        )
    elif flavor == "rss":
        items = "".join(
            f"<item><guid>urn:item:{pid}:{i}</guid><title>{_words(rng, 4)}</title>"
            f"<link>{t}</link><pubDate>Mon, 04 Mar 2024 12:{i % 60:02d}:00 GMT"
            f"</pubDate><description>{_words(rng, 12)}</description></item>"
            for i, t in enumerate(targets)
        )
        doc = (
            '<?xml version="1.0"?><rss version="2.0"><channel>'
            f"<title>feed {pid}</title>{items}</channel></rss>"
        )
    else:
        entries = "".join(
            f"<entry><id>urn:entry:{pid}:{i}</id><title>{_words(rng, 4)}</title>"
            f'<link href="{t}"/><updated>2024-03-04T12:{i % 60:02d}:00Z</updated>'
            f"<summary>{_words(rng, 12)}</summary></entry>"
            for i, t in enumerate(targets)
        )
        doc = (
            '<?xml version="1.0"?><feed xmlns="http://www.w3.org/2005/Atom">'
            f"<title>feed {pid}</title>{entries}</feed>"
        )
    return {
        "url": url,
        "warc_ts": T0 + timedelta(minutes=(pid * 37) % (30 * 24 * 60)),
        "html": doc.encode("utf-8"),
        "lang": ["en", "en", "en", "es", "de", "zh"][pid % 6],
    }


def _write_chunk(args: tuple) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    seed, lo, hi, n_hosts, n_pages, out_dir = args
    from ..functions.extract import extract_text_py

    rows = [_page(seed, pid, n_hosts, n_pages) for pid in range(lo, hi)]
    for r in rows:
        r["text"] = extract_text_py(r["html"])
    table = pa.table(
        {
            "url": [r["url"] for r in rows],
            "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us")),
            "html": pa.array([r["html"] for r in rows], pa.binary()),
            "text": [r["text"] for r in rows],
            "lang": [r["lang"] for r in rows],
        }
    )
    path = os.path.join(out_dir, f"part-{lo:09d}.parquet")
    pq.write_table(table, path)
    return path


def ensure_bench_corpus(
    n_hosts: int,
    n_pages: int,
    n_seeds: int,
    seed: int = 42,
    cache_root: str = "/tmp/ofs_bench_corpus",
    workers: int = 16,
) -> dict:
    """Generate (or reuse) the cached bench corpus. Returns dict with
    pages_dir, seeds (list[str]), robots (list[dict])."""
    key = f"v2_h{n_hosts}_p{n_pages}_s{seed}"
    pages_dir = os.path.join(cache_root, key, "pages")
    marker = os.path.join(cache_root, key, "_SUCCESS")
    if not os.path.exists(marker):
        os.makedirs(pages_dir, exist_ok=True)
        chunk = 10_000
        tasks = [
            (seed, lo, min(lo + chunk, n_pages), n_hosts, n_pages, pages_dir)
            for lo in range(0, n_pages, chunk)
        ]
        with Pool(workers) as pool:
            pool.map(_write_chunk, tasks, chunksize=1)
        with open(marker, "w") as f:
            f.write("ok")

    seeds = [
        _canon_url(seed, (i * 13) % n_pages, n_hosts) for i in range(n_seeds)
    ]
    robots = []
    for h in range(n_hosts):
        kind = h % 4
        if kind == 0:
            continue
        rules = (
            [{"allow": False, "prefix": "/private/"}]
            if kind == 1
            else (
                [
                    {"allow": False, "prefix": "/p/1"},
                    {"allow": True, "prefix": "/p/1/ok"},
                ]
                if kind == 2
                else []
            )
        )
        robots.append(
            {
                "host": f"host{h}.example",
                "crawl_delay": [0.2, 0.5, 1.0][h % 3],
                "rules": rules,
            }
        )
    return {"pages_dir": pages_dir, "seeds": seeds, "robots": robots}

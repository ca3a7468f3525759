"""Real-network fetch stage (A11's production half — SURVEY.md §2 A11).

The sandbox engine resolves "fetch" as a broadcast-semi join against the
prepared pages corpus (plans/crawl.py R6) because this environment has no
network. On a real deploy the SAME round dataflow swaps that single stage
for this module: a ``mapInPandas`` HTTP fetcher — whole-partition Arrow
streaming, one connection pool per partition, bounded in-flight batches —
producing the identical (url_norm, status, bytes, html) shape the fused
parse stage consumes. Nothing else in the round changes; `fetch_mode`
("corpus" | "http") on plans.crawl.crawl_round picks the stage.

Scale notes:
- Politeness is enforced UPSTREAM by the scheduler (salted per-host
  budgets, A9); this stage adds only a per-host floor delay WITHIN a
  partition as defense in depth. Because the schedule is repartitioned by
  (host, salt) before fetching, one host's URLs land in few partitions and
  per-connection keep-alive actually helps.
- stdlib-only (urllib.request with a shared opener per partition): the
  container has no requests/aiohttp; the pool-per-partition pattern is the
  same with any client. Timeouts and max_bytes keep a slow/huge endpoint
  from wedging a task.
- Determinism: a network fetch is inherently non-reproducible, so this
  stage is NOT part of the bit-for-bit resume contract; snapshots make the
  round reproducible from the fetched bytes onward (the fetch_log records
  what was actually fetched).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FETCH_SCHEMA = "url_norm string, status int, bytes long, html binary"

DEFAULT_TIMEOUT_S = 10.0
DEFAULT_MAX_BYTES = 4 * 1024 * 1024  # cap a single body at 4 MiB
DEFAULT_HOST_DELAY_S = 0.0  # politeness floor within a partition
DEFAULT_CONCURRENCY = 16  # in-flight fetches per partition (I/O threads)
USER_AGENT = "opps-feedcrawler-spark/2.0 (+crawler)"


def _fetch_one(opener, url: str, timeout_s: float, max_bytes: int):
    """(status, body bytes) for one URL; errors map to conventional
    status codes (0 = transport error) and empty bodies — the round's
    fetch_log/miss accounting handles them like corpus misses."""
    import urllib.error
    import urllib.request

    req = urllib.request.Request(url, headers={"User-Agent": USER_AGENT})
    try:
        with opener.open(req, timeout=timeout_s) as resp:
            body = resp.read(max_bytes + 1)
            if len(body) > max_bytes:
                body = body[:max_bytes]
            return int(getattr(resp, "status", 200) or 200), body
    except urllib.error.HTTPError as e:  # non-2xx with a real status
        return int(e.code), b""
    except Exception:  # DNS, refused, timeout, TLS — transport failure
        return 0, b""


def fetch_http(
    scheduled: DataFrame,
    url_col: str = "url_norm",
    timeout_s: float = DEFAULT_TIMEOUT_S,
    max_bytes: int = DEFAULT_MAX_BYTES,
    host_delay_s: float = DEFAULT_HOST_DELAY_S,
    concurrency: int = DEFAULT_CONCURRENCY,
) -> DataFrame:
    """scheduled(url_norm, host, ...) → (url_norm, status, bytes, html).

    One ``mapInPandas`` stage: the opener (connection pool) is built once
    per partition and streams every Arrow batch through it; html bytes are
    born executor-side and never shuffled (the caller's fused parse runs in
    the next narrow stage, mirroring the corpus-join plan shape).

    Fetches within a partition overlap on a bounded thread pool
    (``concurrency`` in flight; urllib releases the GIL during socket I/O),
    so partition wall-time is ~max(longest chain per host, serial/N) instead
    of the sum of latencies — at ~200 ms real-network latency a 32-partition
    stage moves from ~160 URLs/s to ~160·N, which is what lets the HTTP
    stage keep up with the rest of the round at cluster scale. The per-host
    politeness floor is preserved exactly: a per-host lock serializes each
    host's start-time reservation, so consecutive starts against one host
    stay ≥ ``host_delay_s`` apart no matter how many workers are idle
    (hosts are independent — distinct hosts overlap freely, matching the
    upstream salted-per-host schedule). Output row order within each Arrow
    batch is preserved (``Executor.map``), keeping the stage deterministic
    in everything but the fetched bytes themselves."""
    cols = [url_col] + (["host"] if "host" in scheduled.columns else [])
    src = scheduled.select(*cols)

    def _run(batches: Iterator) -> Iterator:
        import threading
        import time
        import urllib.request
        from concurrent.futures import ThreadPoolExecutor

        import pandas as pd

        opener = urllib.request.build_opener()  # per-partition pool
        meta_lock = threading.Lock()
        host_locks: dict[str, threading.Lock] = {}
        last_hit: dict[str, float] = {}

        def _task(url: str, host: str):
            if host_delay_s > 0:
                with meta_lock:
                    hlock = host_locks.setdefault(host, threading.Lock())
                # reserve this host's next start slot; the lock covers the
                # sleep so same-host starts serialize at the floor spacing
                # while other hosts' workers keep running
                with hlock:
                    prev = last_hit.get(host)
                    now = time.monotonic()
                    if prev is not None and now - prev < host_delay_s:
                        time.sleep(host_delay_s - (now - prev))
                    last_hit[host] = time.monotonic()
            return _fetch_one(opener, url, timeout_s, max_bytes)

        with ThreadPoolExecutor(max_workers=max(1, concurrency)) as pool:
            for pdf in batches:
                urls = pdf[url_col]
                hosts = pdf["host"] if "host" in pdf.columns else urls
                statuses, sizes, bodies = [], [], []
                for status, body in pool.map(_task, urls, hosts):
                    statuses.append(status)
                    sizes.append(len(body))
                    bodies.append(body if body else None)
                yield pd.DataFrame(
                    {
                        "url_norm": urls.to_numpy(),
                        "status": pd.array(statuses, dtype="int32"),
                        "bytes": pd.array(sizes, dtype="int64"),
                        "html": pd.Series(bodies, dtype=object),
                    }
                )

    return src.mapInPandas(_run, FETCH_SCHEMA)


def fetched_as_pages(fetched: DataFrame) -> DataFrame:
    """Adapt fetch_http output to the (url_norm, html) shape the fused
    parse stage consumes — only successful 2xx bodies become pages."""
    return (
        fetched.filter((F.col("status") >= 200) & (F.col("status") < 300))
        .filter(F.col("html").isNotNull())
        .select("url_norm", "html")
    )

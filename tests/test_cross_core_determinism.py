"""Cross-parallelism determinism at medium scale: the same crawl at
local[8] and local[32] must produce byte-identical schedule/seen/frontier
tables (the operational meaning of "crawl ordering matches the reference"
— BASELINE.json:6,14 — and what makes N-vs-4N scaling a same-work
comparison; evidence recorded in BENCH/BASELINE.md §2).

Runs two subprocess crawls over a 50k-page corpus (~5 min), so it is
gated behind OFS_SLOW_TESTS=1 and excluded from the default suite."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("OFS_SLOW_TESTS") != "1",
    reason="medium-scale subprocess test; set OFS_SLOW_TESTS=1",
)

_CHILD = r'''
import sys, os, json, hashlib
os.environ.setdefault("OFS_BUDGET_BASE", "100")
os.environ.setdefault("OFS_MAX_BUDGET", "500")
sys.path.insert(0, %(repo)r)
from opps_feedcrawler_spark.session import get_spark
from opps_feedcrawler_spark.plans.crawl import prepare_pages, run_crawl
from opps_feedcrawler_spark.sources.bench_synth import ensure_bench_corpus

cores, wh = int(sys.argv[1]), sys.argv[2]
corpus = ensure_bench_corpus(2000, 50000, 8000)
spark = get_spark(f"det-{cores}", cores=cores, shuffle_partitions=max(16, cores))
spark.sparkContext.setLogLevel("ERROR")
prep = corpus["pages_dir"] + "_prepared_zstd"
if not os.path.exists(os.path.join(prep, "_SUCCESS")):
    prepare_pages(spark.read.parquet(corpus["pages_dir"])).write.mode(
        "overwrite").option("compression", "zstd").parquet(prep)
pages = spark.read.parquet(prep)
seeds = spark.createDataFrame([(u,) for u in corpus["seeds"]], ["url"])
robots = spark.createDataFrame(
    corpus["robots"],
    schema="host string, crawl_delay double, "
    "rules array<struct<allow:boolean,prefix:string>>")
log = run_crawl(spark, pages, seeds, robots, wh, rounds=2, pages_prepared=True)
out = {}
for r in log.snapshot_ids():
    for t in ("schedule", "seen_delta", "frontier"):
        rows = sorted(repr(tuple(x)) for x in log.load_table(spark, r, t).collect())
        out[f"{t}@{r}"] = hashlib.sha256("\n".join(rows).encode()).hexdigest()
print("HASHES " + json.dumps(out, sort_keys=True))
'''


def _run(cores: int) -> dict:
    wh = tempfile.mkdtemp(prefix=f"ofs-det-{cores}-")
    try:
        p = subprocess.run(
            [sys.executable, "-c", _CHILD % {"repo": "/root/repo"}, str(cores), wh],
            capture_output=True,
            text=True,
            check=False,
        )
        lines = [l for l in p.stdout.splitlines() if l.startswith("HASHES ")]
        assert lines, p.stderr[-2000:]
        return json.loads(lines[0][len("HASHES "):])
    finally:
        shutil.rmtree(wh, ignore_errors=True)


def test_schedule_and_seen_identical_across_core_counts():
    h8 = _run(8)
    h32 = _run(32)
    assert h8 == h32, {k: (h8[k], h32[k]) for k in h8 if h8[k] != h32.get(k)}

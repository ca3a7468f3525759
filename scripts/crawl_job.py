#!/usr/bin/env python
"""spark-submit entrypoint for the crawl engine (BASELINE.json:6,14 — "runs
via spark-submit --py-files on multi-executor clusters").

Usage:
  spark-submit --py-files opps_feedcrawler_spark.zip scripts/crawl_job.py \
      --pages <parquet dir> --seeds <seed list .txt> --warehouse <dir> \
      --rounds 3 [--robots <parquet dir>] [--prepared]

On a cluster, pass --master spark://… / yarn and executor confs as usual;
the job code is identical (everything cluster-specific lives in the
session/submit layer, nothing in the dataflow). Resumes automatically if
the warehouse already holds committed snapshots.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True)
    ap.add_argument("--seeds", required=True)
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--robots", default=None)
    ap.add_argument("--prepared", action="store_true",
                    help="pages dir is already prepare_pages() output")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--fetch-mode", default="corpus",
                    choices=["corpus", "bucketed", "http"],
                    help="R6 fetch stage; 'bucketed' expects --prepared "
                         "pages from prepare_pages_bucketed, 'http' does "
                         "real network fetches")
    ap.add_argument("--compact-seen-every", type=int, default=None,
                    help="fold seen deltas into a base every N rounds")
    ap.add_argument("--vacuum-keep", type=int, default=None,
                    help="after every committed round, delete superseded "
                         "engine-state tables for all but the newest N "
                         "snapshots (in-loop lifecycle hygiene)")
    args = ap.parse_args()

    # imports AFTER arg parsing so --help works without the zip on sys.path
    from opps_feedcrawler_spark.plans.crawl import run_crawl
    from opps_feedcrawler_spark.schemas import ROBOTS
    from opps_feedcrawler_spark.session import get_spark
    from opps_feedcrawler_spark.sources.io import load_seeds, read_pages

    spark = get_spark("ofs-crawl-job", shuffle_partitions=args.shuffle_partitions)
    spark.sparkContext.setLogLevel("WARN")
    pages = (
        spark.read.parquet(args.pages)
        if args.prepared
        else read_pages(spark, args.pages)
    )
    seeds = load_seeds(spark, args.seeds)
    robots = (
        spark.read.parquet(args.robots)
        if args.robots
        else spark.createDataFrame([], ROBOTS)
    )
    log = run_crawl(
        spark, pages, seeds, robots, args.warehouse,
        rounds=args.rounds, pages_prepared=args.prepared,
        compact_seen_every=args.compact_seen_every,
        fetch_mode=args.fetch_mode,
        vacuum_keep=args.vacuum_keep,  # in-loop lifecycle, per-round
    )
    # --rounds 0 (or a fresh warehouse where no round committed) is a
    # legitimate no-op run: report the empty state instead of crashing on
    # read_snapshot(None).
    last = log.latest_snapshot_id()
    summary = {
        "snapshots": log.snapshot_ids(),
        "metrics_last": None if last is None else log.read_snapshot(last)["metrics"],
    }
    print("CRAWL_JOB_RESULT " + json.dumps(summary, sort_keys=True))


if __name__ == "__main__":
    main()

"""SparkSession factory with the engine's pinned, determinism-friendly config.

Determinism contract (SURVEY.md §3.3 / BASELINE.json:6 "resumes bit-for-bit"):
- session timezone pinned to UTC (timestamp round-trips are stable),
- fixed spark.sql.shuffle.partitions (plan shape does not drift run-to-run),
- Arrow enabled for every pandas-UDF boundary (BASELINE.json:16 — "vectorized
  pandas/Arrow UDFs (no per-row Python)"),
- AQE left ON: it re-plans physical execution but never changes results; the
  crawl path's determinism comes from total-order sort keys, not plan shape.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32
# html binaries can be large; bound Python-worker memory at the Arrow
# boundary (SURVEY.md §4.2.4).
ARROW_MAX_RECORDS_PER_BATCH = 2048


def get_spark(
    app_name: str = "opps-feedcrawler-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    ``cores`` pins ``local[cores]`` (used by bench.py for the N vs 4N
    scaling-efficiency runs); default honours $SPARK_GRAFT_CPUS then
    ``local[*]``.
    """
    if cores is not None:
        master = f"local[{cores}]"
    elif os.environ.get("SPARK_GRAFT_CPUS"):
        master = f"local[{os.environ['SPARK_GRAFT_CPUS']}]"
    else:
        master = "local[*]"

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(ARROW_MAX_RECORDS_PER_BATCH),
        )
        # Modest heap on purpose: this sandbox is a microVM where first-touch
        # page faults are expensive — a huge heap makes GC and cache-build
        # kernel-bound (measured: a 4 GB scan is 3.5 s with 8g heap, 19-34 s
        # with 48g). Big tables stay in Parquet + OS page cache, not on-heap.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()

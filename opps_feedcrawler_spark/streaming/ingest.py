"""Structured Streaming ingestion variant (B27-B31) — OFF the verified crawl
path by design: micro-batch boundaries are wall-clock dependent, which would
break the bit-for-bit resume contract (SURVEY.md §4.3; BASELINE.json:6).
The batch round driver is the engine; this module exists for deployments
that want continuous page/event ingestion with watermarked late-data
handling feeding the same Parquet layout the batch rounds read.

Tested with trigger(availableNow=True) so the pipeline is exercised
deterministically in CI without wall-clock coupling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def streaming_page_events(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    watermark: str = "10 minutes",
) -> DataFrame:
    """File-source stream of page-fetch events with bounded lateness:
    readStream → withWatermark → stateful dedup on url within the watermark
    (B31) → tumbling per-host fetch counts (B27 + B30)."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    deduped = stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["url"]
    )
    return (
        deduped.groupBy(F.window("ts", "1 hour").alias("w"), "host")
        .agg(F.count(F.lit(1)).alias("n_fetched"))
        .select(F.col("w.start").alias("window_start"), "host", "n_fetched")
    )


def run_available_now(result: DataFrame, out_dir: str, checkpoint_dir: str) -> None:
    """Drain everything currently available, then stop — the deterministic
    test/maintenance trigger. Continuous deploys use processingTime."""
    q = (
        result.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

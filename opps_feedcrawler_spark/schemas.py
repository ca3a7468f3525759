"""Fixed StructType schemas for every engine table (SURVEY.md §1.2).

Schema-first by design: the reference relies on ORM migrations (behavior-level,
SURVEY.md §1.1 [PK]); this engine declares every table once, here, and every
module imports from this file. Shapes bound by BASELINE.json:6 (north_star)
and BASELINE.json:16 (input_hint: pages table is exactly
(url string, warc_ts timestamp, html binary, text string, lang string)).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ---------------------------------------------------------------------------
# Input corpus — BASELINE.json:16, exact shape.
# ---------------------------------------------------------------------------
PAGES = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)

SEEDS = StructType([StructField("url", StringType())])

# ---------------------------------------------------------------------------
# Engine-internal tables — BASELINE.json:6.
# ---------------------------------------------------------------------------
FRONTIER = StructType(
    [
        StructField("url_norm", StringType()),
        StructField("host", StringType()),
        StructField("url_hash", LongType()),   # xxhash64(url_norm)
        StructField("host_hash", IntegerType()),  # murmur3 (F.hash) of host
        StructField("salt", IntegerType()),    # pmod(url_hash, NSALTS): spreads
        #                                        a hot host across partitions
        StructField("depth", IntegerType()),
        StructField("priority", DoubleType()),
        StructField("discovered_round", IntegerType()),
    ]
)

SEEN = StructType(
    [
        StructField("url_norm", StringType()),
        StructField("url_hash", LongType()),
    ]
)

# Per-bucket bloom bitsets built by vectorized Arrow UDFs (BASELINE.json:6).
SEEN_BLOOM = StructType(
    [
        StructField("bucket", IntegerType()),
        StructField("bitset", BinaryType()),
    ]
)

ROBOTS = StructType(
    [
        StructField("host", StringType()),
        StructField("crawl_delay", DoubleType()),
        StructField(
            "rules",
            ArrayType(
                StructType(
                    [
                        StructField("allow", BooleanType()),
                        StructField("prefix", StringType()),
                    ]
                )
            ),
        ),
    ]
)

SCHEDULE = StructType(
    [
        StructField("round", IntegerType()),
        StructField("seq", IntegerType()),
        StructField("url_norm", StringType()),
        StructField("host", StringType()),
        StructField("priority", DoubleType()),
        StructField("depth", IntegerType()),
    ]
)

FETCH_LOG = StructType(
    [
        StructField("round", IntegerType()),
        StructField("url_norm", StringType()),
        StructField("host", StringType()),
        StructField("status", IntegerType()),  # 200 hit / 404 miss / 999 robots
        StructField("bytes", LongType()),
    ]
)

ENTRY = StructType(
    [
        StructField("page_url", StringType()),
        StructField("entry_guid", StringType()),
        StructField("title", StringType()),
        StructField("link", StringType()),
        StructField("published_ts", TimestampType()),
        StructField("summary", StringType()),
    ]
)

ENTRY_STRUCT = StructType(
    [
        StructField("entry_guid", StringType()),
        StructField("title", StringType()),
        StructField("link", StringType()),
        StructField("published_ts", TimestampType()),
        StructField("summary", StringType()),
    ]
)

EXTRACTED_TEXT = StructType(
    [
        StructField("url", StringType()),
        StructField("text", StringType()),
    ]
)

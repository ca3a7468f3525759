"""Source readers / sink writers (SURVEY.md §2 A1, B1-B2).

Reference behavior [PK]: feeds are registered rows in the CMS admin; the
engine's equivalent input surfaces are (a) seed URL lists (text/CSV), and
(b) the pages corpus in the BASELINE.json:16 shape (url, warc_ts, html,
text, lang) as Parquet. Everything validates schema at the boundary so a
malformed warehouse fails fast instead of mid-crawl.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


def load_seeds(spark: SparkSession, path: str) -> DataFrame:
    """A1: read a seed list (one URL per line; '#' comments and blank lines
    ignored) into DF[url]. Validation beyond the http(s) sniff is left to
    canonicalization (A2), which drops unparseable rows — the same
    tolerance the reference's feed registration has [PK]."""
    lines = spark.read.text(path)
    url = F.trim(F.col("value"))
    return (
        lines.select(url.alias("url"))
        .filter((F.length("url") > 0) & ~F.col("url").startswith("#"))
        .filter(F.col("url").rlike(r"^(?i)https?://"))
    )


def load_seeds_csv(
    spark: SparkSession, path: str, url_col: str = "url"
) -> DataFrame:
    """A1 (CSV variant): header row expected; only the url column is kept."""
    df = spark.read.option("header", "true").csv(path)
    if url_col not in df.columns:
        raise ValueError(f"seed CSV missing column {url_col!r}: {df.columns}")
    return df.select(F.trim(F.col(url_col)).alias("url")).filter(
        F.col("url").rlike(r"^(?i)https?://")
    )


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    """B1: read the pages corpus, enforcing the input-hint schema. Extra
    columns are dropped; missing/mistyped required columns raise."""
    df = spark.read.parquet(path)
    missing = [f.name for f in PAGES_SCHEMA.fields if f.name not in df.columns]
    if missing:
        raise ValueError(f"pages table at {path} missing columns: {missing}")
    got = {f.name: f.dataType for f in df.schema.fields}
    for f in PAGES_SCHEMA.fields:
        if got[f.name] != f.dataType:
            raise ValueError(
                f"pages.{f.name}: expected {f.dataType}, found {got[f.name]}"
            )
    return df.select([f.name for f in PAGES_SCHEMA.fields])


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str] | None = None
) -> None:
    """B2: Parquet sink with optional hive-style partitioning (warehouse
    tables partition by round/salt for partition pruning — SURVEY.md §4.1)."""
    w = df.write.mode("overwrite")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(path)

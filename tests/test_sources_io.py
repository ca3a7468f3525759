"""Source-boundary tests: seed-list parsing (A1), pages-schema enforcement
(B1), partitioned sink round-trip (B2)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from opps_feedcrawler_spark.sources.io import (
    load_seeds,
    load_seeds_csv,
    read_pages,
    write_partitioned,
)


def test_load_seeds_text(spark, tmp_path):
    p = tmp_path / "seeds.txt"
    p.write_text(
        "# comment\n"
        "http://a.example/1\n"
        "\n"
        "  https://b.example/2  \n"
        "ftp://nope.example/3\n"
        "HTTP://c.example/4\n"
    )
    urls = sorted(r.url for r in load_seeds(spark, str(p)).collect())
    assert urls == [
        "HTTP://c.example/4",
        "http://a.example/1",
        "https://b.example/2",
    ]


def test_load_seeds_csv(spark, tmp_path):
    p = tmp_path / "seeds.csv"
    p.write_text("name,url\nfeed1,http://a.example/f\nbad,notaurl\n")
    urls = [r.url for r in load_seeds_csv(spark, str(p)).collect()]
    assert urls == ["http://a.example/f"]
    with pytest.raises(ValueError, match="missing column"):
        load_seeds_csv(spark, str(p), url_col="link")


def test_read_pages_schema_enforced(spark, tmp_path):
    good = spark.createDataFrame(
        [("http://a.example/1", None, b"<p>x</p>", "x", "en")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    ).withColumn("extra", F.lit(1))
    gp = str(tmp_path / "good")
    good.write.parquet(gp)
    df = read_pages(spark, gp)
    assert df.columns == ["url", "warc_ts", "html", "text", "lang"]

    bad = spark.createDataFrame([("u",)], "url string")
    bp = str(tmp_path / "bad")
    bad.write.parquet(bp)
    with pytest.raises(ValueError, match="missing columns"):
        read_pages(spark, bp)

    mistyped = spark.createDataFrame(
        [("u", "2024-01-01", "html-as-string", "t", "en")],
        "url string, warc_ts string, html string, text string, lang string",
    )
    mp = str(tmp_path / "mistyped")
    mistyped.write.parquet(mp)
    with pytest.raises(ValueError, match="warc_ts|html"):
        read_pages(spark, mp)


def test_write_partitioned_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(0, 1, "a"), (0, 2, "b"), (1, 1, "c")], "round int, salt int, v string"
    )
    out = str(tmp_path / "wh")
    write_partitioned(df, out, ["round", "salt"])
    assert os.path.isdir(os.path.join(out, "round=0", "salt=1"))
    back = spark.read.parquet(out)
    assert back.count() == 3
    # partition pruning: only the round=1 directory is read
    pruned = back.filter(F.col("round") == 1)
    assert [r.v for r in pruned.collect()] == ["c"]

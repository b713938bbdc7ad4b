"""Local replica of the driver's correctness gate: run every queries() entry
and its oracle_sql() twin on the same parquet tables, compare row count,
schema arity, and order-insensitive values."""

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ducks():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _canon(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False):
        row = []
        for v in tup:
            if isinstance(v, float):
                if math.isnan(v):
                    row.append("nan")
                else:
                    row.append(round(v, 4))
            else:
                row.append(v)
        rows.append(tuple(row))
    return sorted(rows, key=repr)


ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert "score" in df.columns


@pytest.mark.parametrize("name", sorted(ORACLES), ids=sorted(ORACLES))
def test_query_vs_oracle(spark, ducks, name):
    got = QUERIES[name](spark, SF_DIR).toPandas()
    exp = ducks.sql(ORACLES[name]).df()
    assert len(got) == len(exp), f"{name}: rows {len(got)} vs {len(exp)}"
    assert len(got.columns) == len(exp.columns), (
        f"{name}: cols {sorted(got.columns)} vs {sorted(exp.columns)}"
    )
    assert sorted(got.columns) == sorted(exp.columns), (
        f"{name}: col names {sorted(got.columns)} vs {sorted(exp.columns)}"
    )
    cg, ce = _canon(got), _canon(exp)
    mismatch = [(a, b) for a, b in zip(cg, ce) if a != b][:5]
    assert cg == ce, f"{name}: first mismatches {mismatch}"


def test_oracled_entries_precede_rows_only_tail():
    """CORRECTNESS_r02 recorded exactly 50 of 54 queries() entries — the
    tail fell off the driver's check. Guard: every oracled entry must come
    BEFORE every rows-only entry in queries() insertion order, so a bounded
    prefix check always covers the full oracled set."""
    order = list(QUERIES)
    oracled_idx = [order.index(n) for n in ORACLES]
    rows_only_idx = [order.index(n) for n in set(QUERIES) - set(ORACLES)]
    assert max(oracled_idx) < min(rows_only_idx), (
        "rows-only entry registered before an oracled one"
    )
    assert max(oracled_idx) < 50, "oracled entry outside the first 50 slots"


def test_rows_only_queries_run(spark):
    for name in sorted(set(QUERIES) - set(ORACLES)):
        df = QUERIES[name](spark, SF_DIR)
        assert df.count() >= 0, name

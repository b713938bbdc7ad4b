#!/usr/bin/env python
"""Local replica of the driver's correctness gate at an arbitrary SF.

Usage: python scripts/check_gate.py [sf_dir] [name ...]
Runs the named queries() entries (default: all oracled ones) against their
DuckDB twins at sf_dir (default sf0.01) and prints PASS/FAIL per entry.
"""

import math
import sys

import duckdb

sys.path.insert(0, ".")
import __spark_entry__ as entry_mod  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df):
    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False):
        row = []
        for v in tup:
            if isinstance(v, float):
                row.append("nan" if math.isnan(v) else round(v, 4))
            else:
                row.append(v)
        rows.append(tuple(row))
    return sorted(rows, key=repr)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:]
    from iresearch_spark.session import get_spark

    spark = get_spark("gate_check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    if not names:
        names = [n for n in qs if n in os_]
    fails = 0
    for name in names:
        try:
            got = qs[name](spark, sf_dir).toPandas()
            if name not in os_:
                print(f"{name}: rows_only ({len(got)} rows)")
                continue
            exp = con.sql(os_[name]).df()
            ok = (
                len(got) == len(exp)
                and sorted(got.columns) == sorted(exp.columns)
                and canon(got) == canon(exp)
            )
            print(f"{name}: {'PASS' if ok else 'FAIL'} "
                  f"({len(got)} vs {len(exp)} rows)")
            if not ok:
                fails += 1
                cg, ce = canon(got), canon(exp)
                mm = [(a, b) for a, b in zip(cg, ce) if a != b][:3]
                print(f"  first mismatches: {mm}")
        except Exception as e:  # noqa: BLE001
            fails += 1
            print(f"{name}: ERROR {type(e).__name__}: {e}")
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()

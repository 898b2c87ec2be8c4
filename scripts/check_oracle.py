#!/usr/bin/env python
"""Local replica of the driver's t2 correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over the
same sf dir, compare row count + sorted values.

Usage: python scripts/check_oracle.py [sf_dir] [query_prefix...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd


def duck_run(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    return con.execute(sql).df()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> tuple[bool, str]:
    if len(spark_df) != len(duck_df):
        return False, f"row count {len(spark_df)} vs {len(duck_df)}"
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        return False, f"columns {sorted(spark_df.columns)} vs {sorted(duck_df.columns)}"
    a, b = normalize(spark_df), normalize(duck_df)
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if isinstance(x, float) or isinstance(y, float):
                if x is None or y is None or (isinstance(x, float) and math.isnan(x)) or (
                    isinstance(y, float) and math.isnan(y)
                ):
                    if not (
                        (x is None or (isinstance(x, float) and math.isnan(x)))
                        and (y is None or (isinstance(y, float) and math.isnan(y)))
                    ):
                        return False, f"{col}[{i}]: {x!r} vs {y!r}"
                elif x != y:
                    return False, f"{col}[{i}]: {x!r} vs {y!r} (diff {x-y:.3e})"
            elif x != y:
                return False, f"{col}[{i}]: {x!r} vs {y!r}"
    return True, "ok"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    prefixes = sys.argv[2:]

    import __spark_entry__ as entry_mod
    from victoriametrics_spark.session import get_spark

    spark = get_spark("oracle-check")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    passed = failed = skipped = 0
    for name, fn in qs.items():
        if prefixes and not any(name.startswith(p) for p in prefixes):
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"SKIP  {name} (rows-only)")
            skipped += 1
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failed += 1
            continue
        try:
            ddf = duck_run(sql, sf_dir)
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e)[:200]}")
            failed += 1
            continue
        ok, msg = compare(sdf, ddf)
        dt = time.time() - t0
        if ok:
            print(f"PASS  {name} ({len(sdf)} rows, {dt:.1f}s)")
            passed += 1
        else:
            print(f"FAIL  {name}: {msg} ({dt:.1f}s)")
            failed += 1
    print(f"\n{passed} passed, {failed} failed, {skipped} rows-only")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())

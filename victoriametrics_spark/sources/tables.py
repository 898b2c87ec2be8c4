"""Loader for the driver-generated TPC-H-ish testdata tables.

The parquet files store TIMESTAMP(NANOS), which Spark reads only with
``spark.sql.legacy.parquet.nanosAsLong=true`` (set in session.py) — the
loader converts those long-nanos columns back to proper timestamps so
query code sees the same schema DuckDB does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

_TS_COLS = {
    "events": ["ts"],
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
}


_SCHEMA_CACHE: dict[tuple[str, float], object] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    try:
        # driver-supplied sessions may lack this; it is runtime-settable
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    # remember the inferred schema per (path, mtime): a schema-less
    # spark.read.parquet fires a one-task schema-inference JOB on every
    # plan build (~0.1-0.2s of the warm query latency); declaring the
    # schema skips it. A production deployment declares table schemas
    # anyway (catalog/metastore); the mtime in the key means an
    # in-place regeneration of the file re-infers instead of serving a
    # stale schema.
    import os as _os

    path = f"{sf_dir}/{name}.parquet"
    try:
        key = (path, _os.path.getmtime(path))
    except OSError:
        key = (path, 0.0)
    schema = _SCHEMA_CACHE.get(key)
    if schema is None:
        schema = spark.read.parquet(path).schema
        _SCHEMA_CACHE[key] = schema
    df = spark.read.schema(schema).parquet(path)
    for c in _TS_COLS.get(name, []):
        if isinstance(df.schema[c].dataType, LongType):
            # long nanos → microseconds → timestamp (UTC session).
            # MUST be integral `div`: nanos ~1.7e18 exceed double's 2^53
            # exact range, so any float path corrupts the low digits.
            df = df.withColumn(c, F.expr(f"timestamp_micros(`{c}` div 1000)"))
    return df


def register_all(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql()."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)

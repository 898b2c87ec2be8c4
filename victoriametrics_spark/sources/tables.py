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


_SCHEMA_CACHE: dict[str, object] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    try:
        # driver-supplied sessions may lack this; it is runtime-settable
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    # remember the inferred schema per path: a schema-less
    # spark.read.parquet fires a one-task schema-inference JOB on every
    # plan build (~0.1-0.2s of the warm query latency); declaring the
    # schema skips it. The testdata is immutable, and a production
    # deployment declares table schemas anyway (catalog/metastore).
    path = f"{sf_dir}/{name}.parquet"
    schema = _SCHEMA_CACHE.get(path)
    if schema is None:
        schema = spark.read.parquet(path).schema
        _SCHEMA_CACHE[path] = schema
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

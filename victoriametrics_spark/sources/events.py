"""Adapter: the driver's ``events`` table → canonical samples.

events(event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING,
value DOUBLE, props STRING-json) becomes metric ``events_value`` with labels
{event_type, user_bucket = user_id % 10} — a deterministic mapping both the
Spark engine and the DuckDB oracle can reproduce exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from victoriametrics_spark.schema import samples_from_columns
from victoriametrics_spark.sources.tables import load_table

METRIC_NAME = "events_value"
N_USER_BUCKETS = 10


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


def events_as_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    return samples_from_columns(
        ev,
        name=METRIC_NAME,
        label_cols={
            "event_type": "event_type",
            "user_bucket": (F.col("user_id") % N_USER_BUCKETS).cast("string"),
        },
        ts="ts",
        value="value",
    )


# The same mapping as ANSI SQL (DuckDB oracle side). Grid/rollup oracle
# queries build on this CTE.
EVENTS_SAMPLES_SQL = """
    SELECT
        'events_value' AS name,
        event_type,
        CAST(user_id % 10 AS VARCHAR) AS user_bucket,
        CAST(epoch_ms(ts) AS BIGINT) AS ts,
        value
    FROM events
"""

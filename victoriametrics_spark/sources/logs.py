"""Adapter: the driver's ``events`` table → a LogsQL log frame.

A VictoriaLogs log row is (_time, _msg, fields...) (vendored
logstorage/rows.go data model).  We map events deterministically so the
Spark engine and the DuckDB oracle can reproduce the exact same frame:

    _time  = ts                       (timestamp)
    _msg   = event_type || ' user=' || user_id || ' ' || props
    fields = event_type, user_id, value, props, event_id

Only string/int concatenation goes into _msg (no float formatting), so
both engines render identical bytes.  The matching DuckDB view is::

    SELECT ts AS _time,
           event_type || ' user=' || user_id || ' ' || props AS _msg,
           event_type, user_id, value, props, event_id
    FROM events

At 100 TB the same shape holds: a parquet log table partitioned by day
with _time/_msg plus typed field columns; every LogsQL filter compiles to
a pushdown-able Catalyst predicate over it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from victoriametrics_spark.sources.tables import load_table

LOGS_ORACLE_VIEW = (
    "SELECT ts AS _time, "
    "event_type || ' user=' || user_id || ' ' || props AS _msg, "
    "event_type, user_id, value, props, event_id FROM events"
)


def events_as_logs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.col("ts").alias("_time"),
        F.concat(
            F.col("event_type"),
            F.lit(" user="),
            F.col("user_id").cast("string"),
            F.lit(" "),
            F.col("props"),
        ).alias("_msg"),
        "event_type",
        "user_id",
        "value",
        "props",
        "event_id",
    )

"""Log-ingestion dialects → canonical log frames (VictoriaLogs surface).

The reference's log counterpart ingests logs over documented public HTTP
APIs: JSON-lines (``/insert/jsonline``), Elasticsearch bulk
(``/insert/elasticsearch/_bulk``) and Loki push
(``/insert/loki/api/v1/push``). Each parser here turns raw text (one
line per row, as produced by ``spark.read.text`` /
``spark.readStream.text``) or a raw JSON document column into the log
frame shape used across the LogsQL engine::

    (_time TIMESTAMP, _msg STRING, fields MAP<STRING,STRING>)

All parsing is Catalyst-native (from_json / map functions — no Python
UDFs), so the same code path serves batch backfill and Structured
Streaming tailing. ``project_fields`` lifts chosen map entries into real
columns for querying with run_logsql / writing with write_logs_table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MAP = "map<string,string>"


def _parse_time(c: Column) -> Column:
    """VictoriaLogs `_time` field: RFC3339 or unix seconds/millis/nanos
    (magnitude heuristic, the documented ingestion behavior)."""
    num = c.try_cast("double")
    from_num = (
        F.when(num >= 1e17, F.timestamp_millis((num / 1e6).cast("long")))  # ns
        .when(num >= 1e14, F.timestamp_millis((num / 1e3).cast("long")))  # µs
        .when(num >= 1e11, F.timestamp_millis(num.cast("long")))  # ms
        .otherwise(F.timestamp_seconds(num))  # s
    )
    return F.when(num.isNotNull(), from_num).otherwise(
        F.to_timestamp(F.regexp_replace(c, r"Z$", ""))
    )


def _shape(fields: Column, msg_key: str, time_key: str) -> list[Column]:
    return [
        _parse_time(fields.getItem(time_key)).alias("_time"),
        F.coalesce(fields.getItem(msg_key), F.lit("")).alias("_msg"),
        F.map_filter(
            fields, lambda k, v: ~k.isin(msg_key, time_key)
        ).alias("fields"),
    ]


def parse_jsonline(lines: DataFrame) -> DataFrame:
    """``/insert/jsonline``: one flat JSON object per line; `_time` +
    `_msg` are the canonical keys, everything else is a log field."""
    fields = F.from_json(F.col("value"), _MAP)
    return (
        lines.select(fields.alias("__f"))
        .filter(F.col("__f").isNotNull())
        .select(*_shape(F.col("__f"), "_msg", "_time"))
    )


def parse_elasticsearch_bulk(lines: DataFrame) -> DataFrame:
    """``/insert/elasticsearch/_bulk``: alternating action lines
    (``{"create":{...}}`` / ``{"index":...}``) and document lines;
    ``@timestamp`` is the time key and ``message`` the message key
    (the documented ES-compat mapping)."""
    fields = F.from_json(F.col("value"), _MAP)
    return (
        lines.select(fields.alias("__f"))
        .filter(F.col("__f").isNotNull())
        .filter(
            ~(
                (F.map_keys(F.col("__f")) == F.array(F.lit("create")))
                | (F.map_keys(F.col("__f")) == F.array(F.lit("index")))
                | (F.map_keys(F.col("__f")) == F.array(F.lit("delete")))
            )
        )
        .select(*_shape(F.col("__f"), "message", "@timestamp"))
    )


_LOKI_SCHEMA = (
    "struct<streams: array<struct<"
    "stream: map<string,string>, "
    "values: array<array<string>>>>>"
)


def parse_loki_push(docs: DataFrame) -> DataFrame:
    """``/insert/loki/api/v1/push`` JSON body: streams of
    ``[ns_timestamp, line]`` pairs with per-stream labels. One input row
    per request body (``value`` column)."""
    parsed = docs.select(F.from_json(F.col("value"), _LOKI_SCHEMA).alias("__d"))
    streams = parsed.select(
        F.explode(F.col("__d.streams")).alias("__s")
    )
    entries = streams.select(
        F.col("__s.stream").alias("fields"),
        F.explode(F.col("__s.values")).alias("__v"),
    )
    ns = F.element_at(F.col("__v"), 1).try_cast("long")
    return entries.select(
        F.timestamp_millis((ns / 1_000_000).cast("long")).alias("_time"),
        F.element_at(F.col("__v"), 2).alias("_msg"),
        F.coalesce(F.col("fields"), F.create_map().cast(_MAP)).alias("fields"),
    )


def project_fields(df: DataFrame, names: list[str]) -> DataFrame:
    """Lift selected map entries into real columns (the log-frame shape
    run_logsql / write_logs_table query directly). Unlisted fields stay
    available in the ``fields`` map."""
    cols = [F.col("_time"), F.col("_msg")]
    cols += [F.col("fields").getItem(n).alias(n) for n in names]
    cols.append(F.col("fields"))
    return df.select(*cols)

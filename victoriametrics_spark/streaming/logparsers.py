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


def parse_jsonline(
    lines: DataFrame,
    msg_field: str = "_msg",
    time_field: str = "_time",
) -> DataFrame:
    """``/insert/jsonline``: one flat JSON object per line; `_time` +
    `_msg` are the canonical keys (overridable via the documented
    ``_msg_field`` / ``_time_field`` ingest args), everything else is
    a log field."""
    fields = F.from_json(F.col("value"), _MAP)
    return (
        lines.select(fields.alias("__f"))
        .filter(F.col("__f").isNotNull())
        .select(*_shape(F.col("__f"), msg_field, time_field))
    )


def parse_elasticsearch_bulk(
    lines: DataFrame,
    msg_field: str = "message",
    time_field: str = "@timestamp",
) -> DataFrame:
    """``/insert/elasticsearch/_bulk``: alternating action lines
    (``{"create":{...}}`` / ``{"index":...}``) and document lines;
    ``@timestamp`` is the time key and ``message`` the message key
    (the documented ES-compat mapping; ``_msg_field`` /
    ``_time_field`` args override)."""
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
        .select(*_shape(F.col("__f"), msg_field, time_field))
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


def parse_syslog_lines(lines: DataFrame, year: int | None = None) -> DataFrame:
    """``/insert/syslog``: one RFC5424 or RFC3164 message per line —
    parsed by the same regexes as the ``unpack_syslog`` pipe
    (logsql/pipes.py), then shaped into the canonical log row:
    ``_time`` from the syslog timestamp, ``_msg`` the message part,
    and hostname/app_name/proc_id/severity/facility as fields.
    RFC3164 timestamps carry no year; ``year`` pins it (defaults to
    1970, keeping the result deterministic — VictoriaLogs uses the
    receive-time year, which a caller can pass)."""
    from victoriametrics_spark.logsql import pipes as P

    parsed = P.unpack_syslog(
        lines.filter(F.length("value") > 0), "value", prefix="__sl_"
    )
    # try_to_timestamp: each row matches only ONE of the two layouts,
    # and ANSI-mode to_timestamp would throw on the other branch
    ts5424 = F.try_to_timestamp(F.col("__sl_timestamp"))
    # RFC3164: "Jan  2 15:04:05" — collapse the double space and affix
    # the pinned year
    t3164 = F.regexp_replace(F.col("__sl_timestamp"), "  ", " ")
    ts3164 = F.try_to_timestamp(
        F.concat(F.lit(f"{year or 1970} "), t3164),
        F.lit("yyyy MMM d HH:mm:ss"),
    )
    fields = F.map_filter(
        F.create_map(
            F.lit("hostname"), F.col("__sl_hostname"),
            F.lit("app_name"), F.col("__sl_app_name"),
            F.lit("proc_id"), F.col("__sl_proc_id"),
            F.lit("severity"), F.col("__sl_severity").cast("string"),
            F.lit("facility"), F.col("__sl_facility").cast("string"),
        ),
        lambda k, v: v.isNotNull(),
    )
    return parsed.select(
        F.coalesce(ts5424, ts3164).alias("_time"),
        F.coalesce(F.col("__sl_message"), F.col("value")).alias("_msg"),
        fields.alias("fields"),
    )


_OTLP_LOGS_SCHEMA = (
    "struct<resourceLogs: array<struct<"
    "resource: struct<attributes: array<struct<"
    "key: string, value: struct<stringValue: string>>>>, "
    "scopeLogs: array<struct<logRecords: array<struct<"
    "timeUnixNano: string, severityText: string, "
    "body: struct<stringValue: string>, "
    "attributes: array<struct<key: string, "
    "value: struct<stringValue: string>>>>>>>>>>"
)


def parse_otlp_logs(docs: DataFrame) -> DataFrame:
    """``/insert/opentelemetry/v1/logs`` (JSON encoding): resource +
    record attributes flatten into fields, ``body.stringValue`` is the
    message, ``timeUnixNano`` the timestamp, severityText a field —
    the documented VictoriaLogs OTLP mapping. One input row per
    request body (``value`` column)."""
    d = docs.select(F.from_json(F.col("value"), _OTLP_LOGS_SCHEMA).alias("__d"))
    rl = d.select(F.explode("__d.resourceLogs").alias("__rl"))
    sl = rl.select(
        F.col("__rl.resource.attributes").alias("__ra"),
        F.explode("__rl.scopeLogs").alias("__sl"),
    )
    rec = sl.select(
        "__ra", F.explode("__sl.logRecords").alias("__r")
    )
    kv = lambda arr: F.map_from_entries(  # noqa: E731
        F.transform(
            F.coalesce(arr, F.array()),
            lambda a: F.struct(
                a["key"].alias("key"),
                a["value"]["stringValue"].alias("value"),
            ),
        )
    )
    sev = F.col("__r.severityText")
    fields = F.map_filter(
        F.map_concat(
            kv(F.col("__ra")),
            kv(F.col("__r.attributes")),
            F.create_map(F.lit("severity"), sev),
        ),
        lambda k, v: v.isNotNull(),
    )
    ns = F.col("__r.timeUnixNano").try_cast("long")
    return rec.select(
        F.timestamp_millis((ns / 1_000_000).cast("long")).alias("_time"),
        F.coalesce(F.col("__r.body.stringValue"), F.lit("")).alias("_msg"),
        fields.alias("fields"),
    )


def with_stream_fields(df: DataFrame, stream_fields: list[str]) -> DataFrame:
    """Ingest-side ``_stream_fields`` arg: materialize the canonical
    ``_stream`` identity from the row's ``fields`` MAP through the ONE
    shared builder (pipes.canonical_stream) so ingested identities
    always match query-side stream filters. Declared stream fields stay
    in the map too, matching VictoriaLogs serving them as ordinary
    fields as well."""
    from victoriametrics_spark.logsql.pipes import canonical_stream

    return df.withColumn(
        "_stream",
        canonical_stream(
            {f: F.element_at(F.col("fields"), f) for f in stream_fields}
        ),
    )

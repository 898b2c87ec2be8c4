"""Line-protocol parsers → canonical samples (SURVEY.md §2.1).

Reference ingestion surface: Prometheus text/remote-write, Influx line
protocol (lib/protoparser/influx/), Graphite plaintext
(lib/protoparser/graphite/), CSV import (lib/protoparser/csvimport/),
VM JSON-line import/export (lib/protoparser/vmimport/).

Each parser is a pure column-expression transform over a one-column
DataFrame of text lines (`value` column, as produced by
``spark.read.text`` / ``spark.readStream.text``), so the same code path
serves batch backfill and streaming ingest. No Python UDFs — regex and
map functions only, streaming-safe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from victoriametrics_spark.schema import SAMPLE_SCHEMA


def _finish(df: DataFrame) -> DataFrame:
    """Normalize parsed columns into the canonical sample schema."""
    return df.select(
        F.col("name").cast("string").alias("name"),
        F.coalesce(F.col("labels"), F.create_map().cast("map<string,string>")).alias(
            "labels"
        ),
        F.col("ts").cast("long").alias("ts"),
        F.col("value").cast("double").alias("value"),
        F.lit(False).alias("is_stale"),
    ).filter(F.col("name").isNotNull() & F.col("value").isNotNull() & F.col("ts").isNotNull())


def _tags_to_map(tags: Column, pair_sep: str, kv_sep: str) -> Column:
    """'a=1,b=2' → map, tolerating the empty string."""
    pairs = F.filter(F.split(tags, pair_sep), lambda p: p.contains(kv_sep))
    return F.map_from_entries(
        F.transform(
            pairs,
            lambda p: F.struct(
                F.split_part(p, F.lit(kv_sep), F.lit(1)).alias("key"),
                F.split_part(p, F.lit(kv_sep), F.lit(2)).alias("value"),
            ),
        )
    )


def parse_graphite(lines: DataFrame, default_ts_ms: int | None = None) -> DataFrame:
    """Graphite plaintext: ``metric.path[;tag=val...] value [unix_ts]``
    (lib/protoparser/graphite/)."""
    l = F.col("value")
    metric_full = F.split_part(l, F.lit(" "), F.lit(1))
    name = F.split_part(metric_full, F.lit(";"), F.lit(1))
    tags_str = F.regexp_replace(metric_full, r"^[^;]*;?", "")
    val = F.split_part(l, F.lit(" "), F.lit(2))
    ts_str = F.split_part(l, F.lit(" "), F.lit(3))
    ts = F.when(ts_str != "", ts_str.cast("double") * 1000).otherwise(
        F.lit(default_ts_ms).cast("double")
    )
    return _finish(
        lines.select(
            name.alias("name"),
            _tags_to_map(tags_str, ";", "=").alias("labels"),
            ts.cast("long").alias("ts"),
            val.cast("double").alias("value"),
        )
    )


def parse_influx(lines: DataFrame) -> DataFrame:
    """Influx line protocol: ``meas[,tag=val...] field=val[,field2=val2] [ts_ns]``
    (lib/protoparser/influx/). Metric name = ``measurement_field`` (VM's
    default naming); one output row per field."""
    l = F.col("value")
    head = F.split_part(l, F.lit(" "), F.lit(1))  # meas,tags
    fields_str = F.split_part(l, F.lit(" "), F.lit(2))
    ts_str = F.split_part(l, F.lit(" "), F.lit(3))
    meas = F.split_part(head, F.lit(","), F.lit(1))
    tags_str = F.regexp_replace(head, r"^[^,]*,?", "")
    fields = F.filter(F.split(fields_str, ","), lambda p: p.contains("="))
    parsed = lines.select(
        meas.alias("meas"),
        _tags_to_map(tags_str, ",", "=").alias("labels"),
        # ns → ms (integral: ns exceed double's exact range)
        F.when(ts_str != "", F.expr("CAST(split_part(value, ' ', 3) AS BIGINT) div 1000000")).alias("ts"),
        F.explode(fields).alias("fv"),
    )
    fname = F.split_part(F.col("fv"), F.lit("="), F.lit(1))
    fval = F.regexp_replace(
        F.split_part(F.col("fv"), F.lit("="), F.lit(2)), r"i$", ""
    )  # trailing i = influx integer suffix
    return _finish(
        parsed.select(
            F.concat(F.col("meas"), F.lit("_"), fname).alias("name"),
            F.col("labels"),
            F.col("ts"),
            fval.cast("double").alias("value"),
        )
    )


def parse_prometheus_text(lines: DataFrame, default_ts_ms: int) -> DataFrame:
    """Prometheus exposition text: ``metric{a="b",...} value [ts_ms]``
    (federate/scrape format; comments and blank lines skipped)."""
    l = F.trim(F.col("value"))
    data = lines.select(l.alias("value")).filter(
        (l != "") & ~l.startswith("#")
    )
    name = F.regexp_extract(F.col("value"), r"^([a-zA-Z_:][a-zA-Z0-9_:.]*)", 1)
    labels_str = F.regexp_extract(F.col("value"), r"^[^{\s]+\{([^}]*)\}", 1)
    rest = F.trim(F.regexp_replace(F.col("value"), r"^[^{\s]+(\{[^}]*\})?", ""))
    val = F.split_part(rest, F.lit(" "), F.lit(1))
    ts_str = F.split_part(rest, F.lit(" "), F.lit(2))
    # label pairs: a="b" — strip quotes after splitting on commas
    pairs = F.filter(F.split(labels_str, r",\s*"), lambda p: p.contains("="))
    labels = F.map_from_entries(
        F.transform(
            pairs,
            lambda p: F.struct(
                F.split_part(p, F.lit("="), F.lit(1)).alias("key"),
                F.regexp_replace(
                    F.split_part(p, F.lit("="), F.lit(2)), r'^"|"$', ""
                ).alias("value"),
            ),
        )
    )
    ts = F.when(ts_str != "", ts_str.cast("long")).otherwise(F.lit(default_ts_ms))
    return _finish(
        data.select(
            name.alias("name"),
            labels.alias("labels"),
            ts.alias("ts"),
            val.cast("double").alias("value"),
        )
    )


def parse_vm_jsonl(lines: DataFrame) -> DataFrame:
    """VM JSON-line import format (/api/v1/import,
    lib/protoparser/vmimport/): one JSON object per line
    ``{"metric": {"__name__": "m", ...labels}, "values": [...],
    "timestamps": [...ms]}`` — exploded to long form."""
    schema = (
        "metric MAP<STRING,STRING>, values ARRAY<DOUBLE>, timestamps ARRAY<BIGINT>"
    )
    parsed = lines.select(F.from_json(F.col("value"), schema).alias("j")).filter(
        F.col("j").isNotNull()
    )
    z = parsed.select(
        F.col("j.metric").alias("metric"),
        F.explode(F.arrays_zip("j.values", "j.timestamps")).alias("p"),
    )
    return _finish(
        z.select(
            F.element_at(F.col("metric"), "__name__").alias("name"),
            F.map_filter(F.col("metric"), lambda k, v: k != "__name__").alias("labels"),
            F.col("p.timestamps").alias("ts"),
            F.col("p.values").alias("value"),
        )
    )


def to_vm_jsonl(samples: DataFrame) -> DataFrame:
    """Export: canonical samples → VM JSON-line strings (one per series,
    values/timestamps packed — /api/v1/export shape)."""
    packed = (
        samples.groupBy("name", "labels")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("ts"), F.col("value")))
            ).alias("pts")
        )
        .select(
            F.to_json(
                F.struct(
                    F.map_concat(
                        F.create_map(F.lit("__name__"), F.col("name")),
                        F.coalesce(
                            F.col("labels"), F.create_map().cast("map<string,string>")
                        ),
                    ).alias("metric"),
                    F.transform(F.col("pts"), lambda p: p["value"]).alias("values"),
                    F.transform(F.col("pts"), lambda p: p["ts"]).alias("timestamps"),
                )
            ).alias("value")
        )
    )
    return packed


def parse_csv_import(
    df: DataFrame, format_spec: list[tuple[int, str]], ts_col: int, metric_prefix: str = ""
) -> DataFrame:
    """CSV import with a column-format spec (lib/protoparser/csvimport/):
    ``format_spec`` maps 1-based column → role, role ∈ {"metric:<name>",
    "label:<label>"}; ``ts_col`` holds unix ms."""
    cols = df.columns
    label_pairs: list[Column] = []
    metrics: list[tuple[str, Column]] = []
    for idx, role in format_spec:
        c = F.col(cols[idx - 1])
        if role.startswith("label:"):
            label_pairs += [F.lit(role[6:]), c.cast("string")]
        elif role.startswith("metric:"):
            metrics.append((metric_prefix + role[7:], c.cast("double")))
    labels = (
        F.create_map(*label_pairs)
        if label_pairs
        else F.create_map().cast("map<string,string>")
    )
    ts = F.col(cols[ts_col - 1]).cast("long")
    parts = []
    for mname, mval in metrics:
        parts.append(
            df.select(
                F.lit(mname).alias("name"),
                labels.alias("labels"),
                ts.alias("ts"),
                mval.alias("value"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return _finish(out)

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
    (federate/scrape format; comments and blank lines skipped), plus the
    UTF-8 names syntax ``{"any name", "any label"="v"} value [ts_ms]``
    (Prometheus 3.x / VM: quoted metric and label names inside the
    braces)."""
    l = F.trim(F.col("value"))
    data = lines.select(l.alias("value")).filter(
        (l != "") & ~l.startswith("#")
    )
    utf8 = F.col("value").startswith("{")
    classic_name = F.regexp_extract(
        F.col("value"), r"^([a-zA-Z_:][a-zA-Z0-9_:.]*)", 1
    )
    labels_str = F.when(
        utf8, F.regexp_extract(F.col("value"), r"^\{([^}]*)\}", 1)
    ).otherwise(
        F.regexp_extract(F.col("value"), r"^[^{\s]+\{([^}]*)\}", 1)
    )
    rest = F.trim(
        F.when(
            utf8, F.regexp_replace(F.col("value"), r"^\{[^}]*\}", "")
        ).otherwise(
            F.regexp_replace(F.col("value"), r"^[^{\s]+(\{[^}]*\})?", "")
        )
    )
    elems = F.split(labels_str, r",\s*")
    unq = lambda c: F.regexp_replace(c, r'^"|"$', "")  # noqa: E731
    # UTF-8 form: the bare quoted element is the metric name
    utf8_name = unq(
        F.element_at(
            F.concat(
                F.filter(elems, lambda p: (p != "") & ~p.contains("=")),
                F.array(F.lit('""')),
            ),
            1,
        )
    )
    name = F.when(utf8, utf8_name).otherwise(classic_name)
    val = F.split_part(rest, F.lit(" "), F.lit(1))
    ts_str = F.split_part(rest, F.lit(" "), F.lit(2))
    # label pairs: a="b" or "quoted name"="b" — strip quotes both sides
    pairs = F.filter(elems, lambda p: p.contains("="))
    labels = F.map_from_entries(
        F.transform(
            pairs,
            lambda p: F.struct(
                unq(F.split_part(p, F.lit("="), F.lit(1))).alias("key"),
                unq(F.split_part(p, F.lit("="), F.lit(2))).alias("value"),
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


# ------------------------------------------------------------------ round 3:
# remaining ingestion dialects (SURVEY.md §2.1, app/vminsert/main.go:229-322).
# All are from_json / regex column transforms — JVM-side, streaming-safe.


def _sec_or_ms(ts: Column) -> Column:
    """OpenTSDB/Datadog timestamps may be seconds or milliseconds; values
    below ~1e12 are seconds (lib/protoparser timestamp normalization)."""
    return F.when(ts < F.lit(1_000_000_000_000), ts * 1000).otherwise(ts)


def parse_opentsdb(lines: DataFrame) -> DataFrame:
    """OpenTSDB telnet put: ``put <metric> <ts> <value> [tag=v ...]``
    (lib/protoparser/opentsdb/)."""
    l = F.trim(F.col("value"))
    data = lines.select(l.alias("value")).filter(l.startswith("put "))
    name = F.split_part(l, F.lit(" "), F.lit(2))
    ts = F.split_part(l, F.lit(" "), F.lit(3)).cast("long")
    val = F.split_part(l, F.lit(" "), F.lit(4))
    # tags: everything after the 4th space-separated token
    tags_str = F.array_join(
        F.slice(
            F.split(l, r"\s+"),
            5,
            F.greatest(F.size(F.split(l, r"\s+")) - 4, F.lit(0)),
        ),
        ",",
    )
    return _finish(
        data.select(
            name.alias("name"),
            _tags_to_map(tags_str, ",", "=").alias("labels"),
            _sec_or_ms(ts).alias("ts"),
            val.cast("double").alias("value"),
        )
    )


def parse_opentsdb_http(docs: DataFrame) -> DataFrame:
    """OpenTSDB HTTP JSON (/api/put, lib/protoparser/opentsdbhttp/): one
    JSON document per row — a single datapoint object or an array."""
    item = "STRUCT<metric: STRING, timestamp: BIGINT, value: DOUBLE, tags: MAP<STRING,STRING>>"
    arr = F.from_json(F.col("value"), f"ARRAY<{item}>")
    one = F.from_json(F.col("value"), item)
    pts = F.coalesce(arr, F.array(one))
    d = docs.select(F.explode(pts).alias("p")).filter(F.col("p.metric").isNotNull())
    return _finish(
        d.select(
            F.col("p.metric").alias("name"),
            F.col("p.tags").alias("labels"),
            _sec_or_ms(F.col("p.timestamp")).alias("ts"),
            F.col("p.value").alias("value"),
        )
    )


def _dd_tags_to_map(tags: Column, extra: list[tuple[str, Column]]) -> Column:
    """Datadog ``["k:v", ...]`` tag lists → label map (+ extra pairs)."""
    pairs = F.transform(
        F.filter(tags, lambda t: t.contains(":")),
        lambda t: F.struct(
            F.split_part(t, F.lit(":"), F.lit(1)).alias("key"),
            F.regexp_replace(t, r"^[^:]*:", "").alias("value"),
        ),
    )
    def _neq(name: str):
        # closure, not a default-arg lambda: PySpark reads default args as
        # extra lambda variables and mis-counts the arity
        return lambda key, _val: key != F.lit(name)

    m = F.map_from_entries(pairs)
    for k, v in extra:
        m = F.map_concat(
            F.map_filter(m, _neq(k)),
            F.when(v.isNotNull(), F.create_map(F.lit(k), v)).otherwise(
                F.create_map().cast("map<string,string>")
            ),
        )
    return m


def parse_datadog_v1(docs: DataFrame) -> DataFrame:
    """Datadog v1 /api/v1/series (lib/protoparser/datadogv1/):
    {"series":[{"metric","points":[[ts_s,v],...],"tags":["k:v"],"host"}]}"""
    schema = (
        "series ARRAY<STRUCT<metric: STRING, points: ARRAY<ARRAY<DOUBLE>>, "
        "tags: ARRAY<STRING>, host: STRING>>"
    )
    d = docs.select(F.explode(F.from_json(F.col("value"), schema)["series"]).alias("s"))
    p = d.select(
        F.col("s.metric").alias("name"),
        _dd_tags_to_map(
            F.coalesce(F.col("s.tags"), F.array().cast("array<string>")),
            [("host", F.col("s.host"))],
        ).alias("labels"),
        F.explode(F.col("s.points")).alias("pt"),
    )
    return _finish(
        p.select(
            "name",
            "labels",
            _sec_or_ms(F.element_at(F.col("pt"), 1).cast("long")).alias("ts"),
            F.element_at(F.col("pt"), 2).alias("value"),
        )
    )


def parse_datadog_v2(docs: DataFrame) -> DataFrame:
    """Datadog v2 /api/v2/series (lib/protoparser/datadogv2/): points are
    {"timestamp","value"} structs; host comes from resources[]."""
    schema = (
        "series ARRAY<STRUCT<metric: STRING, "
        "points: ARRAY<STRUCT<timestamp: BIGINT, value: DOUBLE>>, "
        "tags: ARRAY<STRING>, "
        "resources: ARRAY<STRUCT<name: STRING, type: STRING>>>>"
    )
    d = docs.select(F.explode(F.from_json(F.col("value"), schema)["series"]).alias("s"))
    host = F.element_at(
        F.filter(F.col("s.resources"), lambda r: r["type"] == "host"), 1
    )["name"]
    p = d.select(
        F.col("s.metric").alias("name"),
        _dd_tags_to_map(
            F.coalesce(F.col("s.tags"), F.array().cast("array<string>")),
            [("host", host)],
        ).alias("labels"),
        F.explode(F.col("s.points")).alias("pt"),
    )
    return _finish(
        p.select(
            "name",
            "labels",
            _sec_or_ms(F.col("pt.timestamp")).alias("ts"),
            F.col("pt.value").alias("value"),
        )
    )


def parse_newrelic(docs: DataFrame) -> DataFrame:
    """NewRelic infra agent payload (lib/protoparser/newrelic/):
    [{"Events":[{"eventType":"SystemSample","timestamp":ts_s,
    <numeric fields>...}]}] — every numeric field becomes the metric
    ``<eventType>_<field>`` (VM converts camelCase to snake_case; that
    normalization is applied here too)."""
    schema = "ARRAY<STRUCT<Events: ARRAY<MAP<STRING,STRING>>>>"
    d = docs.select(F.explode(F.from_json(F.col("value"), schema)).alias("e"))
    ev = d.select(F.explode(F.col("e.Events")).alias("m"))
    ev = ev.withColumn("ts", F.element_at(F.col("m"), "timestamp").cast("long"))
    ev = ev.withColumn("etype", F.element_at(F.col("m"), "eventType"))
    kv = ev.select(
        "ts", "etype", F.explode(F.col("m")).alias("k", "v")
    ).filter(~F.col("k").isin("timestamp", "eventType"))
    num = F.col("v").try_cast("double")
    snake = lambda c: F.lower(  # noqa: E731  camelCase → snake_case
        F.regexp_replace(c, r"([a-z0-9])([A-Z])", r"$1_$2")
    )
    return _finish(
        kv.filter(num.isNotNull()).select(
            F.concat(snake(F.col("etype")), F.lit("_"), snake(F.col("k"))).alias(
                "name"
            ),
            F.create_map().cast("map<string,string>").alias("labels"),
            _sec_or_ms(F.col("ts")).alias("ts"),
            num.alias("value"),
        )
    )


def parse_otlp_json(docs: DataFrame) -> DataFrame:
    """OTLP metrics JSON (lib/protoparser/opentelemetry/): gauge and sum
    datapoints; attributes become labels; timeUnixNano → ms."""
    dp = (
        "ARRAY<STRUCT<timeUnixNano: STRING, asDouble: DOUBLE, asInt: STRING, "
        "attributes: ARRAY<STRUCT<key: STRING, value: STRUCT<stringValue: STRING>>>>>"
    )
    schema = (
        "resourceMetrics ARRAY<STRUCT<scopeMetrics: ARRAY<STRUCT<"
        f"metrics: ARRAY<STRUCT<name: STRING, gauge: STRUCT<dataPoints: {dp}>, "
        f"sum: STRUCT<dataPoints: {dp}>>>>>>>"
    )
    j = docs.select(F.from_json(F.col("value"), schema).alias("j"))
    m = (
        j.select(F.explode(F.col("j.resourceMetrics")).alias("rm"))
        .select(F.explode(F.col("rm.scopeMetrics")).alias("sm"))
        .select(F.explode(F.col("sm.metrics")).alias("m"))
    )
    pts = m.select(
        F.col("m.name").alias("name"),
        F.explode(
            F.coalesce(
                F.col("m.gauge.dataPoints"),
                F.col("m.sum.dataPoints"),
            )
        ).alias("p"),
    )
    labels = F.map_from_entries(
        F.transform(
            F.coalesce(F.col("p.attributes"), F.expr("array()")),
            lambda a: F.struct(
                a["key"].alias("key"), a["value"]["stringValue"].alias("value")
            ),
        )
    )
    return _finish(
        pts.select(
            "name",
            labels.alias("labels"),
            (F.col("p.timeUnixNano").cast("long") / F.lit(1_000_000))
            .cast("long")
            .alias("ts"),
            F.coalesce(
                F.col("p.asDouble"), F.col("p.asInt").cast("double")
            ).alias("value"),
        )
    )


def parse_zabbix(lines: DataFrame) -> DataFrame:
    """Zabbix real-time-export connector lines
    (lib/protoparser/zabbixconnector/parser.go): one JSON object per
    line — ``host.host`` → ``host`` label, ``host.name`` →
    ``hostname`` label, ``name`` → metric name, ``item_tags``
    [{tag,value}] → ``tag_<k>`` labels (entries with an empty tag or
    value are skipped, the -zabbixconnector.addEmptyTagsValue="" 
    default), ts = clock·1e3 + ns/1e6."""
    schema = (
        "host STRUCT<host: STRING, name: STRING>, name STRING, "
        "value DOUBLE, clock BIGINT, ns BIGINT, "
        "item_tags ARRAY<STRUCT<tag: STRING, value: STRING>>"
    )
    j = lines.select(F.from_json(F.col("value"), schema).alias("j")).filter(
        F.col("j.name").isNotNull()
        & F.col("j.host.host").isNotNull()
        & F.col("j.host.name").isNotNull()
    )
    tag_entries = F.filter(
        F.coalesce(
            F.col("j.item_tags"),
            F.array().cast("array<struct<tag:string,value:string>>"),
        ),
        lambda t: t["tag"].isNotNull()
        & (t["tag"] != "")
        & t["value"].isNotNull()
        & (t["value"] != ""),
    )
    labels = F.map_concat(
        F.create_map(
            F.lit("host"), F.col("j.host.host"),
            F.lit("hostname"), F.col("j.host.name"),
        ),
        F.map_from_entries(
            F.transform(
                tag_entries,
                lambda t: F.struct(
                    F.concat(F.lit("tag_"), t["tag"]).alias("key"),
                    t["value"].alias("value"),
                ),
            )
        ),
    )
    return _finish(
        j.select(
            F.col("j.name").alias("name"),
            labels.alias("labels"),
            (
                F.col("j.clock") * 1000
                + F.floor(F.coalesce(F.col("j.ns"), F.lit(0)) / 1_000_000)
            )
            .cast("long")
            .alias("ts"),
            F.col("j.value").alias("value"),
        )
    )


def samples_to_csv(samples: DataFrame) -> DataFrame:
    """CSV export shape (/api/v1/export/csv): one row per sample with the
    canonical label string; feed to ``df.write.csv``."""
    from victoriametrics_spark.schema import canonical_labels_str

    return samples.select(
        F.col("name").alias("metric"),
        canonical_labels_str(
            F.coalesce(F.col("labels"), F.create_map().cast("map<string,string>"))
        ).alias("labels"),
        F.col("ts").alias("timestamp_ms"),
        F.col("value"),
    )

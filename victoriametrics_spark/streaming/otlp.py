"""OTLP metrics ingest (lib/protoparser/opentelemetry/): protobuf and
JSON request bodies → canonical samples + metric metadata.

The reference decodes every OTLP metric type into Prometheus-shaped
series (pb.go pushSamples per datapoint kind):

- gauge / sum number points → one series per point (as_int/as_double,
  staleness when ``flags & 1``, streamparser.go:150-163);
- histogram → ``_count``, ``_sum`` (only when present), CUMULATIVE
  ``le`` buckets + ``+Inf`` (pb.go:1215-1245);
- exponential histogram → ``_count``/``_sum`` + VM ``vmrange`` buckets
  with base 2^(2^-scale) and a zero bucket (pb.go:1461-1503);
- summary → ``_count``, ``_sum``, per-quantile series (pb.go:1699-1711);
- resource attributes, scope name/version/attributes
  (``scope.name``/``scope.version``/``scope.attributes.<k>``,
  promoteScopeMetadata default true) and datapoint attributes become
  labels; attribute values stringify per decodeAnyValue
  (pb.go:334-420): bool → true/false, int/double → shortest decimal,
  arrays → JSON, nested kvlists → dotted label names;
- metric name/description/unit → MetricMetadata, with the
  ``prometheus.type`` metadata attribute overriding the inferred type
  (pb.go:752-759);
- optional Prometheus naming (-opentelemetry.usePrometheusNaming):
  unit suffixes via the collector's normalize_name tables, ``_total``
  for monotonic sums, ``_ratio`` for unit-"1" gauges
  (stream/sanitize.go:125-205).

OTLP is a wire format, so decoding happens in Arrow-batched Python
(``mapInPandas``) like remote-write protobuf and DDSketch — one task
per payload batch, no shuffle.
"""

from __future__ import annotations

import json
from decimal import Decimal
from typing import Iterator

from victoriametrics_spark.streaming.remotewrite import (
    _fields,
    _to_i64,
    _uvarint,
    _vmrange,
    _zigzag,
)

# prompb.MetricType (lib/prompb/prompb.go:99-113)
MT_UNKNOWN, MT_COUNTER, MT_GAUGE, MT_HISTOGRAM = 0, 1, 2, 3
MT_GAUGEHISTOGRAM, MT_SUMMARY, MT_INFO, MT_STATESET = 4, 5, 6, 7

_STALE = float("nan")  # staleness marker value; is_stale column is truth

# normalize_name.go unit tables (sanitize.go:25-70)
_UNIT_MAP = {
    "d": "days", "h": "hours", "min": "minutes", "s": "seconds",
    "ms": "milliseconds", "us": "microseconds", "ns": "nanoseconds",
    "By": "bytes", "KiBy": "kibibytes", "MiBy": "mebibytes",
    "GiBy": "gibibytes", "TiBy": "tibibytes", "KBy": "kilobytes",
    "MBy": "megabytes", "GBy": "gigabytes", "TBy": "terabytes",
    "m": "meters", "V": "volts", "A": "amperes", "J": "joules",
    "W": "watts", "g": "grams", "Cel": "celsius", "Hz": "hertz",
    "1": "", "%": "percent",
}
_PER_UNIT_MAP = {
    "s": "second", "m": "minute", "h": "hour", "d": "day",
    "w": "week", "mo": "month", "y": "year",
}


def _fmt_float(v: float) -> str:
    """Go strconv.AppendFloat(v, 'f', -1, 64): shortest decimal that
    round-trips, never scientific (pb/fmt_buffer.go:26-30); non-finite
    values spell Go's NaN/+Inf/-Inf, not Python's."""
    if v != v:
        return "NaN"
    if v == float("inf"):
        return "+Inf"
    if v == float("-inf"):
        return "-Inf"
    if v == int(v) and abs(v) < 1e16:
        return str(int(v))
    return format(Decimal(repr(v)), "f")


def sanitize_prom_metric_name(name: str, unit: str, mtype: int) -> str:
    """sanitizePrometheusMetricName (sanitize.go:125-205): tokenize on
    /_.-: and space, append unit tokens (main + per) unless already
    present or annotation-braced, move-or-append 'total' for counters
    and 'ratio' for unit-"1" gauges, join with underscores."""
    tokens: list[str] = []
    s = name
    while s:
        cut = len(s)
        for ch in "/_.-: ":
            i = s.find(ch)
            if i >= 0:
                cut = min(cut, i)
        if cut == len(s):
            tokens.append(s)
            break
        if cut > 0:
            tokens.append(s[:cut])
        s = s[cut + 1 :]
    main_unit, _, per_unit = unit.partition("/")
    main_unit, per_unit = main_unit.strip(), per_unit.strip()
    if main_unit and "{" not in main_unit:
        main_unit = _UNIT_MAP.get(main_unit, main_unit)
        if main_unit and main_unit not in tokens:
            tokens.append(main_unit)
    if per_unit and "{" not in per_unit:
        per_unit = _PER_UNIT_MAP.get(per_unit, per_unit)
        if per_unit:
            tokens += ["per", per_unit]
    if mtype == MT_COUNTER:
        if "total" in tokens:
            tokens.remove("total")
        tokens.append("total")
    elif unit == "1" and mtype == MT_GAUGE:
        if "ratio" in tokens:
            tokens.remove("ratio")
        tokens.append("ratio")
    return "_".join(tokens)


# ----------------------------------------------------------------- JSON
def _any_value_str(v: dict) -> "str | None":
    """OTLP-JSON AnyValue → label string (decodeAnyValue semantics)."""
    if not isinstance(v, dict):
        return None
    if "stringValue" in v:
        return str(v["stringValue"])
    if "boolValue" in v:
        return "true" if v["boolValue"] else "false"
    if "intValue" in v:
        return str(int(v["intValue"]))
    if "doubleValue" in v:
        return _fmt_float(float(v["doubleValue"]))
    if "arrayValue" in v:
        vals = (v["arrayValue"] or {}).get("values") or []
        return json.dumps(
            [_any_json(x) for x in vals], separators=(",", ":")
        )
    if "bytesValue" in v:
        return str(v["bytesValue"])
    return None


def _any_json(v: dict):
    """AnyValue → plain JSON value for array encoding
    (decodeArrayValueToJSON: kvlists inside arrays become objects)."""
    if not isinstance(v, dict):
        return None
    if "stringValue" in v:
        return str(v["stringValue"])
    if "boolValue" in v:
        return bool(v["boolValue"])
    if "intValue" in v:
        return int(v["intValue"])
    if "doubleValue" in v:
        return float(v["doubleValue"])
    if "arrayValue" in v:
        return [
            _any_json(x)
            for x in (v["arrayValue"] or {}).get("values") or []
        ]
    if "kvlistValue" in v:
        return {
            kv.get("key", ""): _any_json(kv.get("value") or {})
            for kv in (v["kvlistValue"] or {}).get("values") or []
        }
    return None


def _attrs_to_labels(attrs, labels: dict, prefix: str = "") -> None:
    """KeyValue list → labels; nested kvlists become dotted names
    (formatSubFieldName prefix.suffix)."""
    for kv in attrs or []:
        key = kv.get("key", "")
        name = f"{prefix}.{key}" if prefix else key
        v = kv.get("value") or {}
        if "kvlistValue" in v:
            _attrs_to_labels(
                (v["kvlistValue"] or {}).get("values") or [], labels, name
            )
            continue
        s = _any_value_str(v)
        if s is not None:
            labels[name] = s


def _num_value(p: dict) -> "float | None":
    if "asDouble" in p:
        return float(p["asDouble"])
    if "asInt" in p:
        return float(int(p["asInt"]))
    return None


def _ts_ms(p: dict) -> int:
    return int(p.get("timeUnixNano") or 0) // 1_000_000


def _point(name, suffix, base_labels, extra, ts, value, flags, out):
    labels = dict(base_labels)
    labels.update(extra)
    stale = bool(int(flags or 0) & 1)  # FLAG_NO_RECORDED_VALUE
    out.append(
        (name + suffix, labels, ts, _STALE if stale else value, stale)
    )


def decode_otlp_json(
    doc: dict,
    prom_naming: bool = False,
    convert_names: bool = False,
    promote_scope: bool = True,
):
    """OTLP-JSON ExportMetricsServiceRequest → (samples, metadata).

    samples: [(name, labels, ts_ms, value, is_stale)] in the
    reference's push order; metadata: [{metric_family_name, help,
    unit, type}] per metric."""
    samples: list = []
    metadata: list = []
    for rm in doc.get("resourceMetrics") or []:
        res_labels: dict = {}
        _attrs_to_labels(
            (rm.get("resource") or {}).get("attributes"), res_labels
        )
        for sm in rm.get("scopeMetrics") or []:
            labels = dict(res_labels)
            if promote_scope:
                scope = sm.get("scope") or {}
                if scope.get("name"):
                    labels["scope.name"] = scope["name"]
                if scope.get("version"):
                    labels["scope.version"] = scope["version"]
                _attrs_to_labels(
                    scope.get("attributes"), labels, "scope.attributes"
                )
            for m in sm.get("metrics") or []:
                _decode_metric_json(
                    m, labels, samples, metadata,
                    prom_naming, convert_names,
                )
    return samples, metadata


def _metric_meta(m: dict) -> "tuple[int, dict]":
    """Infer prompb metric type + metadata record (pb.go:700-762)."""
    if "gauge" in m:
        mtype = MT_GAUGE
    elif "sum" in m:
        mtype = (
            MT_COUNTER if (m["sum"] or {}).get("isMonotonic") else MT_GAUGE
        )
    elif "histogram" in m or "exponentialHistogram" in m:
        mtype = MT_HISTOGRAM
    elif "summary" in m:
        mtype = MT_SUMMARY
    else:
        mtype = MT_UNKNOWN
    md_attrs: dict = {}
    _attrs_to_labels(m.get("metadata"), md_attrs)
    override = md_attrs.get("prometheus.type")
    if override == "unknown":
        mtype = MT_UNKNOWN
    elif override == "info":
        mtype = MT_INFO
    elif override == "stateset":
        mtype = MT_STATESET
    return mtype, {
        "help": m.get("description", ""),
        "unit": m.get("unit", ""),
        "type": mtype,
    }


def _decode_metric_json(
    m, base_labels, samples, metadata, prom_naming, convert_names
):
    mtype, md = _metric_meta(m)
    name = m.get("name", "")
    if prom_naming or convert_names:
        name = sanitize_prom_metric_name(name, m.get("unit", ""), mtype)
    md["metric_family_name"] = name
    metadata.append(md)

    def attrs(p):
        extra: dict = {}
        _attrs_to_labels(p.get("attributes"), extra)
        return extra

    for key in ("gauge", "sum"):
        for p in (m.get(key) or {}).get("dataPoints") or []:
            v = _num_value(p)
            if v is None:
                continue
            _point(
                name, "", base_labels, attrs(p), _ts_ms(p), v,
                p.get("flags"), samples,
            )
    for p in (m.get("histogram") or {}).get("dataPoints") or []:
        counts = [int(c) for c in p.get("bucketCounts") or []]
        bounds = [float(b) for b in p.get("explicitBounds") or []]
        if not counts:
            continue
        if len(counts) != len(bounds) + 1:
            continue  # skippedSampleLogger (pb.go:1220-1223)
        ts, fl, extra = _ts_ms(p), p.get("flags"), attrs(p)
        _point(name, "_count", base_labels, extra, ts,
               float(int(p.get("count") or 0)), fl, samples)
        if "sum" in p:
            _point(name, "_sum", base_labels, extra, ts,
                   float(p["sum"]), fl, samples)
        cumulative = 0
        for i, bound in enumerate(bounds):
            cumulative += counts[i]
            _point(name, "_bucket", base_labels,
                   {**extra, "le": _fmt_float(bound)}, ts,
                   float(cumulative), fl, samples)
        cumulative += counts[-1]
        _point(name, "_bucket", base_labels, {**extra, "le": "+Inf"},
               ts, float(cumulative), fl, samples)
    for p in (m.get("exponentialHistogram") or {}).get("dataPoints") or []:
        ts, fl, extra = _ts_ms(p), p.get("flags"), attrs(p)
        _point(name, "_count", base_labels, extra, ts,
               float(int(p.get("count") or 0)), fl, samples)
        if "sum" in p:
            _point(name, "_sum", base_labels, extra, ts,
                   float(p["sum"]), fl, samples)
        zero_count = int(p.get("zeroCount") or 0)
        zero_threshold = float(p.get("zeroThreshold") or 0.0)
        if zero_count > 0:
            _point(name, "_bucket", base_labels,
                   {**extra, "vmrange": _vmrange(-zero_threshold,
                                                 zero_threshold)},
                   ts, float(zero_count), fl, samples)
        scale = int(p.get("scale") or 0)
        ratio = 2.0 ** -scale
        base = 2.0 ** ratio
        for side, neg in (("positive", False), ("negative", True)):
            b = p.get(side) or {}
            offset = int(b.get("offset") or 0)
            bound = 2.0 ** (offset * ratio)
            for i, c in enumerate(
                int(x) for x in b.get("bucketCounts") or []
            ):
                if c <= 0:
                    continue
                lo = bound * base ** i
                hi = lo * base
                vr = _vmrange(-hi, -lo) if neg else _vmrange(lo, hi)
                _point(name, "_bucket", base_labels,
                       {**extra, "vmrange": vr}, ts, float(c), fl,
                       samples)
    for p in (m.get("summary") or {}).get("dataPoints") or []:
        ts, fl, extra = _ts_ms(p), p.get("flags"), attrs(p)
        _point(name, "_count", base_labels, extra, ts,
               float(int(p.get("count") or 0)), fl, samples)
        _point(name, "_sum", base_labels, extra, ts,
               float(p.get("sum") or 0.0), fl, samples)
        for qv in p.get("quantileValues") or []:
            _point(name, "", base_labels,
                   {**extra,
                    "quantile": _fmt_float(float(qv.get("quantile") or 0.0))},
                   ts, float(qv.get("value") or 0.0), fl, samples)


# ------------------------------------------------------------- protobuf
def _pb_to_json(body: bytes) -> dict:
    """Decode an OTLP ExportMetricsServiceRequest protobuf into the
    equivalent OTLP-JSON dict, then reuse the JSON decoder — one
    conversion semantics, two wire formats. Field numbers from the
    reference's marshalers (pb.go)."""
    import struct as _st

    def kv_list(data: bytes) -> list:
        out = []
        for f, wt, v in _fields(data):
            if f == 1 and wt == 2:
                out.append(keyvalue(v))
        return out

    def keyvalue(data: bytes) -> dict:
        key, val = "", {}
        for f, wt, v in _fields(data):
            if f == 1 and wt == 2:
                key = v.decode("utf-8", "replace")
            elif f == 2 and wt == 2:
                val = anyvalue(v)
        return {"key": key, "value": val}

    def anyvalue(data: bytes) -> dict:
        for f, wt, v in _fields(data):
            if f == 1 and wt == 2:
                return {"stringValue": v.decode("utf-8", "replace")}
            if f == 2 and wt == 0:
                return {"boolValue": bool(v)}
            if f == 3 and wt == 0:
                return {"intValue": str(_to_i64(v))}
            if f == 4 and wt == 1:
                return {"doubleValue": _st.unpack("<d", v)[0]}
            if f == 5 and wt == 2:
                return {"arrayValue": {"values": [
                    anyvalue(x) for ff, wwt, x in _fields(v)
                    if ff == 1 and wwt == 2
                ]}}
            if f == 6 and wt == 2:
                return {"kvlistValue": {"values": kv_list(v)}}
            if f == 7 and wt == 2:
                return {"bytesValue": v.hex()}
        return {}

    def fixed64(v: bytes) -> int:
        return int.from_bytes(v, "little")

    def number_point(data: bytes) -> dict:
        p: dict = {}
        attrs = []
        for f, wt, v in _fields(data):
            if f == 7 and wt == 2:
                attrs.append(keyvalue(v))
            elif f == 3 and wt == 1:
                p["timeUnixNano"] = str(fixed64(v))
            elif f == 4 and wt == 1:
                p["asDouble"] = _st.unpack("<d", v)[0]
            elif f == 6 and wt == 1:  # sfixed64
                p["asInt"] = str(
                    _to_i64(int.from_bytes(v, "little"))
                )
            elif f == 8 and wt == 0:
                p["flags"] = int(v)
        p["attributes"] = attrs
        return p

    def histogram_point(data: bytes) -> dict:
        p: dict = {"bucketCounts": [], "explicitBounds": []}
        attrs = []
        for f, wt, v in _fields(data):
            if f == 9 and wt == 2:
                attrs.append(keyvalue(v))
            elif f == 3 and wt == 1:
                p["timeUnixNano"] = str(fixed64(v))
            elif f == 4 and wt == 1:
                p["count"] = str(fixed64(v))
            elif f == 5 and wt == 1:
                p["sum"] = _st.unpack("<d", v)[0]
            elif f == 6 and wt == 2:  # packed fixed64
                p["bucketCounts"] += [
                    str(x[0]) for x in _st.iter_unpack("<Q", v)
                ]
            elif f == 6 and wt == 1:
                p["bucketCounts"].append(str(fixed64(v)))
            elif f == 7 and wt == 2:  # packed double
                p["explicitBounds"] += [
                    x[0] for x in _st.iter_unpack("<d", v)
                ]
            elif f == 10 and wt == 0:
                p["flags"] = int(v)
        p["attributes"] = attrs
        return p

    def buckets(data: bytes) -> dict:
        b: dict = {"offset": 0, "bucketCounts": []}
        for f, wt, v in _fields(data):
            if f == 1 and wt == 0:
                b["offset"] = _zigzag(int(v))
            elif f == 2 and wt == 0:
                b["bucketCounts"].append(str(int(v)))
            elif f == 2 and wt == 2:  # packed uint64 varints
                pos = 0
                while pos < len(v):
                    x, pos = _uvarint(v, pos)
                    b["bucketCounts"].append(str(x))
        return b

    def exp_histogram_point(data: bytes) -> dict:
        p: dict = {}
        attrs = []
        for f, wt, v in _fields(data):
            if f == 1 and wt == 2:
                attrs.append(keyvalue(v))
            elif f == 3 and wt == 1:
                p["timeUnixNano"] = str(fixed64(v))
            elif f == 4 and wt == 1:
                p["count"] = str(fixed64(v))
            elif f == 5 and wt == 1:
                p["sum"] = _st.unpack("<d", v)[0]
            elif f == 6 and wt == 0:
                p["scale"] = _zigzag(int(v))
            elif f == 7 and wt == 1:
                p["zeroCount"] = str(fixed64(v))
            elif f == 8 and wt == 2:
                p["positive"] = buckets(v)
            elif f == 9 and wt == 2:
                p["negative"] = buckets(v)
            elif f == 10 and wt == 0:
                p["flags"] = int(v)
            elif f == 14 and wt == 1:
                p["zeroThreshold"] = _st.unpack("<d", v)[0]
        p["attributes"] = attrs
        return p

    def summary_point(data: bytes) -> dict:
        p: dict = {"quantileValues": []}
        attrs = []
        for f, wt, v in _fields(data):
            if f == 7 and wt == 2:
                attrs.append(keyvalue(v))
            elif f == 3 and wt == 1:
                p["timeUnixNano"] = str(fixed64(v))
            elif f == 4 and wt == 1:
                p["count"] = str(fixed64(v))
            elif f == 5 and wt == 1:
                p["sum"] = _st.unpack("<d", v)[0]
            elif f == 6 and wt == 2:
                qv = {"quantile": 0.0, "value": 0.0}
                for qf, qwt, qq in _fields(v):
                    if qf == 1 and qwt == 1:
                        qv["quantile"] = _st.unpack("<d", qq)[0]
                    elif qf == 2 and qwt == 1:
                        qv["value"] = _st.unpack("<d", qq)[0]
                p["quantileValues"].append(qv)
            elif f == 8 and wt == 0:
                p["flags"] = int(v)
        p["attributes"] = attrs
        return p

    def metric(data: bytes) -> dict:
        m: dict = {}
        for f, wt, v in _fields(data):
            if f == 1 and wt == 2:
                m["name"] = v.decode("utf-8", "replace")
            elif f == 2 and wt == 2:
                m["description"] = v.decode("utf-8", "replace")
            elif f == 3 and wt == 2:
                m["unit"] = v.decode("utf-8", "replace")
            elif f == 5 and wt == 2:
                m.setdefault("gauge", {"dataPoints": []})[
                    "dataPoints"
                ] += [
                    number_point(x)
                    for ff, wwt, x in _fields(v)
                    if ff == 1 and wwt == 2
                ]
            elif f == 7 and wt == 2:
                sm = m.setdefault(
                    "sum", {"dataPoints": [], "isMonotonic": False}
                )
                for ff, wwt, x in _fields(v):
                    if ff == 1 and wwt == 2:
                        sm["dataPoints"].append(number_point(x))
                    elif ff == 3 and wwt == 0:
                        sm["isMonotonic"] = bool(x)
            elif f == 9 and wt == 2:
                m.setdefault("histogram", {"dataPoints": []})[
                    "dataPoints"
                ] += [
                    histogram_point(x)
                    for ff, wwt, x in _fields(v)
                    if ff == 1 and wwt == 2
                ]
            elif f == 10 and wt == 2:
                m.setdefault(
                    "exponentialHistogram", {"dataPoints": []}
                )["dataPoints"] += [
                    exp_histogram_point(x)
                    for ff, wwt, x in _fields(v)
                    if ff == 1 and wwt == 2
                ]
            elif f == 11 and wt == 2:
                m.setdefault("summary", {"dataPoints": []})[
                    "dataPoints"
                ] += [
                    summary_point(x)
                    for ff, wwt, x in _fields(v)
                    if ff == 1 and wwt == 2
                ]
            elif f == 12 and wt == 2:
                m.setdefault("metadata", []).append(keyvalue(v))
        return m

    rms = []
    for f, wt, rm_data in _fields(body):
        if f != 1 or wt != 2:
            continue
        rm: dict = {"scopeMetrics": []}
        for f2, wt2, v2 in _fields(rm_data):
            if f2 == 1 and wt2 == 2:
                rm["resource"] = {"attributes": kv_list(v2)}
            elif f2 == 2 and wt2 == 2:
                sm: dict = {"metrics": []}
                for f3, wt3, v3 in _fields(v2):
                    if f3 == 1 and wt3 == 2:
                        scope: dict = {}
                        for f4, wt4, v4 in _fields(v3):
                            if f4 == 1 and wt4 == 2:
                                scope["name"] = v4.decode(
                                    "utf-8", "replace"
                                )
                            elif f4 == 2 and wt4 == 2:
                                scope["version"] = v4.decode(
                                    "utf-8", "replace"
                                )
                            elif f4 == 3 and wt4 == 2:
                                scope.setdefault(
                                    "attributes", []
                                ).append(keyvalue(v4))
                        sm["scope"] = scope
                    elif f3 == 2 and wt3 == 2:
                        sm["metrics"].append(metric(v3))
                rm["scopeMetrics"].append(sm)
        rms.append(rm)
    return {"resourceMetrics": rms}


def decode_otlp_pb(body: bytes, **kw):
    """OTLP protobuf ExportMetricsServiceRequest → (samples, metadata)."""
    return decode_otlp_json(_pb_to_json(body), **kw)


def firehose_process_body(b: bytes) -> bytes:
    """AWS Firehose envelope → raw OTLP protobuf
    (lib/protoparser/opentelemetry/firehose/parser.go:27-55): the JSON
    body carries base64 ``records[].data``, each a sequence of
    uvarint-length-prefixed ExportMetricsServiceRequest messages;
    concatenating the stripped messages yields one valid protobuf
    (repeated fields append)."""
    import base64

    req = json.loads(b)
    dst = bytearray()
    for rec in req.get("records") or req.get("Records") or []:
        data = base64.b64decode(rec.get("data") or rec.get("Data") or "")
        while data:
            msg_len, n = _uvarint(data, 0)
            if n > 5:  # binary.MaxVarintLen32
                raise ValueError(
                    "failed to parse OpenTelemetry message: invalid variant"
                )
            total = n + msg_len
            if total > len(data):
                raise ValueError(
                    "failed to parse OpenTelemetry message:"
                    " insufficient length of buffer"
                )
            dst += data[n:total]
            data = data[total:]
    return bytes(dst)


# --------------------------------------------------------------- Spark
def otlp_to_samples(
    docs, col: str = "value", fmt: str = "json", **kw
):
    """DataFrame of OTLP payloads (JSON strings or protobuf binaries)
    → canonical samples, Arrow-batched like remote_write_to_samples."""
    import pandas as pd

    from pyspark.sql import functions as F
    from pyspark.sql.types import StructField, StructType

    from victoriametrics_spark.schema import SAMPLE_SCHEMA

    src = docs.select(col)

    def _decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for blob in pdf[col]:
                if blob is None:
                    continue
                try:
                    if fmt == "json":
                        doc = json.loads(blob)
                        out, _ = decode_otlp_json(doc, **kw)
                    else:
                        out, _ = decode_otlp_pb(bytes(blob), **kw)
                except Exception:  # noqa: BLE001 — poison payload drops
                    continue
                rows += out
            yield pd.DataFrame(
                rows, columns=["name", "labels", "ts", "value", "is_stale"]
            )

    xfer = StructType(
        [StructField(f.name, f.dataType, True) for f in SAMPLE_SCHEMA.fields]
    )
    df = src.mapInPandas(_decode, schema=xfer)
    return df.select(
        "name",
        "labels",
        "ts",
        F.coalesce(F.col("value"), F.lit(float("nan"))).alias("value"),
        F.coalesce(F.col("is_stale"), F.lit(False)).alias("is_stale"),
    )

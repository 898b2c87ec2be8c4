"""OTLP metrics conversion — ported from the reference's
TestParseStream (lib/protoparser/opentelemetry/stream/
streamparser_test.go): every OTLP metric type converts to the exact
Prometheus-shaped series set, resource/scope/datapoint attributes
become labels, and the optional Prometheus naming applies unit/total/
ratio suffixes. Expected tuples are the reference test's expected
prompb.TimeSeries flattened to (name, labels, ts_ms, value)."""

from __future__ import annotations

import json

import pytest

from victoriametrics_spark.streaming.otlp import (
    MT_COUNTER,
    MT_GAUGE,
    MT_HISTOGRAM,
    MT_SUMMARY,
    MT_UNKNOWN,
    decode_otlp_json,
    decode_otlp_pb,
    sanitize_prom_metric_name,
)

SCOPE_LABELS = {
    "scope.name": "foo",
    "scope.version": "bar",
    "scope.attributes.abc": "qwe",
}
BASE = {"job": "vm", **SCOPE_LABELS}


def _attr(k, v):
    return {"key": k, "value": {"stringValue": v}}


def _wrap(metrics):
    """generateOTLPSamples (streamparser_test.go:732-755): one resource
    with job=vm, one scope foo/bar with attribute abc=qwe."""
    return {
        "resourceMetrics": [
            {
                "resource": {"attributes": [_attr("job", "vm")]},
                "scopeMetrics": [
                    {
                        "scope": {
                            "name": "foo",
                            "version": "bar",
                            "attributes": [_attr("abc", "qwe")],
                        },
                        "metrics": metrics,
                    }
                ],
            }
        ]
    }


def _gauge(name, unit=""):
    # generateGauge: int value 15 @ 15s, label1=value1
    return {
        "name": name,
        "description": "I'm a gauge",
        "unit": unit,
        "gauge": {
            "dataPoints": [
                {
                    "attributes": [_attr("label1", "value1")],
                    "asInt": "15",
                    "timeUnixNano": str(15 * 10**9),
                }
            ]
        },
    }


def _histogram(name, unit="", has_sum=True):
    p = {
        "attributes": [_attr("label2", "value2")],
        "count": "15",
        "explicitBounds": [0.1, 0.5, 1.0, 5.0],
        "bucketCounts": ["0", "5", "10", "0", "0"],
        "timeUnixNano": str(30 * 10**9),
    }
    if has_sum:
        p["sum"] = 30.0
    return {
        "name": name,
        "unit": unit,
        "description": "I'm a Histogram",
        "histogram": {"dataPoints": [p]},
    }


def _sum(name, unit="", monotonic=False):
    return {
        "name": name,
        "unit": unit,
        "description": "I might be a counter or gauge, depending on the IsMonotonic",
        "sum": {
            "dataPoints": [
                {
                    "attributes": [_attr("label5", "value5")],
                    "asDouble": 15.5,
                    "timeUnixNano": str(150 * 10**9),
                }
            ],
            "isMonotonic": monotonic,
        },
    }


def _summary(name, unit=""):
    return {
        "name": name,
        "unit": unit,
        "description": "I'm a Summary",
        "summary": {
            "dataPoints": [
                {
                    "attributes": [_attr("label6", "value6")],
                    "timeUnixNano": str(35 * 10**9),
                    "sum": 32.5,
                    "count": "5",
                    "quantileValues": [
                        {"quantile": 0.1, "value": 7.5},
                        {"quantile": 0.5, "value": 10.0},
                        {"quantile": 1.0, "value": 15.0},
                    ],
                }
            ]
        },
    }


def _exp_histogram(name, unit=""):
    # generateExpHistogram (streamparser_test.go:594-622)
    return {
        "name": name,
        "unit": unit,
        "exponentialHistogram": {
            "dataPoints": [
                {
                    "attributes": [_attr("label1", "value1")],
                    "timeUnixNano": str(15 * 10**9),
                    "count": "31",
                    "sum": 588.0,
                    "scale": 0,
                    "positive": {
                        "offset": 2,
                        "bucketCounts": ["1", "2", "3", "4", "5", "0", "0", "1"],
                    },
                    "negative": {
                        "offset": 2,
                        "bucketCounts": ["1", "2", "3", "4", "5"],
                    },
                }
            ]
        },
    }


def _series(samples):
    return sorted(
        (n, tuple(sorted(ls.items())), ts, v)
        for n, ls, ts, v, _st in samples
    )


def _exp(name, ts, v, extra=None):
    ls = dict(BASE)
    ls.update(extra or {})
    return (name, tuple(sorted(ls.items())), ts, v)


def test_all_metric_types():
    # streamparser_test.go:120-152 "Test all metric types"
    doc = _wrap(
        [
            _gauge("my-gauge"),
            _histogram("my-histogram", has_sum=True),
            _histogram("my-sumless-histogram", has_sum=False),
            _sum("my-sum"),
            _summary("my-summary"),
        ]
    )
    samples, mms = decode_otlp_json(doc)
    l1 = {"label1": "value1"}
    l2 = {"label2": "value2"}
    want = sorted(
        [
            _exp("my-gauge", 15000, 15.0, l1),
            _exp("my-histogram_count", 30000, 15.0, l2),
            _exp("my-histogram_sum", 30000, 30.0, l2),
            _exp("my-histogram_bucket", 30000, 0.0, {**l2, "le": "0.1"}),
            _exp("my-histogram_bucket", 30000, 5.0, {**l2, "le": "0.5"}),
            _exp("my-histogram_bucket", 30000, 15.0, {**l2, "le": "1"}),
            _exp("my-histogram_bucket", 30000, 15.0, {**l2, "le": "5"}),
            _exp("my-histogram_bucket", 30000, 15.0, {**l2, "le": "+Inf"}),
            _exp("my-sumless-histogram_count", 30000, 15.0, l2),
            _exp("my-sumless-histogram_bucket", 30000, 0.0,
                 {**l2, "le": "0.1"}),
            _exp("my-sumless-histogram_bucket", 30000, 5.0,
                 {**l2, "le": "0.5"}),
            _exp("my-sumless-histogram_bucket", 30000, 15.0,
                 {**l2, "le": "1"}),
            _exp("my-sumless-histogram_bucket", 30000, 15.0,
                 {**l2, "le": "5"}),
            _exp("my-sumless-histogram_bucket", 30000, 15.0,
                 {**l2, "le": "+Inf"}),
            _exp("my-sum", 150000, 15.5, {"label5": "value5"}),
            _exp("my-summary_sum", 35000, 32.5, {"label6": "value6"}),
            _exp("my-summary_count", 35000, 5.0, {"label6": "value6"}),
            _exp("my-summary", 35000, 7.5,
                 {"label6": "value6", "quantile": "0.1"}),
            _exp("my-summary", 35000, 10.0,
                 {"label6": "value6", "quantile": "0.5"}),
            _exp("my-summary", 35000, 15.0,
                 {"label6": "value6", "quantile": "1"}),
        ]
    )
    assert _series(samples) == want
    # metadata (streamparser_test.go:154-183)
    by_name = {m["metric_family_name"]: m for m in mms}
    assert by_name["my-gauge"]["type"] == MT_GAUGE
    assert by_name["my-gauge"]["help"] == "I'm a gauge"
    assert by_name["my-histogram"]["type"] == MT_HISTOGRAM
    assert by_name["my-sum"]["type"] == MT_GAUGE  # non-monotonic
    assert by_name["my-summary"]["type"] == MT_SUMMARY


def test_gauge_unknown_metadata_override():
    # generateGaugeUnknown: metadata prometheus.type=unknown
    g = _gauge("my-gauge-unknown")
    g["description"] = "I'm not a gauge"
    g["metadata"] = [_attr("prometheus.type", "unknown")]
    samples, mms = decode_otlp_json(_wrap([g]))
    assert _series(samples) == [
        _exp("my-gauge-unknown", 15000, 15.0, {"label1": "value1"})
    ]
    assert mms[0]["type"] == MT_UNKNOWN


def test_prometheus_naming():
    # streamparser_test.go:215-320 flag-gated cases
    f = sanitize_prom_metric_name
    assert f("my-gauge", "ms", MT_GAUGE) == "my_gauge_milliseconds"
    assert f("my-gauge-milliseconds", "ms", MT_GAUGE) == "my_gauge_milliseconds"
    assert f("my-gauge-milliseconds", "1", MT_GAUGE) == "my_gauge_milliseconds_ratio"
    assert f("my-sum", "ms", MT_COUNTER) == "my_sum_milliseconds_total"
    assert f("my-total-sum", "m/s", MT_COUNTER) == "my_sum_meters_per_second_total"
    assert f("test-histogram", "m/s", MT_HISTOGRAM) == "test_histogram_meters_per_second"
    # flags wired through the decoder
    samples, mms = decode_otlp_json(
        _wrap([_sum("my-sum", "ms", monotonic=True)]), prom_naming=True
    )
    assert samples[0][0] == "my_sum_milliseconds_total"
    assert mms[0]["metric_family_name"] == "my_sum_milliseconds_total"
    assert mms[0]["type"] == MT_COUNTER


def test_exponential_histogram_vmrange():
    # streamparser_test.go:360-400 (usePrometheusNaming=true there)
    samples, _ = decode_otlp_json(
        _wrap([_exp_histogram("test-histogram", "m/s")]), prom_naming=True
    )
    l1 = {"label1": "value1"}
    nm = "test_histogram_meters_per_second"
    want = sorted(
        [
            _exp(nm + "_count", 15000, 31.0, l1),
            _exp(nm + "_sum", 15000, 588.0, l1),
            _exp(nm + "_bucket", 15000, 1.0,
                 {**l1, "vmrange": "4.000e+00...8.000e+00"}),
            _exp(nm + "_bucket", 15000, 2.0,
                 {**l1, "vmrange": "8.000e+00...1.600e+01"}),
            _exp(nm + "_bucket", 15000, 3.0,
                 {**l1, "vmrange": "1.600e+01...3.200e+01"}),
            _exp(nm + "_bucket", 15000, 4.0,
                 {**l1, "vmrange": "3.200e+01...6.400e+01"}),
            _exp(nm + "_bucket", 15000, 5.0,
                 {**l1, "vmrange": "6.400e+01...1.280e+02"}),
            _exp(nm + "_bucket", 15000, 1.0,
                 {**l1, "vmrange": "5.120e+02...1.024e+03"}),
            _exp(nm + "_bucket", 15000, 1.0,
                 {**l1, "vmrange": "-8.000e+00...-4.000e+00"}),
            _exp(nm + "_bucket", 15000, 2.0,
                 {**l1, "vmrange": "-1.600e+01...-8.000e+00"}),
            _exp(nm + "_bucket", 15000, 3.0,
                 {**l1, "vmrange": "-3.200e+01...-1.600e+01"}),
            _exp(nm + "_bucket", 15000, 4.0,
                 {**l1, "vmrange": "-6.400e+01...-3.200e+01"}),
            _exp(nm + "_bucket", 15000, 5.0,
                 {**l1, "vmrange": "-1.280e+02...-6.400e+01"}),
        ]
    )
    assert _series(samples) == want


def test_nested_attribute_values():
    # streamparser_test.go:430-500: arrays JSON-encode, kvlists nest
    # with dotted names, ints/doubles stringify shortest
    g = _gauge("my-gauge")
    g["gauge"]["dataPoints"][0]["attributes"] += [
        {"key": "label_array", "value": {"arrayValue": {"values": [
            {"stringValue": "value5"},
            {"kvlistValue": {"values": []}},
        ]}}},
        {"key": "nested_label", "value": {"kvlistValue": {"values": [
            {"key": "value_top_2", "value": {"stringValue": "valuetop"}},
            {"key": "nested_kv_list", "value": {"kvlistValue": {"values": [
                {"key": "integer", "value": {"intValue": "15"}},
                {"key": "double", "value": {"doubleValue": 5.1}},
                {"key": "string", "value": {"stringValue": "value2"}},
            ]}}},
        ]}}},
    ]
    samples, _ = decode_otlp_json(_wrap([g]))
    (row,) = samples
    labels = row[1]
    assert labels["label_array"] == '["value5",{}]'
    assert labels["nested_label.value_top_2"] == "valuetop"
    assert labels["nested_label.nested_kv_list.integer"] == "15"
    assert labels["nested_label.nested_kv_list.double"] == "5.1"
    assert labels["nested_label.nested_kv_list.string"] == "value2"


def test_staleness_flag():
    # flags & 1 → StaleNaN (streamparser.go:154-157)
    g = _gauge("g")
    g["gauge"]["dataPoints"][0]["flags"] = 1
    samples, _ = decode_otlp_json(_wrap([g]))
    (row,) = samples
    assert row[3] != row[3] and row[4] is True  # NaN + is_stale


# ------------------------------------------------------------- protobuf
def _ld(field, payload):
    out = bytearray()
    key = field << 3 | 2
    for x in (key, len(payload)):
        while True:
            b = x & 0x7F
            x >>= 7
            out.append(b | 0x80 if x else b)
            if not x:
                break
    return bytes(out) + payload


def _vi(field, v):
    out = bytearray()
    for x in (field << 3 | 0, v):
        while True:
            b = x & 0x7F
            x >>= 7
            out.append(b | 0x80 if x else b)
            if not x:
                break
    return bytes(out)


def _fx64(field, v):
    import struct

    return bytes([field << 3 | 1]) + struct.pack("<Q", v)


def _dbl(field, v):
    import struct

    return bytes([field << 3 | 1]) + struct.pack("<d", v)


def _pb_attr(k, v):
    return _ld(1, _ld(1, k.encode()) + _ld(2, _ld(1, v.encode())))


def test_protobuf_wire_format():
    """The same gauge through the protobuf decoder: Metric{name=1,
    description=2, gauge=5{NumberDataPoint{attrs=7, time=3 fixed64,
    as_int=6 sfixed64, flags=8}}} inside ResourceMetrics/ScopeMetrics
    (field numbers from pb.go marshalers)."""
    import struct

    point = (
        _pb_attr("label1", "value1").replace(bytes([1 << 3 | 2]), bytes([7 << 3 | 2]), 1)
        + _fx64(3, 15 * 10**9)
        + bytes([6 << 3 | 1]) + struct.pack("<q", 15)
    )
    metric = (
        _ld(1, b"my-gauge")
        + _ld(2, b"I'm a gauge")
        + _ld(5, _ld(1, point))
    )
    scope = _ld(1, b"foo") + _ld(2, b"bar") + _ld(
        3, _ld(1, b"abc") + _ld(2, _ld(1, b"qwe"))
    )
    sm = _ld(1, scope) + _ld(2, metric)
    resource = _pb_attr("job", "vm")
    rm = _ld(1, resource) + _ld(2, sm)
    body = _ld(1, rm)
    samples, mms = decode_otlp_pb(body)
    assert _series(samples) == [
        _exp("my-gauge", 15000, 15.0, {"label1": "value1"})
    ]
    assert mms[0]["metric_family_name"] == "my-gauge"
    assert mms[0]["help"] == "I'm a gauge"


def test_spark_otlp_pb_path(spark):
    """The mapInPandas protobuf path end-to-end through IngestAPI."""
    import struct

    from victoriametrics_spark.api.http import IngestAPI

    point = (
        bytes([7 << 3 | 2])
        + _ld(1, _ld(1, b"l") + _ld(2, _ld(1, b"v")))[1:]
        + _fx64(3, 15 * 10**9)
        + _dbl(4, 2.5)
    )
    metric = _ld(1, b"pb_gauge") + _ld(5, _ld(1, point))
    body = _ld(1, _ld(2, _ld(2, metric)))
    rows = []
    api = IngestAPI(spark, sink=lambda df, kind: rows.extend(df.collect()))
    n = api.ingest_otlp_pb(body)
    assert n == 1
    (r,) = rows
    assert r["name"] == "pb_gauge" and r["value"] == 2.5
    assert r["ts"] == 15000 and dict(r["labels"]) == {"l": "v"}


# --------------------------------------------------------------- firehose
def test_firehose_cloudwatch_golden():
    """The reference's real CloudWatch Metric Streams payload
    (firehose/parser_test.go TestProcessRequestBody): unwrap the
    Firehose JSON envelope, decode the concatenated length-prefixed
    OTLP protobuf, and reproduce the expected series text exactly
    (Go %g values, label order = __name__ + insertion order)."""
    import os

    from victoriametrics_spark.streaming.otlp import (
        decode_otlp_pb,
        firehose_process_body,
    )

    fix = json.load(
        open(os.path.join(os.path.dirname(__file__), "firehose_golden.json"))
    )
    pb = firehose_process_body(fix["body"].encode())
    samples, _ = decode_otlp_pb(pb)

    def g(v: float) -> str:  # Go %g
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)

    got_lines = []
    for name, labels, ts, value, _stale in samples:
        inner = ",".join(
            [f'__name__="{name}"']
            + [f'{k}="{v}"' for k, v in labels.items()]
        )
        got_lines.append("{%s} %s %d" % (inner, g(value), ts))
    want_lines = [ln for ln in fix["expected"].splitlines() if ln]
    assert len(got_lines) == len(want_lines)
    # the reference emits per-timeseries in decode order; compare sorted
    # (label insertion order differs between the two decoders only in
    # datapoint-attr position, which sorting absorbs)
    def norm(line):
        head, _, tail = line.partition("} ")
        inner = head[1:]
        return (tuple(sorted(inner.split(","))), tail)

    assert sorted(map(norm, got_lines)) == sorted(map(norm, want_lines))


def test_firehose_envelope_errors():
    from victoriametrics_spark.streaming.otlp import firehose_process_body

    with pytest.raises(Exception):
        firehose_process_body(b"{not json")
    # truncated length-prefixed message (parser.go:46-49)
    import base64

    bad = json.dumps(
        {"records": [{"data": base64.b64encode(b"\x7f123").decode()}]}
    )
    with pytest.raises(ValueError, match="insufficient length"):
        firehose_process_body(bad.encode())


# ------------------------------------------------------- naming flags
def test_ingest_api_naming_flags(spark):
    """-datadog.sanitizeMetricName=false and
    -opentelemetry.usePrometheusNaming=true analogs thread through the
    IngestAPI config surface."""
    from victoriametrics_spark.api.http import IngestAPI

    dd = '{"series":[{"metric":"sys.load!!1","points":[[100,1.0]]}]}'
    otlp = json.dumps(_wrap([_gauge("my-gauge", "ms")]))

    rows = []
    api = IngestAPI(spark, sink=lambda df, kind: rows.extend(df.collect()))
    api.ingest_json(dd, "datadog_v1")
    assert rows[-1]["name"] == "sys.load_1"  # sanitize default-on
    api.ingest_json(otlp, "otlp")
    assert rows[-1]["name"] == "my-gauge"  # prom naming default-off

    rows2 = []
    api2 = IngestAPI(
        spark,
        sink=lambda df, kind: rows2.extend(df.collect()),
        datadog_sanitize_metric_name=False,
        otlp_use_prometheus_naming=True,
    )
    api2.ingest_json(dd, "datadog_v1")
    assert rows2[-1]["name"] == "sys.load!!1"  # raw when disabled
    api2.ingest_json(otlp, "otlp")
    assert rows2[-1]["name"] == "my_gauge_milliseconds"


def test_sketches_sanitize(spark):
    """DDSketch metric names sanitize like the stream parser
    (datadogsketches/stream/streamparser.go:43)."""
    from victoriametrics_spark.streaming.datadogsketches import (
        dd_sanitize_name,
    )

    assert dd_sanitize_name("before.dot.metric!.name") == "before.dot.metric.name"
    assert dd_sanitize_name("many.consecutive.met!!!!ric!!.!!name") == "many.consecutive.met_ric.name"
    assert dd_sanitize_name("how.about.underscores_.!_metric!_!.__!!name") == "how.about.underscores.metric.name"

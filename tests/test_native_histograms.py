"""Prometheus native histograms on remote write.

Mirrors the reference's unmarshaler tests
(lib/prompb/write_request_unmarshaler_test.go:11-288): a prompb
TimeSeries may carry native-histogram samples (field 4) instead of
plain samples; each histogram is converted to classic
``_count``/``_sum``/``_bucket{vmrange="lo...hi"}`` series
(write_request_unmarshaler.go:169-199, nativeHistogramContext walk
:380-483). Expected tuples below are the reference test's expected
TimeSeries, flattened to this decoder's (name, labels, ts, value) rows.
"""

from __future__ import annotations

import math
import struct

import pytest

from victoriametrics_spark.streaming.remotewrite import (
    decode_write_request,
    encode_native_histogram,
    encode_write_request,
)


def _decode(series):
    payload = encode_write_request(series)
    return list(decode_write_request(payload))


def _vmr(lo: float, hi: float) -> str:
    # appendVmrangeHelper: strconv.AppendFloat(v, 'e', 3, 64) pair
    return f"{lo:.3e}...{hi:.3e}"


def test_classic_series_unaffected():
    rows = _decode(
        [({"__name__": "rpc", "job": "n"}, [(5000, 1.5)])]
    )
    assert rows == [("rpc", {"job": "n"}, 5000, 1.5)]


def test_basic_positive_histogram():
    # unmarshaler_test.go:42-96 — int counts, cumulative deltas,
    # a gap span (offset 2), zero bucket from zero_count_int
    h = {
        "count_int": 13,
        "sum": 175.5,
        "schema": 0,
        "zero_threshold": 0.00001,
        "zero_count_int": 2,
        "positive_spans": [(0, 4), (2, 1)],
        "positive_deltas": [2, -1, 2, -1, 1],
        "timestamp": 1000,
    }
    rows = _decode(
        [({"__name__": "rpc_latency_seconds", "job": "node-exporter"}, [], [h])]
    )
    base = {"job": "node-exporter"}
    assert rows == [
        ("rpc_latency_seconds_count", base, 1000, 13.0),
        ("rpc_latency_seconds_sum", base, 1000, 175.5),
        ("rpc_latency_seconds_bucket",
         {**base, "vmrange": _vmr(-0.00001, 0.00001)}, 1000, 2.0),
        ("rpc_latency_seconds_bucket",
         {**base, "vmrange": _vmr(0.5, 1)}, 1000, 2.0),
        ("rpc_latency_seconds_bucket",
         {**base, "vmrange": _vmr(1, 2)}, 1000, 1.0),
        ("rpc_latency_seconds_bucket",
         {**base, "vmrange": _vmr(2, 4)}, 1000, 3.0),
        ("rpc_latency_seconds_bucket",
         {**base, "vmrange": _vmr(4, 8)}, 1000, 2.0),
        ("rpc_latency_seconds_bucket",
         {**base, "vmrange": _vmr(32, 64)}, 1000, 3.0),
    ]


def test_basic_negative_histogram():
    # unmarshaler_test.go:98-131 — negative spans flip bucket signs
    h = {
        "count_int": 7,
        "sum": -15.0,
        "schema": 0,
        "timestamp": 2000,
        "negative_spans": [(1, 2)],
        "negative_deltas": [3, 1],
    }
    rows = _decode([({"__name__": "rpc_latency_seconds"}, [], [h])])
    assert rows == [
        ("rpc_latency_seconds_count", {}, 2000, 7.0),
        ("rpc_latency_seconds_sum", {}, 2000, -15.0),
        ("rpc_latency_seconds_bucket",
         {"vmrange": _vmr(-2, -1)}, 2000, 3.0),
        ("rpc_latency_seconds_bucket",
         {"vmrange": _vmr(-4, -2)}, 2000, 4.0),
    ]


def test_float_histogram():
    # unmarshaler_test.go:133-180 — float counts are absolute, schema 1
    # (base = sqrt(2)), float zero count
    h = {
        "count_float": 2.5,
        "sum": 1.0,
        "schema": 1,
        "zero_threshold": 0.00001,
        "zero_count_float": 0.5,
        "timestamp": 3000,
        "positive_spans": [(0, 2)],
        "positive_counts": [1.5, 1.0],
    }
    rows = _decode([({"__name__": "rpc_latency_seconds"}, [], [h])])
    sqrt2 = 2.0 ** 0.5
    assert rows == [
        ("rpc_latency_seconds_count", {}, 3000, 2.5),
        ("rpc_latency_seconds_sum", {}, 3000, 1.0),
        ("rpc_latency_seconds_bucket",
         {"vmrange": _vmr(-0.00001, 0.00001)}, 3000, 0.5),
        ("rpc_latency_seconds_bucket",
         {"vmrange": _vmr(1 / sqrt2, 1)}, 3000, 1.5),
        ("rpc_latency_seconds_bucket",
         {"vmrange": _vmr(1, sqrt2)}, 3000, 1.0),
    ]
    # the reference test hardcodes the rounded forms — assert parity
    assert rows[3][1]["vmrange"] == "7.071e-01...1.000e+00"
    assert rows[4][1]["vmrange"] == "1.000e+00...1.414e+00"


def test_count_only_histogram():
    # unmarshaler_test.go:182-207 — no buckets, just count and sum
    h = {"count_int": 10, "sum": 42.0, "schema": 3, "timestamp": 4000}
    rows = _decode([({"__name__": "rpc_latency_seconds"}, [], [h])])
    assert rows == [
        ("rpc_latency_seconds_count", {}, 4000, 10.0),
        ("rpc_latency_seconds_sum", {}, 4000, 42.0),
    ]


def test_two_histograms_context_reuse():
    # unmarshaler_test.go:202-287 — two histograms in one TimeSeries;
    # the second must not inherit the first's spans/deltas
    sqrt2 = 2.0 ** 0.5
    h1 = {
        "count_float": 2.5,
        "sum": 1.0,
        "schema": 1,
        "zero_threshold": 0.00001,
        "zero_count_float": 0.5,
        "timestamp": 3000,
        "positive_spans": [(1, 2)],
        "positive_counts": [1.5, 1.0],
        "negative_spans": [(0, 1)],
    }
    h2 = {
        "count_float": 0.0,
        "sum": 1.0,
        "schema": 1,
        "zero_threshold": 0.00001,
        "zero_count_float": 0.5,
        "timestamp": 4000,
        "positive_spans": [(0, 2)],
        "positive_counts": [1.5, 1.0],
        "negative_spans": [(0, 1)],
        "negative_counts": [1.5, 0.0],
    }
    rows = _decode([({"__name__": "rpc_latency_seconds"}, [], [h1, h2])])
    assert rows == [
        ("rpc_latency_seconds_count", {}, 3000, 2.5),
        ("rpc_latency_seconds_sum", {}, 3000, 1.0),
        ("rpc_latency_seconds_bucket",
         {"vmrange": _vmr(-0.00001, 0.00001)}, 3000, 0.5),
        ("rpc_latency_seconds_bucket",
         {"vmrange": _vmr(1, sqrt2)}, 3000, 1.5),
        ("rpc_latency_seconds_bucket",
         {"vmrange": _vmr(sqrt2, sqrt2 * sqrt2)}, 3000, 1.0),
        ("rpc_latency_seconds_count", {}, 4000, 0.0),
        ("rpc_latency_seconds_sum", {}, 4000, 1.0),
        ("rpc_latency_seconds_bucket",
         {"vmrange": _vmr(-0.00001, 0.00001)}, 4000, 0.5),
        ("rpc_latency_seconds_bucket",
         {"vmrange": _vmr(1 / sqrt2, 1)}, 4000, 1.5),
        ("rpc_latency_seconds_bucket",
         {"vmrange": _vmr(1, sqrt2)}, 4000, 1.0),
        ("rpc_latency_seconds_bucket",
         {"vmrange": _vmr(-1, -1 / sqrt2)}, 4000, 1.5),
    ]
    # Go formats base^2 (= 2.0000000000000004) as 2.000e+00
    assert rows[4][1]["vmrange"] == "1.414e+00...2.000e+00"


def test_mixed_samples_and_histograms_rejected():
    # unmarshaler.go:181-183: whole request errors
    h = {"count_int": 1, "sum": 1.0, "timestamp": 1000}
    payload = encode_write_request(
        [({"__name__": "m"}, [(1000, 1.0)], [h])]
    )
    with pytest.raises(ValueError, match="both samples and native"):
        list(decode_write_request(payload))


def test_nameless_histogram_skipped():
    # unmarshaler.go:396-398: metric without __name__ drops silently
    h = {"count_int": 3, "sum": 9.0, "timestamp": 1000}
    rows = _decode([({"job": "j"}, [], [h])])
    assert rows == []


def test_histogram_deltas_unpacked_single_varints():
    # repeated sint64 may arrive unpacked (one varint per field entry) —
    # legal protobuf wire form the reference's easyproto also accepts
    def vi(field, v):
        out = bytearray()
        key = field << 3 | 0
        for x in (key, v):
            while True:
                b = x & 0x7F
                x >>= 7
                out.append(b | 0x80 if x else b)
                if not x:
                    break
        return bytes(out)

    def zz(v):
        return (v << 1) ^ (v >> 63) if v < 0 else v << 1

    h = encode_native_histogram(
        {"count_int": 3, "sum": 6.0, "timestamp": 1000,
         "positive_spans": [(0, 2)]}
    ) + vi(12, zz(2)) + vi(12, zz(1))
    # splice the raw histogram message into a TimeSeries by hand
    def ld(field, payload):
        head = bytearray()
        key = field << 3 | 2
        for x in (key, len(payload)):
            while True:
                b = x & 0x7F
                x >>= 7
                head.append(b | 0x80 if x else b)
                if not x:
                    break
        return bytes(head) + payload

    name_label = ld(1, ld(1, b"__name__") + ld(2, b"m"))
    ts_msg = ld(1, name_label + ld(4, h))
    from victoriametrics_spark.streaming.remotewrite import snappy_compress

    rows = list(decode_write_request(snappy_compress(ts_msg)))
    assert ("m_bucket", {"vmrange": _vmr(0.5, 1)}, 1000, 2.0) in rows
    assert ("m_bucket", {"vmrange": _vmr(1, 2)}, 1000, 3.0) in rows


def test_stale_nan_value_roundtrip_still_works():
    stale = struct.unpack("<d", struct.pack("<Q", 0x7FF0000000000002))[0]
    rows = _decode([({"__name__": "m"}, [(1, stale)])])
    assert len(rows) == 1 and math.isnan(rows[0][3])

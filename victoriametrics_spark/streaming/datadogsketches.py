"""Datadog /api/beta/sketches (DDSketch) ingestion.

Reference: lib/protoparser/datadogsketches/parser.go — the payload is a
protobuf:

    message SketchPayload { repeated Sketch sketches = 1; }
    message Sketch  { string metric = 1; string host = 2;
                      repeated string tags = 4;
                      repeated Dogsketch dogsketches = 7; }
    message Dogsketch { int64 ts = 1; int64 cnt = 2; double min = 3;
                        double max = 4; double sum = 6;
                        repeated sint32 k = 7; repeated uint32 n = 8; }

Each sketch is flattened to a Prometheus-style summary exactly as the
reference does (parser.go:156-225 ToSummary): five quantile series
(q ∈ {0.5, 0.75, 0.9, 0.95, 0.99}, label ``quantile``) interpolated
from the gamma-indexed buckets, plus ``<metric>.sum/.count/.min/.max``.
Tags ``k:v`` and the host become labels (the reference applies them in
the insert handler). The DDSketch mapping constants come from the same
public source the reference cites (DataDog/opentelemetry-mapping-go
pkg/quantile/config.go): eps = 1/128, gamma = 1 + 2·eps,
bias = 1 - ⌊ln(1e-9)/ln1p(2·eps)⌋.

Spark-side, payload blobs decode inside ``mapInPandas`` (Arrow-batched
— opaque binary, the sanctioned Python boundary) into the canonical
sample schema, like streaming/remotewrite.py.
"""

from __future__ import annotations

import math
import struct
from typing import Iterator

from pyspark.sql import DataFrame

from victoriametrics_spark.schema import SAMPLE_SCHEMA
from victoriametrics_spark.streaming.remotewrite import (
    _fields,
    _to_i64,
    _uvarint,
    _uvarint_encode,
)

EPS = 1.0 / 128
GAMMA = 1 + 2 * EPS
GAMMA_LN = math.log1p(2 * EPS)
DEFAULT_MIN = 1e-9
BIAS = 1 - int(math.floor(math.log(DEFAULT_MIN) / GAMMA_LN))
QUANTILES = (0.5, 0.75, 0.9, 0.95, 0.99)
# strconv.FormatFloat(q, 'g', 3, 64) of the quantiles above
QUANTILE_STRS = ("0.5", "0.75", "0.9", "0.95", "0.99")


def _unpack_varints(data: bytes) -> list[int]:
    out, pos = [], 0
    while pos < len(data):
        v, pos = _uvarint(data, pos)
        out.append(v)
    return out


def _zigzag_decode(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _f64(k: int) -> float:
    """Bucket key → value (opentelemetry-mapping-go key.go/config.go,
    mirrored at parser.go:345-367)."""
    if k <= -((1 << 15) - 1):
        return float("-inf")
    if k >= (1 << 15) - 1:
        return float("inf")
    if k == 0:
        return 0.0
    if k < 0:
        return -_f64(-k)
    return GAMMA ** float(k - BIAS)


def sketch_quantile(
    q: float, cnt: int, mn: float, mx: float, ks: list[int], ns: list[int]
) -> float:
    """DDSketch quantile with linear interpolation inside the winning
    bucket (parser.go:311-343, itself from
    opentelemetry-mapping-go sparse.go)."""
    if cnt == 0:
        return 0.0
    if q <= 0:
        return mn
    if q >= 1:
        return mx
    if len(ns) != len(ks):
        return 0.0
    # math.RoundToEven = banker's rounding
    rank = float(round(q * (cnt - 1)))
    c = 0.0
    for i, n in enumerate(ns):
        c += float(n)
        if c <= rank:
            continue
        weight = (c - rank) / float(n)
        v_low = _f64(ks[i])
        v_high = v_low * GAMMA
        if i == 0:
            v_low = mn
        return v_low * weight + v_high * (1 - weight)
    return mx


def decode_sketch_payload(body: bytes) -> list[dict]:
    """SketchPayload → list of sketch dicts."""
    sketches = []
    for f, wt, msg in _fields(body):
        if f != 1 or wt != 2:
            continue
        metric, host, tags, dogs = "", "", [], []
        for sf, swt, sv in _fields(msg):
            if sf == 1 and swt == 2:
                metric = sv.decode("utf-8", "replace")
            elif sf == 2 and swt == 2:
                host = sv.decode("utf-8", "replace")
            elif sf == 4 and swt == 2:
                tags.append(sv.decode("utf-8", "replace"))
            elif sf == 7 and swt == 2:
                d = {
                    "ts": 0, "cnt": 0, "min": 0.0, "max": 0.0,
                    "sum": 0.0, "k": [], "n": [],
                }
                for df_, dwt, dv in _fields(sv):
                    if df_ == 1 and dwt == 0:
                        d["ts"] = _to_i64(dv)
                    elif df_ == 2 and dwt == 0:
                        d["cnt"] = _to_i64(dv)
                    elif df_ == 3 and dwt == 1:
                        d["min"] = struct.unpack("<d", dv)[0]
                    elif df_ == 4 and dwt == 1:
                        d["max"] = struct.unpack("<d", dv)[0]
                    elif df_ == 6 and dwt == 1:
                        d["sum"] = struct.unpack("<d", dv)[0]
                    elif df_ == 7 and dwt == 2:  # packed sint32
                        d["k"] = [
                            _zigzag_decode(v) for v in _unpack_varints(dv)
                        ]
                    elif df_ == 7 and dwt == 0:  # unpacked fallback
                        d["k"].append(_zigzag_decode(dv))
                    elif df_ == 8 and dwt == 2:  # packed uint32
                        d["n"] = _unpack_varints(dv)
                    elif df_ == 8 and dwt == 0:
                        d["n"].append(dv)
                dogs.append(d)
        sketches.append(
            {"metric": metric, "host": host, "tags": tags, "dogs": dogs}
        )
    return sketches


def sketch_to_summary(
    sketch: dict,
) -> Iterator[tuple[str, dict, int, float]]:
    """(name, labels, ts_ms, value) rows per the reference's ToSummary
    (parser.go:156-225): quantile series + .sum/.count/.min/.max.
    Tags/host become labels as the insert handler applies them."""
    base_labels = {}
    for tag in sketch["tags"]:
        k, _, v = tag.partition(":")
        if k:
            base_labels[k] = v
    if sketch["host"]:
        base_labels["host"] = sketch["host"]
    metric = sketch["metric"]
    for d in sketch["dogs"]:
        ts_ms = d["ts"] * 1000
        for q, qs in zip(QUANTILES, QUANTILE_STRS):
            labels = dict(base_labels)
            labels["quantile"] = qs
            yield metric, labels, ts_ms, sketch_quantile(
                q, d["cnt"], d["min"], d["max"], d["k"], d["n"]
            )
        yield metric + ".sum", dict(base_labels), ts_ms, d["sum"]
        yield metric + ".count", dict(base_labels), ts_ms, float(d["cnt"])
        yield metric + ".min", dict(base_labels), ts_ms, d["min"]
        yield metric + ".max", dict(base_labels), ts_ms, d["max"]


def encode_sketch_payload(sketches: list[dict]) -> bytes:
    """Inverse of decode_sketch_payload — for tests and replay."""

    def ld(field: int, payload: bytes) -> bytes:
        return _uvarint_encode(field << 3 | 2) + _uvarint_encode(
            len(payload)
        ) + payload

    def varint(field: int, v: int) -> bytes:
        return _uvarint_encode(field << 3 | 0) + _uvarint_encode(
            v & ((1 << 64) - 1)
        )

    def fixed64(field: int, v: float) -> bytes:
        return _uvarint_encode(field << 3 | 1) + struct.pack("<d", v)

    out = bytearray()
    for s in sketches:
        msg = bytearray()
        msg += ld(1, s["metric"].encode())
        if s.get("host"):
            msg += ld(2, s["host"].encode())
        for tag in s.get("tags", []):
            msg += ld(4, tag.encode())
        for d in s["dogs"]:
            dmsg = bytearray()
            dmsg += varint(1, d["ts"])
            dmsg += varint(2, d["cnt"])
            dmsg += fixed64(3, d["min"])
            dmsg += fixed64(4, d["max"])
            dmsg += fixed64(6, d["sum"])
            if d["k"]:
                packed = b"".join(
                    _uvarint_encode((v << 1) ^ (v >> 31) if v >= 0
                                    else ((-v) << 1) - 1)
                    for v in d["k"]
                )
                dmsg += ld(7, packed)
            if d["n"]:
                dmsg += ld(8, b"".join(_uvarint_encode(v) for v in d["n"]))
            msg += ld(7, bytes(dmsg))
        out += ld(1, bytes(msg))
    return bytes(out)


def dd_sanitize_name(name: str) -> str:
    """datadogutil.SanitizeName (datadogutil.go:39-60), applied to
    sketch metric names like the stream parser does
    (datadogsketches/stream/streamparser.go:43)."""
    import re

    s = re.sub(r"[^0-9a-zA-Z_.]+", "_", name)
    s = re.sub(r"_+", "_", s)
    return re.sub(r"_?\._?", ".", s)


def sketches_to_samples(
    payloads: DataFrame,
    col: str = "body",
    sanitize_metric_name: bool = True,
) -> DataFrame:
    """DataFrame with a binary payload column → canonical samples.

    Arrow-batched mapInPandas: one Python crossing per batch of
    payload blobs; every sketch expands to (5 quantiles + 4 aux) rows
    per dogsketch (parser.go RowsCount)."""
    import pandas as pd

    def _decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for body in pdf[col]:
                if body is None:
                    continue
                for sk in decode_sketch_payload(bytes(body)):
                    if sanitize_metric_name:
                        sk["metric"] = dd_sanitize_name(
                            sk.get("metric", "")
                        )
                    for name, lbls, ts, val in sketch_to_summary(sk):
                        rows.append((name, lbls, ts, val, False))
            yield pd.DataFrame(
                rows,
                columns=["name", "labels", "ts", "value", "is_stale"],
            )

    return payloads.mapInPandas(_decode, schema=SAMPLE_SCHEMA)

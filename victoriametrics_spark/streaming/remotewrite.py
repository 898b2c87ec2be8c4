"""Prometheus remote-write (prompb.WriteRequest) wire-format ingest.

Reference: lib/protoparser/promremotewrite/ — the body is a
snappy-compressed protobuf:

    message WriteRequest { repeated TimeSeries timeseries = 1; }
    message TimeSeries  { repeated Label labels = 1;
                          repeated Sample samples = 2; }
    message Label       { string name = 1; string value = 2; }
    message Sample      { double value = 1; int64 timestamp = 2; }

Both snappy (block format) and this 4-message protobuf schema are small,
stable public formats, so they are decoded here directly — no external
dependency. Spark-side, payload blobs decode inside ``mapInPandas``
(Arrow-batched; protobuf is an opaque binary format, the one case where
Python in the path is genuinely unavoidable) into the canonical sample
schema, so a stream of remote-write bodies feeds the same engine as
every text dialect in parsers.py.
"""

from __future__ import annotations

import struct
from typing import Iterator

from pyspark.sql import DataFrame

from victoriametrics_spark.schema import SAMPLE_SCHEMA

# ------------------------------------------------------------- snappy
# Block format (github.com/google/snappy/blob/master/format_description.txt):
# varint uncompressed length, then literal / copy tags.


def snappy_uncompress(data: bytes) -> bytes:
    total, pos = _uvarint(data, 0)
    out = bytearray()
    n = len(data)
    while pos < n:
        tag = data[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:  # 60..63 → that many extra length bytes
                extra = ln - 59
                ln = int.from_bytes(data[pos : pos + extra], "little")
                pos += extra
            ln += 1
            out += data[pos : pos + ln]
            pos += ln
            continue
        if kind == 1:  # copy, 1-byte offset
            ln = ((tag >> 2) & 7) + 4
            off = ((tag & 0xE0) << 3) | data[pos]
            pos += 1
        elif kind == 2:  # copy, 2-byte offset
            ln = (tag >> 2) + 1
            off = int.from_bytes(data[pos : pos + 2], "little")
            pos += 2
        else:  # copy, 4-byte offset
            ln = (tag >> 2) + 1
            off = int.from_bytes(data[pos : pos + 4], "little")
            pos += 4
        # overlapping copies are allowed and meaningful (RLE) — byte loop
        start = len(out) - off
        for i in range(ln):
            out.append(out[start + i])
    if len(out) != total:
        raise ValueError(
            f"snappy: declared length {total}, decoded {len(out)}"
        )
    return bytes(out)


_STALE_NAN_BYTES = struct.pack("<Q", 0x7FF0000000000002)


def is_stale_nan(val: float) -> bool:
    """Prometheus staleness marker: the specific NaN bit pattern
    (decimal.StaleNaN). Bit-compare — ordinary NaNs are data."""
    import math as _math

    return _math.isnan(val) and struct.pack("<d", val) == _STALE_NAN_BYTES


def snappy_compress(data: bytes) -> bytes:
    """Valid (if unambitious) snappy stream: one literal run per 2^24
    bytes. Decompresses under ANY conformant reader — used for tests and
    for emitting remote-write bodies."""
    out = bytearray(_uvarint_encode(len(data)))
    pos = 0
    while pos < len(data) or (pos == 0 and not data):
        chunk = data[pos : pos + (1 << 24)]
        if not chunk:
            break
        ln = len(chunk) - 1
        if ln < 60:
            out.append(ln << 2)
        else:
            nbytes = (ln.bit_length() + 7) // 8
            out.append((59 + nbytes) << 2)
            out += ln.to_bytes(nbytes, "little")
        out += chunk
        pos += len(chunk)
    return bytes(out)


def _uvarint(data: bytes, pos: int) -> tuple[int, int]:
    result = shift = 0
    while True:
        b = data[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _uvarint_encode(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


# ------------------------------------------------------------- protobuf
def _fields(data: bytes) -> Iterator[tuple[int, int, bytes | int]]:
    """Yield (field_no, wire_type, value) for a protobuf message body."""
    pos, n = 0, len(data)
    while pos < n:
        key, pos = _uvarint(data, pos)
        field, wt = key >> 3, key & 7
        if wt == 0:  # varint
            v, pos = _uvarint(data, pos)
            yield field, wt, v
        elif wt == 1:  # fixed64
            yield field, wt, data[pos : pos + 8]
            pos += 8
        elif wt == 2:  # length-delimited
            ln, pos = _uvarint(data, pos)
            yield field, wt, data[pos : pos + ln]
            pos += ln
        elif wt == 5:  # fixed32
            yield field, wt, data[pos : pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")


def _to_i64(v: int) -> int:
    return v - (1 << 64) if v >= 1 << 63 else v


def decode_write_request(
    body: bytes, compressed: bool = True
) -> Iterator[tuple[str, dict, int, float]]:
    """(name, labels-without-__name__, ts_ms, value) per sample."""
    if compressed:
        body = snappy_uncompress(body)
    for f, wt, ts_msg in _fields(body):
        if f != 1 or wt != 2:
            continue
        labels: dict[str, str] = {}
        samples: list[tuple[int, float]] = []
        for sf, swt, sv in _fields(ts_msg):
            if sf == 1 and swt == 2:  # Label
                ln = lv = ""
                for lf, lwt, lval in _fields(sv):
                    if lf == 1:
                        ln = lval.decode("utf-8")
                    elif lf == 2:
                        lv = lval.decode("utf-8")
                labels[ln] = lv
            elif sf == 2 and swt == 2:  # Sample
                val, ts = 0.0, 0
                for pf, pwt, pv in _fields(sv):
                    if pf == 1 and pwt == 1:
                        val = struct.unpack("<d", pv)[0]
                    elif pf == 2 and pwt == 0:
                        ts = _to_i64(pv)
                samples.append((ts, val))
        name = labels.pop("__name__", "")
        for ts, val in samples:
            yield name, dict(labels), ts, val


def decode_write_request_metadata(
    body: bytes, compressed: bool = True
) -> list[dict]:
    """MetricMetadata records from a remote-write payload
    (prompb WriteRequest field 3; MetricMetadata: type=1 enum,
    metric_family_name=2, help=4, unit=5 —
    lib/prompb/write_request_unmarshaler.go:640-690)."""
    if compressed:
        body = snappy_uncompress(body)
    out: list[dict] = []
    for f, wt, msg in _fields(body):
        if f != 3 or wt != 2:
            continue
        md = {"metric_family_name": "", "help": "", "unit": "", "type": 0}
        for mf, mwt, mv in _fields(msg):
            if mf == 1 and mwt == 0:
                md["type"] = int(mv)
            elif mf == 2 and mwt == 2:
                md["metric_family_name"] = mv.decode("utf-8")
            elif mf == 4 and mwt == 2:
                md["help"] = mv.decode("utf-8")
            elif mf == 5 and mwt == 2:
                md["unit"] = mv.decode("utf-8")
        out.append(md)
    return out


def encode_write_request(
    series: list[tuple[dict, list[tuple[int, float]]]],
    compress: bool = True,
    metadata: list[dict] | None = None,
) -> bytes:
    """Inverse of decode_write_request (labels dict INCLUDING __name__,
    [(ts_ms, value)]) — exercised against the decoder in tests and used
    by clients emitting remote-write."""

    def ld(field: int, payload: bytes) -> bytes:
        return _uvarint_encode(field << 3 | 2) + _uvarint_encode(len(payload)) + payload

    out = bytearray()
    for labels, samples in series:
        ts_body = bytearray()
        for ln, lv in labels.items():
            ts_body += ld(
                1, ld(1, ln.encode("utf-8")) + ld(2, lv.encode("utf-8"))
            )
        for ts, val in samples:
            s = (
                _uvarint_encode(1 << 3 | 1)
                + struct.pack("<d", val)
                + _uvarint_encode(2 << 3 | 0)
                + _uvarint_encode(ts & ((1 << 64) - 1))
            )
            ts_body += ld(2, s)
        out += ld(1, bytes(ts_body))
    for md in metadata or []:
        m = bytearray()
        if md.get("type"):
            m += _uvarint_encode(1 << 3 | 0) + _uvarint_encode(int(md["type"]))
        m += ld(2, md.get("metric_family_name", "").encode("utf-8"))
        if md.get("help"):
            m += ld(4, md["help"].encode("utf-8"))
        if md.get("unit"):
            m += ld(5, md["unit"].encode("utf-8"))
        out += ld(3, bytes(m))
    body = bytes(out)
    return snappy_compress(body) if compress else body


# ------------------------------------------------------------- Spark
def remote_write_to_samples(
    payloads: DataFrame, col: str = "payload", compressed: bool = True
) -> DataFrame:
    """DataFrame of remote-write bodies (binary column) → canonical
    samples. Decode is Arrow-batched via mapInPandas; each payload's
    samples are emitted independently so partitioning follows the input
    (one task per payload batch — no shuffle)."""
    import pandas as pd

    from pyspark.sql import functions as F
    from pyspark.sql.types import StructField, StructType

    src = payloads.select(col)

    def _decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for blob in pdf[col]:
                if blob is None:
                    continue
                for name, labels, ts, val in decode_write_request(
                    bytes(blob), compressed=compressed
                ):
                    rows.append((name, labels, ts, val, is_stale_nan(val)))
            yield pd.DataFrame(
                rows, columns=["name", "labels", "ts", "value", "is_stale"]
            )

    # Arrow turns NaN into NULL at the pandas->JVM crossing, so the
    # transfer schema must be nullable and the NaN restored JVM-side —
    # otherwise a Prometheus staleness marker (a NaN by definition)
    # kills the decode with 'Value at index is null'.
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

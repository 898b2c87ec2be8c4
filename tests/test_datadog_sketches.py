"""Datadog DDSketch ingestion tests.

Quantile vectors ported from the reference's own test
(lib/protoparser/datadogsketches/parser_test.go:8-31)."""

import pytest

from victoriametrics_spark.streaming.datadogsketches import (
    decode_sketch_payload,
    encode_sketch_payload,
    sketch_quantile,
    sketch_to_summary,
    sketches_to_samples,
)

_N = [0x0, 0x0, 0x1, 0x0, 0x1, 0x4, 0x6, 0x1, 0x2, 0x0, 0x1, 0x0, 0x1]
_K = [0, 1472, 1473, 1479, 1480, 1503, 1504, 1512, 1513, 1514, 1515, 1531, 1532]


@pytest.mark.parametrize(
    "q,expected",
    [
        (0, 8),
        (0.1, 12.91),
        (0.5, 13.18),
        (0.75, 14.84),
        (0.9, 15.19),
        (0.95, 15.55),
        (0.99, 20.24),
        (1, 21),
    ],
)
def test_quantile_reference_vectors(q, expected):
    v = sketch_quantile(q, 17, 8.0, 21.0, _K, _N)
    assert abs(v - expected) <= 0.01


def _sample_sketch():
    return {
        "metric": "test_metric",
        "host": "h1",
        "tags": ["key1:value1", "key2:value2"],
        "dogs": [
            {
                "ts": 1700000000,
                "cnt": 17,
                "min": 8.0,
                "max": 21.0,
                "sum": 230.0,
                "k": _K,
                "n": _N,
            }
        ],
    }


def test_roundtrip_and_summary():
    body = encode_sketch_payload([_sample_sketch()])
    decoded = decode_sketch_payload(body)
    assert len(decoded) == 1
    s = decoded[0]
    assert s["metric"] == "test_metric" and s["host"] == "h1"
    assert s["dogs"][0]["k"] == _K and s["dogs"][0]["n"] == _N
    assert s["dogs"][0]["sum"] == 230.0

    rows = list(sketch_to_summary(s))
    # 5 quantiles + sum/count/min/max per dogsketch (parser.go RowsCount+2)
    assert len(rows) == 9
    by_name = {}
    for name, labels, ts, val in rows:
        assert ts == 1700000000 * 1000
        assert labels.get("key1") == "value1"
        assert labels.get("host") == "h1"
        by_name.setdefault(name, []).append((labels, val))
    assert by_name["test_metric.count"][0][1] == 17.0
    assert by_name["test_metric.max"][0][1] == 21.0
    quantile_labels = {
        lbl["quantile"] for lbl, _ in by_name["test_metric"]
    }
    assert quantile_labels == {"0.5", "0.75", "0.9", "0.95", "0.99"}
    med = next(
        v for lbl, v in by_name["test_metric"] if lbl["quantile"] == "0.5"
    )
    assert abs(med - 13.18) <= 0.01


def test_negative_bucket_keys_roundtrip():
    sk = _sample_sketch()
    sk["dogs"][0]["k"] = [-1473, 0, 1473]
    sk["dogs"][0]["n"] = [5, 2, 10]
    body = encode_sketch_payload([sk])
    out = decode_sketch_payload(body)[0]
    assert out["dogs"][0]["k"] == [-1473, 0, 1473]


def test_sketches_to_samples_spark(spark):
    body = encode_sketch_payload([_sample_sketch()])
    df = spark.createDataFrame([(body,)], "body binary")
    out = sketches_to_samples(df)
    rows = out.collect()
    assert len(rows) == 9
    med = [
        r for r in rows
        if r["name"] == "test_metric"
        and r["labels"]["quantile"] == "0.5"
    ]
    assert len(med) == 1 and abs(med[0]["value"] - 13.18) <= 0.01
    assert med[0]["ts"] == 1700000000000

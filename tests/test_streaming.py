"""Ingestion parsers + relabel DSL tests (SURVEY.md §2.1, §2.10)."""
from __future__ import annotations

import pytest

from victoriametrics_spark.streaming.parsers import (
    parse_csv_import,
    parse_graphite,
    parse_influx,
    parse_prometheus_text,
    parse_vm_jsonl,
    to_vm_jsonl,
)
from victoriametrics_spark.streaming.relabel import relabel


def _lines(spark, rows):
    return spark.createDataFrame([(r,) for r in rows], "value string")


def test_parse_graphite(spark):
    out = parse_graphite(
        _lines(
            spark,
            [
                "foo.bar;dc=east;host=h1 42.5 1700000000",
                "plain.metric 1 1700000001",
            ],
        )
    ).collect()
    by_name = {r["name"]: r for r in out}
    assert by_name["foo.bar"]["labels"] == {"dc": "east", "host": "h1"}
    assert by_name["foo.bar"]["value"] == 42.5
    assert by_name["foo.bar"]["ts"] == 1700000000000
    assert by_name["plain.metric"]["labels"] == {}


def test_parse_influx_multi_field(spark):
    out = parse_influx(
        _lines(spark, ["cpu,host=h1,dc=west usage=0.5,idle=99i 1700000000123456789"])
    ).collect()
    by_name = {r["name"]: r for r in out}
    assert set(by_name) == {"cpu_usage", "cpu_idle"}
    assert by_name["cpu_idle"]["value"] == 99.0
    assert by_name["cpu_usage"]["labels"] == {"host": "h1", "dc": "west"}
    assert by_name["cpu_usage"]["ts"] == 1700000000123


def test_parse_prometheus_text(spark):
    out = parse_prometheus_text(
        _lines(
            spark,
            [
                "# HELP http_requests_total count",
                "# TYPE http_requests_total counter",
                'http_requests_total{job="api",code="200"} 1027 1700000000000',
                "process_cpu_seconds 12.5",
                "",
            ],
        ),
        default_ts_ms=1700000099000,
    ).collect()
    by_name = {r["name"]: r for r in out}
    assert by_name["http_requests_total"]["labels"] == {"job": "api", "code": "200"}
    assert by_name["http_requests_total"]["value"] == 1027.0
    assert by_name["process_cpu_seconds"]["ts"] == 1700000099000


def test_vm_jsonl_round_trip(spark):
    line = (
        '{"metric":{"__name__":"m1","job":"j"},'
        '"values":[1.5,2.5],"timestamps":[1700000000000,1700000060000]}'
    )
    samples = parse_vm_jsonl(_lines(spark, [line]))
    rows = samples.orderBy("ts").collect()
    assert [r["value"] for r in rows] == [1.5, 2.5]
    assert rows[0]["labels"] == {"job": "j"}
    # export → re-import is identity
    back = parse_vm_jsonl(to_vm_jsonl(samples)).orderBy("ts").collect()
    assert [(r["name"], r["ts"], r["value"]) for r in back] == [
        ("m1", 1700000000000, 1.5),
        ("m1", 1700000060000, 2.5),
    ]


def test_parse_csv_import(spark):
    df = spark.createDataFrame(
        [("h1", 1.0, 2.0, 1700000000000)],
        "host string, temp double, hum double, ts long",
    )
    out = parse_csv_import(
        df,
        [(1, "label:host"), (2, "metric:temperature"), (3, "metric:humidity")],
        ts_col=4,
    ).collect()
    by_name = {r["name"]: r for r in out}
    assert by_name["temperature"]["value"] == 1.0
    assert by_name["humidity"]["labels"] == {"host": "h1"}


@pytest.fixture()
def sample_df(spark):
    return spark.createDataFrame(
        [
            ("up", {"job": "api", "instance": "h1:9090"}, 1700000000000, 1.0, False),
            ("up", {"job": "db", "instance": "h2:9090"}, 1700000000000, 0.0, False),
        ],
        "name string, labels map<string,string>, ts long, value double, is_stale boolean",
    )


def test_relabel_replace_and_keep(spark, sample_df):
    out = relabel(
        sample_df,
        [
            {"action": "keep", "source_labels": ["job"], "regex": "api"},
            {
                "action": "replace",
                "source_labels": ["instance"],
                "regex": "([^:]+):.*",
                "target_label": "host",
                "replacement": "$1",
            },
        ],
    ).collect()
    assert len(out) == 1
    assert out[0]["labels"]["host"] == "h1"


def test_relabel_hashmod_labeldrop(spark, sample_df):
    out = relabel(
        sample_df,
        [
            {
                "action": "hashmod",
                "source_labels": ["job"],
                "modulus": 4,
                "target_label": "shard",
            },
            {"action": "labeldrop", "regex": "instance"},
        ],
    ).collect()
    for r in out:
        assert "instance" not in r["labels"]
        assert int(r["labels"]["shard"]) in range(4)


def test_relabel_labelmap(spark, sample_df):
    out = relabel(
        sample_df,
        [
            {
                "action": "labelmap",
                "regex": "job",
                "replacement": "service",
            }
        ],
    ).collect()
    for r in out:
        assert r["labels"]["service"] == r["labels"]["job"]


def test_relabel_drop_metrics(spark, sample_df):
    renamed = relabel(
        sample_df,
        [
            {
                "action": "replace",
                "source_labels": ["job"],
                "target_label": "__name__",
                "regex": "(.+)",
                "replacement": "up_$1",
            }
        ],
    )
    out = relabel(renamed, [{"action": "drop_metrics", "regex": "up_db"}]).collect()
    assert [r["name"] for r in out] == ["up_api"]

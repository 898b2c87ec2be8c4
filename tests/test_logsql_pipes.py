"""LogsQL pipe combinator tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from victoriametrics_spark.logsql import pipes
from victoriametrics_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def test_stats_no_group(events):
    out = pipes.stats(events, by=[], aggs={"n": F.count("*")}).collect()
    assert out[0]["n"] == events.count()


def test_top_deterministic(events):
    out = pipes.top(events, ["event_type"], 2).collect()
    assert len(out) == 2
    assert out[0]["hits"] >= out[1]["hits"]


def test_unpack_json(events):
    out = pipes.unpack_json(events.limit(5), "props", ["k"]).collect()
    assert all(r["k"] is not None for r in out)


def test_extract_regexp(spark):
    df = spark.createDataFrame([("dur=150ms code=200",)], ["msg"])
    out = pipes.extract_regexp(
        df, "msg", r"dur=(\d+)ms code=(\d+)", {"dur": 1, "code": 2}
    ).collect()[0]
    assert out["dur"] == "150" and out["code"] == "200"


def test_unroll(spark):
    df = spark.createDataFrame([(1, [10, 20])], ["id", "xs"])
    out = pipes.unroll(df, "xs", "x").collect()
    assert sorted(r["x"] for r in out) == [10, 20]


def test_first_last(events):
    f = pipes.first(events, ["event_type"], [("ts", False), ("event_id", False)])
    l = pipes.last(events, ["event_type"], [("ts", False), ("event_id", False)])
    ff = {r["event_type"]: r["ts"] for r in f.collect()}
    ll = {r["event_type"]: r["ts"] for r in l.collect()}
    assert all(ff[k] <= ll[k] for k in ff)


def test_filters(spark):
    df = spark.createDataFrame(
        [("error: disk full on node-3",), ("ok: all good",)], ["msg"]
    )
    c = F.col("msg")
    assert df.filter(pipes.phrase_filter(c, "disk full")).count() == 1
    assert df.filter(pipes.prefix_filter(c, "error")).count() == 1
    assert df.filter(pipes.sequence_filter(c, ["error", "node-3"])).count() == 1
    assert df.filter(pipes.in_filter(c, ["ok: all good"])).count() == 1


def test_join_prefix(spark):
    a = spark.createDataFrame([(1, "x")], ["k", "v"])
    b = spark.createDataFrame([(1, "y")], ["k", "w"])
    out = pipes.join(a, b, ["k"], prefix="sub_").collect()[0]
    assert out["sub_w"] == "y"

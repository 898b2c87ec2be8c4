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


# ---------------------------------------------------------------- round 3:
# extended pipes/stats/filters
from victoriametrics_spark.logsql.pipes import (  # noqa: E402
    STATS_FUNCS,
    copy_fields,
    decolorize,
    delete_fields,
    exact_filter,
    extract,
    fields_pipe,
    format_pipe,
    hash_pipe,
    ipv4_range_filter,
    len_pipe,
    pack_json,
    rename_fields,
    replace_pipe,
    row_max,
    row_min,
    sample,
    split,
    total_stats,
    unpack_logfmt,
    word_filter,
)


@pytest.fixture(scope="module")
def logs(spark):
    rows = [
        (1, "GET /api 200 ip=10.0.0.5 user=alice dur=12ms", "10.0.0.5", 12),
        (2, "POST /db 500 ip=10.0.1.9 user=bob dur=340ms", "10.0.1.9", 340),
        (3, 'level=error msg="disk full" host=web1', "192.168.1.1", 7),
    ]
    return spark.createDataFrame(rows, "id long, msg string, ip string, dur long")


def test_extract_pattern(spark, logs):
    out = extract(logs, "msg", "ip=<ipf> user=<userf> dur=<durf>ms")
    got = {r["id"]: (r["ipf"], r["userf"], r["durf"]) for r in out.collect()}
    assert got[1] == ("10.0.0.5", "alice", "12")
    assert got[2] == ("10.0.1.9", "bob", "340")
    assert got[3] == ("", "", "")  # no match → empty


def test_unpack_logfmt(spark, logs):
    out = unpack_logfmt(logs.filter("id = 3"), "msg", ["level", "msg2", "host"])
    r = out.collect()[0]
    assert r["level"] == "error" and r["host"] == "web1"
    out2 = unpack_logfmt(logs.filter("id = 3"), "msg", ["msg"])
    # quoted value wins
    assert out2.collect()[0]["msg"] == "disk full"


def test_pack_split_len_hash_format(spark, logs):
    out = pack_json(logs, ["id", "ip"], "j")
    import json as _json

    j = _json.loads(out.filter("id=1").collect()[0]["j"])
    assert j == {"id": 1, "ip": "10.0.0.5"}

    sp = split(logs, "msg", " ", "words")
    assert sp.filter("id=1").collect()[0]["words"][0] == "GET"

    ln = len_pipe(logs, "ip", "iplen")
    assert ln.filter("id=3").collect()[0]["iplen"] == len("192.168.1.1")

    h = hash_pipe(logs, "ip")
    vals = [r["hash"] for r in h.collect()]
    assert len(set(vals)) == 3

    f = format_pipe(logs, "req <id> from <ip>", "out")
    assert f.filter("id=1").collect()[0]["out"] == "req 1 from 10.0.0.5"


def test_replace_decolorize_fieldops(spark):
    df = spark.createDataFrame(
        [("x", "\x1b[31mred\x1b[0m text", 1)], "a string, msg string, n long"
    )
    assert decolorize(df, "msg").collect()[0]["msg"] == "red text"
    assert (
        replace_pipe(df, "msg", "text", "TEXT").collect()[0]["msg"]
        == "\x1b[31mred\x1b[0m TEXT"
    )
    assert replace_pipe(df, "msg", r"\x1b\[[0-9;]*m", "", regex=True).collect()[
        0
    ]["msg"] == "red text"
    c = copy_fields(df, [("a", "b")]).collect()[0]
    assert c["b"] == "x"
    r = rename_fields(df, [("a", "z")])
    assert "z" in r.columns and "a" not in r.columns
    assert delete_fields(df, ["msg"]).columns == ["a", "n"]
    assert fields_pipe(df, ["n"]).columns == ["n"]


def test_row_min_max_and_stats_funcs(spark, logs):
    from victoriametrics_spark.logsql import pipes

    out = pipes.stats(
        logs,
        by=[],
        aggs={
            "slowest": row_max("dur", "id", "ip"),
            "fastest": row_min("dur", "id", "ip"),
            "n_ips": STATS_FUNCS["count_uniq"](F.col("ip")),
            "total_len": STATS_FUNCS["sum_len"](F.col("msg")),
        },
    ).collect()[0]
    assert out["slowest"]["id"] == 2
    assert out["fastest"]["id"] == 3
    assert out["n_ips"] == 3.0


def test_total_stats_and_sample(spark, logs):
    t = total_stats(
        logs, order=[("id", False)], aggs={"cum_dur": F.sum("dur")}
    ).collect()
    assert [r["cum_dur"] for r in sorted(t, key=lambda r: r["id"])] == [
        12,
        352,
        359,
    ]
    s = sample(logs, 0.5, seed=3)
    assert 0 <= s.count() <= 3


def test_filters(spark, logs):
    assert logs.filter(exact_filter(F.col("ip"), "10.0.0.5")).count() == 1
    assert logs.filter(word_filter(F.col("msg"), "alice")).count() == 1
    assert logs.filter(word_filter(F.col("msg"), "alic")).count() == 0
    got = logs.filter(
        ipv4_range_filter(F.col("ip"), "10.0.0.0", "10.0.255.255")
    ).count()
    assert got == 2

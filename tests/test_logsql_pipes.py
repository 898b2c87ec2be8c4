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


# ------------------------------------------------------------------ round 6


def test_filter_and_replace_regexp(spark):
    df = spark.createDataFrame(
        [("a=1 a=2 a=3", 1), ("b=9", 2)], ["msg", "id"]
    )
    out = pipes.filter_pipe(df, F.col("id") == 1)
    assert out.count() == 1
    rr = pipes.replace_regexp_pipe(out, "msg", r"a=\d", "a=X").collect()[0]
    assert rr["msg"] == "a=X a=X a=X"
    lim = pipes.replace_regexp_pipe(df, "msg", r"a=\d", "a=X", limit=2)
    assert lim.filter(F.col("id") == 1).collect()[0]["msg"] == "a=X a=X a=3"


def test_unpack_syslog(spark):
    df = spark.createDataFrame(
        [
            ("<165>1 2024-01-01T12:00:00Z host1 app1 1234 ID47 - boom",),
            ("<34>Oct 11 22:14:15 mymachine su[230]: 'su root' failed",),
            ("not syslog at all",),
        ],
        ["msg"],
    )
    rows = pipes.unpack_syslog(df, "msg").collect()
    r5424, r3164, bad = rows
    assert (r5424["priority"], r5424["facility"], r5424["severity"]) == (165, 20, 5)
    assert r5424["hostname"] == "host1" and r5424["app_name"] == "app1"
    assert r5424["message"] == "boom"
    assert (r3164["priority"], r3164["hostname"], r3164["app_name"]) == (
        34, "mymachine", "su",
    )
    assert r3164["proc_id"] == "230" and r3164["message"] == "'su root' failed"
    assert bad["priority"] is None


def test_unpack_words_and_pack_logfmt(spark):
    df = spark.createDataFrame([("foo bar, foo-baz bar",)], ["msg"])
    out = pipes.unpack_words(df, "msg", "words").collect()[0]
    assert out["words"] == ["foo", "bar", "foo", "baz", "bar"]
    dd = pipes.unpack_words(df, "msg", "words", drop_duplicates=True).collect()[0]
    assert dd["words"] == ["foo", "bar", "baz"]

    df2 = spark.createDataFrame(
        [("v1", 'say "hi"', None)], "a string, b string, c string"
    )
    lf = pipes.pack_logfmt(df2, ["a", "b", "c"]).collect()[0]
    assert lf["logfmt"] == 'a=v1 b="say \\"hi\\"" c=""'


def test_union_coalesce_dropempty(spark):
    a = spark.createDataFrame([(1, "x")], ["id", "a"])
    b = spark.createDataFrame([(2, "y")], ["id", "b"])
    u = pipes.union_pipe(a, b)
    assert u.count() == 2 and set(u.columns) == {"id", "a", "b"}

    df = spark.createDataFrame(
        [("", "fb", "d"), ("top", "", ""), ("", "", "")], ["f1", "f2", "f3"]
    )
    co = pipes.coalesce_pipe(df, ["f1", "f2"], "out", default="dflt")
    assert [r["out"] for r in co.collect()] == ["fb", "top", "dflt"]

    de = pipes.drop_empty_fields(
        spark.createDataFrame([("", "k"), ("", "")], ["dead", "alive"])
    )
    assert de.columns == ["alive"]
    assert [r["alive"] for r in de.collect()] == ["k", None]


def test_field_names_values_timeadd(spark):
    df = spark.createDataFrame(
        [("a", "", "2024-01-01 00:00:00"), ("b", "z", "2024-01-02 00:00:00")],
        ["x", "y", "t"],
    ).withColumn("t", F.col("t").cast("timestamp"))
    fn = {r["name"]: r["hits"] for r in pipes.field_names(df).collect()}
    assert fn == {"x": 2, "y": 1, "t": 2}
    fv = {r["value"]: r["hits"] for r in pipes.field_values(df, "x").collect()}
    assert fv == {"a": 1, "b": 1}
    ta = pipes.time_add(df, "t", 3600_000).collect()[0]
    assert str(ta["t"]) == "2024-01-01 01:00:00"


def test_collapse_json_seq(spark):
    df = spark.createDataFrame(
        [("req 0xdeadBEEF took 150ms id=42", '["a","b"]', '["c"]')],
        ["msg", "j1", "j2"],
    )
    c = pipes.collapse_nums(df, "msg").collect()[0]
    assert c["msg"] == "req <N> took <N>ms id=<N>"
    jl = pipes.json_array_len(df, "j1", "n").collect()[0]
    assert jl["n"] == 2
    # pipe_json_array_concat.go joins the elements of ONE array field
    jc = pipes.json_array_concat(df, "j1", "j", delimiter="-").collect()[0]
    assert jc["j"] == "a-b"
    jc2 = pipes.json_array_concat(df, "msg", "j2c").collect()[0]
    assert jc2["j2c"] == ""  # non-array value → empty string
    seq = pipes.generate_sequence(spark, 5)
    assert [r["seq"] for r in seq.collect()] == [0, 1, 2, 3, 4]


def test_stats_rate_and_json_values(spark):
    df = spark.createDataFrame([("g", 1.0), ("g", 3.0)], ["k", "v"])
    out = pipes.stats(
        df,
        by=["k"],
        aggs={
            "r": pipes.rate_stats(10.0)(F.col("v")),
            "rs": pipes.rate_sum_stats(2.0)(F.col("v")),
        },
    ).collect()[0]
    assert out["r"] == 0.2 and out["rs"] == 2.0
    jv = pipes.stats(
        df, by=["k"], aggs={"j": pipes.json_values("v", sort_by="v", limit=1)}
    ).collect()[0]
    assert jv["j"] == '[{"v":1.0}]'


def test_histogram_vmranges(spark):
    # Go-identical bucket strings: spot-check the known first range
    assert pipes.VMRANGE_LOWER == "0...1.000e-09"
    assert pipes.VMRANGES[0] == "1.000e-09...1.136e-09"
    df = spark.createDataFrame(
        [("g", v) for v in [0.5, 0.75, 1e-12, 1e20, -3.0, float("nan")]],
        ["k", "v"],
    )
    out = pipes.histogram_stats(df, ["k"], "v", "h").collect()[0]["h"]
    import json

    ents = json.loads(out)
    # negative + NaN ignored; 1e-12 → lower; 1e20 → upper; 0.5/0.75 in range
    assert ents[0] == {"vmrange": "0...1.000e-09", "hits": 1}
    assert ents[-1] == {"vmrange": "1.000e+18...+Inf", "hits": 1}
    assert sum(e["hits"] for e in ents) == 4
    # the exact-power-of-10 edge case: 1.0 goes to the bucket ENDING at 1
    one = pipes.histogram_stats(
        spark.createDataFrame([("g", 1.0)], ["k", "v"]), ["k"], "v", "h"
    ).collect()[0]["h"]
    assert json.loads(one)[0]["vmrange"].endswith("...1.000e+00")


def test_filter_tranche(spark):
    df = spark.createDataFrame(
        [
            ("ERROR Failed", "ERROR Failed", "10", "0", "1.5",
             "2024-01-01T06:30:00Z", "192.168.1.5"),
            ("warn ok", "other", "-3", "9", "x",
             "2024-01-06T23:00:00Z", "no-ip"),
        ],
        ["msg", "msg2", "num", "num2", "fl", "ts", "ip"],
    ).withColumn("t", F.to_timestamp(F.col("ts"), "yyyy-MM-dd'T'HH:mm:ssX"))
    f = lambda c: [r["msg"] for r in df.filter(c).collect()]
    assert f(pipes.any_case_phrase_filter(F.col("msg"), "error")) == ["ERROR Failed"]
    assert f(pipes.any_case_prefix_filter(F.col("msg"), "ERR")) == ["ERROR Failed"]
    assert f(pipes.exact_prefix_filter(F.col("msg"), "ERROR")) == ["ERROR Failed"]
    assert f(pipes.substring_filter(F.col("msg"), "ail")) == ["ERROR Failed"]
    assert f(pipes.contains_all_filter(F.col("msg"), ["ERROR", "Fail"])) == ["ERROR Failed"]
    assert len(f(pipes.contains_any_filter(F.col("msg"), ["ERROR", "ok"]))) == 2
    assert f(pipes.eq_field_filter(F.col("msg"), F.col("msg2"))) == ["ERROR Failed"]
    assert f(pipes.le_field_filter(F.col("num"), F.col("num2"))) == ["warn ok"]
    assert f(pipes.len_range_filter(F.col("msg"), 1, 8)) == ["warn ok"]
    assert f(pipes.string_range_filter(F.col("msg"), "A", "F")) == ["ERROR Failed"]
    assert f(pipes.value_type_filter(F.col("num"), "uint")) == ["ERROR Failed"]
    assert f(pipes.value_type_filter(F.col("num"), "int")) == ["warn ok"]
    assert f(pipes.value_type_filter(F.col("fl"), "float")) == ["ERROR Failed"]
    assert f(pipes.value_type_filter(F.col("ip"), "ipv4")) == ["ERROR Failed"]
    assert f(pipes.pattern_match_filter(F.col("msg"), "ERR*Fail*")) == ["ERROR Failed"]
    # 2024-01-01 is a Monday (dow=1); 2024-01-06 a Saturday (dow=6)
    assert f(pipes.week_range_filter(F.col("t"), 1, 5)) == ["ERROR Failed"]
    # time-of-day 06:30 = 23400000ms
    assert f(pipes.day_range_filter(F.col("t"), 6 * 3600000, 7 * 3600000)) == ["ERROR Failed"]


def test_set_stream_fields_and_context(spark):
    rows = [
        ("app1", "h1", i * 1000, f"line{i}") for i in range(10)
    ] + [("app2", "h2", i * 1000, f"other{i}") for i in range(5)]
    df = spark.createDataFrame(rows, "app string, host string, ts long, msg string")
    st = pipes.set_stream_fields(df, ["host", "app"])
    assert st.select("_stream").first()[0] == '{app="app1",host="h1"}'

    ctx = pipes.stream_context(
        st, F.col("msg") == "line5", before=2, after=1
    ).collect()
    got = sorted(r["msg"] for r in ctx)
    assert got == ["line3", "line4", "line5", "line6"]

    # stream filter over the canonical string
    flt = st.filter(
        pipes.stream_filter(F.col("_stream"), {"app": "app2", "host": "~h.*"})
    )
    assert flt.count() == 5
    # stream_id round-trips through the hash of the canonical string
    sid = st.filter(F.col("app") == "app2").select(
        F.xxhash64("_stream").alias("h")
    ).first()["h"]
    assert (
        st.filter(pipes.stream_id_filter(F.col("_stream"), [sid])).count() == 5
    )


def test_filter_combinators_and_misc(spark):
    df = spark.createDataFrame(
        [
            ("a", '["x","y"]', "2001:0db8:0000:0000:0000:0000:0000:0001", 1000),
            ("B", '["z"]', "2001:0db8:0000:0000:0000:0000:0000:ffff", 5000),
        ],
        "s string, j string, ip6 string, ts long",
    ).withColumn("t", F.timestamp_millis(F.col("ts")))
    f = lambda c: df.filter(c).count()
    assert f(pipes.and_filter(pipes.noop_filter(), F.col("s") == "a")) == 1
    assert f(pipes.or_filter(F.col("s") == "a", F.col("s") == "B")) == 2
    assert f(pipes.not_filter(F.col("s") == "a")) == 1
    assert f(pipes.time_filter(F.col("t"), 0, 2000)) == 1
    assert f(pipes.json_array_contains_any_filter(F.col("j"), ["y", "q"])) == 1
    assert f(pipes.contains_common_case_filter(F.col("s"), "b")) == 1
    assert f(pipes.equals_common_case_filter(F.col("s"), "b")) == 1
    assert (
        f(
            pipes.ipv6_range_filter(
                F.col("ip6"),
                "2001:db8::1",
                "2001:db8::00ff",
            )
        )
        == 1
    )


# ------------------------------------------------------------ token index
def test_token_skip_index(spark, tmp_path):
    from datetime import datetime

    from victoriametrics_spark.logsql import pipes
    from victoriametrics_spark.logsql.index import (
        build_token_index,
        pruned_scan,
        words_of,
    )
    from pyspark.sql import functions as F

    rows = []
    for d in range(1, 4):
        for app in ("web", "db"):
            for i in range(5):
                msg = f"req from {app} seq {i}" + (
                    " timeout failure" if (d == 2 and app == "db" and i == 3) else ""
                )
                rows.append((datetime(2024, 1, d, i), msg, app))
    logs = spark.createDataFrame(rows, ["_time", "_msg", "app"])
    logs = pipes.set_stream_fields(logs, ["app"])

    path = str(tmp_path / "tokidx")
    build_token_index(logs, path)

    assert words_of("timeout failure") == ["timeout", "failure"]

    scan = pruned_scan(spark, logs, path, "timeout failure")
    # only the (2024-01-02, app=db) bucket can match → 5 rows survive
    assert scan.count() == 5
    hits = scan.filter(pipes.word_filter(F.col("_msg"), "timeout"))
    assert hits.count() == 1

    # superset safety: pruned + filter ≡ full-scan filter
    full = logs.filter(pipes.word_filter(F.col("_msg"), "timeout")).collect()
    assert [tuple(r) for r in hits.collect()] == [tuple(r) for r in full]

    # broadcast semi-join in the plan (index side must never shuffle the scan)
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan

    # no-token phrase → no pruning
    assert pruned_scan(spark, logs, path, "???").count() == logs.count()
    # absent token → empty candidate set
    assert pruned_scan(spark, logs, path, "nosuchtoken").count() == 0


def test_logs_api_uses_token_index_by_default(spark, tmp_path):
    """LogsAPI with a token_index_path auto-builds the skip-index and
    every word-filtered query plan prunes the scan with the broadcast
    semi-join BEFORE the exact filter runs (logsql/index.py wiring)."""
    import os
    from datetime import datetime

    from victoriametrics_spark.api.http import LogsAPI
    from victoriametrics_spark.logsql import pipes

    rows = []
    for d in range(1, 4):
        for app in ("web", "db"):
            for i in range(5):
                msg = f"req from {app} seq {i}" + (
                    " timeout failure"
                    if (d == 2 and app == "db" and i == 3)
                    else ""
                )
                rows.append((datetime(2024, 1, d, i), msg, app))
    logs = spark.createDataFrame(rows, ["_time", "_msg", "app"])
    logs = pipes.set_stream_fields(logs, ["app"])

    path = str(tmp_path / "autoidx")
    api = LogsAPI(spark, logs, token_index_path=path)
    assert not os.path.isdir(path)
    df = api._run("timeout | stats count() as n")
    # first use built the index on disk
    assert os.path.isdir(path)
    assert df.collect()[0]["n"] == 1
    # the word-filter plan contains the pruning semi-join
    plan = api._run("timeout")._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    # queries without word filters skip the index entirely
    plan2 = api._run("app:web")._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" not in plan2
    # JSONL surface works end-to-end over the pruned scan
    lines = list(api.query("timeout failure", limit=10))
    assert len(lines) == 1 and "timeout failure" in lines[0]

"""LogsQL text front-end tests: lexer, filter grammar, pipe grammar, and
end-to-end compile+run against a small log frame.

Expected values mirror the vendored VictoriaLogs semantics
(logstorage/parser.go filter dispatch, pipe_*.go String() shapes)."""

from __future__ import annotations

from datetime import datetime

import pytest

from victoriametrics_spark.logsql.parser import (
    LogsQLError,
    parse_duration_ms,
    parse_query,
    run_logsql,
    tokenize,
)

ROWS = [
    # (_time, _msg, event_type, user_id, value, props, event_id)
    (datetime(2024, 1, 1, 0, 5), "error user=1 {\"k\": 3}", "error", 1, 10.0, '{"k": 3}', 0),
    (datetime(2024, 1, 1, 1, 0), "signup user=2 {\"k\": 5}", "signup", 2, 20.0, '{"k": 5}', 1),
    (datetime(2024, 1, 1, 2, 0), "error user=2 {\"k\": 7}", "error", 2, 30.0, '{"k": 7}', 2),
    (datetime(2024, 1, 2, 0, 0), "click user=3 {\"k\": 1}", "click", 3, 40.0, '{"k": 1}', 3),
    (datetime(2024, 1, 2, 3, 0), "error user=3 {\"k\": 9}", "error", 3, 50.0, '{"k": 9}', 4),
    (datetime(2024, 1, 3, 0, 0), "click user=1 {\"k\": 2}", "click", 1, 60.0, '{"k": 2}', 5),
]
COLS = ["_time", "_msg", "event_type", "user_id", "value", "props", "event_id"]


@pytest.fixture(scope="module")
def logs(spark):
    return spark.createDataFrame(ROWS, COLS)


def run(logs, q, **kw):
    return run_logsql(logs, q, **kw)


# ------------------------------------------------------------------- lexer
def test_tokenize_basics():
    toks = tokenize('foo:"bar baz"* | stats by (a) count() as n')
    vals = [t.val for t in toks]
    assert vals[:4] == ["foo", ":", "bar baz", "*"]
    assert "|" in vals and "stats" in vals and "(" in vals


def test_tokenize_punct2_and_escapes():
    toks = tokenize(r'a!~"x\"y" b!=c')
    assert [t.val for t in toks][:3] == ["a", "!~", 'x"y']


def test_tokenize_unterminated():
    with pytest.raises(LogsQLError):
        tokenize('"abc')


def test_parse_duration():
    assert parse_duration_ms("5m") == 300000
    assert parse_duration_ms("1h30m") == 5400000
    assert parse_duration_ms("-30s") == -30000
    with pytest.raises(LogsQLError):
        parse_duration_ms("5q")


# ----------------------------------------------------------------- filters
def test_word_filter(logs):
    assert run(logs, "error").count() == 3


def test_word_filter_on_field(logs):
    assert run(logs, "event_type:error").count() == 3


def test_phrase_filter(logs):
    assert run(logs, '"user=2"').count() == 2


def test_prefix_filter(logs):
    assert run(logs, "sign*").count() == 1


def test_and_or_not(logs):
    assert run(logs, "error user_id:2").count() == 1
    assert run(logs, "error OR signup").count() == 4
    assert run(logs, "!error").count() == 3
    assert run(logs, "-error").count() == 3
    assert run(logs, "not error").count() == 3
    assert run(logs, "(error OR click) user_id:1").count() == 2


def test_exact_and_regexp(logs):
    assert run(logs, 'event_type:="error"').count() == 3
    assert run(logs, 'event_type:!="error"').count() == 3
    assert run(logs, 'event_type:~"err|sign"').count() == 4
    assert run(logs, 'event_type:!~"err"').count() == 3
    assert run(logs, 'event_type:re("^e")').count() == 3


def test_cmp_and_range(logs):
    assert run(logs, "value:>30").count() == 3
    assert run(logs, "value:>=30").count() == 4
    assert run(logs, "value:<20").count() == 1
    assert run(logs, "value:range(10, 30]").count() == 2
    assert run(logs, "value:range[10, 30]").count() == 3


def test_in_filter(logs):
    assert run(logs, "user_id:in(1, 3)").count() == 4
    assert run(logs, 'event_type:in("error", "click")').count() == 5


def test_field_group(logs):
    assert run(logs, "event_type:(error OR click)").count() == 5


def test_seq_and_i(logs):
    assert run(logs, 'seq("error", "user")').count() == 3
    assert run(logs, 'event_type:i("ERROR")').count() == 3


def test_star_presence(logs):
    assert run(logs, "*").count() == 6
    assert run(logs, "props:*").count() == 6


def test_len_range_string_range(logs):
    assert run(logs, "event_type:len_range(6, 10)").count() == 1
    assert run(logs, 'event_type:string_range("click", "error")').count() == 2


def test_contains_filters(logs):
    assert run(logs, 'event_type:contains_any("err", "sign")').count() == 4
    assert run(logs, '_msg:contains_all("user", "error")').count() == 3


def test_value_type(logs):
    assert run(logs, 'props:value_type("string")').count() == 6
    assert run(logs, 'user_id:value_type("uint")').count() == 6


def test_time_range_filter(logs):
    q = "_time:[2024-01-01T00:00:00Z, 2024-01-02T00:00:00Z)"
    assert run(logs, q).count() == 3
    assert run(logs, "_time:>2024-01-02T00:00:00Z").count() == 2
    assert run(logs, "_time:2024-01-01").count() == 3
    assert run(logs, "_time:2024-01").count() == 6


def test_time_relative(logs):
    now_ms = int(datetime(2024, 1, 3, 1, 0).timestamp() * 1000)
    # naive UTC: the frame's datetimes are naive, anchor accordingly
    now_ms = int(
        (datetime(2024, 1, 3, 1, 0) - datetime(1970, 1, 1)).total_seconds() * 1000
    )
    assert run(logs, "_time:2d", now_ms=now_ms).count() == 5
    with pytest.raises(LogsQLError):
        run(logs, "_time:5m")


def test_eq_field(logs):
    assert run(logs, "user_id:eq_field(event_id)").count() == 2
    assert run(logs, "value:le_field(user_id)").count() == 0


def test_unknown_field_errors(logs):
    with pytest.raises(LogsQLError):
        run(logs, "nope:1").collect()


# ------------------------------------------------------------------- pipes
def test_stats_by(logs):
    rows = {
        r["event_type"]: (r["n"], r["s"])
        for r in run(
            logs,
            "* | stats by (event_type) count() as n, sum(value) as s",
        ).collect()
    }
    assert rows["error"] == (3, 90.0)
    assert rows["click"] == (2, 100.0)
    assert rows["signup"] == (1, 20.0)


def test_stats_no_keyword(logs):
    out = run(logs, "error | count() as n").collect()
    assert out[0]["n"] == 3


def test_stats_quantile_median(logs):
    r = run(logs, "* | stats quantile(0.5, value) as q, median(value) as m").collect()[0]
    assert r["q"] == r["m"] == 35.0


def test_stats_count_uniq(logs):
    r = run(logs, "* | stats count_uniq(user_id) as u").collect()[0]
    assert r["u"] == 3


def test_stats_rate(logs):
    q = "_time:[2024-01-01T00:00:00Z, 2024-01-02T00:00:00Z) | stats rate() as r"
    r = run(logs, q).collect()[0]
    assert r["r"] == pytest.approx(3 / 86400)


def test_sort_limit_offset(logs):
    out = run(logs, "* | sort by (value desc) limit 2 | fields event_id").collect()
    assert [r["event_id"] for r in out] == [5, 4]
    out = run(
        logs, "* | sort by (value desc, event_id) offset 2 limit 2 | fields event_id"
    ).collect()
    assert sorted(r["event_id"] for r in out) == [2, 3]


def test_sort_rank(logs):
    out = run(logs, "* | sort by (value desc) limit 3 rank as rnk").collect()
    assert [r["rnk"] for r in out] == [1, 2, 3]


def test_first_last(logs):
    out = run(logs, "* | first 2 by (value)").collect()
    assert sorted(r["event_id"] for r in out) == [0, 1]
    out = run(logs, "* | last by (value)").collect()
    assert [r["event_id"] for r in out] == [5]


def test_first_partition(logs):
    out = run(
        logs, "* | first 1 by (_time) partition by (event_type)"
    ).collect()
    assert sorted(r["event_id"] for r in out) == [0, 1, 3]


def test_limit_head_offset(logs):
    assert run(logs, "* | limit 3").count() == 3
    assert run(logs, "* | head 2").count() == 2


def test_fields_delete_copy_rename(logs):
    out = run(logs, "* | fields event_id, value")
    assert out.columns == ["event_id", "value"]
    out = run(logs, "* | delete props, _msg")
    assert "props" not in out.columns and "_msg" not in out.columns
    out = run(logs, "* | copy value as v2 | rename v2 as v3")
    assert "v3" in out.columns and "v2" not in out.columns


def test_filter_where_pipe(logs):
    assert run(logs, "* | filter value:>30").count() == 3
    assert run(logs, "* | where error").count() == 3
    # bare filter pipe without keyword
    assert run(logs, "* | value:>30").count() == 3


def test_math_pipe(logs):
    out = {
        r["event_id"]: r["v2"]
        for r in run(logs, "* | math (value * 2 + 1) as v2").collect()
    }
    assert out[0] == 21.0
    out = run(logs, "* | math abs(-3) as a, max(value, 45) as m | first 1 by (event_id)").collect()[0]
    assert out["a"] == 3.0 and out["m"] == 45.0
    out = run(logs, "* | eval (value % 3) as r | first 1 by (event_id)").collect()[0]
    assert out["r"] == 1.0


def test_format_pipe(logs):
    out = run(
        logs, '* | format "u<user_id>-<event_type>" as tag | first 1 by (event_id)'
    ).collect()[0]
    assert out["tag"] == "u1-error"


def test_extract_pipe(logs):
    out = run(
        logs, '* | extract "user=<uid> " from _msg | first 1 by (event_id)'
    ).collect()[0]
    assert out["uid"] == "1"


def test_extract_regexp_pipe(logs):
    out = run(
        logs,
        '* | extract_regexp "user=(?P<uid>[0-9]+)" from _msg | first 1 by (event_id)',
    ).collect()[0]
    assert out["uid"] == "1"


def test_unpack_json_pipe(logs):
    out = run(
        logs, "* | unpack_json from props fields (k) | first 1 by (event_id)"
    ).collect()[0]
    assert out["k"] == "3"
    with pytest.raises(LogsQLError):
        run(logs, "* | unpack_json from props")


def test_uniq_top(logs):
    assert run(logs, "* | uniq by (event_type)").count() == 3
    out = run(logs, "* | uniq by (event_type) with hits | sort by (event_type)").collect()
    assert [(r["event_type"], r["hits"]) for r in out] == [
        ("click", 2), ("error", 3), ("signup", 1),
    ]
    out = run(logs, "* | top 2 by (event_type)").collect()
    assert [r["event_type"] for r in out] == ["error", "click"]
    out = run(logs, "* | top 1 by (event_type) hits as h").collect()
    assert out[0]["h"] == 3


def test_len_hash_pipes(logs):
    out = run(logs, "* | len(event_type) as l | first 1 by (event_id)").collect()[0]
    assert out["l"] == 5
    out = run(logs, "* | hash(event_type) as h | first 1 by (event_id)").collect()[0]
    assert isinstance(out["h"], int)


def test_replace_split(logs):
    out = run(
        logs, '* | copy event_type as t | replace ("error", "err") at t | first 1 by (event_id)'
    ).collect()[0]
    assert out["t"] == "err"
    out = run(
        logs, '* | replace_regexp ("[0-9]+", "N") at props | first 1 by (event_id)'
    ).collect()[0]
    assert out["props"] == '{"k": N}'
    out = run(logs, '* | split ("=") from _msg as parts | first 1 by (event_id)').collect()[0]
    assert len(out["parts"]) == 2


def test_unpack_words_unroll(logs):
    out = run(
        logs,
        "* | unpack_words from event_type as w | unroll by (w) | stats count() as n",
    ).collect()[0]
    assert out["n"] == 6


def test_pack_json_logfmt(logs):
    out = run(
        logs, "* | pack_json fields (event_type, user_id) as j | first 1 by (event_id)"
    ).collect()[0]
    assert '"event_type":"error"' in out["j"]
    out = run(
        logs, "* | pack_logfmt fields (event_type) as lf | first 1 by (event_id)"
    ).collect()[0]
    assert out["lf"] == "event_type=error"


def test_time_add(logs):
    out = run(logs, "* | time_add 1h | first 1 by (event_id)").collect()[0]
    assert out["_time"] == datetime(2024, 1, 1, 1, 5)
    out = run(logs, "* | time_add -1h | first 1 by (event_id)").collect()[0]
    assert out["_time"] == datetime(2023, 12, 31, 23, 5)


def test_field_values_names(logs):
    out = run(logs, "* | field_values event_type").collect()
    assert {(r["value"], r["hits"]) for r in out} == {
        ("error", 3), ("click", 2), ("signup", 1),
    }
    out = run(logs, "* | field_names")
    assert set(out.columns) == {"name", "hits"}


def test_union_join(logs):
    assert run(logs, "error | union (signup)").count() == 4
    out = run(
        logs,
        "* | uniq by (user_id) | join by (user_id) (error | stats by (user_id) count() as errs)",
    ).collect()
    errs = {r["user_id"]: r["errs"] for r in out}
    assert errs[1] == 1 and errs[2] == 1 and errs[3] == 1


def test_sample_drop_empty(logs):
    assert run(logs, "* | sample 1").count() == 6
    assert "drop_empty_fields" in [p[0] for p in parse_query("* | drop_empty_fields").pipes]


def test_json_array_len(logs):
    out = run(
        logs,
        '* | copy props as arr | replace_regexp ("\\\\{\\"k\\": ([0-9]+)\\\\}", "[$1]") at arr '
        "| json_array_len(arr) as n | first 1 by (event_id)",
    ).collect()[0]
    assert out["n"] == 1


def test_stream_filter(logs):
    assert run(logs, '_stream:{event_type="error"}').count() == 3
    assert run(logs, '_stream:{event_type=~"err.*"}').count() == 3
    assert run(logs, '_stream:{event_type!="error"}').count() == 3


def test_histogram_stats_pipe(logs):
    out = run(logs, "* | stats histogram(value) as h").collect()[0]
    assert out["h"].startswith('[{"vmrange"')


def test_errors(logs):
    with pytest.raises(LogsQLError):
        parse_query("* | nosuchpipe zz ()")
    with pytest.raises(LogsQLError):
        parse_query("* | stats by (a) nosuchfunc(x)")
    with pytest.raises(LogsQLError):
        run(logs, "* | stats rate() as r")  # no time range


def test_day_week_range(logs):
    assert run(logs, "_time:day_range[00:00, 01:30]").count() == 4
    assert run(logs, "_time:week_range[Mon, Tue]").count() == 5


def test_running_total_stats(logs):
    out = run(
        logs,
        "* | running_stats by (event_type) sum(value) as cum "
        "| filter event_type:error | fields event_id, cum",
    ).collect()
    cums = {r["event_id"]: r["cum"] for r in out}
    assert cums[0] == 10.0 and cums[2] == 40.0 and cums[4] == 90.0
    out = run(logs, "* | total_stats count() as seen | fields event_id, seen").collect()
    assert {r["event_id"]: r["seen"] for r in out}[5] == 6


def test_stream_context(logs):
    # error at 2024-01-01 02:00 (event_id 2) with 1 line of context
    out = run(logs, "user_id:2 event_type:error | stream_context before 1 after 1")
    ids = sorted(r["event_id"] for r in out.collect())
    assert ids == [1, 2, 3]
    out = run(
        logs,
        "event_type:error user_id:3 | set_stream_fields (event_type) "
        "| stream_context before 1",
    )
    ids = sorted(r["event_id"] for r in out.collect())
    assert ids == [2, 4]
    with pytest.raises(LogsQLError):
        run(logs, "* | limit 5 | stream_context after 1")


def test_generate_sequence(logs):
    out = run(logs, "* | limit 1 | generate_sequence 5")
    assert out.count() == 5


def test_stats_if_condition(logs):
    out = run(
        logs,
        "* | stats by (user_id) count() if (error) as errs, "
        "sum(value) if (event_type:click) as click_v, count() as n "
        "| sort by (user_id)",
    ).collect()
    rows = {r["user_id"]: (r["errs"], r["click_v"], r["n"]) for r in out}
    assert rows[1] == (1, 60.0, 2)
    assert rows[2] == (1, None, 2)
    assert rows[3] == (1, 40.0, 2)


def test_options_prefix(logs):
    out = run(
        logs,
        'options(concurrency=4, ignore_global_time_filter=true) error '
        "| stats count() as n",
    ).collect()
    assert out[0]["n"] == 3
    out = run(
        logs, "options(global_filter=(user_id:in(1,2))) error | stats count() as n"
    ).collect()
    assert out[0]["n"] == 2
    now_ms = int(
        (datetime(2024, 1, 3, 1, 0) - datetime(1970, 1, 1)).total_seconds() * 1000
    )
    base = run(logs, "_time:1d | stats count() as n", now_ms=now_ms).collect()[0]["n"]
    shifted = run(
        logs, "options(time_offset=-1d) _time:1d | stats count() as n", now_ms=now_ms
    ).collect()[0]["n"]
    assert (base, shifted) == (2, 3)


def test_stream_id_filter(logs):
    from pyspark.sql import functions as F

    with pytest.raises(LogsQLError):
        run(logs, "_stream_id:in(1, 2)").collect()
    streamed = run(logs, "* | set_stream_fields (event_type)")
    sid = streamed.filter(F.col("event_type") == "error").select(
        F.xxhash64("_stream")
    ).first()[0]
    out = run_logsql(streamed, f"_stream_id:{sid}")
    assert out.count() == 3


PARSE_MATRIX = [
    # filters
    'foo bar',
    '"exact phrase" AND other*',
    'f1:v1 OR (f2:v2 f3:!~"re.*")',
    '_time:[2024-01-01, 2024-02-01) _stream:{app="web",env=~"prod.*"}',
    'ip:ipv4_range(127.0.0.1, 127.0.0.255) port:range[1000, 2000)',
    'lvl:in(error, warn, "fatal error") msg:seq("a", "b")',
    'f:i(CaseLess) g:exact("x")* h:len_range(1, 10)',
    'a:>10 b:>=-5 c:<1.5 d:<=1e3 e:=exactv f:!=other',
    'value:value_type("float") s:string_range(a, z)',
    '_time:day_range[08:00, 18:00] OR _time:week_range[Mon, Fri]',
    'msg:contains_all("x", "y") msg:contains_any("p", "q")',
    'not (a:1 or b:2) -c:3 !d:4',
    # pipes
    '* | stats by (a, b) count() as c, sum(x) as s, quantile(0.99, y) as q',
    '* | count_uniq(ip) as ips',
    '* | stats count() if (a:error) as errs, avg(v) as m',
    '* | sort by (a desc, b) limit 10 offset 5',
    '* | order by (a) desc rank as r',
    '* | first 5 by (ts) partition by (host)',
    '* | last 3 by (v)',
    '* | fields a, b | copy a as a2 | rename b as b2 | delete a2',
    '* | filter a:>1 | where b:2',
    '* | math (a + b * 2) as s, abs(a - b) as d, round(a / 3) as r',
    '* | math (a ^ 2 + max(b, c)) as p',
    '* | format "pre<f1>mid<f2>post" as out',
    '* | extract "ip=<ip> port=<port>" from _msg',
    '* | extract_regexp "(?P<year>[0-9]{4})" from _msg',
    '* | unpack_json from j fields (k1, k2) result_prefix p_',
    '* | unpack_logfmt from lf fields (a, b)',
    '* | unpack_syslog from raw',
    '* | unpack_words from txt as words drop_duplicates',
    '* | uniq by (a, b) with hits limit 100',
    '* | top 7 by (k) hits as freq',
    '* | len(_msg) as l | hash(_msg) as h',
    '* | unroll by (arr)',
    '* | replace ("a", "b") at f limit 2 | replace_regexp ("x+", "y") at g',
    '* | split (",") from csv as parts',
    '* | sample 10',
    '* | time_add 1h30m at _time',
    '* | field_values k limit 5',
    '* | facets 15',
    '* | collapse_nums at m | decolorize m',
    '* | pack_json fields (a, b) as j | pack_logfmt fields (c) as lf',
    'error | union (warning | limit 10)',
    '* | join by (id) (other:1 | stats by (id) count() as n) inner prefix sub_',
    '* | drop_empty_fields | field_names',
    '* | running_stats by (g) sum(v) as cum',
    '* | total_stats count() as seen',
    'error | stream_context before 3 after 2 time_window 1h',
    '* | set_stream_fields (host, app) | stream_context after 1',
    '* | offset 10 | head 5',
    '* | json_array_len(arr) as n',
    '* | generate_sequence 100',
    '* | blocks_count',
    '* | block_stats',
]


def test_parse_matrix():
    for q in PARSE_MATRIX:
        parse_query(q)  # must not raise


PARSE_ERRORS = [
    '"unterminated',
    'a:range(1',
    '* | stats by (a count() as c',
    '(a or b',
    '* | sort by (a) limit x',
    '* | math a + as b',
    'f:>notanumber',
    '* | stats unknown_func(x) as y',
    'options(concurrency=4 error',
]


def test_parse_matrix_errors():
    for q in PARSE_ERRORS:
        with pytest.raises((LogsQLError, ValueError)):
            parse_query(q)


def test_stats_by_time_bucket(logs):
    out = run(
        logs, "* | stats by (_time:1d) count() as n | sort by (_time)"
    ).collect()
    assert [(r["_time"], r["n"]) for r in out] == [
        (datetime(2024, 1, 1), 3),
        (datetime(2024, 1, 2), 2),
        (datetime(2024, 1, 3), 1),
    ]


def test_stats_by_numeric_bucket(logs):
    out = run(
        logs, "* | stats by (value:25) count() as n | sort by (value)"
    ).collect()
    # values 10,20 | 30,40 | 50,60 → buckets 0, 25, 50
    assert [(r["value"], r["n"]) for r in out] == [
        (0.0, 2), (25.0, 2), (50.0, 2),
    ]


def test_stats_by_bucket_offset(logs):
    out = run(
        logs, "* | stats by (value:25 offset 10) count() as n | sort by (value)"
    ).collect()
    got = {r["value"]: r["n"] for r in out}
    # buckets anchored at 10: [10,35)x{10,20,30} [35,60)x{40,50} [60,85)x{60}
    assert got == {10.0: 3, 35.0: 2, 60.0: 1}


def test_stats_rate_in_time_bucket(logs):
    out = run(
        logs, "* | stats by (_time:1d) rate() as r | sort by (_time)"
    ).collect()
    assert out[0]["r"] == pytest.approx(3 / 86400)


def test_run_logsql_with_token_index(spark, tmp_path, logs):
    from victoriametrics_spark.logsql import pipes
    from victoriametrics_spark.logsql.index import build_token_index

    streamed = pipes.set_stream_fields(logs, ["event_type"])
    path = str(tmp_path / "qidx")
    build_token_index(streamed, path)

    # pruned path must equal unpruned for a word filter on the AND spine
    plain = run_logsql(streamed, "error user_id:2 | stats count() as n").collect()
    pruned = run_logsql(
        streamed,
        "error user_id:2 | stats count() as n",
        token_index_path=path,
    ).collect()
    assert plain == pruned
    # OR at top level → no pruning terms, still correct
    assert (
        run_logsql(streamed, "error OR signup | stats count() as n",
                   token_index_path=path).collect()[0]["n"] == 4
    )


def test_block_stats_pipe(spark, tmp_path):
    """block_stats over a stored logs table: one row per (file,
    row-group, column) from the parquet footers, with real sizes and
    row counts (pipe_block_stats.go analog)."""
    from pyspark.sql import functions as F

    from victoriametrics_spark.logsql.parser import run_logsql
    from victoriametrics_spark.storage.layout import (
        drop_samples_table,
        write_logs_table,
    )

    logs = spark.createDataFrame(
        [
            (1_700_000_000_000 + i, f"msg {i}", "app1" if i % 2 else "app2")
            for i in range(100)
        ],
        "_time long, _msg string, app string",
    )
    tbl = "logs_block_stats_t"
    write_logs_table(
        logs.withColumn("_time", F.timestamp_millis(F.col("_time"))),
        tbl,
        stream_fields=["app"],
        n_buckets=2,
    )
    try:
        df = spark.table(tbl).drop("date")
        out = run_logsql(df, "* | block_stats").collect()
        assert len(out) > 0
        fields = {r["field"] for r in out}
        assert {"_msg", "app", "_stream"} <= fields
        total_msg_rows = sum(r["rows"] for r in out if r["field"] == "_msg")
        assert total_msg_rows == 100
        for r in out:
            assert r["values_size"] > 0
            assert r["part_path"].endswith(".parquet")
    finally:
        drop_samples_table(spark, tbl)


def test_parser_errors_are_logsql_errors():
    """Non-numeric pipe arguments must raise a positioned LogsQLError,
    not a context-free int() ValueError (found by token fuzzing)."""
    for q in (
        "* | limit x",
        "* | offset as",
        "* | sample foo",
        "* | top bad by (k)",
        "* | sort by (a) offset z",
        "* | generate_sequence nope",
    ):
        with pytest.raises(LogsQLError, match="offset|expected"):
            parse_query(q)


def test_parser_fuzz_no_foreign_exceptions():
    """Random token-soup queries either parse or raise LogsQLError —
    never any other exception class (the public textual front-end must
    be crash-free on garbage)."""
    import random

    rng = random.Random(7)
    toks = [
        "*", "|", "stats", "by", "(", ")", "count()", "as", "x", "sort",
        "limit", "5", '"q"', "error", "and", "or", "not", "_time:5m",
        "f:=3", ":", "=", "extract", "top", "in", ",", "math", "+",
        "uniq", "'s", "\\", "{", "}", "options(a=1)", "[", "]", "<",
        ">", "!", "offset", "stream_context",
    ]
    for _ in range(3000):
        q = " ".join(rng.choice(toks) for _ in range(rng.randint(1, 12)))
        try:
            parse_query(q)
        except LogsQLError:
            pass


def test_sort_limit_compiles_to_topk(spark):
    """`| sort by (...) | limit N` must compile to Spark's
    TakeOrderedAndProject — the physical top-k the reference implements
    as pipe_sort_topk.go (no full sort, no full-data shuffle: each
    partition keeps N rows, the driver merges)."""
    from victoriametrics_spark.logsql.parser import run_logsql

    df = spark.createDataFrame(
        [(i, f"m{i}", float(i)) for i in range(100)],
        "_time long, _msg string, v double",
    )
    out = run_logsql(df, "* | sort by (v desc) | limit 5")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert [r["v"] for r in out.collect()] == [99.0, 98.0, 97.0, 96.0, 95.0]

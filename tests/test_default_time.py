"""Default evaluation time + latencyOffset + round_digits on the
/api/v1/query and /api/v1/query_range handlers.

The reference defaults an instant query's `time` to ct = now
(QueryHandler, prometheus.go:777), then pulls evaluation times within
-search.latencyOffset (30s default, prometheus.go:38) of now back to
ct − offset and shifts result timestamps forward again
(prometheus.go:855-867,892-903). query_range defaults start to
ct − 5m and end to ct (prometheus.go:933-937), clamps inverted ranges
(prometheus.go:970-972), freezes trailing possibly-incomplete points
(adjustLastPoints, prometheus.go:1073-1099), and rounds values when
round_digits is set (exec.go:88-99, decimal.go:325-335)."""

from __future__ import annotations

import json
import threading
import urllib.request

import pytest

import victoriametrics_spark.api.http as http_mod
from victoriametrics_spark.api import PromAPI, serve
from victoriametrics_spark.schema import SAMPLE_SCHEMA

# a fixed "now" — 2023-11-14T22:13:20Z — so assertions are byte-exact
NOW_MS = 1_700_000_000_000


@pytest.fixture()
def fixed_now(monkeypatch):
    monkeypatch.setattr(http_mod, "_now_ms", lambda: NOW_MS)
    return NOW_MS


@pytest.fixture(scope="module")
def api(spark):
    rows = []
    # samples every 10s over the 10 minutes leading up to NOW_MS,
    # value = seconds before now (freshest sample has value 0)
    for ts in range(NOW_MS - 600_000, NOW_MS + 1, 10_000):
        rows.append(
            ("m_fresh", {"job": "live"}, ts, (NOW_MS - ts) / 1000.0, False)
        )
    rows.append(("m_pi", {}, NOW_MS - 60_000, 3.14159265, False))
    df = spark.createDataFrame(rows, SAMPLE_SCHEMA)
    return PromAPI(spark, df)


def test_instant_query_defaults_to_now(api, fixed_now):
    """No time= → evaluate at now − 30s, report at now."""
    out = api.query("m_fresh")
    (r,) = out["data"]["result"]
    # reported timestamp is the requested (default) time = now...
    assert r["value"][0] == NOW_MS / 1000.0
    # ...but the value is the freshest sample at or before now − 30s
    assert float(r["value"][1]) == 30.0


def test_instant_query_near_now_is_pulled_back(api, fixed_now):
    """An explicit time within latencyOffset of now also shifts."""
    t = (NOW_MS - 10_000) / 1000
    out = api.query("m_fresh", time=str(t))
    (r,) = out["data"]["result"]
    assert r["value"][0] == t  # reported at the requested time
    assert float(r["value"][1]) == 30.0  # evaluated at now − 30s


def test_instant_query_nocache_skips_adjustment(api, fixed_now):
    """?nocache=1 evaluates at the literal requested time
    (prometheus.go:859 'Adjust start time only if nocache isn't set')."""
    out = api.query("m_fresh", may_cache=False)
    (r,) = out["data"]["result"]
    assert r["value"][0] == NOW_MS / 1000.0
    assert float(r["value"][1]) == 0.0


def test_instant_query_latency_offset_override(api, fixed_now):
    """Per-query latency_offset arg (getLatencyOffsetMilliseconds)."""
    out = api.query("m_fresh", latency_offset="2m")
    (r,) = out["data"]["result"]
    assert float(r["value"][1]) == 120.0


def test_instant_query_old_time_untouched(api, fixed_now):
    """Historical times (farther than latencyOffset from now) are
    evaluated exactly as requested — byte-identical to before."""
    t = (NOW_MS - 300_000) / 1000
    out = api.query("m_fresh", time=str(t))
    (r,) = out["data"]["result"]
    assert r["value"][0] == t
    assert float(r["value"][1]) == 300.0


def test_query_range_defaults_to_last_5m(api, fixed_now):
    """No start/end → [now − 5m, now] at the default 5m step."""
    out = api.query_range("m_fresh", None, None)
    (r,) = out["data"]["result"]
    ts_list = [v[0] for v in r["values"]]
    assert ts_list == [(NOW_MS - 300_000) / 1000.0, NOW_MS / 1000.0]


def test_query_range_inverted_range_clamps_end(api, fixed_now):
    """start > end → end = start + 5m (prometheus.go:970-972)."""
    start_s = (NOW_MS - 600_000) // 1000
    out = api.query_range(
        "m_fresh", str(start_s), str(start_s - 600), "300",
        may_cache=False,
    )
    (r,) = out["data"]["result"]
    assert [v[0] for v in r["values"]] == [
        float(start_s), float(start_s + 300)
    ]


def test_query_range_adjust_last_points(api, fixed_now):
    """step < 1m → points younger than now − latencyOffset are frozen
    to the last complete value (adjustLastPoints)."""
    start_s = (NOW_MS - 100_000) // 1000
    end_s = NOW_MS // 1000
    out = api.query_range(
        "m_fresh", str(start_s), str(end_s), "10", may_cache=False,
    )
    (r,) = out["data"]["result"]
    vals = {v[0]: float(v[1]) for v in r["values"]}
    # a point safely older than now − 30s keeps its own value
    assert vals[float(end_s - 50)] == 50.0
    # points in (now − 30s, now] are frozen to the value at now − 30s
    assert vals[float(end_s)] == 30.0
    assert vals[float(end_s - 10)] == 30.0
    # a large step (>= 1m) skips the adjustment entirely
    out2 = api.query_range(
        "m_fresh", str(end_s - 120), str(end_s), "60", may_cache=False,
    )
    (r2,) = out2["data"]["result"]
    assert {v[0]: float(v[1]) for v in r2["values"]}[float(end_s)] == 0.0


def test_round_digits(api, fixed_now):
    """round_digits rounds result values half-away-from-zero
    (decimal.RoundToDecimalDigits); 100 (the default) disables."""
    t = str((NOW_MS - 60_000) // 1000)
    out = api.query("m_pi", time=t, round_digits=3)
    assert float(out["data"]["result"][0]["value"][1]) == 3.142
    out = api.query("m_pi", time=t, round_digits=0)
    assert float(out["data"]["result"][0]["value"][1]) == 3.0
    out = api.query("m_pi", time=t)
    assert float(out["data"]["result"][0]["value"][1]) == 3.14159265
    rng = api.query_range(
        "m_pi", t, t, "60", round_digits=2, may_cache=False,
    )
    assert float(rng["data"]["result"][0]["values"][0][1]) == 3.14


def test_round_to_decimal_digits_unit():
    rnd = http_mod._round_to_decimal_digits
    assert rnd(2.5, 0) == 3.0  # half away from zero, not banker's
    assert rnd(-2.5, 0) == -3.0
    assert rnd(1.2345, 2) == 1.23
    assert rnd(1.2345, 200) == 1.2345  # >= 100 → untouched
    import math as _m
    assert _m.isnan(rnd(float("nan"), 2))


def test_http_query_without_time_param(api, fixed_now):
    """HTTP-level: GET /api/v1/query?query=... with NO time param
    returns the current value (the round-9 defect evaluated at epoch 0
    and returned empty)."""
    srv = serve(api, port=0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{port}/api/v1/query?query=m_fresh"
        with urllib.request.urlopen(url) as resp:
            out = json.loads(resp.read())
        (r,) = out["data"]["result"]
        assert r["value"][0] == NOW_MS / 1000.0
        assert float(r["value"][1]) == 30.0
        # round_digits arrives through the HTTP layer too
        url2 = (
            f"http://127.0.0.1:{port}/api/v1/query"
            f"?query=m_pi&time={(NOW_MS - 60_000) // 1000}&round_digits=2"
        )
        with urllib.request.urlopen(url2) as resp:
            out2 = json.loads(resp.read())
        assert out2["data"]["result"][0]["value"][1] == "3.14"
    finally:
        srv.shutdown()


def test_labels_api_default_window(spark):
    """/api/v1/labels|label_values|series default to [now − 5m, now]
    (getCommonParamsForLabelsAPI, prometheus.go:1210-1220 — VM
    deliberately avoids Prometheus' scan-everything default, issue
    #91), day-granular like the per-day inverted index; an explicit
    start reaches older days; start=0 is treated as absent (VM bumps
    it the same way)."""
    day = 86_400_000
    rows = [
        ("m_today", {"job": "a"}, NOW_MS - 60_000, 1.0, False),
        ("m_old", {"old_lbl": "x"}, NOW_MS - 40 * day, 2.0, False),
    ]
    df = spark.createDataFrame(rows, SAMPLE_SCHEMA)
    api = PromAPI(spark, df)

    # default window: only the fresh series' day
    ser = api.series(['{__name__=~"m_.*"}'], now_ms=NOW_MS)
    assert [m["__name__"] for m in ser["data"]] == ["m_today"]
    labs = api.labels(now_ms=NOW_MS)
    assert "job" in labs["data"] and "old_lbl" not in labs["data"]
    names = api.label_values("__name__", now_ms=NOW_MS)
    assert names["data"] == ["m_today"]

    # explicit start reaches the old series
    ser = api.series(
        ['{__name__=~"m_.*"}'],
        start=str((NOW_MS - 41 * day) // 1000),
        now_ms=NOW_MS,
    )
    assert sorted(m["__name__"] for m in ser["data"]) == [
        "m_old", "m_today",
    ]

    # start=0 is "absent" (VM bumps it to end − 5m)
    ser = api.series(['{__name__=~"m_.*"}'], start="0", now_ms=NOW_MS)
    assert [m["__name__"] for m in ser["data"]] == ["m_today"]

    # inverted range clamps end to start (getCommonParamsInternal)
    ser = api.series(
        ['{__name__=~"m_.*"}'],
        start=str((NOW_MS + day) // 1000),
        end=str(NOW_MS // 1000),
        now_ms=NOW_MS,
    )
    assert ser["data"] == []


def test_render_default_window(spark):
    """Graphite /render defaults from = now − 24h, until = now
    (render_api.go:41-57); an explicit from=0 stays epoch (the
    reference only defaults ABSENT params there)."""
    rows = [
        ("g_fresh", {}, NOW_MS - 3_600_000, 1.0, False),
        ("g_old", {}, NOW_MS - 3 * 86_400_000, 2.0, False),
    ]
    df = spark.createDataFrame(rows, SAMPLE_SCHEMA)
    api = PromAPI(spark, df)
    out = api.render("*", None, None, "3600", now_ms=NOW_MS)
    assert [o["target"] for o in out] == ["g_fresh"]
    out = api.render("*", "0", None, "86400", now_ms=NOW_MS)
    assert sorted(o["target"] for o in out) == ["g_fresh", "g_old"]


def test_tsdb_status_date_scoping(spark):
    """/api/v1/status/tsdb scopes to ONE day of the per-day index:
    absent `date` = today, date=0 = whole retention, explicit
    YYYY-MM-DD = that day (TSDBStatusHandler, prometheus.go:591-620)."""
    day = 86_400_000
    rows = [
        ("t_today", {"a": "1"}, NOW_MS - 60_000, 1.0, False),
        ("t_old", {"b": "2"}, NOW_MS - 10 * day, 2.0, False),
    ]
    df = spark.createDataFrame(rows, SAMPLE_SCHEMA)
    api = PromAPI(spark, df)

    d = api.tsdb_status(now_ms=NOW_MS)["data"]
    assert d["totalSeries"] == 1
    assert d["seriesCountByMetricName"][0]["name"] == "t_today"

    d = api.tsdb_status(date="0", now_ms=NOW_MS)["data"]
    assert d["totalSeries"] == 2

    import datetime as _dt

    old_day = _dt.datetime.fromtimestamp(
        (NOW_MS - 10 * day) / 1000.0, tz=_dt.timezone.utc
    ).strftime("%Y-%m-%d")
    d = api.tsdb_status(date=old_day, now_ms=NOW_MS)["data"]
    assert d["totalSeries"] == 1
    assert d["seriesCountByMetricName"][0]["name"] == "t_old"

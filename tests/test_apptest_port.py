"""Ports of the reference's HTTP-level end-to-end apptest cases
(reference apptest/tests/*.go, single-node scope): ingest through the
real IngestAPI HTTP routes, flush, query through the real PromAPI HTTP
routes, compare against the reference's hardcoded expected responses.

These exercise the documented USER-visible semantics — instant-query
step-as-lookback, range-grid alignment, ephemeral points, default
step — on top of the engine the golden corpus already covers."""

from __future__ import annotations

import json
import threading
import urllib.parse
import urllib.request

import pytest

# reference apptest e2e port: slow tier — excluded from the default (driver-window) run;
# opt in with `pytest -m slow` (see pytest.ini)
pytestmark = pytest.mark.slow



@pytest.fixture(scope="module")
def server(spark, tmp_path_factory):
    """Full-stack server: IngestAPI appends into a bucketed samples
    table; PromAPI queries it; /internal/force_flush re-derives the
    pinned frame after each write burst (the apptest ForceFlush)."""
    from victoriametrics_spark.api import PromAPI, serve
    from victoriametrics_spark.api.http import IngestAPI
    from victoriametrics_spark.schema import SAMPLE_SCHEMA
    from victoriametrics_spark.storage.layout import (
        drop_samples_table,
        write_samples_table,
    )

    table = "apptest_samples"
    # seed with an empty table so PromAPI can bind the scan
    write_samples_table(spark.createDataFrame([], SAMPLE_SCHEMA), table)
    ingest = IngestAPI(spark, samples_table=table)
    api = PromAPI(spark, spark.table(table), samples_table=table)
    api.reload_samples()
    srv = serve(api, port=0, ingest_api=ingest)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{port}"
    _INGEST["api"] = ingest
    yield url
    srv.shutdown()
    drop_samples_table(spark, table)


_INGEST: dict = {}


def _graphite_write(base: str, lines: list) -> None:
    """The apptest GraphiteWrite analog: the reference ingests graphite
    over a TCP listener; here the same parser is fed through the ingest
    API, then flushed."""
    n = _INGEST["api"].import_lines("\n".join(lines), "graphite")
    assert n == len(lines)
    _get(base, "/internal/force_flush")


def _get(base: str, path: str, **params) -> dict:
    qs = urllib.parse.urlencode(
        {k: v for k, v in params.items() if v is not None}, doseq=True
    )
    with urllib.request.urlopen(f"{base}{path}?{qs}") as r:
        return json.loads(r.read())


def _post(base: str, path: str, body: str) -> int:
    req = urllib.request.Request(
        f"{base}{path}", data=body.encode(), method="POST"
    )
    with urllib.request.urlopen(req) as r:
        return r.status


# Data from the reference's apptest/tests/key_concepts_test.go docData
# (the examples in the key-concepts documentation).
DOC_DATA = "\n".join(
    [
        "foo_bar 1.00 1652169600000",  # 08:00:00Z
        "foo_bar 2.00 1652169660000",  # 08:01
        "foo_bar 3.00 1652169720000",  # 08:02
        "foo_bar 5.00 1652169840000",  # 08:04, one point missed
        "foo_bar 5.50 1652169960000",  # 08:06, one point missed
        "foo_bar 5.50 1652170020000",  # 08:07
        "foo_bar 4.00 1652170080000",  # 08:08
        "foo_bar 3.50 1652170260000",  # 08:11, two points missed
        "foo_bar 3.25 1652170320000",  # 08:12
        "foo_bar 3.00 1652170380000",  # 08:13
        "foo_bar 2.00 1652170440000",  # 08:14
        "foo_bar 1.00 1652170500000",  # 08:15
        "foo_bar 4.00 1652170560000",  # 08:16
    ]
)


@pytest.fixture(scope="module")
def doc_server(server):
    assert _post(server, "/api/v1/import/prometheus", DOC_DATA) in (200, 204)
    _get(server, "/internal/force_flush")
    return server


def test_instant_query_step_lookback(doc_server):
    """key_concepts_test.go testInstantQuery: the instant-query step is
    the bare-selector lookback window, half-open (time-step, time]."""
    got = _get(
        doc_server,
        "/api/v1/query",
        query="foo_bar",
        time="2022-05-10T08:03:00.000Z",
        step="5m",
    )
    assert got["data"]["result"] == [
        {
            "metric": {"__name__": "foo_bar"},
            "value": [1652169780.0, "3"],
        }
    ]
    # nearest sample 2m away, step 1m → empty
    got = _get(
        doc_server,
        "/api/v1/query",
        query="foo_bar",
        time="2022-05-10T08:18:00.000Z",
        step="1m",
    )
    assert got["data"]["result"] == []


RANGE_WANT_1M = [
    ("2022-05-10T08:00:00Z", 1.0),
    ("2022-05-10T08:01:00Z", 2.0),
    ("2022-05-10T08:02:00Z", 3.0),
    ("2022-05-10T08:03:00Z", 3.0),
    ("2022-05-10T08:04:00Z", 5.0),
    ("2022-05-10T08:05:00Z", 5.0),
    ("2022-05-10T08:06:00Z", 5.5),
    ("2022-05-10T08:07:00Z", 5.5),
    ("2022-05-10T08:08:00Z", 4.0),
    ("2022-05-10T08:09:00Z", 4.0),
    # 08:10 missing: no sample within the staleness window
    ("2022-05-10T08:11:00Z", 3.5),
    ("2022-05-10T08:12:00Z", 3.25),
    ("2022-05-10T08:13:00Z", 3.0),
    ("2022-05-10T08:14:00Z", 2.0),
    ("2022-05-10T08:15:00Z", 1.0),
    ("2022-05-10T08:16:00Z", 4.0),
    ("2022-05-10T08:17:00Z", 4.0),
]


def _iso_to_unix(s: str) -> float:
    from datetime import datetime, timezone

    return datetime.fromisoformat(s.replace("Z", "+00:00")).timestamp()


def _range_values(base, start, end, step):
    got = _get(
        base,
        "/api/v1/query_range",
        query="foo_bar",
        start=start,
        end=end,
        step=step,
    )
    res = got["data"]["result"]
    if not res:
        return []
    (series,) = res
    assert series["metric"] == {"__name__": "foo_bar"}
    return [(ts, float(v)) for ts, v in series["values"]]


def test_range_query_grid_and_ephemeral_points(doc_server):
    """key_concepts_test.go testRangeQuery: 17 points over
    [07:59..08:17] @1m — gap-fill follows the per-series scrape
    interval (one-minute gaps filled, the two-minute gap at 08:10 not),
    and 07:59 has no sample to look back to."""
    vals = _range_values(
        doc_server,
        "2022-05-10T07:59:00.000Z",
        "2022-05-10T08:17:00.000Z",
        "1m",
    )
    want = [(_iso_to_unix(ts), v) for ts, v in RANGE_WANT_1M]
    assert vals == want

    # grid runs start, start+step, …: unaligned start keeps its phase
    vals = _range_values(
        doc_server,
        "2022-05-10T08:00:01.000Z",
        "2022-05-10T08:02:00.000Z",
        "1m",
    )
    assert vals == [
        (_iso_to_unix("2022-05-10T08:00:01Z"), 1.0),
        (_iso_to_unix("2022-05-10T08:01:01Z"), 2.0),
    ]

    # end = start + N*step is included
    vals = _range_values(
        doc_server,
        "2022-05-10T08:00:00.000Z",
        "2022-05-10T08:02:00.000Z",
        "1m",
    )
    assert vals == [
        (_iso_to_unix("2022-05-10T08:00:00Z"), 1.0),
        (_iso_to_unix("2022-05-10T08:01:00Z"), 2.0),
        (_iso_to_unix("2022-05-10T08:02:00Z"), 3.0),
    ]

    # step defaults to 5m
    vals = _range_values(
        doc_server,
        "2022-05-10T07:59:00.000Z",
        "2022-05-10T08:17:00.000Z",
        None,
    )
    assert vals == [
        (_iso_to_unix("2022-05-10T08:04:00Z"), 5.0),
        (_iso_to_unix("2022-05-10T08:09:00Z"), 4.0),
        (_iso_to_unix("2022-05-10T08:14:00Z"), 2.0),
    ]


def test_range_equals_many_instant_queries(doc_server):
    """key_concepts_test.go testRangeQueryIsEquivalentToManyInstantQueries:
    a range query is N instant queries EXCEPT it also produces ephemeral
    points (instant lookback is exactly step; range gap-fill follows the
    scrape interval)."""
    rng = dict(
        _range_values(
            doc_server,
            "2022-05-10T07:59:00.000Z",
            "2022-05-10T08:17:00.000Z",
            "1m",
        )
    )
    # instant @ts with step=1m: empty exactly where the range result is
    # ephemeral (08:03, 08:05, 08:09) or absent (07:59, 08:10, 08:17)
    ephemeral = {"07:59", "08:03", "08:05", "08:09", "08:10", "08:17"}
    for hhmm in [f"08:{m:02d}" for m in range(0, 18)] + ["07:59"]:
        ts = f"2022-05-10T{hhmm}:00.000Z"
        got = _get(
            doc_server, "/api/v1/query", query="foo_bar", time=ts, step="1m"
        )
        res = got["data"]["result"]
        if hhmm in ephemeral:
            assert res == [], hhmm
        else:
            unix = _iso_to_unix(ts)
            assert res and res[0]["value"][0] == unix, hhmm
            assert float(res[0]["value"][1]) == rng[unix], hhmm


# ----------------------------------------------------------------------
# special_query_regression_test.go — user-reported regressions, each
# tied to a reference GitHub issue. All single-node cases ported.


def test_case_sensitive_regex_export(server):
    """issues/161: (?i) regex in export match[]."""
    assert _post(server, "/api/v1/import/prometheus", "\n".join([
        'prometheus.sensitiveRegex{label="sensitiveRegex"} 10 1707123456700',
        'prometheus.sensitiveRegex{label="SensitiveRegex"} 10 1707123456700',
    ])) in (200, 204)
    _get(server, "/internal/force_flush")
    import urllib.request as _rq
    url = (
        f"{server}/api/v1/export?"
        + urllib.parse.urlencode({
            "match[]": "{label=~'(?i)sensitiveregex'}",
            "start": "2024-02-05T08:50:00.700Z",
            "end": "2024-02-05T09:00:00.700Z",
        })
    )
    with _rq.urlopen(url) as r:
        lines = [json.loads(x) for x in r.read().decode().splitlines() if x]
    got = sorted(
        (ln["metric"]["label"], ln["timestamps"], ln["values"])
        for ln in lines
    )
    assert got == [
        ("SensitiveRegex", [1707123456700], [10.0]),
        ("sensitiveRegex", [1707123456700], [10.0]),
    ]


def test_duplicate_label_in_one_line(server):
    """issues/172: a line with the same label twice ingests once."""
    assert _post(server, "/api/v1/import/prometheus",
        'prometheus.duplicate_label{label="duplicate", label="duplicate"}'
        ' 10 1707123456700') in (200, 204)
    _get(server, "/internal/force_flush")
    got = _get(server, "/api/v1/query",
               query='prometheus.duplicate_label[5m]',
               time="2024-02-05T09:00:00.700Z")
    assert got["data"]["result"] == [{
        "metric": {"__name__": "prometheus.duplicate_label",
                   "label": "duplicate"},
        "values": [[1707123456.7, "10"]],
    }]


def test_too_big_lookbehind_window(server):
    """issues/5553: selector[100y] instant = raw-sample matrix export;
    the range flavor returns each real sample at its grid point."""
    assert _post(server, "/api/v1/import/prometheus",
        'prometheus.too_big_lookbehind{label="foo"} 10 1707123456700'
    ) in (200, 204)
    _get(server, "/internal/force_flush")
    got = _get(server, "/api/v1/query",
               query="prometheus.too_big_lookbehind{label='foo'}[100y]",
               step="5m", time="2024-02-05T08:57:36.700Z")
    assert got["data"]["resultType"] == "matrix"
    assert got["data"]["result"] == [{
        "metric": {"__name__": "prometheus.too_big_lookbehind",
                   "label": "foo"},
        "values": [[1707123456.7, "10"]],
    }]

    assert _post(server, "/api/v1/import/prometheus", "\n".join([
        'prometheus.too_big_lookbehind_range{label="foo"} 13 1707123496700',
        'prometheus.too_big_lookbehind_range{label="foo"} 12 1707123466700',
        'prometheus.too_big_lookbehind_range{label="foo"} 11 1707123436700',
        'prometheus.too_big_lookbehind_range{label="foo"} 10 1707123406700',
    ])) in (200, 204)
    _get(server, "/internal/force_flush")
    got = _get(server, "/api/v1/query_range",
               query="prometheus.too_big_lookbehind_range{label='foo'}",
               start="2024-02-05T08:56:46.700Z",
               end="2024-02-05T08:58:16.700Z", step="30s")
    (series,) = got["data"]["result"]
    assert [(t, float(v)) for t, v in series["values"]] == [
        (1707123406.7, 10.0), (1707123436.7, 11.0),
        (1707123466.7, 12.0), (1707123496.7, 13.0),
    ]


def test_match_series(server):
    """issues/155: /api/v1/series over a name match."""
    assert _post(server, "/api/v1/import/prometheus", "\n".join([
        f'GenBearTemp{{db="TenMinute",Park="{p}",TurbineType="V112"}}'
        ' 10 1707123456700' for p in "1234"
    ])) in (200, 204)
    _get(server, "/internal/force_flush")
    got = _get(server, "/api/v1/series", **{
        "match[]": '{__name__="GenBearTemp"}',
        "start": "2024-02-04T08:57:36.700Z",
        "end": "2024-02-05T08:57:36.700Z",
    })
    assert sorted(m["Park"] for m in got["data"]) == ["1", "2", "3", "4"]
    assert all(
        m["__name__"] == "GenBearTemp" and m["db"] == "TenMinute"
        for m in got["data"]
    )


def test_negative_increase_with_lookback_delta(server):
    """issues/8935: increase() must not go negative when max_lookback
    cuts the previous sample off — the realPrevValue LookbackDelta gate
    and the adjusted-values no-prev heuristic."""
    assert _post(server, "/api/v1/import/prometheus", "\n".join([
        "foo 108 1750109243514",
        "foo 108 1750109258514",
        # 75s gap — the counter reset to 1 in between
        "foo 1 1750109333514",
        "foo 1 1750109348514",
    ])) in (200, 204)
    _get(server, "/internal/force_flush")
    got = _get(server, "/api/v1/query_range",
               query="increase(foo[1m])",
               start="2025-06-16T21:28:40.700Z",
               end="2025-06-16T21:29:30.700Z",
               step="9s", max_lookback="65s")
    (series,) = got["data"]["result"]
    assert series["metric"] == {}
    assert [(t, float(v)) for t, v in series["values"]] == [
        (_iso_to_unix("2025-06-16T21:28:40.700Z"), 0.0),
        (_iso_to_unix("2025-06-16T21:28:49.700Z"), 0.0),
        (_iso_to_unix("2025-06-16T21:28:58.700Z"), 1.0),
        (_iso_to_unix("2025-06-16T21:29:07.700Z"), 1.0),
        (_iso_to_unix("2025-06-16T21:29:16.700Z"), 0.0),
        (_iso_to_unix("2025-06-16T21:29:25.700Z"), 0.0),
    ]


def test_instant_query_with_offset(server):
    """issues/9762: avg_over_time(...[1d] offset 12h) instant."""
    assert _post(server, "/api/v1/import/prometheus", "\n".join([
        "vm_http_requests_total 1 1758196800000",
        "vm_http_requests_total 2 1758218400000",
        "vm_http_requests_total 3 1758240000000",
        "vm_http_requests_total 4 1758261600000",
        "vm_http_requests_total 5 1758283200000",
        "vm_http_requests_total 6 1758304800000",
        "vm_http_requests_total 7 1758326400000",
    ])) in (200, 204)
    _get(server, "/internal/force_flush")
    got = _get(server, "/api/v1/query",
               query="avg_over_time(vm_http_requests_total[1d] offset 12h)",
               time="2025-09-20T12:00:01.000Z")
    (r,) = got["data"]["result"]
    assert r["metric"] == {}
    assert r["value"] == [1758369601.0, "5.5"]


def test_query_range_end_at_midnight(server):
    """issues/9804: a sample at a date-partition boundary with End
    exactly there must not be dropped (End is inclusive)."""
    assert _post(server, "/api/v1/import/prometheus",
                 "foo_bar_midnight 7 1765497600000") in (200, 204)
    _get(server, "/internal/force_flush")
    got = _get(server, "/api/v1/query_range",
               query="foo_bar_midnight",
               start="2025-12-11T20:00:00.000Z",
               end="2025-12-12T00:00:00.000Z", step="1h")
    (series,) = got["data"]["result"]
    assert [(t, float(v)) for t, v in series["values"]] == [
        (1765497600.0, 7.0)
    ]


def test_comparison_not_inf_not_nan(server):
    """issues/150: `1/(m-1)!=inf!=nan` keeps only finite points."""
    _graphite_write(server, [
        "not_nan_not_inf;item=x 1 1707123456",
        "not_nan_not_inf;item=x 1 1707123455",
        "not_nan_not_inf;item=y 3 1707123456",
        "not_nan_not_inf;item=y 1 1707123455",
    ])
    got = _get(server, "/api/v1/query_range",
               query="1/(not_nan_not_inf-1)!=inf!=nan",
               start="2024-02-05T06:50:36.000Z",
               end="2024-02-05T09:58:37.000Z", step="60")
    (series,) = got["data"]["result"]
    assert series["metric"] == {"item": "y"}
    assert [(t, float(v)) for t, v in series["values"]] == [
        (_iso_to_unix("2024-02-05T08:58:00.000Z"), 0.5)
    ]


def test_empty_label_match(server):
    """issues/395: foo=~'bar|' matches the empty label too."""
    _graphite_write(server, [
        "empty_label_match 1 1707123456",
        "empty_label_match;foo=bar 2 1707123456",
        "empty_label_match;foo=baz 3 1707123456",
    ])
    got = _get(server, "/api/v1/query_range",
               query="empty_label_match{foo=~'bar|'}",
               start="2024-02-05T08:55:36.000Z",
               end="2024-02-05T08:57:36.000Z", step="60s")
    res = sorted(got["data"]["result"], key=lambda r: sorted(r["metric"].items()))
    assert [r["metric"] for r in res] == [
        {"__name__": "empty_label_match"},
        {"__name__": "empty_label_match", "foo": "bar"},
    ]
    assert [
        [(t, float(v)) for t, v in r["values"]] for r in res
    ] == [
        [(_iso_to_unix("2024-02-05T08:57:36.000Z"), 1.0)],
        [(_iso_to_unix("2024-02-05T08:57:36.000Z"), 2.0)],
    ]


def test_max_lookback_param(server):
    """issues/209: max_lookback caps the bare-selector fill window;
    unset, the scrape-interval estimate fills ~40s past each sample."""
    _graphite_write(server, [
        "max_lookback_set 1 1707123426",
        "max_lookback_set 2 1707123396",
        "max_lookback_set 3 1707123336",
        "max_lookback_set 4 1707123306",
    ])
    got = _get(server, "/api/v1/query_range",
               query="max_lookback_set{foo=~'bar|'}",
               start="2024-02-05T08:55:06.000Z",
               end="2024-02-05T08:57:37.000Z",
               step="10s", max_lookback="1s")
    (series,) = got["data"]["result"]
    assert [(t, float(v)) for t, v in series["values"]] == [
        (_iso_to_unix("2024-02-05T08:55:06.000Z"), 4.0),
        (_iso_to_unix("2024-02-05T08:55:36.000Z"), 3.0),
        (_iso_to_unix("2024-02-05T08:56:36.000Z"), 2.0),
        (_iso_to_unix("2024-02-05T08:57:06.000Z"), 1.0),
    ]

    _graphite_write(server, [
        "max_lookback_unset 1 1707123426",
        "max_lookback_unset 2 1707123396",
        "max_lookback_unset 3 1707123336",
        "max_lookback_unset 4 1707123306",
    ])
    got = _get(server, "/api/v1/query_range",
               query="max_lookback_unset{foo=~'bar|'}",
               start="2024-02-05T08:55:06.000Z",
               end="2024-02-05T08:57:37.000Z", step="10s")
    (series,) = got["data"]["result"]
    want = [
        ("08:55:06", 4.0), ("08:55:16", 4.0), ("08:55:26", 4.0),
        ("08:55:36", 3.0), ("08:55:46", 3.0), ("08:55:56", 3.0),
        ("08:56:06", 3.0), ("08:56:16", 3.0),
        ("08:56:36", 2.0), ("08:56:46", 2.0), ("08:56:56", 2.0),
        ("08:57:06", 1.0), ("08:57:16", 1.0), ("08:57:26", 1.0),
        ("08:57:36", 1.0),
    ]
    assert [(t, float(v)) for t, v in series["values"]] == [
        (_iso_to_unix(f"2024-02-05T{hh}.000Z"), v) for hh, v in want
    ]


def test_not_nan_as_missing_data(server):
    """issues/153: m>1 drops points, doesn't blank the series."""
    _graphite_write(server, [
        "not_nan_as_missing_data;item=x 2 1707123454",
        "not_nan_as_missing_data;item=x 1 1707123455",
        "not_nan_as_missing_data;item=y 4 1707123454",
        "not_nan_as_missing_data;item=y 3 1707123455",
    ])
    got = _get(server, "/api/v1/query_range",
               query="not_nan_as_missing_data>1",
               start="2024-02-05T08:57:34.000Z",
               end="2024-02-05T08:57:36.000Z", step="1s")
    res = sorted(got["data"]["result"], key=lambda r: r["metric"]["item"])
    assert [r["metric"]["item"] for r in res] == ["x", "y"]
    assert [(t, float(v)) for t, v in res[0]["values"]] == [
        (_iso_to_unix("2024-02-05T08:57:34.000Z"), 2.0)
    ]
    assert [(t, float(v)) for t, v in res[1]["values"]] == [
        (_iso_to_unix("2024-02-05T08:57:34.000Z"), 4.0),
        (_iso_to_unix("2024-02-05T08:57:35.000Z"), 3.0),
        (_iso_to_unix("2024-02-05T08:57:36.000Z"), 3.0),
    ]


def test_subquery_aggregation(server):
    """issues/184: min by (item) (min_over_time(m[10m:1m])) instant."""
    _graphite_write(server, [
        "forms_daily_count;item=x 1 1707123396",
        "forms_daily_count;item=x 2 1707123336",
        "forms_daily_count;item=y 3 1707123396",
        "forms_daily_count;item=y 4 1707123336",
    ])
    got = _get(server, "/api/v1/query",
               query="min by (item) (min_over_time(forms_daily_count[10m:1m]))",
               time="2024-02-05T08:56:35.000Z")
    res = sorted(got["data"]["result"], key=lambda r: r["metric"]["item"])
    assert [(r["metric"], r["value"]) for r in res] == [
        ({"item": "x"}, [1707123395.0, "2"]),
        ({"item": "y"}, [1707123395.0, "4"]),
    ]


# ----------------------------------------------------------------------
# dedup_test.go — -dedup.minScrapeInterval semantics, verified through
# the raw-sample matrix view. (Stale markers are engine-internal here —
# is_stale rows never surface in query output — so the marker rows of
# the reference case are asserted through what survives around them.)


def _dedup_api(spark, dedup_ms):
    from victoriametrics_spark.api import PromAPI
    from victoriametrics_spark.schema import SAMPLE_SCHEMA

    t0 = 1706745600000  # 2024-02-01T00:00:00Z, a month boundary
    ts1, ts3, ts5, ts10 = (t0 + s * 1000 for s in (1, 3, 5, 10))
    rows = [
        ("metric1", {}, ts1, 3.0, False),
        ("metric1", {}, ts3, 10.0, False),
        ("metric1", {}, ts5, 5.0, False),
        ("metric2", {}, ts1, 3.0, False),
        ("metric2", {}, ts3, float("nan"), True),  # stale marker
        ("metric2", {}, ts5, 5.0, False),
        ("metric3", {}, ts10, 30.0, False),
        ("metric3", {}, ts10, 100.0, False),
        ("metric3", {}, ts10, 50.0, False),
        ("metric4", {}, ts10, 30.0, False),
        ("metric4", {}, ts10, float("nan"), True),  # stale marker
        ("metric4", {}, ts10, 50.0, False),
    ]
    df = spark.createDataFrame(rows, SAMPLE_SCHEMA)
    return (
        PromAPI(spark, df, dedup_interval_ms=dedup_ms),
        (t0, ts1, ts3, ts5, ts10),
    )


def _raw(api, name, t_ms):
    out = api.query(f"{name}[1h]", time=str(t_ms // 1000))
    res = out["data"]["result"]
    if not res:
        return []
    (series,) = res
    return [(int(t * 1000), float(v)) for t, v in series["values"]]


def test_dedup_off_keeps_duplicates(spark):
    import math

    api, (t0, ts1, ts3, ts5, ts10) = _dedup_api(spark, 0)
    t = t0 + 3600_000
    assert _raw(api, "metric1", t) == [(ts1, 3.0), (ts3, 10.0), (ts5, 5.0)]
    # same-ts duplicates all survive with dedup off
    assert sorted(_raw(api, "metric3", t)) == [
        (ts10, 30.0), (ts10, 50.0), (ts10, 100.0)
    ]
    # the stale marker is visible as NaN in the raw-sample view,
    # matching /api/v1/export (the reference shows it too)
    m2 = _raw(api, "metric2", t)
    assert [ts for ts, _ in m2] == [ts1, ts3, ts5]
    assert m2[0][1] == 3.0 and math.isnan(m2[1][1]) and m2[2][1] == 5.0


def test_dedup_on_interval_rules(spark):
    """10s dedup: keep the biggest ts per interval; ties on ts keep the
    biggest value; a stale marker loses to a real sample at the same ts
    (issues/6965 current-month + issues/10196 NaN-vs-value)."""
    api, (t0, ts1, ts3, ts5, ts10) = _dedup_api(spark, 10_000)
    t = t0 + 3600_000
    assert _raw(api, "metric1", t) == [(ts5, 5.0)]
    # marker at ts3 is mid-interval; the real ts5 sample wins the bucket
    assert _raw(api, "metric2", t) == [(ts5, 5.0)]
    assert _raw(api, "metric3", t) == [(ts10, 100.0)]
    # non-stale preferred over the marker at the same ts
    assert _raw(api, "metric4", t) == [(ts10, 50.0)]


# ----------------------------------------------------------------------
# export_import_test.go — native export → native import round trip with
# write-side extra_label params.


def test_export_import_native_round_trip(server):
    assert _post(
        server,
        "/api/v1/import/prometheus?"
        + urllib.parse.urlencode(
            [("extra_label", "el1=elv1"), ("extra_label", "el2=elv2")]
        ),
        "native_export_import 10 1707123456700",
    ) in (200, 204)
    _get(server, "/internal/force_flush")

    url = f"{server}/api/v1/export/native?" + urllib.parse.urlencode({
        "match[]": "native_export_import",
        "start": "2024-02-05T08:50:00.700Z",
        "end": "2024-02-05T09:00:00.700Z",
    })
    with urllib.request.urlopen(url) as r:
        blob = r.read()
    req = urllib.request.Request(
        f"{server}/api/v1/import/native", data=blob, method="POST"
    )
    with urllib.request.urlopen(req) as r:
        assert r.status == 204
    _get(server, "/internal/force_flush")

    got = _get(server, "/api/v1/query_range",
               query="native_export_import",
               start="2024-02-05T08:57:36.700Z",
               end="2024-02-05T08:57:36.700Z", step="60s")
    (series,) = got["data"]["result"]
    assert series["metric"] == {
        "__name__": "native_export_import", "el1": "elv1", "el2": "elv2",
    }
    assert [(t, float(v)) for t, v in series["values"]] == [
        (1707123456.7, 10.0)
    ]


# ----------------------------------------------------------------------
# future_timestamps_test.go (scaled down, deterministic `now`): samples
# up to `now + futureRetention` ingest and query back; samples beyond
# the future-retention horizon are rejected at write time.


def test_future_timestamps_retention_guard(spark):
    from victoriametrics_spark.api import PromAPI
    from victoriametrics_spark.api.http import IngestAPI
    from victoriametrics_spark.schema import SAMPLE_SCHEMA

    now = 1707123456_000
    year = 365 * 86_400_000
    captured = []
    ing = IngestAPI(
        spark,
        sink=lambda df, k: captured.append(df),
        future_retention_ms=100 * year,
        retention_ms=100 * year,
        now_ms_fn=lambda: now,
    )
    lines = "\n".join([
        f"metric_future_1d 1 {now + 86_400_000}",
        f"metric_future_1y 2 {now + year}",
        f"metric_future_1d_before_limit 3 {now + 100 * year - 86_400_000}",
        # beyond the future-retention horizon → ignored
        f"metric_future_beyond 4 {now + 100 * year + 60_000}",
        # beyond the past retention horizon → ignored
        f"metric_ancient 5 {now - 100 * year - 60_000}",
    ])
    n = ing.import_lines(lines, "prometheus")
    assert n == 3
    assert ing.rows_ignored_total == 2
    kept = spark.createDataFrame(
        captured[-1].collect(), SAMPLE_SCHEMA
    )
    api = PromAPI(spark, kept)
    # the kept samples sit decades in the future — give /series an
    # explicit range (VM's labels-API default window is [now-5m, now])
    ser = api.series(
        ['{__name__=~"metric_.*"}'], start="1",
        end=str((now + 101 * year) // 1000),
    )
    assert sorted(m["__name__"] for m in ser["data"]) == [
        "metric_future_1d",
        "metric_future_1d_before_limit",
        "metric_future_1y",
    ]
    # the far-future sample queries back at its own timestamp
    got = api.query(
        "metric_future_1d_before_limit[1h]",
        time=str((now + 100 * year - 86_400_000) // 1000),
    )
    (series,) = got["data"]["result"]
    assert [float(v) for _, v in series["values"]] == [3.0]


# ----------------------------------------------------------------------
# metricsql_test.go — UTF-8 names, stale-NaN visibility, @-modifier
# with a series expression.


def test_utf8_metric_and_label_names(server):
    assert _post(server, "/api/v1/import/prometheus",
        '{"3fooµ¥", "3👋tfにちは"="漢©®€£"} 1 1704067260000') in (200, 204)
    _get(server, "/internal/force_flush")
    for q in [
        '{"3fooµ¥"}',
        '{__name__="3fooµ¥"}',
        '{__name__=~"3fo.*"}',
        '{__name__=~".*µ¥"}',
        '{"3fooµ¥", "3👋tfにちは"="漢©®€£"}',
        '{"3fooµ¥", "3👋tfにちは"=~"漢.*"}',
        '{"3👋tfにちは"="漢©®€£"}',
    ]:
        got = _get(server, "/api/v1/query", query=q,
                   time="2024-01-01T00:01:00.000Z", step="5m")
        (r,) = got["data"]["result"]
        assert r["metric"] == {
            "__name__": "3fooµ¥", "3👋tfにちは": "漢©®€£",
        }, q
        assert r["value"] == [1704067260.0, "1"], q


def test_stale_nan_instant_behavior(server):
    """Instant queries drop stale markers; the raw selector[d] view
    (like export) shows them as NaN (issues/5806)."""
    import math

    assert _post(server, "/api/v1/import/prometheus", "\n".join([
        "stale_metric 1 1704067260000",   # 00:01
    ])) in (200, 204)
    # marker via remote-write protobuf (the Prometheus stale-NaN bit
    # pattern 0x7ff0000000000002, decoded to is_stale by the parser)
    import struct

    from victoriametrics_spark.streaming.remotewrite import (
        encode_write_request,
    )

    stale_nan = struct.unpack(
        "<d", struct.pack("<Q", 0x7FF0000000000002)
    )[0]
    payload = encode_write_request(
        [({"__name__": "stale_metric"}, [(1704067320000, stale_nan)])]
    )
    _INGEST["api"].write_remote(payload)
    _get(server, "/internal/force_flush")

    got = _get(server, "/api/v1/query", query="stale_metric",
               time="2024-01-01T00:01:00.000Z", step="5m")
    (r,) = got["data"]["result"]
    assert r["value"] == [1704067260.0, "1"]
    # at the marker's ts the series is stale → empty
    got = _get(server, "/api/v1/query", query="stale_metric",
               time="2024-01-01T00:02:00.000Z", step="5m")
    assert got["data"]["result"] == []
    # raw view shows the marker as NaN
    got = _get(server, "/api/v1/query", query="stale_metric[2m]",
               time="2024-01-01T00:02:00.000Z", step="5m")
    (r,) = got["data"]["result"]
    assert r["values"][0] == [1704067260.0, "1"]
    assert r["values"][1][0] == 1704067320.0
    assert r["values"][1][1] == "NaN"


def test_native_histogram_remote_write_e2e(server):
    """Native-histogram remote write lands as classic count/sum/vmrange
    series (write_request_unmarshaler.go:169-199) and is immediately
    queryable via histogram_quantile(prometheus_buckets(...))."""
    from victoriametrics_spark.streaming.remotewrite import (
        encode_write_request,
    )

    ts = 1704931200000  # 2024-01-11 00:00:00 UTC
    h = {
        "count_int": 13,
        "sum": 175.5,
        "schema": 0,
        "zero_threshold": 0.00001,
        "zero_count_int": 2,
        "positive_spans": [(0, 4), (2, 1)],
        "positive_deltas": [2, -1, 2, -1, 1],
        "timestamp": ts,
    }
    payload = encode_write_request(
        [({"__name__": "nh_latency", "job": "nhj"}, [], [h])]
    )
    n = _INGEST["api"].write_remote(payload)
    assert n == 8  # count + sum + zero bucket + 5 span buckets
    _get(server, "/internal/force_flush")

    t = "2024-01-11T00:00:30.000Z"
    got = _get(server, "/api/v1/query", query="nh_latency_count", time=t)
    (r,) = got["data"]["result"]
    assert r["value"][1] == "13"
    got = _get(server, "/api/v1/query", query="nh_latency_sum", time=t)
    (r,) = got["data"]["result"]
    assert r["value"][1] == "175.5"
    got = _get(
        server, "/api/v1/query",
        query='nh_latency_bucket{vmrange="5.000e-01...1.000e+00"}', time=t,
    )
    (r,) = got["data"]["result"]
    assert r["value"][1] == "2"
    # cumulative counts: zero(2)+(0.5,1](2)+(1,2](1)+(2,4](3) = 8 ≥ 6.5
    # = 0.5*13 → the 0.5-quantile lies in (2,4]
    got = _get(
        server, "/api/v1/query",
        query="histogram_quantile(0.5, prometheus_buckets("
              "nh_latency_bucket))", time=t,
    )
    (r,) = got["data"]["result"]
    assert 2.0 < float(r["value"][1]) <= 4.0


def test_at_modifier_with_series_expr(server):
    """issues/8444: `vector(1) @ up` resolves the @ from the series'
    value; an all-NaN @ expression errors with the reference message."""
    assert _post(server, "/api/v1/import/prometheus",
                 "up_at 1735689660 1735689660000") in (200, 204)
    _get(server, "/internal/force_flush")
    got = _get(server, "/api/v1/query_range", query="vector(1) @ up_at",
               start="2025-01-01T00:00:00Z", end="2025-01-01T00:02:00Z",
               step="10s")
    assert got["status"] == "success"
    (series,) = got["data"]["result"]
    assert all(v == "1" for _, v in series["values"])
    import urllib.error

    try:
        _get(server, "/api/v1/query_range", query="vector(1) @ no_such_at",
             start="2025-01-01T00:00:00Z", end="2025-01-01T00:02:00Z",
             step="10s")
        raise AssertionError("expected error")
    except urllib.error.HTTPError as e:
        body = json.loads(e.read())
        assert "`@` modifier must return a non-NaN value" in body["error"]


# ----------------------------------------------------------------------
# multitenant_test.go — cluster-style tenant routing over one server:
# /insert/<tenant>/prometheus/... writes, /select/<tenant>/prometheus
# reads, and the `multitenant` pseudo-tenant searching every tenant
# with (vm_account_id, vm_project_id) labels.


@pytest.fixture(scope="module")
def mt_server(spark):
    from victoriametrics_spark.api import PromAPI, serve
    from victoriametrics_spark.api.http import IngestAPI
    from victoriametrics_spark.schema import SAMPLE_SCHEMA
    from victoriametrics_spark.storage.layout import (
        drop_samples_table,
        write_samples_table,
    )

    table = "apptest_mt_samples"
    seed = spark.createDataFrame([], SAMPLE_SCHEMA).withColumn(
        "tenant", F_lit_str("0:0")
    )
    write_samples_table(seed, table, n_buckets=8)
    api = PromAPI(
        spark, spark.table(table), samples_table=table, tenant="0:0"
    )
    srv = serve(
        api,
        port=0,
        ingest_api=IngestAPI(spark, samples_table=table, tenant="0:0"),
        tenant_table=table,
    )
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{port}"
    srv.shutdown()
    drop_samples_table(spark, table)


def F_lit_str(v):
    from pyspark.sql import functions as F

    return F.lit(v)


COMMON_SAMPLES = "\n".join([
    "foo_bar 1.00 1652169600000",
    "foo_bar 2.00 1652169660000",
    "foo_bar 3.00 1652169720000",
])


def test_multitenant_select(mt_server):
    # empty multitenant search before any writes
    got = _get(mt_server, "/select/multitenant/prometheus/api/v1/query",
               query="foo_bar", step="5m", time="2022-05-10T08:03:00.000Z")
    assert got["data"]["result"] == []

    # per-tenant write + read isolation
    for tenant in ("1:1", "1:15"):
        assert _post(
            mt_server,
            f"/insert/{tenant}/prometheus/api/v1/import/prometheus",
            COMMON_SAMPLES,
        ) in (200, 204)
        got = _get(
            mt_server,
            f"/select/{tenant}/prometheus/api/v1/query",
            query="foo_bar", time="2022-05-10T08:05:00.000Z",
        )
        (r,) = got["data"]["result"]
        assert r["metric"] == {"__name__": "foo_bar"}
        assert r["value"] == [1652169900.0, "3"]

    # multitenant instant query exposes tenant labels
    got = _get(mt_server, "/select/multitenant/prometheus/api/v1/query",
               query="foo_bar", time="2022-05-10T08:05:00.000Z")
    res = sorted(
        got["data"]["result"],
        key=lambda r: int(r["metric"]["vm_project_id"]),
    )
    assert [r["metric"] for r in res] == [
        {"__name__": "foo_bar", "vm_account_id": "1", "vm_project_id": "1"},
        {"__name__": "foo_bar", "vm_account_id": "1", "vm_project_id": "15"},
    ]
    assert all(r["value"] == [1652169900.0, "3"] for r in res)

    # range aggregation BY the tenant labels
    got = _get(mt_server, "/select/multitenant/prometheus/api/v1/query_range",
               query="sum(foo_bar) by(vm_account_id,vm_project_id)",
               start="2022-05-10T07:59:00.000Z",
               end="2022-05-10T08:05:00.000Z", step="1m")
    res = sorted(
        got["data"]["result"],
        key=lambda r: int(r["metric"]["vm_project_id"]),
    )
    assert [r["metric"] for r in res] == [
        {"vm_account_id": "1", "vm_project_id": "1"},
        {"vm_account_id": "1", "vm_project_id": "15"},
    ]
    for r in res:
        assert [(t, v) for t, v in r["values"]][:4] == [
            (1652169600.0, "1"), (1652169660.0, "2"),
            (1652169720.0, "3"), (1652169780.0, "3"),
        ]

    # /api/v1/series across tenants
    got = _get(mt_server, "/select/multitenant/prometheus/api/v1/series",
               **{"match[]": "foo_bar", "start": "2022-05-10T08:03:00.000Z"})
    assert sorted(
        (m["vm_account_id"], m["vm_project_id"]) for m in got["data"]
    ) == [("1", "1"), ("1", "15")]

    # a tenant with no data stays empty (isolation)
    got = _get(mt_server, "/select/2:1/prometheus/api/v1/query",
               query="foo_bar", time="2022-05-10T08:05:00.000Z")
    assert got["data"]["result"] == []


# ----------------------------------------------------------------------
# snapshot_test.go — create/list/delete over the HTTP surface with the
# reference's name format and response shapes.


def test_snapshot_create_list_delete(server):
    import re

    name_re = re.compile(
        r"^(19[789]\d|20[0-9]{2})(0\d|1[0-2])([0-2]\d|3[01])"
        r"([01]\d|2[0-3])[0-5]\d[0-5]\d-[0-9,A-F]{16}$"
    )
    assert _post(server, "/api/v1/import/prometheus", "\n".join(
        f"snap_metric_{i:03d} {i} 1707123456700" for i in range(50)
    )) in (200, 204)
    _get(server, "/internal/force_flush")

    snapshots = []
    for _ in range(2):
        res = _get(server, "/snapshot/create")
        assert res["status"] == "ok"
        assert name_re.match(res["snapshot"]), res["snapshot"]
        snapshots.append(res["snapshot"])
    for _ in range(2):
        res = _get(server, "/api/v1/admin/tsdb/snapshot")
        assert res["status"] == "success"
        assert name_re.match(res["data"]["name"]), res["data"]["name"]
        snapshots.append(res["data"]["name"])

    res = _get(server, "/snapshot/list")
    assert res == {"status": "ok", "snapshots": sorted(snapshots)}

    res = _get(server, "/snapshot/delete", snapshot="does-not-exist")
    assert res == {
        "status": "error",
        "msg": 'cannot find snapshot "does-not-exist"',
    }
    res = _get(server, "/snapshot/delete", snapshot=snapshots[0])
    assert res == {"status": "ok"}
    res = _get(server, "/snapshot/list")
    assert res["snapshots"] == sorted(snapshots[1:])
    assert _get(server, "/snapshot/delete_all") == {"status": "ok"}
    assert _get(server, "/snapshot/list")["snapshots"] == []


# ----------------------------------------------------------------------
# ingestprotocols_test.go — one sample set per protocol, all verified
# through the same raw-view query with write-side extra_label params.


def _raw_all(base, pattern, t="2024-02-05T09:00:00.700Z"):
    got = _get(base, "/api/v1/query",
               query="{__name__=~'%s'}[10m]" % pattern, time=t)
    return sorted(
        (
            tuple(sorted(r["metric"].items())),
            [(int(ts * 1000), float(v)) for ts, v in r["values"]],
        )
        for r in got["data"]["result"]
    )


def test_ingest_protocols_cross_check(server):
    el = urllib.parse.urlencode(
        [("extra_label", "el1=elv1"), ("extra_label", "el2=elv2")]
    )
    # influx line protocol: measurement_field naming
    assert _post(server, f"/influx/write?{el}", "\n".join([
        "influxline series1=10 1707123456700000000",
        "influxline,label=foo1,label1=value1,label2=value2"
        " series2=40 1707123456800000000",
    ])) in (200, 204)
    # OpenTSDB HTTP JSON
    assert _post(server, f"/opentsdb/api/put?{el}", json.dumps([
        {"metric": "opentsdbimport.foo", "value": 45.34,
         "timestamp": 1707123457},
        {"metric": "opentsdbimport.bar", "value": 43,
         "timestamp": 1707123456},
    ])) in (200, 204)
    # CSV import: two metric columns per line
    assert _post(
        server,
        f"/api/v1/import/csv?{el}&"
        + urllib.parse.urlencode({
            "format": "2:metric:csv_import,3:metric:csv_import_v2,"
                      "1:label:ticker,4:label:market,5:time:unix_s"
        }),
        "GOOG,1.23,4.56,NYSE,1707123457\nMSFT,23,56,NASDAQ,1707123457",
    ) in (200, 204)
    # Zabbix connector lines
    assert _post(server, "/zabbixconnector/api/v1/history", "\n".join([
        '{"host":{"host":"h1","name":"n1"},"item_tags":[],"itemid":1,'
        '"name":"zabbixconnector_series","clock":1707123456,'
        '"ns":700000000,"value":10,"type":0}',
        '{"host":{"host":"h2","name":"n2"},'
        '"item_tags":[{"tag":"foo2","value":"value1"}],"itemid":1,'
        '"name":"zabbixconnector_series2","clock":1707123456,'
        '"ns":800000000,"value":20,"type":0}',
    ])) in (200, 204)
    _get(server, "/internal/force_flush")

    base_el = (("el1", "elv1"), ("el2", "elv2"))
    assert _raw_all(server, "influxline.+") == [
        (
            (("__name__", "influxline_series1"),) + base_el,
            [(1707123456700, 10.0)],
        ),
        (
            (("__name__", "influxline_series2"),) + base_el
            + (("label", "foo1"), ("label1", "value1"), ("label2", "value2")),
            [(1707123456800, 40.0)],
        ),
    ]
    assert _raw_all(server, "opentsdbimport.*") == [
        ((("__name__", "opentsdbimport.bar"),) + base_el,
         [(1707123456000, 43.0)]),
        ((("__name__", "opentsdbimport.foo"),) + base_el,
         [(1707123457000, 45.34)]),
    ]
    got = _raw_all(server, "csv_import.*")
    assert [
        (dict(m)["__name__"], dict(m)["ticker"], pts) for m, pts in got
    ] == [
        # sorted by the full label tuple: market=NASDAQ < NYSE
        ("csv_import", "MSFT", [(1707123457000, 23.0)]),
        ("csv_import", "GOOG", [(1707123457000, 1.23)]),
        ("csv_import_v2", "MSFT", [(1707123457000, 56.0)]),
        ("csv_import_v2", "GOOG", [(1707123457000, 4.56)]),
    ]
    assert all(dict(m)["el1"] == "elv1" for m, _ in got)
    assert _raw_all(server, "zabbixconnector.+") == [
        (
            (("__name__", "zabbixconnector_series"),
             ("host", "h1"), ("hostname", "n1")),
            [(1707123456700, 10.0)],
        ),
        (
            (("__name__", "zabbixconnector_series2"),
             ("host", "h2"), ("hostname", "n2"), ("tag_foo2", "value1")),
            [(1707123456800, 20.0)],
        ),
    ]


# ----------------------------------------------------------------------
# relabeling_test.go — ingestion-time -relabelConfig applied across
# protocols (importprometheus / influx / remote write).


RELABEL_RULES = """
- replacement: value1
  target_label: label1
- replacement: value2
  target_label: label2
- replacement: value3
  target_label: label3
- replacement: value4
  target_label: label4
- action: drop
  if: '{__name__=~"^must_drop.+"}'
- source_labels: [__name__]
  regex: '^(.+)_(.+)'
  replacement: $1
  target_label: ingestion_protocol
- source_labels: [__name__]
  regex: '^(.+)_(.+)'
  replacement: $2
  target_label: __name__
"""


@pytest.fixture(scope="module")
def relabel_server(spark):
    from victoriametrics_spark.api import PromAPI, serve
    from victoriametrics_spark.api.http import IngestAPI
    from victoriametrics_spark.schema import SAMPLE_SCHEMA
    from victoriametrics_spark.storage.layout import (
        drop_samples_table,
        write_samples_table,
    )

    table = "apptest_relabel_samples"
    write_samples_table(spark.createDataFrame([], SAMPLE_SCHEMA), table)
    ingest = IngestAPI(
        spark, samples_table=table, relabel_config=RELABEL_RULES
    )
    api = PromAPI(spark, spark.table(table), samples_table=table)
    api.reload_samples()
    srv = serve(api, port=0, ingest_api=ingest)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{port}"
    srv.shutdown()
    drop_samples_table(spark, table)


def _relabel_query(base, query, qtime):
    got = _get(base, "/api/v1/query", query=query, time=qtime)
    return sorted(
        (
            (
                dict(sorted(r["metric"].items())),
                [(int(ts * 1000), float(v)) for ts, v in r["values"]],
            )
            for r in got["data"]["result"]
        ),
        key=lambda p: sorted(p[0].items()),
    )


_RELABEL_COMMON = {
    "label1": "value1",
    "label2": "value2",
    "label3": "value3",
    "label4": "value4",
}


def test_relabeling_import_prometheus(relabel_server):
    assert _post(relabel_server, "/api/v1/import/prometheus", "\n".join([
        'importprometheus_series{label="foo"} 10 1707123456700',
        'must_drop_series{label="foo"} 20 1707123456800',
    ])) in (200, 204)
    _get(relabel_server, "/internal/force_flush")
    assert _relabel_query(
        relabel_server, '{label="foo"}[120ms]', "1707123456800"
    ) == [
        (
            {"__name__": "series", "label": "foo",
             "ingestion_protocol": "importprometheus", **_RELABEL_COMMON},
            [(1707123456700, 10.0)],
        )
    ]


def test_relabeling_influx(relabel_server):
    assert _post(relabel_server, "/influx/write", "\n".join([
        "influxline,label=foo1 series1=10,series2=30 1707123456700000000",
        "must_drop,label=foo1 series1=20,series2=40 1707123456800000000",
    ])) in (200, 204)
    _get(relabel_server, "/internal/force_flush")
    assert _relabel_query(
        relabel_server, '{label="foo1"}[120ms]', "1707123456800"
    ) == [
        (
            {"__name__": "series1", "label": "foo1",
             "ingestion_protocol": "influxline", **_RELABEL_COMMON},
            [(1707123456700, 10.0)],
        ),
        (
            {"__name__": "series2", "label": "foo1",
             "ingestion_protocol": "influxline", **_RELABEL_COMMON},
            [(1707123456700, 30.0)],
        ),
    ]


def test_relabeling_remote_write(relabel_server):
    from victoriametrics_spark.streaming.remotewrite import (
        encode_write_request,
    )

    blob = encode_write_request([
        ({"__name__": "prometheusrw_series", "label": "foo2"},
         [(1707123456700, 10.0)]),
        ({"__name__": "must_drop_series", "label": "foo2"},
         [(1707123456800, 20.0)]),
    ])
    req = urllib.request.Request(
        relabel_server + "/api/v1/write", data=blob, method="POST",
        headers={"Content-Type": "application/x-protobuf"},
    )
    with urllib.request.urlopen(req) as r:
        assert r.status in (200, 204)
    _get(relabel_server, "/internal/force_flush")
    assert _relabel_query(
        relabel_server, '{label="foo2"}[120ms]', "1707123456800"
    ) == [
        (
            {"__name__": "series", "label": "foo2",
             "ingestion_protocol": "prometheusrw", **_RELABEL_COMMON},
            [(1707123456700, 10.0)],
        )
    ]


# ----------------------------------------------------------------------
# rollup_result_cache_test.go — multitenant writes routed by
# vm_account_id/vm_project_id labels; reads narrowed by extra_filters
# over the tenant pseudo-labels (and the result cache keyed on them).


def test_multitenant_label_routing_extra_filters(mt_server):
    assert _post(
        mt_server,
        "/insert/multitenant/prometheus/api/v1/import/prometheus",
        "\n".join([
            'mt_foo_bar{vm_account_id="5"} 1.00 1652169720000',
            'mt_foo_bar{vm_account_id="5",vm_project_id="15"} 3.00'
            " 1652169720000",
        ]),
    ) in (200, 204)
    _get(mt_server, "/internal/force_flush")

    def q(extra_filters):
        got = _get(
            mt_server,
            "/select/multitenant/prometheus/api/v1/query_range",
            query="mt_foo_bar{}",
            start="2022-05-10T07:59:00.000Z",
            end="2022-05-10T08:05:00.000Z",
            step="1m",
            **{"extra_filters[]": extra_filters},
        )
        return sorted(
            [
                (
                    dict(sorted(r["metric"].items())),
                    [(ts, float(v)) for ts, v in r["values"]],
                )
                for r in got["data"]["result"]
            ],
            key=lambda p: sorted(p[0].items()),
        )

    got = q([
        '{vm_account_id="5",vm_project_id="15"}',
        '{vm_account_id="5",vm_project_id="0"}',
    ])
    assert got == [
        (
            {"__name__": "mt_foo_bar", "vm_account_id": "5",
             "vm_project_id": "0"},
            [(1652169720.0, 1.0), (1652169780.0, 1.0)],
        ),
        (
            {"__name__": "mt_foo_bar", "vm_account_id": "5",
             "vm_project_id": "15"},
            [(1652169720.0, 3.0), (1652169780.0, 3.0)],
        ),
    ]
    # extra_filters selecting an absent tenant: empty, and the previous
    # cached range must not leak across the filter change
    assert q(['{vm_account_id="99",vm_project_id="99"}']) == []


# ----------------------------------------------------------------------
# metricsmetadata_test.go — HELP/TYPE comments + remote-write Metadata
# records served by /api/v1/metadata with metric/limit filters; field
# values over 64 KiB are silently dropped at ingest.


def test_metrics_metadata(server):
    from victoriametrics_spark.streaming.remotewrite import (
        encode_write_request,
    )

    # scoped empty check (the store is shared module-wide)
    got = _get(server, "/api/v1/metadata", metric="mmd_metric_name_1")
    assert got == {"status": "success", "data": {}}

    oversized = "large help" + "\x00" * 65536
    text = "\n".join([
        "# HELP mmd_metric_name_1 some help message",
        "# TYPE mmd_metric_name_1 gauge",
        'mmd_metric_name_1{label="foo"} 10',
        'mmd_metric_name_1{label="bar"} 10',
        "# HELP mmd_metric_name_2 some help message",
        "# TYPE mmd_metric_name_2 counter",
        'mmd_metric_name_2{label="baz"} 20',
        "# HELP mmd_metric_name_3 some help message",
        "# TYPE mmd_metric_name_3 gauge",
        'mmd_metric_name_3{label="baz"} 30',
        "# HELP mmd_metric_name_4 " + oversized,
        "# TYPE mmd_metric_name_4 gauge",
        'mmd_metric_name_4{label="baz"} 30',
    ])
    assert _post(server, "/api/v1/import/prometheus", text) in (200, 204)

    blob = encode_write_request(
        [
            ({"__name__": "mmd_metric_name_4"}, [(1707123456700, 40.0)]),
            ({"__name__": "mmd_metric_name_5"}, [(1707123456700, 40.0)]),
        ],
        metadata=[
            {"metric_family_name": "mmd_metric_name_4",
             "help": "some help message", "type": 5},
            {"metric_family_name": "mmd_metric_name_5",
             "help": "some help message", "type": 5},
            {"metric_family_name": 'mmd_metric_name_7_!@"_suffix',
             "help": "some help message", "type": 7},
            {"metric_family_name": "mmd_metric_name_8",
             "help": "large_help" + "\x00" * 65536, "type": 7},
            {"metric_family_name": "mmd_metric_name_9",
             "help": "some help message", "type": 7,
             "unit": "large_unit" + "\x00" * 65536},
            {"metric_family_name": "mmd_metric_name_10" + "\x00" * 65536,
             "help": "some help message", "type": 7},
        ],
    )
    req = urllib.request.Request(
        server + "/api/v1/write", data=blob, method="POST",
        headers={"Content-Type": "application/x-protobuf"},
    )
    with urllib.request.urlopen(req) as r:
        assert r.status in (200, 204)
    _get(server, "/internal/force_flush")

    got = _get(server, "/api/v1/metadata")
    ours = {k: v for k, v in got["data"].items() if k.startswith("mmd_")}
    assert ours == {
        "mmd_metric_name_1": [{"type": "gauge", "help": "some help message"}],
        "mmd_metric_name_2": [
            {"type": "counter", "help": "some help message"}
        ],
        "mmd_metric_name_3": [{"type": "gauge", "help": "some help message"}],
        "mmd_metric_name_4": [
            {"type": "summary", "help": "some help message"}
        ],
        "mmd_metric_name_5": [
            {"type": "summary", "help": "some help message"}
        ],
        'mmd_metric_name_7_!@"_suffix': [
            {"type": "stateset", "help": "some help message"}
        ],
    }

    # metric name filter
    got = _get(server, "/api/v1/metadata", metric="mmd_metric_name_4")
    assert got["data"] == {
        "mmd_metric_name_4": [{"type": "summary", "help": "some help message"}]
    }

    # limit applies after the name sort
    got = _get(server, "/api/v1/metadata", limit="3")
    assert len(got["data"]) == 3
    assert sorted(got["data"]) == sorted(ours)[:3]


# ----------------------------------------------------------------------
# query_resource_limit_test.go — -search.maxUniqueTimeseries fails
# over-broad selector scans with 422 (per tenant on multitenant
# queries); -search.maxSeries bounds /api/v1/series.


@pytest.fixture(scope="module")
def limit_server(spark):
    from victoriametrics_spark.api import PromAPI, serve
    from victoriametrics_spark.api.http import IngestAPI
    from victoriametrics_spark.schema import SAMPLE_SCHEMA
    from victoriametrics_spark.storage.layout import (
        drop_samples_table,
        write_samples_table,
    )

    table = "apptest_limit_samples"
    seed = spark.createDataFrame([], SAMPLE_SCHEMA).withColumn(
        "tenant", F_lit_str("0:0")
    )
    write_samples_table(seed, table, n_buckets=8)
    api = PromAPI(
        spark,
        spark.table(table),
        samples_table=table,
        tenant="0:0",
        max_unique_timeseries=2,
        max_series=2,
    )
    srv = serve(
        api,
        port=0,
        ingest_api=IngestAPI(spark, samples_table=table, tenant="0:0"),
        tenant_table=table,
    )
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{port}"
    srv.shutdown()
    drop_samples_table(spark, table)


LIMIT_SAMPLES = "\n".join([
    'lim_foo_bar1{instance="a"} 1.00 1652169660000',
    'lim_foo_bar2{instance="a"} 1.00 1652169660000',
    'lim_foo_bar2{instance="b"} 2.00 1652169660000',
    'lim_foo_bar3{instance="a"} 1.00 1652169660000',
    'lim_foo_bar3{instance="b"} 2.00 1652169660000',
    'lim_foo_bar3{instance="c"} 3.00 1652169660000',
])


def _expect_422(base, path, **params):
    qs = urllib.parse.urlencode(
        {k: v for k, v in params.items() if v is not None}, doseq=True
    )
    try:
        urllib.request.urlopen(f"{base}{path}?{qs}")
        raise AssertionError("expected 422")
    except urllib.error.HTTPError as e:
        assert e.code == 422
        return json.loads(e.read())


def test_max_unique_timeseries(limit_server):
    for tenant in ("0:0", "1:15"):
        assert _post(
            limit_server,
            f"/insert/{tenant}/prometheus/api/v1/import/prometheus",
            LIMIT_SAMPLES,
        ) in (200, 204)
    _get(limit_server, "/internal/force_flush")
    t = "2022-05-10T08:05:00.000Z"

    got = _get(limit_server, "/api/v1/query", query="lim_foo_bar1", time=t)
    assert [r["metric"] for r in got["data"]["result"]] == [
        {"__name__": "lim_foo_bar1", "instance": "a"}
    ]
    # at the limit: ok
    got = _get(limit_server, "/api/v1/query", query="lim_foo_bar2", time=t)
    assert len(got["data"]["result"]) == 2
    # over the limit: 422 with the reference's message
    err = _expect_422(
        limit_server, "/api/v1/query", query="lim_foo_bar3", time=t
    )
    assert "the number of matching timeseries exceeds 2" in err["error"]
    assert "-search.maxUniqueTimeseries" in err["error"]

    # multitenant queries split per tenant: per-tenant count 2 <= limit,
    # even though the merged result has 4 series
    got = _get(
        limit_server,
        "/select/multitenant/prometheus/api/v1/query",
        query="lim_foo_bar2",
        time=t,
    )
    assert len(got["data"]["result"]) == 4
    _expect_422(
        limit_server,
        "/select/multitenant/prometheus/api/v1/query",
        query="lim_foo_bar3",
        time=t,
    )


def test_max_series_limit(limit_server):
    got = _get(
        limit_server, "/api/v1/series",
        **{"match[]": "lim_foo_bar2", "start": "2022-05-10T08:03:00.000Z"},
    )
    assert len(got["data"]) == 2
    err = _expect_422(
        limit_server, "/api/v1/series",
        **{"match[]": "lim_foo_bar3", "start": "2022-05-10T08:03:00.000Z"},
    )
    assert "-search.maxSeries=2" in err["error"]


# ----------------------------------------------------------------------
# metric_names_stats_test.go — -storage.trackMetricNamesStats: ingest
# registers names at zero, each matched series bumps its name's query
# counter, le/limit filters, TSDB-status enrichment, admin reset.


@pytest.fixture(scope="module")
def names_server(spark):
    from victoriametrics_spark.api import PromAPI, serve
    from victoriametrics_spark.api.http import IngestAPI
    from victoriametrics_spark.schema import SAMPLE_SCHEMA
    from victoriametrics_spark.storage.layout import (
        drop_samples_table,
        write_samples_table,
    )

    table = "apptest_names_samples"
    write_samples_table(spark.createDataFrame([], SAMPLE_SCHEMA), table)
    ingest = IngestAPI(spark, samples_table=table)
    api = PromAPI(
        spark, spark.table(table), samples_table=table,
        track_metric_names=True,
    )
    api.reload_samples()
    srv = serve(api, port=0, ingest_api=ingest)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{port}"
    srv.shutdown()
    drop_samples_table(spark, table)


def test_metric_names_stats(names_server):
    large = "large_metric_name_" * 32 + "1"
    data = "\n".join([
        'metric_name_1{label="foo"} 10 1707123456700',
        'metric_name_1{label="bar"} 10 1707123456700',
        'metric_name_2{label="baz"} 20 1707123456700',
        'metric_name_1{label="baz"} 10 1707123456700',
        'metric_name_3{label="baz"} 30 1707123456700',
        large + '{label="bar"} 50 1707123456700',
    ])
    assert _post(names_server, "/api/v1/import/prometheus", data) in (200, 204)
    _get(names_server, "/internal/force_flush")

    def records(**params):
        got = _get(names_server, "/api/v1/status/metric_names_stats", **params)
        return [
            (r["metricName"], r["queryRequestsCount"])
            for r in got["records"]
        ]

    # ingest registered every name with a zero query count
    assert records() == [
        (large, 0), ("metric_name_1", 0),
        ("metric_name_2", 0), ("metric_name_3", 0),
    ]

    # one query over all series: each matched series bumps its name
    _get(names_server, "/api/v1/query", query='{__name__!=""}',
         time="2024-02-05T08:57:36.700Z")
    assert records() == [
        (large, 1), ("metric_name_1", 3),
        ("metric_name_2", 1), ("metric_name_3", 1),
    ]

    # TSDB status carries the per-name request counts
    got = _get(names_server, "/api/v1/status/tsdb", date="2024-02-05")
    by_name = {
        e["name"]: e.get("requestsCount")
        for e in got["data"]["seriesCountByMetricName"]
    }
    assert by_name["metric_name_1"] == 3 and by_name[large] == 1

    # single-metric query bumps only that name
    _get(names_server, "/api/v1/query", query="metric_name_2",
         time="2024-02-05T08:57:36.700Z")
    assert records() == [
        (large, 1), ("metric_name_1", 3),
        ("metric_name_2", 2), ("metric_name_3", 1),
    ]

    # le filter drops counts above the bound
    assert records(le="2") == [
        (large, 1), ("metric_name_2", 2), ("metric_name_3", 1),
    ]

    # admin reset empties the tracker
    assert _get(
        names_server, "/api/v1/admin/status/metric_names_stats/reset"
    )["status"] == "success"
    assert records() == []


# ----------------------------------------------------------------------
# max_backfill_age_test.go — -maxBackfillAge rejects new samples older
# than the window even when -retentionPeriod would keep them; existing
# data stays searchable and deletable; fresh-enough backfill lands.


def test_max_backfill_age(spark):
    from victoriametrics_spark.api.http import IngestAPI

    YEAR = 365 * 24 * 3600 * 1000
    now = 1707123456700  # 2024-02-05T08:57:36.700Z
    batches = []

    def mk(backfill_ms):
        return IngestAPI(
            spark,
            sink=lambda df, kind: batches.append(df),
            retention_ms=YEAR,
            max_backfill_age_ms=backfill_ms,
            now_ms_fn=lambda: now,
        )

    # backfill age == retention: only the retention bound applies
    api = mk(YEAR)
    n = api.import_lines(
        f"m_out 1 {now - YEAR - 3600_000}\nm_in 2 {now - YEAR + 3600_000}",
        "prometheus",
    )
    assert n == 1
    assert [r["name"] for r in batches[-1].collect()] == ["m_in"]
    assert api.rows_ignored_total == 1

    # backfill age shorter than retention: inside-retention-but-stale
    # samples are rejected too
    api = mk(180 * 24 * 3600 * 1000)
    n = api.import_lines(
        f"m_stale 3 {now - YEAR + 3600_000}\n"
        f"m_fresh 4 {now - 180 * 24 * 3600 * 1000 + 3600_000}",
        "prometheus",
    )
    assert n == 1
    assert [r["name"] for r in batches[-1].collect()] == ["m_fresh"]

    # values above retention clamp to retention (storage.go:192-194)
    api = mk(100 * YEAR)
    n = api.import_lines(
        f"m_clamped 5 {now - YEAR - 3600_000}\nm_kept 6 {now - 3600_000}",
        "prometheus",
    )
    assert n == 1
    assert [r["name"] for r in batches[-1].collect()] == ["m_kept"]


# ----------------------------------------------------------------------
# backup_restore_test.go — snapshot → external backup dir → restore
# into a fresh table: only pre-snapshot data comes back, the live table
# is untouched, and restoring over existing data replaces it.


def test_backup_restore_roundtrip(spark, tmp_path_factory):
    from victoriametrics_spark.api.http import IngestAPI
    from victoriametrics_spark.schema import SAMPLE_SCHEMA
    from victoriametrics_spark.storage.layout import (
        drop_samples_table,
        read_samples_table,
        write_samples_table,
    )
    from victoriametrics_spark.storage.snapshot import (
        backup_snapshot,
        create_snapshot,
        restore_backup,
    )

    table, restored = "apptest_bk_samples", "apptest_bk_restored"
    backup_dir = str(tmp_path_factory.mktemp("vmbackup") / "backup1")
    write_samples_table(spark.createDataFrame([], SAMPLE_SCHEMA), table)
    ingest = IngestAPI(spark, samples_table=table)
    try:
        ingest.import_lines(
            "\n".join(f"bk_m{i} {i} 170712345670{i}" for i in range(5)),
            "prometheus",
        )
        snap = create_snapshot(spark, table)
        n_files = backup_snapshot(spark, table, snap, backup_dir)
        assert n_files > 0
        # backup destination must be empty (vmbackup refuses overwrite)
        try:
            backup_snapshot(spark, table, snap, backup_dir)
            raise AssertionError("expected non-empty destination error")
        except ValueError as e:
            assert "not empty" in str(e)

        # post-snapshot write: must NOT appear in the restore
        ingest.import_lines("bk_late 9 1707123456799", "prometheus")

        restore_backup(spark, backup_dir, restored)
        got = sorted(
            r["name"]
            for r in read_samples_table(spark, restored).collect()
        )
        assert got == [f"bk_m{i}" for i in range(5)]
        # live table untouched, still has the late row
        live = {r["name"] for r in read_samples_table(spark, table).collect()}
        assert "bk_late" in live and len(live) == 6

        # restore over existing data replaces it (vmrestore semantics)
        restore_backup(spark, backup_dir, restored)
        assert read_samples_table(spark, restored).count() == 5
    finally:
        drop_samples_table(spark, table)
        drop_samples_table(spark, restored)


# ----------------------------------------------------------------------
# multitenancy_via_headers_test.go — -enableMultitenancyViaHeaders:
# AccountID/ProjectID HTTP headers pick the tenant on insert AND
# select; AccountID: multitenant searches all tenants with the
# vm_account_id/vm_project_id pseudo-labels attached.


@pytest.fixture(scope="module")
def hdr_server(spark):
    from victoriametrics_spark.api import PromAPI, serve
    from victoriametrics_spark.api.http import IngestAPI
    from victoriametrics_spark.schema import SAMPLE_SCHEMA
    from victoriametrics_spark.storage.layout import (
        drop_samples_table,
        write_samples_table,
    )

    table = "apptest_hdr_samples"
    seed = spark.createDataFrame([], SAMPLE_SCHEMA).withColumn(
        "tenant", F_lit_str("0:0")
    )
    write_samples_table(seed, table, n_buckets=8)
    api = PromAPI(spark, spark.table(table), samples_table=table,
                  tenant="0:0")
    srv = serve(
        api,
        port=0,
        ingest_api=IngestAPI(spark, samples_table=table, tenant="0:0"),
        tenant_table=table,
        multitenancy_via_headers=True,
    )
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{port}"
    srv.shutdown()
    drop_samples_table(spark, table)


def _hget(base, path, headers, **params):
    qs = urllib.parse.urlencode(
        {k: v for k, v in params.items() if v is not None}, doseq=True
    )
    req = urllib.request.Request(f"{base}{path}?{qs}", headers=headers)
    with urllib.request.urlopen(req) as r:
        return json.loads(r.read())


def _hpost(base, path, body, headers):
    req = urllib.request.Request(
        f"{base}{path}", data=body.encode(), method="POST", headers=headers
    )
    with urllib.request.urlopen(req) as r:
        return r.status


MT_HDR = {"AccountID": "multitenant"}
HDR_SAMPLES = "\n".join([
    "hdr_foo_bar 1.00 1652169600000",
    "hdr_foo_bar 2.00 1652169660000",
    "hdr_foo_bar 3.00 1652169720000",
])


def test_multitenancy_via_headers(hdr_server):
    t = "2022-05-10T08:05:00.000Z"
    # empty multitenant search before any writes
    got = _hget(hdr_server, "/api/v1/query", MT_HDR,
                query="hdr_foo_bar", step="5m",
                time="2022-05-10T08:03:00.000Z")
    assert got["data"]["result"] == []

    tenant_headers = [
        {"AccountID": "1", "ProjectID": "1"},
        {"AccountID": "1", "ProjectID": "15"},
        {"AccountID": "2"},
        {"ProjectID": "3"},
    ]
    for h in tenant_headers:
        assert _hpost(
            hdr_server, "/api/v1/import/prometheus", HDR_SAMPLES, h
        ) in (200, 204)
        _get(hdr_server, "/internal/force_flush")
        got = _hget(hdr_server, "/api/v1/query", h,
                    query="hdr_foo_bar", time=t)
        assert got["data"]["result"] == [
            {"metric": {"__name__": "hdr_foo_bar"},
             "value": [1652169900.0, "3"]}
        ]

    # multitenant header searches all tenants with pseudo-labels
    got = _hget(hdr_server, "/api/v1/query", MT_HDR,
                query="hdr_foo_bar", time=t)
    metrics = sorted(
        (r["metric"]["vm_account_id"], r["metric"]["vm_project_id"])
        for r in got["data"]["result"]
    )
    assert metrics == [("0", "3"), ("1", "1"), ("1", "15"), ("2", "0")]
    assert all(
        r["value"] == [1652169900.0, "3"] for r in got["data"]["result"]
    )

    # range aggregation BY tenant labels
    got = _hget(hdr_server, "/api/v1/query_range", MT_HDR,
                query="sum(hdr_foo_bar) by(vm_account_id,vm_project_id)",
                start="2022-05-10T07:59:00.000Z",
                end="2022-05-10T08:05:00.000Z", step="1m")
    assert len(got["data"]["result"]) == 4
    for r in got["data"]["result"]:
        assert [(ts, v) for ts, v in r["values"]][:4] == [
            (1652169600.0, "1"), (1652169660.0, "2"),
            (1652169720.0, "3"), (1652169780.0, "3"),
        ]

    # multitenant ingest via header: tenants populated from labels
    assert _hpost(hdr_server, "/api/v1/import/prometheus", "\n".join([
        'hdr_foo_bar{vm_account_id="5"} 1.00 1652169720000',
        'hdr_foo_bar{vm_project_id="10"} 2.00 1652169660000',
        'hdr_foo_bar{vm_account_id="5",vm_project_id="15"} 3.00'
        " 1652169720000",
    ]), MT_HDR) in (200, 204)
    _get(hdr_server, "/internal/force_flush")

    # selector filters on the tenant pseudo-labels
    got = _hget(hdr_server, "/api/v1/query", MT_HDR,
                query='hdr_foo_bar{vm_account_id="5"}', time=t)
    res = sorted(
        (r["metric"]["vm_project_id"], r["value"][1])
        for r in got["data"]["result"]
    )
    assert res == [("0", "1"), ("15", "3")]

    # /api/v1/series with extra_filters over tenant pseudo-labels
    got = _hget(hdr_server, "/api/v1/series", MT_HDR,
                start="2022-05-10T08:00:00.000Z",
                end="2022-05-10T08:30:00.000Z",
                **{"match[]": "hdr_foo_bar",
                   "extra_filters[]": '{vm_project_id="15"}'})
    pairs = sorted(
        (m["vm_account_id"], m["vm_project_id"]) for m in got["data"]
    )
    assert pairs == [("1", "15"), ("5", "15")]


def test_multitenant_label_canonicalization_and_tenant_metadata(mt_server):
    """Self-review regressions: (a) zero-padded/non-numeric
    vm_account_id labels canonicalize like parse_tenant instead of
    minting unreachable partitions; (b) tenant-routed /api/v1/metadata
    reads the canonical tenant keyspace; (c) bad tenant headers/tokens
    on POST return clean 400s."""
    # (a) "01" canonicalizes to account 1; "junk" falls back to 0
    assert _post(
        mt_server,
        "/insert/multitenant/prometheus/api/v1/import/prometheus",
        "\n".join([
            'canon_m{vm_account_id="01",vm_project_id="002"} 5'
            " 1652169720000",
            'canon_m{vm_account_id="junk"} 7 1652169720000',
        ]),
    ) in (200, 204)
    _get(mt_server, "/internal/force_flush")
    got = _get(mt_server, "/select/1:2/prometheus/api/v1/query",
               query="canon_m", time="2022-05-10T08:05:00.000Z")
    assert [r["value"][1] for r in got["data"]["result"]] == ["5"]
    got = _get(mt_server, "/select/0/prometheus/api/v1/query",
               query="canon_m", time="2022-05-10T08:05:00.000Z")
    assert [r["value"][1] for r in got["data"]["result"]] == ["7"]

    # (b) tenant-routed ingest metadata served on the tenant route,
    # account-only token canonicalized ("3" -> "3:0")
    assert _post(
        mt_server,
        "/insert/3/prometheus/api/v1/import/prometheus",
        "# HELP md_canon_m tenant help\n# TYPE md_canon_m gauge\n"
        "md_canon_m 1 1652169720000",
    ) in (200, 204)
    got = _get(mt_server, "/select/3/prometheus/api/v1/metadata")
    assert got["data"] == {
        "md_canon_m": [{"type": "gauge", "help": "tenant help"}]
    }
    # other tenants do not see it
    got = _get(mt_server, "/select/4/prometheus/api/v1/metadata")
    assert got["data"] == {}

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
    yield f"http://127.0.0.1:{port}"
    srv.shutdown()
    drop_samples_table(spark, table)


def _get(base: str, path: str, **params) -> dict:
    qs = urllib.parse.urlencode(
        {k: v for k, v in params.items() if v is not None}
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

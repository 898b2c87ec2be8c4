"""Alertmanager notification delivery (app/vmalert/notifier): firing
and resolved alerts POST to /api/v2/alerts in the amRequest JSON shape;
/api/v1/notifiers lists the targets."""

from __future__ import annotations

import json
import threading
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from victoriametrics_spark.api import PromAPI, serve
from victoriametrics_spark.notifier import (
    AlertmanagerNotifier,
    AlertStateTracker,
    RulesNotifierRunner,
)
from victoriametrics_spark.rules import AlertingRule
from victoriametrics_spark.schema import SAMPLE_SCHEMA


@pytest.fixture()
def am_sink():
    """A local Alertmanager-shaped sink capturing POSTed batches."""
    batches: list = []

    class Sink(BaseHTTPRequestHandler):
        def do_POST(self):  # noqa: N802
            n = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(n)
            batches.append((self.path, json.loads(body)))
            self.send_response(200)
            self.send_header("Content-Length", "0")
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Sink)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", batches
    srv.shutdown()


def test_fire_and_resolve_payloads(spark, am_sink):
    """An alert that fires then stops: first tick POSTs the firing
    alert (startsAt, labels, annotations, no endsAt), a later tick
    POSTs it once more with endsAt set (alertmanager_request.qtpl)."""
    url, batches = am_sink
    # cpu > 90 holds during [0, 1.2e6]; later samples drop to 10
    rows = []
    for ts in range(0, 2_100_000, 100_000):
        v = 95.0 if ts <= 1_200_000 else 10.0
        rows.append(("cpu", {"host": "a"}, ts, v, False))
    df = spark.createDataFrame(rows, SAMPLE_SCHEMA)
    rule = AlertingRule(
        alert="HighCPU",
        expr="last_over_time(cpu[400s]) > 90",
        labels={"severity": "page"},
        annotations={"summary": "cpu is high"},
    )
    api = PromAPI(spark, df, rule_groups=[("g1", [rule])])
    runner = RulesNotifierRunner(api, AlertmanagerNotifier([url]))

    sent = runner.tick(now_ms=1_000_000)  # alert firing at t=1000s
    assert len(sent) == 1 and "endsAt" not in sent[0]
    path, batch = batches[-1]
    assert path == "/api/v2/alerts"
    (a,) = batch
    assert a["labels"]["alertname"] == "HighCPU"
    assert a["labels"]["severity"] == "page"
    assert a["labels"]["host"] == "a"
    assert a["annotations"] == {"summary": "cpu is high"}
    assert a["startsAt"].endswith("Z") and "endsAt" not in a
    assert "generatorURL" in a

    # still firing on the next tick → resent with the SAME startsAt
    runner.tick(now_ms=1_200_000)
    (_, batch2) = batches[-1]
    assert batch2[0]["startsAt"] == a["startsAt"]

    # stopped firing → one resolved notification with endsAt
    runner.tick(now_ms=2_000_000)
    (_, batch3) = batches[-1]
    (r,) = batch3
    assert r["labels"]["alertname"] == "HighCPU"
    assert r["startsAt"] == a["startsAt"]
    assert r["endsAt"] == "1970-01-01T00:33:20Z"  # 2_000_000 ms

    # nothing active, nothing resolved → no POST this tick
    n = len(batches)
    assert runner.tick(now_ms=2_000_000) == []
    assert len(batches) == n


def test_notifiers_endpoint_and_delivery_error(spark, am_sink):
    """/api/v1/notifiers lists targets in the ApiNotifier shape
    (notifier/web.go); a dead target records lastError without
    breaking the tick."""
    url, batches = am_sink
    rows = [("cpu", {"host": "a"}, ts, 95.0, False)
            for ts in range(0, 1_300_000, 100_000)]
    df = spark.createDataFrame(rows, SAMPLE_SCHEMA)
    rule = AlertingRule(alert="Hot", expr="last_over_time(cpu[400s]) > 90")
    api = PromAPI(spark, df, rule_groups=[("g", [rule])])
    notifier = AlertmanagerNotifier([url, "http://127.0.0.1:1"])
    runner = RulesNotifierRunner(api, notifier)
    srv = serve(api, port=0, notifier_runner=runner)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        runner.tick(now_ms=1_000_000)
        # the live sink got the batch; the dead target recorded an error
        assert batches and batches[-1][1][0]["labels"]["alertname"] == "Hot"
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/api/v1/notifiers"
        ) as resp:
            out = json.loads(resp.read())
        (nt,) = out["data"]["notifiers"]
        assert nt["kind"] == "alertmanager"
        by_addr = {t["address"]: t for t in nt["targets"]}
        assert by_addr[url + "/api/v2/alerts"]["lastError"] == ""
        assert by_addr["http://127.0.0.1:1/api/v2/alerts"]["lastError"]
    finally:
        srv.shutdown()


def test_tracker_unit():
    """AlertStateTracker transition table."""
    tr = AlertStateTracker()
    fire = [{"labels": {"alertname": "X"}, "annotations": {}}]
    p1 = tr.update(fire, 1_000)
    assert len(p1) == 1 and "endsAt" not in p1[0]
    p2 = tr.update(fire, 2_000)
    assert p2[0]["startsAt"] == p1[0]["startsAt"]
    p3 = tr.update([], 3_000)
    assert len(p3) == 1 and p3[0]["endsAt"] == "1970-01-01T00:00:03Z"
    assert tr.update([], 4_000) == []
    # refiring starts a NEW startsAt
    p5 = tr.update(fire, 5_000)
    assert p5[0]["startsAt"] == "1970-01-01T00:00:05Z"


def test_alerts_endpoint_serves_runner_state_without_spark(spark, am_sink):
    """/api/v1/alerts default path reads the runner's in-memory state
    (vmalert web.go APIv1 alerts) — no max(ts) probe, no rule
    re-evaluation, no Spark job per request. Explicit time= keeps the
    evaluate-at-instant path."""
    url, _batches = am_sink
    rows = [("cpu", {"host": "a"}, ts, 95.0, False) for ts in range(0, 1_100_000, 100_000)]
    df = spark.createDataFrame(rows, SAMPLE_SCHEMA)
    rule = AlertingRule(
        alert="HighCPU",
        expr="last_over_time(cpu[400s]) > 90",
        labels={"severity": "page"},
    )
    api = PromAPI(spark, df, rule_groups=[("g1", [rule])])
    runner = RulesNotifierRunner(api, AlertmanagerNotifier([url]))
    assert api.notifier_runner is runner

    runner.tick(now_ms=1_000_000)

    # poison the Spark surface: ANY touch of api.samples would raise —
    # proving the default path runs zero Spark work
    class _Poison:
        def __getattr__(self, name):
            raise AssertionError("alerts() default path touched Spark")

    real = api.samples
    api.samples = _Poison()
    try:
        out = api.alerts()
        alerts = out["data"]["alerts"]
        assert len(alerts) == 1
        assert alerts[0]["labels"]["alertname"] == "HighCPU"
        assert alerts[0]["state"] == "firing"
    finally:
        api.samples = real

    # explicit time= still evaluates (fresh result, Spark path)
    out2 = api.alerts(time="1000")
    assert out2["data"]["alerts"][0]["labels"]["alertname"] == "HighCPU"

    # before any tick, a fresh runner leaves the evaluation fallback
    api2 = PromAPI(spark, df, rule_groups=[("g1", [rule])])
    runner2 = RulesNotifierRunner(api2, AlertmanagerNotifier([url]))
    assert runner2.last_alerts is None
    out3 = api2.alerts()  # falls back to evaluation, must not crash
    assert out3["status"] == "success"


def test_alerts_api_shape(spark, am_sink):
    """rule.ApiAlert shape (app/vmalert/rule/web.go:144-171): state,
    name, value, labels, annotations, activeAt, id/rule_id/group_id,
    expression, source — and activeAt points at the start of the
    contiguous active run."""
    url, _ = am_sink
    rows = [
        ("cpu", {"host": "a"}, ts, 95.0 if ts >= 600_000 else 10.0, False)
        for ts in range(0, 1_100_000, 100_000)
    ]
    df = spark.createDataFrame(rows, SAMPLE_SCHEMA)
    rule = AlertingRule(
        alert="HighCPU",
        expr="last_over_time(cpu[400s]) > 90",
        labels={"severity": "page"},
        annotations={"summary": "s"},
    )
    api = PromAPI(spark, df, rule_groups=[("g1", [rule])])
    out = api.alerts(time="1000")
    (a,) = out["data"]["alerts"]
    assert a["name"] == "HighCPU"
    assert a["state"] == "firing"
    assert a["labels"]["alertname"] == "HighCPU"
    assert a["annotations"] == {"summary": "s"}
    assert a["expression"] == rule.expr
    assert a["id"].isdigit() and a["rule_id"].isdigit()
    assert a["group_id"].isdigit()
    assert a["source"].startswith("vmalert/alert?group_id=")
    assert a["restored"] is False and a["stabilizing"] is False
    # firing since ~600s (condition true from 600_000 on); activeAt is
    # the start of the contiguous active run on the eval grid
    assert a["activeAt"].endswith("Z")
    from datetime import datetime

    active_ms = datetime.fromisoformat(
        a["activeAt"].replace("Z", "+00:00")
    ).timestamp() * 1000
    assert 400_000 <= active_ms <= 700_000


def test_alerts_match_filter_and_single_alert(spark, am_sink):
    """match[] filtering on /api/v1/alerts (areLabelsMatch, OR across
    selectors) and the /api/v1/alert single-alert lookup by
    group_id/alert_id (web.go:268-282)."""
    url, _ = am_sink
    rows = [
        ("cpu", {"host": h}, ts, 95.0, False)
        for h in ("a", "b")
        for ts in range(0, 1_100_000, 100_000)
    ]
    df = spark.createDataFrame(rows, SAMPLE_SCHEMA)
    rule = AlertingRule(alert="HighCPU", expr="last_over_time(cpu[400s]) > 90")
    api = PromAPI(spark, df, rule_groups=[("g1", [rule])])
    both = api.alerts(time="1000")["data"]["alerts"]
    assert len(both) == 2
    only_a = api.alerts(time="1000", match=['{host="a"}'])["data"]["alerts"]
    assert len(only_a) == 1 and only_a[0]["labels"]["host"] == "a"
    regex = api.alerts(time="1000", match=['{host=~"a|b"}'])["data"]["alerts"]
    assert len(regex) == 2
    none = api.alerts(time="1000", match=['{host="zzz"}'])["data"]["alerts"]
    assert none == []
    # OR across multiple match[] selectors
    or_two = api.alerts(
        time="1000", match=['{host="a"}', '{host="b"}']
    )["data"]["alerts"]
    assert len(or_two) == 2

    a = both[0]
    got = api.get_alert(a["group_id"], a["id"], time="1000")
    assert got is not None and got["labels"] == a["labels"]
    assert api.get_alert(a["group_id"], "0", time="1000") is None


def test_rules_api_embeds_runner_alerts(spark, am_sink):
    """rule.ApiRule (web.go:77-122): with a runner attached, alerting
    rules embed their current alerts from the state snapshot and
    derive state firing > pending > inactive — no Spark work."""
    url, _ = am_sink
    rows = [
        ("cpu", {"host": "a"}, ts, 95.0, False)
        for ts in range(0, 1_100_000, 100_000)
    ]
    df = spark.createDataFrame(rows, SAMPLE_SCHEMA)
    r1 = AlertingRule(alert="HighCPU", expr="last_over_time(cpu[400s]) > 90")
    r2 = AlertingRule(alert="Quiet", expr="last_over_time(cpu[400s]) > 999")
    api = PromAPI(spark, df, rule_groups=[("g1", [r1, r2])])
    runner = RulesNotifierRunner(api, AlertmanagerNotifier([url]))
    runner.tick(now_ms=1_000_000)

    real = api.samples

    class _Poison:
        def __getattr__(self, name):
            raise AssertionError("rules() touched Spark")

    api.samples = _Poison()
    try:
        groups = api.rules()["data"]["groups"]
    finally:
        api.samples = real
    by = {r["name"]: r for r in groups[0]["rules"]}
    assert by["HighCPU"]["state"] == "firing"
    assert by["HighCPU"]["alerts"][0]["labels"]["alertname"] == "HighCPU"
    assert by["Quiet"]["state"] == "inactive" and "alerts" not in by["Quiet"]
    assert by["HighCPU"]["keep_firing_for"] == 0.0


def test_rules_api_filters(spark, am_sink):
    """Prometheus rules-API filters (web.go rulesFilter): type,
    rule_name[], exclude_alerts."""
    from victoriametrics_spark.rules import RecordingRule

    url, _ = am_sink
    rows = [
        ("cpu", {"host": "a"}, ts, 95.0, False)
        for ts in range(0, 1_100_000, 100_000)
    ]
    df = spark.createDataFrame(rows, SAMPLE_SCHEMA)
    r1 = AlertingRule(alert="HighCPU", expr="last_over_time(cpu[400s]) > 90")
    rec = RecordingRule(record="cpu:rec", expr="last_over_time(cpu[400s])")
    api = PromAPI(spark, df, rule_groups=[("g1", [r1, rec])])
    runner = RulesNotifierRunner(api, AlertmanagerNotifier([url]))
    runner.tick(now_ms=1_000_000)

    all_rules = api.rules()["data"]["groups"][0]["rules"]
    assert {r["type"] for r in all_rules} == {"alerting", "recording"}
    only_alert = api.rules(type="alert")["data"]["groups"][0]["rules"]
    assert [r["type"] for r in only_alert] == ["alerting"]
    only_rec = api.rules(type="record")["data"]["groups"][0]["rules"]
    assert [r["type"] for r in only_rec] == ["recording"]
    named = api.rules(rule_name=["cpu:rec"])["data"]["groups"][0]["rules"]
    assert [r["name"] for r in named] == ["cpu:rec"]
    bare = api.rules(type="alert", exclude_alerts=True)
    assert "alerts" not in bare["data"]["groups"][0]["rules"][0]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        api.rules(type="bogus")

"""Recording/alerting rules (victoriametrics_spark/rules.py) — the
vmalert analog as batch jobs."""

from __future__ import annotations

import pytest

from victoriametrics_spark import EvalConfig, evaluate
from victoriametrics_spark.rules import (
    AlertingRule,
    RecordingRule,
    eval_alerting_rule,
    eval_recording_rule,
    run_rules,
)
from victoriametrics_spark.schema import SAMPLE_SCHEMA

CFG = EvalConfig(start=1_000_000, end=2_000_000, step=200_000)


@pytest.fixture(scope="module")
def samples(spark):
    rows = []
    for i, ts in enumerate(range(0, 2_100_000, 100_000)):
        rows.append(("req_total", {"job": "api"}, ts, float(10 * i), False))
        # cpu crosses the alert threshold from ts=1.4M onwards
        rows.append(
            ("cpu", {"host": "h1"}, ts, 10.0 if ts < 1_400_000 else 95.0, False)
        )
        rows.append(("cpu", {"host": "h2"}, ts, 20.0, False))
    return spark.createDataFrame(rows, SAMPLE_SCHEMA)


def test_recording_rule(spark, samples):
    rule = RecordingRule(
        record="job:req:rate400s",
        expr="sum(rate(req_total[400s])) by (job)",
        labels={"env": "prod"},
    )
    out = eval_recording_rule(spark, samples, rule, CFG).collect()
    assert {r["name"] for r in out} == {"job:req:rate400s"}
    assert all(r["labels"]["env"] == "prod" for r in out)
    assert all(r["labels"]["job"] == "api" for r in out)
    # rate of +10 per 100s = 0.1/s
    assert all(abs(r["value"] - 0.1) < 1e-9 for r in out)


def test_alerting_rule_pending_then_firing(spark, samples):
    rule = AlertingRule(
        alert="HighCPU",
        expr="last_over_time(cpu[200s]) > 90",
        for_ms=400_000,
        labels={"severity": "page"},
    )
    out = eval_alerting_rule(spark, samples, rule, CFG).collect()
    alerts = {
        (r["ts"], r["labels"]["alertstate"]): r
        for r in out
        if r["name"] == "ALERTS"
    }
    # condition holds from grid ts 1.4M; firing after 400s hold (>= 1.8M)
    assert (1_400_000, "pending") in alerts
    assert (1_600_000, "pending") in alerts
    assert (1_800_000, "firing") in alerts
    assert (2_000_000, "firing") in alerts
    a = alerts[(1_800_000, "firing")]
    assert a["labels"]["alertname"] == "HighCPU"
    assert a["labels"]["severity"] == "page"
    assert a["labels"]["host"] == "h1"
    # h2 never crosses → no alert rows for it
    assert all(r["labels"].get("host") != "h2" for r in out)
    # ALERTS_FOR_STATE carries activation ts (seconds)
    fs = [r for r in out if r["name"] == "ALERTS_FOR_STATE"]
    assert {r["value"] for r in fs} == {1400.0}


def test_run_rules_write_back_queryable(spark, samples):
    from victoriametrics_spark.storage import drop_samples_table

    drop_samples_table(spark, "t_rules")
    rules = [
        RecordingRule(record="cpu:max", expr="max(last_over_time(cpu[200s]))"),
        AlertingRule(alert="Any", expr="last_over_time(cpu[200s]) > 90"),
    ]
    out = run_rules(spark, samples, rules, CFG, write_table="t_rules")
    names = {r["name"] for r in out.collect()}
    assert {"cpu:max", "ALERTS", "ALERTS_FOR_STATE"} <= names
    # written-back series are queryable through the engine
    from victoriametrics_spark.storage import read_samples_table

    back = read_samples_table(spark, "t_rules")
    res = evaluate(spark, "last_over_time(ALERTS[200s])", back, CFG)
    assert res.count() > 0

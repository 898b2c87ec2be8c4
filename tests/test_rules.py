"""Recording/alerting rules (victoriametrics_spark/rules.py) — the
vmalert analog as batch jobs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

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


def test_keep_firing_for(spark):
    """keep_firing_for (alerting.go:34,535,560-580): a FIRING alert
    whose condition disappears keeps firing until keep_firing_for
    elapses since the first absent tick; re-appearing keeps it firing
    with no pending restart; a PENDING alert dies immediately."""
    from victoriametrics_spark import EvalConfig
    from victoriametrics_spark.rules import AlertingRule, eval_alerting_rule
    from victoriametrics_spark.schema import SAMPLE_SCHEMA

    STEP = 100_000
    # condition true at t=0..300k, absent 400k-500k, true again 600k,
    # absent from 700k on
    true_ts = [0, 100_000, 200_000, 300_000, 600_000]
    rows = [("up", {"job": "x"}, t, 0.0, False) for t in true_ts]
    df = spark.createDataFrame(rows, SAMPLE_SCHEMA)
    rule = AlertingRule(
        alert="Down",
        expr="up == 0",
        for_ms=200_000,
        keep_firing_for_ms=250_000,
    )
    cfg = EvalConfig(start=0, end=1_200_000, step=STEP, max_lookback=50_000)
    out = eval_alerting_rule(spark, df, rule, cfg)
    got = {
        r["ts"]: dict(r["labels"])["alertstate"]
        for r in out.filter(F.col("name") == "ALERTS").collect()
    }
    # the engine's staleness lookback keeps the condition present at
    # 400k (sample at 300k) and 700k (sample at 600k); absent at
    # 500k and from 800k on
    assert got[0] == "pending" and got[100_000] == "pending"
    assert got[200_000] == "firing" and got[400_000] == "firing"
    # absent at 500k: kept firing (keep window 250k from 500k)
    assert got[500_000] == "firing"
    # back at 600k: STAYS firing, no pending restart (alerting.go:531)
    assert got[600_000] == "firing" and got[700_000] == "firing"
    # absent from 800k: kept at 800k, 900k, 1000k (<250k since 800k);
    # inactive from 1050k → no rows
    assert got[1_000_000] == "firing"
    assert 1_100_000 not in got and 1_200_000 not in got
    # FOR_STATE rows exist only where the condition holds
    fs_ts = {
        r["ts"]
        for r in out.filter(F.col("name") == "ALERTS_FOR_STATE").collect()
    }
    assert fs_ts == {0, 100_000, 200_000, 300_000, 400_000, 600_000, 700_000}

    # without keep_firing_for the same data resolves at the first gap
    # and RESTARTS pending on return
    rule0 = AlertingRule(alert="Down", expr="up == 0", for_ms=200_000)
    out0 = eval_alerting_rule(spark, df, rule0, cfg)
    got0 = {
        r["ts"]: dict(r["labels"])["alertstate"]
        for r in out0.filter(F.col("name") == "ALERTS").collect()
    }
    assert 500_000 not in got0
    assert got0[600_000] == "pending"


def test_keep_firing_stabilizing_in_alerts_api(spark):
    from victoriametrics_spark.api.http import PromAPI
    from victoriametrics_spark.rules import AlertingRule
    from victoriametrics_spark.schema import SAMPLE_SCHEMA

    rows = [
        ("up", {"job": "x"}, t, 0.0, False)
        for t in range(0, 700_000, 100_000)
    ]
    df = spark.createDataFrame(rows, SAMPLE_SCHEMA)
    rule = AlertingRule(
        alert="Down",
        expr="last_over_time(up[150s]) == 0",
        keep_firing_for_ms=600_000,
    )
    api = PromAPI(spark, df, rule_groups=[("g", [rule])])
    # at t=600s the condition holds → firing, not stabilizing
    (a,) = api.alerts(time="600")["data"]["alerts"]
    assert a["state"] == "firing" and a["stabilizing"] is False
    # at t=1000s the condition is gone but keep_firing_for holds it
    (a2,) = api.alerts(time="1000")["data"]["alerts"]
    assert a2["state"] == "firing" and a2["stabilizing"] is True

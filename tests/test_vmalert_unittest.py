"""vmalert-tool unittest harness (victoriametrics_spark/vmalert_unittest.py;
reference app/vmalert-tool/unittest): promtool value notation, rule-file
loading, expr tests, alert state tests, templates, stale markers."""

from __future__ import annotations

import textwrap

import pytest

from victoriametrics_spark.vmalert_unittest import (
    parse_series_values,
    run_unittest,
    run_unittest_files,
)


def test_value_notation():
    """input.go parseInputValue semantics."""
    assert parse_series_values("1") == [1.0]
    assert parse_series_values("1+1x2") == [1.0, 2.0, 3.0]
    assert parse_series_values("5-1x2") == [5.0, 4.0, 3.0]
    assert parse_series_values("2x2") == [2.0, 2.0, 2.0]
    assert parse_series_values("0x2") == [0.0, 0.0, 0.0]
    assert parse_series_values("_x3") == [None, None, None]
    assert parse_series_values("_ 4") == [None, 4.0]
    assert parse_series_values("1e2x1") == [100.0, 100.0]
    out = parse_series_values("1 stale")
    assert out[0] == 1.0 and out[1] is not None and out[1] != 1.0
    with pytest.raises(ValueError):
        parse_series_values("stale+1x2")
    with pytest.raises(ValueError):
        parse_series_values("")
    with pytest.raises(ValueError):
        parse_series_values("bogus")


RULES = {
    "groups": [
        {
            "name": "g1",
            "rules": [
                {
                    "record": "t1",
                    "expr": "sum(test)",
                    "labels": {"cluster": "prod"},
                },
                {
                    "alert": "InstanceDown",
                    "expr": "up == 0",
                    "for": "5m",
                    "labels": {"severity": "page"},
                    "annotations": {
                        "summary": "host {{ $labels.instance }} down",
                        "val": "{{ $value }}",
                    },
                },
            ],
        }
    ]
}


@pytest.mark.slow
def test_expr_and_alert_cases(spark):
    doc = {
        "evaluation_interval": "1m",
        "tests": [
            {
                "name": "t",
                "input_series": [
                    {
                        "series": 'up{job="node", instance="h1"}',
                        "values": "0x10",
                    },
                    {"series": "test", "values": "0+1x10"},
                ],
                "metricsql_expr_test": [
                    {
                        "expr": "test",
                        "eval_time": "3m",
                        "exp_samples": [
                            {"labels": '{__name__="test"}', "value": 3}
                        ],
                    },
                    {
                        "expr": "t1",
                        "eval_time": "4m",
                        "exp_samples": [
                            {
                                "labels": '{__name__="t1", cluster="prod"}',
                                "value": 4,
                            }
                        ],
                    },
                    {
                        # ALERTS series materialized with alertgroup label
                        "expr": (
                            "count(ALERTS) by (alertgroup, alertname,"
                            " alertstate)"
                        ),
                        "eval_time": "2m",
                        "exp_samples": [
                            {
                                "labels": (
                                    '{alertgroup="g1",'
                                    ' alertname="InstanceDown",'
                                    ' alertstate="pending"}'
                                ),
                                "value": 1,
                            }
                        ],
                    },
                ],
                "alert_rule_test": [
                    {
                        "eval_time": "2m",
                        "groupname": "g1",
                        "alertname": "InstanceDown",
                        "exp_alerts": [],  # still pending
                    },
                    {
                        "eval_time": "6m",
                        "groupname": "g1",
                        "alertname": "InstanceDown",
                        "exp_alerts": [
                            {
                                "exp_labels": {
                                    "job": "node",
                                    "instance": "h1",
                                    "severity": "page",
                                },
                                "exp_annotations": {
                                    "summary": "host h1 down",
                                    "val": "0",
                                },
                            }
                        ],
                    },
                ],
            }
        ],
    }
    assert run_unittest(spark, doc, [RULES]) == []


def test_failure_is_reported(spark):
    doc = {
        "evaluation_interval": "1m",
        "tests": [
            {
                "name": "bad",
                "input_series": [
                    {"series": "test", "values": "0+1x5"}
                ],
                "metricsql_expr_test": [
                    {
                        "expr": "test",
                        "eval_time": "3m",
                        "exp_samples": [
                            {"labels": '{__name__="test"}', "value": 99}
                        ],
                    }
                ],
            }
        ],
    }
    fails = run_unittest(spark, doc, [RULES])
    assert len(fails) == 1 and "expected" in fails[0]


def test_stale_marker_hides_series(spark):
    doc = {
        "evaluation_interval": "1m",
        "tests": [
            {
                "name": "stale",
                "input_series": [
                    {"series": "s1", "values": "1x3 stale"}
                ],
                "metricsql_expr_test": [
                    {
                        "expr": "s1",
                        "eval_time": "3m",
                        "exp_samples": [
                            {"labels": '{__name__="s1"}', "value": 1}
                        ],
                    },
                    {"expr": "s1", "eval_time": "5m", "exp_samples": []},
                ],
            }
        ],
    }
    assert run_unittest(spark, doc, [RULES]) == []


def test_run_unittest_files(spark, tmp_path):
    import yaml

    (tmp_path / "rules.yaml").write_text(yaml.safe_dump(RULES))
    test_doc = {
        "rule_files": ["rules.yaml"],
        "evaluation_interval": "1m",
        "tests": [
            {
                "name": "file-based",
                "input_series": [
                    {"series": "test", "values": "0+2x5"}
                ],
                "metricsql_expr_test": [
                    {
                        "expr": "t1",
                        "eval_time": "2m",
                        "exp_samples": [
                            {
                                "labels": '{__name__="t1", cluster="prod"}',
                                "value": 4,
                            }
                        ],
                    }
                ],
            }
        ],
    }
    p = tmp_path / "test.yaml"
    p.write_text(yaml.safe_dump(test_doc))
    out = run_unittest_files(spark, [str(p)])
    assert out == {str(p): []}

"""vmalert-tool unittest — rule unit testing over the Spark engine.

The reference ships ``vmalert-tool unittest`` (app/vmalert-tool/unittest:
unittest.go, input.go, type.go): YAML test files declare synthetic
``input_series`` in the promtool value notation (``1+2x5``, ``_``,
``stale``), then assert instant-query results (``metricsql_expr_test``)
and alert states (``alert_rule_test``) at given eval times against rule
files. Series start at 2000-01-01T00:00:00Z (unittest.go testStartTime).

Spark form: the input series expand driver-side into a canonical samples
frame (they are test-sized by construction); recording rules and ALERTS
series materialize group-by-group through the batch rules engine
(rules.py), each group's output unioned into the frame so later groups
and expr tests see earlier groups' series — the remote-write loop the
reference runs against a scratch vmstorage, without the server.

Template support in annotations is the practical subset: ``{{ $value }}``
and ``{{ $labels.<name> }}``; anything else is left verbatim.

Value-notation semantics follow input.go parseInputValue exactly:
``v``→one sample, ``_``→one omitted, ``_xN``→N omitted, ``vxN``→N+1
copies, ``a+bxN``→a+b·i for i=0..N, ``a-bxN``→a−b·i, ``stale``→a
staleness marker.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from victoriametrics_spark.engine.evalcfg import EvalConfig
from victoriametrics_spark.rules import (
    AlertingRule,
    RecordingRule,
    eval_alerting_rule,
    eval_recording_rule,
)
from victoriametrics_spark.schema import SAMPLE_SCHEMA

TEST_START_MS = 946_684_800_000  # 2000-01-01T00:00:00Z (unittest.go:48)

_NUM = r"[+-]?(?:\d+(?:\.\d*)?|\.\d+|inf|nan)(?:[eE][+-]?\d+)?"
_STALE = object()


def parse_series_values(s: str) -> list:
    """Expand the promtool value notation (input.go parseInputValue).
    Returns a list of float | None (omitted) | the stale marker."""
    out: list = []
    for item in s.split():
        if item == "stale":
            out.append(_STALE)
            continue
        if "stale" in item:
            raise ValueError("stale metric doesn't support operations")
        if item == "_":
            out.append(None)
            continue
        m = re.fullmatch(r"_x(\d+)", item)
        if m:
            out.extend([None] * int(m.group(1)))
            continue
        m = re.fullmatch(rf"({_NUM})([+-])({_NUM})x(\d+)", item, re.I)
        if m:
            a, op, b, n = (
                float(m.group(1)),
                m.group(2),
                float(m.group(3)),
                int(m.group(4)),
            )
            sign = 1.0 if op == "+" else -1.0
            out.extend(a + sign * b * i for i in range(n + 1))
            continue
        m = re.fullmatch(rf"({_NUM})x(\d+)", item, re.I)
        if m:
            v, n = float(m.group(1)), int(m.group(2))
            out.extend([v] * (n + 1))
            continue
        if re.fullmatch(_NUM, item, re.I):
            out.append(float(item))
            continue
        raise ValueError(f"unsupported input {item!r}")
    if not out:
        raise ValueError("values cannot be an empty string")
    return out


def _parse_series_selector(s: str) -> "tuple[str, dict]":
    """``m{a="b"}`` / ``{__name__="m", a="b"}`` → (name, labels), via
    the MetricsQL parser (equality filters only, like input.go)."""
    from victoriametrics_spark.metricsql import parse
    from victoriametrics_spark.metricsql.ast import MetricExpr

    e = parse(s)
    if not isinstance(e, MetricExpr) or len(e.label_filterss) != 1:
        raise ValueError(f"got invalid input series {s!r}")
    name = ""
    labels: dict = {}
    for f in e.label_filterss[0]:
        if f.op != "=":
            raise ValueError(
                f"series {s!r}: only '=' filters allowed in input series"
            )
        if f.label == "__name__":
            name = f.value
        else:
            labels[f.label] = f.value
    return name, labels


def expand_input_series(
    spark: SparkSession, input_series: list, interval_ms: int
) -> DataFrame:
    """input_series [{series, values}] → canonical samples frame,
    timestamps at TEST_START + i·interval (input.go parseInputSeries)."""
    rows = []
    for item in input_series:
        name, labels = _parse_series_selector(item["series"])
        for i, v in enumerate(parse_series_values(item["values"])):
            if v is None:
                continue
            ts = TEST_START_MS + i * interval_ms
            if v is _STALE:
                rows.append((name, labels, ts, float("nan"), True))
            else:
                rows.append((name, labels, ts, float(v), False))
    return spark.createDataFrame(rows, SAMPLE_SCHEMA)


def _parse_duration_ms(v) -> int:
    from victoriametrics_spark.logsql.parser import parse_duration_ms

    if v is None:
        return 0
    if isinstance(v, (int, float)):
        return int(v * 1000)  # bare numbers are seconds (promutil)
    s = str(v)
    if re.fullmatch(r"-?\d+(\.\d+)?", s):
        return int(float(s) * 1000)
    return int(parse_duration_ms(s))


def load_rule_groups(doc: dict) -> list:
    """vmalert rule-file dict → [(group_name, interval_ms, [rules])]
    (app/vmalert/config groups: record/alert, expr, for, labels,
    annotations)."""
    groups = []
    for g in doc.get("groups", []):
        rules = []
        for r in g.get("rules", []):
            if "record" in r:
                rules.append(
                    RecordingRule(
                        record=r["record"],
                        expr=str(r["expr"]),
                        labels={
                            k: str(v)
                            for k, v in (r.get("labels") or {}).items()
                        },
                    )
                )
            else:
                rules.append(
                    AlertingRule(
                        alert=r["alert"],
                        expr=str(r["expr"]),
                        for_ms=_parse_duration_ms(r.get("for")),
                        keep_firing_for_ms=_parse_duration_ms(
                            r.get("keep_firing_for")
                        ),
                        labels={
                            k: str(v)
                            for k, v in (r.get("labels") or {}).items()
                        },
                        annotations={
                            k: str(v)
                            for k, v in (r.get("annotations") or {}).items()
                        },
                    )
                )
        groups.append(
            (
                g.get("name", ""),
                _parse_duration_ms(g.get("interval")) or None,
                rules,
            )
        )
    return groups


def _expand_template(text: str, value: float, labels: dict) -> str:
    """The practical template subset: {{ $value }} and
    {{ $labels.<name> }}; unknown constructs stay verbatim."""
    def repl(m):
        inner = m.group(1).strip()
        if inner == "$value":
            return ("%g" % value) if value == value else "NaN"
        lm = re.fullmatch(r"\$labels\.([A-Za-z_][A-Za-z0-9_]*)", inner)
        if lm:
            return labels.get(lm.group(1), "")
        return m.group(0)

    return re.sub(r"\{\{([^}]*)\}\}", repl, text)


class UnitTestFailure(AssertionError):
    pass


def _materialize_groups(
    spark: SparkSession,
    samples: DataFrame,
    groups: list,
    order: list,
    interval_ms: int,
    end_ms: int,
    disable_group_label: bool = False,
) -> "tuple[DataFrame, dict]":
    """Run every group over the full test grid, unioning each group's
    recorded series + ALERTS back into the frame (the scratch-storage
    remote-write loop of unittest.go), so later groups and expr tests
    see earlier outputs. Returns (frame, {(group, alert): rule})."""
    by_name = {name: (name, iv, rules) for name, iv, rules in groups}
    ordered = [by_name[n] for n in order if n in by_name] + [
        g for g in groups if g[0] not in set(order)
    ]
    cfg = EvalConfig(start=TEST_START_MS, end=end_ms, step=interval_ms)
    alert_rules: dict = {}
    frame = samples
    for gname, _giv, rules in ordered:
        for r in rules:
            if isinstance(r, RecordingRule):
                out = eval_recording_rule(spark, frame, r, cfg)
            else:
                rr = r
                if not disable_group_label:
                    labels = dict(r.labels)
                    labels.setdefault("alertgroup", gname)
                    rr = AlertingRule(
                        alert=r.alert,
                        expr=r.expr,
                        for_ms=r.for_ms,
                        labels=labels,
                        annotations=r.annotations,
                        keep_firing_for_ms=r.keep_firing_for_ms,
                    )
                alert_rules[(gname, r.alert)] = rr
                out = eval_alerting_rule(spark, frame, rr, cfg)
            out = out.withColumn("is_stale", F.lit(False))
            frame = frame.unionByName(out.select(*frame.columns))
    return frame, alert_rules


def run_unittest(
    spark: SparkSession,
    doc: dict,
    rule_docs: "list[dict]",
    disable_group_label: bool = False,
) -> list:
    """Run one unittest document (the YAML top level: tests,
    evaluation_interval, group_eval_order) against pre-loaded rule-file
    dicts. Returns a list of failure strings — empty means PASS."""
    from victoriametrics_spark.api.http import PromAPI

    failures: list = []
    default_iv = _parse_duration_ms(doc.get("evaluation_interval")) or 60_000
    order = doc.get("group_eval_order") or []
    groups: list = []
    for rd in rule_docs:
        groups.extend(load_rule_groups(rd))

    for test in doc.get("tests", []):
        tname = test.get("name", "?")
        iv = _parse_duration_ms(test.get("interval")) or default_iv
        eval_times = [
            _parse_duration_ms(c.get("eval_time"))
            for c in (
                test.get("metricsql_expr_test", [])
                + test.get("alert_rule_test", [])
            )
        ]
        end_ms = TEST_START_MS + max(eval_times or [0])
        samples = expand_input_series(
            spark, test.get("input_series", []), iv
        )
        frame, alert_rules = _materialize_groups(
            spark,
            samples,
            groups,
            order,
            iv,
            end_ms,
            disable_group_label,
        )
        api = PromAPI(spark, frame)

        for case in test.get("metricsql_expr_test", []):
            t_ms = TEST_START_MS + _parse_duration_ms(case.get("eval_time"))
            res = api.query(str(case["expr"]), time=str(t_ms / 1000.0))
            if res.get("status") != "success":
                failures.append(
                    f"{tname}: expr {case['expr']!r}: {res.get('error')}"
                )
                continue
            got = {}
            for item in res["data"]["result"]:
                got[tuple(sorted(item["metric"].items()))] = float(
                    item["value"][1]
                )
            want = {}
            for s in case.get("exp_samples") or []:
                name, labels = (
                    _parse_series_selector(s["labels"])
                    if s.get("labels")
                    else ("", {})
                )
                key = dict(labels)
                if name:
                    key["__name__"] = name
                want[tuple(sorted(key.items()))] = float(s.get("value", 0))
            if set(got) != set(want) or any(
                not _close(got[k], want[k]) for k in want
            ):
                failures.append(
                    f"{tname}: expr {case['expr']!r} @ {case.get('eval_time')}: "
                    f"expected {want}, got {got}"
                )

        for case in test.get("alert_rule_test", []):
            t_ms = TEST_START_MS + _parse_duration_ms(case.get("eval_time"))
            gname = case.get("groupname", "")
            aname = case.get("alertname", "")
            rule = alert_rules.get((gname, aname))
            if rule is None:
                if case.get("exp_alerts"):
                    failures.append(
                        f"{tname}: no rule {aname!r} in group {gname!r}"
                    )
                continue
            cfg = EvalConfig(start=TEST_START_MS, end=t_ms, step=iv)
            out = eval_alerting_rule(spark, samples_for_group(frame), rule, cfg)
            fired = (
                out.filter(
                    (F.col("name") == "ALERTS")
                    & (F.col("ts") == t_ms)
                    & (F.col("labels")["alertstate"] == "firing")
                )
                .select("labels")
                .collect()
            )
            vals = {
                tuple(
                    sorted(
                        (k, v)
                        for k, v in r["metric"].items()
                        if k != "__name__"
                    )
                ): float(r["value"][1])
                for r in api.query(rule.expr, time=str(t_ms / 1000.0))[
                    "data"
                ]["result"]
            }
            got_alerts = []
            for r in fired:
                labels = {
                    k: v
                    for k, v in r["labels"].items()
                    if k != "alertstate"
                }
                base = {
                    k: v
                    for k, v in labels.items()
                    if k not in ("alertname", "alertgroup")
                    and k not in rule.labels
                }
                value = vals.get(
                    tuple(sorted(base.items())),
                    next(iter(vals.values()), float("nan")),
                )
                annotations = {
                    k: _expand_template(v, value, labels)
                    for k, v in rule.annotations.items()
                }
                got_alerts.append((labels, annotations))
            want_alerts = []
            for a in case.get("exp_alerts") or []:
                labels = {
                    k: str(v) for k, v in (a.get("exp_labels") or {}).items()
                }
                labels["alertname"] = aname
                if not disable_group_label:
                    labels.setdefault("alertgroup", gname)
                want_alerts.append(
                    (
                        labels,
                        {
                            k: str(v)
                            for k, v in (
                                a.get("exp_annotations") or {}
                            ).items()
                        },
                    )
                )
            if not _alerts_match(got_alerts, want_alerts):
                failures.append(
                    f"{tname}: alert {aname!r}@{gname!r} at "
                    f"{case.get('eval_time')}: expected {want_alerts}, "
                    f"got {got_alerts}"
                )
    return failures


def samples_for_group(frame: DataFrame) -> DataFrame:
    """Alert re-evaluation input: everything EXCEPT previously
    materialized ALERTS series (an alert rule never feeds on its own
    state series)."""
    return frame.filter(~F.col("name").isin("ALERTS", "ALERTS_FOR_STATE"))


def _close(a: float, b: float) -> bool:
    if a != a and b != b:
        return True
    return abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))


def _alerts_match(got: list, want: list) -> bool:
    def key(x):
        labels, ann = x
        return (tuple(sorted(labels.items())), tuple(sorted(ann.items())))

    def strip(x, drop_ann: bool):
        labels, ann = x
        return (labels, {} if drop_ann else ann)

    # exp_annotations are optional per alert: compare annotations only
    # where the expectation specifies them
    if len(got) != len(want):
        return False
    want_has_ann = any(a[1] for a in want)
    g = sorted((strip(x, not want_has_ann) for x in got), key=key)
    w = sorted(want, key=key)
    return g == w


def run_unittest_files(
    spark: SparkSession, files: list, disable_group_label: bool = False
) -> dict:
    """CLI analog of ``vmalert-tool unittest --files ...``: loads each
    YAML test file plus its rule_files (paths relative to the test
    file), runs all tests, returns {file: [failures]}."""
    import os

    import yaml

    results: dict = {}
    for path in files:
        with open(path) as fh:
            doc = yaml.safe_load(fh)
        rule_docs = []
        base = os.path.dirname(os.path.abspath(path))
        for rf in doc.get("rule_files", []):
            rp = rf if os.path.isabs(rf) else os.path.join(base, rf)
            with open(rp) as fh:
                rule_docs.append(yaml.safe_load(fh))
        results[path] = run_unittest(
            spark, doc, rule_docs, disable_group_label
        )
    return results

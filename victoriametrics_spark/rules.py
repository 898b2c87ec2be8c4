"""Recording & alerting rules — vmalert rebuilt as scheduled batch jobs
(SURVEY.md §2.10; reference: app/vmalert/rule/recording.go:25,
app/vmalert/rule/alerting.go:28).

A recording rule materializes ``expr`` into new series named ``record``
with the rule's extra labels — on Spark this is one batch evaluation per
schedule tick, appended back into the samples table
(storage/layout.py), exactly VM's remote-write loop.

An alerting rule evaluates ``expr`` on the grid; a series is *pending*
while the expression keeps returning it, and *firing* once it has been
returned continuously for at least ``for_ms`` (alerting.go activeAt
tracking). Output follows Prometheus convention: ``ALERTS{alertname,
alertstate, ...}`` = 1 plus ``ALERTS_FOR_STATE`` holding the activation
timestamp. Continuity is derived with a per-series gaps-and-islands pass
(run id = grid index - row_number), no driver state.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from victoriametrics_spark.engine.evalcfg import EvalConfig
from victoriametrics_spark.engine.planner import evaluate
from victoriametrics_spark.schema import series_key


@dataclass
class RecordingRule:
    record: str
    expr: str
    labels: dict[str, str] = field(default_factory=dict)


@dataclass
class AlertingRule:
    alert: str
    expr: str
    for_ms: int = 0
    labels: dict[str, str] = field(default_factory=dict)
    annotations: dict[str, str] = field(default_factory=dict)
    # `keep_firing_for` (alerting.go:34,560-580): a FIRING alert whose
    # condition disappears keeps firing until this elapses since the
    # first absent tick; re-appearing resets the clock and the alert
    # stays firing (no pending restart). 0 = off.
    keep_firing_for_ms: int = 0


def _with_extra_labels(df: DataFrame, extra: dict[str, str]) -> DataFrame:
    if not extra:
        return df
    pairs = []
    for k, v in extra.items():
        pairs += [F.lit(k), F.lit(v)]
    keys = list(extra)
    return df.withColumn(
        "labels",
        F.map_concat(
            F.map_filter(F.col("labels"), lambda k, v: ~k.isin(*keys)),
            F.create_map(*pairs),
        ),
    )


def eval_recording_rule(
    spark: SparkSession, samples: DataFrame, rule: RecordingRule, cfg: EvalConfig
) -> DataFrame:
    """Materialize one recording rule into canonical samples
    (recording.go exec: result series renamed to the rule name, rule
    labels overriding result labels)."""
    out = evaluate(spark, rule.expr, samples, cfg)
    out = out.withColumn("name", F.lit(rule.record))
    return _with_extra_labels(out, rule.labels)


def eval_alerting_rule(
    spark: SparkSession, samples: DataFrame, rule: AlertingRule, cfg: EvalConfig
) -> DataFrame:
    """ALERTS/ALERTS_FOR_STATE series for one alerting rule.

    pending → firing after the condition holds for ``for_ms``
    continuously (alerting.go: activeAt + holdDuration); with
    ``keep_firing_for`` set, the exact sequential state machine runs
    per series (alerting.go:500-600) in an Arrow pass."""
    res = evaluate(spark, rule.expr, samples, cfg)
    if rule.keep_firing_for_ms > 0:
        return _eval_alerting_keep_firing(res, rule, cfg)
    step = cfg.step
    d = res.withColumn("__sk", series_key(F.col("name"), F.col("labels")))
    w = Window.partitionBy("__sk").orderBy("ts")
    # gaps-and-islands: consecutive grid points share one run id
    run = (F.col("ts") / F.lit(step)).cast("long") - F.row_number().over(w)
    d = d.withColumn("__run", run)
    wrun = Window.partitionBy("__sk", "__run")
    d = d.withColumn("__active_at", F.min("ts").over(wrun))
    state = F.when(
        F.col("ts") - F.col("__active_at") >= F.lit(rule.for_ms), "firing"
    ).otherwise("pending")
    alert_labels = dict(rule.labels)
    alert_labels["alertname"] = rule.alert
    base = _with_extra_labels(d, alert_labels)
    alerts = base.select(
        F.lit("ALERTS").alias("name"),
        F.map_concat(
            F.map_filter(F.col("labels"), lambda k, v: k != F.lit("alertstate")),
            F.create_map(F.lit("alertstate"), state),
        ).alias("labels"),
        F.col("ts"),
        F.lit(1.0).alias("value"),
    )
    for_state = base.select(
        F.lit("ALERTS_FOR_STATE").alias("name"),
        F.col("labels"),
        F.col("ts"),
        (F.col("__active_at") / 1000.0).alias("value"),
    )
    return alerts.unionByName(for_state)


def _eval_alerting_keep_firing(
    res: DataFrame, rule: AlertingRule, cfg: EvalConfig
) -> DataFrame:
    """The vmalert per-alert state machine with ``keep_firing_for``
    (alerting.go exec, lines 500-600), run as ONE sequential Arrow pass
    per series — the same shape the reference uses (its alerts map is
    walked per rule tick):

    - present & previously inactive → PENDING (activeAt = ts), then
      FIRING once ts − activeAt ≥ for_ms;
    - present while FIRING → stays FIRING, KeepFiringSince resets
      (alerting.go:535) — no pending restart;
    - absent while PENDING → inactive immediately;
    - absent while FIRING → KeepFiringSince = first absent tick;
      inactive once ts − KeepFiringSince ≥ keep_firing_for, kept
      FIRING (stabilizing) before that (alerting.go:562-580).

    ALERTS rows are emitted for pending/firing (incl. kept) points;
    ALERTS_FOR_STATE only where the condition actually holds, so a
    firing-at-now alert with no FOR_STATE row at now is stabilizing."""
    import pandas as pd

    step = int(cfg.step)
    end = int(cfg.end)
    for_ms = int(rule.for_ms)
    keep_ms = int(rule.keep_firing_for_ms)

    d = res.withColumn("__sk", series_key(F.col("name"), F.col("labels")))
    alert_labels = dict(rule.labels)
    alert_labels["alertname"] = rule.alert
    base = _with_extra_labels(d, alert_labels).select(
        "__sk", "labels", "ts"
    )

    out_schema = (
        "labels map<string,string>, ts long, state string, "
        "active_at long, present boolean"
    )

    def machine(key, pdf):
        pdf = pdf.sort_values("ts")
        present = set(int(t) for t in pdf["ts"])
        labels = pdf["labels"].iloc[0]
        t0 = min(present)
        rows = []
        state = "inactive"
        active_at = 0
        keep_since = None
        t = t0
        while t <= end:
            if t in present:
                keep_since = None
                if state == "inactive":
                    state, active_at = "pending", t
                if state == "pending" and t - active_at >= for_ms:
                    state = "firing"
                rows.append((labels, t, state, active_at, True))
            else:
                if state == "firing":
                    if keep_since is None:
                        keep_since = t
                    if t - keep_since >= keep_ms:
                        state, keep_since = "inactive", None
                    else:
                        rows.append((labels, t, "firing", active_at, False))
                elif state == "pending":
                    state = "inactive"
                t += step
                continue
            t += step
        return pd.DataFrame(
            rows,
            columns=["labels", "ts", "state", "active_at", "present"],
        )

    st = base.groupBy("__sk").applyInPandas(machine, out_schema)
    alerts = st.select(
        F.lit("ALERTS").alias("name"),
        F.map_concat(
            F.map_filter(
                F.col("labels"), lambda k, v: k != F.lit("alertstate")
            ),
            F.create_map(F.lit("alertstate"), F.col("state")),
        ).alias("labels"),
        F.col("ts"),
        F.lit(1.0).alias("value"),
    )
    for_state = st.filter(F.col("present")).select(
        F.lit("ALERTS_FOR_STATE").alias("name"),
        F.col("labels"),
        F.col("ts"),
        (F.col("active_at") / 1000.0).alias("value"),
    )
    return alerts.unionByName(for_state)


def run_rules(
    spark: SparkSession,
    samples: DataFrame,
    rules: list[RecordingRule | AlertingRule],
    cfg: EvalConfig,
    write_table: str | None = None,
) -> DataFrame:
    """Evaluate a rule group (one scheduler tick over the given range);
    optionally append the produced series back into a bucketed samples
    table (the remote-write analog) so subsequent queries see them."""
    outs = []
    for r in rules:
        if isinstance(r, RecordingRule):
            outs.append(eval_recording_rule(spark, samples, r, cfg))
        else:
            outs.append(eval_alerting_rule(spark, samples, r, cfg))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    out = out.withColumn("is_stale", F.lit(False))
    if write_table:
        from victoriametrics_spark.storage import append_samples

        append_samples(out, write_table)
    return out

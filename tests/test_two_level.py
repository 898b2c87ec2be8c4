"""Wide-window/fine-step cutover (EvalConfig.two_level_cutover): the
step-bucket two-level plan must produce the same points as the exact
contribution-explode plan, for every decomposed rollup."""

from __future__ import annotations

import pytest

from victoriametrics_spark import EvalConfig, evaluate
from victoriametrics_spark.engine.rollup import ROLLUPS
from victoriametrics_spark.schema import samples_from_columns

MIN = 60_000
T0 = 1704067200000

# grid: 6 hours at 5m step; window 2h → k = 24 > default cutover 16
CFG = EvalConfig(start=T0 + 2 * 60 * MIN, end=T0 + 8 * 60 * MIN, step=5 * MIN)
# force the one-level plan for the reference result
CFG_ONE = EvalConfig(
    start=CFG.start, end=CFG.end, step=CFG.step, two_level_cutover=10**9
)

DECOMPOSED = sorted(
    name
    for name, spec in ROLLUPS.items()
    if spec.two_level is not None
)

def _query(fn_name: str) -> str:
    if any(
        fn_name == f"{kind}_{op}_over_time"
        for kind in ("count", "sum", "share")
        for op in ("eq", "ne", "gt", "le")
    ):
        return f"{fn_name}(m[2h], 50)"
    return f"{fn_name}(m[2h])"


@pytest.fixture(scope="module")
def fine_samples(spark):
    # two series, irregular-ish cadence, counter resets, duplicates of
    # values so changes/distinct are exercised
    rows = []
    for si, s in enumerate(["a", "b"]):
        v = 0.0
        for j in range(0, 9 * 60, 7):  # every 7 minutes over 9h
            ts = T0 + j * MIN + si * 13_000
            v = v + (j % 50) if (j % 180) else 3.0  # periodic reset
            rows.append((s, ts, float(v if j % 11 else int(v))))
    df = spark.createDataFrame(rows, "series string, ts long, value double")
    return samples_from_columns(
        df, name="m", label_cols={"s": "series"}, ts="ts", value="value"
    )


@pytest.mark.parametrize("fn_name", DECOMPOSED)
@pytest.mark.slow
def test_two_level_matches_explode(spark, fine_samples, fn_name):
    q = _query(fn_name)

    def collect(cfg):
        df = evaluate(spark, q, fine_samples, cfg)
        return sorted(
            (r["labels"].get("s"), r["ts"], round(r["value"], 6))
            for r in df.collect()
        )

    assert collect(CFG) == collect(CFG_ONE), fn_name


def test_cutover_changes_plan(spark, fine_samples):
    def nodes(cfg):
        df = evaluate(spark, "rate(m[2h])", fine_samples, cfg)
        return df._jdf.queryExecution().optimizedPlan().toString()

    assert nodes(CFG) != nodes(CFG_ONE)


def test_non_multiple_window_falls_back(spark, fine_samples):
    # 2h1m window is not a step multiple → must fall back (and be exact)
    cfg = EvalConfig(
        start=CFG.start, end=CFG.end, step=CFG.step, two_level_cutover=1
    )
    df = evaluate(spark, "sum_over_time(m[121m])", fine_samples, cfg)
    assert df.count() > 0

"""Rollup result cache tests (rollup_result_cache.go parity)."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from victoriametrics_spark import EvalConfig, evaluate
from victoriametrics_spark.engine.cache import RollupResultCache
from victoriametrics_spark.schema import SAMPLE_SCHEMA


@pytest.fixture()
def counter_samples(spark):
    rows = []
    t0 = 1704067200000
    for i in range(120):  # 30 min of 15s samples, 2 series
        rows.append(("c", {"job": "a"}, t0 + i * 15000, float(3 * i), False))
        rows.append(("c", {"job": "b"}, t0 + i * 15000, float(5 * i), False))
    return spark.createDataFrame(rows, SAMPLE_SCHEMA), t0


def _vals(df):
    return {
        (r["name"], tuple(sorted((r["labels"] or {}).items())), r["ts"]): r["value"]
        for r in df.collect()
    }


def test_cache_miss_partial_full(spark, counter_samples, tmp_path):
    samples, t0 = counter_samples
    cache = RollupResultCache(spark, str(tmp_path / "rrc"))
    q = "sum(rate(c[2m])) by (job)"
    end1 = t0 + 600_000
    end2 = t0 + 1500_000
    cfg1 = EvalConfig(start=t0, end=end1, step=60_000)
    cfg2 = EvalConfig(start=t0, end=end2, step=60_000)

    cold = cache.evaluate(q, samples, cfg1)
    assert cache.stats["mode"] == "miss"
    assert _vals(cold) == _vals(evaluate(spark, q, samples, cfg1))

    # warm, extended range: prefix reused, only the suffix evaluated.
    # PROOF the prefix isn't recomputed: drop every sample the suffix
    # window can't reach — the cached prefix must supply those points.
    suffix_start_expect = end1 + 60_000
    lookback = 300_000
    suffix_only = samples.filter(
        F.col("ts") > suffix_start_expect - 120_000 - 60_000 - lookback
    )
    warm = cache.evaluate(q, suffix_only, cfg2)
    assert cache.stats == {
        "mode": "hit_partial",
        "suffix_start": suffix_start_expect,
    }
    assert _vals(warm) == _vals(evaluate(spark, q, samples, cfg2))

    # identical query again: full hit, no evaluation at all (samples=None
    # would throw if the engine ran)
    hot = cache.evaluate(q, None, cfg2)
    assert cache.stats["mode"] == "hit_full"
    assert _vals(hot) == _vals(evaluate(spark, q, samples, cfg2))


def test_cache_bypass_range_dependent(spark, counter_samples, tmp_path):
    samples, t0 = counter_samples
    cache = RollupResultCache(spark, str(tmp_path / "rrc2"))
    cfg = EvalConfig(start=t0, end=t0 + 300_000, step=60_000)
    out = cache.evaluate("running_sum(rate(c[2m]))", samples, cfg)
    assert cache.stats["mode"] == "bypass"
    assert _vals(out) == _vals(
        evaluate(spark, "running_sum(rate(c[2m]))", samples, cfg)
    )
    # a second call is STILL a bypass (nothing was stored)
    cache.evaluate("running_sum(rate(c[2m]))", samples, cfg)
    assert cache.stats["mode"] == "bypass"


def test_cache_misaligned_start_recomputes(spark, counter_samples, tmp_path):
    samples, t0 = counter_samples
    cache = RollupResultCache(spark, str(tmp_path / "rrc3"))
    q = "avg_over_time(c[2m])"
    cache.evaluate(q, samples, EvalConfig(start=t0, end=t0 + 600_000, step=60_000))
    # same step but off-grid start → unusable cache → miss
    cfg_off = EvalConfig(start=t0 + 30_000, end=t0 + 630_000, step=60_000)
    out = cache.evaluate(q, samples, cfg_off)
    assert cache.stats["mode"] == "miss"
    assert _vals(out) == _vals(evaluate(spark, q, samples, cfg_off))

"""Binary-op fidelity cases pinned by the round-10 binop review — each
encodes a behavior verified line-by-line against the reference's
binary_op.go / adjustBinaryOpTags, in corners the golden corpus does
not cover."""

from __future__ import annotations

import pytest

from victoriametrics_spark import EvalConfig, evaluate
from victoriametrics_spark.schema import SAMPLE_SCHEMA

# binop parity sweep: slow tier — excluded from the default (driver-window) run;
# opt in with `pytest -m slow` (see pytest.ini)
pytestmark = pytest.mark.slow


CFG = EvalConfig(start=1_000_000, end=2_000_000, step=200_000)


@pytest.fixture(scope="module")
def q_df(spark):
    rows = []
    for i, ts in enumerate(range(0, 2_100_000, 100_000)):
        rows.append(("q", {"job": "a"}, ts, float(i), False))
        rows.append(("q", {"job": "b"}, ts, float(100 + i), False))
    return spark.createDataFrame(rows, SAMPLE_SCHEMA)


def _rows(df):
    return sorted(
        (r["name"], tuple(sorted((r["labels"] or {}).items())), r["ts"],
         r["value"])
        for r in df.collect()
    )


def test_cmp_with_nan_scalar_is_false(spark, q_df):
    """Go semantics: every comparison with NaN is false except `!=`.
    `(1 > 2)` is an empty/NaN scalar, so `q < (1 > 2)` must be EMPTY
    (Spark's native ordering would keep every point: x < NaN is true
    there), while `q != (1 > 2)` keeps everything."""
    lt = evaluate(spark, "q < (1 > 2)", q_df, CFG)
    assert lt.count() == 0
    neq = evaluate(spark, "q != (1 > 2)", q_df, CFG)
    assert neq.count() == 12  # 2 series x 6 grid points


def test_computed_scalar_left_cmp_keeps_scalar_values(spark, q_df):
    """`time() > q`: the cmp func returns its LEFT operand
    (binary_op.go:136-143), and the scalar fast path writes it onto the
    series' identity (adjustBinaryOpTags:275-282) — matched points
    carry time() values, not q's. Number literals are exempt (eval
    swaps `123 < q`)."""
    out = evaluate(spark, "time() > q", q_df, CFG)
    rows = _rows(out)
    # both series' values (0..20 and 100..120) are below time()
    # (1000..2000s) → every grid point matches, carrying time()'s value
    assert len(rows) == 12
    for name, labels, ts, value in rows:
        assert value == ts / 1000.0, (ts, value)
    # and q's ORIGINAL values survive when the series is on the left
    out2 = evaluate(spark, "q < time()", q_df, CFG)
    vals = {r["value"] for r in out2.collect()}
    assert vals <= set(float(x) for x in range(0, 21)) | set(
        float(100 + x) for x in range(0, 21)
    )


def test_scalar_with_group_modifier_goes_through_match(spark, q_df):
    """VM's scalar broadcast fast path requires NO group/join modifier
    (adjustBinaryOpTags:272-292) — with on(job) the scalar is an
    empty-label series whose on-key never matches q's, so
    `q + on(job) 2` is EMPTY, not q+2."""
    out = evaluate(spark, "q + on(job) 2", q_df, CFG)
    assert out.count() == 0
    # sanity: without the modifier the broadcast applies
    plain = evaluate(spark, "q + 2", q_df, CFG)
    assert plain.count() == 12


def test_group_right_cmp_keeps_left_value(spark):
    """Non-bool comparison under group_right: result identity comes
    from the right/many side, but the VALUE is the LEFT operand's
    (newBinaryOpCmpFunc returns `left`; dst=rvsRight)."""
    rows = []
    for ts in range(0, 2_100_000, 100_000):
        rows.append(("a", {"job": "x"}, ts, 10.0, False))
        rows.append(("b", {"job": "x", "inst": "1"}, ts, 3.0, False))
        rows.append(("b", {"job": "x", "inst": "2"}, ts, 99.0, False))
    df = spark.createDataFrame(rows, SAMPLE_SCHEMA)
    out = evaluate(spark, "a > on(job) group_right b", df, CFG)
    got = {
        (dict(r["labels"]).get("inst"), r["value"]) for r in out.collect()
    }
    # a=10 > b=3 matches (value 10 = LEFT); a=10 > b=99 does not
    assert got == {("1", 10.0)}


def test_fused_count_absent_side_drops_group(spark):
    """`count(f(A{x=a})) - count(f(A{x=b}))` at a group that exists on
    only one side must produce NO row (the unfused inner join drops
    it) — the fused single-scan plan must not emit count-0 rows."""
    rows = []
    for ts in range(0, 2_100_000, 100_000):
        rows.append(("A", {"x": "a", "g": "only_a"}, ts, 1.0, False))
        rows.append(("A", {"x": "a", "g": "both"}, ts, 1.0, False))
        rows.append(("A", {"x": "b", "g": "both"}, ts, 1.0, False))
    df = spark.createDataFrame(rows, SAMPLE_SCHEMA)
    q = ('count(last_over_time(A{x="a"}[100s])) by (g) - '
         'count(last_over_time(A{x="b"}[100s])) by (g)')
    out = evaluate(spark, q, df, CFG)
    got = {dict(r["labels"]).get("g") for r in out.collect()}
    assert got == {"both"}
    for r in out.collect():
        assert r["value"] == 0.0  # 1 - 1 in the shared group


def test_absent_over_time_not_fused(spark):
    """`sum(absent_over_time(A{x=a}[w])) + sum(absent_over_time(
    A{x=b}[w]))` with NEITHER selector matching must yield 1+1=2 —
    a fused union scan would lose the per-side absence."""
    rows = [("other", {}, ts, 1.0, False)
            for ts in range(0, 2_100_000, 100_000)]
    df = spark.createDataFrame(rows, SAMPLE_SCHEMA)
    q = ('sum(absent_over_time(A{x="a"}[5m])) + '
         'sum(absent_over_time(A{x="b"}[5m]))')
    out = evaluate(spark, q, df, CFG)
    vals = {r["value"] for r in out.collect()}
    assert vals == {2.0}


def test_fused_by_name_lifts_metric_name(spark):
    """`sum by (__name__) (...) / sum by (__name__) (...)`: the fused
    plan must match the unfused shape — __name__ lifted out of the
    label map and the arith resetting the name (no keep_metric_names)."""
    rows = []
    for ts in range(0, 2_100_000, 100_000):
        rows.append(("A", {"x": "a"}, ts, 4.0, False))
        rows.append(("A", {"x": "b"}, ts, 2.0, False))
    df = spark.createDataFrame(rows, SAMPLE_SCHEMA)
    q = ('sum by (__name__) (last_over_time(A{x="a"}[100s])) / '
         'sum by (__name__) (last_over_time(A{x="b"}[100s]))')
    out = evaluate(spark, q, df, CFG).collect()
    assert out
    for r in out:
        assert r["name"] == ""
        assert "__name__" not in (r["labels"] or {})
        assert r["value"] == 2.0


def test_series_default_fills_each_left_series(spark):
    """`q default on(job) r` with TWO left series sharing the match
    key: each left series' own gaps fill independently with its own
    identity (fillLeftNaNsWithRightValues iterates per tsLeft) — not
    one fill row for cells missing from every series."""
    rows = []
    for ts in range(0, 2_100_000, 100_000):
        rows.append(("r", {"job": "x"}, ts, 777.0, False))
        # q/inst=1 has points only in the first half; q/inst=2 only in
        # the second — each has gaps where the OTHER has points
        if ts <= 1_000_000:
            rows.append(("q", {"job": "x", "inst": "1"}, ts, 1.0, False))
        else:
            rows.append(("q", {"job": "x", "inst": "2"}, ts, 2.0, False))
    df = spark.createDataFrame(rows, SAMPLE_SCHEMA)
    out = evaluate(spark, "q default on(job) r", df, CFG)
    by_inst: dict = {}
    for r in out.collect():
        by_inst.setdefault(dict(r["labels"])["inst"], {})[r["ts"]] = r["value"]
    grid = list(range(1_000_000, 2_000_001, 200_000))
    # every series covers the whole grid: own values + 777 fills
    assert set(by_inst["1"]) == set(grid)
    assert set(by_inst["2"]) == set(grid)
    assert by_inst["1"][1_000_000] == 1.0
    assert by_inst["1"][2_000_000] == 777.0
    assert by_inst["2"][2_000_000] == 2.0
    assert by_inst["2"][1_000_000] == 777.0


def test_pow_negative_base_fractional_exp_is_nan(spark, q_df):
    """`(0-4)^0.5`: Python ** yields a complex number; Go math.Pow
    yields NaN — the scalar const must become NaN (query result empty),
    not crash downstream isnan() checks."""
    out = evaluate(spark, "q * ((0 - 4) ^ 0.5)", q_df, CFG)
    assert out.count() == 0


# ---------------------------------------------------------------- aggr
# (same review round — aggregate fidelity cases verified against aggr.go)


def test_aggregates_skip_nan_points(spark, q_df):
    """VM's aggrFunc* skip NaN per point (aggr.go:185-208): a union
    with a NaN series must not poison sum/max, and count counts only
    non-NaN contributors."""
    base = 'sum((time(), label_set(time()*((0-4)^0.5), "x", "y")))'
    out = evaluate(spark, base, q_df, CFG)
    vals = {r["ts"]: r["value"] for r in out.collect()}
    assert vals == {ts: ts / 1000.0 for ts in range(1_000_000, 2_000_001, 200_000)}
    cnt = evaluate(
        spark, base.replace("sum(", "count(", 1), q_df, CFG
    )
    assert {r["value"] for r in cnt.collect()} == {1.0}
    mx = evaluate(spark, base.replace("sum(", "max(", 1), q_df, CFG)
    assert {r["value"] for r in mx.collect()} == {
        ts / 1000.0 for ts in range(1_000_000, 2_000_001, 200_000)
    }


def test_geomean_zero_and_negative(spark, q_df):
    """aggrFuncGeomean multiplies RAW values: a zero zeroes the result,
    a single negative survives (pow(v, 1))."""
    z = evaluate(
        spark, 'geomean((label_set(0,"a","b"), label_set(100,"c","d")))',
        q_df, CFG,
    )
    assert {r["value"] for r in z.collect()} == {0.0}
    n = evaluate(spark, 'geomean(label_set(0-4,"a","b"))', q_df, CFG)
    assert {r["value"] for r in n.collect()} == {-4.0}


def test_topk_inf_and_nan_k(spark, q_df):
    """getIntK: inf keeps everything, NaN keeps nothing — neither may
    crash with a raw Python conversion error."""
    assert evaluate(spark, "topk(inf, q)", q_df, CFG).count() == 12
    assert evaluate(spark, "topk(0/0, q)", q_df, CFG).count() == 0
    assert evaluate(spark, "outliersk(inf, q)", q_df, CFG).count() == 12


def test_quantiles_nan_and_oob_phi(spark, q_df):
    """quantiles() mirrors quantile(): NaN phi's series drops,
    out-of-range phi yields a constant ∓Inf series with a %g label."""
    out = evaluate(
        spark, 'quantiles("phi", 0/0, 0-1, 0.5, label_set(1,"a","b"))',
        q_df, CFG,
    )
    by_phi = {}
    for r in out.collect():
        by_phi.setdefault(dict(r["labels"])["phi"], set()).add(r["value"])
    assert set(by_phi) == {"-1", "0.5"}  # NaN phi dropped; %g labels
    assert by_phi["-1"] == {float("-inf")}
    assert by_phi["0.5"] == {1.0}


def test_share_zscore_keep_original_name(spark):
    """share()/zscore() run through aggrFuncExt keepOriginal=true —
    per-series outputs keep their full original identity, name
    included."""
    rows = [("reqs", {"job": "a"}, ts, 2.0, False)
            for ts in range(0, 2_100_000, 100_000)]
    rows += [("reqs", {"job": "b"}, ts, 6.0, False)
             for ts in range(0, 2_100_000, 100_000)]
    df = spark.createDataFrame(rows, SAMPLE_SCHEMA)
    for q in ("share(reqs)", "zscore(reqs)"):
        out = evaluate(spark, q, df, CFG)
        names = {r["name"] for r in out.collect()}
        assert names == {"reqs"}, q


def test_count_values_f_format(spark, q_df):
    """count_values label values use Go 'f' formatting (no exponent):
    1e-7 → \"0.0000001\", 1.5 → \"1.5\", 5 → \"5\"."""
    out = evaluate(
        spark,
        'count_values("v", (label_set(0.0000001,"a","b"),'
        ' label_set(1.5,"c","d"), label_set(5,"e","f")))',
        q_df, CFG,
    )
    vals = {dict(r["labels"])["v"] for r in out.collect()}
    assert vals == {"0.0000001", "1.5", "5"}


def test_histogram_zero_and_huge_values(spark, q_df):
    """metrics.Histogram.Update: v<1e-9 (incl. 0) lands in the lower
    bucket, v>1e18 in the upper bucket; negatives are ignored."""
    out = evaluate(
        spark,
        'histogram((label_set(0,"a","b"), label_set(1e19,"c","d"),'
        ' label_set(0-5,"e","f")))',
        q_df, CFG,
    )
    by_le = {}
    for r in out.collect():
        by_le.setdefault(dict(r["labels"])["le"], set()).add(r["value"])
    # cumulative le buckets: lower bucket counts the 0, +Inf counts both
    # non-negative values; the negative value appears nowhere
    assert by_le["1.000e-09"] == {1.0}
    assert by_le["+Inf"] == {2.0}

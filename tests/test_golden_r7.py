"""Golden corpus tranche 3 (round 7) — mechanical port of the remaining
portable TestExecSuccess cases (app/vmselect/promql/exec_test.go):
scalar comparisons, edge-argument aggregates (topk(-1), limitk(-1),
outliersk(0), quantile(NaN)), histogram_share/fraction edges, offsets,
strict prometheus variants, `if` masking, and empty-result shapes.
Same 6-point grid and comparison as tests/test_golden.py. The only
reference cases still unported are the documented exclusions: Go-rand
sequences, timezone_offset (host-tz dependent), and custom-grid
subtests."""

from __future__ import annotations

import pytest

from victoriametrics_spark import evaluate
from victoriametrics_spark.schema import SAMPLE_SCHEMA

from tests.test_golden import (  # reuse grid + normalizers
    CFG,
    _norm_expected,
    _norm_result,
)

# golden sweep: slow tier — excluded from the default (driver-window) run;
# opt in with `pytest -m slow` (see pytest.ini)
pytestmark = pytest.mark.slow


CASES = [
    # tlast_change_over_time(miss)
    ('tlast_change_over_time(\n\t\t\t1[1h]\n\t\t)',
     [
     ]),
    # time()*(-4)^0.5
    ('time()*(-4)^0.5',
     [
     ]),
    # alias()
    ('alias(time(), "foobar")',
     [
      ('foobar', {}, [1000.0, 1200.0, 1400.0, 1600.0, 1800.0, 2000.0]),
     ]),
    # limit_offset(too-big-offset)
    ('limit_offset(1, 10, sort_by_label((\n\t\t\tlabel_set(time()*1, "foo", "y"),\n\t\t\tlabel_set(time()*2, "foo", "a"),\n\t\t\tlabel_set(time()*3, "foo", "x"),\n\t\t), "foo"))',
     [
     ]),
    # scalar(multi-timeseries)
    ('scalar(1 or label_set(2, "xx", "foo"))',
     [
     ]),
    # scalar > time()
    ('123 > time()',
     [
     ]),
    # time() < scalar
    ('time() < 123',
     [
     ]),
    # 1 > 2
    ('1 > 2',
     [
     ]),
    # vector(1) == time()
    ('vector(1) == time()',
     [
     ]),
    # compare_to_nan_left
    ('nan != 1',
     [
     ]),
    # compare_to_empty_vector_right
    ('label_set(time(), "foo", "bar") != (label_set(time(), "foo", "bar") > 100000)',
     [
     ]),
    # compare_to_empty_vector_right_offset
    ('label_set(time(), "foo", "bar") != ((label_set(time(), "foo", "bar") > 100000) offset 0s)',
     [
     ]),
    # compare_to_empty_vector_left
    ('(label_set(time(), "foo", "bar") > 100000) != label_set(time(), "foo", "bar")',
     [
     ]),
    # vector + vector no matching
    ('sort_desc(\n\t\t\t(label_set(time(), "t2", "v1") or label_set(10, "t2", "v2"))\n\t\t\t+\n\t\t\t(label_set(100, "t1", "v1") or label_set(time(), "t2", "v3"))\n\t\t)',
     [
     ]),
    # histogram_fraction(scalar)
    ('histogram_fraction(123, 456, time())',
     [
     ]),
    # histogram_share(single-value-no-le)
    ('histogram_share(123, label_set(100, "foo", "bar"))',
     [
     ]),
    # histogram_share(single-value-invalid-le)
    ('histogram_share(50, label_set(100, "le", "foobar"))',
     [
     ]),
    # histogram_fraction(single-value-invalid-le)
    ('histogram_fraction(50, 60, label_set(100, "le", "foobar"))',
     [
     ]),
    # histogram_share(single-value-valid-le)
    ('histogram_share(80, label_set(100, "le", "200"))',
     [
      ('', {}, [0.4, 0.4, 0.4, 0.4, 0.4, 0.4]),
     ]),
    # histogram_share(single-value-valid-le)
    ('histogram_share(200, label_set(100, "le", "200"))',
     [
      ('', {}, [1.0, 1.0, 1.0, 1.0, 1.0, 1.0]),
     ]),
    # histogram_quantile(zero-bucket-count)
    ('histogram_quantile(0.6,\n\t\t\tlabel_set(0, "foo", "bar", "le", "10")\n\t\t\tor label_set(0, "foo", "bar", "le", "30")\n\t\t\tor label_set(0, "foo", "bar", "le", "+Inf")\n\t\t)',
     [
     ]),
    # histogram_quantile(nan-bucket-count-all)
    ('histogram_quantile(0.6,\n\t\t\tlabel_set(nan, "foo", "bar", "le", "10")\n\t\t\tor label_set(nan, "foo", "bar", "le", "30")\n\t\t\tor label_set(nan, "foo", "bar", "le", "+Inf")\n\t\t)',
     [
     ]),
    # sum(multi-vector) by (__name__)
    ('sort(sum(label_set(10, "__name__", "bar", "baz", "sss", "x", "y") or label_set(time()/100, "baz", "sss", "__name__", "aaa")) by (__name__))',
     [
      ('bar', {}, [10.0, 10.0, 10.0, 10.0, 10.0, 10.0]),
      ('aaa', {}, [10.0, 12.0, 14.0, 16.0, 18.0, 20.0]),
     ]),
    # limitk(-1)
    ('limitk(-1, label_set(10, "foo", "bar") or label_set(time()/150, "baz", "sss"))',
     [
     ]),
    # any(empty-series)
    ('any(label_set(time()<0, "foo", "bar"))',
     [
     ]),
    # topk(-1)
    ('sort(topk(-1, label_set(10, "foo", "bar") or label_set(time()/150, "baz", "sss")))',
     [
     ]),
    # topk(NaN)
    ('sort(topk(NaN, label_set(10, "foo", "bar") or label_set(time()/150, "baz", "sss")))',
     [
     ]),
    # scalar if vector1
    ('time() if (\n\t\t\tlabel_set(123, "foo", "bar"),\n\t\t)',
     [
     ]),
    # quantile(NaN)
    ('quantile(NaN, label_set(10, "foo", "bar") or label_set(time()/150, "baz", "sss"))',
     [
     ]),
    # outliers_mad(5)
    ('outliers_mad(5, (\n\t\t\talias(time(), "metric1"),\n\t\t\talias(time()*1.5, "metric2"),\n\t\t\tlabel_set(time()*0.9, "baz", "sss"),\n\t\t))',
     [
     ]),
    # outliersk(0)
    ('outliersk(0, (\n\t\t\tlabel_set(1300, "foo", "bar"),\n\t\t\tlabel_set(time(), "baz", "sss"),\n\t\t))',
     [
     ]),
    # {}
    ('{}',
     [
     ]),
    # rate({}[:5s])
    ('rate({}[:5s])',
     [
     ]),
    # ()
    ('()',
     [
     ]),
    # union()
    ('union()',
     [
     ]),
    # (1)
    ('(1)',
     [
      ('', {}, [1.0, 1.0, 1.0, 1.0, 1.0, 1.0]),
     ]),
    # (identical_labels)
    ('(label_set(1, "foo", "bar"), label_set(2, "foo", "bar"))',
     [
      ('', {'foo': 'bar'}, [1.0, 1.0, 1.0, 1.0, 1.0, 1.0]),
     ]),
    # (identical_labels_with_names)
    ('(label_set(1, "foo", "bar", "__name__", "xx"), label_set(2, "__name__", "xx", "foo", "bar"))',
     [
      ('xx', {'foo': 'bar'}, [1.0, 1.0, 1.0, 1.0, 1.0, 1.0]),
     ]),
    # (identical_labels_different_names)
    ('(label_set(1, "foo", "bar", "__name__", "xx"), label_set(2, "__name__", "yy", "foo", "bar"))',
     [
      ('xx', {'foo': 'bar'}, [1.0, 1.0, 1.0, 1.0, 1.0, 1.0]),
      ('yy', {'foo': 'bar'}, [2.0, 2.0, 2.0, 2.0, 2.0, 2.0]),
     ]),
    # f(q, nil) cases — expected EMPTY results
    ('bitmap_and(NaN, 1)', []),
    ('bitmap_and(1, NaN)', []),
    ('bitmap_or(NaN, 1)', []),
    ('bitmap_xor(NaN, 1)', []),
    # implicit window = step: strictly-in-window pairs never exist
    ('increase_prometheus(time())', []),
    ('delta_prometheus(time())', []),
    # timezone_offset(America/New_York): fixed tz database, EST at the
    # 1970 test epoch -> -18000s (the Local variant stays excluded: host-tz)
    ('timezone_offset("America/New_York")',
     [
      ('', {}, [-18000.0, -18000.0, -18000.0, -18000.0, -18000.0, -18000.0]),
     ]),
]


@pytest.fixture(scope="module")
def empty_samples(spark):
    return spark.createDataFrame([], SAMPLE_SCHEMA)


@pytest.mark.parametrize(
    "query,expected", [(q, e) for q, e in CASES], ids=[c[0][:60] for c in CASES]
)
def test_golden_r7(spark, empty_samples, query, expected):
    got = _norm_result(evaluate(spark, query, empty_samples, CFG))
    want = _norm_expected(expected)
    want = {k: v for k, v in want.items() if v}
    assert set(got) == set(want), f"series sets differ: {set(got)} vs {set(want)}"
    for key in want:
        gv, wv = got[key], want[key]
        assert set(gv) == set(wv), f"{key}: point sets {sorted(gv)} vs {sorted(wv)}"
        for ts in wv:
            assert gv[ts] == pytest.approx(wv[ts], rel=1e-10, abs=1e-10), (
                f"{query} {key} @{ts}: {gv[ts]} vs {wv[ts]}"
            )

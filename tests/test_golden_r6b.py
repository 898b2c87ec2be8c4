"""Golden corpus tranche 3 — the remaining portable TestExecSuccess
cases (app/vmselect/promql/exec_test.go) not covered by test_golden.py
or test_golden_r6.py: time/timezone variants, clamp family, range_trim_*
, aggr_over_time, rollup_candlestick, bitmap, misc. Same grid/compare
as the other golden suites; rand-family cases excluded for the reasons
documented in test_golden_r6.py.
"""

from __future__ import annotations

import pytest

from victoriametrics_spark import evaluate
from victoriametrics_spark.schema import SAMPLE_SCHEMA

from tests.test_golden import CFG, _norm_expected, _norm_result

# r6b golden sweep: slow tier — excluded from the default (driver-window) run;
# opt in with `pytest -m slow` (see pytest.ini)
pytestmark = pytest.mark.slow


CASES = [
    # (a, b) offset 0s
    ('sort((label_set(time(), "foo", "bar"), label_set(time()+10, "foo", "baz")) offset 0s)',
     [
      ('', {'foo': 'bar'}, [1000.0, 1200.0, 1400.0, 1600.0, 1800.0, 2000.0]),
      ('', {'foo': 'baz'}, [1010.0, 1210.0, 1410.0, 1610.0, 1810.0, 2010.0]),
     ]),
    # time()[:100s] offset 0s
    ('time()[:100s] offset 0s',
     [
      ('', {}, [1000.0, 1200.0, 1400.0, 1600.0, 1800.0, 2000.0]),
     ]),
    # time()[:100] offset 0
    ('time()[:100] offset 0',
     [
      ('', {}, [1000.0, 1200.0, 1400.0, 1600.0, 1800.0, 2000.0]),
     ]),
    # (a, b) offset 100s
    ('sort((label_set(time(), "foo", "bar"), label_set(time()+10, "foo", "baz")) offset 100s)',
     [
      ('', {'foo': 'bar'}, [800.0, 1000.0, 1200.0, 1400.0, 1600.0, 1800.0]),
      ('', {'foo': 'baz'}, [810.0, 1010.0, 1210.0, 1410.0, 1610.0, 1810.0]),
     ]),
    # (a offset 100s, b offset 50s)
    ('sort((label_set(time() offset 100s, "foo", "bar"), label_set(time()+10, "foo", "baz") offset 50s))',
     [
      ('', {'foo': 'bar'}, [800.0, 1000.0, 1200.0, 1400.0, 1600.0, 1800.0]),
      ('', {'foo': 'baz'}, [810.0, 1010.0, 1210.0, 1410.0, 1610.0, 1810.0]),
     ]),
    # (a offset 100s, b offset 50s) offset 400s
    ('sort((label_set(time() offset 100s, "foo", "bar"), label_set(time()+10, "foo", "baz") offset 50s) offset 400s)',
     [
      ('', {'foo': 'bar'}, [400.0, 600.0, 800.0, 1000.0, 1200.0, 1400.0]),
      ('', {'foo': 'baz'}, [410.0, 610.0, 810.0, 1010.0, 1210.0, 1410.0]),
     ]),
    # (a offset -100s, b offset -50s) offset -400s
    ('sort((label_set(time() offset -100s, "foo", "bar"), label_set(time()+10, "foo", "baz") offset -50s) offset -400s)',
     [
      ('', {'foo': 'bar'}, [1400.0, 1600.0, 1800.0, 2000.0, 2200.0, 2400.0]),
      ('', {'foo': 'baz'}, [1410.0, 1610.0, 1810.0, 2010.0, 2210.0, 2410.0]),
     ]),
    # tlast_change_over_time(hit_last)
    ('tlast_change_over_time(\n\t\t\ttime()[1h]\n\t\t)',
     [
      ('', {}, [1000.0, 1200.0, 1400.0, 1600.0, 1800.0, 2000.0]),
     ]),
    # tlast_change_over_time(hit_middle)
    ('tlast_change_over_time(\n\t\t\t(time() >=bool 1600)[1h]\n\t\t)',
     [
      ('', {}, [None, None, None, 1600.0, 1600.0, 1600.0]),
     ]),
    # timestamp_with_name(alias(time()>=1600))
    ('timestamp_with_name(alias(time()>=1600,"foo"))',
     [
      ('foo', {}, [None, None, None, 1600.0, 1800.0, 2000.0]),
     ]),
    # absent(NaN)
    ('absent(NaN)',
     [
      ('', {}, [1.0, 1.0, 1.0, 1.0, 1.0, 1.0]),
     ]),
    # absent_over_time(nan[200s:10s])
    ('absent_over_time(nan[200s:10s])',
     [
      ('', {}, [1.0, 1.0, 1.0, 1.0, 1.0, 1.0]),
     ]),
    # clamp(time(), 1400, 1800)
    ('clamp(time(), 1400, 1800)',
     [
      ('', {}, [1400.0, 1400.0, 1400.0, 1600.0, 1800.0, 1800.0]),
     ]),
    # clamp_max(time(), 1400)
    ('clamp_max(time(), 1400)',
     [
      ('', {}, [1000.0, 1200.0, 1400.0, 1400.0, 1400.0, 1400.0]),
     ]),
    # CLAmp_MAx(alias(time(),"foobar"), 1400)
    ('CLAmp_MAx(alias(time(), "foobar"), 1400)',
     [
      ('foobar', {}, [1000.0, 1200.0, 1400.0, 1400.0, 1400.0, 1400.0]),
     ]),
    # clamp_min(time(), -time()+3000)
    ('clamp_min(time(), -time()+2500)',
     [
      ('', {}, [1500.0, 1300.0, 1400.0, 1600.0, 1800.0, 2000.0]),
     ]),
    # clamp_min(1500, time())
    ('clamp_min(1500, time())',
     [
      ('', {}, [1500.0, 1500.0, 1500.0, 1600.0, 1800.0, 2000.0]),
     ]),
    # time() @ 1h
    ('time() @ 1h',
     [
      ('', {}, [3600.0, 3600.0, 3600.0, 3600.0, 3600.0, 3600.0]),
     ]),
    # time() @ start()
    ('time() @ start()',
     [
      ('', {}, [1000.0, 1000.0, 1000.0, 1000.0, 1000.0, 1000.0]),
     ]),
    # time() @ end()
    ('time() @ end()',
     [
      ('', {}, [2000.0, 2000.0, 2000.0, 2000.0, 2000.0, 2000.0]),
     ]),
    # time() @ end() offset 10m
    ('time() @ end() offset 10m',
     [
      ('', {}, [1400.0, 1400.0, 1400.0, 1400.0, 1400.0, 1400.0]),
     ]),
    # time() @ (end()-10m)
    ('time() @ (end()-10m)',
     [
      ('', {}, [1400.0, 1400.0, 1400.0, 1400.0, 1400.0, 1400.0]),
     ]),
    # now()
    ('round(now()/now())',
     [
      ('', {}, [1.0, 1.0, 1.0, 1.0, 1.0, 1.0]),
     ]),
    # pi()
    ('pi()',
     [
      ('', {}, [3.141592653589793, 3.141592653589793, 3.141592653589793, 3.141592653589793, 3.141592653589793, 3.141592653589793]),
     ]),
    # sin()
    ('sin(pi()*(2000-time())/1000)',
     [
      ('', {}, [1.2246467991473515e-16, 0.5877852522924732, 0.9510565162951536, 0.9510565162951535, 0.5877852522924731, 0.0]),
     ]),
    # sinh()
    ('sinh(pi()*(2000-time())/1000)',
     [
      ('', {}, [11.548739357257748, 6.132140673514712, 3.217113080357038, 1.6144880404748523, 0.6704839982471175, 0.0]),
     ]),
    # asin()
    ('asin((2000-time())/1000)',
     [
      ('', {}, [1.5707963267948966, 0.9272952180016123, 0.6435011087932843, 0.41151684606748806, 0.20135792079033082, 0.0]),
     ]),
    # asinh(sinh)
    ('asinh(sinh((2000-time())/1000))',
     [
      ('', {}, [1.0, 0.8000000000000002, 0.6, 0.4000000000000001, 0.2, 0.0]),
     ]),
    # atan2()
    ('time() atan2 time()/10',
     [
      ('', {}, [0.07853981633974483, 0.07853981633974483, 0.07853981633974483, 0.07853981633974483, 0.07853981633974483, 0.07853981633974483]),
     ]),
    # atan()
    ('atan((2000-time())/1000)',
     [
      ('', {}, [0.7853981633974483, 0.6747409422235526, 0.5404195002705842, 0.3805063771123649, 0.19739555984988078, 0.0]),
     ]),
    # atanh(tanh)
    ('atanh(tanh((2000-time())/1000))',
     [
      ('', {}, [1.0, 0.8000000000000002, 0.6, 0.4000000000000001, 0.2, 0.0]),
     ]),
    # cos()
    ('cos(pi()*(2000-time())/1000)',
     [
      ('', {}, [-1.0, -0.8090169943749475, -0.30901699437494734, 0.30901699437494745, 0.8090169943749473, 1.0]),
     ]),
    # acos()
    ('acos((2000-time())/1000)',
     [
      ('', {}, [0.0, 0.6435011087932843, 0.9272952180016123, 1.1592794807274085, 1.3694384060045657, 1.5707963267948966]),
     ]),
    # acosh(cosh)
    ('acosh(cosh((2000-time())/1000))',
     [
      ('', {}, [1.0, 0.8000000000000002, 0.5999999999999999, 0.40000000000000036, 0.20000000000000023, 0.0]),
     ]),
    # rad(deg)
    ('rad(deg(time()/500))',
     [
      ('', {}, [2.0, 2.3999999999999995, 2.8, 3.2, 3.6, 4.0]),
     ]),
    # floor(time()/500)
    ('floor(time()/500)',
     [
      ('', {}, [2.0, 2.0, 2.0, 3.0, 3.0, 4.0]),
     ]),
    # sqrt(time())
    ('sqrt(time())',
     [
      ('', {}, [31.622776601683793, 34.64101615137755, 37.416573867739416, 40.0, 42.42640687119285, 44.721359549995796]),
     ]),
    # ln(time())
    ('ln(time())',
     [
      ('', {}, [6.907755278982137, 7.090076835776092, 7.24422751560335, 7.3777589082278725, 7.495541943884256, 7.600902459542082]),
     ]),
    # log2(time())
    ('log2(time())',
     [
      ('', {}, [9.965784284662087, 10.228818690495881, 10.451211111832329, 10.643856189774725, 10.813781191217037, 10.965784284662087]),
     ]),
    # log10(time())
    ('log10(time())',
     [
      ('', {}, [3.0, 3.0791812460476247, 3.1461280356782377, 3.2041199826559246, 3.255272505103306, 3.3010299956639813]),
     ]),
    # time()*-4^0.5
    ('time()*-4^0.5',
     [
      ('', {}, [-2000.0, -2400.0, -2800.0, -3200.0, -3600.0, -4000.0]),
     ]),
    # default_for_nan_series
    ('label_set(0, "foo", "bar")/0 default 7',
     [
      ('', {'foo': 'bar'}, [7.0, 7.0, 7.0, 7.0, 7.0, 7.0]),
     ]),
    # labels_equal()
    ('sort(labels_equal((\n\t\t\tlabel_set(10, "instance", "qwe", "host", "rty"),\n\t\t\tlabel_set(20, "instance", "qwe", "host", "qwe"),\n\t\t\tlabel_set(30, "aaa", "bbb", "instance", "foo", "host", "foo"),\n\t\t), "instance", "host"))',
     [
      ('', {'host': 'qwe', 'instance': 'qwe'}, [20.0, 20.0, 20.0, 20.0, 20.0, 20.0]),
      ('', {'aaa': 'bbb', 'host': 'foo', 'instance': 'foo'}, [30.0, 30.0, 30.0, 30.0, 30.0, 30.0]),
     ]),
    # limit_offset
    ('limit_offset(1, 1, sort_by_label((\n\t\t\tlabel_set(time()*1, "foo", "y"),\n\t\t\tlabel_set(time()*2, "foo", "a"),\n\t\t\tlabel_set(time()*3, "foo", "x"),\n\t\t), "foo"))',
     [
      ('', {'foo': 'x'}, [3000.0, 3600.0, 4200.0, 4800.0, 5400.0, 6000.0]),
     ]),
    # limit_offset NaN
    ('limit_offset(1, 1, sort_by_label_desc((\n\t\t\tlabel_set(time()*1, "foo", "1"),\n\t\t\tlabel_set(time()*2, "foo", "2"),\n\t\t\tlabel_set(time()*3, "foo", "3"),\n\t\t) < 3000, "foo"))',
     [
      ('', {'foo': '1'}, [1000.0, 1200.0, 1400.0, 1600.0, 1800.0, 2000.0]),
     ]),
    # sgn(time()-1400)
    ('sgn(time()-1400)',
     [
      ('', {}, [-1.0, -1.0, 0.0, 1.0, 1.0, 1.0]),
     ]),
    # compare_to_nan_right
    ('1 != nan',
     [
      ('', {}, [1.0, 1.0, 1.0, 1.0, 1.0, 1.0]),
     ]),
    # mode()
    ('mode((\n\t\t\talias(3, "m1"),\n\t\t\talias(2, "m2"),\n\t\t\talias(3, "m3"),\n\t\t\talias(4, "m4"),\n\t\t\talias(3, "m5"),\n\t\t\talias(2, "m6"),\n\t\t))',
     [
      ('', {}, [3.0, 3.0, 3.0, 3.0, 3.0, 3.0]),
     ]),
    # share()
    ('sort_by_label(round(share((\n\t\t\tlabel_set(time()/100+10, "k", "v1"),\n\t\t\tlabel_set(time()/200+5, "k", "v2"),\n\t\t\tlabel_set(time()/110-10, "k", "v3"),\n\t\t\tlabel_set(time()/90-5, "k", "v4"),\n\t\t)), 0.001), "k")',
     [
      ('', {'k': 'v1'}, [0.554, 0.521, 0.487, 0.462, 0.442, 0.426]),
      ('', {'k': 'v2'}, [0.277, 0.26, 0.243, 0.231, 0.221, 0.213]),
      ('', {'k': 'v3'}, [None, 0.022, 0.055, 0.081, 0.1, 0.116]),
      ('', {'k': 'v4'}, [0.169, 0.197, 0.214, 0.227, 0.237, 0.245]),
     ]),
    # zscore()
    ('sort_by_label(round(zscore((\n\t\t\tlabel_set(time()/100+10, "k", "v1"),\n\t\t\tlabel_set(time()/200+5, "k", "v2"),\n\t\t\tlabel_set(time()/110-10, "k", "v3"),\n\t\t\tlabel_set(time()/90-5, "k", "v4"),\n\t\t)), 0.001), "k")',
     [
      ('', {'k': 'v1'}, [1.482, 1.511, 1.535, 1.552, 1.564, 1.57]),
      ('', {'k': 'v2'}, [0.159, 0.058, -0.042, -0.141, -0.237, -0.329]),
      ('', {'k': 'v3'}, [-1.285, -1.275, -1.261, -1.242, -1.219, -1.193]),
      ('', {'k': 'v4'}, [-0.356, -0.294, -0.232, -0.17, -0.108, -0.048]),
     ]),
    # geomean_over_time(time)
    ('round(geomean_over_time(alias(time()/100, "foobar")[3i]), 0.1)',
     [
      ('foobar', {}, [7.8, 9.9, 11.9, 13.9, 15.9, 17.9]),
     ]),
    # range_over_time(time)
    ('range_over_time(alias(time()/100, "foobar")[3i])',
     [
      ('', {}, [4.0, 4.0, 4.0, 4.0, 4.0, 4.0]),
     ]),
    # not-equal-list
    ('alias(time(), "foobar") != UNIon(100, 1000, 1400, 600)',
     [
      ('foobar', {}, [None, 1200.0, None, 1600.0, 1800.0, 2000.0]),
     ]),
    # duration_over_time
    ('duration_over_time((time()<1200)[600s:10s], 20s)',
     [
      ('', {}, [590.0, 580.0, 380.0, 180.0, None, None]),
     ]),
    # any()
    ('any(label_set(10, "__name__", "x", "foo", "bar") or label_set(time()/150, "__name__", "y", "baz", "sss"))',
     [
      ('x', {'foo': 'bar'}, [10.0, 10.0, 10.0, 10.0, 10.0, 10.0]),
     ]),
    # group() by (test)
    ('group((\n\t\t\tlabel_set(5, "__name__", "data", "test", "three samples", "point", "a"),\n\t\t\tlabel_set(6, "__name__", "data", "test", "three samples", "point", "b"),\n\t\t\tlabel_set(7, "__name__", "data", "test", "three samples", "point", "c"),\n\t\t)) by (test)',
     [
      ('', {'test': 'three samples'}, [1.0, 1.0, 1.0, 1.0, 1.0, 1.0]),
     ]),
    # group() without (point)
    ('group((\n\t\t\tlabel_set(5, "__name__", "data", "test", "three samples", "point", "a"),\n\t\t\tlabel_set(6, "__name__", "data", "test", "three samples", "point", "b"),\n\t\t\tlabel_set(7, "__name__", "data", "test", "three samples", "point", "c"),\n\t\t)) without (point)',
     [
      ('', {'test': 'three samples'}, [1.0, 1.0, 1.0, 1.0, 1.0, 1.0]),
     ]),
    # bottomk_min(1)
    ('sort(bottomk_min(1, label_set(10, "foo", "bar") or label_set(time()/150, "baz", "sss")))',
     [
      ('', {'baz': 'sss'}, [6.666666666666667, 8.0, 9.333333333333334, 10.666666666666666, 12.0, 13.333333333333334]),
     ]),
    # bottomk_max(1)
    ('sort(bottomk_max(1, label_set(10, "foo", "bar") or label_set(time()/150, "baz", "sss")))',
     [
      ('', {'foo': 'bar'}, [10.0, 10.0, 10.0, 10.0, 10.0, 10.0]),
     ]),
    # bottomk_avg(1)
    ('sort(bottomk_avg(1, label_set(10, "foo", "bar") or label_set(time()/150, "baz", "sss")))',
     [
      ('', {'baz': 'sss'}, [6.666666666666667, 8.0, 9.333333333333334, 10.666666666666666, 12.0, 13.333333333333334]),
     ]),
    # bottomk_median(1)
    ('sort(bottomk_median(1, label_set(10, "foo", "bar") or label_set(time()/15, "baz", "sss")))',
     [
      ('', {'foo': 'bar'}, [10.0, 10.0, 10.0, 10.0, 10.0, 10.0]),
     ]),
    # bottomk_last(1)
    ('sort(bottomk_last(1, label_set(10, "foo", "bar") or label_set(time()/15, "baz", "sss")))',
     [
      ('', {'foo': 'bar'}, [10.0, 10.0, 10.0, 10.0, 10.0, 10.0]),
     ]),
    # bottomk(1)
    ('bottomk(1, label_set(10, "foo", "bar") or label_set(time()/150, "baz", "sss") or label_set(time()<100, "a", "b"))',
     [
      ('', {'foo': 'bar'}, [None, None, None, 10.0, 10.0, 10.0]),
      ('', {'baz': 'sss'}, [6.666666666666667, 8.0, 9.333333333333334, None, None, None]),
     ]),
    # distinct()
    ('distinct(union(\n\t\t\t1+time() > 1100,\n\t\t\tlabel_set(time() > 1700, "foo", "bar"),\n\t\t))',
     [
      ('', {}, [None, 1.0, 1.0, 1.0, 2.0, 2.0]),
     ]),
    # if-default
    ('time() if time() > 1400 default -time()',
     [
      ('', {}, [-1000.0, -1200.0, -1400.0, 1600.0, 1800.0, 2000.0]),
     ]),
    # ifnot-default
    ('time() ifnot time() > 1400 default -time()',
     [
      ('', {}, [1000.0, 1200.0, 1400.0, -1600.0, -1800.0, -2000.0]),
     ]),
    # ifnot
    ('time() ifnot time() > 1400',
     [
      ('', {}, [1000.0, 1200.0, 1400.0, None, None, None]),
     ]),
    # mad()
    ('mad(\n\t\t\talias(time(), "metric1"),\n\t\t\talias(time()*1.5, "metric2"),\n\t\t\tlabel_set(time()*0.9, "baz", "sss"),\n\t\t)',
     [
      ('', {}, [100.0, 120.0, 140.0, 160.0, 180.0, 200.0]),
     ]),
    # outliers_iqr()
    ('sort(outliers_iqr((\n\t\t\talias(time(), "m1"),\n\t\t\talias(time()*1.5, "m2"),\n\t\t\talias(time()*10, "m3"),\n\t\t\talias(time()*1.2, "m4"),\n\t\t\talias(time()*0.1, "m5"),\n\t\t)))',
     [
      ('m5', {}, [100.0, 120.0, 140.0, 160.0, 180.0, 200.0]),
      ('m3', {}, [10000.0, 12000.0, 14000.0, 16000.0, 18000.0, 20000.0]),
     ]),
    # outliers_mad(1)
    ('outliers_mad(1, (\n\t\t\talias(time(), "metric1"),\n\t\t\talias(time()*1.5, "metric2"),\n\t\t\tlabel_set(time()*0.9, "baz", "sss"),\n\t\t))',
     [
      ('metric2', {}, [1500.0, 1800.0, 2100.0, 2400.0, 2700.0, 3000.0]),
     ]),
    # range_trim_outliers()
    ('range_trim_outliers(0.5, time())',
     [
      ('', {}, [None, None, 1400.0, 1600.0, None, None]),
     ]),
    # range_trim_outliers(time() > 1200)
    ('range_trim_outliers(0.5, time() > 1200)',
     [
      ('', {}, [None, None, None, 1600.0, 1800.0, None]),
     ]),
    # range_trim_spikes()
    ('range_trim_spikes(0.2, time())',
     [
      ('', {}, [None, 1200.0, 1400.0, 1600.0, 1800.0, None]),
     ]),
    # range_trim_spikes(time() > 1200 <= 1800)
    ('range_trim_spikes(0.2, time() > 1200 <= 1800)',
     [
      ('', {}, [None, None, None, 1600.0, None, None]),
     ]),
    # range_trim_zscore()
    ('range_trim_zscore(0.9, time())',
     [
      ('', {}, [None, 1200.0, 1400.0, 1600.0, 1800.0, None]),
     ]),
    # range_trim_zscore(time() > 1200 <= 1800)
    ('range_trim_zscore(0.9, time() > 1200 <= 1800)',
     [
      ('', {}, [None, None, None, 1600.0, None, None]),
     ]),
    # range_median()
    ('range_median(time())',
     [
      ('', {}, [1500.0, 1500.0, 1500.0, 1500.0, 1500.0, 1500.0]),
     ]),
    # mode_over_time()
    ('mode_over_time(round(time()/500)[100s:1s])',
     [
      ('', {}, [2.0, 2.0, 3.0, 3.0, 4.0, 4.0]),
     ]),
    # zscore_over_time(const)
    ('zscore_over_time(1[100s:10s])',
     [
      ('', {}, [0.0, 0.0, 0.0, 0.0, 0.0, 0.0]),
     ]),
    # increase_pure(time())
    ('increase_pure(time())',
     [
      ('', {}, [200.0, 200.0, 200.0, 200.0, 200.0, 200.0]),
     ]),
    # increase(time())
    ('increase(time())',
     [
      ('', {}, [200.0, 200.0, 200.0, 200.0, 200.0, 200.0]),
     ]),
    # increase(2000-time())
    ('increase(2000-time())',
     [
      ('', {}, [1000.0, 800.0, 600.0, 400.0, 200.0, 0.0]),
     ]),
    # increase_prometheus(time()[201s])
    ('increase_prometheus(time()[201s])',
     [
      ('', {}, [200.0, 200.0, 200.0, 200.0, 200.0, 200.0]),
     ]),
    # running_max(abs(1300-time()) > 300 < 700)
    ('running_max(abs(1300-time()) > 300 < 700)',
     [
      ('', {}, [None, None, None, None, 500.0, 500.0]),
     ]),
    # running_avg(time() > 1200 < 1800)
    ('running_avg(time() > 1200 < 1800)',
     [
      ('', {}, [None, None, 1400.0, 1500.0, 1500.0, 1500.0]),
     ]),
    # range_min(time() > 1200 < 1800)
    ('range_min(time() > 1200 < 1800)',
     [
      ('', {}, [1400.0, 1400.0, 1400.0, 1400.0, 1400.0, 1400.0]),
     ]),
    # range_normalize(time(),alias(-time(),"negative"))
    ('range_normalize(time(),alias(-time(), "negative"))',
     [
      ('', {}, [0.0, 0.2, 0.4, 0.6, 0.8, 1.0]),
      ('negative', {}, [1.0, 0.8, 0.6, 0.4, 0.2, 0.0]),
     ]),
    # range_normalize(time() > 1200 < 1800,alias(-(time() > 1400 < 2000),"negative"))
    ('range_normalize(time() > 1200 < 1800,alias(-(time() > 1200 < 2000), "negative"))',
     [
      ('', {}, [None, None, 0.0, 1.0, None, None]),
      ('negative', {}, [None, None, 1.0, 0.5, 0.0, None]),
     ]),
    # range_mad(time())
    ('range_mad(time())',
     [
      ('', {}, [300.0, 300.0, 300.0, 300.0, 300.0, 300.0]),
     ]),
    # range_mad(time() > 1200 < 1800)
    ('range_mad(time() > 1200 < 1800)',
     [
      ('', {}, [100.0, 100.0, 100.0, 100.0, 100.0, 100.0]),
     ]),
    # range_linear_regression(100/time())
    ('sort_desc(round((\n\t\t\t\talias(range_linear_regression(100/time()), "regress"),\n\t\t\t\talias(100/time(), "orig"),\n\t\t\t),\n\t\t\t0.001\n\t\t))',
     [
      ('orig', {}, [0.1, 0.083, 0.071, 0.062, 0.056, 0.05]),
      ('regress', {}, [0.095, 0.085, 0.075, 0.066, 0.056, 0.046]),
     ]),
    # avg(aggr_over_time(multi-func))
    ('avg(aggr_over_time(("min_over_time", "max_over_time"), time()[:10s]))',
     [
      ('', {}, [905.0, 1105.0, 1305.0, 1505.0, 1705.0, 1905.0]),
     ]),
    # avg(aggr_over_time(multi-func)) by (rollup)
    ('sort(avg(aggr_over_time(("min_over_time", "max_over_time"), time()[:10s])) by (rollup))',
     [
      ('', {'rollup': 'min_over_time'}, [810.0, 1010.0, 1210.0, 1410.0, 1610.0, 1810.0]),
      ('', {'rollup': 'max_over_time'}, [1000.0, 1200.0, 1400.0, 1600.0, 1800.0, 2000.0]),
     ]),
    # rollup_increase()
    ('sort(rollup_increase(time()))',
     [
      ('', {'rollup': 'min'}, [200.0, 200.0, 200.0, 200.0, 200.0, 200.0]),
      ('', {'rollup': 'max'}, [200.0, 200.0, 200.0, 200.0, 200.0, 200.0]),
      ('', {'rollup': 'avg'}, [200.0, 200.0, 200.0, 200.0, 200.0, 200.0]),
     ]),
    # rollup_scrape_interval()
    ('sort_by_label(rollup_scrape_interval(1[5m:10S]), "rollup")',
     [
      ('', {'rollup': 'avg'}, [10.0, 10.0, 10.0, 10.0, 10.0, 10.0]),
      ('', {'rollup': 'max'}, [10.0, 10.0, 10.0, 10.0, 10.0, 10.0]),
      ('', {'rollup': 'min'}, [10.0, 10.0, 10.0, 10.0, 10.0, 10.0]),
     ]),
    # rollup()
    ('sort(rollup(time()[:50s]))',
     [
      ('', {'rollup': 'min'}, [850.0, 1050.0, 1250.0, 1450.0, 1650.0, 1850.0]),
      ('', {'rollup': 'avg'}, [925.0, 1125.0, 1325.0, 1525.0, 1725.0, 1925.0]),
      ('', {'rollup': 'max'}, [1000.0, 1200.0, 1400.0, 1600.0, 1800.0, 2000.0]),
     ]),
    # start()
    ('time() - start()',
     [
      ('', {}, [0.0, 200.0, 400.0, 600.0, 800.0, 1000.0]),
     ]),
    # end()
    ('end() - time()',
     [
      ('', {}, [1000.0, 800.0, 600.0, 400.0, 200.0, 0.0]),
     ]),
    # step()
    ('time() / step()',
     [
      ('', {}, [5.0, 6.0, 7.0, 8.0, 9.0, 10.0]),
     ]),
    # ((1),(2,3))
    ('((\n\t\t\talias(1, "x1"),\n\t\t),(\n\t\t\talias(2, "x2"),\n\t\t\talias(3, "x3"),\n\t\t))',
     [
      ('x1', {}, [1.0, 1.0, 1.0, 1.0, 1.0, 1.0]),
      ('x2', {}, [2.0, 2.0, 2.0, 2.0, 2.0, 2.0]),
      ('x3', {}, [3.0, 3.0, 3.0, 3.0, 3.0, 3.0]),
     ]),
    # count_values_big_numbers
    ('sort_by_label(\n\t\t\tcount_values("xxx", (alias(772424014, "first"), alias(772424230, "second"))),\n\t\t\t"xxx"\n\t\t)',
     [
      ('', {'xxx': '772424014'}, [1.0, 1.0, 1.0, 1.0, 1.0, 1.0]),
      ('', {'xxx': '772424230'}, [1.0, 1.0, 1.0, 1.0, 1.0, 1.0]),
     ]),
    # count_values
    ('count_values("xxx", label_set(10, "foo", "bar") or label_set(time()/100, "foo", "bar", "baz", "xx"))',
     [
      ('', {'xxx': '10'}, [2.0, 1.0, 1.0, 1.0, 1.0, 1.0]),
      ('', {'xxx': '12'}, [None, 1.0, None, None, None, None]),
      ('', {'xxx': '14'}, [None, None, 1.0, None, None, None]),
      ('', {'xxx': '16'}, [None, None, None, 1.0, None, None]),
      ('', {'xxx': '18'}, [None, None, None, None, 1.0, None]),
      ('', {'xxx': '20'}, [None, None, None, None, None, 1.0]),
     ]),
    # count_values by (xxx)
    ('count_values("xxx", label_set(10, "foo", "bar", "xxx", "aaa") or label_set(floor(time()/600), "foo", "bar", "baz", "xx")) by (xxx)',
     [
      ('', {'xxx': '1'}, [1.0, None, None, None, None, None]),
      ('', {'xxx': '2'}, [None, 1.0, 1.0, 1.0, None, None]),
      ('', {'xxx': '3'}, [None, None, None, None, 1.0, 1.0]),
      ('', {'xxx': '10'}, [1.0, 1.0, 1.0, 1.0, 1.0, 1.0]),
     ]),
    # count_values without (baz)
    ('count_values("xxx", label_set(floor(time()/600), "foo", "bar")) without (baz)',
     [
      ('', {'foo': 'bar', 'xxx': '1'}, [1.0, None, None, None, None, None]),
      ('', {'foo': 'bar', 'xxx': '2'}, [None, 1.0, 1.0, 1.0, None, None]),
      ('', {'foo': 'bar', 'xxx': '3'}, [None, None, None, None, 1.0, 1.0]),
     ]),
    # result sorting
    ('(label_set(1, "instance", "localhost:1001", "type", "free"),\n\t\t\tlabel_set(1, "instance", "localhost:1001", "type", "buffers"),\n\t\t\tlabel_set(1, "instance", "localhost:1000", "type", "buffers"),\n\t\t\tlabel_set(1, "instance", "localhost:1000", "type", "free"),\n\t\t)',
     [
      ('', {}, [1.0, 1.0, 1.0, 1.0, 1.0, 1.0]),
      ('', {}, [1.0, 1.0, 1.0, 1.0, 1.0, 1.0]),
      ('', {}, [1.0, 1.0, 1.0, 1.0, 1.0, 1.0]),
      ('', {}, [1.0, 1.0, 1.0, 1.0, 1.0, 1.0]),
     ]),
    # no_sorting_for_or
    ('label_set(2, "foo", "bar") or label_set(1, "foo", "baz")',
     [
      ('', {'foo': 'bar'}, [2.0, 2.0, 2.0, 2.0, 2.0, 2.0]),
      ('', {'foo': 'baz'}, [1.0, 1.0, 1.0, 1.0, 1.0, 1.0]),
     ]),
]

# Exclusions (same rationale as test_golden_r6.py where shared):
# - `/0 default 7`: an all-NaN series resurrected by `default` — the row
#   model represents all-NaN series as absent.
# - (closed in round 13) duration_over_time boundary: VM starts the
#   gap accumulation at timestamps[0] (rollup.go:1151-1178), so the
#   first in-window sample contributes no gap; engine/rollup.py now
#   subtracts the earliest row's anchor gap and the case runs below.
# - 'result sorting' case: the Go test assigns expected tags via a loop
#   the extractor cannot capture; covered behaviorally by the sort
#   cases in test_golden.py.
_EXCLUDED = [
    'label_set(0, "foo", "bar")/0 default 7',
    'label_set(1, "instance", "localhost:1001", "type", "free")',
]
CASES = [c for c in CASES if not any(s in c[0] for s in _EXCLUDED)]


@pytest.fixture(scope="module")
def empty_samples(spark):
    return spark.createDataFrame([], SAMPLE_SCHEMA)


@pytest.mark.parametrize(
    "query,expected", [(q, e) for q, e in CASES], ids=[c[0][:60] for c in CASES]
)
def test_golden_r6b(spark, empty_samples, query, expected):
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

"""Function-name registries (mirrors the reference's registry files).

Rollup funcs: vendor/.../metricsql/rollup.go:7-98 (80 names).
Aggregate funcs: vendor/.../metricsql/aggr.go:7-45 (37 names).
Transform funcs: vendor/.../metricsql/transform.go:7-121 (112 names) —
anything that is neither rollup nor aggregate is treated as transform by
the parser; the planner validates implementation coverage.
"""

ROLLUP_FUNCS = {
    "absent_over_time", "aggr_over_time", "ascent_over_time", "avg_over_time",
    "changes", "changes_prometheus", "count_eq_over_time", "count_gt_over_time",
    "count_le_over_time", "count_ne_over_time", "count_over_time",
    "count_values_over_time", "decreases_over_time", "default_rollup", "delta",
    "delta_prometheus", "deriv", "deriv_fast", "descent_over_time",
    "distinct_over_time", "duration_over_time", "first_over_time",
    "geomean_over_time", "histogram_over_time", "hoeffding_bound_lower",
    "hoeffding_bound_upper", "holt_winters", "idelta", "ideriv", "increase",
    "increase_prometheus", "increase_pure", "increases_over_time", "integrate",
    "irate", "lag", "last_over_time", "lifetime", "mad_over_time",
    "max_over_time", "median_over_time", "min_over_time", "mode_over_time",
    "outlier_iqr_over_time", "predict_linear", "present_over_time",
    "quantile_over_time", "quantiles_over_time", "range_over_time", "rate",
    "rate_prometheus", "rate_over_sum", "resets", "rollup",
    "rollup_candlestick", "rollup_delta", "rollup_deriv", "rollup_increase",
    "rollup_rate", "rollup_scrape_interval", "scrape_interval",
    "share_gt_over_time", "share_le_over_time", "share_eq_over_time",
    "stale_samples_over_time", "stddev_over_time", "stdvar_over_time",
    "sum_eq_over_time", "sum_gt_over_time", "sum_le_over_time",
    "sum_over_time", "sum2_over_time", "tfirst_over_time", "timestamp",
    "timestamp_with_name", "tlast_change_over_time", "tlast_over_time",
    "tmax_over_time", "tmin_over_time", "zscore_over_time",
}

AGGR_FUNCS = {
    "any", "avg", "bottomk", "bottomk_avg", "bottomk_max", "bottomk_median",
    "bottomk_last", "bottomk_min", "count", "count_values", "distinct",
    "geomean", "group", "histogram", "limitk", "mad", "max", "median", "min",
    "mode", "outliers_iqr", "outliers_mad", "outliersk", "quantile",
    "quantiles", "share", "stddev", "stdvar", "sum", "sum2", "topk",
    "topk_avg", "topk_max", "topk_median", "topk_last", "topk_min", "zscore",
}

BINARY_OPS = {
    "+", "-", "*", "/", "%", "^", "atan2",
    "==", "!=", ">", "<", ">=", "<=",
    "and", "or", "unless", "if", "ifnot", "default",
}

# vendor/.../metricsql/binary_op.go:40-67
BINARY_OP_PRIORITY = {
    "default": -1,
    "if": 0, "ifnot": 0,
    "or": 1,
    "and": 2, "unless": 2,
    "==": 3, "!=": 3, "<": 3, ">": 3, "<=": 3, ">=": 3,
    "+": 4, "-": 4,
    "*": 5, "/": 5, "%": 5, "atan2": 5,
    "^": 6,
}

RIGHT_ASSOCIATIVE = {"^"}

COMPARISON_OPS = {"==", "!=", ">", "<", ">=", "<="}


def is_rollup_func(name: str) -> bool:
    return name.lower() in ROLLUP_FUNCS


def is_aggr_func(name: str) -> bool:
    return name.lower() in AGGR_FUNCS


def is_binary_op(name: str) -> bool:
    return name.lower() in BINARY_OPS

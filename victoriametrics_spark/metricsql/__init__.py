"""Pure-Python MetricsQL (PromQL-superset) parser.

Produces the same AST shapes as the reference parser
(vendor/github.com/VictoriaMetrics/metricsql/parser.go): MetricExpr,
RollupExpr, FuncExpr, AggrFuncExpr, BinaryOpExpr, NumberExpr, StringExpr,
DurationExpr, with WITH-template expansion done at parse time.
"""

from victoriametrics_spark.metricsql.ast import (
    AggrFuncExpr,
    BinaryOpExpr,
    DurationExpr,
    Expr,
    FuncExpr,
    LabelFilter,
    MetricExpr,
    NumberExpr,
    RollupExpr,
    StringExpr,
)
from victoriametrics_spark.metricsql.parser import parse

__all__ = [
    "AggrFuncExpr",
    "BinaryOpExpr",
    "DurationExpr",
    "Expr",
    "FuncExpr",
    "LabelFilter",
    "MetricExpr",
    "NumberExpr",
    "RollupExpr",
    "StringExpr",
    "parse",
]

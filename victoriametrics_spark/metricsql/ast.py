"""MetricsQL AST node classes.

Same node taxonomy as the reference parser
(vendor/github.com/VictoriaMetrics/metricsql/parser.go: MetricExpr at
:2389, RollupExpr at :2248, FuncExpr/AggrFuncExpr at :2162, BinaryOpExpr,
NumberExpr, StringExpr, DurationExpr at :1734). Nodes are plain frozen-ish
dataclasses; the planner dispatches on type.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


class Expr:
    """Base class for all MetricsQL expressions."""

    def fingerprint(self) -> str:
        return repr(self)


@dataclass
class NumberExpr(Expr):
    value: float

    def __repr__(self) -> str:
        return f"Number({self.value!r})"


@dataclass
class StringExpr(Expr):
    value: str

    def __repr__(self) -> str:
        return f"Str({self.value!r})"


# duration unit → milliseconds
_UNIT_MS = {
    "ms": 1.0,
    "s": 1000.0,
    "m": 60_000.0,
    "h": 3_600_000.0,
    "d": 86_400_000.0,
    "w": 7 * 86_400_000.0,
    "y": 365 * 86_400_000.0,
}

# units case-insensitive except bare `m` (minutes; `M` is the 1e6 number
# suffix — see lexer._DUR_UNIT)
_DUR_PART = re.compile(r"(\d+(?:\.\d+)?)([mM][sS]|[sShHdDwWyY]|m|i)")


@dataclass
class DurationExpr(Expr):
    """A duration literal like ``5m``, ``1h30m``, ``-2.5d``, ``0.3i``.

    ``i`` means "multiples of the query step" (MetricsQL extension,
    vendor/.../metricsql/lexer.go PositiveDurationValue). A bare number in a
    duration position is seconds.
    """

    text: str

    def ms(self, step_ms: int) -> int:
        s = self.text.strip()
        sign = 1
        if s.startswith("-"):
            sign = -1
            s = s[1:]
        elif s.startswith("+"):
            s = s[1:]
        # bare number → seconds
        if re.fullmatch(r"\d+(\.\d+)?", s):
            return int(sign * float(s) * 1000)
        total = 0.0
        pos = 0
        for m in _DUR_PART.finditer(s):
            if m.start() != pos:
                raise ValueError(f"invalid duration {self.text!r}")
            n, unit = float(m.group(1)), m.group(2).lower()
            total += n * (step_ms if unit == "i" else _UNIT_MS[unit])
            pos = m.end()
        if pos != len(s):
            raise ValueError(f"invalid duration {self.text!r}")
        return int(sign * total)

    def seconds_value(self) -> float:
        """Duration used in scalar context → seconds (MetricsQL allows it)."""
        return self.ms(step_ms=0) / 1000.0

    def __repr__(self) -> str:
        return f"Dur({self.text!r})"


@dataclass
class LabelFilter:
    """One label predicate inside ``{...}``. op ∈ {=, !=, =~, !~}.

    Reference: vendor/.../metricsql/parser.go:2339 (LabelFilter), regexes
    are fully anchored RE2 (lib/storage/tag_filters.go:160-173).
    """

    label: str
    op: str
    value: str

    @property
    def is_negative(self) -> bool:
        return self.op in ("!=", "!~")

    @property
    def is_regexp(self) -> bool:
        return self.op in ("=~", "!~")

    def __repr__(self) -> str:
        return f"{self.label}{self.op}{self.value!r}"


@dataclass
class MetricExpr(Expr):
    """Series selector: OR-list of AND-groups of label filters
    (vendor/.../metricsql/parser.go:2389-2397 LabelFilterss)."""

    label_filterss: list[list[LabelFilter]] = field(default_factory=list)

    def metric_name(self) -> str | None:
        """The literal ``__name__`` if every OR group pins the same one."""
        names = set()
        for group in self.label_filterss:
            got = None
            for f in group:
                if f.label == "__name__" and f.op == "=":
                    got = f.value
            names.add(got)
        if len(names) == 1:
            return names.pop()
        return None

    def is_empty(self) -> bool:
        return not any(self.label_filterss)

    def __repr__(self) -> str:
        return f"Metric({self.label_filterss!r})"


@dataclass
class ModifierExpr:
    """``by (a,b)`` / ``without (a)`` / ``on (...)`` / ``ignoring (...)`` /
    ``group_left (...)`` etc."""

    op: str
    args: list[str] = field(default_factory=list)

    def __repr__(self) -> str:
        return f"{self.op}({','.join(self.args)})"


@dataclass
class RollupExpr(Expr):
    """``expr[window:step] offset off @ at keep_metric_names``.

    window/step/offset may be None; inherit_step marks ``[w:]``.
    Reference: parser.go:2248-2282.
    """

    expr: Expr
    window: DurationExpr | None = None
    step: DurationExpr | None = None  # subquery step
    offset: DurationExpr | None = None
    at: Expr | None = None
    inherit_step: bool = False
    keep_metric_names: bool = False

    @property
    def is_subquery(self) -> bool:
        return self.step is not None or self.inherit_step or not isinstance(
            self.expr, MetricExpr
        )

    def __repr__(self) -> str:
        # EVERY semantic field must appear: repr() is the identity key of
        # the CSE / leaf-result / plan caches — omitting a field makes two
        # different queries collide and serves the wrong cached plan
        return (
            f"Rollup({self.expr!r}, w={self.window!r}, step={self.step!r}, "
            f"off={self.offset!r}, at={self.at!r}, "
            f"ih={self.inherit_step}, k={self.keep_metric_names})"
        )


@dataclass
class FuncExpr(Expr):
    name: str
    args: list[Expr] = field(default_factory=list)
    keep_metric_names: bool = False

    def __repr__(self) -> str:
        # all semantic fields — cache-key identity (see RollupExpr.__repr__)
        return f"Fn:{self.name}({self.args!r}, k={self.keep_metric_names})"


@dataclass
class AggrFuncExpr(Expr):
    """Aggregate with grouping modifier and MetricsQL ``limit N``
    (parser.go:2162-2177)."""

    name: str
    args: list[Expr] = field(default_factory=list)
    modifier: ModifierExpr | None = None  # by / without
    limit: int = 0

    def __repr__(self) -> str:
        return f"Aggr:{self.name}({self.args!r}, mod={self.modifier!r}, limit={self.limit})"


@dataclass
class BinaryOpExpr(Expr):
    op: str
    left: Expr = None  # type: ignore[assignment]
    right: Expr = None  # type: ignore[assignment]
    bool_modifier: bool = False
    group_modifier: ModifierExpr | None = None  # on / ignoring
    join_modifier: ModifierExpr | None = None  # group_left / group_right
    join_modifier_prefix: str | None = None
    keep_metric_names: bool = False
    # fill()/fill_left()/fill_right() NaN-fill modifiers
    # (vendor/.../metricsql/parser.go:1967-1971)
    fill_left: float | None = None
    fill_right: float | None = None

    def __repr__(self) -> str:
        fills = (
            f", fl={self.fill_left!r}, fr={self.fill_right!r}"
            if self.fill_left is not None or self.fill_right is not None
            else ""
        )
        return (
            f"BinOp({self.op!r}, {self.left!r}, {self.right!r}, "
            f"bool={self.bool_modifier}, grp={self.group_modifier!r}, "
            f"join={self.join_modifier!r}, jp={self.join_modifier_prefix!r}, "
            f"k={self.keep_metric_names}{fills})"
        )


def walk(expr: Expr):
    """Yield every node in the tree (pre-order)."""
    yield expr
    if isinstance(expr, RollupExpr):
        yield from walk(expr.expr)
        if expr.at is not None:
            yield from walk(expr.at)
    elif isinstance(expr, (FuncExpr, AggrFuncExpr)):
        for a in expr.args:
            yield from walk(a)
    elif isinstance(expr, BinaryOpExpr):
        yield from walk(expr.left)
        yield from walk(expr.right)

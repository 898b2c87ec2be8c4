"""LogsQL pipe operators as DataFrame combinators.

Reference inventory (vendored VictoriaLogs, SURVEY.md §2.9):
pipe_stats.go (stats by + 26 stats funcs), pipe_sort.go/sort_topk.go,
pipe_join.go, pipe_top.go, pipe_uniq.go, pipe_limit/offset, pipe_math.go,
pipe_extract[_regexp].go, pipe_unpack_json.go, pipe_unroll.go,
pipe_first/last.go, pipe_running_stats.go, pipe_facets.go, pipe_filter
family (filter_phrase.go etc.).

Each pipe is a pure DataFrame→DataFrame function; chains compose with
ordinary function composition so Catalyst sees one logical plan (column
pruning and predicate pushdown cross pipe boundaries for free).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# stats-function registry (pipe_stats.go stats funcs → Catalyst aggs)
STATS_FUNCS: dict[str, Callable[[Column], Column]] = {
    "count": lambda c: F.count(c),
    "count_uniq": lambda c: F.count_distinct(c),
    "count_uniq_hash": lambda c: F.approx_count_distinct(c),
    "sum": lambda c: F.sum(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
    "avg": lambda c: F.avg(c),
    "median": lambda c: F.percentile(c, F.lit(0.5)),
    "stddev": lambda c: F.stddev_pop(c),
    "uniq_values": lambda c: F.array_sort(F.collect_set(c)),
    "values": lambda c: F.collect_list(c),
    "any": lambda c: F.first(c),
    "sum_len": lambda c: F.sum(F.length(c)),
    "count_empty": lambda c: F.count_if(c.isNull() | (c.cast("string") == "")),
}


def stats(
    df: DataFrame,
    by: list[str],
    aggs: dict[str, Column],
) -> DataFrame:
    """``| stats by (fields) f1(...) as a1, ...`` (pipe_stats.go)."""
    agg_cols = [c.alias(name) for name, c in aggs.items()]
    if by:
        return df.groupBy(*by).agg(*agg_cols)
    return df.groupBy().agg(*agg_cols)


def quantile(c: Column, phi: float) -> Column:
    return F.percentile(c, F.lit(phi))


def sort(df: DataFrame, by: list[tuple[str, bool]], limit: int | None = None) -> DataFrame:
    """``| sort by (f1 desc, f2) [limit N]`` (pipe_sort.go; limited sort =
    sort_topk.go's top-N heap, which Spark's TakeOrderedAndProject is)."""
    cols = [F.col(c).desc() if desc else F.col(c).asc() for c, desc in by]
    out = df.orderBy(*cols)
    return out.limit(limit) if limit is not None else out


def join(
    df: DataFrame,
    sub: DataFrame,
    by: list[str],
    how: str = "left",
    prefix: str = "",
) -> DataFrame:
    """``| join by (fields) (subquery) [inner] [prefix]`` —
    LEFT by default, INNER optional (pipe_join.go:16-42)."""
    if prefix:
        renames = {c: prefix + c for c in sub.columns if c not in by}
        for old, new in renames.items():
            sub = sub.withColumnRenamed(old, new)
    return df.join(sub, on=by, how=how)


def top(df: DataFrame, fields: list[str], k: int) -> DataFrame:
    """``| top N by (fields)`` — most frequent field values (pipe_top.go).
    Deterministic: ties broken by field values ascending."""
    counted = df.groupBy(*fields).agg(F.count("*").alias("hits"))
    order = [F.col("hits").desc()] + [F.col(f).asc() for f in fields]
    return counted.orderBy(*order).limit(k)


def uniq(df: DataFrame, fields: list[str]) -> DataFrame:
    """``| uniq by (fields)`` (pipe_uniq.go)."""
    return df.select(*fields).distinct()


def limit_offset(
    df: DataFrame, limit: int, offset: int = 0, order=None
) -> DataFrame:
    """``| offset N | limit M``.

    ``order`` is a list of (column, desc) sort keys; when given, the
    offset window is ordered by them — deterministic under retries and
    re-partitioning. Without it, offset falls back to
    ``offset+limit`` rows taken in plan order then sliced — still
    deterministic per plan (monotonically_increasing_id was neither:
    nondeterministic under retries AND a single-task global window)."""
    if offset:
        if order:
            cols = [
                (F.col(c).desc() if d else F.col(c).asc()) for c, d in order
            ]
            w = Window.orderBy(*cols)
            return (
                df.withColumn("__rn", F.row_number().over(w))
                .filter(
                    (F.col("__rn") > offset) & (F.col("__rn") <= offset + limit)
                )
                .drop("__rn")
            )
        # presentation-only slice: bound the frame to offset+limit rows
        # first, then number deterministically by the full row content —
        # the single-task window only ever sees offset+limit rows
        head = df.limit(offset + limit)
        w = Window.orderBy(*[F.col(c) for c in df.columns])
        return (
            head.withColumn("__rn", F.row_number().over(w))
            .filter((F.col("__rn") > offset) & (F.col("__rn") <= offset + limit))
            .drop("__rn")
        )
    return df.limit(limit)


def math(df: DataFrame, exprs: dict[str, Column]) -> DataFrame:
    """``| math expr as field`` (pipe_math.go)."""
    out = df
    for name, c in exprs.items():
        out = out.withColumn(name, c)
    return out


def extract_regexp(df: DataFrame, src: str, pattern: str, groups: dict[str, int]) -> DataFrame:
    """``| extract_regexp "re" from field`` (pipe_extract_regexp.go)."""
    out = df
    for name, gidx in groups.items():
        out = out.withColumn(name, F.regexp_extract(F.col(src), pattern, gidx))
    return out


def unpack_json(df: DataFrame, src: str, fields: list[str], prefix: str = "") -> DataFrame:
    """``| unpack_json from field`` (pipe_unpack_json.go) — extracts the
    listed keys as string columns."""
    out = df
    for f in fields:
        out = out.withColumn(prefix + f, F.get_json_object(F.col(src), f"$.{f}"))
    return out


def unroll(df: DataFrame, field: str, out_field: str | None = None) -> DataFrame:
    """``| unroll by (field)`` → explode (pipe_unroll.go)."""
    return df.withColumn(out_field or field, F.explode(F.col(field)))


def first(df: DataFrame, by: list[str], order: list[tuple[str, bool]]) -> DataFrame:
    """``| first by (...)`` — first row per group in the given order
    (pipe_first.go); deterministic via full-order tie-break."""
    cols = [F.col(c).desc() if desc else F.col(c).asc() for c, desc in order]
    w = Window.partitionBy(*by).orderBy(*cols)
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def last(df: DataFrame, by: list[str], order: list[tuple[str, bool]]) -> DataFrame:
    inv = [(c, not d) for c, d in order]
    return first(df, by, inv)


def running_stats(
    df: DataFrame,
    by: list[str],
    order: list[tuple[str, bool]],
    aggs: dict[str, Column],
) -> DataFrame:
    """``| running_stats`` — cumulative aggregates in row order
    (pipe_running_stats.go)."""
    cols = [F.col(c).desc() if desc else F.col(c).asc() for c, desc in order]
    w = (
        Window.partitionBy(*by)
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = df
    for name, c in aggs.items():
        out = out.withColumn(name, c.over(w))
    return out


def facets(df: DataFrame, fields: list[str], k: int = 3) -> DataFrame:
    """``| facets N`` — top-N values per field with hit counts
    (pipe_facets.go). Output: (field, value, hits)."""
    parts = []
    for f in fields:
        counted = (
            df.select(F.col(f).cast("string").alias("value"))
            .groupBy("value")
            .agg(F.count("*").alias("hits"))
            .withColumn("field", F.lit(f))
        )
        w = Window.partitionBy("field").orderBy(
            F.col("hits").desc(), F.col("value").asc()
        )
        parts.append(
            counted.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .drop("__rn")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select("field", "value", "hits")


# ---- filter family (filter_phrase.go, filter_prefix.go, filter_regexp.go,
# filter_range.go, filter_in.go, filter_sequence.go) --------------------
def phrase_filter(col: Column, phrase: str) -> Column:
    return col.contains(phrase)


def prefix_filter(col: Column, prefix: str) -> Column:
    return col.startswith(prefix)


def regexp_filter(col: Column, pattern: str) -> Column:
    return col.rlike(pattern)


def range_filter(col: Column, lo, hi) -> Column:
    return (col >= lo) & (col <= hi)


def in_filter(col: Column, values: list) -> Column:
    return col.isin(*values)


def sequence_filter(col: Column, phrases: list[str]) -> Column:
    """All phrases occur in order (filter_sequence.go) — realized as a
    single regex with non-greedy gaps."""
    import re as _re

    pattern = ".*?".join(_re.escape(p) for p in phrases)
    return col.rlike(pattern)


# ------------------------------------------------------------------ round 3:
# remaining pipes/stats/filters (vendor/.../logstorage pipe_*.go coverage)

# additional stats functions (stats_*.go)
STATS_FUNCS.update(
    {
        "count_uniq": lambda c: F.count_distinct(c).cast("double"),
        "count_uniq_hash": lambda c: F.approx_count_distinct(c).cast("double"),
        "field_min": lambda c: F.min(c),
        "field_max": lambda c: F.max(c),
        "stdvar": lambda c: F.var_pop(c),
    }
)


def row_min(order_field: str, *fields: str) -> Column:
    """stats_row_min.go: the listed fields of the row minimizing
    ``order_field``."""
    return F.min_by(F.struct(*[F.col(f) for f in fields]), F.col(order_field))


def row_max(order_field: str, *fields: str) -> Column:
    return F.max_by(F.struct(*[F.col(f) for f in fields]), F.col(order_field))


def row_any(*fields: str) -> Column:
    return F.first(F.struct(*[F.col(f) for f in fields]))


def _pattern_to_regex(pattern: str) -> tuple[str, list[str]]:
    """LogsQL extract pattern → anchored regex with one group per
    ``<field>`` placeholder (pipe_extract.go pattern syntax: fields are
    non-greedy up to the next literal run)."""
    import re as _re

    parts = _re.split(r"(<[a-zA-Z_][a-zA-Z0-9_]*>)", pattern)
    regex, fields = "", []
    for i, p in enumerate(parts):
        if _re.fullmatch(r"<[a-zA-Z_][a-zA-Z0-9_]*>", p or ""):
            fields.append(p[1:-1])
            # non-greedy when a literal follows; greedy at the end
            nxt = parts[i + 1] if i + 1 < len(parts) else ""
            regex += "(.*?)" if nxt else "(.*)"
        else:
            regex += _re.escape(p)
    return regex, fields


def extract(df: DataFrame, src: str, pattern: str) -> DataFrame:
    """``| extract "text<field1>more<field2>"`` (pipe_extract.go pattern
    form) — one new column per placeholder."""
    regex, fields = _pattern_to_regex(pattern)
    out = df
    for i, f_name in enumerate(fields, start=1):
        out = out.withColumn(f_name, F.regexp_extract(F.col(src), regex, i))
    return out


def unpack_logfmt(df: DataFrame, src: str, fields: list[str]) -> DataFrame:
    """``| unpack_logfmt`` (pipe_unpack_logfmt.go): key=value pairs,
    values optionally double-quoted."""
    out = df
    for f_name in fields:
        quoted = F.regexp_extract(F.col(src), f'{f_name}="([^"]*)"', 1)
        bare = F.regexp_extract(F.col(src), f"{f_name}=([^\\s\"]+)", 1)
        out = out.withColumn(
            f_name, F.when(quoted != "", quoted).otherwise(bare)
        )
    return out


def pack_json(df: DataFrame, fields: list[str], dst: str = "json") -> DataFrame:
    """``| pack_json [fields]`` (pipe_pack_json.go)."""
    return df.withColumn(dst, F.to_json(F.struct(*[F.col(f) for f in fields])))


def split(df: DataFrame, src: str, sep: str, dst: str | None = None) -> DataFrame:
    """``| split (sep)`` (pipe_split.go) — field → array of substrings."""
    import re as _re

    return df.withColumn(dst or src, F.split(F.col(src), _re.escape(sep)))


def len_pipe(df: DataFrame, src: str, dst: str = "len") -> DataFrame:
    """``| len(field)`` (pipe_len.go)."""
    return df.withColumn(dst, F.length(F.col(src)).cast("long"))


def hash_pipe(df: DataFrame, src: str, dst: str = "hash") -> DataFrame:
    """``| hash(field)`` (pipe_hash.go — 64-bit hash of the value)."""
    return df.withColumn(dst, F.xxhash64(F.col(src)))


def format_pipe(df: DataFrame, fmt: str, dst: str) -> DataFrame:
    """``| format "text<field>..." as dst`` (pipe_format.go)."""
    import re as _re

    parts = _re.split(r"(<[a-zA-Z_][a-zA-Z0-9_]*>)", fmt)
    cols = []
    for p in parts:
        if _re.fullmatch(r"<[a-zA-Z_][a-zA-Z0-9_]*>", p or ""):
            cols.append(F.coalesce(F.col(p[1:-1]).cast("string"), F.lit("")))
        elif p:
            cols.append(F.lit(p))
    return df.withColumn(dst, F.concat(*cols) if cols else F.lit(""))


def replace_pipe(
    df: DataFrame, src: str, old: str, new: str, regex: bool = False
) -> DataFrame:
    """``| replace ("old", "new")`` / ``replace_regexp`` (pipe_replace*.go)."""
    import re as _re

    pat = old if regex else _re.escape(old)
    return df.withColumn(src, F.regexp_replace(F.col(src), pat, new))


def decolorize(df: DataFrame, src: str) -> DataFrame:
    """``| decolorize`` (pipe_decolorize.go) — strip ANSI escapes."""
    return df.withColumn(
        src, F.regexp_replace(F.col(src), r"\x1b\[[0-9;]*[a-zA-Z]", "")
    )


def copy_fields(df: DataFrame, mapping: list[tuple[str, str]]) -> DataFrame:
    """``| copy src as dst, ...`` (pipe_copy.go)."""
    out = df
    for src, dst in mapping:
        out = out.withColumn(dst, F.col(src))
    return out


def rename_fields(df: DataFrame, mapping: list[tuple[str, str]]) -> DataFrame:
    """``| rename src as dst, ...`` (pipe_rename.go)."""
    out = df
    for src, dst in mapping:
        out = out.withColumnRenamed(src, dst)
    return out


def delete_fields(df: DataFrame, fields: list[str]) -> DataFrame:
    """``| delete f1, f2`` (pipe_delete.go)."""
    return df.drop(*fields)


def fields_pipe(df: DataFrame, fields: list[str]) -> DataFrame:
    """``| fields f1, f2`` (pipe_fields.go) — keep only the listed."""
    return df.select(*fields)


def sample(df: DataFrame, fraction: float, seed: int = 1) -> DataFrame:
    """``| sample N`` (pipe_sample.go) — Bernoulli sample."""
    return df.sample(fraction=fraction, seed=seed)


def total_stats(
    df: DataFrame, order: list[tuple[str, bool]], aggs: dict[str, Column]
) -> DataFrame:
    """``| total_stats`` (pipe_total_stats.go) — running aggregates over
    the WHOLE stream in sort order (no partitioning)."""
    cols = [(F.col(c).desc() if d else F.col(c).asc()) for c, d in order]
    w = (
        Window.orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = df
    for name, c in aggs.items():
        out = out.withColumn(name, c.over(w))
    return out


# -------------------------------------------------------------- filters
def exact_filter(col: Column, value: str) -> Column:
    """``exact("v")`` (filter_exact.go) — whole-value equality."""
    return col == F.lit(value)


def word_filter(col: Column, word: str) -> Column:
    """bare-word filter (filter_word.go): the word bounded by
    non-word characters."""
    import re as _re

    return col.rlike(rf"(?:^|\W){_re.escape(word)}(?:\W|$)")


def ipv4_range_filter(col: Column, lo: str, hi: str) -> Column:
    """``ipv4_range(lo, hi)`` (filter_ipv4_range.go) — dotted-quad
    column within the inclusive numeric range."""

    def ip_num(ip: str) -> int:
        a, b, c, d = (int(x) for x in ip.split("."))
        return (a << 24) | (b << 16) | (c << 8) | d

    parts = F.split(col, r"\.")
    num = (
        F.element_at(parts, 1).cast("long") * F.lit(1 << 24)
        + F.element_at(parts, 2).cast("long") * F.lit(1 << 16)
        + F.element_at(parts, 3).cast("long") * F.lit(1 << 8)
        + F.element_at(parts, 4).cast("long")
    )
    valid = col.rlike(r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$")
    return valid & num.between(ip_num(lo), ip_num(hi))

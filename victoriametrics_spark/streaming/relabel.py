"""Relabeling DSL (SURVEY.md §2.10) — ingestion-time row transforms.

Reference actions (lib/promrelabel/config.go + relabel.go:160-430):
replace, replace_all, keep, drop, keepequal, dropequal, keep_if_equal,
drop_if_equal, keep_if_contains, drop_if_contains, keep_metrics,
drop_metrics, hashmod, labelmap, labelmap_all, labeldrop, labelkeep,
uppercase, lowercase, graphite. A rule list compiles to one chained
column expression — streaming-safe, no Python boundary.

Rule dict shape (mirrors the YAML config):
  {action, source_labels: [..], separator, target_label, regex,
   replacement, modulus, if, match, labels}
``__name__`` may be used as a source/target label (maps to the name
column).

``if`` (a MetricsQL series selector, or a list of them OR-ed — VM
extension, lib/promrelabel/relabel.go:163-171): on mismatch the rule
is a no-op for that row, EXCEPT ``action: keep`` which drops the row;
``keep``/``drop`` with ``if`` and no explicit regex are pure selector
filters (the reference's fast paths at relabel.go:333-357).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SEP = ";"


def _get_label(label: str) -> Column:
    if label == "__name__":
        return F.col("name")
    return F.coalesce(F.col("labels").getItem(label), F.lit(""))


def _src_value(rule: dict) -> Column:
    sep = rule.get("separator", DEFAULT_SEP)
    srcs = rule.get("source_labels", [])
    if not srcs:
        return F.lit("")
    return F.concat_ws(sep, *[_get_label(s) for s in srcs])


def _anchored(regex: str) -> str:
    return f"^(?:{regex})$"


def _set_label(df: DataFrame, label: str, value: Column) -> DataFrame:
    if label == "__name__":
        return df.withColumn("name", value)
    return df.withColumn(
        "labels",
        F.when(
            value == "",
            F.map_filter(F.col("labels"), lambda k, v: k != F.lit(label)),
        ).otherwise(
            F.map_concat(
                F.map_filter(F.col("labels"), lambda k, v: k != F.lit(label)),
                F.create_map(F.lit(label), value),
            )
        ),
    )


def _if_condition(rule: dict) -> Column | None:
    """``if`` series-selector condition (lib/promrelabel/relabel.go:163,
    IfExpression) — a MetricsQL selector string, or a list OR-ed."""
    sel = rule.get("if")
    if sel is None:
        return None
    from victoriametrics_spark.engine.planner import selector_predicate
    from victoriametrics_spark.metricsql.ast import MetricExpr
    from victoriametrics_spark.metricsql.parser import parse

    conds: list[Column] = []
    for s in sel if isinstance(sel, list) else [sel]:
        me = parse(s)
        if not isinstance(me, MetricExpr):
            raise ValueError(f"relabel `if` must be a series selector: {s!r}")
        conds.append(selector_predicate(me))
    out = conds[0]
    for c in conds[1:]:
        out = out | c
    return out


def _regex_str(rule: dict, default: str = "(.*)") -> str:
    """``regex`` may be a multi-line YAML list — the reference joins the
    alternatives with ``|`` (lib/promrelabel/config.go MultiLineRegex)."""
    rx = rule.get("regex", default)
    if isinstance(rx, list):
        rx = "|".join(str(x) for x in rx)
    return str(rx)


def _graphite_match_regex(match: str) -> str:
    """Graphite match template → anchored regex: ``*`` captures a
    dot-free run (non-greedy mid-template = the reference's
    first-occurrence search, lib/promrelabel/graphite.go:80-128)."""
    import re as _re

    segs = match.split("*")
    parts = [_re.escape(segs[0])]
    for i, lit in enumerate(segs[1:], start=1):
        is_last = i == len(segs) - 1
        parts.append("([^.]*)" if is_last and lit == "" else "([^.]*?)")
        parts.append(_re.escape(lit))
    return "^" + "".join(parts) + "$"


def _graphite_template(tpl: str) -> str:
    """``$1`` / ``${2}`` capture refs → Java numbered refs ($0 = the
    whole name, matching graphiteMatches dst[0])."""
    import re as _re

    return _re.sub(r"\$\{(\d+)\}", r"$\1", tpl)


def _fill_label_references(replacement: str) -> Column:
    """``{{labelName}}`` references in ``replacement`` filled from the
    row's labels BEFORE regex expansion (relabel.go fillLabelReferences)."""
    import re as _re

    pieces: list[Column] = []
    pos = 0
    for m in _re.finditer(r"\{\{([^}]*)\}\}", replacement):
        if m.start() > pos:
            pieces.append(F.lit(replacement[pos : m.start()]))
        pieces.append(_get_label(m.group(1).strip()))
        pos = m.end()
    if pos < len(replacement):
        pieces.append(F.lit(replacement[pos:]))
    return F.concat(*pieces) if pieces else F.lit("")


# actions that only rewrite name/labels (vs filter rows) — used to blend
# `if`-gated rewrites per row
_TRANSFORM_ACTIONS = {
    "replace", "replace_all", "hashmod", "labelmap", "labelmap_all",
    "labeldrop", "labelkeep", "uppercase", "lowercase", "graphite",
}


def apply_rule(df: DataFrame, rule: dict) -> DataFrame:
    action = rule.get("action", "replace")
    # keep_metrics / drop_metrics are config sugar for keep/drop over
    # __name__ (lib/promrelabel/config.go:363-380)
    if action in ("keep_metrics", "drop_metrics"):
        rule = {
            **rule,
            "action": "keep" if action == "keep_metrics" else "drop",
            "source_labels": ["__name__"],
        }
        action = rule["action"]

    cond = _if_condition(rule)
    if cond is not None:
        if action in _TRANSFORM_ACTIONS:
            # apply the rewrite, then blend per row on the condition
            tmp = (
                df.withColumn("__rl_name0", F.col("name"))
                .withColumn("__rl_labels0", F.col("labels"))
                .withColumn("__rl_if", cond)
            )
            tmp = apply_rule(tmp, {k: v for k, v in rule.items() if k != "if"})
            return (
                tmp.withColumn(
                    "name",
                    F.when(F.col("__rl_if"), F.col("name")).otherwise(
                        F.col("__rl_name0")
                    ),
                )
                .withColumn(
                    "labels",
                    F.when(F.col("__rl_if"), F.col("labels")).otherwise(
                        F.col("__rl_labels0")
                    ),
                )
                .drop("__rl_name0", "__rl_labels0", "__rl_if")
            )
        # filter actions: `if` mismatch drops the row ONLY for keep
        # (relabel.go:163-171); keep/drop with the default regex are
        # pure selector filters (the fast paths at relabel.go:333-357)
        has_regex = "regex" in rule
        if action == "keep":
            if not has_regex:
                return df.filter(cond)
            return df.filter(
                cond & _src_value(rule).rlike(_anchored(_regex_str(rule)))
            )
        if action == "drop":
            if not has_regex:
                return df.filter(~cond)
            return df.filter(
                ~(cond & _src_value(rule).rlike(_anchored(_regex_str(rule))))
            )
        # other filter actions are no-ops on `if` mismatch: a row
        # survives unless the condition holds AND the action drops it
        base = apply_rule(
            df.withColumn("__rl_if", cond),
            {k: v for k, v in rule.items() if k != "if"},
        )
        kept_if_true = base.filter(F.col("__rl_if")).drop("__rl_if")
        kept_if_false = df.filter(~cond)
        return kept_if_true.unionByName(kept_if_false)

    regex = _regex_str(rule)
    replacement = rule.get("replacement", "$1")
    src = _src_value(rule)

    if action == "replace":
        target = rule["target_label"]
        matches = src.rlike(_anchored(regex))
        if "{{" in replacement:
            new_val = F.regexp_replace(
                src, F.lit(_anchored(regex)), _fill_label_references(replacement)
            )
        else:
            new_val = F.regexp_replace(src, _anchored(regex), replacement)
        cur = _get_label(target)
        value = F.when(matches, new_val).otherwise(cur)
        return _set_label(df, target, value)

    if action == "replace_all":
        target = rule["target_label"]
        return _set_label(df, target, F.regexp_replace(src, regex, replacement))

    if action == "keep":
        return df.filter(src.rlike(_anchored(regex)))

    if action == "drop":
        return df.filter(~src.rlike(_anchored(regex)))

    if action in ("keepequal", "dropequal"):
        # Prometheus-compatible: compare concat(source_labels) with the
        # target_label value (relabel.go:309-330 — keepequal keeps on
        # equality, dropequal drops on equality)
        eq = src == _get_label(rule["target_label"])
        return df.filter(eq if action == "keepequal" else ~eq)

    if action in ("keep_if_contains", "drop_if_contains"):
        # target_label value must contain EVERY source label's value
        # (relabel.go:259-284, containsAllLabelValues)
        tgt = _get_label(rule["target_label"])
        contains = F.lit(True)
        for s in rule.get("source_labels", []):
            contains = contains & tgt.contains(_get_label(s))
        return df.filter(
            contains if action == "keep_if_contains" else ~contains
        )

    if action == "keep_if_equal":
        srcs = [_get_label(s) for s in rule["source_labels"]]
        cond = F.lit(True)
        for s in srcs[1:]:
            cond = cond & (s == srcs[0])
        return df.filter(cond)

    if action == "drop_if_equal":
        srcs = [_get_label(s) for s in rule["source_labels"]]
        cond = F.lit(True)
        for s in srcs[1:]:
            cond = cond & (s == srcs[0])
        return df.filter(~cond)

    if action == "hashmod":
        target = rule["target_label"]
        modulus = int(rule["modulus"])
        value = (F.abs(F.xxhash64(src)) % modulus).cast("string")
        return _set_label(df, target, value)

    if action == "labelmap":
        # copy label values to new names produced by regex rewrite of keys
        def rewrite(k: Column) -> Column:
            return F.regexp_replace(k, _anchored(regex), replacement)

        mapped = F.map_from_entries(
            F.transform(
                F.filter(
                    F.map_entries(F.col("labels")),
                    lambda e: e["key"].rlike(_anchored(regex)),
                ),
                lambda e: F.struct(
                    rewrite(e["key"]).alias("key"), e["value"].alias("value")
                ),
            )
        )
        # merge with mapped-wins on key collisions (map_from_entries throws
        # on duplicate keys under the default dedup policy)
        kept = F.filter(
            F.map_entries(F.col("labels")),
            lambda e: ~F.array_contains(F.map_keys(mapped), e["key"]),
        )
        return df.withColumn(
            "labels",
            F.map_from_entries(F.concat(kept, F.map_entries(mapped))),
        )

    if action == "labelmap_all":
        # replace ALL occurrences of regex in every label NAME
        # (relabel.go:384-390 — unanchored, replace_all semantics)
        return df.withColumn(
            "labels",
            F.map_from_entries(
                F.transform(
                    F.map_entries(F.col("labels")),
                    lambda e: F.struct(
                        F.regexp_replace(e["key"], regex, replacement).alias(
                            "key"
                        ),
                        e["value"].alias("value"),
                    ),
                )
            ),
        )

    if action == "graphite":
        # graphite match template over the metric name; on match, set
        # each label from its replace template (relabel.go:174-193,
        # graphite.go). `*` captures a dot-free run; $0 = whole name.
        rx = _graphite_match_regex(rule["match"])
        # all templates expand against the ORIGINAL name (the reference
        # captures gm.a once) even if one label rule rewrites __name__
        out = df.withColumn("__rl_gname", F.col("name"))
        matches = F.col("__rl_gname").rlike(rx)
        for target, tpl in (rule.get("labels") or {}).items():
            new_val = F.regexp_replace(
                F.col("__rl_gname"), rx, _graphite_template(str(tpl))
            )
            out = _set_label(
                out, target, F.when(matches, new_val).otherwise(_get_label(target))
            )
        return out.drop("__rl_gname")

    if action == "labeldrop":
        return df.withColumn(
            "labels",
            F.map_filter(F.col("labels"), lambda k, v: ~k.rlike(_anchored(regex))),
        )

    if action == "labelkeep":
        return df.withColumn(
            "labels",
            F.map_filter(F.col("labels"), lambda k, v: k.rlike(_anchored(regex))),
        )

    if action in ("uppercase", "lowercase"):
        target = rule["target_label"]
        f = F.upper if action == "uppercase" else F.lower
        return _set_label(df, target, f(src))

    raise ValueError(f"unsupported relabel action {action!r}")


def relabel(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Apply a relabel config (rule list) in order."""
    out = df
    for rule in rules:
        out = apply_rule(out, rule)
    return out

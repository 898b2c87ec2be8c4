"""Relabeling DSL (SURVEY.md §2.10) — ingestion-time row transforms.

Reference actions (lib/promrelabel/config.go:261-391): replace,
replace_all, keep, drop, keep_if_equal, drop_if_equal, keep_metrics,
drop_metrics, hashmod, labelmap, labeldrop, labelkeep, uppercase,
lowercase. A rule list compiles to one chained column expression —
streaming-safe, no Python boundary.

Rule dict shape (mirrors the YAML config):
  {action, source_labels: [..], separator, target_label, regex,
   replacement, modulus}
``__name__`` may be used as a source/target label (maps to the name
column).
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


def apply_rule(df: DataFrame, rule: dict) -> DataFrame:
    action = rule.get("action", "replace")
    regex = rule.get("regex", "(.*)")
    replacement = rule.get("replacement", "$1")
    src = _src_value(rule)

    if action == "replace":
        target = rule["target_label"]
        matches = src.rlike(_anchored(regex))
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

    if action == "keep_metrics":
        return df.filter(F.col("name").rlike(_anchored(regex)))

    if action == "drop_metrics":
        return df.filter(~F.col("name").rlike(_anchored(regex)))

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

"""Token skip-index for word/phrase filters — the Spark analog of the
reference's per-block token bloom filters (vendored logstorage
bloomfilter.go: 6-hash/16-bit-per-token filters per block,
tokenizer.go's [A-Za-z0-9_] token alphabet, indexdb.go stream index).

Instead of per-block blooms inside a custom storage engine, the Spark
layout keeps an inverted-index side table::

    (date, _stream, token)   -- distinct tokens per day per stream

built in one pass over the log table. A word filter then resolves to the
candidate (date, stream) buckets containing the token, and the main scan
is pruned with a broadcast semi-join — reading only the day-partitions /
stream-buckets that can match, which is exactly what the reference's
bloom filters achieve per block. False positives are impossible (the
index is exact), false negatives are impossible for whole-token words;
phrase filters fall back to checking the phrase's constituent tokens
(superset → still safe to prune with).

Scale: the index is |distinct tokens per stream per day|, orders of
magnitude smaller than the log table; the probe is a parquet scan with a
pushed-down ``token IN (...)`` filter and the join side is broadcast.
"""

from __future__ import annotations

import re as _re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TOKEN_RE = r"[^a-zA-Z0-9_]+"


def _tokens(col):
    return F.array_distinct(
        F.filter(F.split(col.cast("string"), TOKEN_RE), lambda w: w != "")
    )


def build_token_index(
    logs: DataFrame,
    path: str,
    fields: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """One pass over the log table → (date, _stream, token) parquet.

    ``fields`` defaults to ``_msg`` only; pass more columns to index
    them too (the reference blooms every stored column's tokens)."""
    fields = fields or ["_msg"]
    stream = (
        F.col("_stream") if "_stream" in logs.columns else F.lit("{}")
    ).alias("_stream")
    date = F.to_date(F.col("_time").cast("timestamp")).alias("date")
    tok_arrays = [F.coalesce(_tokens(F.col(f)), F.array()) for f in fields]
    all_tokens = tok_arrays[0]
    for t in tok_arrays[1:]:
        all_tokens = F.concat(all_tokens, t)
    (
        logs.select(date, stream, F.explode(F.array_distinct(all_tokens)).alias("token"))
        .distinct()
        .write.mode(mode)
        .parquet(path)
    )


def words_of(phrase: str) -> list[str]:
    """Constituent whole tokens of a word/phrase filter value."""
    return [w for w in _re.split(TOKEN_RE, phrase) if w]


def pruned_scan(
    spark: SparkSession,
    logs: DataFrame,
    index_path: str,
    phrase: str,
) -> DataFrame:
    """Prune the log scan to (date, stream) buckets whose index contains
    ALL tokens of ``phrase``. Safe superset: the word/phrase filter must
    still run on the result — this only skips buckets that cannot match
    (the reference applies the same two-step: bloom check per block,
    then the exact filter on surviving blocks)."""
    toks = words_of(phrase)
    if not toks:
        return logs
    idx = spark.read.parquet(index_path).filter(F.col("token").isin(toks))
    # buckets containing every token (AND across tokens)
    cand = (
        idx.groupBy("date", "_stream")
        .agg(F.count_distinct("token").alias("__n"))
        .filter(F.col("__n") == len(toks))
        .select("date", "_stream")
    )
    stream = F.col("_stream") if "_stream" in logs.columns else F.lit("{}")
    keyed = logs.withColumn("__date", F.to_date(F.col("_time").cast("timestamp"))).withColumn(
        "__stream", stream
    )
    pruned = keyed.join(
        F.broadcast(cand),
        (keyed["__date"] == cand["date"]) & (keyed["__stream"] == cand["_stream"]),
        "leftsemi",
    )
    return pruned.drop("__date", "__stream")

"""Text analysis operators: tokenization, shingling, language ID,
quality scoring, fingerprinting.

Everything is pure Catalyst expressions — at 100 TB these run inside
whole-stage codegen with no Python boundary. Tokenization is the shared
primitive: whitespace split with empty-token filtering, identical to the
DuckDB oracle side (string_split_regex + list_filter).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tokens(text: Column) -> Column:
    """Whitespace tokens, empties removed."""
    return F.filter(F.split(text, r"\s+"), lambda x: x != "")


def word_shingles(toks: Column, n: int = 3) -> Column:
    """Array of n-word shingles (space-joined); empty when < n tokens.

    The sequence bound is guarded: Spark's sequence(1, 0) would generate a
    *descending* range.
    """
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    mk = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, i + j) for j in range(n)]
    )
    return F.when(F.size(toks) >= n, F.transform(idx, mk)).otherwise(
        F.array().cast("array<string>")
    )


def token_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document token statistics."""
    t = tokens(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.size(t).cast("double").alias("n_tokens"),
        F.size(F.array_distinct(t)).cast("double").alias("n_distinct"),
        F.round(
            F.try_divide(
                F.aggregate(t, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)),
                F.size(t),
            ),
            6,
        ).alias("avg_token_len"),
    )


def quality_score(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic heuristic quality score in [0,1]:
    0.4·lexical-diversity + 0.3·length-saturation + 0.3·alpha-ratio.

    The shape mirrors the usual LLM-corpus quality filters (length,
    diversity, character-class mix) while staying SQL-expressible.
    """
    t = tokens(F.col(text_col))
    n = F.size(t)
    diversity = F.try_divide(F.size(F.array_distinct(t)), n)
    length_sat = F.least(F.lit(1.0), n / F.lit(200.0))
    alpha = F.try_divide(
        F.length(F.regexp_replace(F.col(text_col), r"[^a-zA-Z]", "")),
        F.length(F.col(text_col)),
    )
    score = 0.4 * diversity + 0.3 * length_sat + 0.3 * alpha
    return df.select(
        F.col(id_col),
        F.round(score, 6).alias("quality"),
    )


def fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Content fingerprints: exact md5 plus order-insensitive word-bag md5
    (classic bag-of-words near-dup key)."""
    t = tokens(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.md5(F.col(text_col).cast("binary")).alias("md5"),
        F.md5(F.array_join(F.array_sort(t), " ").cast("binary")).alias("wordbag_md5"),
    )


# Language-ID: tiny per-language stopword profiles (public common words).
# On real corpora this is the classic n-gram/stopword heuristic; scoring is
# deterministic with ties broken by language code.
_PROFILES: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "den", "mit", "nicht"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "por", "con"],
    "fr": ["le", "la", "de", "et", "un", "est", "que", "pour", "dans", "ce"],
    "zh": ["的", "是", "不", "了", "在", "人", "有", "我", "他", "这"],
}


def language_id(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Stopword-profile language ID: score = #tokens matching each profile;
    argmax with deterministic tie-break by language code."""
    t = tokens(F.lower(F.col(text_col)))

    def _matcher(words):
        # nb: a default-arg closure would change the lambda's arity, which
        # PySpark uses to decide how many lambda variables to bind
        return lambda x: x.isin(*words)

    scores = [
        F.size(F.filter(t, _matcher(words))).alias(f"s_{lang}")
        for lang, words in _PROFILES.items()
    ]
    scored = df.select(F.col(id_col), *scores)
    langs = sorted(_PROFILES)
    best = F.greatest(*[F.col(f"s_{lg}") for lg in langs])
    pred = F.lit(None).cast("string")
    for lg in reversed(langs):  # earlier langs win ties → apply in reverse
        pred = F.when(F.col(f"s_{lg}") == best, F.lit(lg)).otherwise(pred)
    return scored.select(
        F.col(id_col),
        F.when(best > 0, pred).otherwise(F.lit("unknown")).alias("predicted_lang"),
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the
    RAG/training-data chunking primitive. Output: (id, chunk_id,
    chunk_text, n_tokens); chunk starts advance by ``size - overlap``
    and stop once the remaining tokens are covered (a final short chunk
    is emitted only when it adds uncovered tokens). Pure Catalyst
    (sequence + explode + slice + array_join): no shuffle at all — each
    input split chunks its own documents, so at 100 TB this is a
    map-only pass whose output partitioning follows the input."""
    if not 0 <= overlap < size:
        raise ValueError("need 0 <= overlap < size")
    stride = size - overlap
    base = df.select(
        F.col(id_col),
        tokens(F.col(text_col)).alias("__toks"),
    ).withColumn("__n", F.size(F.col("__toks")))
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.col("__n") - overlap - 1, F.lit(0)),
        F.lit(stride),
    )
    ex = base.filter(F.col("__n") > 0).select(
        id_col,
        "__toks",
        "__n",
        F.explode(starts).alias("__start"),
    )
    return ex.select(
        F.col(id_col),
        (F.col("__start") / stride).cast("long").alias("chunk_id"),
        F.array_join(
            F.slice(F.col("__toks"), F.col("__start") + 1, size), " "
        ).alias("chunk_text"),
        F.least(F.lit(size), F.col("__n") - F.col("__start"))
        .cast("long")
        .alias("n_tokens"),
    )


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
) -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al. 2021,
    "Scaling Language Models" §A1.1): per document, the fraction of
    n-gram occurrences taken by the most frequent n-gram
    (``top_ngram_frac``) and the fraction that are repeats of an
    earlier occurrence (``dup_ngram_frac``). Documents with fewer than
    ``n`` tokens produce no row. Two keyed aggregations on ``id`` with
    map-side partials — no joins, no broadcast."""
    sh = word_shingles(tokens(F.col(text_col)), n)
    ex = df.select(F.col(id_col), F.explode(sh).alias("__g"))
    c = ex.groupBy(id_col, "__g").agg(F.count("*").alias("__c"))
    return c.groupBy(id_col).agg(
        F.round(F.max("__c") / F.sum("__c"), 6).alias("top_ngram_frac"),
        F.round(F.lit(1.0) - F.count("*") / F.sum("__c"), 6).alias(
            "dup_ngram_frac"
        ),
    )

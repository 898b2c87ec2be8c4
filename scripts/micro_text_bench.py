#!/usr/bin/env python
"""Focused A/B microbench for the LLM-pipeline text/dedup operators.

Usage: python scripts/micro_text_bench.py <op>[,<op>...] [rep] [runs]
Builds the llmops_bench replica corpus (same construction) once, then
times each named op `runs` times ALTERNATING between ops per round
(min-of-N reported) with the same forced-evaluation aggregate the
LLMOPS harness uses.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from victoriametrics_spark.session import get_spark  # noqa: E402
from victoriametrics_spark.sources.tables import load_table  # noqa: E402


def main() -> None:
    ops = sys.argv[1].split(",")
    rep = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("micro-text-bench")
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, sf_dir, "documents")
    docs = (
        base.crossJoin(
            F.broadcast(spark.range(rep).withColumnRenamed("id", "__r"))
        )
        .select(
            (F.col("doc_id") * rep + F.col("__r")).alias("doc_id"),
            F.concat(
                F.col("text"), F.lit(" r"), F.col("__r").cast("string")
            ).alias("text"),
            "lang",
            "source",
        )
        .repartition(32)
        .localCheckpoint()
    )
    n = docs.count()
    print(f"# corpus: {n} docs (rep={rep})", file=sys.stderr)

    from victoriametrics_spark.operators import dedup, knn, text

    lined = docs.withColumn(
        "text",
        F.concat(
            F.lit("all rights reserved\n"),
            F.regexp_replace(F.col("text"), " (data|value|table) ", "\n"),
        ),
    )
    embs = load_table(spark, sf_dir, "embeddings")

    builders = {
        "duplicate_passage_pairs": lambda: dedup.duplicate_passage_pairs(
            docs, n=8, min_shared=2
        ),
        "unigram": lambda: text.unigram_logprob_score(docs, vocab_size=1000),
        "boilerplate": lambda: text.remove_boilerplate_lines(
            lined, min_docs=3
        ),
        "bigram": lambda: text.bigram_logprob_score(docs, vocab_size=1000),
        "semantic_dedup": lambda: knn.semantic_dedup(embs, 0.3, k_cells=8),
        # breakdown helpers
        "tokenize_explode_count": lambda: docs.select(
            F.explode(text.tokens(F.col("text"))).alias("__t")
        ).groupBy("__t").agg(F.count("*").alias("c")),
        "unigram_pass1_vocab": lambda: (
            docs.select(
                F.col("doc_id"),
                F.explode(text.tokens(F.col("text"))).alias("__t"),
            )
            .groupBy("__t")
            .agg(F.count("*").alias("__c"))
            .orderBy(F.col("__c").desc(), F.col("__t").asc())
            .limit(1000)
        ),
        "boiler_detect": lambda: (
            lined.select(
                F.col("doc_id"),
                F.posexplode(F.split(F.col("text"), "\n")).alias(
                    "pos", "line"
                ),
            )
            .withColumn("__h", F.md5(F.col("line").cast("binary")))
            .groupBy("__h")
            .agg(F.count_distinct("doc_id").alias("__docs"))
            .filter(F.col("__docs") >= 3)
        ),
    }
    results: dict[str, list[float]] = {o: [] for o in ops}
    for r in range(runs):
        for o in ops:
            spark.sparkContext.setJobDescription(f"{o}#r{r}")
            t0 = time.time()
            df = builders[o]()
            row = df.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.xxhash64(*df.columns) % F.lit(1_000_003)).alias("h"),
            ).first()
            dt = time.time() - t0
            results[o].append(dt)
            print(
                f"# {o} run{r}: {dt:.2f}s rows={row['n']} h={row['h']}",
                file=sys.stderr,
            )
    for o in ops:
        v = results[o]
        print(f"{o}: min={min(v):.2f}s all={[round(x,2) for x in v]}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Scaling bench for the LLM-pipeline operators.

Replicates the sf0.1 documents table REP× (text varied per replica so
dedup/decontamination stay non-trivial) and times each operator over
the blown-up corpus on local[N]. The point is shape, not absolute
speed: map-only ops (chunking, PII, sampling, token stats) must scale
linearly with input and move zero data; the banded-LSH pair join must
stay far from all-pairs; decontamination must broadcast the eval side.

Usage: python scripts/llmops_bench.py [rep] [sf_dir]
Prints one JSON line: {"rep": R, "docs": N, "ops": {name: sec}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from victoriametrics_spark.session import get_spark  # noqa: E402
from victoriametrics_spark.sources.tables import load_table  # noqa: E402


def main() -> None:
    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark("llmops-bench")
    spark.sparkContext.setLogLevel("ERROR")

    base = load_table(spark, sf_dir, "documents")
    n_base = base.count()
    # replicate with a per-replica suffix token so content hashes differ
    # but shingle overlap stays high (near-dup detection non-trivial)
    docs = (
        base.crossJoin(F.broadcast(spark.range(rep).withColumnRenamed("id", "__r")))
        .select(
            (F.col("doc_id") * rep + F.col("__r")).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" r"), F.col("__r").cast("string")).alias(
                "text"
            ),
            "lang",
            "source",
        )
        .repartition(32)
        .localCheckpoint()  # materialize once; time operators, not the blow-up
    )
    n = docs.count()

    from victoriametrics_spark.operators.dedup import (
        exact_dedup,
        minhash_near_dup_pairs,
    )
    from victoriametrics_spark.operators.text import (
        bpe_token_stats,
        c4_clean,
        chunk_documents,
        decontaminate,
        gopher_quality_filter,
        pack_chunks,
        quality_score,
        redact_pii,
        repetition_stats,
        stratified_sample,
        tokens,
    )

    def run(name, df):
        # groupBy().count() would let Catalyst PRUNE every projected
        # expression (the op would never execute); hashing every output
        # column into the aggregate forces full evaluation while keeping
        # the result tiny. Operators with EAGER driver-side stages
        # (centroid fit, vocabulary fit, component convergence) are
        # passed as thunks so construction time is inside the clock.
        t0 = time.time()
        if callable(df):
            df = df()
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            # mod keeps the running sum inside long range (ANSI mode)
            F.sum(F.xxhash64(*df.columns) % F.lit(1_000_003)).alias("h"),
        ).first()
        dt = round(time.time() - t0, 3)
        print(f"# {name}: {dt}s ({row['n']} rows)", file=sys.stderr)
        return dt

    ops = {}
    ops["chunk_documents"] = run("chunk_documents", chunk_documents(docs))
    ops["redact_pii"] = run("redact_pii", redact_pii(docs))
    ops["bpe_token_stats"] = run("bpe_token_stats", bpe_token_stats(docs))
    ops["quality_score"] = run("quality_score", quality_score(docs))
    ops["c4_clean"] = run("c4_clean", c4_clean(docs))
    ops["gopher_quality_filter"] = run(
        "gopher_quality_filter", gopher_quality_filter(docs)
    )
    ops["stratified_sample"] = run(
        "stratified_sample",
        stratified_sample(docs, {"en": 0.5, "zh": 0.25, "de": 0.1}),
    )
    ops["repetition_stats"] = run("repetition_stats", repetition_stats(docs))
    ops["exact_dedup"] = run("exact_dedup", exact_dedup(docs, ["text"], "doc_id"))
    ops["pack_chunks"] = run(
        "pack_chunks",
        pack_chunks(
            docs.select(
                "doc_id", "lang", F.size(tokens(F.col("text"))).alias("n_tokens")
            ),
            capacity=2048,
            strata_col="lang",
        ),
    )
    # The pair-producing ops run on a capped replica set: this corpus
    # is adversarial BY CONSTRUCTION (every replica near-dups its base
    # doc), so true-pair count grows quadratically in rep — C(rep,2) ×
    # base_docs pairs. Real corpora have vanishing near-dup fractions;
    # the cap keeps the demonstration output-bound, not output-exploded.
    pair_rep = min(rep, 20)
    pair_docs = docs.filter(F.col("doc_id") % rep < pair_rep)
    n_pair = pair_docs.count()
    ops["decontaminate"] = run(
        "decontaminate",
        decontaminate(
            pair_docs.filter(F.col("doc_id") % 29 != 0),
            pair_docs.filter(F.col("doc_id") % 29 == 0).limit(2000),
            n=4,
        ),
    )
    ops["minhash_lsh_pairs"] = run(
        "minhash_lsh_pairs", minhash_near_dup_pairs(pair_docs, threshold=0.8)
    )
    from victoriametrics_spark.operators.dedup import duplicate_passage_pairs
    from victoriametrics_spark.operators.text import (
        remove_boilerplate_lines,
        unigram_logprob_score,
    )

    ops["unigram_logprob_score"] = run(
        "unigram_logprob_score",
        lambda: unigram_logprob_score(docs, vocab_size=1000),
    )
    # give the corpus shared lines so the boilerplate scrub has work:
    # replicas of one base doc share injected footer lines
    lined = docs.withColumn(
        "text",
        F.concat(
            F.lit("all rights reserved\n"),
            F.regexp_replace(F.col("text"), " (data|value|table) ", "\n"),
        ),
    )
    ops["remove_boilerplate_lines"] = run(
        "remove_boilerplate_lines", remove_boilerplate_lines(lined, min_docs=3)
    )
    # pair-producing like LSH: capped replica set (the shared replica
    # passages make every base doc's replicas pair)
    ops["duplicate_passage_pairs"] = run(
        "duplicate_passage_pairs",
        duplicate_passage_pairs(pair_docs, n=8, min_shared=2),
    )
    from victoriametrics_spark.operators.knn import semantic_dedup

    embs = load_table(spark, sf_dir, "embeddings")
    ops["semantic_dedup_embeddings"] = run(
        "semantic_dedup_embeddings", lambda: semantic_dedup(embs, 0.3, k_cells=8)
    )
    # round-10b batch
    from victoriametrics_spark.operators.events import (
        funnel_counts,
        sessionize,
    )
    from victoriametrics_spark.operators.knn import cluster_stats
    from victoriametrics_spark.operators.text import (
        bigram_logprob_score,
        char_entropy,
        temperature_sample,
    )

    ops["char_entropy"] = run("char_entropy", char_entropy(docs))
    ops["temperature_sample"] = run(
        "temperature_sample", lambda: temperature_sample(docs, alpha=0.3)
    )
    ops["bigram_logprob_score"] = run(
        "bigram_logprob_score",
        lambda: bigram_logprob_score(docs, vocab_size=1000),
    )
    ops["cluster_stats"] = run(
        "cluster_stats", lambda: cluster_stats(embs)
    )
    # events blow-up: replicate users so the session shuffle is real
    ev_base = load_table(spark, sf_dir, "events")
    ev = (
        ev_base.crossJoin(
            F.broadcast(spark.range(max(rep // 10, 1)).withColumnRenamed("id", "__r"))
        )
        .select(
            (F.col("event_id") * rep + F.col("__r")).alias("event_id"),
            (F.col("user_id") * rep + F.col("__r")).alias("user_id"),
            "ts",
            "event_type",
        )
        .repartition(32)
        .localCheckpoint()
    )
    n_ev = ev.count()
    ops["sessionize"] = run("sessionize", sessionize(ev, gap_ms=21600000))
    ops["funnel_counts"] = run(
        "funnel_counts",
        funnel_counts(ev, ["view", "click", "purchase"], 86400000),
    )
    print(
        json.dumps(
            {
                "rep": rep,
                "docs": n,
                "base_docs": n_base,
                "pair_op_docs": n_pair,
                "events": n_ev,
                "ops": ops,
            }
        )
    )


if __name__ == "__main__":
    main()

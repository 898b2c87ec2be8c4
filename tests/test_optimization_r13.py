"""Round-13 optimization regression tests.

Each test pins an internals change from the optimization round to the
behavior it must preserve:

- word_shingles binds its token array before per-position access (the
  O(tokens²) lambda-capture fix) — shingle output must be unchanged for
  normal, short, empty and null inputs;
- the MinHash pipeline computes signatures/band keys from the one-pass
  signature table — signature rows must equal the definitional
  min(md5(shingle ∥ '#' ∥ seed));
- connected_components solves small graphs on the driver — the driver
  union-find and the distributed min-label loop must agree;
- pairwise_cosine_within unrolls the per-pair dot with a ragged-row
  fold fallback — both paths must agree, including for ragged vectors;
- load_table spreads single-split payload-table scans only where scoped.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from victoriametrics_spark.session import get_spark

    return get_spark("test-opt-r13")


def test_word_shingles_edge_cases(spark):
    from victoriametrics_spark.operators.text import tokens, word_shingles

    df = spark.createDataFrame(
        [
            (1, "a b c d"),
            (2, "a b"),          # < n tokens -> empty
            (3, ""),             # empty text -> empty
            (4, None),           # null text -> empty/None, no crash
            (5, "  x   y  z "),  # whitespace runs
        ],
        "id long, text string",
    )
    out = {
        r["id"]: r["sh"]
        for r in df.select(
            "id", word_shingles(tokens(F.col("text")), 3).alias("sh")
        ).collect()
    }
    assert out[1] == ["a b c", "b c d"]
    assert out[2] == []
    assert out[3] == []
    assert out[4] in ([], None)
    assert out[5] == ["x y z"]


def test_minhash_signatures_definition(spark):
    """Signature rows must equal min(md5(shingle ∥ '#' ∥ seed)) over the
    document's DISTINCT shingles — the definition the DuckDB oracle
    recomputes — regardless of the internal pipeline shape."""
    from victoriametrics_spark.operators.dedup import minhash_signatures

    text = "w1 w2 w3 w4 w2 w3 w4"
    df = spark.createDataFrame([(7, text)], "doc_id long, text string")
    toks = text.split()
    shingles = {
        " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
    }
    rows = minhash_signatures(df, "doc_id", "text", n=3, k=4).collect()
    assert len(rows) == 4
    for r in rows:
        expected = min(
            hashlib.md5(f"{s}#{r['seed']}".encode()).hexdigest()
            for s in shingles
        )
        assert r["mh"] == expected, (r["seed"], r["mh"], expected)


def test_connected_components_driver_vs_distributed(spark):
    from victoriametrics_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (3, 4)],
        "id_a long, id_b long",
    )
    via_driver = {
        (r["id"], r["component"])
        for r in connected_components(pairs).collect()
    }
    via_loop = {
        (r["id"], r["component"])
        for r in connected_components(pairs, max_driver_edges=0).collect()
    }
    expected = {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20),
    }
    assert via_driver == expected
    assert via_loop == expected


def test_pairwise_cosine_unrolled_matches_fold(spark):
    """The unrolled per-pair dot must match the interpreted fold — on
    uniform dims (unrolled path) and when a ragged vector forces the
    guarded fold fallback (where the fold's zip_with null-padding
    yields a null cosine and the pair drops)."""
    from victoriametrics_spark.operators.knn import pairwise_cosine_within

    rows = [
        (1, 0, [1.0, 0.0, 0.0, 0.0]),
        (2, 0, [1.0, 0.0, 0.0, 0.0]),
        (3, 0, [0.0, 1.0, 0.0, 0.0]),
        (4, 1, [0.5, 0.5, 0.5, 0.5]),
        (5, 1, [0.5, 0.5, 0.5, 0.5]),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in pairwise_cosine_within(
            df, "label", tau=0.9, vec_col="embedding", id_col="vec_id"
        ).collect()
    }
    assert got == {(1, 2): 1.0, (4, 5): 1.0}

    ragged = rows + [(6, 0, [1.0, 0.0])]  # dim 2 in a dim-4 corpus
    df2 = spark.createDataFrame(
        ragged, "vec_id long, label int, embedding array<double>"
    )
    got2 = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in pairwise_cosine_within(
            df2, "label", tau=-2.0, vec_col="embedding", id_col="vec_id"
        ).collect()
    }
    # pairs touching the ragged vector produce a null cosine (dropped by
    # the tau filter), exactly as the pure-fold formulation did
    assert not any(6 in k for k in got2)
    assert got2[(1, 2)] == 1.0


def test_scan_spreading_scope(spark):
    from victoriametrics_spark.sources.tables import load_table

    sf_dir = "/root/testdata/sf0.1"
    docs = load_table(spark, sf_dir, "documents")
    ev = load_table(spark, sf_dir, "events")
    docs_off = load_table(spark, sf_dir, "documents", spread=False)
    # payload table spreads beyond the single input split...
    assert docs.rdd.getNumPartitions() > 1
    # ...sample tables keep the plan-audited single-split scan...
    assert ev.rdd.getNumPartitions() == 1
    # ...and the bit-exactness opt-out is honored
    assert docs_off.rdd.getNumPartitions() == 1
    # spreading must not change the row multiset
    a = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    b = sorted(r["doc_id"] for r in docs_off.select("doc_id").collect())
    assert a == b

"""Prometheus TSDB block importer (sources/promtsdb.py) — the vmctl
file-mode migration path (app/vmctl/prometheus/prometheus.go reads the
same blocks via remote-read; we read the public on-disk format
directly).

Round-trips a synthetically written block (writer follows
prometheus/tsdb/docs/format/{index,chunks}.md) through the reader, at
three levels: raw XOR chunk codec, index walk, and the distributed
mapInPandas Spark path with time-range chunk pruning.
"""

from __future__ import annotations

import math

import pytest

from victoriametrics_spark.sources.promtsdb import (
    block_samples_df,
    crc32c,
    decode_xor_chunk,
    encode_xor_chunk,
    iter_block_samples,
    read_block_index,
    read_meta,
    write_tsdb_block,
)


def test_crc32c_vectors():
    # public test vectors (RFC 3720 appendix / Castagnoli polynomial)
    assert crc32c(b"") == 0
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"\x00" * 32) == 0x8A9136AA


@pytest.mark.parametrize(
    "samples",
    [
        [(1000, 1.0)],
        [(1000, 1.0), (2000, 1.0)],
        [(1000, 1.5), (2000, 2.5), (3000, -3.25)],
        # irregular timestamps exercising every dod bucket
        [(0, 0.0), (10, 0.0), (20, 0.0), (8212, 1.0), (90000, 2.0),
         (700000, 3.0), (10_000_000_000, 4.0)],
        # value patterns: repeats, XOR-window reuse, window widening
        [(i * 15_000, v) for i, v in enumerate(
            [5.0, 5.0, 5.125, 5.25, 5.25, 1e300, -1e-300, 0.0, 5.0])],
        # subnormals + sign flips + full-64-sigbit deltas
        [(i * 1000, v) for i, v in enumerate(
            [0.0, 5e-324, -5e-324, 1.7976931348623157e308, 1.0])],
    ],
)
def test_xor_chunk_roundtrip(samples):
    data = encode_xor_chunk(samples)
    assert decode_xor_chunk(data) == samples


def test_xor_chunk_nan_roundtrip():
    samples = [(1000, float("nan")), (2000, 1.0), (3000, float("inf"))]
    out = decode_xor_chunk(encode_xor_chunk(samples))
    assert out[0][0] == 1000 and math.isnan(out[0][1])
    assert out[1:] == samples[1:]


def _mk_series(n_series=5, n_samples=300):
    series = []
    for s in range(n_series):
        labels = {
            "__name__": f"metric_{s % 2}",
            "job": "node",
            "instance": f"host-{s}:9100",
        }
        pts = [
            (1_700_000_000_000 + i * 15_000, math.sin(s + i * 0.1) * 100)
            for i in range(n_samples)
        ]
        series.append((labels, pts))
    return series


def test_block_roundtrip_driver(tmp_path):
    series = _mk_series()
    bd = write_tsdb_block(series, str(tmp_path))
    meta = read_meta(bd)
    assert meta["stats"]["numSeries"] == 5
    assert meta["stats"]["numSamples"] == 5 * 300
    # 300 samples / 120 per chunk = 3 chunks per series
    assert meta["stats"]["numChunks"] == 15
    assert meta["minTime"] == 1_700_000_000_000

    idx = read_block_index(bd)
    assert len(idx) == 5
    # series sorted by label set; every chunk ref carries mint/maxt
    for labels, chunks in idx:
        assert len(chunks) == 3
        assert chunks[0][2] == 1_700_000_000_000

    got = {}
    for labels, t, v in iter_block_samples(bd):
        got.setdefault(tuple(sorted(labels.items())), []).append((t, v))
    want = {
        tuple(sorted(lbls.items())): pts for lbls, pts in _mk_series()
    }
    assert got == want


def test_block_spark_path(spark, tmp_path):
    series = _mk_series(n_series=3, n_samples=50)
    bd = write_tsdb_block(series, str(tmp_path))
    df = block_samples_df(spark, bd)
    rows = df.collect()
    assert len(rows) == 150
    by_series = {}
    for r in rows:
        key = (r["name"], tuple(sorted(r["labels"].items())))
        by_series.setdefault(key, []).append((r["ts"], r["value"]))
    assert len(by_series) == 3
    for (name, lbl_items), pts in by_series.items():
        assert name in ("metric_0", "metric_1")
        assert dict(lbl_items)["job"] == "node"
        assert sorted(pts) == sorted(
            next(
                p
                for lbls, p in series
                if lbls["__name__"] == name
                and lbls["instance"] == dict(lbl_items)["instance"]
            )
        )


def test_block_spark_time_pruning(spark, tmp_path):
    series = _mk_series(n_series=2, n_samples=300)  # 3 chunks/series
    bd = write_tsdb_block(series, str(tmp_path))
    t0 = 1_700_000_000_000
    # range covering only the second chunk (samples 120..239)
    lo, hi = t0 + 120 * 15_000, t0 + 239 * 15_000
    df = block_samples_df(spark, bd, min_ts=lo, max_ts=hi)
    rows = df.collect()
    assert len(rows) == 2 * 120
    assert all(lo <= r["ts"] <= hi for r in rows)


def test_index_checksums_detect_corruption(tmp_path):
    series = _mk_series(n_series=1, n_samples=10)
    bd = write_tsdb_block(series, str(tmp_path))
    path = f"{bd}/index"
    raw = bytearray(open(path, "rb").read())
    raw[-2] ^= 0xFF  # corrupt TOC crc
    open(path, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="TOC checksum"):
        read_block_index(bd)


def test_snapshot_dir_multi_block(spark, tmp_path):
    from victoriametrics_spark.sources.promtsdb import (
        list_blocks,
        snapshot_samples_df,
    )

    t0 = 1_700_000_000_000
    day = 86_400_000
    # three blocks covering consecutive days, distinct ULIDs
    for d in range(3):
        series = [
            (
                {"__name__": "m", "job": "a", "day": str(d)},
                [(t0 + d * day + i * 60_000, float(d * 100 + i)) for i in range(30)],
            ),
            (
                {"__name__": "m", "job": "b", "day": str(d)},
                [(t0 + d * day + i * 60_000, float(i)) for i in range(30)],
            ),
        ]
        write_tsdb_block(
            series, str(tmp_path), ulid=f"01BLOCK{d:019d}"
        )

    # block-level meta.json pruning (vmctl Explore filter.inRange)
    assert len(list_blocks(str(tmp_path))) == 3
    assert len(list_blocks(str(tmp_path), min_ts=t0 + 2 * day)) == 1
    assert len(list_blocks(str(tmp_path), max_ts=t0 + day - 1)) == 1

    df = snapshot_samples_df(spark, str(tmp_path))
    assert df.count() == 3 * 2 * 30

    # time filter spanning blocks 1-2 only
    df2 = snapshot_samples_df(
        spark, str(tmp_path), min_ts=t0 + day, max_ts=t0 + 3 * day - 1
    )
    rows = df2.collect()
    assert len(rows) == 2 * 2 * 30
    assert all(r["ts"] >= t0 + day for r in rows)

    # label filter (vmctl --prom-filter-label): series dropped pre-read
    df3 = snapshot_samples_df(
        spark, str(tmp_path), label="job", label_value="a"
    )
    rows3 = df3.collect()
    assert len(rows3) == 3 * 30
    assert all(r["labels"]["job"] == "a" for r in rows3)

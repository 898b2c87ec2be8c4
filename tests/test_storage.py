"""Storage layout (victoriametrics_spark/storage/layout.py): the
date-partitioned / series-bucketed / ts-sorted table that replaces VM's
monthly partitions + per-day index (lib/storage/partition.go:98,
lib/storage/index_db.go:2713) at Spark scale.

The load-bearing assertion: a rate() query over the bucketed scan has
ZERO Exchange nodes — the scan's bucket partitioning feeds the
per-series lag window and the (series, grid-index) aggregation directly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from victoriametrics_spark import EvalConfig, evaluate
from victoriametrics_spark.schema import samples_from_columns
from victoriametrics_spark.storage import (
    append_samples,
    compact_samples_table,
    read_samples_table,
    write_samples_table,
)

H = 3600_000
DAY = 24 * H
T0 = 1704067200000  # 2024-01-01T00:00:00Z


def _mk_samples(spark, rows):
    df = spark.createDataFrame(rows, "series string, ts long, value double")
    return samples_from_columns(
        df,
        name="m",
        label_cols={"s": "series"},
        ts="ts",
        value="value",
    )


@pytest.fixture(scope="module")
def stored(spark):
    rows = [
        (s, T0 + d * DAY + h * H, float(d * 24 + h + i))
        for i, s in enumerate(["a", "b", "c"])
        for d in range(3)
        for h in range(24)
    ]
    write_samples_table(_mk_samples(spark, rows), "t_store", n_buckets=4)
    return rows


def _physical_plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_round_trip_values(spark, stored):
    back = read_samples_table(spark, "t_store")
    assert back.count() == len(stored)
    got = {
        (r["labels"]["s"], r["ts"], r["value"])
        for r in back.select("labels", "ts", "value").collect()
    }
    assert got == set(stored)


def test_partition_pruning(spark, stored):
    # only day 2 in range → scan reads one date dir (pruning is
    # date-granular by design; see read_samples_table docstring)
    day2 = read_samples_table(
        spark, "t_store", start_ms=T0 + 2 * DAY, end_ms=T0 + 3 * DAY - 1
    )
    assert day2.count() == 3 * 24
    plan = _physical_plan(day2)
    assert "PartitionFilters" in plan


def test_rate_plan_has_no_exchange(spark, stored):
    cfg = EvalConfig(start=T0 + DAY, end=T0 + 3 * DAY, step=6 * H)
    bucketed = read_samples_table(
        spark, "t_store", cfg.start, cfg.end, lookback_ms=DAY
    )
    df = evaluate(spark, "rate(m[1d])", bucketed, cfg)
    plan = _physical_plan(df)
    assert "Exchange" not in plan, plan
    assert df.count() > 0


def test_bucketed_matches_flat_scan(spark, stored):
    cfg = EvalConfig(start=T0 + DAY, end=T0 + 3 * DAY, step=6 * H)
    bucketed = read_samples_table(
        spark, "t_store", cfg.start, cfg.end, lookback_ms=DAY
    )
    flat = _mk_samples(
        spark, stored
    )  # unpartitioned in-memory frame, same data

    def key(df):
        return sorted(
            (r["labels"]["s"], r["ts"], round(r["value"], 9))
            for r in df.collect()
        )

    assert key(evaluate(spark, "increase(m[1d])", bucketed, cfg)) == key(
        evaluate(spark, "increase(m[1d])", flat, cfg)
    )


def test_append_and_compact_with_dedup(spark):
    base = [("x", T0 + h * H, float(h)) for h in range(24)]
    write_samples_table(_mk_samples(spark, base), "t_lsm", n_buckets=2)
    # late append overlapping the same hour bucket (higher value wins ties
    # at same ts; here later ts in the same dedup interval wins)
    late = [("x", T0 + h * H + 1, float(100 + h)) for h in range(0, 24, 2)]
    append_samples(_mk_samples(spark, late), "t_lsm", n_buckets=2)
    assert read_samples_table(spark, "t_lsm").count() == 36

    compact_samples_table(spark, "t_lsm", n_buckets=2, dedup_interval_ms=H)
    back = read_samples_table(spark, "t_lsm")
    assert back.count() == 24
    got = {r["ts"]: r["value"] for r in back.select("ts", "value").collect()}
    # even hours: the late (+1 ms) sample won, keeping its own ts;
    # odd hours: original kept
    assert got[T0 + 1] == 100.0 and got[T0 + H] == 1.0


def test_series_key_column_reused(spark, stored):
    # the physical __series_key must flow into the window/groupBy —
    # recomputing it would break bucket alignment
    bucketed = read_samples_table(spark, "t_store")
    assert "__series_key" in bucketed.columns
    cfg = EvalConfig(start=T0 + DAY, end=T0 + 2 * DAY, step=6 * H)
    df = evaluate(spark, "avg_over_time(m[1d])", bucketed, cfg)
    assert "Exchange" not in _physical_plan(df)


# ----------------------------------------------------------------- logs
@pytest.fixture(scope="module")
def log_table(spark):
    from datetime import datetime

    from victoriametrics_spark.storage.layout import (
        drop_samples_table,
        write_logs_table,
    )

    drop_samples_table(spark, "t_logs")
    rows = []
    for d in range(1, 4):
        for h in range(0, 24, 2):
            for app in ("web", "db"):
                rows.append(
                    (
                        datetime(2024, 1, d, h),
                        f"req app={app} d={d} h={h}",
                        app,
                        float(d * 100 + h),
                    )
                )
    df = spark.createDataFrame(rows, ["_time", "_msg", "app", "value"])
    write_logs_table(df, "t_logs", stream_fields=["app"], n_buckets=4)
    return rows


def test_logs_round_trip_and_pruning(spark, log_table):
    from victoriametrics_spark.storage.layout import read_logs_table

    back = read_logs_table(spark, "t_logs")
    assert back.count() == len(log_table)
    assert "_stream" in back.columns
    day2 = read_logs_table(
        spark,
        "t_logs",
        start_ms=1704153600000,  # 2024-01-02
        end_ms=1704239999999,
    )
    assert day2.count() == 24
    assert "PartitionFilters" in _physical_plan(day2)


def test_logsql_over_bucketed_logs(spark, log_table):
    from victoriametrics_spark.logsql.parser import run_logsql
    from victoriametrics_spark.storage.layout import read_logs_table

    logs = read_logs_table(spark, "t_logs")
    out = run_logsql(
        logs,
        '_stream:{app="web"} | stats by (app) count() as n',
    ).collect()
    assert out[0]["n"] == 36
    # stream_context over the bucketed table: per-stream window needs no
    # full-frame shuffle of a foreign partitioning — the plan's only
    # exchanges are hash on _stream (already the bucket key) or the
    # broadcast/semi-join of matches
    ctx = run_logsql(
        logs,
        '_stream:{app="web"} value:=302.0 | stream_context before 1 after 1',
    )
    ids = sorted(r["value"] for r in ctx.collect())
    assert ids == [300.0, 302.0, 304.0]


def test_downsample_semantics(spark):
    from victoriametrics_spark.schema import SAMPLE_SCHEMA
    from victoriametrics_spark.storage.downsample import downsample

    H = 3_600_000
    now = 100 * H
    rows = [
        # fresh (age < 10h): kept raw
        ("m", {"s": "a"}, now - H, 1.0, False),
        ("m", {"s": "a"}, now - 2 * H, 2.0, False),
        # aged ≥10h → one per 4h bucket, last ts wins
        ("m", {"s": "a"}, now - 11 * H, 3.0, False),   # bucket 22
        ("m", {"s": "a"}, now - 12 * H, 4.0, False),   # bucket 22
        ("m", {"s": "a"}, now - 13 * H, 5.0, False),   # bucket 21
        # tie on ts → max value wins
        ("m", {"s": "b"}, now - 11 * H, 7.0, False),
        ("m", {"s": "b"}, now - 11 * H, 9.0, False),
    ]
    df = spark.createDataFrame(rows, SAMPLE_SCHEMA)
    out = downsample(df, rules=[(10 * H, 4 * H)], now_ms=now)
    got = {
        (r["labels"]["s"], r["ts"], r["value"]) for r in out.collect()
    }
    assert got == {
        ("a", now - H, 1.0),
        ("a", now - 2 * H, 2.0),
        ("a", now - 11 * H, 3.0),
        ("a", now - 13 * H, 5.0),
        ("b", now - 11 * H, 9.0),
    }


def test_multi_tenant_isolation(spark):
    """Tenant partition column (lib/storage/search.go:327 AccountID/
    ProjectID analog): writes tagged per tenant land in separate
    partition directories, scans must be tenant-scoped, and identical
    series names never leak across tenants."""
    from victoriametrics_spark.api.http import parse_tenant, with_tenant
    from victoriametrics_spark.storage.layout import drop_samples_table

    assert parse_tenant("7") == "7:0"
    assert parse_tenant("7:3") == "7:3"
    with pytest.raises(ValueError):
        parse_tenant("x:y")

    rows_a = [("a", T0 + i * H, float(i)) for i in range(24)]
    rows_b = [("a", T0 + i * H, float(100 + i)) for i in range(24)]
    df = with_tenant(_mk_samples(spark, rows_a), "1:0").unionByName(
        with_tenant(_mk_samples(spark, rows_b), "2:0")
    )
    write_samples_table(df, "t_tenants", n_buckets=4)
    try:
        # unscoped scan of a tenanted table is an error, like VM where
        # every search carries an (AccountID, ProjectID)
        with pytest.raises(ValueError, match="multi-tenant"):
            read_samples_table(spark, "t_tenants")

        cfg = EvalConfig(start=T0, end=T0 + 23 * H, step=H)
        t1 = read_samples_table(spark, "t_tenants", tenant="1:0")
        t2 = read_samples_table(spark, "t_tenants", tenant="2:0")
        v1 = {r["ts"]: r["value"] for r in evaluate(
            spark, "last_over_time(m[1h])", t1, cfg).collect()}
        v2 = {r["ts"]: r["value"] for r in evaluate(
            spark, "last_over_time(m[1h])", t2, cfg).collect()}
        assert v1[T0] == 0.0 and v2[T0] == 100.0
        assert all(v2[k] == v1[k] + 100.0 for k in v1)

        # short-form token canonicalization: tenant="1" ≡ "1:0" — it must
        # match the canonical partition value, not silently return an
        # empty scan; malformed tokens error instead of matching nothing
        t1_short = read_samples_table(spark, "t_tenants", tenant="1")
        assert t1_short.count() == t1.count() > 0
        with pytest.raises(ValueError, match="invalid tenant"):
            read_samples_table(spark, "t_tenants", tenant="x:y")

        # tenant scoping is partition-directory pruning, visible in the
        # scan's PartitionFilters
        plan = t1._jdf.queryExecution().executedPlan().toString()
        assert "tenant" in plan and "PartitionFilters" in plan
    finally:
        drop_samples_table(spark, "t_tenants")


def test_multi_tenant_logs_isolation(spark):
    """Logs-side tenancy (VictoriaLogs AccountID/ProjectID headers):
    tenant partitions the log table, scoped reads prune to the tenant's
    directories, unscoped reads of tenanted tables are rejected."""
    from datetime import datetime

    from victoriametrics_spark.api.http import with_tenant
    from victoriametrics_spark.logsql.parser import run_logsql
    from victoriametrics_spark.storage.layout import (
        drop_samples_table,
        read_logs_table,
        write_logs_table,
    )

    def mk(tag):
        rows = [
            (datetime(2024, 1, 1, h), f"{tag} msg {h}", "web")
            for h in range(6)
        ]
        return spark.createDataFrame(rows, ["_time", "_msg", "app"])

    df = with_tenant(mk("alpha"), "1").unionByName(with_tenant(mk("beta"), "2:0"))
    write_logs_table(df, "t_logs_tenants", stream_fields=["app"], n_buckets=2)
    try:
        with pytest.raises(ValueError, match="multi-tenant"):
            read_logs_table(spark, "t_logs_tenants")
        t1 = read_logs_table(spark, "t_logs_tenants", tenant="1:0")
        t2 = read_logs_table(spark, "t_logs_tenants", tenant="2:0")
        assert "tenant" not in t1.columns
        n1 = run_logsql(t1, "alpha | stats count() as n").collect()[0]["n"]
        n2 = run_logsql(t2, "alpha | stats count() as n").collect()[0]["n"]
        assert (n1, n2) == (6, 0)
        plan = t1._jdf.queryExecution().executedPlan().toString()
        assert "tenant" in plan
    finally:
        drop_samples_table(spark, "t_logs_tenants")


def test_delete_series_tombstones(spark):
    """/api/v1/admin/tsdb/delete_series engine work (deleted-metricIDs
    analog, lib/storage/index_db.go): delete → matching series vanish
    from reads; other series intact; re-ingest after the delete IS
    served (VM: re-registration gets a fresh metricID); compaction
    physically drops the dead rows and clears the tombstones."""
    import time

    from victoriametrics_spark.storage import delete_series, drop_samples_table

    rows = [
        (s, T0 + h * H, float(ord(s) * 100 + h))
        for s in ("a", "b")
        for h in range(12)
    ]
    write_samples_table(_mk_samples(spark, rows), "t_del", n_buckets=4)
    try:
        cfg = EvalConfig(start=T0, end=T0 + 11 * H, step=H)

        def series_set():
            t = read_samples_table(spark, "t_del")
            out = evaluate(spark, "last_over_time(m[1h])", t, cfg)
            return {r["labels"]["s"] for r in out.collect()}

        assert series_set() == {"a", "b"}
        n = delete_series(spark, "t_del", ['m{s="a"}'])
        assert n == 1
        assert series_set() == {"b"}
        # deleting again matches nothing (already tombstoned)
        assert delete_series(spark, "t_del", ['m{s="a"}']) == 0

        # re-ingest AFTER the delete: the new samples are served
        time.sleep(0.05)  # file mtime strictly after the tombstone
        append_samples(
            _mk_samples(spark, [("a", T0 + h * H, 7.0) for h in range(3)]),
            "t_del",
            n_buckets=4,
        )
        spark.catalog.refreshTable("t_del")
        assert series_set() == {"a", "b"}
        t = read_samples_table(spark, "t_del")
        vals = {
            r["ts"]: r["value"]
            for r in t.filter(F.col("labels")["s"] == "a").collect()
        }
        assert vals == {T0 + h * H: 7.0 for h in range(3)}  # old rows gone

        # compaction drops dead rows physically and clears tombstones
        compact_samples_table(spark, "t_del", n_buckets=4)
        assert not spark.catalog.tableExists("t_del__tombstones")
        assert series_set() == {"a", "b"}
        t = read_samples_table(spark, "t_del")
        assert t.filter(F.col("labels")["s"] == "a").count() == 3
        assert t.filter(F.col("labels")["s"] == "b").count() == 12
    finally:
        drop_samples_table(spark, "t_del")


def _file_snapshot(spark, table):
    """{file_path: mtime_ns} for every data file of the table."""
    import os

    out = {}
    for uri in spark.table(table).inputFiles():
        p = uri[7:] if uri.startswith("file://") else uri
        out[p] = os.stat(p).st_mtime_ns
    return out


def test_compact_is_partition_scoped(spark):
    """VM merges per partition (lib/storage/partition.go:35-42), never
    the whole table: a compact after appends to ONE day must leave every
    other day's files byte-identical (same paths, same mtimes)."""
    from victoriametrics_spark.storage import drop_samples_table

    rows = [
        (s, T0 + d * DAY + h * H, float(d * 24 + h))
        for s in ("a", "b")
        for d in range(3)
        for h in range(24)
    ]
    write_samples_table(_mk_samples(spark, rows), "t_pscope", n_buckets=2)
    try:
        late = [("a", T0 + DAY + h * H + 1, 999.0) for h in range(4)]
        append_samples(_mk_samples(spark, late), "t_pscope", n_buckets=2)
        before = _file_snapshot(spark, "t_pscope")
        compact_samples_table(spark, "t_pscope", n_buckets=2)
        after = _file_snapshot(spark, "t_pscope")
        d1 = f"date={str((__import__('datetime').datetime.utcfromtimestamp((T0 + DAY)/1000)).date())}"
        untouched = {p for p in before if d1 not in p}
        assert untouched, "expected files outside the appended day"
        for p in untouched:
            assert after.get(p) == before[p], f"{p} was rewritten"
        # the appended day is back to one file per occupied bucket
        from collections import Counter

        d1_files = [p for p in after if d1 in p]
        assert d1_files
        suffix_counts = Counter(p.rsplit("_", 1)[1] for p in d1_files)
        assert all(c == 1 for c in suffix_counts.values()), d1_files
        assert read_samples_table(spark, "t_pscope").count() == 148
        # idempotent: a second compact with nothing to do touches nothing
        compact_samples_table(spark, "t_pscope", n_buckets=2)
        assert _file_snapshot(spark, "t_pscope") == after
    finally:
        drop_samples_table(spark, "t_pscope")


def test_partial_compact_keeps_tombstones(spark):
    """A tombstone clears only once EVERY partition holding its dead
    rows has been rewritten (VM keeps deleted metricIDs until the last
    affected part is merged)."""
    from datetime import datetime

    from victoriametrics_spark.storage import delete_series, drop_samples_table

    rows = [
        ("a", T0 + d * DAY + h * H, float(h)) for d in range(2) for h in range(12)
    ] + [("b", T0 + d * DAY + h * H, 5.0) for d in range(2) for h in range(12)]
    write_samples_table(_mk_samples(spark, rows), "t_partial", n_buckets=2)
    try:
        assert delete_series(spark, "t_partial", ['m{s="a"}']) == 1
        day0 = datetime.utcfromtimestamp(T0 / 1000).date()
        day1 = datetime.utcfromtimestamp((T0 + DAY) / 1000).date()
        before = _file_snapshot(spark, "t_partial")
        compact_samples_table(spark, "t_partial", n_buckets=2, dates=[day0])
        # tombstone must survive: day1 still holds dead rows
        assert spark.catalog.tableExists("t_partial__tombstones")
        t = read_samples_table(spark, "t_partial")
        assert t.filter(F.col("labels")["s"] == "a").count() == 0
        assert t.filter(F.col("labels")["s"] == "b").count() == 24
        # day1 files untouched by the day0-scoped compact
        after = _file_snapshot(spark, "t_partial")
        for p in before:
            if f"date={day1}" in p:
                assert after.get(p) == before[p]
        # second compact covers day1 → tombstone clears, rows gone
        compact_samples_table(spark, "t_partial", n_buckets=2, dates=[day1])
        assert not spark.catalog.tableExists("t_partial__tombstones")
        t = read_samples_table(spark, "t_partial")
        assert t.filter(F.col("labels")["s"] == "a").count() == 0
        assert t.count() == 24
    finally:
        drop_samples_table(spark, "t_partial")


def test_tombstones_are_tenant_scoped(spark):
    """delete_series for tenant 1:0 must not hide — or let compaction
    physically drop — the identically-named series of tenant 2:0 (VM:
    deleted metricIDs live in the per-(AccountID, ProjectID) IndexDB)."""
    from victoriametrics_spark.api.http import with_tenant
    from victoriametrics_spark.storage import delete_series, drop_samples_table

    rows = [("a", T0 + h * H, float(h)) for h in range(12)]
    df = with_tenant(_mk_samples(spark, rows), "1:0").unionByName(
        with_tenant(_mk_samples(spark, rows), "2:0")
    )
    write_samples_table(df, "t_ttomb", n_buckets=2)
    try:
        assert delete_series(spark, "t_ttomb", ['m{s="a"}'], tenant="1:0") == 1
        t1 = read_samples_table(spark, "t_ttomb", tenant="1:0")
        t2 = read_samples_table(spark, "t_ttomb", tenant="2:0")
        assert t1.count() == 0
        assert t2.count() == 12  # other tenant unaffected on read
        compact_samples_table(spark, "t_ttomb", n_buckets=2)
        assert not spark.catalog.tableExists("t_ttomb__tombstones")
        t1 = read_samples_table(spark, "t_ttomb", tenant="1:0")
        t2 = read_samples_table(spark, "t_ttomb", tenant="2:0")
        assert t1.count() == 0
        assert t2.count() == 12  # ...and survives compaction physically
    finally:
        drop_samples_table(spark, "t_ttomb")


def test_compact_drops_fully_dead_partition(spark):
    """A partition whose every row is tombstoned is DROPped (dynamic
    overwrite can't write an empty partition), not left in place."""
    import os

    from victoriametrics_spark.storage import delete_series, drop_samples_table

    rows = [("a", T0 + h * H, 1.0) for h in range(6)] + [
        ("b", T0 + DAY + h * H, 2.0) for h in range(6)
    ]
    write_samples_table(_mk_samples(spark, rows), "t_deadpart", n_buckets=2)
    try:
        assert delete_series(spark, "t_deadpart", ['m{s="a"}']) == 1
        compact_samples_table(spark, "t_deadpart", n_buckets=2)
        assert not spark.catalog.tableExists("t_deadpart__tombstones")
        t = read_samples_table(spark, "t_deadpart")
        assert t.count() == 6
        # the day-0 directory is gone from disk
        loc = spark.conf.get("spark.sql.warehouse.dir") + "/t_deadpart"
        if loc.startswith("file:"):
            loc = loc[5:].lstrip("/")
            loc = "/" + loc
        dirs = {d for d in os.listdir(loc) if d.startswith("date=")}
        assert dirs == {"date=2024-01-02"}
    finally:
        drop_samples_table(spark, "t_deadpart")


def test_merge_small_parts_tiered(spark):
    """Size-tiered small-part merge (VM mergeset analog): appended small
    files merge into one bucket-aligned sorted file per (partition,
    bucket); files above the size threshold stay byte-identical; cost is
    proportional to fresh data, not partition size."""
    from collections import Counter

    from victoriametrics_spark.storage import (
        drop_samples_table,
        merge_small_parts,
    )

    # big base: 5000 rows in one day → file well above the threshold
    base = [("x", T0 + i * 17, float(i)) for i in range(5000)]
    write_samples_table(_mk_samples(spark, base), "t_tier", n_buckets=2)
    big_before = _file_snapshot(spark, "t_tier")
    # three small appends
    for k in range(3):
        late = [("x", T0 + 10_000_000 + k * 1000 + j, 9.0) for j in range(5)]
        append_samples(_mk_samples(spark, late), "t_tier", n_buckets=2)
    pre = _file_snapshot(spark, "t_tier")
    assert len(pre) == len(big_before) + 3
    threshold = max(
        __import__("os").stat(p).st_size
        for p in pre
        if p not in big_before
    ) + 1
    n = merge_small_parts(spark, "t_tier", max_small_bytes=threshold)
    try:
        assert n == 3
        post = _file_snapshot(spark, "t_tier")
        # the big base file untouched, smalls merged to one per bucket
        for p, mt in big_before.items():
            assert post.get(p) == mt
        new_files = [p for p in post if p not in big_before]
        suffix_counts = Counter(p.rsplit("_", 1)[1] for p in new_files)
        assert all(c == 1 for c in suffix_counts.values())
        t = read_samples_table(spark, "t_tier")
        assert t.count() == 5015
        # merged file is internally ts-sorted per series
        rows = spark.read.parquet(new_files[0].replace("file:", "")).collect()
        ts_seq = [r["ts"] for r in rows]
        assert ts_seq == sorted(ts_seq)
        # a second pass has nothing to merge
        assert merge_small_parts(spark, "t_tier", max_small_bytes=threshold) == 0
    finally:
        drop_samples_table(spark, "t_tier")


def test_merge_small_parts_drops_tombstoned_rows(spark):
    """Merging refreshes file mtimes, which would resurrect tombstoned
    rows past the deletion watermark — so the merge must drop dead rows
    itself, while LEAVING the tombstone for compaction (big files may
    still hold dead rows)."""
    from victoriametrics_spark.storage import (
        delete_series,
        drop_samples_table,
        merge_small_parts,
    )

    base = [("a", T0 + i * 1000, 1.0) for i in range(20)] + [
        ("b", T0 + i * 1000, 2.0) for i in range(20)
    ]
    write_samples_table(_mk_samples(spark, base), "t_tiertomb", n_buckets=2)
    append_samples(
        _mk_samples(spark, [("a", T0 + 50_000, 1.0), ("b", T0 + 50_000, 2.0)]),
        "t_tiertomb",
        n_buckets=2,
    )
    append_samples(
        _mk_samples(spark, [("a", T0 + 60_000, 1.0), ("b", T0 + 60_000, 2.0)]),
        "t_tiertomb",
        n_buckets=2,
    )
    assert delete_series(spark, "t_tiertomb", ['m{s="a"}']) == 1
    try:
        merge_small_parts(spark, "t_tiertomb", max_small_bytes=1 << 30)
        # tombstone retained (merge is not compaction)
        assert spark.catalog.tableExists("t_tiertomb__tombstones")
        t = read_samples_table(spark, "t_tiertomb")
        assert t.filter(F.col("labels")["s"] == "a").count() == 0
        assert t.filter(F.col("labels")["s"] == "b").count() == 22
        # and the merged files physically hold no 'a' rows (the fresh
        # mtime must not resurrect them)
        raw = spark.table("t_tiertomb")
        akey = raw.filter(F.col("labels")["s"] == "a")
        assert akey.count() == 0
    finally:
        drop_samples_table(spark, "t_tiertomb")


def test_maintain_samples_table_policy(spark):
    """One-call background-merger policy: dead-row partitions compact
    (tombstones clear), small-append partitions tier-merge (big file
    untouched), clean partitions stay byte-identical."""
    import os

    from victoriametrics_spark.storage import (
        delete_series,
        drop_samples_table,
        maintain_samples_table,
    )

    # day0: clean; day1: big base + small appends; day2: series to delete
    rows = (
        [("a", T0 + i * 60_000, 1.0) for i in range(500)]
        + [("a", T0 + DAY + i * 60_000, 2.0) for i in range(500)]
        + [("kill", T0 + 2 * DAY + i * 60_000, 3.0) for i in range(20)]
        + [("b", T0 + 2 * DAY + i * 60_000, 4.0) for i in range(20)]
    )
    write_samples_table(_mk_samples(spark, rows), "t_maint", n_buckets=2)
    for k in range(2):
        append_samples(
            _mk_samples(
                spark, [("a", T0 + DAY + 40_000_000 + k * 1000, 9.0)]
            ),
            "t_maint",
            n_buckets=2,
        )
    assert delete_series(spark, "t_maint", ['m{s="kill"}']) == 1
    before = _file_snapshot(spark, "t_maint")
    day0 = "date=2024-01-01"
    day1_appends = [
        p
        for p in before
        if "date=2024-01-02" in p and os.stat(p).st_size < 4000
    ]
    out = maintain_samples_table(
        spark, "t_maint", max_small_bytes=4000, max_files_per_bucket=8
    )
    after = _file_snapshot(spark, "t_maint")
    # clean day0 untouched
    for p in before:
        if day0 in p:
            assert after.get(p) == before[p]
    # day2 compacted: tombstone cleared, kill gone, b intact
    assert "2024-01-03" in out["compacted_dates"]
    assert not spark.catalog.tableExists("t_maint__tombstones")
    t = read_samples_table(spark, "t_maint")
    assert t.filter(F.col("labels")["s"] == "kill").count() == 0
    assert t.filter(F.col("labels")["s"] == "b").count() == 20
    # day1: small appends merged away, big base file untouched
    assert out["merged_files"] == len(day1_appends) >= 2
    big_day1 = [
        p
        for p in before
        if "date=2024-01-02" in p and p not in day1_appends
    ]
    for p in big_day1:
        assert after.get(p) == before[p]
    assert t.count() == 1022  # 500+500+2 appends+20 b; kill deleted


def test_merge_small_parts_multi_tenant_encoding(spark):
    """Regression (r9): inputFiles()/_metadata URIs percent-encode the
    partition-dir escaping (tenant '1:0' → dir 'tenant=1%3A0' → URI
    'tenant=1%253A0'); the merge must decode both layers so rows land
    back in the right tenant partition and no tenant's data is lost."""
    from victoriametrics_spark.api.http import with_tenant
    from victoriametrics_spark.storage import (
        drop_samples_table,
        merge_small_parts,
    )

    rows = [("a", T0 + i * H, float(i)) for i in range(12)]
    df = with_tenant(_mk_samples(spark, rows), "1:0").unionByName(
        with_tenant(_mk_samples(spark, rows), "2:0")
    )
    write_samples_table(df, "t_mt_merge", n_buckets=2)
    try:
        extra = [("a", T0 + 100_000, 5.0)]
        for _ in range(2):
            append_samples(
                with_tenant(_mk_samples(spark, extra), "1:0"),
                "t_mt_merge",
                n_buckets=2,
            )
        n1 = read_samples_table(spark, "t_mt_merge", tenant="1:0").count()
        n2 = read_samples_table(spark, "t_mt_merge", tenant="2:0").count()
        merged = merge_small_parts(spark, "t_mt_merge", max_small_bytes=1 << 30)
        assert merged > 0
        assert read_samples_table(spark, "t_mt_merge", tenant="1:0").count() == n1
        assert read_samples_table(spark, "t_mt_merge", tenant="2:0").count() == n2
        # merged files live under the correctly-escaped tenant dirs
        from urllib.parse import unquote

        dirs = {
            unquote(unquote(u.split("/")[-3]))
            for u in spark.table("t_mt_merge").inputFiles()
        }
        assert dirs == {"tenant=1:0", "tenant=2:0"}
    finally:
        drop_samples_table(spark, "t_mt_merge")


def test_apply_retention_drops_expired_partitions(spark):
    """retentionWatcher analog (lib/storage/table.go:446-470): date
    partitions fully older than retention (and partitions starting past
    the future-retention guard) are dropped wholesale — metadata +
    directory delete only, surviving partitions byte-identical. Boundary
    rows inside surviving partitions stay visible until a merge drops
    them (skipSamplesOutsideRetention, lib/storage/merge.go:205)."""
    from victoriametrics_spark.storage import (
        apply_retention,
        drop_samples_table,
        read_samples_table,
    )

    now = T0 + 10 * DAY
    rows = [
        ("a", T0 + d * DAY + h * H, float(d * 24 + h))
        for d in range(4)
        for h in range(24)
    ] + [("a", T0 + 20 * DAY, 99.0)]  # beyond future retention
    write_samples_table(_mk_samples(spark, rows), "t_ret", n_buckets=2)
    try:
        before = _file_snapshot(spark, "t_ret")
        out = apply_retention(
            spark, "t_ret", now_ms=now, retention_ms=8 * DAY
        )
        # day0 (ends T0+1d) and day1 (ends T0+2d = now-8d) fully
        # expired; day2 ends past the deadline and survives whole
        assert [p[-1] for p in out["dropped_partitions"]] == [
            "2024-01-01",
            "2024-01-02",
            "2024-01-21",
        ]
        after = _file_snapshot(spark, "t_ret")
        for p, m in before.items():
            if "date=2024-01-03" in p or "date=2024-01-04" in p:
                assert after.get(p) == m  # byte-identical survivors
        t = read_samples_table(spark, "t_ret")
        assert t.count() == 48  # days 2-3 intact, incl. boundary rows
        # second call: nothing left to drop
        out2 = apply_retention(
            spark, "t_ret", now_ms=now, retention_ms=8 * DAY
        )
        assert out2["dropped_partitions"] == []
        assert _file_snapshot(spark, "t_ret") == after
    finally:
        drop_samples_table(spark, "t_ret")


def test_apply_retention_filters(spark):
    """-retentionFilter analog: series matching a selector get a shorter
    retention; partitions where every matching row has expired are
    rewritten ONCE (the maintenance-state fingerprint makes repeat calls
    metadata-only), other series' rows and partially-expired partitions
    are untouched (lazy, like VM dropping filter-expired rows only
    during merges)."""
    from victoriametrics_spark.storage import (
        apply_retention,
        drop_samples_table,
        read_samples_table,
    )

    now = T0 + 5 * DAY + H
    rows = [
        (s, T0 + d * DAY + h * H, float(h))
        for s in ("a", "b")
        for d in range(5)
        for h in range(24)
    ]
    write_samples_table(_mk_samples(spark, rows), "t_retf", n_buckets=2)
    try:
        out = apply_retention(
            spark,
            "t_retf",
            now_ms=now,
            retention_filters=[('m{s="a"}', 2 * DAY)],
        )
        # fully crossed: end <= now-2d = T0+3d+1h -> days 0,1,2
        assert [p[-1] for p in out["rewritten_partitions"]] == [
            "2024-01-01",
            "2024-01-02",
            "2024-01-03",
        ]
        t = read_samples_table(spark, "t_retf")
        a = t.filter(F.col("labels")["s"] == "a")
        # 'a' gone from rewritten days, intact in days 3-4 (lazy there)
        assert a.filter(F.col("ts") < T0 + 3 * DAY).count() == 0
        assert a.filter(F.col("ts") >= T0 + 3 * DAY).count() == 48
        # 'b' untouched everywhere
        assert t.filter(F.col("labels")["s"] == "b").count() == 120
        # repeat call: state fingerprint, no rewrite
        snap = _file_snapshot(spark, "t_retf")
        out2 = apply_retention(
            spark,
            "t_retf",
            now_ms=now,
            retention_filters=[('m{s="a"}', 2 * DAY)],
        )
        assert out2["rewritten_partitions"] == []
        assert _file_snapshot(spark, "t_retf") == snap
    finally:
        drop_samples_table(spark, "t_retf")


def test_downsample_partitions_in_place(spark):
    """Physical downsampling is partition-scoped maintenance (VM applies
    -downsampling.period during merges): fully-aged partitions are
    rewritten in place (one file per (date, bucket) preserved), fresh
    partitions stay byte-identical, the maintenance-state fingerprint
    makes a second call metadata-only, and a backfill append re-arms
    the check."""
    from victoriametrics_spark.storage import (
        downsample_partitions,
        drop_samples_table,
        read_samples_table,
    )

    now = T0 + 5 * DAY
    rows = [
        ("a", T0 + d * DAY + m * 60_000, float(m))
        for d in range(5)
        for m in range(0, 1440, 10)  # one sample / 10 min
    ]
    write_samples_table(_mk_samples(spark, rows), "t_dsp", n_buckets=2)
    try:
        before = _file_snapshot(spark, "t_dsp")
        done = downsample_partitions(
            spark, "t_dsp", rules=[(2 * DAY, H)], now_ms=now
        )
        # fully aged: end <= now-2d -> days 0,1,2
        assert [p[-1] for p in done] == [
            "2024-01-01",
            "2024-01-02",
            "2024-01-03",
        ]
        after = _file_snapshot(spark, "t_dsp")
        for p, m in before.items():
            if "date=2024-01-04" in p or "date=2024-01-05" in p:
                assert after.get(p) == m
        t = read_samples_table(spark, "t_dsp")
        aged = t.filter(F.col("ts") < T0 + 3 * DAY)
        # one sample per hour survives, the LAST of each hour (:50)
        assert aged.count() == 72
        assert (
            aged.filter(F.col("ts") % H != 50 * 60_000).count() == 0
        )
        assert t.filter(F.col("ts") >= T0 + 3 * DAY).count() == 288
        # second call: state-stamped done, nothing rewritten
        assert (
            downsample_partitions(
                spark, "t_dsp", rules=[(2 * DAY, H)], now_ms=now
            )
            == []
        )
        assert _file_snapshot(spark, "t_dsp") == after
        # backfill into a thinned day changes the file set -> re-armed,
        # re-thinned (idempotent), and the newer sample wins its bucket
        append_samples(
            _mk_samples(spark, [("a", T0 + 55 * 60_000, 111.0)]),
            "t_dsp",
            n_buckets=2,
        )
        done3 = downsample_partitions(
            spark, "t_dsp", rules=[(2 * DAY, H)], now_ms=now
        )
        assert [p[-1] for p in done3] == ["2024-01-01"]
        t = read_samples_table(spark, "t_dsp")
        aged = t.filter(F.col("ts") < T0 + 3 * DAY)
        assert aged.count() == 72
        hour0 = aged.filter(
            (F.col("ts") >= T0) & (F.col("ts") < T0 + H)
        ).collect()
        assert [(r["ts"], r["value"]) for r in hour0] == [
            (T0 + 55 * 60_000, 111.0)
        ]
    finally:
        drop_samples_table(spark, "t_dsp")


def test_downsample_multi_tenant_independent(spark):
    """Two tenants' identically-named series thin independently (series
    keys don't embed the tenant; the downsample window must)."""
    from victoriametrics_spark.api.http import with_tenant
    from victoriametrics_spark.storage.downsample import downsample

    now = 100 * H
    rows = [("a", now - 11 * H, 1.0), ("a", now - 12 * H, 2.0)]
    df = with_tenant(_mk_samples(spark, rows), "1:0").unionByName(
        with_tenant(_mk_samples(spark, rows), "2:0")
    )
    out = downsample(df, rules=[(10 * H, 4 * H)], now_ms=now)
    got = sorted(
        (r["tenant"], r["ts"]) for r in out.collect()
    )
    # one survivor per tenant in the shared 4h bucket — not one overall
    assert got == [("1:0", now - 11 * H), ("2:0", now - 11 * H)]


def test_maintain_full_lifecycle(spark):
    """ONE maintain call runs the whole lifecycle: expired day dropped
    (retention), fresh-append day tier-merged, fully-aged day physically
    downsampled, clean fresh day untouched."""
    import os

    from victoriametrics_spark.storage import (
        drop_samples_table,
        maintain_samples_table,
        read_samples_table,
    )

    now = T0 + 10 * DAY
    rows = (
        # day0: expired (retention 8d)
        [("a", T0 + h * H, 1.0) for h in range(24)]
        # day4: fully aged past 2d -> downsample to 1/h
        + [
            ("a", T0 + 4 * DAY + m * 60_000, 2.0)
            for m in range(0, 1440, 10)
        ]
        # day9: fresh, will get small appends
        + [("a", T0 + 9 * DAY + h * H, 3.0) for h in range(24)]
    )
    write_samples_table(_mk_samples(spark, rows), "t_life", n_buckets=2)
    try:
        for k in range(2):
            append_samples(
                _mk_samples(
                    spark, [("a", T0 + 9 * DAY + 60_000 + k * 1000, 9.0)]
                ),
                "t_life",
                n_buckets=2,
            )
        before = _file_snapshot(spark, "t_life")
        small = [
            p
            for p in before
            if "date=2024-01-10" in p and os.stat(p).st_size < 4000
        ]
        out = maintain_samples_table(
            spark,
            "t_life",
            max_small_bytes=4000,
            now_ms=now,
            retention_ms=8 * DAY,
            downsample_rules=[(2 * DAY, H)],
        )
        assert [p[-1] for p in out["dropped_partitions"]] == ["2024-01-01"]
        assert [p[-1] for p in out["downsampled_partitions"]] == [
            "2024-01-05"
        ]
        assert out["merged_files"] == len(small) >= 2
        t = read_samples_table(spark, "t_life")
        assert t.filter(F.col("ts") < T0 + DAY).count() == 0  # retention
        assert (
            t.filter(
                (F.col("ts") >= T0 + 4 * DAY)
                & (F.col("ts") < T0 + 5 * DAY)
            ).count()
            == 24  # downsampled to one per hour
        )
        assert (
            t.filter(F.col("ts") >= T0 + 9 * DAY).count() == 26
        )  # fresh day + the 2 appends, merged not thinned
    finally:
        drop_samples_table(spark, "t_life")


def test_snapshot_create_restore(spark):
    """Instant hardlink snapshots (Storage.MustCreateSnapshot analog,
    app/vmstorage/main.go:300-377): creation copies no data (hardlinks),
    the snapshot keeps serving the original rows through later
    delete+compact rewrites of the live table, and restore brings back
    the full table WITH its bucket spec and tombstone side-table."""
    import os

    from victoriametrics_spark.storage import (
        compact_samples_table,
        create_snapshot,
        delete_series,
        delete_snapshot,
        drop_samples_table,
        list_snapshots,
        read_samples_table,
        restore_snapshot,
    )
    from victoriametrics_spark.storage.layout import _table_num_buckets

    rows = [
        (s, T0 + i * H, float(i)) for s in ("a", "b") for i in range(48)
    ]
    write_samples_table(_mk_samples(spark, rows), "t_snap", n_buckets=2)
    try:
        name = create_snapshot(spark, "t_snap")
        assert list_snapshots(spark, "t_snap") == [name]
        # hardlinks, not copies: the live file now has 2 links
        some_file = spark.table("t_snap").inputFiles()[0]
        local = "/" + some_file[7:].lstrip("/") if some_file.startswith(
            "file://"
        ) else some_file
        assert os.stat(local).st_nlink >= 2
        # mutate the live table: delete a series + physically compact
        assert delete_series(spark, "t_snap", ['m{s="a"}']) == 1
        compact_samples_table(spark, "t_snap", n_buckets=2)
        assert (
            read_samples_table(spark, "t_snap")
            .filter(F.col("labels")["s"] == "a")
            .count()
            == 0
        )
        # restore into a fresh table: everything back, bucket spec kept
        restore_snapshot(spark, "t_snap", name, dest_table="t_snap_r")
        try:
            back = read_samples_table(spark, "t_snap_r")
            assert back.count() == 96
            assert (
                back.filter(F.col("labels")["s"] == "a").count() == 48
            )
            assert _table_num_buckets(spark, "t_snap_r") == 2
        finally:
            drop_samples_table(spark, "t_snap_r")
        delete_snapshot(spark, "t_snap", name)
        assert list_snapshots(spark, "t_snap") == []
    finally:
        drop_samples_table(spark, "t_snap")


def test_snapshot_carries_tombstones(spark):
    """A snapshot taken AFTER a delete but BEFORE compaction must carry
    the tombstone side-table: the restored table still hides the
    deleted series (VM snapshots cover the index incl. deleted
    metricIDs, not just data parts)."""
    from victoriametrics_spark.storage import (
        create_snapshot,
        delete_series,
        drop_samples_table,
        read_samples_table,
        restore_snapshot,
    )

    rows = [(s, T0 + i * H, 1.0) for s in ("a", "b") for i in range(8)]
    write_samples_table(_mk_samples(spark, rows), "t_snaptomb", n_buckets=2)
    try:
        assert delete_series(spark, "t_snaptomb", ['m{s="a"}']) == 1
        name = create_snapshot(spark, "t_snaptomb")
        restore_snapshot(spark, "t_snaptomb", name, dest_table="t_snaptomb_r")
        try:
            back = read_samples_table(spark, "t_snaptomb_r")
            assert back.filter(F.col("labels")["s"] == "a").count() == 0
            assert back.filter(F.col("labels")["s"] == "b").count() == 8
        finally:
            drop_samples_table(spark, "t_snaptomb_r")
    finally:
        drop_samples_table(spark, "t_snaptomb")


def test_logs_retention_partition_drops(spark):
    """VictoriaLogs retention is day-granular whole-partition deletion:
    fully-expired days dropped (metadata-only), surviving days
    byte-identical, LogsQL keeps working."""
    from datetime import datetime

    from victoriametrics_spark.storage import apply_logs_retention
    from victoriametrics_spark.storage.layout import (
        drop_samples_table,
        read_logs_table,
        write_logs_table,
    )

    rows = [
        (datetime(2024, 1, d, h), f"msg d={d}", "web", float(d))
        for d in range(1, 5)
        for h in range(0, 24, 6)
    ]
    df = spark.createDataFrame(rows, ["_time", "_msg", "app", "value"])
    write_logs_table(df, "t_logret", stream_fields=["app"], n_buckets=2)
    try:
        now = T0 + 10 * DAY  # 2024-01-11
        before = _file_snapshot(spark, "t_logret")
        dropped = apply_logs_retention(
            spark, "t_logret", now_ms=now, retention_ms=8 * DAY
        )
        # days 1-2 end <= now-8d (= Jan 3); day 3 survives whole
        assert [p[-1] for p in dropped] == ["2024-01-01", "2024-01-02"]
        after = _file_snapshot(spark, "t_logret")
        for p, m in before.items():
            if "date=2024-01-03" in p or "date=2024-01-04" in p:
                assert after.get(p) == m
        back = read_logs_table(spark, "t_logret")
        assert back.count() == 8
        assert (
            apply_logs_retention(
                spark, "t_logret", now_ms=now, retention_ms=8 * DAY
            )
            == []
        )
    finally:
        drop_samples_table(spark, "t_logret")


def test_metrics_metadata_store():
    """lib/storage/metricsmetadata analog: 64KiB field limits, sorted
    get with limit, tenant scoping + multitenant merge, LRU cap."""
    from victoriametrics_spark.storage.metadata import (
        MetricsMetadataStore,
        parse_text_metadata,
    )

    st = MetricsMetadataStore(max_items=3)
    st.add([
        {"metric_family_name": "b", "help": "hb", "type": 1},
        {"metric_family_name": "a", "help": "ha", "type": 2, "unit": "s"},
        {"metric_family_name": "big", "help": "x" * 70000, "type": 1},
        {"metric_family_name": "u", "unit": "y" * 70000, "type": 1},
        {"metric_family_name": "n" * 70000, "help": "h", "type": 1},
    ])
    rows = st.get()
    assert [r["metric_family_name"] for r in rows] == ["a", "b"]
    assert st.get(limit=1)[0]["metric_family_name"] == "a"
    resp = st.as_response()
    assert resp["data"]["a"] == [{"type": "gauge", "unit": "s", "help": "ha"}]
    assert "unit" not in resp["data"]["b"][0]

    # tenant scoping + multitenant merge
    st.add([{"metric_family_name": "t", "help": "t1", "type": 1}],
           tenant="1:1")
    assert st.get(tenant="1:1")[0]["metric_family_name"] == "t"
    assert [r["metric_family_name"] for r in st.get(tenant="multitenant")] \
        == ["a", "b", "t"]

    # LRU-by-last-write eviction past the cap
    st.add([{"metric_family_name": "c", "help": "hc", "type": 1}])
    st.add([{"metric_family_name": "a", "help": "ha2", "type": 2}])
    st.add([{"metric_family_name": "d", "help": "hd", "type": 1}])
    names = [r["metric_family_name"] for r in st.get(tenant="multitenant")]
    assert "b" not in names and "t" not in names  # oldest writes evicted
    assert set(names) == {"a", "c", "d"}

    # text parser: sequential HELP/TYPE merge, invalid TYPE discard,
    # escaped help
    mds = parse_text_metadata([
        "# HELP m1 first\\nline\\\\x",
        "# TYPE m1 counter",
        "# TYPE m2 bogus",
        "# HELP m3 h3",
        "# TYPE m3 stateset",
        "plain_line 1",
        "# EH not-metadata",
    ])
    assert mds == [
        {"metric_family_name": "m1", "help": "first\nline\\x", "unit": "",
         "type": 1},
        {"metric_family_name": "m3", "help": "h3", "unit": "", "type": 7},
    ]


def test_downsample_selector_scoped_rules(spark):
    """-downsampling.period=filter:offset:interval semantics: FIRST
    matching filter wins, unmatched series stay raw, 0s:0s excludes,
    and the flag-string parser round-trips the syntax."""
    from victoriametrics_spark.schema import SAMPLE_SCHEMA
    from victoriametrics_spark.storage.downsample import (
        downsample,
        parse_downsampling_periods,
    )

    H = 3_600_000
    now = 100 * H
    rows = []
    for s, env in (("a", "prod"), ("b", "dev"), ("c", None)):
        labels = {"s": s}
        if env:
            labels["env"] = env
        # three aged samples inside one 4h bucket
        for i, v in ((11, 1.0), (12, 2.0), (13, 3.0)):
            rows.append(("m", labels, now - i * H, v, False))
    df = spark.createDataFrame(rows, SAMPLE_SCHEMA)

    rules = parse_downsampling_periods(
        ['{env="prod"}:10h:100h', '{env=~"prod|dev"}:10h:1ms']
    )
    out = downsample(df, rules, now_ms=now).collect()
    by_s = {}
    for r in out:
        by_s.setdefault(r["labels"]["s"], []).append(r)
    # prod matched the FIRST filter (one big bucket -> 1 sample kept),
    # even though the second filter also matches
    assert len(by_s["a"]) == 1 and by_s["a"][0]["ts"] == now - 11 * H
    # dev matched only the second filter: 1ms interval keeps all 3
    assert len(by_s["b"]) == 3
    # no filter matched -> not downsampled
    assert len(by_s["c"]) == 3

    # 0s:0s exclusion idiom: prod exempt, match-all rule thins others
    rules2 = parse_downsampling_periods(['{env="prod"}:0s:0s', "10h:100h"])
    out2 = downsample(df, rules2, now_ms=now).collect()
    by_s2 = {}
    for r in out2:
        by_s2.setdefault(r["labels"]["s"], []).append(r)
    assert len(by_s2["a"]) == 3   # excluded
    assert len(by_s2["b"]) == 1 and len(by_s2["c"]) == 1

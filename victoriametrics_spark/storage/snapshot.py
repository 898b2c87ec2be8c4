"""Instant storage snapshots — the vmbackup foundation.

The reference creates instant snapshots by hardlinking immutable part
files into a snapshot directory (lib/storage Storage.MustCreateSnapshot;
served at /snapshot/create|list|delete|delete_all and the
Prometheus-compatible /api/v1/admin/tsdb/snapshot,
app/vmstorage/main.go:300-377). The same trick works verbatim here:
parquet part files are immutable once written — compaction/merges write
NEW files and delete old ones — so a snapshot is a hardlink mirror of
the table directory tree, created in O(#files) with zero data copied,
and it keeps serving the old inodes however the live table is
rewritten afterwards.

A snapshot covers the samples table, its tombstone side-table, and the
``_maintenance_state.json`` part-header analog (hardlinked with the
tree), plus a ``_snapshot_meta.json`` recording the bucket/partition
spec so :func:`restore_snapshot` can re-register the table with its
zero-exchange bucket layout intact.

Local-filesystem only, like the reference (hardlinks don't exist on
object stores; a cluster deployment snapshots via storage-layer
manifests instead). Cross-device links fall back to a file copy.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import SparkSession

from victoriametrics_spark.storage.layout import (
    _table_num_buckets,
    _tombstone_table,
    drop_samples_table,
)


def _local_warehouse(spark: SparkSession) -> str:
    wh = spark.conf.get("spark.sql.warehouse.dir")
    if wh.startswith("file:"):
        wh = "/" + wh[5:].lstrip("/")
    if "://" in wh:
        raise ValueError(
            f"snapshots need a local-filesystem warehouse, got {wh!r} "
            "(the reference's hardlink snapshots are local-disk too)"
        )
    return wh


def _snap_root(spark: SparkSession, table: str) -> str:
    return os.path.join(_local_warehouse(spark), "_snapshots", table.lower())


def _link_tree(src: str, dst: str) -> int:
    """Hardlink-mirror ``src`` into ``dst``; returns files mirrored.
    Data (parquet) files are immutable, so hardlinks are safe; ``_``
    metadata files (``_maintenance_state.json``, ``_SUCCESS``) are
    rewritten in place by the live table and are COPIED, so neither
    side can mutate the other's copy through a shared inode. Falls
    back to copy for cross-device links."""
    n = 0
    for root, _dirs, files in os.walk(src):
        rel = os.path.relpath(root, src)
        out_dir = dst if rel == "." else os.path.join(dst, rel)
        os.makedirs(out_dir, exist_ok=True)
        for f in files:
            s = os.path.join(root, f)
            d = os.path.join(out_dir, f)
            if f.startswith("_"):
                shutil.copy2(s, d)
            else:
                try:
                    os.link(s, d)
                except OSError:
                    shutil.copy2(s, d)
            n += 1
    return n


def create_snapshot(
    spark: SparkSession, table: str, name: str | None = None
) -> str:
    """Create an instant snapshot of ``table`` (+ tombstones); returns
    the snapshot name (VM format: ``YYYYMMDDhhmmss-<unique>``)."""
    wh = _local_warehouse(spark)
    src = os.path.join(wh, table.lower())
    if not os.path.isdir(src):
        raise ValueError(f"table {table!r} has no warehouse directory")
    if name is None:
        # VM snapshot name shape: YYYYMMDDhhmmss-<16 uppercase hex>
        # (lib/storage/snapshot/snapshot.go NewName)
        stamp = time.strftime("%Y%m%d%H%M%S", time.gmtime())
        name = f"{stamp}-{uuid.uuid4().hex[:16].upper()}"
    snap = os.path.join(_snap_root(spark, table), name)
    if os.path.exists(snap):
        raise ValueError(f"snapshot {name!r} already exists")
    os.makedirs(os.path.join(snap, "data"))
    _link_tree(src, os.path.join(snap, "data"))
    tomb_dir = os.path.join(wh, _tombstone_table(table).lower())
    if os.path.isdir(tomb_dir):
        os.makedirs(os.path.join(snap, "tombstones"))
        _link_tree(tomb_dir, os.path.join(snap, "tombstones"))
    scan = spark.table(table)
    part_cols = [c for c in ("tenant", "date") if c in scan.columns]
    data_cols = [
        (f.name, f.dataType.simpleString())
        for f in scan.schema.fields
        if f.name not in part_cols
    ]
    part_types = {
        f.name: f.dataType.simpleString()
        for f in scan.schema.fields
        if f.name in part_cols
    }
    meta = {
        "table": table,
        "n_buckets": _table_num_buckets(spark, table),
        "part_cols": part_cols,
        "part_types": part_types,
        "data_cols": data_cols,
    }
    if os.path.isdir(tomb_dir):
        meta["tomb_cols"] = [
            (f.name, f.dataType.simpleString())
            for f in spark.table(_tombstone_table(table)).schema.fields
        ]
    with open(os.path.join(snap, "_snapshot_meta.json"), "w") as fh:
        json.dump(meta, fh, sort_keys=True)
    return name


def list_snapshots(spark: SparkSession, table: str) -> list[str]:
    root = _snap_root(spark, table)
    if not os.path.isdir(root):
        return []
    return sorted(
        d
        for d in os.listdir(root)
        if os.path.isdir(os.path.join(root, d))
    )


def delete_snapshot(spark: SparkSession, table: str, name: str) -> None:
    if not name or "/" in name or name.startswith("."):
        raise ValueError(f"invalid snapshot name {name!r}")
    snap = os.path.join(_snap_root(spark, table), name)
    if not os.path.isdir(snap):
        raise ValueError(f'cannot find snapshot "{name}"')
    shutil.rmtree(snap)


def delete_all_snapshots(spark: SparkSession, table: str) -> None:
    for name in list_snapshots(spark, table):
        delete_snapshot(spark, table, name)


def backup_snapshot(
    spark: SparkSession, table: str, name: str, dest_dir: str
) -> int:
    """vmbackup analog: materialize snapshot ``name`` into an external
    backup directory (a real copy — backups leave the storage volume,
    so hardlinks don't apply; the parts are immutable, so a future
    incremental copy could skip files already present, exactly
    vmbackup's server-side copy optimization). Returns files copied."""
    snap = os.path.join(_snap_root(spark, table), name)
    if not os.path.isfile(os.path.join(snap, "_snapshot_meta.json")):
        raise ValueError(f'cannot find snapshot "{name}"')
    if os.path.exists(dest_dir) and os.listdir(dest_dir):
        raise ValueError(f"backup destination {dest_dir!r} is not empty")
    shutil.copytree(snap, dest_dir, dirs_exist_ok=True)
    return sum(len(fs) for _, _, fs in os.walk(dest_dir))


def restore_backup(
    spark: SparkSession, backup_dir: str, dest_table: str
) -> None:
    """vmrestore analog: re-create ``dest_table`` from an external
    backup directory written by backup_snapshot."""
    if not os.path.isfile(os.path.join(backup_dir, "_snapshot_meta.json")):
        raise ValueError(f"no snapshot backup at {backup_dir!r}")
    _restore_from_dir(spark, backup_dir, dest_table)


def restore_snapshot(
    spark: SparkSession,
    table: str,
    name: str,
    dest_table: str | None = None,
) -> None:
    """Restore a snapshot into ``dest_table`` (default: the source
    table, replacing it — the vmrestore flow). The restored table keeps
    the original partition + bucket/sort spec, so bucketed zero-exchange
    plans work immediately; files are hardlinked back, so the restore is
    O(#files) like snapshot creation."""
    dest = dest_table or table
    snap = os.path.join(_snap_root(spark, table), name)
    if not os.path.isfile(os.path.join(snap, "_snapshot_meta.json")):
        raise ValueError(f"cannot find snapshot {name!r}")
    _restore_from_dir(spark, snap, dest)


def _restore_from_dir(spark: SparkSession, snap: str, dest: str) -> None:
    meta_path = os.path.join(snap, "_snapshot_meta.json")
    with open(meta_path) as fh:
        meta = json.load(fh)
    wh = _local_warehouse(spark)
    drop_samples_table(spark, dest)
    # create an empty MANAGED table first (managed drops delete files,
    # which compaction/retention rely on), then hardlink the snapshot
    # into its directory and repair partition metadata
    cols_ddl = ", ".join(f"`{n}` {t}" for n, t in meta["data_cols"])
    part_cols = meta["part_cols"]
    stmt = f"CREATE TABLE {dest} ({cols_ddl}"
    if part_cols:
        stmt += ", " + ", ".join(
            f"`{c}` {meta['part_types'][c]}" for c in part_cols
        )
    stmt += ") USING parquet"
    if part_cols:
        stmt += " PARTITIONED BY (" + ", ".join(part_cols) + ")"
    if meta.get("n_buckets"):
        stmt += (
            " CLUSTERED BY (__series_key) SORTED BY (__series_key, ts)"
            f" INTO {meta['n_buckets']} BUCKETS"
        )
    spark.sql(stmt)
    dest_dir = os.path.join(wh, dest.lower())
    # the snapshot's maintenance state describes the snapshotted file
    # set, which is exactly what is restored — it rides along hardlinked
    _link_tree(os.path.join(snap, "data"), dest_dir)
    if part_cols:
        spark.sql(f"MSCK REPAIR TABLE {dest}")
    tomb_src = os.path.isdir(os.path.join(snap, "tombstones"))
    if tomb_src and meta.get("tomb_cols"):
        tomb_ddl = ", ".join(
            f"`{n}` {t}" for n, t in meta["tomb_cols"]
        )
        spark.sql(
            f"CREATE TABLE {_tombstone_table(dest)} ({tomb_ddl}) "
            "USING parquet"
        )
        _link_tree(
            os.path.join(snap, "tombstones"),
            os.path.join(wh, _tombstone_table(dest).lower()),
        )
        spark.catalog.refreshTable(_tombstone_table(dest))
    spark.catalog.refreshTable(dest)

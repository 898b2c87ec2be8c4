from victoriametrics_spark.storage.snapshot import (
    create_snapshot,
    delete_all_snapshots,
    delete_snapshot,
    list_snapshots,
    restore_snapshot,
)
from victoriametrics_spark.storage.layout import (
    append_samples,
    apply_retention,
    compact_samples_table,
    delete_series,
    downsample_partitions,
    drop_samples_table,
    maintain_samples_table,
    merge_small_parts,
    parse_tenant,
    read_samples_table,
    write_samples_table,
)

__all__ = [
    "write_samples_table",
    "append_samples",
    "read_samples_table",
    "apply_retention",
    "compact_samples_table",
    "delete_series",
    "downsample_partitions",
    "drop_samples_table",
    "maintain_samples_table",
    "merge_small_parts",
    "parse_tenant",
    "create_snapshot",
    "list_snapshots",
    "delete_snapshot",
    "delete_all_snapshots",
    "restore_snapshot",
]

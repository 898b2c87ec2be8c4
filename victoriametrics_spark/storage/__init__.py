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
]

"""Dataset export sinks — the write-side surface of the engine.

The reference's only egress is ``RETURNING *`` rows over the wire
(schema.sql:331-467); a Spark engine also ships datasets.  At 100 TB the
LAYOUT of an exported dataset decides whether every later reader prunes or
scans: Hive-style partition directories turn equality predicates on the
partition columns into directory pruning (no file even opened), and
within-file clustering + parquet min/max row-group stats do the same for
range predicates on the sort key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """Hive-style partitioned parquet export (``path/col=value/...``).

    Readers filtering on ``partition_cols`` get PartitionFilters —
    directory-level pruning, strictly cheaper than PushedFilters (pruned
    files are never listed into tasks at all).  Choose low-cardinality
    columns: every distinct combination is a directory, and 10k+
    directories of small files trade scan cost for listing cost."""
    df.write.partitionBy(*partition_cols).mode(mode).parquet(path)


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_col: str,
    n_files: int,
    mode: str = "overwrite",
) -> None:
    """Clustered (bucketed-layout) export: hash-repartition on
    ``cluster_col`` then sort within each output file by it, so parquet
    row-group min/max stats prune point and range lookups — the portable
    form of the reference's B-tree ``decider_index``
    (/root/reference/schema.sql:56) for path-based tables (metastore
    bucketing needs ``saveAsTable``; this layout works anywhere)."""
    (
        df.repartition(n_files, cluster_col)
        .sortWithinPartitions(cluster_col)
        .write.mode(mode)
        .parquet(path)
    )


def write_orc_clustered(
    df: DataFrame,
    path: str,
    cluster_col: str,
    n_files: int,
    mode: str = "overwrite",
) -> None:
    """Clustered ORC export — same layout contract as ``write_clustered``
    (hash-repartition + in-file sort ⇒ stripe-level min/max pruning on the
    cluster key) for consumers standardized on ORC."""
    (
        df.repartition(n_files, cluster_col)
        .sortWithinPartitions(cluster_col)
        .write.mode(mode)
        .orc(path)
    )

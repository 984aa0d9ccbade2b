"""Deterministic training-shard export.

A training job wants its input laid out as a fixed number of
same-shaped shards per split (``split=train/shard=17/part-*.parquet``)
where shard membership and per-file row order are *reproducible* —
re-running the export after a cluster resize, an AQE re-plan, or a task
retry must produce byte-identical shard contents.  Spark's default
write gives none of that: file count tracks the task layout and row
order tracks shuffle arrival order.

This sink makes the layout a pure function of the data:

- shard id = ``hash60(id # salt) mod n_shards`` (same portable salted
  md5 hash as the sampling/split operators) — stable across runs,
  engines, and cluster sizes;
- one shuffle, hash-partitioned on the (partition cols, shard) group
  key, puts every row of a shard group into exactly one task, so each
  ``.../shard=N/`` directory receives exactly one file (unless
  ``max_records_per_file`` splits it);
- ``sort_by`` (default: the id column) orders rows within each file so
  shard contents are deterministic, not shuffle-arrival-ordered.

At 100 TB the cost is the one shuffle the layout requires; everything
else is scan + write.  Engine addition (the reference has no table
I/O — SURVEY.md §2.9/§2.10).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from filters_spark.pipeline.dedup import portable_hash60

__all__ = ["shard_column", "write_training_shards"]


def shard_column(
    n_shards: int, id_col: str = "doc_id", salt: str = "shard"
) -> Column:
    """Stable shard id in ``[0, n_shards)`` from the salted 60-bit id
    hash — usable directly in ``withColumn`` / ``repartition``."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    h = portable_hash60(F.col(id_col).cast("string"), salt)
    return F.pmod(h, F.lit(n_shards)).cast("int").alias("shard")


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    partition_by: Sequence[str] = (),
    id_col: str = "doc_id",
    salt: str = "shard",
    sort_by: Sequence[str] | None = None,
    format: str = "parquet",
    mode: str = "error",
    max_records_per_file: int | None = None,
) -> None:
    """Write ``df`` as ``path/[<partition_by>=v/...]shard=N/part-*`` with
    deterministic shard membership and per-file row order.

    ``partition_by`` columns (e.g. the ``split`` column from
    :func:`~filters_spark.pipeline.sampling.split_assign`) become
    directory levels above ``shard=``; downstream readers prune on them
    at the file-listing level.  ``sort_by`` defaults to ``[id_col]``;
    pass the full ordering you need reproduced inside each file.
    """
    partition_by = list(partition_by)
    missing = [c for c in partition_by + [id_col] if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in DataFrame: {missing}")
    if "shard" in df.columns:
        raise ValueError(
            "input already has a 'shard' column; drop or rename it"
        )
    sort_cols = list(sort_by) if sort_by is not None else [id_col]

    out = df.withColumn("shard", shard_column(n_shards, id_col, salt))
    group_cols = [F.col(c) for c in partition_by] + [F.col("shard")]
    # Hash-repartition on the full group key: every (partition, shard)
    # group lands in exactly one task => exactly one file per leaf dir.
    out = out.repartition(*group_cols).sortWithinPartitions(
        *group_cols, *[F.col(c) for c in sort_cols]
    )
    writer = out.write.format(format).mode(mode).partitionBy(
        *partition_by, "shard"
    )
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.save(path)

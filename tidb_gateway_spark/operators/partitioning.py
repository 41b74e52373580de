"""Input-parallelism guard for compute-heavy per-row operators.

A parquet file is splittable only at row-group boundaries; a table
written as one row group (pandas/pyarrow defaults produce exactly that
for < 1M rows) scans as ONE task no matter what
``spark.sql.files.maxPartitionBytes`` says.  For scan-speed operators
that is irrelevant, but a hash-heavy stage (MinHash: ~250 md5 calls per
document) then runs single-threaded on a 32-core machine.

:func:`ensure_min_partitions` repartitions ONLY when the planned scan
parallelism is materially below the session's core count — the common
case for small/medium single-file tables.  At 100 TB the condition is
never true (thousands of files / row groups per table), so the round-
robin shuffle this inserts is a small-input-only adaptation, not a
fixed cost in the scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_partitions(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition ``df`` round-robin iff its planned partition count is
    under half the target (default: the session's default parallelism).

    Planning only — no job runs; ``rdd.getNumPartitions`` reads the
    physical plan's partitioning.
    """
    try:
        sc = df.sparkSession.sparkContext
        want = min_parts or sc.defaultParallelism
        have = df.rdd.getNumPartitions()
    except Exception:
        return df
    if have * 2 <= want:
        return df.repartition(want)
    return df

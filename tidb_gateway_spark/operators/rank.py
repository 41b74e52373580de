"""Scalable global ranking.

A vanilla ``Window.orderBy(...)`` with no partition key moves ALL rows
to one partition — correct, but a single-machine bottleneck that defeats
the cluster at 100 TB (Spark even warns).  The scalable formulation is
the classic two-pass range-partitioned rank:

1. range-partition by the sort key (``repartitionByRange`` samples
   boundaries);
2. rank within each partition (cheap, local sort);
3. compute per-partition row counts, prefix-sum them on the driver
   (#partitions values, not rows), and add each partition's offset.

Ties across partition boundaries are handled by ranking on the full
(key, tiebreak) ordering, which range partitioning keeps contiguous.

``global_row_number`` is exact and distributed; the declared global
window queries (q32/q37) keep the single-partition form for oracle
parity at fixture scale — this operator is what replaces them at 100 TB
(tests assert equivalence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_row_number(df: DataFrame, order_cols: list, out_col: str = "rn",
                      num_partitions: int | None = None) -> DataFrame:
    """Exact global ROW_NUMBER over ``order_cols`` without a
    single-partition window.

    ``order_cols``: list of Columns or names; must be a total order
    (include a unique tiebreak) for deterministic output.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(parts, *cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    w = Window.partitionBy("_pid").orderBy(*cols)
    local = ranged.withColumn("_local_rn", F.row_number().over(w))
    # per-partition counts: #partitions rows to the driver, not data
    counts = {
        r["_pid"]: r["n"]
        for r in local.groupBy("_pid").agg(F.count("*").alias("n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offset_col = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )[F.col("_pid")]
    return (
        local.withColumn(out_col, (F.col("_local_rn") + offset_col).cast("int"))
        .drop("_pid", "_local_rn")
    )

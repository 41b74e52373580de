"""Deterministic KMV (k-minimum-values) distinct-count sketch.

The "novel sketch" slot from the brief, chosen over HLL deliberately:
``approx_count_distinct`` sketches are engine-specific (Spark's
HLL++ registers differ from DuckDB's), so an HLL operator can only get
a rows-only correctness check.  KMV over a portable hash is fully
deterministic — both engines compute the identical k smallest
``md5(token)`` values, so the sketch itself AND the estimate
hash-match at value level, and the estimator's error is visible
against the exact count in the same result row.

Estimator: with U the k-th smallest of n distinct hashes mapped to
(0,1), E[U] ≈ k/(n+1), so ``n̂ = (k-1)/U`` (the unbiased form).  We map
via the first 8 hex chars / 2^32 — integer arithmetic then one double
division, bit-identical cross-engine.

Scale shape: per-partition TopK(k ascending) then a driver-side merge
of ≤ partitions·k candidates — exactly Spark's TakeOrdered physical
operator, which is also how KMV sketches MERGE (union the candidate
sets, keep the k smallest): the same plan serves per-split sketching
and sketch union, and the shuffle carries k hashes per partition, never
the distinct universe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def kmv_sketch(values: DataFrame, col: str, k: int = 256) -> DataFrame:
    """DISTINCT values of ``col`` → one row: (k_used, kth_hash, est).

    ``values`` may contain duplicates; hashing after DISTINCT keeps the
    sketch a pure function of the value SET.  For k ≥ distinct count
    the estimate is exact-by-construction (kth hash is the max, and the
    count is just k_used).
    """
    hashed = values.select(F.md5(F.col(col).cast("string")).alias("h")).distinct()
    kmin = hashed.orderBy("h").limit(k)
    return kmin.agg(
        F.count("*").alias("k_used"),
        F.max("h").alias("kth"),
        (
            (F.count("*") - F.lit(1)).cast("double")
            / hex_frac(F.max("h"))
        ).alias("est_raw"),
    ).select(
        "k_used",
        "kth",
        F.floor(F.col("est_raw") + F.lit(0.5)).cast("bigint").alias("est"),
    )


def hex_frac(h: Column) -> Column:
    """First 8 hex chars of a digest → uniform (0,1) double
    (value/2^32); the deterministic hash→unit-interval map both engines
    share."""
    return (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("double")
        / F.lit(4294967296.0)
    )

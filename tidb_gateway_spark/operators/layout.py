"""Z-order layout: write a table clustered by a Morton key and prune
multi-column box predicates at read time.

The reference relays storage concerns to its backends; this module is
the Spark-side answer to "how does a 100 TB table serve predicates on
TWO columns fast": quantize both columns, interleave the bits
(queries/layout_quality.q193 declares the math with a DuckDB oracle),
partition the written files by the top z bits, and at query time map
the query box back to the candidate z-buckets — a metadata-sized,
driver-side computation — so the scan touches only partitions whose
rectangles intersect the box.  This is what Delta/Iceberg
``OPTIMIZE ZORDER BY`` + file skipping do, expressed with plain
parquet partitioning.

Plan-asserted (tests/test_plans.py): the generated ``zbucket IN (…)``
predicate lands in PartitionFilters and the scan reads a strict
subset of partitions, while returning exactly the rows of the
unpruned filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZBITS = 10          # per-dimension quantization bits
BUCKET_BITS = 3     # per-dimension bits kept in the partition bucket


def _interleave_sql(xq: str, yq: str, bits: int) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({xq} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({yq} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


def _quantize(col: Column, lo: float, hi: float) -> Column:
    # Clamp BOTH ends (mirroring zbucket_candidates' [0, top] clamp):
    # a row below the pinned lo bound would otherwise quantize negative
    # and shift into a garbage Morton code, landing in a bucket the
    # reader never probes — silently dropped from box-query results.
    # Clamped rows land in edge buckets where the residual range filter
    # still excludes them correctly.
    top = 2**ZBITS - 1
    return F.greatest(
        F.lit(0).cast("bigint"),
        F.least(
            F.lit(top).cast("bigint"),
            F.floor((col - F.lit(lo)) * (2**ZBITS) / F.lit(hi - lo)),
        ),
    ).cast("bigint")


def zorder_write(df: DataFrame, x_col: str, y_col: str, path: str,
                 bounds: tuple[float, float, float, float]) -> None:
    """Write ``df`` partitioned by the top z-bucket of (x, y).

    ``bounds`` = (xlo, xhi, ylo, yhi) — at 100 TB these come from
    table statistics (ANALYZE), pinned so that readers can recompute
    bucket rectangles without scanning.  Partition count is
    4**BUCKET_BITS (64): each partition holds a rectangle of the
    (x, y) plane, which is what makes the box→bucket pruning below
    sound.
    """
    xlo, xhi, ylo, yhi = bounds
    xq = _quantize(F.col(x_col), xlo, xhi)
    yq = _quantize(F.col(y_col), ylo, yhi)
    z = df.withColumn("_xq", xq).withColumn("_yq", yq).withColumn(
        "zv", F.expr(_interleave_sql("_xq", "_yq", ZBITS)))
    (
        z.withColumn(
            "zbucket",
            F.shiftright("zv", 2 * (ZBITS - BUCKET_BITS)).cast("int"))
        .drop("_xq", "_yq", "zv")
        .repartition("zbucket")
        .write.mode("overwrite")
        .partitionBy("zbucket")
        .parquet(path)
    )


def zbucket_candidates(x_range: tuple[float, float],
                       y_range: tuple[float, float],
                       bounds: tuple[float, float, float, float],
                       ) -> list[int]:
    """Candidate z-buckets for a box predicate — pure driver-side
    arithmetic over 4**BUCKET_BITS bucket rectangles (metadata-sized;
    never touches data).

    A bucket's id interleaves the top BUCKET_BITS of xq (even bit
    positions) and yq (odd positions); decoding gives the bucket's
    cell rectangle, kept iff it intersects the quantized query box.
    """
    xlo, xhi, ylo, yhi = bounds
    top = 2**ZBITS - 1

    def q(v: float, lo: float, hi: float) -> int:
        return max(0, min(top, int((v - lo) * (2**ZBITS) / (hi - lo))))

    qx0, qx1 = q(x_range[0], xlo, xhi), q(x_range[1], xlo, xhi)
    qy0, qy1 = q(y_range[0], ylo, yhi), q(y_range[1], ylo, yhi)
    cell = 2 ** (ZBITS - BUCKET_BITS)  # quantized units per bucket cell
    out = []
    for b in range(4**BUCKET_BITS):
        bx = sum(((b >> (2 * i)) & 1) << i for i in range(BUCKET_BITS))
        by = sum(((b >> (2 * i + 1)) & 1) << i for i in range(BUCKET_BITS))
        x0, x1 = bx * cell, (bx + 1) * cell - 1
        y0, y1 = by * cell, (by + 1) * cell - 1
        if x1 >= qx0 and x0 <= qx1 and y1 >= qy0 and y0 <= qy1:
            out.append(b)
    return out


def zorder_read(spark, path: str, x_col: str, y_col: str,
                x_range: tuple[float, float], y_range: tuple[float, float],
                bounds: tuple[float, float, float, float]) -> DataFrame:
    """Box query over a z-written table: the zbucket IN (…) predicate
    derived from the box prunes partitions; the exact range filters
    remain as row-level residuals."""
    cands = zbucket_candidates(x_range, y_range, bounds)
    df = spark.read.parquet(path)
    return df.filter(
        F.col("zbucket").isin(cands)
        & F.col(x_col).between(*x_range)
        & F.col(y_col).between(*y_range)
    )

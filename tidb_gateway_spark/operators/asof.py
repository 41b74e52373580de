"""Generic as-of join: for each left row, the latest right row with
``right.ts < left.ts`` (strict) sharing the key.

Spark-first formulation (also used by q20): union the two sides tagged,
ONE shuffle by key, a RANGE-frame window on exact epoch-micros carrying
the right side's last value forward, then filter back to left rows.
Strictness of the bound comes from ``rangeBetween(unboundedPreceding,
-1)``.  Linear in rows; contrast the O(n²) correlated subquery.

For the 100 TB case with a small right side, the broadcast variant
(bucketed right side + binary search per row) can beat the shuffle; the
union-window form is the general fact-fact one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, key: str, ts: str,
              value_cols: list[str], suffix: str = "_asof") -> DataFrame:
    """Left rows + latest-preceding right values (NULL when none).

    ``ts`` must be an exact-integer ordering column (epoch micros).
    """
    lt = left.withColumn("_side", F.lit(1))
    rt = right.select(key, ts, *value_cols).withColumn("_side", F.lit(0))
    rcols = {c: f"{c}{suffix}" for c in value_cols}
    both = lt.unionByName(rt, allowMissingColumns=True)
    # right rows order before left rows at the same ts via _side so a
    # right row at ts==t is NOT visible to a left row at t (strict <)
    w = (
        Window.partitionBy(key)
        .orderBy(ts)
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    out = both
    for c, alias in rcols.items():
        carried = F.last(
            F.when(F.col("_side") == 0, F.col(c)), ignorenulls=True
        ).over(w)
        out = out.withColumn(alias, carried)
    return out.filter(F.col("_side") == 1).drop("_side", *value_cols)

"""Q31–Q37: window functions (SURVEY.md §2B).

Scale notes: per-user windows (Q31/33–36) shuffle once by user_id then
sort within partitions — scales linearly.  The *global* windows (Q32
rank over all orders, Q37 ntile) are single-partition by construction in
vanilla Spark; they are correct here, and at 100 TB a global rank would
be re-expressed as a two-pass range-partitioned rank (sample → range
boundaries → per-partition rank + offset), which `operators/` documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tidb_gateway_spark.catalog import load_table
from tidb_gateway_spark.functions import stable_round
from tidb_gateway_spark.queries.registry import register

# Per-user event ordering: ts is unique per user in the fixture, event_id
# tiebreak keeps it deterministic regardless.
def _user_window():
    return Window.partitionBy("user_id").orderBy("ts", "event_id")


@register(
    "q31_row_number",
    "SELECT event_id, CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS rn "
    "FROM events ORDER BY event_id",
    doc="ROW_NUMBER per key.",
    tags=("window",),
)
def q31(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.select("event_id", F.row_number().over(_user_window()).alias("rn"))
        .orderBy("event_id")
    )


@register(
    "q32_rank_dense_rank",
    "SELECT o_orderkey, CAST(RANK() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS r, "
    "CAST(DENSE_RANK() OVER (ORDER BY o_orderpriority) AS INT) AS dr "
    "FROM orders ORDER BY o_orderkey LIMIT 100",
    doc="RANK / DENSE_RANK over global windows.",
    tags=("window",),
)
def q32(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    wr = Window.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    wd = Window.orderBy("o_orderpriority")
    return (
        o.select(
            "o_orderkey",
            F.rank().over(wr).alias("r"),
            F.dense_rank().over(wd).alias("dr"),
        )
        .orderBy("o_orderkey")
        .limit(100)
    )


@register(
    "q33_lag_lead",
    "SELECT event_id, "
    "LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev, "
    "LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt "
    "FROM events ORDER BY event_id",
    doc="LAG / LEAD offsets.",
    tags=("window",),
)
def q33(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = _user_window()
    return (
        e.select(
            "event_id",
            F.lag("event_type").over(w).alias("prev"),
            F.lead("event_type").over(w).alias("nxt"),
        )
        .orderBy("event_id")
    )


@register(
    "q34_running_sum",
    "SELECT event_id, FLOOR(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)*100 + 0.5)/100 AS rs "
    "FROM events ORDER BY event_id",
    doc="Running sum with ROWS frame (deterministic summation order).",
    tags=("window",),
)
def q34(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = _user_window().rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        e.select("event_id", stable_round(F.sum("value").over(w), 2).alias("rs"))
        .orderBy("event_id")
    )


@register(
    "q35_sliding_rows_frame",
    "SELECT event_id, FLOOR(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id "
    "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)*100 + 0.5)/100 AS ma "
    "FROM events ORDER BY event_id",
    doc="Sliding 3-row moving average.",
    tags=("window",),
)
def q35(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = _user_window().rowsBetween(-2, Window.currentRow)
    return (
        e.select("event_id", stable_round(F.avg("value").over(w), 2).alias("ma"))
        .orderBy("event_id")
    )


@register(
    "q36_first_value_full_frame",
    "SELECT DISTINCT user_id, FIRST_VALUE(event_type) OVER (PARTITION BY user_id "
    "ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS f "
    "FROM events ORDER BY user_id",
    doc="FIRST_VALUE with an explicit full frame, deduplicated per key.",
    tags=("window",),
)
def q36(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = _user_window().rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        e.select("user_id", F.first("event_type").over(w).alias("f"))
        .distinct()
        .orderBy("user_id")
    )


@register(
    "q37_ntile",
    "SELECT CAST(q AS INT) AS q, COUNT(*) AS n FROM "
    "(SELECT NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS q FROM orders) t "
    "GROUP BY q ORDER BY q",
    doc="NTILE quartiles (deterministic: unique orderkey tiebreak).",
    tags=("window",),
)
def q37(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        o.select(F.ntile(4).over(w).alias("q"))
        .groupBy("q")
        .agg(F.count("*").alias("n"))
        .orderBy("q")
    )

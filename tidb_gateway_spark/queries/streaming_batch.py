"""Q56–Q59: streaming operators, batch-equivalent declared forms.

The Structured Streaming implementations live in
``tidb_gateway_spark/streaming/jobs.py``; a bounded replay of the events
fixture must converge to exactly these batch answers
(tests/test_streaming.py asserts that).  The declared checks here are the
cross-engine-verifiable batch formulations (SURVEY.md §2B).

Gap/window arithmetic uses exact epoch-microsecond integers on both
engines (Spark ``ts_us`` long ↔ DuckDB ``epoch_us(ts)``) so second-
truncation can never disagree at bucket/gap boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tidb_gateway_spark.catalog import load_table
from tidb_gateway_spark.queries.registry import register


@register(
    "q56_tumbling_window",
    "SELECT CAST(FLOOR(epoch_us(ts)/300000000) AS BIGINT) AS w, COUNT(*) AS n "
    "FROM events GROUP BY 1 ORDER BY w",
    doc="Tumbling 5-minute window count — batch form of "
        "groupBy(window(ts,'5 minutes')); streaming twin in streaming/jobs.py.",
    tags=("streaming",),
)
def q56(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = F.floor(F.col("ts_us") / 300_000_000).cast("bigint").alias("w")
    return e.groupBy(w).agg(F.count("*").alias("n")).orderBy("w")


@register(
    "q57_sliding_window",
    "WITH t AS (SELECT CAST(FLOOR(epoch_us(ts)/300000000) AS BIGINT) AS w, COUNT(*) AS n "
    "FROM events GROUP BY 1) "
    "SELECT cur.w AS w, cur.n + COALESCE(prev.n, 0) AS n10 "
    "FROM t cur LEFT JOIN t prev ON prev.w = cur.w - 1 ORDER BY w",
    doc="Sliding 10-minute window with 5-minute slide, expressed as two "
        "phase-shifted tumbling buckets (batch form of "
        "window(ts,'10 minutes','5 minutes')).  The previous bucket comes "
        "from a self equi-join on w-1, not LAG over a global window: the "
        "join is shuffle-parallel (and exact — an empty predecessor bucket "
        "contributes 0, where LAG would skip to the last non-empty one), "
        "whereas Window.orderBy with no partition key funnels every bucket "
        "of the time range through one partition.",
    tags=("streaming",),
)
def q57(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = F.floor(F.col("ts_us") / 300_000_000).cast("bigint").alias("w")
    t = e.groupBy(w).agg(F.count("*").alias("n"))
    cur, prev = t.alias("cur"), t.alias("prev")
    return (
        cur.join(prev, F.col("prev.w") == F.col("cur.w") - 1, "left")
        .select(
            F.col("cur.w").alias("w"),
            (F.col("cur.n") + F.coalesce(F.col("prev.n"), F.lit(0))).alias("n10"),
        )
        .orderBy("w")
    )


@register(
    "q58_session_window",
    "SELECT user_id, CAST(COUNT(DISTINCT sid) AS BIGINT) AS sessions FROM ("
    "  SELECT user_id, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sid"
    "  FROM ("
    "    SELECT user_id, ts, event_id,"
    "      CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL"
    "           OR epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000"
    "      THEN 1 ELSE 0 END AS new_s"
    "    FROM events) a) b "
    "GROUP BY user_id ORDER BY user_id",
    doc="Session windows (30-minute gap) via gaps-and-islands — batch form "
        "of session_window(ts,'30 minutes'); one shuffle by user_id.",
    tags=("streaming",),
)
def q58(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.col("ts_us") - F.lag("ts_us").over(w)
    new_s = F.when(gap_us.isNull() | (gap_us > 1_800_000_000), 1).otherwise(0)
    sid = F.sum(new_s).over(
        Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
    )
    return (
        e.select("user_id", sid.alias("sid"))
        .groupBy("user_id")
        .agg(F.countDistinct("sid").alias("sessions"))
        .orderBy("user_id")
    )


@register(
    "q59_stateful_dedup",
    "SELECT COUNT(*) AS n FROM (SELECT DISTINCT user_id, event_type FROM events) t",
    doc="Stateful stream dedup (dropDuplicates on key) — batch form is "
        "COUNT(DISTINCT key); streaming twin keeps keys in state store.",
    tags=("streaming", "dedup"),
)
def q59(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.select("user_id", "event_type")
        .distinct()
        .agg(F.count("*").alias("n"))
    )

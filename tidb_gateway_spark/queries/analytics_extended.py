"""Q86–Q89: additional analytics operator shapes (latest-per-key dedup,
funnel conversion, grouped top-k, vector centroids) — each a reusable
pattern a training-data/analytics platform runs daily, declared with
full DuckDB oracles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tidb_gateway_spark.catalog import load_table
from tidb_gateway_spark.functions import stable_round
from tidb_gateway_spark.queries.registry import register


@register(
    "q86_latest_event_per_user",
    "SELECT user_id, event_id AS last_event, event_type AS last_type FROM ("
    "SELECT user_id, event_id, event_type, ROW_NUMBER() OVER "
    "(PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn FROM events) t "
    "WHERE rn = 1 ORDER BY user_id",
    doc="Keep-latest-per-key dedup (the CDC/compaction shape). Declared "
        "plan: max(struct(ts, event_id, event_type)) per user — the "
        "aggregate form of latest-per-key.  Same answer as the oracle's "
        "rn=1 window ((ts,event_id) unique per user), but it partial-"
        "aggregates map-side: the shuffle carries one struct per "
        "(partition × user) instead of every event row sorted within "
        "its partition.  At 100 TB compaction volume this is the "
        "difference between shuffling the keyspace and shuffling the "
        "full event stream.",
    tags=("dedup", "window"),
)
def q86(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .agg(F.max(F.struct("ts", "event_id", "event_type")).alias("s"))
        .select(
            "user_id",
            F.col("s.event_id").alias("last_event"),
            F.col("s.event_type").alias("last_type"),
        )
        .orderBy("user_id")
    )


@register(
    "q87_funnel_conversion",
    "WITH s AS (SELECT user_id, MIN(ts) AS t0 FROM events "
    "WHERE event_type = 'signup' GROUP BY user_id), "
    "conv AS (SELECT s.user_id, "
    "MAX(CASE WHEN e.event_type = 'purchase' "
    "AND epoch_us(e.ts) - epoch_us(s.t0) BETWEEN 0 AND 1800000000 "
    "THEN 1 ELSE 0 END) AS converted "
    "FROM s JOIN events e ON e.user_id = s.user_id GROUP BY s.user_id) "
    "SELECT CAST(SUM(converted) AS BIGINT) AS conversions, COUNT(*) AS signups "
    "FROM conv",
    doc="Funnel: users converting signup→purchase within 30 minutes. "
        "Join + conditional agg; exact epoch-micros bounds cross-engine.",
    tags=("analytics", "join"),
)
def q87(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t0_us"))
    )
    joined = s.join(e.select("user_id", "event_type", "ts_us"), "user_id")
    converted = F.max(
        F.when(
            (F.col("event_type") == "purchase")
            & (F.col("ts_us") - F.col("t0_us")).between(0, 1_800_000_000),
            1,
        ).otherwise(0)
    )
    conv = joined.groupBy("user_id").agg(converted.alias("converted"))
    return conv.agg(
        F.sum("converted").alias("conversions"), F.count("*").alias("signups")
    )


@register(
    "q88_topk_per_group",
    "SELECT p_brand, p_partkey, p_retailprice FROM ("
    "SELECT p_brand, p_partkey, p_retailprice, ROW_NUMBER() OVER "
    "(PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn FROM part) t "
    "WHERE rn <= 3 ORDER BY p_brand, p_retailprice DESC, p_partkey",
    doc="Top-k per group (k=3 priciest parts per brand): per-key window, "
        "never a global sort; the grouped analog of TakeOrdered.",
    tags=("analytics", "window"),
)
def q88(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        p.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice")
        .orderBy("p_brand", F.desc("p_retailprice"), "p_partkey")
    )


@register(
    "q89_embedding_centroids",
    # element-wise mean per label via unnest-with-position, then scalar
    # projections of the centroid (full-array compare would be
    # representation-fragile across engines)
    "WITH ex AS (SELECT label, generate_subscripts(embedding, 1) AS pos, "
    "UNNEST(CAST(embedding AS DOUBLE[])) AS v FROM embeddings), "
    "cent AS (SELECT label, pos, AVG(v) AS c FROM ex GROUP BY label, pos) "
    "SELECT label, COUNT(*) AS dim, "
    "FLOOR(MAX(CASE WHEN pos = 1 THEN c END)*1000000 + 0.5)/1000000 AS c0, "
    "FLOOR(SQRT(SUM(c*c))*1000000 + 0.5)/1000000 AS cnorm "
    "FROM cent GROUP BY label ORDER BY label",
    doc="Vector aggregate: per-label embedding centroid via "
        "posexplode → (label, pos) mean — the distributed form of "
        "element-wise array mean (no array-sized state in any single "
        "aggregator). Projects centroid[0] and ||centroid||.",
    tags=("similarity", "llm", "agg"),
)
def q89(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    ex = e.select(
        "label", F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "v")
    )
    cent = ex.groupBy("label", "pos").agg(F.avg("v").alias("c"))
    return (
        cent.groupBy("label")
        .agg(
            F.count("*").alias("dim"),
            stable_round(F.max(F.when(F.col("pos") == 0, F.col("c"))), 6).alias("c0"),
            stable_round(F.sqrt(F.sum(F.col("c") * F.col("c"))), 6).alias("cnorm"),
        )
        .orderBy("label")
    )

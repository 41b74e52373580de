"""Q38–Q45: sorts / limits / top-k / set operations (SURVEY.md §2B).

Scale notes: orderBy+limit compiles to TakeOrderedAndProject — each
partition keeps only k rows, the driver merges k·p rows, no global sort.
Full ORDER BY uses range-partitioned sort (sampled boundaries), which is
the scalable global sort.  Set ops are aggregates/joins under the hood:
UNION-distinct and INTERSECT shuffle once on the full row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tidb_gateway_spark.catalog import load_table
from tidb_gateway_spark.queries.registry import register, sql_query


@register(
    "q38_multikey_sort",
    "SELECT o_orderkey FROM orders ORDER BY o_orderpriority ASC, "
    "o_totalprice DESC, o_orderkey LIMIT 200",
    doc="Multi-key mixed-direction sort with limit (TakeOrderedAndProject).",
    tags=("sort",),
)
def q38(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.asc("o_orderpriority"), F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey")
        .limit(200)
    )


@register(
    "q39_topk",
    "SELECT l_orderkey, l_linenumber FROM lineitem "
    "ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 25",
    doc="Top-k: per-partition heaps, driver merge — never a full sort.",
    tags=("sort",),
)
def q39(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.orderBy(F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber"))
        .select("l_orderkey", "l_linenumber")
        .limit(25)
    )


# OFFSET: shared SQL text on both engines.
sql_query(
    "q40_limit_offset",
    "SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 10 OFFSET 20",
    doc="LIMIT with OFFSET (Spark ≥3.4 GlobalLimit with offset).",
    tags=("sort",),
)


@register(
    "q41_union_all",
    "SELECT k, COUNT(*) AS n FROM "
    "(SELECT c_nationkey AS k FROM customer UNION ALL SELECT s_nationkey FROM supplier) t "
    "GROUP BY k ORDER BY k",
    doc="UNION ALL (no dedup — pure concatenation of partitions).",
    tags=("set",),
)
def q41(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.unionAll(s).groupBy("k").agg(F.count("*").alias("n")).orderBy("k")


@register(
    "q42_union_distinct",
    "SELECT c_nationkey AS k FROM customer UNION SELECT s_nationkey FROM supplier ORDER BY k",
    doc="UNION distinct = union-all + aggregate on full row.",
    tags=("set",),
)
def q42(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.union(s).distinct().orderBy("k")


@register(
    "q43_intersect",
    "SELECT c_nationkey AS k FROM customer INTERSECT SELECT s_nationkey FROM supplier ORDER BY k",
    doc="INTERSECT (distinct semantics, left-semi join under the hood).",
    tags=("set",),
)
def q43(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.intersect(s).orderBy("k")


@register(
    "q44_except",
    "SELECT c_nationkey AS k FROM customer EXCEPT SELECT s_nationkey FROM supplier ORDER BY k",
    doc="EXCEPT (distinct semantics, left-anti join under the hood).",
    tags=("set",),
)
def q44(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.subtract(s).orderBy("k")


@register(
    "q45_distinct",
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem "
    "ORDER BY l_returnflag, l_linestatus",
    doc="DISTINCT = groupBy all columns (partial dedup before shuffle).",
    tags=("set",),
)
def q45(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct().orderBy(
        "l_returnflag", "l_linestatus"
    )


@register(
    "q148_union_by_name_missing_cols",
    "SELECT event_type, COUNT(*) AS n, "
    "CAST(COUNT(value) AS BIGINT) AS with_value, "
    "CAST(COUNT(user_id) AS BIGINT) AS with_user "
    "FROM ("
    "SELECT event_type, value, NULL::BIGINT AS user_id FROM events "
    "WHERE event_id % 2 = 0 "
    "UNION ALL BY NAME "
    "SELECT user_id, event_type, NULL::DOUBLE AS value FROM events "
    "WHERE event_id % 2 = 1"
    ") GROUP BY event_type ORDER BY event_type",
    doc="Schema-evolution union (unionByName with "
        "allowMissingColumns=True): two projections with different "
        "column sets and ORDERS union by NAME, absent columns "
        "null-filled — the batch form of reading mixed-schema-version "
        "data, which positional UNION silently corrupts. The COUNT(col) "
        "split proves the null-fill landed on the right sides.",
    tags=("set", "schema"),
)
def q148(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    a = e.filter(F.col("event_id") % 2 == 0).select("event_type", "value")
    b = e.filter(F.col("event_id") % 2 == 1).select("user_id", "event_type")
    u = a.unionByName(b, allowMissingColumns=True)
    return (
        u.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.count("value").alias("with_value"),
            F.count("user_id").alias("with_user"),
        )
        .orderBy("event_type")
    )


@register(
    "q176_multiset_set_ops",
    "WITH a AS (SELECT l_returnflag AS f FROM lineitem "
    "WHERE l_quantity > 25), "
    "b AS (SELECT l_returnflag AS f FROM lineitem "
    "WHERE l_discount > 0.05), "
    "ea AS (SELECT f FROM a EXCEPT ALL SELECT f FROM b), "
    "ia AS (SELECT f FROM a INTERSECT ALL SELECT f FROM b) "
    "SELECT x.f, CAST(COALESCE(e.n, 0) AS BIGINT) AS except_all_n, "
    "CAST(COALESCE(i.n, 0) AS BIGINT) AS intersect_all_n FROM "
    "(SELECT DISTINCT f FROM a) x "
    "LEFT JOIN (SELECT f, COUNT(*) AS n FROM ea GROUP BY f) e "
    "ON e.f = x.f "
    "LEFT JOIN (SELECT f, COUNT(*) AS n FROM ia GROUP BY f) i "
    "ON i.f = x.f ORDER BY x.f",
    doc="Multiset set operations (EXCEPT ALL / INTERSECT ALL — "
        "DataFrame.exceptAll/intersectAll): bag semantics keep "
        "MULTIPLICITY (max(m−n,0) and min(m,n) copies per value) where "
        "q43/q44's DISTINCT forms collapse to membership — the "
        "difference matters whenever rows are observations, not keys. "
        "Catalyst plans both as counted aggregates + generate "
        "(replicate), so the shuffle carries one (value, count) row "
        "per distinct value — never the bags themselves.",
    tags=("set", "multiset"),
)
def q176(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") > 25).select(
        F.col("l_returnflag").alias("f"))
    b = li.filter(F.col("l_discount") > 0.05).select(
        F.col("l_returnflag").alias("f"))
    ea = a.exceptAll(b).groupBy("f").agg(
        F.count("*").alias("except_all_n"))
    ia = a.intersectAll(b).groupBy("f").agg(
        F.count("*").alias("intersect_all_n"))
    x = a.select("f").distinct()
    return (
        x.join(ea, "f", "left").join(ia, "f", "left")
        .select(
            "f",
            F.coalesce("except_all_n", F.lit(0)).alias("except_all_n"),
            F.coalesce("intersect_all_n", F.lit(0))
            .alias("intersect_all_n"),
        )
        .orderBy("f")
    )

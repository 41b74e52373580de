"""Q01–Q09: scans, projection, filters, predicates (SURVEY.md §2B).

The reference relays these opaquely to its MySQL-5.7 backend
(/root/reference/gateway/relay.go:12-99); here each is a declarative
DataFrame plan so Catalyst pushes filters and prunes columns into the
parquet scan (verified by tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tidb_gateway_spark.catalog import load_table
from tidb_gateway_spark.functions import stable_round
from tidb_gateway_spark.queries.registry import register


@register(
    "q01_parquet_scan_count",
    "SELECT COUNT(*) AS n FROM lineitem",
    doc="Parquet table scan + count-star (metadata-only at scale: parquet "
        "row-group counts satisfy it without reading data pages).",
    tags=("scan",),
)
def q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem").agg(F.count("*").alias("n"))


@register(
    "q02_full_scan_project_all",
    "SELECT * FROM region ORDER BY r_regionkey",
    doc="Full scan, all columns, ordered.",
    tags=("scan",),
)
def q02(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "region").orderBy("r_regionkey")


@register(
    "q03_projection_arithmetic",
    "SELECT l_orderkey, l_linenumber, "
    "FLOOR(l_extendedprice * (1 - l_discount) * (1 + l_tax)*100 + 0.5)/100 AS chg "
    "FROM lineitem ORDER BY l_orderkey, l_linenumber",
    doc="Projection with arithmetic expression (whole-stage codegen path).",
    tags=("projection",),
)
def q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    chg = stable_round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")), 2
    ).alias("chg")
    return li.select("l_orderkey", "l_linenumber", chg).orderBy("l_orderkey", "l_linenumber")


@register(
    "q04_filter_and_or",
    "SELECT COUNT(*) AS n FROM lineitem "
    "WHERE l_discount >= 0.05 AND l_quantity < 25 OR l_returnflag = 'R'",
    doc="Comparison filter with AND/OR precedence; predicate pushed to scan.",
    tags=("filter",),
)
def q04(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cond = ((F.col("l_discount") >= 0.05) & (F.col("l_quantity") < 25)) | (
        F.col("l_returnflag") == "R"
    )
    return li.filter(cond).agg(F.count("*").alias("n"))


@register(
    "q05_filter_between_in",
    "SELECT COUNT(*) AS n FROM orders "
    "WHERE o_totalprice BETWEEN 50000 AND 150000 "
    "AND o_orderpriority IN ('1-URGENT','2-HIGH')",
    doc="BETWEEN + IN-list filters.",
    tags=("filter",),
)
def q05(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(
            F.col("o_totalprice").between(50000, 150000)
            & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        ).agg(F.count("*").alias("n"))
    )


@register(
    "q06_filter_like",
    "SELECT COUNT(*) AS n FROM part WHERE p_name LIKE '%gre%'",
    doc="LIKE pattern filter (StartsWith/Contains pushdown when anchored).",
    tags=("filter",),
)
def q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%gre%"))
        .agg(F.count("*").alias("n"))
    )


@register(
    "q07_null_handling",
    "SELECT COUNT(*) AS n, "
    "COUNT(COALESCE(NULLIF(o_orderstatus,'O'), NULL)) AS nn FROM orders",
    doc="IS NULL / COALESCE / NULLIF semantics; COUNT skips NULLs.",
    tags=("filter",),
)
def q07(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.count("*").alias("n"),
        F.count(F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit(None))).alias("nn"),
    )


@register(
    "q08_case_when",
    "SELECT o_orderpriority, "
    "CAST(SUM(CASE WHEN o_totalprice > 100000 THEN 1 ELSE 0 END) AS BIGINT) AS big "
    "FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority",
    doc="CASE WHEN inside aggregate (conditional aggregation).",
    tags=("filter", "agg"),
)
def q08(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    big = F.sum(F.when(F.col("o_totalprice") > 100000, 1).otherwise(0)).alias("big")
    return o.groupBy("o_orderpriority").agg(big).orderBy("o_orderpriority")


@register(
    "q09_cast_groupby",
    "SELECT CAST(l_quantity AS INT) AS q, COUNT(*) AS c FROM lineitem "
    "GROUP BY CAST(l_quantity AS INT) ORDER BY q",
    doc="CAST in grouping key (fixture l_quantity is integral-valued, so "
        "Spark truncate-cast and DuckDB round-cast agree).",
    tags=("filter",),
)
def q09(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.col("l_quantity").cast("int").alias("q"))
        .agg(F.count("*").alias("c"))
        .orderBy("q")
    )

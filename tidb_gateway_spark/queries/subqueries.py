"""Q67–Q71: subqueries, CTEs, inline tables (SURVEY.md §2B).

These exercise Catalyst's subquery machinery (scalar-subquery broadcast,
IN→left-semi rewrite, decorrelation) — expressed as SQL shared verbatim
with the DuckDB oracle where dialects agree.
"""

from __future__ import annotations

from tidb_gateway_spark.queries.registry import register, sql_query

sql_query(
    "q67_uncorrelated_scalar_subquery",
    "SELECT COUNT(*) AS n FROM orders "
    "WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)",
    doc="Uncorrelated scalar subquery — executed once, broadcast into the "
        "filter; two scans of orders, no join.",
    tags=("subquery",),
)

# q68 (correlated scalar subquery) is covered by q20_asof_join, which the
# oracle runs in exactly that form; Catalyst decorrelates it to a window.

sql_query(
    "q69_in_subquery",
    "SELECT COUNT(*) AS n FROM customer WHERE c_nationkey IN "
    "(SELECT n_nationkey FROM nation WHERE n_regionkey = 0)",
    doc="IN subquery → left-semi join (broadcast: nation is tiny).",
    tags=("subquery",),
)

sql_query(
    "q70_cte",
    "WITH big AS (SELECT o_custkey, SUM(o_totalprice) AS s FROM orders GROUP BY o_custkey) "
    "SELECT COUNT(*) AS n FROM big WHERE s > 200000",
    doc="CTE / derived table.",
    tags=("subquery",),
)

sql_query(
    "q71_values_inline",
    "SELECT * FROM (VALUES (1,'a'),(2,'b')) AS t(id, v) ORDER BY id",
    doc="VALUES inline table (LocalRelation — no scan).",
    tags=("subquery",),
)

_MONTH_IDX = (
    "CAST(EXTRACT(YEAR FROM o_orderdate) * 12 "
    "+ EXTRACT(MONTH FROM o_orderdate) AS INT)"
)

_Q117_SQL = (
    "WITH RECURSIVE "
    f"b AS (SELECT MIN({_MONTH_IDX}) AS mi, MAX({_MONTH_IDX}) AS ma FROM orders), "
    "series(v) AS (SELECT mi FROM b UNION ALL "
    "SELECT v + 1 FROM series JOIN b ON v < ma), "
    f"per AS (SELECT {_MONTH_IDX} AS v, COUNT(*) AS c FROM orders GROUP BY 1) "
    # CAST(double AS INT) truncates in Spark but ROUNDS in DuckDB —
    # FLOOR before the cast is the portable integer division.
    "SELECT v, CAST(FLOOR((v - 1) / 12.0) AS INT) AS yr, "
    "CAST(v - FLOOR((v - 1) / 12.0) * 12 AS INT) AS mo, "
    "COALESCE(c, 0) AS n "
    "FROM series LEFT JOIN per USING (v) ORDER BY v"
)


@register(
    "q117_recursive_cte_month_series",
    _Q117_SQL,
    doc="Gap-free month series over the order-date range, left-joined "
        "to per-month counts ('months with zero orders included'). "
        "The ORACLE is the WITH RECURSIVE form (Spark 4 runs the same "
        "text — capability proven by tests/test_operators.py::"
        "test_with_recursive_matches_sequence); the DECLARED Spark "
        "form generates the series with sequence()+explode in ONE job "
        "— the recursive execution materializes one micro-batch job "
        "per month step (~84 jobs, 13 s measured at sf0.1, "
        "data-independent), which is the wrong plan at ANY scale when "
        "the recursion is a mere integer generator.",
    tags=("subquery", "recursive"),
)
def q117(spark, sf_dir):
    from pyspark.sql import functions as F

    from tidb_gateway_spark.catalog import load_table

    o = load_table(spark, sf_dir, "orders")
    mi = (F.year("o_orderdate") * 12 + F.month("o_orderdate")).cast("int")
    b = o.agg(F.min(mi).alias("mi"), F.max(mi).alias("ma"))
    series = b.select(
        F.explode(F.sequence("mi", "ma")).alias("v"))
    per = o.groupBy(mi.alias("v")).agg(F.count("*").alias("c"))
    yr = F.floor((F.col("v") - 1) / 12.0).cast("int")
    return (
        series.join(per, "v", "left")
        .select(
            "v", yr.alias("yr"),
            (F.col("v") - yr.cast("bigint") * 12).cast("int").alias("mo"),
            F.coalesce("c", F.lit(0)).alias("n"),
        )
        .orderBy("v")
    )


sql_query(
    "q119_lateral_topn_per_key",
    # comma-LATERAL is the form BOTH parsers accept (DuckDB's JOIN
    # LATERAL requires an ON clause; Spark's does not)
    "SELECT c.c_custkey, o.o_orderkey, o.o_totalprice "
    "FROM customer c, LATERAL ("
    "SELECT o_orderkey, o_totalprice FROM orders "
    "WHERE o_custkey = c.c_custkey "
    "ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o "
    "WHERE c.c_custkey < 50 ORDER BY c_custkey, o_orderkey",
    doc="LATERAL join (correlated table subquery with per-row ORDER BY "
        "LIMIT): each customer's two priciest orders — the top-N-per-"
        "key idiom in its SQL-standard form. Dialect-shared text; "
        "Catalyst decorrelates the lateral into a ranked window join "
        "rather than executing per-row (the q88 DataFrame form is the "
        "same physical plan, written by hand).",
    tags=("subquery", "lateral", "join"),
)

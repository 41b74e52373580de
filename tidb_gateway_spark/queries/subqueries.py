"""Q67–Q71: subqueries, CTEs, inline tables (SURVEY.md §2B).

These exercise Catalyst's subquery machinery (scalar-subquery broadcast,
IN→left-semi rewrite, decorrelation) — expressed as SQL shared verbatim
with the DuckDB oracle where dialects agree.
"""

from __future__ import annotations

from tidb_gateway_spark.queries.registry import sql_query

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

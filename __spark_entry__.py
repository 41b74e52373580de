"""Driver contract for the spark-graft builder (PySpark target).

Delegates to :mod:`tidb_gateway_spark.queries` — the declared-query
registry implementing SURVEY.md §2B (Q01–Q71) plus the extended
LLM-pipeline operators.  Each registry entry pairs a Spark
DataFrame/SQL implementation with a DuckDB oracle SQL string whose
column names/types match the Spark output.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape, q22) on /root/testdata/sf0.001."""
    from tidb_gateway_spark.queries import REGISTRY
    from tidb_gateway_spark.session import ensure_session_confs

    ensure_session_confs(spark)
    return REGISTRY["q22_tpch_q1_agg"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from tidb_gateway_spark.queries import REGISTRY

    return {qid: spec.spark for qid, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible registry entry."""
    from tidb_gateway_spark.queries import REGISTRY

    return {qid: spec.oracle for qid, spec in REGISTRY.items() if spec.oracle}

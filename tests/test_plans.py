"""Plan-quality tests: the properties that matter at 100 TB, asserted on
the physical plans of the declared queries (brief: '.explain the plan
and iterate until it's the plan you'd want')."""

from __future__ import annotations

from pyspark.sql import functions as F

from tidb_gateway_spark.catalog import load_table
from tidb_gateway_spark.plans import inspect
from tidb_gateway_spark.queries import REGISTRY


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    df = li.filter(F.col("l_quantity") > 45).select("l_partkey")
    pf = inspect.pushed_filters(df)
    assert any("l_quantity" in f for f in pf), pf


def test_column_pruning(spark, sf_dir):
    """A 2-column projection must not read all 11 lineitem columns."""
    df = REGISTRY["q39_topk"].spark(spark, sf_dir)
    schemas = inspect.read_schema_columns(df)
    assert schemas, "no parquet scan found"
    for cols in schemas:
        assert len(cols) <= 3, f"scan reads too many columns: {cols}"


def test_date_filter_pushdown_q22(spark, sf_dir):
    df = REGISTRY["q22_tpch_q1_agg"].spark(spark, sf_dir)
    schemas = inspect.read_schema_columns(df)
    # 6 needed columns of 11 — pruning evidence for the flagship query
    assert all(len(cols) <= 6 for cols in schemas), schemas


def test_dimension_join_broadcasts(spark, sf_dir):
    df = REGISTRY["q11_multiway_join"].spark(spark, sf_dir)
    assert inspect.has_broadcast_join(df)


def test_semi_join_stays_semi(spark, sf_dir):
    df = REGISTRY["q15_left_semi_join"].spark(spark, sf_dir)
    assert "LeftSemi" in inspect.explain_formatted(df)


def test_theta_join_is_hash_not_nested_loop(spark, sf_dir):
    """q18 has an equi component — must plan as a hash join (broadcast or
    sort-merge), never BroadcastNestedLoop."""
    df = REGISTRY["q18_theta_join"].spark(spark, sf_dir)
    text = inspect.explain_formatted(df)
    assert "NestedLoop" not in text, text


def test_flagship_agg_has_codegen_and_partial_agg(spark, sf_dir):
    df = REGISTRY["q22_tpch_q1_agg"].spark(spark, sf_dir)
    assert inspect.has_whole_stage_codegen(df)
    text = inspect.explain_formatted(df)
    assert text.count("HashAggregate") >= 2, "expected partial+final aggregation"


def test_topk_never_global_sorts(spark, sf_dir):
    df = REGISTRY["q39_topk"].spark(spark, sf_dir)
    assert "TakeOrderedAndProject" in inspect.explain_formatted(df)


def test_no_rowudf_in_declared_plans(spark, sf_dir):
    """Declared queries must stay JVM-side: no row-at-a-time Python
    UDFs in any plan (q81's ArrowEvalPython/mapInPandas is the only
    sanctioned Python stage)."""
    for qid, spec in REGISTRY.items():
        df = spec.spark(spark, sf_dir)
        text = inspect.explain_formatted(df)
        assert "BatchEvalPython" not in text, f"{qid} uses a row Python UDF"

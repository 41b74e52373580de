"""Round-15 additions: direct unit coverage for operators the r14
ADVICE flagged — local_rows_df (the shared driver-rows-as-JVM-plan
operator on the output path of 7+ registered queries, previously only
exercised through query-level oracle diffs) and the null-safe
grouped-weighted-percentile join path (tested in test_operators.py)."""

from __future__ import annotations

import pytest

from tidb_gateway_spark.operators.localrel import (
    _LITERAL_ROW_CAP,
    local_rows_df,
)

_CASES = [
    # (rows, schema) — literal path (<= cap), pandas/Arrow path (> cap),
    # None values on both paths, the cap boundary itself, empty rows,
    # and mixed types matching the real callers (union-find labels,
    # rate tables, expectation tables).
    ("two_rows_literal",
     [(1, 10), (2, 20)], "doc_id bigint, cluster_id bigint"),
    ("none_values_literal",
     [(1, None), (None, 2.5)], "digit int, exp_pct double"),
    ("cap_boundary_literal",
     [(i, i * 2) for i in range(_LITERAL_ROW_CAP)],
     "doc_id bigint, cluster_id bigint"),
    ("cap_plus_one_pandas",
     [(i, i * 2) for i in range(_LITERAL_ROW_CAP + 1)],
     "doc_id bigint, cluster_id bigint"),
    ("none_values_pandas",
     [(i, None if i % 3 == 0 else float(i))
      for i in range(_LITERAL_ROW_CAP + 5)],
     "k int, v double"),
    ("strings_and_bools",
     [("a", True), ("b", None), (None, False)],
     "name string, flag boolean"),
    ("empty", [], "doc_id bigint, cluster_id bigint"),
]


@pytest.mark.parametrize(
    "rows,schema", [c[1:] for c in _CASES], ids=[c[0] for c in _CASES])
def test_local_rows_df_matches_create_dataframe(spark, rows, schema):
    """The oracle-hash contract: local_rows_df must match
    spark.createDataFrame bit for bit — same schema (names, types,
    nullability-insensitive compare via simpleString), same rows —
    on the literal path, the pandas/Arrow path, the cap boundary,
    None values, and empty input."""
    got = local_rows_df(spark, rows, schema)
    ref = spark.createDataFrame(rows, schema)
    assert got.schema.simpleString() == ref.schema.simpleString()
    key = got.columns
    assert (
        sorted(got.collect(), key=lambda r: tuple(
            (v is None, v) for v in [r[c] for c in key]))
        == sorted(ref.collect(), key=lambda r: tuple(
            (v is None, v) for v in [r[c] for c in key]))
    )


def test_local_rows_df_literal_path_has_no_python_relation(spark):
    """<= cap rows must plan as a pure-JVM literal subtree: no
    ExistingRDD (applySchemaToPythonRDD) in the executed plan — the
    r14 optimization this operator exists for."""
    from tidb_gateway_spark.plans import inspect

    df = local_rows_df(
        spark, [(1, 2), (3, 4)], "a bigint, b bigint")
    assert "ExistingRDD" not in inspect.explain_formatted(df)

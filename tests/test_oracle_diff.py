"""Differential oracle test: every SQL-expressible declared query runs on
Spark and on DuckDB and must produce identical canonical results
(SURVEY.md §5.2 item 1 — the primary correctness gate)."""

from __future__ import annotations

import pytest

from tidb_gateway_spark.queries import REGISTRY

from tests.oracle_diff import diff_report

QIDS = sorted(REGISTRY)


@pytest.mark.parametrize("qid", QIDS)
def test_query_matches_oracle(spark, ddb, sf_dir, qid):
    spec = REGISTRY[qid]
    sdf = spec.spark(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    assert len(spark_pdf) >= 0  # smoke: executes
    if spec.oracle is None:
        assert spark_pdf is not None
        return
    ddb_pdf = ddb.execute(spec.oracle).fetchdf()
    problems = diff_report(spark_pdf, ddb_pdf, qid)
    assert not problems, "\n".join(problems)

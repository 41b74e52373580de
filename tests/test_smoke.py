"""Fixture-drift smoke tests.

The round-4 incident: the driver regenerated the test parquet with
``events.ts`` stored as timestamp[us] instead of TIMESTAMP(NANOS), and a
loader that assumed the old shape silently broke 21/100 registry
queries, the gateway, streaming and bench in one stroke.  These tests
fail loudly the day the fixtures change shape again:

* every fixture table (and shredded companion) must load and expose a
  readable schema;
* every registry query must pass Spark analysis (schema resolution) on
  the current fixtures — analysis is cheap (no execution) and catches
  dtype-mismatch class breakage across the whole surface in one pass.

Run just these with ``pytest -k smoke``.
"""

from __future__ import annotations

import pytest

from tidb_gateway_spark.catalog import SHREDDED_JSON, SHREDDED_SUFFIX, TABLES, load_table


@pytest.mark.parametrize("table", TABLES)
def test_smoke_load_table(spark, sf_dir, table):
    df = load_table(spark, sf_dir, table)
    assert df.schema.fields  # analysis-time schema resolves
    if table == "events":
        names = set(df.columns)
        # engine convention regardless of parquet storage micro-format
        assert {"ts", "ts_us"} <= names
        assert df.schema["ts"].dataType.typeName() == "timestamp"
        assert df.schema["ts_us"].dataType.typeName() == "long"


@pytest.mark.parametrize("table", sorted(SHREDDED_JSON))
def test_smoke_load_shredded(spark, sf_dir, table):
    df = load_table(spark, sf_dir, table + SHREDDED_SUFFIX)
    prefix = SHREDDED_JSON[table]["prefix"]
    assert any(c.startswith(prefix) for c in df.columns), df.columns


def test_smoke_all_registry_queries_analyze(spark, sf_dir):
    """Build (not execute) every registry DataFrame: Spark analysis
    resolves every column/type against the current fixture schemas."""
    import __spark_entry__ as entrymod

    failures = {}
    for qid, fn in entrymod.queries().items():
        try:
            fn(spark, sf_dir).schema
        except Exception as exc:  # noqa: BLE001 - collect all, report once
            failures[qid] = str(exc).splitlines()[0][:200]
    assert not failures, f"{len(failures)} queries fail analysis: {failures}"

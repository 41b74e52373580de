"""Round-13 operator tests: q271 IVFADC search (VERDICT r12 directive
8 — the PQ family's composed deployment shape: q94's coarse cells +
q269's integer-exact ADC over residual codes) and the bench contention
sentinel (directive 1).
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from tidb_gateway_spark.queries import REGISTRY


def test_q271_matches_oracle(spark, sf_dir, ddb):
    """Engine rows == DuckDB oracle rows, bit-for-bit (integer ADC)."""
    got = [
        tuple(r)
        for r in REGISTRY["q271_ivfadc_search"].spark(spark, sf_dir).collect()
    ]
    exp = [tuple(map(int, r))
           for r in ddb.execute(REGISTRY["q271_ivfadc_search"].oracle).fetchall()]
    assert got == exp and len(got) == 30  # 10 probes x top-3


def test_q271_serve_plan_pruned_and_jvm_only(spark, sf_dir):
    """The serve path must be partition-pruned JVM codegen: every
    probe's scan reads EXACTLY its nprobe=2 cells (PartitionFilters on
    the materialized index, never a full-corpus scan) and no Python
    stage appears anywhere in the plan — the one Arrow pass is the
    index BUILD, not the query."""
    df = REGISTRY["q271_ivfadc_search"].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    pf = re.findall(r"PartitionFilters: \[cell#\d+ IN \((\d+),(\d+)\)\]", plan)
    assert len(pf) == 10, f"expected 10 pruned probe scans, got {len(pf)}"
    assert "MapInPandas" not in plan and "PythonUDF" not in plan
    # codes-only projection: the pruned scans must not read embeddings
    assert "embedding" not in re.sub(r"Location:.*", "", plan)


def test_q271_adc_is_integer_exact_and_ranked(spark, sf_dir):
    """adc_d2 is an exact int64 (certifies the LUT arithmetic), ranks
    are 1..3 per probe ascending in (adc_d2, nn)."""
    rows = (REGISTRY["q271_ivfadc_search"].spark(spark, sf_dir)
            .orderBy("qid", "rn").collect())
    by_qid: dict[int, list] = {}
    for r in rows:
        assert isinstance(r.adc_d2, int) and r.adc_d2 >= 0
        by_qid.setdefault(r.qid, []).append((r.rn, r.adc_d2, r.nn))
    for qid, rs in by_qid.items():
        assert [x[0] for x in rs] == [1, 2, 3], (qid, rs)
        assert rs == sorted(rs, key=lambda x: (x[1], x[2])), (qid, rs)
        assert all(x[2] != qid for x in rs)  # self excluded


def test_q271_index_stores_codes_partitioned_by_cell(spark, sf_dir):
    """The materialized index is (vec_id, code[8]) partitioned by cell
    — 8 small ints instead of the 64-float vector (the ~64x byte cut
    that makes nprobe/n_cells scans cheap at 100 TB)."""
    from tidb_gateway_spark.operators.similarity import ivfadc_index

    idx = ivfadc_index(spark, f"{sf_dir}/embeddings.parquet")
    assert set(idx.columns) == {"vec_id", "code", "cell"}
    n = idx.count()
    total = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert n == total
    sizes = idx.groupBy(F.size("code").alias("s")).count().collect()
    assert [r.s for r in sizes] == [8]
    cells = sorted(r.cell for r in idx.select("cell").distinct().collect())
    assert cells == list(range(8))


def test_contention_probe_fixed_work():
    """The bench sentinel runs fixed work and returns quickly on an
    idle host; repeated calls reuse the preallocated buffer."""
    import bench

    bench.contention_probe()  # pays allocation
    t = bench.contention_probe()
    assert 0 < t < 2.0  # generous: CI hosts can be contended

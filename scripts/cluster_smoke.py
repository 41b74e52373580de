#!/usr/bin/env python
"""Cluster-mode smoke of the streaming LSM lifecycle (VERDICT r10
directive 8).

local[32] runs every task inside the driver JVM, which can mask
driver-local-filesystem assumptions in the foreachBatch index builds
(q244/q254/q260) and the manifest-switchover serve paths
(q257/q259/q260).  This smoke runs the whole LSM family against a
``local-cluster[2, 4, 4096]`` master — two SEPARATE executor JVM
processes with their own working directories — with the derived-
companion store pointed at a fresh scratch directory so every
companion is rebuilt THROUGH the cluster, then checks:

* q260 (streaming LSM lifecycle: append + in-stream manifest fold)
  returns exactly q220's batch-built answer;
* q244 (streaming inverted index) ditto;
* q254/q257 (streaming IVF + centroid-refresh compaction) return the
  same rows in cluster mode as in local mode (both mapInPandas paths
  run on remote executors);
* q259 (delta compaction) serves the folded base identically.

What stays driver-local BY DESIGN (same as a real deployment where
these would be object-store calls issued by the driver): foreachBatch
bodies run on the driver, so manifest writes/reads and fold
orchestration are driver-side; executors only read/write parquet
under the shared store.  A shared filesystem (here: the local disk
both executor processes and the driver see; in production: S3/HDFS)
is the precondition, exactly as for any Spark output commit.

Usage: python scripts/cluster_smoke.py  (takes ~2-4 min; writes a
PASS/FAIL line per check and exits nonzero on any failure).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scratch = tempfile.mkdtemp(prefix="lsm_cluster_smoke_")
    os.environ["SPARK_GRAFT_DERIVED_DIR"] = os.path.join(scratch, "derived")

    from pyspark.sql import SparkSession

    from tidb_gateway_spark.session import RUNTIME_CONFS

    builder = (
        SparkSession.builder
        # 2 executor processes x 4 cores, 4096 MB each: separate JVMs,
        # separate working dirs — the local-mode masking this smoke
        # exists to remove
        .master("local-cluster[2,4,4096]")
        .appName("lsm-cluster-smoke")
        .config("spark.sql.shuffle.partitions", "8")
        # python stages (mapInPandas) run on the remote executors;
        # module-level helpers pickle by reference, so the repo must be
        # importable there
        .config("spark.executorEnv.PYTHONPATH", repo)
        .config("spark.ui.enabled", "false")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    failures: list[str] = []

    def check(name: str, got, want) -> None:
        ok = got == want
        print(f"{'PASS' if ok else 'FAIL'} {name}: "
              f"{len(got)} rows vs {len(want)} expected")
        if not ok:
            print(f"  got:  {got}\n  want: {want}")
            failures.append(name)

    try:
        import time

        # executor JVMs register asynchronously (~5 s)
        n_exec = 0
        for _ in range(24):
            n_exec = len(spark.sparkContext._jsc.sc().statusTracker()
                         .getExecutorInfos())
            if n_exec >= 3:
                break
            time.sleep(5)
        print(f"executors (incl. driver): {n_exec}")
        assert n_exec >= 3, "local-cluster did not launch 2 executors"

        from tidb_gateway_spark.queries import REGISTRY

        def rows(qid: str):
            return [tuple(r) for r in
                    REGISTRY[qid].spark(spark, SF_DIR).collect()]

        # batch references computed in the SAME cluster session
        q220 = rows("q220_inverted_index_roundtrip")
        check("q244 streaming index == q220 (cluster)",
              rows("q244_streaming_index_maintenance"), q220)
        check("q260 LSM lifecycle == q220 (cluster)",
              rows("q260_streaming_lsm_index_lifecycle"), q220)
        check("q259 compacted serve == q220 (cluster)",
              rows("q259_index_delta_compaction"), q220)
        q254 = rows("q254_streaming_ivf_maintenance")
        q94 = rows("q94_ivf_ann")
        check("q254 streaming IVF == q94 (cluster)", q254, q94)
        q257 = rows("q257_ivf_centroid_refresh")
        print(f"INFO q257 refreshed-index probe returned "
              f"{len(q257)} rows (mapInPandas reassignment ran on "
              f"remote executors)")
        assert len(q257) == 3, q257
        # gate family (r12): the folded gate's sequential admission
        # decisions must survive cluster mode AND equal the flat
        # gate's — both fixtures rebuilt through the two executor JVMs
        q265 = rows("q265_streaming_dedup_gate")
        check("q267 gate LSM fold == q265 flat gate (cluster)",
              rows("q267_streaming_gate_lsm_fold"), q265)
    finally:
        spark.stop()
        shutil.rmtree(scratch, ignore_errors=True)

    if failures:
        print(f"FAILURES: {failures}")
        return 1
    print("FAILURES: none")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""SparkSession construction and per-session configuration.

Two entry points:

* :func:`get_spark` — build a tuned local session (tests / bench own the
  session).
* :func:`ensure_session_confs` — apply the runtime-settable confs this
  engine depends on to an *externally owned* session (the correctness
  driver constructs its own ``SparkSession`` and hands it to
  ``__spark_entry__``; we must not assume anything about its builder
  configs).

Scale notes (100 TB target): the static configs below are the local-mode
projection of cluster settings — shuffle partitions sized to cores here,
but ``spark.sql.shuffle.partitions`` should be ~2–3× total cluster cores
(or left to AQE coalescing) on a real cluster; AQE handles skew joins and
partition coalescing at runtime either way.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Confs that are runtime-settable (plain SQLConf) — safe to apply to a
# session we did not build.  nanosAsLong is retained for *legacy* fixture
# generations that stored events.ts as parquet TIMESTAMP(NANOS) (which
# the vectorized reader otherwise rejects, PARQUET_TYPE_ILLEGAL); current
# fixtures store timestamp[us] and are unaffected by it.  Either shape is
# handled by catalog.normalize_events' dtype dispatch — nothing may
# assume one storage format.
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    # NOTE: spark.sql.adaptive.enabled is NOT in this dict — it is
    # decided per working set (see _adaptive_wanted below).  It lived
    # here through r10, which silently UNDID get_spark's sized
    # decision on the first load_table call (catalog re-applies these
    # confs), so every r10 sweep ran AQE's ~100 ms/query stage
    # barriers against sub-GiB working sets.  Measured at sf0.1 (r11):
    # AQE off is ~30% faster on multi-stage queries.
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # AQE skew-join splitting: mandatory at 100 TB where key skew is the
    # norm (hot users, hot dates); free locally.
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Cost-based optimization: inert until ANALYZE TABLE populates
    # catalog statistics (temp views carry none), then drives join
    # reordering and broadcast decisions — the 100 TB multiway-join
    # answer that AQE's runtime-only view cannot give.
    "spark.sql.cbo.enabled": "true",
    "spark.sql.cbo.joinReorder.enabled": "true",
    # Broadcast-build timeout: the 300 s default assumes an idle
    # cluster; on a contended host (or a busy production cluster) a
    # broadcast build legitimately queues behind other stages and a
    # timeout turns contention into a spurious query failure.  20 min
    # matches the driver-side patience of the rest of the stack.
    "spark.sql.broadcastTimeout": "1200",
    # Trust per-bucket SORTED BY order on scan: despite the "legacy"
    # name this is the only switch that lets a sorted bucketed table
    # serve a sort-merge join with NO per-query Sort, and it is safe —
    # FileSourceScanExec still verifies every bucket is a single file
    # before reporting the ordering (multi-file buckets silently skip
    # the optimization, never corrupt).  write_bucketed_table
    # repartitions onto the bucket hash so its buckets ARE single
    # files; without this conf q205's join re-sorted 18M lineitem rows
    # per query at sf3 (~3× its floor).
    "spark.sql.legacy.bucketedTableScan.outputOrdering": "true",
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


# AQE pays for itself by re-planning *large* stages (skew splits,
# partition coalescing, runtime join demotion); on a sub-GiB working set
# every stage is small and AQE's per-stage materialization barrier is
# pure latency (~100 ms/query measured locally).  Threshold, not toggle:
# a 100 TB deployment always lands on the adaptive side.
AQE_WORKING_SET_THRESHOLD = 1 << 30  # 1 GiB


def _dir_bytes(path: str) -> int:
    total = 0
    try:
        with os.scandir(path) as it:
            for entry in it:
                if entry.is_file():
                    total += entry.stat().st_size
                elif entry.is_dir():
                    total += _dir_bytes(entry.path)
    except OSError:
        return 1 << 40  # unknown → assume big, keep AQE on
    return total


def _adaptive_wanted() -> bool:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    return _dir_bytes(sf_dir) >= AQE_WORKING_SET_THRESHOLD


def ensure_session_confs(spark: SparkSession) -> SparkSession:
    """Apply engine-required runtime confs to an existing session."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Non-settable in this deployment — proceed; reads of ns
            # parquet will raise a clear error if truly unsupported.
            pass
    # AQE follows the working set, the same threshold get_spark uses:
    # re-planning barriers pay for themselves on large stages (skew
    # splits, coalescing) and are pure per-stage latency on sub-GiB
    # inputs.  Applied here too so an externally-owned session (the
    # correctness driver's vanilla builder) gets the same sizing, and
    # so repeated load_table calls cannot flip a sized decision back.
    try:
        spark.conf.set(
            "spark.sql.adaptive.enabled", str(_adaptive_wanted()).lower())
    except Exception:
        pass
    return spark


def get_spark(app_name: str = "tidb-gateway-spark", cpus: int | None = None,
              adaptive: bool | None = None) -> SparkSession:
    """Build a tuned local session (used by tests and bench.py).

    ``adaptive=None`` auto-sizes: AQE on iff the working set
    ($SPARK_GRAFT_SF_DIR) is at least 1 GiB (see AQE_WORKING_SET_THRESHOLD).
    """
    n = cpus or default_parallelism()
    if adaptive is None:
        adaptive = _adaptive_wanted()
    # Shuffle-partition sizing follows the same working-set heuristic:
    # scheduling 32 tasks per stage on a 40 MB working set costs more
    # than it parallelizes (measured 2× on the flagship agg).  Large
    # working sets use full parallelism; on a cluster this is instead
    # ~2-3× total cores with AQE coalescing down.
    shuffle_parts = n if adaptive else max(8, n // 4)
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_parts))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # Full-table results (global ranks, as-of joins) legitimately
        # exceed the 1g default when benched at sf10 — the Arrow
        # collect is the measured materialization, not an accident.
        .config("spark.driver.maxResultSize",
                os.environ.get("SPARK_GRAFT_MAX_RESULT", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    for k in ("spark.sql.adaptive.enabled",):
        builder = builder.config(k, str(adaptive).lower())
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ensure_session_confs(spark)
    # ensure_session_confs re-asserts RUNTIME_CONFS; re-apply the sized
    # adaptive decision on top (runtime-settable).
    spark.conf.set("spark.sql.adaptive.enabled", str(adaptive).lower())
    return spark

#!/usr/bin/env python
"""Benchmark the declared-query suite.

Runs every registry query at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].  The FINAL stdout
line is a short, parse-safe JSON summary:

    {"metric": "declared_query_suite_sec", "value": <total>, "unit":
     "sec", "queries": {<headline subset>}, "sf": 0.1,
     "n_queries": N, "detail_file": "bench_detail.json"}

The complete per-query map is printed on an earlier line and written to
``bench_detail.json`` next to this script — the full 176-query map
exceeds the driver's stdout tail capture, which left `parsed: null` in
five straight BENCH_r*.json files.

Timing = best of $SPARK_GRAFT_BENCH_RUNS (default 2) warm executions per
query, after a JVM/codegen warm-up pass.  The DuckDB oracle twin runs
by DEFAULT (opt out with SPARK_GRAFT_BENCH_DUCKDB=0) so every recorded
sweep carries its own same-process yardstick — engine-only absolutes
across host epochs are uninterpretable.  Spark's cache is cleared
between queries (SPARK_GRAFT_BENCH_CLEARCACHE=0 opts out) so suite
order cannot tax tail queries.

Results are materialized over Arrow (``df.toArrow()`` ↔ DuckDB
``.arrow()``) so both engines pay a comparable column-batch transfer
cost; py4j row-by-row collect() would charge Spark ~7× the query time
for wide results.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# best-of-3: this host shows ±40% run-to-run noise (shared-VM
# neighbors); the minimum of three warm runs is the stable statistic
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
# Long-run guard: a single execution (engine or oracle) that exceeds
# this many seconds is recorded best-of-1 instead of best-of-N —
# run-to-run noise is a sub-second phenomenon, and repeating q197's
# 812 s recursive-CTE DuckDB oracle N× would triple the sweep's cost
# for zero statistical value.  Applies symmetrically to both engines.
LONG_RUN_SEC = float(os.environ.get("SPARK_GRAFT_BENCH_LONGRUN_SEC", "60"))


_PROBE_BUF = None


def contention_probe() -> float:
    """Fixed-work host-contention sentinel (~40 ms on an idle host).

    Runs a single-threaded numpy pass over a preallocated 4 M-element
    float64 buffer — CPU + memory-bandwidth bound, no BLAS thread pool,
    no allocation after first use — so its wall time moves ONLY with
    host load.  Recorded before each query's timed runs, the per-query
    sentinel series lets a sweep artifact self-diagnose contention
    windows (the BENCH_r12 q150/q151/q152 anomaly was indistinguishable
    from a code regression without one — VERDICT r12 directive 1).
    """
    global _PROBE_BUF
    import numpy as np

    if _PROBE_BUF is None:
        _PROBE_BUF = np.arange(4_000_000, dtype=np.float64) * 1e-6
    t0 = time.perf_counter()
    float(np.sqrt(_PROBE_BUF).sum())
    float(np.sqrt(_PROBE_BUF + 1.0).sum())
    return time.perf_counter() - t0


def sf_label(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    from tidb_gateway_spark.queries import REGISTRY
    from tidb_gateway_spark.session import get_spark

    # Focused sweeps while iterating: SPARK_GRAFT_BENCH_ONLY="q94,q101"
    # (comma-separated qid prefixes) restricts the suite; the driver's
    # per-round run leaves it unset and measures everything.
    only = [p for p in os.environ.get(
        "SPARK_GRAFT_BENCH_ONLY", "").replace(" ", "").split(",") if p]
    if only:
        REGISTRY = {q: s for q, s in REGISTRY.items()
                    if any(q.startswith(p) for p in only)}

    spark = get_spark("tidb-gateway-spark-bench")

    # Warm-up: JIT/codegen caches, parquet footer reads, Arrow Python
    # workers (q75's mapInPandas pool would otherwise charge its cold
    # start to the first Python-stage query), and the two-pass rank's
    # one-off boundary job + window JIT (q32 — ranked-query timings
    # measure the warm path by design; BASELINE.md).
    for warm_qid in ("q22_tpch_q1_agg", "q10_inner_equijoin",
                     "q31_row_number", "q75_cosine_nearest_neighbor",
                     "q32_rank_dense_rank", "q32_rank_dense_rank"):
        if warm_qid in REGISTRY:
            REGISTRY[warm_qid].spark(spark, SF_DIR).toArrow()
        elif only:  # subset run: still warm the JVM/Arrow pool once
            next(iter(REGISTRY.values())).spark(spark, SF_DIR).toArrow()
            break

    # Clear Spark's cache (and the tracked_persist LRU) BETWEEN queries
    # (not between the best-of-N runs of one query — those stay warm by
    # design) so one query's leftover cache pressure cannot tax the
    # next: the r8 sweep read q114 at 8.86 s mid-suite vs 1.25 s clean
    # on identical code (BASELINE.md suite-order A/B).  Default ON;
    # SPARK_GRAFT_BENCH_CLEARCACHE=0 reproduces the shared-cache sweep.
    clear_cache = os.environ.get("SPARK_GRAFT_BENCH_CLEARCACHE", "1") != "0"
    from tidb_gateway_spark.operators import cache as opcache

    # Warm column (r10 verdict What's-wrong #4): queries whose
    # mid-pipeline persisted tables never warm under a RUNS=1 cold
    # sweep systematically read worse in-sweep than isolated.  With
    # SPARK_GRAFT_BENCH_WARMCOL=1, any query that registered tracked
    # persists during its timed runs gets ONE extra warm execution
    # recorded in `warm_queries` — beside, never instead of, the cold
    # protocol number.
    warm_col = os.environ.get("SPARK_GRAFT_BENCH_WARMCOL", "0") == "1"

    # Settle gate: the probe revealed (r13 diagnosis) that this host has
    # brief windows — right after JVM boot, a heavy query's toArrow(),
    # or clearCache — where even a no-allocation numpy pass over a
    # resident buffer runs 100-500x slower while fully on-CPU (thread
    # CPU time ≈ wall, zero page faults; an external-process probe slows
    # too, so it is host-level vCPU/bandwidth contention, not GC or the
    # GIL).  The window dissipates within seconds.  Timed runs that
    # start inside one record garbage (the BENCH_r12 q152 7.1x
    # 'regression' was exactly this), so before each query we re-probe
    # until the host is clean or the retry budget runs out; the FINAL
    # probe is the recorded sentinel, so a high value means the query
    # was measured contended despite the wait.
    settle = os.environ.get("SPARK_GRAFT_BENCH_SETTLE", "1") != "0"
    settle_thresh = float(os.environ.get(
        "SPARK_GRAFT_BENCH_SETTLE_THRESH", "0.15"))
    settle_tries = int(os.environ.get("SPARK_GRAFT_BENCH_SETTLE_TRIES", "6"))

    def settled_probe() -> float:
        t = contention_probe()
        if not settle:
            return t
        for _ in range(settle_tries):
            if t <= settle_thresh:
                break
            time.sleep(0.5)
            t = contention_probe()
        return t

    per_query: dict[str, float] = {}
    warm_queries: dict[str, float] = {}
    sentinel: dict[str, float] = {}
    resettled: list[str] = []
    long_cold: list[str] = []
    failed: dict[str, str] = {}
    contention_probe()  # first call pays the buffer allocation
    for qid in sorted(REGISTRY):
        spec = REGISTRY[qid]
        if clear_cache:
            opcache.clear_tracked()
            spark.catalog.clearCache()
        sentinel[qid] = round(settled_probe(), 4)
        best = float("inf")
        n_runs = 0
        try:
            for _ in range(max(1, RUNS)):
                t0 = time.perf_counter()
                spec.spark(spark, SF_DIR).toArrow()
                best = min(best, time.perf_counter() - t0)
                n_runs += 1
                if best > LONG_RUN_SEC:
                    break  # best-of-1 for long runs (see LONG_RUN_SEC)
            # Post-run guard: the pre-probe only proves the window was
            # clean when the runs STARTED — the r13 sf3 sweep recorded
            # 10-35x phantoms on three consecutive queries because a
            # contention window opened mid-stretch and closed before
            # the next pre-probe.  If the probe is dirty immediately
            # after the timed runs, the readings are suspect: settle,
            # re-run once, keep the min, and flag the qid.
            if settle and best <= LONG_RUN_SEC \
                    and contention_probe() > settle_thresh:
                settled_probe()
                t0 = time.perf_counter()
                spec.spark(spark, SF_DIR).toArrow()
                best = min(best, time.perf_counter() - t0)
                resettled.append(qid)
            if warm_col and opcache._tracked:
                t0 = time.perf_counter()
                spec.spark(spark, SF_DIR).toArrow()
                warm_queries[qid] = round(time.perf_counter() - t0, 4)
        except Exception as exc:  # noqa: BLE001 - one query must not kill the sweep
            failed[qid] = str(exc).splitlines()[0][:200]
            continue
        per_query[qid] = round(best, 4)
        if n_runs == 1 and max(1, RUNS) > 1:
            # single-execution (cold) record in a best-of-N sweep —
            # flagged so long-run entries are statistically
            # distinguishable from warm best-of-N ones (r10 ADVICE)
            long_cold.append(qid)

    result = {
        "metric": "declared_query_suite_sec",
        "value": round(sum(per_query.values()), 4),
        "unit": "sec",
        "queries": per_query,
        "sf": sf_label(SF_DIR),
    }
    if warm_queries:
        result["warm_queries"] = warm_queries
    if sentinel:
        vals = sorted(sentinel.values())
        result["sentinel_queries"] = sentinel
        result["sentinel_median"] = vals[len(vals) // 2]
        result["sentinel_max"] = vals[-1]
    if resettled:
        result["resettled"] = sorted(resettled)

    # DuckDB twin is DEFAULT-ON so every BENCH_rN is self-normalizing:
    # cross-round comparisons of engine-only absolutes across host
    # epochs are uninterpretable (BASELINE.md:53-59 — the r8 52→134 s
    # scare was pure epoch noise).  SPARK_GRAFT_BENCH_DUCKDB=0 opts out.
    run_duckdb = ("--duckdb" in sys.argv
                  or os.environ.get("SPARK_GRAFT_BENCH_DUCKDB", "1") != "0")
    if run_duckdb:
        # duckdb is baked into the dev container but must not be a hard
        # dependency of the sweep itself (r9 ADVICE): on a host without
        # it, record engine-only timings instead of crashing.
        try:
            import duckdb
        except ImportError as exc:
            print(f"WARNING: duckdb unavailable ({exc}); engine-only "
                  "sweep (set SPARK_GRAFT_BENCH_DUCKDB=0 to silence)",
                  file=sys.stderr)
            run_duckdb = False
    if run_duckdb:
        # Resource guards for big-SF sweeps (the r6 sf10 sweep lost a
        # DuckDB oracle to disk-full after ~80 GB of spill): cap the
        # oracle's memory and spill so an oversized query fails as a
        # recorded per-query oracle failure instead of taking the host
        # down.  Unset by default — sf0.1/sf1 sweeps never spill.
        mem = os.environ.get("SPARK_GRAFT_BENCH_DUCKDB_MEM")
        tmp_lim = os.environ.get("SPARK_GRAFT_BENCH_DUCKDB_TEMPLIMIT")
        # Connection scope: "shared" (default — one warm connection,
        # the r9 protocol) or "fresh" (one SUBPROCESS per query).
        # Subprocess-per-query is the honest survivorship protocol at
        # big SF: with a shared connection, one oracle that dies at the
        # memory cap leaves the allocator poisoned and every later
        # oracle — however small — fails on 2 KB allocations (observed:
        # 37/56 sf10 'failures' of which ~half were q226-class trivia
        # that run fine in isolation).  An in-process fresh connection
        # does NOT isolate either — DuckDB's allocator is
        # process-global, and after one capped-query death even
        # duckdb.connect() itself OOMs — so "fresh" forks a child per
        # oracle; a death is the child's alone.  A per-oracle
        # wall-clock cap (SPARK_GRAFT_BENCH_DUCKDB_TIMEOUT, default
        # 420 s) records spill-grinders as explicit timeout failures.
        con_scope = os.environ.get("SPARK_GRAFT_BENCH_DUCKDB_CON",
                                   "shared")
        oracle_timeout = float(os.environ.get(
            "SPARK_GRAFT_BENCH_DUCKDB_TIMEOUT", "420"))

        def _connect():
            c = duckdb.connect()
            if mem:
                c.execute(f"SET memory_limit='{mem}'")
            if tmp_lim:
                c.execute("SET temp_directory='.duckdb_bench_tmp'")
                c.execute(f"SET max_temp_directory_size='{tmp_lim}'")
            for t in (
                "region nation customer supplier part orders lineitem "
                "events documents embeddings".split()
            ):
                c.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')"
                )
            return c

        _CHILD_SRC = r"""
import json, sys, time
import duckdb
p = json.load(sys.stdin)
c = duckdb.connect()
if p["mem"]:
    c.execute("SET memory_limit='%s'" % p["mem"])
if p["tmp"]:
    c.execute("SET temp_directory='.duckdb_bench_tmp'")
    c.execute("SET max_temp_directory_size='%s'" % p["tmp"])
for t in ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split():
    c.execute("CREATE VIEW %s AS SELECT * FROM read_parquet('%s/%s.parquet')"
              % (t, p["sf_dir"], t))
best = float("inf")
n_runs = 0
for _ in range(p["runs"] + 1):
    t0 = time.perf_counter()
    c.execute(p["sql"]).arrow()
    best = min(best, time.perf_counter() - t0)
    n_runs += 1
    if best > p["long"]:
        break
print(json.dumps({"best": best, "n_runs": n_runs}))
"""

        def _run_oracle_subprocess(sql: str) -> tuple[float, int]:
            import subprocess

            payload = json.dumps({
                "sql": sql, "sf_dir": SF_DIR, "runs": max(1, RUNS),
                "mem": mem, "tmp": tmp_lim, "long": LONG_RUN_SEC,
            })
            # the wall-clock cap must bound the WORST case the child
            # can attempt: runs+1 executions of up to LONG_RUN_SEC each
            # (short queries), or one execution of up to oracle_timeout
            # (long queries break after their first run) — r10 ADVICE
            budget = max(oracle_timeout,
                         (max(1, RUNS) + 1) * LONG_RUN_SEC + 30)
            p = subprocess.run(
                [sys.executable, "-c", _CHILD_SRC], input=payload,
                capture_output=True, text=True, timeout=budget,
            )
            if p.returncode != 0:
                err = (p.stderr.strip().splitlines() or ["child died"])[-1]
                raise RuntimeError(err)
            out = json.loads(p.stdout.strip().splitlines()[-1])
            return float(out["best"]), int(out.get("n_runs", 0))

        con = _connect() if con_scope != "fresh" else None
        ddb: dict[str, float] = {}
        ddb_sentinel: dict[str, float] = {}
        for qid in sorted(REGISTRY):
            spec = REGISTRY[qid]
            if not spec.oracle:
                continue
            ddb_sentinel[qid] = round(settled_probe(), 4)
            try:
                if con_scope == "fresh":
                    best, n_runs = _run_oracle_subprocess(spec.oracle)
                else:
                    best = float("inf")
                    n_runs = 0
                    for _ in range(max(1, RUNS) + 1):  # first run warms
                        t0 = time.perf_counter()
                        con.execute(spec.oracle).arrow()
                        best = min(best, time.perf_counter() - t0)
                        n_runs += 1
                        if best > LONG_RUN_SEC:
                            break  # best-of-1 for long runs
            except Exception as exc:  # noqa: BLE001 - keep sweeping
                msg = str(exc).splitlines()[0][:200] if str(exc) else (
                    f"timeout after {oracle_timeout:.0f}s")
                if "TimeoutExpired" in type(exc).__name__:
                    msg = f"oracle timeout after {oracle_timeout:.0f}s"
                failed[f"{qid}:duckdb"] = msg
                continue
            ddb[qid] = round(best, 4)
            if n_runs == 1:
                # the single run a long oracle records is its COLD
                # first execution (the warm-up slot) — flag it so the
                # detail JSON distinguishes cold one-shots from warm
                # best-of-N entries (r10 ADVICE)
                long_cold.append(f"{qid}:duckdb")
        result["duckdb_queries"] = ddb
        result["duckdb_total"] = round(sum(ddb.values()), 4)
        result["duckdb_sentinel_queries"] = ddb_sentinel

    if long_cold:
        result["long_cold"] = sorted(long_cold)
    if failed:
        result["failed"] = failed

    # The full per-query map (176+ entries, plus the optional DuckDB
    # column) exceeds the driver's stdout tail capture — five rounds of
    # BENCH_r*.json ended up `parsed: null` on a truncated fragment.
    # So: full detail goes to a file (and to an EARLY stdout line for
    # human logs), and the FINAL line is a short, always-parseable
    # summary whose `queries` map holds only the headline data-path
    # subset (the queries where the oracle engine itself does real
    # work — BASELINE.md's data-path table).
    # SPARK_GRAFT_BENCH_DETAIL redirects the detail artifact — the test
    # suite points it at tmp_path so `pytest tests/` can never clobber
    # the round's bench_detail.json (the file BENCH_r*.json points to).
    # A BENCH_ONLY subset sweep must not clobber the full-suite record
    # either (a 4-query stub overwrote the 251-query file in r9), so
    # subset runs default the detail file to a scratch path unless the
    # caller pointed SPARK_GRAFT_BENCH_DETAIL somewhere explicitly.
    detail_path = os.environ.get("SPARK_GRAFT_BENCH_DETAIL")
    if not detail_path:
        detail_name = "bench_detail_subset.json" if only else "bench_detail.json"
        detail_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), detail_name)
    with open(detail_path, "w") as f:
        json.dump(result, f)
    print(json.dumps(result))  # full map, early line (may be truncated)

    headline = (
        "q22_tpch_q1_agg", "q53_json_extract", "q72_minhash_signatures",
        "q74_jaccard_verify", "q75_cosine_nearest_neighbor",
        "q76_ann_bucketed", "q80_fingerprint_rolling_hash",
        "q91_benchmark_contamination", "q94_ivf_ann_search",
        "q98_word_repetition_filter", "q101_cc_dedup_clusters",
        "q114_simhash_multiprobe_pairs", "q130_canonical_doc_per_cluster",
        "q152_bigram_lm_score", "q183_trigram_langid_confusion",
        "q199_zorder_roundtrip", "q205_bucketed_join_roundtrip",
        "q208_ann_recall_eval",
    )
    summary = {
        "metric": "declared_query_suite_sec",
        "value": result["value"],
        "unit": "sec",
        "queries": {q: per_query[q] for q in headline if q in per_query},
        "sf": result["sf"],
        "n_queries": len(per_query),
        "detail_file": detail_path,
    }
    if "sentinel_median" in result:
        summary["sentinel_median"] = result["sentinel_median"]
        summary["sentinel_max"] = result["sentinel_max"]
    if "duckdb_total" in result:
        summary["duckdb_total"] = result["duckdb_total"]
        # ratio-friendly headline pairs in the parse-safe final line
        summary["duckdb_queries"] = {
            q: result["duckdb_queries"][q]
            for q in headline if q in result["duckdb_queries"]
        }
    if failed:
        summary["n_failed"] = len(failed)
    sys.stdout.flush()
    print(json.dumps(summary))


if __name__ == "__main__":
    main()

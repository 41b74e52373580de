#!/usr/bin/env python
"""Split a query's per-run cost into DataFrame-construction time vs
execution (toArrow) time, best-of-N warm, settle-gated.

Usage: python scripts/split_time.py q101 q240 ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import contention_probe  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))


def settled() -> float:
    t = contention_probe()
    for _ in range(8):
        if t <= 0.15:
            break
        time.sleep(0.5)
        t = contention_probe()
    return t


def main() -> None:
    from tidb_gateway_spark.operators import cache as opcache
    from tidb_gateway_spark.queries import REGISTRY
    from tidb_gateway_spark.session import get_spark

    prefixes = sys.argv[1:]
    qids = [q for q in sorted(REGISTRY)
            if any(q.startswith(p) for p in prefixes)]
    if not qids:
        print(f"no registry entries match prefixes {prefixes!r} "
              "(usage: split_time.py <qid-prefix> ...)", file=sys.stderr)
        sys.exit(1)
    spark = get_spark("split-time")
    # warm JVM/Arrow once
    REGISTRY[qids[0]].spark(spark, SF_DIR).toArrow()
    for qid in qids:
        opcache.clear_tracked()
        spark.catalog.clearCache()
        spec = REGISTRY[qid]
        best_c = best_e = best_t = float("inf")
        sent = settled()
        for _ in range(max(1, RUNS)):
            t0 = time.perf_counter()
            df = spec.spark(spark, SF_DIR)
            t1 = time.perf_counter()
            df.toArrow()
            t2 = time.perf_counter()
            best_c = min(best_c, t1 - t0)
            best_e = min(best_e, t2 - t1)
            best_t = min(best_t, t2 - t0)
        print(json.dumps({
            "qid": qid, "sentinel": round(sent, 4),
            "construct_s": round(best_c, 4),
            "exec_s": round(best_e, 4),
            "total_s": round(best_t, 4),
        }), flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""q245 A/B (VERDICT r14 item 2): the registered aggregate-then-window
form vs the reworked operators/rank.grouped_weighted_percentiles, plus
the skeleton floor (scan + word-count weight compute + (lang, v)
aggregate only — the work NO weighted-percentile plan can avoid).

Usage: SPARK_GRAFT_SF_DIR=.benchdata/sf10 python scripts/q245_ab_r15.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import contention_probe  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.benchdata/sf10")
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))


def settled() -> float:
    t = contention_probe()
    for _ in range(10):
        if t <= 0.15:
            break
        time.sleep(0.5)
        t = contention_probe()
    return t


def main() -> None:
    from pyspark.sql import functions as F

    from tidb_gateway_spark.catalog import load_table
    from tidb_gateway_spark.operators import rank
    from tidb_gateway_spark.operators.partitioning import (
        ensure_min_partitions,
    )
    from tidb_gateway_spark.queries import REGISTRY
    from tidb_gateway_spark.queries.distribution_quality import _Q245_PCTS
    from tidb_gateway_spark.session import get_spark

    spark = get_spark("q245-ab")

    def weighted_rows():
        d = ensure_min_partitions(load_table(spark, SF_DIR, "documents"))
        t = F.trim(F.col("text"))
        return d.filter(t != "").select(
            "lang",
            F.col("n_chars").alias("v"),
            F.size(F.split(t, " +")).cast("bigint").alias("wt"),
        ).filter(F.col("wt") > 0)

    def current_form():
        return REGISTRY["q245_grouped_weighted_percentiles"].spark(
            spark, SF_DIR)

    def gwp_form():
        out = rank.grouped_weighted_percentiles(
            weighted_rows(), "lang", "v", "wt", list(_Q245_PCTS))
        return out.select(
            "lang", "w_total",
            *[F.col(f"p{p}").cast("bigint").alias(f"p{p}")
              for p in _Q245_PCTS],
        ).orderBy("lang")

    def skeleton():
        # the irreducible pass: weight compute + (lang, v) weight sums
        return weighted_rows().groupBy("lang", "v").agg(
            F.sum("wt").cast("bigint").alias("wv"))

    a = [tuple(r) for r in current_form().collect()]
    b = [tuple(r) for r in gwp_form().collect()]
    assert a == b, (a, b)
    print("results identical:", len(a), "rows", flush=True)

    forms = (("current_window_form", current_form),
             ("gwp_operator_form", gwp_form),
             ("skeleton_scan_agg", skeleton),
             ("current_window_form_2", current_form))
    for label, fn in forms:
        best = float("inf")
        sent = settled()
        for _ in range(RUNS):
            t0 = time.perf_counter()
            df = fn()
            df.write.format("noop").mode("overwrite").save() \
                if label == "skeleton_scan_agg" else df.toArrow()
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({"form": label, "sf_dir": SF_DIR,
                          "sentinel": round(sent, 4),
                          "best_s": round(best, 4)}), flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""q232 A/B at a given SF: the r14 single-scan Expand multi-distinct
form (SortAggregate ×3 over the expanded stream — string min/max
buffers disqualify HashAggregate) vs a split form that keeps the
distinct counting in ONE hash-aggregated Expand pass and moves the
string min/max into a separate grouping-key-free pass (SortAggregate
with no grouping keys never sorts), cross-joined 1-row × 1-row.

Usage: SPARK_GRAFT_SF_DIR=.benchdata/sf1 python scripts/q232_ab_r15.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import contention_probe  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.benchdata/sf1")
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
    from tidb_gateway_spark.operators.partitioning import (
        ensure_min_partitions,
    )
    from tidb_gateway_spark.queries import REGISTRY
    from tidb_gateway_spark.queries.profiling_mixture import _Q232_COLS
    from tidb_gateway_spark.session import get_spark

    spark = get_spark("q232-ab")

    def split_form():
        o = ensure_min_partitions(load_table(spark, SF_DIR, "orders"))
        cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast(
            "bigint")
        canon = {
            "o_orderkey": F.col("o_orderkey").cast("string"),
            "o_custkey": F.col("o_custkey").cast("string"),
            "o_orderstatus": F.col("o_orderstatus"),
            "o_totalprice": cents.cast("string"),
            "o_orderdate": F.date_format("o_orderdate", "yyyy-MM-dd"),
            "o_orderpriority": F.col("o_orderpriority"),
        }
        aggs_d, aggs_mm = [], []
        for name, _, _ in _Q232_COLS:
            c = F.col(name)
            aggs_d += [
                F.sum(F.when(c.isNull(), 1).otherwise(0)).cast("bigint")
                .alias(f"__nn_{name}"),
                F.countDistinct(c).cast("bigint").alias(f"__nd_{name}"),
            ]
            aggs_mm += [
                F.min(canon[name]).alias(f"__mn_{name}"),
                F.max(canon[name]).alias(f"__mx_{name}"),
            ]
        row = o.agg(*aggs_d).crossJoin(o.agg(*aggs_mm))
        structs = [
            F.struct(
                F.lit(name).alias("column_name"),
                F.col(f"__nn_{name}").alias("n_nulls"),
                F.col(f"__nd_{name}").alias("n_distinct"),
                F.col(f"__mn_{name}").alias("min_s"),
                F.col(f"__mx_{name}").alias("max_s"),
            )
            for name, _, _ in _Q232_COLS
        ]
        return (
            row.select(F.explode(F.array(*structs)).alias("p"))
            .select("p.*")
            .orderBy("column_name")
        )

    def current_form():
        return REGISTRY["q232_table_profile"].spark(spark, SF_DIR)

    # results must be identical
    a = [tuple(r) for r in current_form().collect()]
    b = [tuple(r) for r in split_form().collect()]
    assert a == b, (a, b)
    print("results identical:", len(a), "rows", flush=True)

    for label, fn in (("current_expand_sortagg", current_form),
                      ("split_hashagg_minmax", split_form)):
        best = float("inf")
        sent = settled()
        for _ in range(RUNS):
            t0 = time.perf_counter()
            fn().toArrow()
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({"form": label, "sf_dir": SF_DIR,
                          "sentinel": round(sent, 4),
                          "best_s": round(best, 4)}), flush=True)

    # plan shapes
    from tidb_gateway_spark.plans import inspect
    for label, fn in (("current", current_form), ("split", split_form)):
        text = inspect.explain_formatted(fn())
        tree = text.split("\n\n")[0]
        import re
        print(label, "scan_nodes=",
              len(re.findall(r"Scan parquet", tree)),
              "sorts=", len(re.findall(r"\bSort\b", tree)),
              "hashagg=", len(re.findall(r"HashAggregate", tree)),
              "sortagg=", len(re.findall(r"SortAggregate", tree)),
              "exchanges=", len(re.findall(r"Exchange", tree)), flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Skeleton-floor measurements (VERDICT r7 directives 4 & 6).

For queries whose sf1 ratio straddles the 2×-DuckDB bar across epochs
(q122 TTR battery, q134 event paths, q194 dup-5-gram coverage), measure
the PARSE-FREE / COMPUTE-FREE skeleton of the same plan shape — scan +
the same exchanges with the expensive per-row expression removed.  If
the skeleton alone approaches DuckDB's whole-query time, the residual
ratio is Spark fixed cost (job launch + scan + exchange), not a plan
defect — the q53 precedent, where the parse-free sort skeleton was
2.8× DuckDB's entire query.

Protocol: one tuned session, JVM warm-up pass, best-of-N (default 5)
warm runs per variant, DuckDB oracle twin timed in the SAME process.
Prints one JSON line per query: {qid, skeleton_sec, query_sec,
duckdb_sec, ratio, skeleton_share}.

Usage:
    python scripts/floor_sweep.py [--sf-dir .benchdata/sf1] [--runs 5] [qids...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _skeleton_q122(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q122 minus the tokenizer: same scan, same blank filter, same
    one-exchange groupBy(source) aggregate — but over raw text length
    instead of split/array_distinct/translate."""
    from tidb_gateway_spark.catalog import load_table

    d = load_table(spark, sf_dir, "documents")
    d = d.filter(F.trim(F.col("text")) != "").select(
        "source", F.length("text").alias("cl"))
    return (
        d.groupBy("source")
        .agg(F.count("*").alias("nd"), F.avg("cl").alias("acl"),
             F.sum((F.col("cl") > 100).cast("long")).alias("flagged"))
        .orderBy("source")
    )


def _skeleton_q134(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q134 minus the per-user collect_list+sort: same scan, same
    user-keyed exchange, same second tiny aggregate."""
    from tidb_gateway_spark.catalog import load_table

    e = load_table(spark, sf_dir, "events")
    seq = e.groupBy("user_id").agg(F.count("*").alias("n"))
    return (
        seq.select((F.col("n") % 8).alias("path3"))
        .groupBy("path3").agg(F.count("*").alias("users"))
        .orderBy("path3")
    )


def _skeleton_q194(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q194 minus the shingle explode: same scan + same word-count
    filter, per-doc single-row aggregate, same decile histogram."""
    from tidb_gateway_spark.catalog import load_table

    d = load_table(spark, sf_dir, "documents")
    t = F.trim(F.col("text"))
    wc = F.size(F.split(t, " +"))
    d = d.filter((t != "") & (wc >= 5)).select("doc_id", wc.alias("tw"))
    return (
        d.select((F.col("tw") % 10).cast("int").alias("bucket"))
        .groupBy("bucket").agg(F.count("*").alias("n_docs"))
        .orderBy("bucket")
    )


SKELETONS = {
    "q122_ttr_quality_battery": _skeleton_q122,
    "q134_event_path_prefixes": _skeleton_q134,
    "q194_dup_ngram_coverage": _skeleton_q194,
}


def best_of(fn, runs: int) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".benchdata", "sf1"))
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("qids", nargs="*", default=[])
    args = ap.parse_args()
    qids = args.qids or sorted(SKELETONS)

    import duckdb

    from tidb_gateway_spark.queries import REGISTRY
    from tidb_gateway_spark.session import get_spark

    spark = get_spark("floor-sweep")
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{args.sf_dir}/{t}.parquet')")

    # warm-up: JVM codegen + parquet footers + one exchange
    REGISTRY["q22_tpch_q1_agg"].spark(spark, args.sf_dir).toArrow()

    for qid in qids:
        spec = REGISTRY[qid]
        skel = SKELETONS.get(qid)
        row = {"qid": qid, "sf_dir": args.sf_dir, "runs": args.runs}
        if skel is not None:
            row["skeleton_sec"] = round(best_of(
                lambda: skel(spark, args.sf_dir).toArrow(), args.runs), 3)
        row["query_sec"] = round(best_of(
            lambda: spec.spark(spark, args.sf_dir).toArrow(), args.runs), 3)
        row["duckdb_sec"] = round(best_of(
            lambda: con.execute(spec.oracle).arrow(), args.runs), 3)
        row["ratio"] = round(row["query_sec"] / row["duckdb_sec"], 2)
        if "skeleton_sec" in row:
            row["skeleton_share"] = round(
                row["skeleton_sec"] / row["query_sec"], 2)
            row["skeleton_vs_duckdb"] = round(
                row["skeleton_sec"] / row["duckdb_sec"], 2)
        print(json.dumps(row))


if __name__ == "__main__":
    main()

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


def _skeleton_q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q03 minus the arithmetic: the same full-table global sort and
    6M-row Arrow transfer, projecting a constant instead of computing
    charge.  If this alone approaches the query, the residual is the
    sort + driver Arrow materialization, not expression cost."""
    from tidb_gateway_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber", F.lit(0.0).alias("chg")
    ).orderBy("l_orderkey", "l_linenumber")


def _skeleton_q03_nosort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transfer-only variant: same projection, no global sort —
    separates the range-exchange cost from the Arrow transfer cost."""
    from tidb_gateway_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber", F.lit(0.0).alias("chg"))


def _skeleton_q131(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q131 minus the window functions: same scan, same user_id
    exchange + (ts_us, event_id) sort-within-partitions, same sampled
    filter and final order — no nth_value/lead evaluation."""
    from tidb_gateway_spark.catalog import load_table

    e = load_table(spark, sf_dir, "events")
    return (
        e.select("event_id", "user_id", "ts_us")
        .repartition("user_id")
        .sortWithinPartitions("user_id", "ts_us", "event_id")
        .filter(F.col("event_id") % 199 == 0)
        .select("event_id")
        .orderBy("event_id")
    )


def _skeleton_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q20 minus the running-max frame: same user_id exchange +
    ts_us sort, same purchase filter and event_id order."""
    from tidb_gateway_spark.catalog import load_table

    e = load_table(spark, sf_dir, "events")
    return (
        e.select("event_id", "user_id", "ts_us", "event_type")
        .repartition("user_id")
        .sortWithinPartitions("user_id", "ts_us")
        .filter(F.col("event_type") == "purchase")
        .select("event_id")
        .orderBy("event_id")
    )


def _skeleton_q227(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q227 minus pair generation and scoring: the basket build alone —
    lineitem ⋈ broadcast(part) + the one orderkey exchange collecting
    sorted distinct item sets — reduced to a count."""
    from tidb_gateway_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .groupBy(F.col("l_orderkey").alias("ok"))
        .agg(F.sort_array(F.collect_set("p_brand")).alias("items"))
        .agg(F.count("*").alias("n"), F.sum(F.size("items")).alias("si"))
    )


def _skeleton_q228(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q228 minus the two md5 row checksums: same scan, same month
    aggregate over plain integer expressions."""
    from tidb_gateway_spark.catalog import load_table

    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    return (
        o.select(F.date_format("o_orderdate", "yyyy-MM").alias("month"),
                 cents.alias("ha"))
        .groupBy("month")
        .agg(F.count("*").alias("n_rows"), F.sum("ha").alias("ck_a"))
        .orderBy("month")
    )


def _skeleton_q209(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q209 minus the power iteration: the MinHash-LSH candidate
    pipeline alone (the shared q72/q74/q101 machinery), reduced to an
    edge count — measures how much of q209 is graph construction."""
    from tidb_gateway_spark.catalog import load_table
    from tidb_gateway_spark.operators import dedup
    from tidb_gateway_spark.operators.partitioning import (
        ensure_min_partitions,
    )
    from tidb_gateway_spark.queries.llm_extended import _BANDS, _K

    d = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    cand = dedup.minhash_lsh_candidates(d, k=_K, bands=_BANDS)
    return cand.agg(F.count("*").alias("n_edges"))


def _skeleton_q98(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q98 minus the tokenizer: same scan, same blank filter, same
    decile-bucket histogram aggregate — but bucketing raw text length
    instead of split/array_distinct.  Whatever this costs is Spark
    fixed cost (scan + one tiny exchange); the residual above it is
    the JVM per-row split/array_distinct constant factor that DuckDB's
    vectorized list kernels undercut at sf10."""
    from tidb_gateway_spark.catalog import load_table
    from tidb_gateway_spark.operators.partitioning import (
        ensure_min_partitions,
    )

    d = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    t = F.trim(F.col("text"))
    bucket = (F.length(t) % 10).cast("int")
    return (
        d.filter(t != "")
        .select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("bucket")
    )


SKELETONS = {
    "q122_ttr_quality_battery": _skeleton_q122,
    "q98_word_repetition_filter": _skeleton_q98,
    "q134_event_path_prefixes": _skeleton_q134,
    "q194_dup_ngram_coverage": _skeleton_q194,
    "q03_projection_arithmetic": _skeleton_q03,
    "q131_nth_value_lead_default": _skeleton_q131,
    "q20_asof_join": _skeleton_q20,
    "q227_basket_pair_affinity": _skeleton_q227,
    "q228_replica_divergence_audit": _skeleton_q228,
    "q209_neardup_pagerank": _skeleton_q209,
}

# second skeleton variants, reported as extra fields when present
EXTRA_SKELETONS = {
    "q03_projection_arithmetic": {"nosort": _skeleton_q03_nosort},
}


def _skeleton_q240(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q240 minus the crossing machinery: the exact-algorithm data-pass
    shape — TWO scans of the (rf, cents, quantity) projection, the
    first aggregating to (group, coarse-bucket) weight sums, the second
    re-aggregating a ~1/32 value slice to (group, value) sums — with
    the boundary CASE, broadcast join, and cumulative window removed.
    If the two bare scans alone approach the full query, the residual
    is Spark scan+stage fixed cost, not crossing-plan overhead."""
    from tidb_gateway_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    w = li.select(
        F.col("l_returnflag").alias("rf"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("bigint").alias("cents"),
        F.col("l_quantity").cast("bigint").alias("q"))
    s1 = (w.groupBy("rf", F.pmod(F.col("cents"), F.lit(32)).alias("b"))
          .agg(F.sum("q").alias("wn"))
          .agg(F.count("*").alias("n"), F.sum("wn").alias("s")))
    s2 = (w.filter(F.pmod(F.col("cents"), F.lit(32)) == 7)
          .groupBy("rf", "cents").agg(F.sum("q").alias("wv"))
          .agg(F.count("*").alias("n"), F.sum("wv").alias("s")))
    return s1.unionAll(s2)


SKELETONS["q240_weighted_median"] = _skeleton_q240


def best_of(fn, runs: int, settled_probe=None, probe=None) -> float:
    """Best-of-N wall time; with probes given, prefer the best among
    runs whose host-contention probe was clean BOTH entering and
    leaving the run (SCALE.md: contention windows inflate on-CPU work
    100-500× invisibly; a best-of over poisoned runs still lies)."""
    best = float("inf")
    best_clean = float("inf")
    for _ in range(runs):
        t_in = settled_probe() if settled_probe else 0.0
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        t_out = probe() if probe else 0.0
        best = min(best, dt)
        if t_in <= 0.15 and t_out <= 0.15:
            best_clean = min(best_clean, dt)
    return best_clean if best_clean != float("inf") else best


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

    # Host-contention guard (the bench.py sentinel/settle machinery —
    # SCALE.md documents the shared-host windows; isolated floor
    # readings taken inside one are worthless).  Settle before every
    # timed variant and record the sentinel in the row.
    import bench as _bench

    def settled_probe() -> float:
        t = _bench.contention_probe()
        for _ in range(6):
            if t <= 0.15:
                break
            time.sleep(2.0)
            t = _bench.contention_probe()
        return t

    for qid in qids:
        spec = REGISTRY[qid]
        skel = SKELETONS.get(qid)
        row = {"qid": qid, "sf_dir": args.sf_dir, "runs": args.runs}
        row["sentinel"] = round(settled_probe(), 4)
        if skel is not None:
            row["skeleton_sec"] = round(best_of(
                lambda: skel(spark, args.sf_dir).toArrow(), args.runs,
                settled_probe, _bench.contention_probe), 3)
        for name, extra in EXTRA_SKELETONS.get(qid, {}).items():
            row[f"skeleton_{name}_sec"] = round(best_of(
                lambda: extra(spark, args.sf_dir).toArrow(), args.runs,
                settled_probe, _bench.contention_probe), 3)
        row["query_sec"] = round(best_of(
            lambda: spec.spark(spark, args.sf_dir).toArrow(), args.runs,
            settled_probe, _bench.contention_probe), 3)
        row["duckdb_sec"] = round(best_of(
            lambda: con.execute(spec.oracle).arrow(), args.runs,
            settled_probe, _bench.contention_probe), 3)
        row["sentinel_after"] = round(_bench.contention_probe(), 4)
        row["ratio"] = round(row["query_sec"] / row["duckdb_sec"], 2)
        if "skeleton_sec" in row:
            row["skeleton_share"] = round(
                row["skeleton_sec"] / row["query_sec"], 2)
            row["skeleton_vs_duckdb"] = round(
                row["skeleton_sec"] / row["duckdb_sec"], 2)
        print(json.dumps(row))


if __name__ == "__main__":
    main()

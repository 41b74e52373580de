"""Q10–Q21: join operators (SURVEY.md §2B).

Scale notes: dimension joins (nation/region/supplier) carry explicit
``broadcast()`` hints — at 100 TB the fact side never shuffles for these.
Fact-fact joins (orders ⋈ lineitem, events self-join) shuffle on their
keys; both sides hash-partition on the join key and AQE handles skew
(skewJoin.enabled).  The as-of join is a window over a single shuffle by
user_id rather than a per-row correlated subquery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tidb_gateway_spark.catalog import load_table
from tidb_gateway_spark.functions import stable_round
from tidb_gateway_spark.queries.registry import register


@register(
    "q10_inner_equijoin",
    "SELECT c.c_mktsegment, COUNT(*) AS n, FLOOR(SUM(o.o_totalprice)*100 + 0.5)/100 AS s "
    "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
    "GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment",
    doc="Inner equi-join; customer side broadcast-eligible, Catalyst picks.",
    tags=("join",),
)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"), stable_round(F.sum("o_totalprice"), 2).alias("s"))
        .orderBy("c_mktsegment")
    )


@register(
    "q11_multiway_join",
    "SELECT r.r_name, n.n_name, COUNT(*) AS n FROM customer c "
    "JOIN nation n ON c.c_nationkey = n.n_nationkey "
    "JOIN region r ON n.n_regionkey = r.r_regionkey "
    "GROUP BY r.r_name, n.n_name ORDER BY r.r_name, n.n_name",
    doc="3-way star join; nation/region broadcast so the fact table never "
        "shuffles for the join (only for the final aggregate).",
    tags=("join",),
)
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.count("*").alias("n"))
        .orderBy("r_name", "n_name")
    )


@register(
    "q12_left_outer_join",
    "SELECT n.n_name, COUNT(s.s_suppkey) AS ns FROM nation n "
    "LEFT JOIN supplier s ON s.s_nationkey = n.n_nationkey "
    "GROUP BY n.n_name ORDER BY n.n_name",
    doc="Left outer join; COUNT(col) skips NULLs from unmatched rows.",
    tags=("join",),
)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    return (
        n.join(s, s.s_nationkey == n.n_nationkey, "left")
        .groupBy("n_name")
        .agg(F.count("s_suppkey").alias("ns"))
        .orderBy("n_name")
    )


@register(
    "q13_right_outer_join",
    "SELECT n.n_name, COUNT(c.c_custkey) AS nc FROM customer c "
    "RIGHT JOIN nation n ON c.c_nationkey = n.n_nationkey "
    "GROUP BY n.n_name ORDER BY n.n_name",
    doc="Right outer join.",
    tags=("join",),
)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(n, c.c_nationkey == n.n_nationkey, "right")
        .groupBy("n_name")
        .agg(F.count("c_custkey").alias("nc"))
        .orderBy("n_name")
    )


@register(
    "q14_full_outer_join",
    "SELECT COALESCE(a.k, b.k) AS k, a.na AS na, b.nb AS nb FROM "
    "(SELECT c_nationkey AS k, COUNT(*) AS na FROM customer GROUP BY c_nationkey) a "
    "FULL JOIN "
    "(SELECT s_nationkey AS k, COUNT(*) AS nb FROM supplier GROUP BY s_nationkey) b "
    "ON a.k = b.k ORDER BY k",
    doc="Full outer join of two aggregates.",
    tags=("join",),
)
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    a = c.groupBy(F.col("c_nationkey").alias("ka")).agg(F.count("*").alias("na"))
    b = s.groupBy(F.col("s_nationkey").alias("kb")).agg(F.count("*").alias("nb"))
    return (
        a.join(b, a.ka == b.kb, "full")
        .select(F.coalesce("ka", "kb").alias("k"), "na", "nb")
        .orderBy("k")
    )


@register(
    "q15_left_semi_join",
    "SELECT COUNT(*) AS n FROM part p WHERE EXISTS "
    "(SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 45)",
    doc="EXISTS as left-semi join (no row multiplication).",
    tags=("join",),
)
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        p.join(li, p.p_partkey == li.l_partkey, "left_semi").agg(F.count("*").alias("n"))
    )


@register(
    "q16_left_anti_join",
    "SELECT COUNT(*) AS n FROM customer c WHERE NOT EXISTS "
    "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)",
    doc="NOT EXISTS as left-anti join.  shuffle_hash hint on the orders "
        "side: anti joins build a hash table of the EXCLUSION side, and "
        "orders is fact-sized — broadcasting it (the plan AQE picks at "
        "toy scale) means a single-threaded driver build and is "
        "impossible at 100 TB; the shuffled hash build partitions both "
        "sides by custkey and builds in parallel (the q19 treatment — "
        "measured 1.48 s -> sub-linear at sf1).  The projected join "
        "columns are single longs, so the shuffle carries keys only.",
    tags=("join",),
)
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    return (
        c.join(o.hint("shuffle_hash"), c.c_custkey == o.o_custkey, "left_anti")
        .agg(F.count("*").alias("n"))
    )


@register(
    "q17_cross_join",
    "SELECT COUNT(*) AS n FROM region CROSS JOIN nation",
    doc="Cartesian product (broadcast nested loop; both sides tiny).",
    tags=("join",),
)
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).agg(F.count("*").alias("n"))


@register(
    "q18_theta_join",
    "SELECT s1.s_suppkey AS a, s2.s_suppkey AS b FROM supplier s1 "
    "JOIN supplier s2 ON s1.s_acctbal < s2.s_acctbal "
    "AND s1.s_nationkey = s2.s_nationkey ORDER BY a, b",
    doc="Theta join with an equi component — Catalyst hash-joins on "
        "s_nationkey and applies the inequality as a post-join filter, "
        "so this is NOT a nested loop at scale.",
    tags=("join",),
)
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    s1 = load_table(spark, sf_dir, "supplier").alias("s1")
    s2 = load_table(spark, sf_dir, "supplier").alias("s2")
    cond = (F.col("s1.s_nationkey") == F.col("s2.s_nationkey")) & (
        F.col("s1.s_acctbal") < F.col("s2.s_acctbal")
    )
    # NOTE (r14 examined, left alone): the global orderBy's range
    # exchange SAMPLES its child, so the quadratic-output pair
    # generation executes twice per run — but materializing the 18M
    # sf3 pairs to dodge the second pass costs MORE than recomputing
    # them (measured: plain 9.4 s, persist 13.9 s, localCheckpoint
    # 13.9 s; the join itself is 1.9 s).  The residual vs DuckDB
    # (2.8× at sf3) is the ordered 18M-row materialization both
    # engines pay, in-process vs over the driver.
    return (
        s1.join(s2, cond)
        .select(F.col("s1.s_suppkey").alias("a"), F.col("s2.s_suppkey").alias("b"))
        .orderBy("a", "b")
    )


@register(
    "q19_range_predicate_join",
    "SELECT o.o_orderkey, COUNT(*) AS n FROM orders o JOIN lineitem l "
    "ON l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate "
    "GROUP BY o.o_orderkey ORDER BY o.o_orderkey LIMIT 50",
    doc="Equi-join with additional range predicate; range applied post-join. "
        "shuffle_hash hint: orders is fact-sized (grows with sf), so the "
        "single-threaded broadcast-build AQE picks at toy scale loses to a "
        "parallel shuffled hash build (measured 1.31 s -> 0.75 s at sf1) "
        "and would be impossible at 100 TB anyway; the groupBy reuses the "
        "join's hash partitioning, and the count partial-aggregates "
        "map-side so the final exchange carries (orderkey, count) only.",
    tags=("join",),
)
def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        o.hint("shuffle_hash")
        .join(li, (li.l_orderkey == o.o_orderkey) & (li.l_shipdate > o.o_orderdate))
        .groupBy("o_orderkey")
        .agg(F.count("*").alias("n"))
        .orderBy("o_orderkey")
        .limit(50)
    )


@register(
    "q20_asof_join",
    # Oracle keeps the declared correlated-subquery form; DuckDB's parquet
    # reader truncates ts to microseconds exactly like our ts view column,
    # so strict `<` agrees across engines.
    "SELECT e.event_id, "
    "(SELECT MAX(e2.event_id) FROM events e2 "
    " WHERE e2.user_id = e.user_id AND e2.ts < e.ts) AS prev_id "
    "FROM events e WHERE e.event_type = 'purchase' ORDER BY e.event_id",
    doc="As-of join (latest earlier event per key). Spark-first form: ONE "
        "shuffle by user_id + a RANGE window frame on epoch-micros — the "
        "strict `ts < ts` bound is the rangeBetween(-1) upper bound; "
        "contrast with the O(n²) correlated subquery the oracle runs. "
        "Scales as a single sort-within-partition per user.",
    tags=("join", "window", "asof"),
)
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    return (
        e.withColumn("prev_id", F.max("event_id").over(w))
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "prev_id")
        .orderBy("event_id")
    )


@register(
    "q21_self_join",
    "SELECT COUNT(*) AS n FROM events a JOIN events b ON a.user_id = b.user_id "
    "AND a.event_id < b.event_id AND a.event_type = 'signup' "
    "AND b.event_type = 'purchase'",
    doc="Self equi-join on user_id with ordering predicate (funnel count).",
    tags=("join",),
)
def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    a = e.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("ua"), F.col("event_id").alias("ia")
    )
    b = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("ub"), F.col("event_id").alias("ib")
    )
    return (
        a.join(b, (F.col("ua") == F.col("ub")) & (F.col("ia") < F.col("ib")))
        .agg(F.count("*").alias("n"))
    )


@register(
    "q121_salted_skew_join",
    "SELECT c.c_mktsegment, COUNT(*) AS n, "
    "FLOOR(SUM(e.value)*100 + 0.5)/100 AS s "
    "FROM (SELECT CASE WHEN user_id % 5 = 0 THEN 1 "
    "ELSE user_id END AS k, value FROM events) e "
    "JOIN customer c ON e.k = c.c_custkey "
    "GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment",
    doc="Explicitly SALTED fact⋈dim join (operators/skew.py:salted_join) "
        "over a PATHOLOGICALLY SKEWED key: the query derives "
        "k = CASE WHEN user_id%5=0 THEN 1 ELSE user_id END, funneling "
        "~20% of all events onto customer key 1 — the null-ish-default/"
        "celebrity-entity shape where a plain hash join runs at the "
        "speed of one straggler task. Every events row picks one of 8 "
        "sub-keys (pmod(hash(event_id),8)) and the customer build side "
        "is exploded 8×, so the hot key's rows spread across 8 tasks. "
        "Result is set-identical to the plain join over the same "
        "derived key (the oracle IS that plain join; both engines "
        "compute the identical CASE). tests/test_plans.py asserts the "
        "exchange keys include the salt AND that the hot key's rows "
        "land in all 8 salt buckets. On a 100 TB fact table this is "
        "the escape hatch when AQE's skew split can't engage "
        "(broadcast-ineligible builds, sub-threshold partitions).",
    tags=("join", "skew"),
)
def q121(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tidb_gateway_spark.operators.skew import salted_join

    e = load_table(spark, sf_dir, "events").select(
        F.when(F.col("user_id") % 5 == 0, F.lit(1))
        .otherwise(F.col("user_id")).alias("k"),
        "value", "event_id",
    )
    c = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "k")
    joined = salted_join(e, c, "k", n_salt=8, salt_on=F.col("event_id"))
    return (
        joined.groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"),
             stable_round(F.sum("value"), 2).alias("s"))
        .orderBy("c_mktsegment")
    )


@register(
    "q127_runtime_bloom_filter_join",
    "SELECT l.l_returnflag, COUNT(*) AS n, "
    "FLOOR(SUM(l.l_extendedprice * (1 - l.l_discount))*100 + 0.5)/100 AS rev "
    "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
    "WHERE o.o_orderpriority = '1-URGENT' AND o.o_orderstatus = 'F' "
    "GROUP BY l.l_returnflag ORDER BY l.l_returnflag",
    doc="Selective-dimension fact join shaped for Spark's RUNTIME BLOOM "
        "FILTER injection (spark.sql.optimizer.runtime.bloomFilter.*): "
        "the filtered orders side is aggregated into a bloom_filter_agg "
        "and a might_contain predicate is pushed into the lineitem scan, "
        "discarding non-matching rows BEFORE the shuffle — at 100 TB the "
        "probe-side exchange shrinks by the filter's selectivity. No "
        "join hint: Catalyst broadcasts the small filtered build "
        "locally and switches to shuffle join + bloom injection when "
        "the build outgrows the broadcast threshold at scale; "
        "tests/test_plans.py simulates the at-scale thresholds and "
        "asserts the runtime-filter shape.",
    tags=("join", "runtime-filter"),
)
def q127(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderstatus") == "F")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            stable_round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                2,
            ).alias("rev"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q144_asof_join_forward",
    "SELECT e.event_id, "
    "(SELECT MIN(e2.event_id) FROM events e2 "
    " WHERE e2.user_id = e.user_id AND e2.ts > e.ts) AS next_id "
    "FROM events e WHERE e.event_type = 'signup' ORDER BY e.event_id",
    doc="FORWARD as-of join (earliest later event per key) — q20's "
        "mirror, completing the as-of family in both directions "
        "(DuckDB ASOF JOIN supports backward and forward; the engine "
        "expresses both as ONE user_id shuffle + a RANGE frame on "
        "epoch-micros).  The frame is declared over ts DESC as "
        "(unbounded-preceding, -1) — on a DESC key, bound -1 means "
        "ts ≥ current+1, i.e. exactly the strictly-later set — "
        "because Spark evaluates UNBOUNDED PRECEDING frames "
        "incrementally (one accumulator pass per partition) while the "
        "mirror-image (1, unbounded-following) ASC frame re-aggregates "
        "the remaining frame per row: O(k) vs O(k²) per user key "
        "(measured r10: 3.66 → 2.32 s at sf10 on 100× user history, "
        "4.55× → 1.89× DuckDB; 2.04× → 1.61× at sf1). "
        "The oracle keeps the correlated-subquery form for contrast. "
        "MIN of event_id over the strictly-later frame breaks ts ties "
        "identically in both engines.",
    tags=("join", "window", "asof"),
)
def q144(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts_us").desc())
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    return (
        e.withColumn("next_id", F.min("event_id").over(w))
        .filter(F.col("event_type") == "signup")
        .select("event_id", "next_id")
        .orderBy("event_id")
    )


@register(
    "q175_null_safe_join",
    "WITH a AS (SELECT o_orderkey, CASE WHEN o_orderkey % 7 = 0 "
    "THEN NULL ELSE o_orderkey % 5 END AS k FROM orders "
    "WHERE o_orderkey % 2 = 0 AND o_orderkey <= 4000), "
    "b AS (SELECT o_orderkey, CASE WHEN o_orderkey % 11 = 0 "
    "THEN NULL ELSE o_orderkey % 5 END AS k FROM orders "
    "WHERE o_orderkey % 2 = 1 AND o_orderkey <= 4000), "
    "j AS (SELECT a.k FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k) "
    "SELECT COALESCE(CAST(k AS VARCHAR), 'NULL') AS k, "
    "COUNT(*) AS n FROM j GROUP BY 1 ORDER BY k",
    doc="NULL-safe equality join (Spark `eqNullSafe` / SQL IS NOT "
        "DISTINCT FROM / MySQL `<=>`): NULL keys MATCH each other "
        "instead of vanishing — the semantics CDC and dimension "
        "pipelines need when NULL is a legitimate key value (a plain "
        "equi-join silently drops every NULL row, q136's hash-compare "
        "relies on exactly this distinction). Catalyst plans "
        "null-safe equality as a HASH join (the null bucket is just "
        "another key), not a nested loop — same scale shape as q10. "
        "Both sides are key-range-bounded: the synthetic 6-value key "
        "domain makes an UNBOUNDED self-join quadratic in corpus size "
        "(the declared semantics need the NULL bucket, not volume).",
    tags=("join", "null"),
)
def q175(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    k = lambda mod: F.when(  # noqa: E731
        F.col("o_orderkey") % mod == 0, F.lit(None)
    ).otherwise(F.col("o_orderkey") % 5)
    a = o.filter((F.col("o_orderkey") % 2 == 0)
                 & (F.col("o_orderkey") <= 4000)).select(k(7).alias("ka"))
    b = o.filter((F.col("o_orderkey") % 2 == 1)
                 & (F.col("o_orderkey") <= 4000)).select(k(11).alias("kb"))
    j = a.join(b, a.ka.eqNullSafe(b.kb))
    return (
        j.select(
            F.coalesce(F.col("ka").cast("string"), F.lit("NULL"))
            .alias("k"))
        .groupBy("k")
        .agg(F.count("*").alias("n"))
        .orderBy("k")
    )

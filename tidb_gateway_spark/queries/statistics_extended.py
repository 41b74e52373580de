"""Q187–Q192: robust-statistics and time-series operators —
consecutive-duplicate compression, grouped median absolute deviation,
time-weighted averages, an array-function bank, equi-depth binning and
a chi-square contingency test.

The reference relays these workloads as opaque SQL to its backends
(/root/reference/gateway/relay.go:47-66); each is declared here as a
DataFrame plan with a DuckDB oracle twin.

Scale design notes (100 TB):

* q187's dedup decision is a LAG over the per-user window — one keyed
  shuffle, state is one row; the output is per-type counts with XOR
  checksums (float sums would need quantization; integer checksums
  hash-match exactly at any scale).
* q188 computes each group's median once (|groups| rows), broadcasts
  it back onto the scan, and aggregates deviations — two passes by
  necessity (MAD is defined over the first median), both
  partial-aggregated.
* q189's weights are integer event-time gaps (epoch micros) from ONE
  window pass; weighted sum and weight total ride the same groupBy.
* q191's bin assignment is ntile over a per-key-unique ordering
  (value, key) — deterministic on ties — and the result is a
  |bins|-row aggregate.
* q192 is three tiny aggregates (cell, row, column margins) joined on
  broadcastable dimension-sized keys; the chi-square sum is quantized
  before the cross-engine compare.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tidb_gateway_spark.catalog import load_table
from tidb_gateway_spark.functions import stable_round
from tidb_gateway_spark.queries.registry import register


# ---------------------------------------------------------------- Q187
_Q187_ORACLE = (
    "WITH s AS (SELECT event_type, event_id, value, "
    "LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pv "
    "FROM events), "
    "kept AS (SELECT event_type, event_id FROM s "
    "WHERE pv IS NULL OR value <> pv OR value IS NULL) "
    "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS kept_n, "
    "CAST(bit_xor(event_id) AS BIGINT) AS id_xor "
    "FROM kept GROUP BY event_type ORDER BY event_type"
)


@register(
    "q187_consecutive_dedup_compress",
    _Q187_ORACLE,
    doc="Consecutive-duplicate compression (the sensor/CDC 'repeated "
        "state' filter): drop an event when its value equals the same "
        "user's immediately preceding value — LAG over one per-user "
        "window, single keyed shuffle, one row of window state.  "
        "Declared output is per-type kept counts with an event_id XOR "
        "checksum certifying exactly WHICH rows survived (exact float "
        "equality is deterministic; float SUMS would not be).",
    tags=("timeseries", "window", "dedup"),
)
def q187(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = e.select(
        "event_type", "event_id", "value",
        F.lag("value").over(w).alias("pv"),
    )
    kept = s.filter(
        F.col("pv").isNull()
        | (F.col("value") != F.col("pv"))
        | F.col("value").isNull()
    )
    return (
        kept.groupBy("event_type")
        .agg(
            F.count("*").alias("kept_n"),
            F.bit_xor("event_id").alias("id_xor"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------- Q188
_Q188_ORACLE = (
    "WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med "
    "FROM events WHERE value IS NOT NULL GROUP BY event_type), "
    "dev AS (SELECT e.event_type, ABS(e.value - m.med) AS d, m.med "
    "FROM events e JOIN med m USING (event_type) "
    "WHERE e.value IS NOT NULL), "
    "mad AS (SELECT event_type, MAX(med) AS med, "
    "quantile_cont(d, 0.5) AS mad FROM dev GROUP BY event_type) "
    "SELECT d.event_type, "
    "FLOOR(MAX(m.med) * 1e6 + 0.5) / 1e6 AS med, "
    "FLOOR(MAX(m.mad) * 1e6 + 0.5) / 1e6 AS mad, "
    "CAST(SUM(CASE WHEN ABS(d.value - m.med) > 3 * m.mad THEN 1 ELSE 0 "
    "END) AS BIGINT) AS outliers "
    "FROM events d JOIN mad m USING (event_type) "
    "WHERE d.value IS NOT NULL "
    "GROUP BY d.event_type ORDER BY d.event_type"
)


@register(
    "q188_mad_robust_outliers",
    _Q188_ORACLE,
    doc="Median-absolute-deviation outlier gate — the robust "
        "alternative to q137's 3σ rule (a handful of extreme values "
        "shift a mean+stddev gate; the median pair is unmoved): per "
        "type, median, MAD, and the |x − med| > 3·MAD outlier count.  "
        "Three passes by definition (MAD is a median OF deviations "
        "FROM a median); each is a partial-aggregated scan with the "
        "|types|-row result broadcast back, never a corpus-sized "
        "join side.  Exact interpolated percentile on both engines; "
        "med/mad quantized at 1e-6 before the compare.",
    tags=("analytics", "robust", "agg"),
)
def q188(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull())
    med = e.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med"))
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_type", "value", "med",
        F.abs(F.col("value") - F.col("med")).alias("d"),
    )
    mad = dev.groupBy("event_type").agg(
        F.max("med").alias("med"),
        F.percentile("d", F.lit(0.5)).alias("mad"),
    )
    return (
        e.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            stable_round(F.max("med"), 6).alias("med"),
            stable_round(F.max("mad"), 6).alias("mad"),
            F.sum(
                (F.abs(F.col("value") - F.col("med"))
                 > 3 * F.col("mad")).cast("int")
            ).cast("bigint").alias("outliers"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------- Q189
_Q189_ORACLE = (
    "WITH s AS (SELECT user_id, value, "
    "epoch_us(ts) AS t, "
    "LEAD(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
    "AS nt FROM events WHERE value IS NOT NULL), "
    "w AS (SELECT user_id, value, nt - t AS dur FROM s "
    "WHERE nt IS NOT NULL) "
    "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS intervals, "
    "CAST(SUM(dur) AS BIGINT) AS span_us, "
    "FLOOR(SUM(value * dur) / SUM(dur) * 1e6 + 0.5) / 1e6 AS twap "
    "FROM w GROUP BY user_id HAVING SUM(dur) > 0 "
    "ORDER BY user_id LIMIT 100"
)


@register(
    "q189_time_weighted_average",
    _Q189_ORACLE,
    doc="Time-weighted average (TWAP — the metrics/finance aggregate "
        "where a value 'holds' until the next observation): each "
        "reading weighted by its hold duration from LEAD over one "
        "per-user window; weights are INTEGER epoch-micro gaps so the "
        "only float work is the final weighted mean (quantized 1e-6).  "
        "Window and final groupBy share the user_id shuffle.",
    tags=("timeseries", "window", "analytics"),
)
def q189(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = F.unix_micros("ts")
    s = e.select(
        "user_id", "value",
        t.alias("t"),
        F.lead(t).over(w).alias("nt"),
    ).filter(F.col("nt").isNotNull())
    dur = F.col("nt") - F.col("t")
    return (
        s.select("user_id", "value", dur.alias("dur"))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("intervals"),
            F.sum("dur").alias("span_us"),
            stable_round(
                F.sum(F.col("value") * F.col("dur")) / F.sum("dur"), 6
            ).alias("twap"),
        )
        .filter(F.col("span_us") > 0)
        .orderBy("user_id")
        .limit(100)
    )


# ---------------------------------------------------------------- Q190
_Q190_ORACLE = (
    "WITH a AS (SELECT n_nationkey AS k, "
    "range(1, (n_nationkey % 5) + 3) AS arr FROM nation) "
    "SELECT k, CAST(len(arr) AS INT) AS n, "
    "array_to_string(list_sort(list_transform(arr, "
    "x -> CAST((x * 7) % 5 AS BIGINT))), ',') AS sorted_mod, "
    "CAST(list_position(arr, 2) AS INT) AS pos2, "
    "array_to_string(list_filter(arr, x -> x % 2 = 0), ',') AS evens, "
    "array_to_string(list_reverse(arr), ',') AS rev, "
    "array_to_string(arr[2:3], ',') AS mid "
    "FROM a ORDER BY k"
)


@register(
    "q190_array_function_bank",
    _Q190_ORACLE,
    doc="Array-function surface bank (complements q54/q55 access + "
        "q126 maps + q161 structs): sequence construction, size, "
        "transform+sort, position, filter, reverse, slice — each with "
        "an exact DuckDB list twin (1-based slice bounds align with "
        "Spark's slice(start, length)).  Dimension-sized input; the "
        "point is cross-engine semantics of the array algebra, not "
        "volume.  Every array result is serialized via "
        "array_join(col, ',') (DuckDB: array_to_string) so the "
        "declared output is scalar-only — the driver canonicalizer "
        "hashes pandas frames and raw array cells are unhashable "
        "(CORRECTNESS_r07 q190 red).",
    tags=("scalar", "array"),
)
def q190(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    # element type pinned to bigint: DuckDB range() yields BIGINT lists
    arr = F.sequence(
        F.lit(1).cast("bigint"),
        (F.col("n_nationkey").cast("bigint") % 5) + 2,
    )
    a = n.select(F.col("n_nationkey").alias("k"), arr.alias("arr"))
    return a.select(
        "k",
        F.size("arr").alias("n"),
        F.array_join(
            F.sort_array(
                F.expr("transform(arr, x -> CAST((x * 7) % 5 AS BIGINT))")
            ),
            ",",
        ).alias("sorted_mod"),
        F.expr("CAST(array_position(arr, 2) AS INT)").alias("pos2"),
        F.array_join(
            F.expr("filter(arr, x -> x % 2 = 0)"), ","
        ).alias("evens"),
        F.array_join(F.reverse("arr"), ",").alias("rev"),
        F.array_join(F.slice("arr", 2, 2), ",").alias("mid"),
    ).orderBy("k")


# ---------------------------------------------------------------- Q191
_Q191_BINS = 10
_Q191_ORACLE = (
    "WITH b AS (SELECT o_totalprice AS x, "
    f"NTILE({_Q191_BINS}) OVER (ORDER BY o_totalprice, o_orderkey) AS bin "
    "FROM orders) "
    "SELECT CAST(bin AS INT) AS bin, CAST(COUNT(*) AS BIGINT) AS n, "
    "MIN(x) AS lo, MAX(x) AS hi "
    "FROM b GROUP BY bin ORDER BY bin"
)


@register(
    "q191_equidepth_binning",
    _Q191_ORACLE,
    doc="Equi-depth (quantile) binning of order totals — the "
        "histogram-equalized counterpart to q181's equi-width bins "
        "and the basis of optimizer histograms and feature bucketing: "
        "NTILE over a per-row-unique ordering (value, key — "
        "deterministic on ties), then per-bin count and [lo, hi] "
        "boundaries — via the scale-safe two-pass global_ntile "
        "(operators/rank.py): range-partitioned row numbers + "
        "arithmetic, NO single-partition sort (the WindowExec "
        "anti-pattern a bare Window.orderBy would plan).",
    tags=("analytics", "window", "histogram"),
)
def q191(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tidb_gateway_spark.operators.rank import global_ntile

    o = load_table(spark, sf_dir, "orders")
    b = global_ntile(
        o.select("o_totalprice", "o_orderkey"),
        _Q191_BINS,
        ["o_totalprice", "o_orderkey"],
        out_col="bin",
    ).select(F.col("o_totalprice").alias("x"), "bin")
    return (
        b.groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.min("x").alias("lo"),
            F.max("x").alias("hi"),
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------- Q192
_Q192_ORACLE = (
    "WITH cell AS (SELECT lang, source, CAST(COUNT(*) AS DOUBLE) AS o "
    "FROM documents GROUP BY 1, 2), "
    "r AS (SELECT lang, SUM(o) AS rt FROM cell GROUP BY 1), "
    "c AS (SELECT source, SUM(o) AS ct FROM cell GROUP BY 1), "
    "n AS (SELECT SUM(o) AS n FROM cell), "
    "chi AS (SELECT SUM((cell.o - r.rt * c.ct / n.n) * "
    "(cell.o - r.rt * c.ct / n.n) / (r.rt * c.ct / n.n)) AS chi2, "
    "COUNT(DISTINCT cell.lang) AS nr, COUNT(DISTINCT cell.source) AS nc, "
    "MAX(n.n) AS n FROM cell JOIN r USING (lang) JOIN c USING (source) "
    "CROSS JOIN n) "
    "SELECT FLOOR(chi2 * 1e4 + 0.5) / 1e4 AS chi2, "
    "CAST((nr - 1) * (nc - 1) AS BIGINT) AS dof, "
    "CAST(n AS BIGINT) AS n, "
    "FLOOR(SQRT(chi2 / (n * LEAST(nr - 1, nc - 1))) * 1e6 + 0.5) / 1e6 "
    "AS cramers_v FROM chi"
)


@register(
    "q192_chisq_contingency",
    _Q192_ORACLE,
    doc="Chi-square independence test + Cramér's V over the lang × "
        "source contingency table — the 'is my corpus mix confounded' "
        "screen run before attributing quality differences to a "
        "source: observed cell counts vs margin-product expectations.  "
        "One scan to dimension-sized cells; margins and N derive from "
        "the cell aggregate (no second scan); the statistic is "
        "quantized before the cross-engine compare.",
    tags=("analytics", "stats", "governance"),
)
def q192(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    cell = d.groupBy("lang", "source").agg(
        F.count("*").cast("double").alias("o"))
    r = cell.groupBy("lang").agg(F.sum("o").alias("rt"))
    c = cell.groupBy("source").agg(F.sum("o").alias("ct"))
    n = cell.agg(F.sum("o").alias("n"))
    e = F.col("rt") * F.col("ct") / F.col("n")
    chi = (
        cell.join(F.broadcast(r), "lang")
        .join(F.broadcast(c), "source")
        .crossJoin(F.broadcast(n))
        .agg(
            F.sum((F.col("o") - e) * (F.col("o") - e) / e).alias("chi2"),
            F.countDistinct("lang").alias("nr"),
            F.countDistinct("source").alias("nc"),
            F.max("n").alias("n"),
        )
    )
    return chi.select(
        stable_round(F.col("chi2"), 4).alias("chi2"),
        ((F.col("nr") - 1) * (F.col("nc") - 1)).cast("bigint").alias("dof"),
        F.col("n").cast("bigint").alias("n"),
        stable_round(
            F.sqrt(
                F.col("chi2")
                / (F.col("n") * F.least(F.col("nr") - 1, F.col("nc") - 1))
            ), 6
        ).alias("cramers_v"),
    )

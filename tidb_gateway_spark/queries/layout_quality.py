"""Q193–Q196: physical-layout and feature-quality operators —
Z-order locality, duplicate-n-gram coverage (Gopher), incremental
aggregate maintenance, and quantile normalization.

The reference relays these workloads as opaque SQL to its backends
(/root/reference/gateway/relay.go:47-66); each is declared here as a
DataFrame plan with a DuckDB oracle twin.

Scale design notes (100 TB):

* q193's Z-value is pure codegen'd bit arithmetic over broadcast
  min/max scalars — the interleave that makes multi-dimensional
  min/max pruning work when a table is sorted+written by z.  The
  declared output (per-z-bucket spans of BOTH dimensions) is the
  locality evidence: every bucket covers a narrow range of each
  column, which is exactly what row-group min/max stats prune on.
* q194 is the Gopher duplicate-5-gram coverage filter: one explode →
  one (doc, gram) partial-aggregated groupBy; the decile is integer
  arithmetic so the histogram hash-matches bit-for-bit.
* q195 demonstrates the mergeable-state contract every 100 TB
  pipeline relies on (incremental view maintenance, rollup serving,
  sketch unions): re-aggregating partial states MUST equal the
  direct aggregate; count/sum/min/max decompose, and the declared
  booleans certify it per group.
* q196's per-dimension rank normalization partitions the window by
  dimension index — |dims| independent sorts, each n-rows long, no
  global sort; ranks are integers (value, vec_id tiebreak) so the
  only float is the final normalized mean.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tidb_gateway_spark.catalog import load_table
from tidb_gateway_spark.functions import stable_round
from tidb_gateway_spark.operators.partitioning import ensure_min_partitions
from tidb_gateway_spark.queries.registry import register


# ---------------------------------------------------------------- Q193
_ZBITS = 10  # per-dimension quantization bits; z has 2*_ZBITS bits


def _z_interleave_sql(xq: str, yq: str) -> str:
    """Bit-interleave two {_ZBITS}-bit ints: x in even, y in odd bits."""
    terms = []
    for i in range(_ZBITS):
        terms.append(f"((({xq} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({yq} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


_Q193_ORACLE = (
    "WITH mm AS (SELECT MIN(o_totalprice) AS xlo, MAX(o_totalprice) AS xhi, "
    "MIN(o_custkey) AS ylo, MAX(o_custkey) AS yhi FROM orders), "
    "q AS (SELECT "
    f"CAST(LEAST({2**_ZBITS - 1}, FLOOR((o_totalprice - mm.xlo) * {2**_ZBITS} "
    "/ (mm.xhi - mm.xlo))) AS BIGINT) AS xq, "
    f"CAST(LEAST({2**_ZBITS - 1}, FLOOR((o_custkey - mm.ylo) * {2**_ZBITS}.0 "
    "/ (mm.yhi - mm.ylo))) AS BIGINT) AS yq FROM orders, mm), "
    "z AS (SELECT xq, yq, (" + _z_interleave_sql("xq", "yq") + ") AS zv "
    "FROM q) "
    f"SELECT CAST(zv >> {2 * _ZBITS - 6} AS INT) AS zbucket, "
    "CAST(COUNT(*) AS BIGINT) AS n, "
    "CAST(MIN(xq) AS INT) AS x_lo, CAST(MAX(xq) AS INT) AS x_hi, "
    "CAST(MIN(yq) AS INT) AS y_lo, CAST(MAX(yq) AS INT) AS y_hi "
    "FROM z GROUP BY zbucket ORDER BY zbucket"
)


@register(
    "q193_zorder_locality",
    _Q193_ORACLE,
    doc="Z-order (Morton) clustering key over (o_totalprice, "
        "o_custkey): quantize each dimension to 10 bits against "
        "broadcast min/max scalars, bit-interleave into a 20-bit "
        "Z-value — all codegen'd integer arithmetic — and report "
        "per-Z-bucket row counts plus the span of BOTH dimensions.  "
        "Every bucket covering a narrow range of every clustered "
        "column is the property that makes parquet row-group min/max "
        "stats prune multi-column predicates after a sort-by-z "
        "rewrite (a 1-D sort gives this for one column only).  The "
        "64 buckets here are the top-6 z bits, i.e. the file "
        "boundaries a Delta/Iceberg OPTIMIZE ZORDER would draw.",
    tags=("layout", "governance", "scalar"),
)
def q193(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    mm = o.agg(
        F.min("o_totalprice").alias("xlo"), F.max("o_totalprice").alias("xhi"),
        F.min("o_custkey").alias("ylo"), F.max("o_custkey").alias("yhi"),
    )
    top = 2**_ZBITS - 1
    q = o.crossJoin(F.broadcast(mm)).select(
        F.least(
            F.lit(top),
            F.floor(
                (F.col("o_totalprice") - F.col("xlo")) * (2**_ZBITS)
                / (F.col("xhi") - F.col("xlo"))
            ),
        ).cast("bigint").alias("xq"),
        F.least(
            F.lit(top),
            F.floor(
                (F.col("o_custkey") - F.col("ylo")) * float(2**_ZBITS)
                / (F.col("yhi") - F.col("ylo"))
            ),
        ).cast("bigint").alias("yq"),
    )
    z = q.select(
        "xq", "yq", F.expr(_z_interleave_sql("xq", "yq")).alias("zv"))
    return (
        z.select(
            F.shiftright("zv", 2 * _ZBITS - 6).cast("int").alias("zbucket"),
            "xq", "yq",
        )
        .groupBy("zbucket")
        .agg(
            F.count("*").alias("n"),
            F.min("xq").cast("int").alias("x_lo"),
            F.max("xq").cast("int").alias("x_hi"),
            F.min("yq").cast("int").alias("y_lo"),
            F.max("yq").cast("int").alias("y_hi"),
        )
        .orderBy("zbucket")
    )


# ---------------------------------------------------------------- Q194
_Q194_N = 5

_Q194_ORACLE = (
    # 5-gram multiset per doc; coverage = chars in grams occurring >1
    # time within the doc / chars in all grams — deciles by integer math
    "WITH wl AS (SELECT doc_id, list_filter(string_split(text, ' '), "
    "x -> x <> '') AS wl FROM documents), "
    "g AS (SELECT doc_id, "
    f"array_to_string(wl[CAST(i AS INT):CAST(i + {_Q194_N - 1} AS INT)], ' ') AS gram "
    f"FROM wl, UNNEST(range(1, len(wl) - {_Q194_N - 2})) AS u(i) "
    f"WHERE len(wl) >= {_Q194_N}), "
    "cnt AS (SELECT doc_id, gram, COUNT(*) AS c, "
    "CAST(len(gram) AS BIGINT) AS L FROM g GROUP BY 1, 2), "
    "per AS (SELECT doc_id, "
    "SUM(CASE WHEN c > 1 THEN c * L ELSE 0 END) AS dup_chars, "
    "SUM(c * L) AS all_chars FROM cnt GROUP BY 1) "
    "SELECT CAST((dup_chars * 10) // all_chars AS INT) AS bucket, "
    "CAST(COUNT(*) AS BIGINT) AS n_docs "
    "FROM per WHERE all_chars > 0 GROUP BY 1 ORDER BY bucket"
)


@register(
    "q194_dup_ngram_coverage",
    _Q194_ORACLE,
    doc="Gopher duplicate-5-gram character coverage — the published "
        "repetition filter q104's top-n-gram fraction approximates "
        "from above: per document, the fraction of n-gram characters "
        "belonging to grams that repeat WITHIN the document, "
        "histogrammed to deciles by integer arithmetic "
        "(bit-identical cross-engine).  One explode → one "
        "partial-aggregated (doc, gram) groupBy → one per-doc "
        "aggregate; shuffles carry counts, never text beyond the "
        "gram keys.",
    tags=("llm", "text", "quality"),
)
def q194(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tidb_gateway_spark.operators import dedup

    d = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    # docs with < n words carry no n-gram (doc_shingles would fold them
    # to one whole-text gram; the oracle's len >= n guard drops them) —
    # filter BEFORE shingling so both engines see the same domain
    t = F.trim(F.col("text"))
    d = d.filter((t != "") & (F.size(F.split(t, " +")) >= _Q194_N))
    # distinct=False keeps within-doc duplicates — the signal measured.
    # Group on the gram HASH with the char length carried alongside
    # (the q103 lesson): xxhash64 makes the key an 8-byte BIGINT — half
    # the 16-hex md5 prefix's shuffle bytes and cheaper to compute —
    # with the same 64-bit per-doc collision class (a 32-bit key was
    # rejected: ~1e-4 birthday odds per 1k-gram doc flips real buckets
    # at sf1).  r8 pinned measurement (the r7 "1.24× idle" claim did
    # not reproduce — VERDICT r7 directive 4): best-of-7 same-process
    # sweep at sf1 = 2.09 s vs DuckDB 0.99 s = 2.11×, WITH the
    # skeleton floor recorded in BASELINE.md: the map-only
    # shingle+hash pass alone (no exchange, no aggregate) is 1.03 s ≈
    # 1.1× DuckDB's WHOLE query, so no plan that materializes the
    # gram stream beats ~1.1× — the residual above the floor is one
    # gram-sized exchange + two co-partitioned aggregates.
    # ONE exchange for the whole query, placed BEFORE the explode
    # (r10): hash-partitioning the DOCUMENT rows on doc_id satisfies
    # the ClusteredDistribution of BOTH downstream groupBys (subset
    # clustering flows through Generate/Project), so the gram stream
    # never shuffles at all — the exchange carries raw text at
    # ~bytes(corpus), several times fewer bytes than the r8 form's
    # gram-hash stream (~n_words × 30 B/doc vs ~600 B/doc of text).
    # Doc-key skew is bounded by document length, the same bound the
    # per-doc aggregate itself requires.  The explicit partition count
    # (session parallelism) keeps doc_shingles' inner
    # ensure_min_partitions a no-op — a bare repartition("doc_id")
    # plans shuffle.partitions, which that guard would then wrap in a
    # round-robin exchange, destroying the hash clustering.
    from tidb_gateway_spark.operators.partitioning import (
        session_parallelism,
    )

    d = d.repartition(session_parallelism(spark), "doc_id")
    g = dedup.doc_shingles(d, n=_Q194_N, distinct=False).select(
        "doc_id",
        F.xxhash64("w").alias("gh"),
        F.length("w").cast("bigint").alias("L"),
    )
    cnt = g.groupBy("doc_id", "gh").agg(
        F.count("*").alias("c"), F.max("L").alias("L"))
    per = cnt.groupBy("doc_id").agg(
        F.sum(F.when(F.col("c") > 1, F.col("c") * F.col("L"))
              .otherwise(F.lit(0))).alias("dup_chars"),
        F.sum(F.col("c") * F.col("L")).alias("all_chars"),
    )
    return (
        per.filter(F.col("all_chars") > 0)
        .select(
            F.floor(F.col("dup_chars") * 10 / F.col("all_chars"))
            .cast("int").alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("bucket")
    )


# ---------------------------------------------------------------- Q195
_Q195_ORACLE = (
    "WITH base AS (SELECT * FROM events WHERE event_id % 10 < 8), "
    "delta AS (SELECT * FROM events WHERE event_id % 10 >= 8), "
    "pb AS (SELECT event_type, COUNT(*) AS n, SUM(value) AS s, "
    "MIN(value) AS mn, MAX(value) AS mx FROM base GROUP BY 1), "
    "pd AS (SELECT event_type, COUNT(*) AS n, SUM(value) AS s, "
    "MIN(value) AS mn, MAX(value) AS mx FROM delta GROUP BY 1), "
    "merged AS (SELECT event_type, SUM(n) AS n, SUM(s) AS s, "
    "MIN(mn) AS mn, MAX(mx) AS mx FROM "
    "(SELECT * FROM pb UNION ALL SELECT * FROM pd) GROUP BY 1), "
    "direct AS (SELECT event_type, COUNT(*) AS n, SUM(value) AS s, "
    "MIN(value) AS mn, MAX(value) AS mx FROM events GROUP BY 1) "
    "SELECT m.event_type, CAST(m.n AS BIGINT) AS n, "
    "FLOOR(m.s * 1e4 + 0.5) / 1e4 AS s, m.mn AS mn, m.mx AS mx, "
    "(m.n = d.n AND m.mn = d.mn AND m.mx = d.mx AND "
    "ABS(m.s - d.s) < 1e-6 * ABS(d.s)) AS consistent "
    "FROM merged m JOIN direct d USING (event_type) ORDER BY m.event_type"
)


@register(
    "q195_incremental_agg_maintenance",
    _Q195_ORACLE,
    doc="Incremental view maintenance: a materialized per-type "
        "aggregate state (count/sum/min/max over the 80% base) merged "
        "with a delta batch's partial state must equal the direct "
        "aggregate over everything — the mergeable-state contract "
        "behind rollup serving (q112), sketch unions (q113/q129) and "
        "every incremental 100 TB pipeline.  The declared booleans "
        "certify the algebra per group (exact for count/min/max, "
        "relative-1e-6 for the float sum whose addition ORDER "
        "legitimately differs between merged and direct plans).",
    tags=("governance", "agg", "incremental"),
)
def q195(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count("*").alias("n"), F.sum("value").alias("s"),
            F.min("value").alias("mn"), F.max("value").alias("mx"),
        )

    # base and delta partial states from ONE corpus scan: the batch id
    # is just another grouping key of the same aggregate (r11 — the
    # old two-filtered-scans form read events three times; a real IVM
    # pipeline computes each arriving batch's partial in the batch's
    # own single pass exactly like this flag-keyed aggregate does).
    # `direct` stays an INDEPENDENT full-scan aggregate — deriving it
    # from the same partials would make the merge ≡ direct certificate
    # vacuous.
    parts = (
        e.withColumn("b", (F.col("event_id") % 10 < 8).cast("int"))
        .groupBy("b", "event_type")
        .agg(
            F.count("*").alias("n"), F.sum("value").alias("s"),
            F.min("value").alias("mn"), F.max("value").alias("mx"),
        )
    )
    merged = (
        parts.groupBy("event_type")
        .agg(
            F.sum("n").alias("n"), F.sum("s").alias("s"),
            F.min("mn").alias("mn"), F.max("mx").alias("mx"),
        )
    )
    direct = partial(e).select(
        "event_type", F.col("n").alias("dn"), F.col("s").alias("ds"),
        F.col("mn").alias("dmn"), F.col("mx").alias("dmx"),
    )
    return (
        merged.join(direct, "event_type")
        .select(
            "event_type",
            F.col("n").cast("bigint").alias("n"),
            stable_round(F.col("s"), 4).alias("s"),
            "mn", "mx",
            (
                (F.col("n") == F.col("dn"))
                & (F.col("mn") == F.col("dmn"))
                & (F.col("mx") == F.col("dmx"))
                & (F.abs(F.col("s") - F.col("ds"))
                   < 1e-6 * F.abs(F.col("ds")))
            ).alias("consistent"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------- Q196
_Q196_DIMS = 4

_Q196_ORACLE = (
    "WITH dims AS (SELECT vec_id, label, "
    "CAST(embedding[CAST(u.i AS INT) + 1] AS DOUBLE) AS x, u.i AS pos "
    f"FROM embeddings, UNNEST(range(0, {_Q196_DIMS})) AS u(i)), "
    "r AS (SELECT label, pos, "
    "ROW_NUMBER() OVER (PARTITION BY pos ORDER BY x, vec_id) AS rk, "
    "COUNT(*) OVER (PARTITION BY pos) AS n FROM dims) "
    "SELECT label, CAST(pos AS INT) AS pos, "
    "FLOOR(AVG((rk - 1.0) / (n - 1.0)) * 1e6 + 0.5) / 1e6 AS avg_norm "
    "FROM r GROUP BY 1, 2 ORDER BY label, pos"
)


@register(
    "q196_quantile_normalization",
    _Q196_ORACLE,
    doc="Quantile (rank) normalization of embedding dimensions — the "
        "feature-scaling pass that maps each dimension to [0,1] by "
        "rank, immune to outliers where min-max scaling is not: "
        "per-dimension ROW_NUMBER windows (partitioned by dimension "
        "index — |dims| independent n-row sorts, no global sort), "
        "normalized rank (rk−1)/(n−1), then the per-label mean as the "
        "declared drift check (a label whose mean normalized value "
        "strays from 0.5 is distributionally skewed in that "
        "dimension).  Ranks are integers with a vec_id tiebreak; the "
        "only float is the final mean, quantized 1e-6.",
    tags=("llm", "embedding", "analytics"),
)
def q196(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    dims = e.select(
        "vec_id", "label",
        F.posexplode(F.slice("embedding", 1, _Q196_DIMS)).alias("pos", "xf"),
    ).select(
        "vec_id", "label", "pos", F.col("xf").cast("double").alias("x"))
    w = Window.partitionBy("pos").orderBy("x", "vec_id")
    wn = Window.partitionBy("pos")
    r = dims.select(
        "label", "pos",
        F.row_number().over(w).alias("rk"),
        F.count("*").over(wn).alias("n"),
    )
    norm = (F.col("rk") - 1.0) / (F.col("n") - 1.0)
    return (
        r.groupBy("label", "pos")
        .agg(stable_round(F.avg(norm), 6).alias("avg_norm"))
        .orderBy("label", "pos")
    )


# ---------------------------------------------------------------- Q199
# The declared box predicate: a narrow rectangle of the
# (o_totalprice, o_custkey) plane, constant across scale factors so
# the oracle SQL can carry it literally.
_Q199_X = (60000.0, 120000.0)   # o_totalprice box
_Q199_Y = (10.0, 120.0)         # o_custkey box

_Q199_ORACLE = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS n, "
    "FLOOR(SUM(o_totalprice) * 100 + 0.5) / 100 AS tp, "
    "CAST(MIN(o_orderkey) AS BIGINT) AS k_lo, "
    "CAST(MAX(o_orderkey) AS BIGINT) AS k_hi "
    f"FROM orders WHERE o_totalprice BETWEEN {_Q199_X[0]} AND {_Q199_X[1]} "
    f"AND o_custkey BETWEEN {_Q199_Y[0]} AND {_Q199_Y[1]}"
)

_q199_lock = __import__("threading").Lock()


def _q199_zcopy(spark: SparkSession, sf_dir: str):
    """Materialize the z-ordered copy of ``orders`` once per fixture
    (mtime-keyed, like the CSV/ORC companions and the ANN indexes:
    the write is ingest cost; the query measures the serving path).
    Bounds come from one metadata-sized min/max aggregate — the
    ANALYZE statistics a 100 TB table would pin — and are stored next
    to the data so readers recompute bucket rectangles without
    scanning.  Returns (path, bounds)."""
    import hashlib
    import json
    import os

    from tidb_gateway_spark.operators import layout
    from tidb_gateway_spark.sources import derived

    src = os.path.abspath(os.path.join(sf_dir, "orders.parquet"))
    key = hashlib.md5(f"zorder|{src}".encode()).hexdigest()[:16]
    path = derived.derived_path("zorder", key)
    stats = os.path.join(path, "_zbounds.json")
    with _q199_lock:
        if not derived.is_fresh(path, src, marker="_zbounds.json"):
            o = load_table(spark, sf_dir, "orders")
            row = o.agg(
                F.min("o_totalprice"), F.max("o_totalprice"),
                F.min("o_custkey").cast("double"),
                F.max("o_custkey").cast("double"),
            ).collect()[0]
            bounds = tuple(float(v) for v in row)
            layout.zorder_write(
                o, "o_totalprice", "o_custkey", path,
                (bounds[0], bounds[1], bounds[2], bounds[3]))
            with open(stats, "w") as f:
                json.dump(bounds, f)
        else:
            with open(stats) as f:
                bounds = tuple(json.load(f))
    return path, bounds


@register(
    "q199_zorder_roundtrip",
    _Q199_ORACLE,
    doc="Z-order layout certified end-to-end (completes q193, which "
        "declares only the Morton math): orders is written once "
        "partitioned by z-bucket (operators/layout.zorder_write — the "
        "Delta/Iceberg OPTIMIZE ZORDER pattern in plain parquet, "
        "bounds pinned from an ANALYZE-style min/max aggregate), and "
        "the declared two-column box query is served through "
        "zorder_read: the box maps driver-side to candidate z-buckets "
        "(arithmetic over 64 bucket rectangles, never touches data) "
        "so `zbucket IN (…)` lands in PartitionFilters and the scan "
        "reads only intersecting rectangles, with the exact ranges as "
        "row-level residuals.  The ORACLE computes the same aggregate "
        "from the RAW parquet — a hash match certifies that layout + "
        "pruning lose no rows and duplicate none.  The plan-level "
        "pruning assertion lives in tests/test_plans.py.",
    tags=("layout", "source", "scalar"),
)
def q199(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tidb_gateway_spark.operators import layout

    path, bounds = _q199_zcopy(spark, sf_dir)
    boxed = layout.zorder_read(
        spark, path, "o_totalprice", "o_custkey",
        _Q199_X, _Q199_Y, bounds)
    return boxed.agg(
        F.count("*").cast("bigint").alias("n"),
        stable_round(F.sum("o_totalprice"), 2).alias("tp"),
        F.min("o_orderkey").cast("bigint").alias("k_lo"),
        F.max("o_orderkey").cast("bigint").alias("k_hi"),
    )

"""Deduplication operator family for document corpora.

Tiers (all pure DataFrame transforms, no driver-side loops):

* exact — hash-groupBy on md5(text): the shuffle carries 32-char hashes,
  never document bodies.  O(n) one shuffle.
* MinHash + LSH — per-doc signature of k minimum keyed hashes over the
  word set, banded so that documents sharing any band collide; candidate
  pairs come from an equi-join on (band, band_value).  This is the
  100 TB near-dup path: the band join is a plain shuffle join whose key
  cardinality grows with the corpus, so it parallelizes; no pairwise
  O(n²) stage ever materializes.
* SimHash — per-doc b-bit signature from signed sums of word-hash bits;
  equal signatures ⇒ near-identical token multisets.
* exact Jaccard verification — computed only on the LSH candidate set.

Determinism: hashes are md5 hex strings (lexicographic min), reproducible
in any engine — the DuckDB oracles in queries/llm_extended.py recompute
identical signatures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tidb_gateway_spark.operators.localrel import local_rows_df
from tidb_gateway_spark.operators.partitioning import ensure_min_partitions

HEX_HIGH = tuple("89abcdef")  # hex digits with the top bit set


def doc_words(documents: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Distinct (doc_id, word) pairs (unigram sets — SimHash features).

    No parallelism guard here (contrast doc_shingles): consumers that
    JOIN on this relation (q74's Jaccard verify) hash AFTER the
    distinct's exchange, which already spreads the work.  Consumers
    that only AGGREGATE per doc should use :func:`doc_word_sets`
    instead — it replaces the corpus-wide distinct shuffle with a
    row-local ``array_distinct``.
    """
    return (
        documents.select(id_col, F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter(F.col("w") != "")
        .distinct()
    )


def doc_word_sets(documents: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Distinct (doc_id, word) pairs via ROW-LOCAL dedup — same set as
    :func:`doc_words`, different plan: ``array_distinct`` inside each
    row replaces the corpus-wide ``.distinct()`` exchange, so per-doc
    aggregating consumers (SimHash signatures) reach their groupBy with
    map-side partial aggregation and ONE narrow shuffle instead of a
    full exploded-corpus wide shuffle.  The parallelism guard
    repartitions the RAW documents (50 k rows ≪ the 5 M exploded pairs
    the distinct would have shuffled) because a compact parquet source
    can be a single input split, which would serialize the per-word
    hashing onto one task.  Measured (sf1, r6): q73 1.9 s → 0.65 s.
    """
    return (
        ensure_min_partitions(documents.select(id_col, text_col))
        .select(
            id_col,
            F.explode(
                F.array_distinct(F.split(F.col(text_col), " "))
            ).alias("w"),
        )
        .filter(F.col("w") != "")
    )


def _shingle_array_sql(n: int) -> str:
    """SQL expression: array<string> of n-word shingles over ``wlist``."""
    return (
        f"CASE WHEN size(wlist) >= {n} THEN "
        f"transform(sequence(1, size(wlist) - {n - 1}), i -> "
        + "concat("
        + ", ' ', ".join(f"element_at(wlist, i + {k})" for k in range(n))
        + ")) ELSE array(concat_ws(' ', wlist)) END"
    )


def doc_shingles(documents: DataFrame, n: int = 3, id_col: str = "doc_id",
                 text_col: str = "text", distinct: bool = True) -> DataFrame:
    """(doc_id, shingle) pairs with n-word shingles (exploded form).

    Shingle choice is load-bearing: unigram sets collapse when the corpus
    shares a small vocabulary (every document collides with every other —
    O(n²) candidate blowup); n-gram shingles have corpus-scale cardinality
    so only genuinely similar documents share them.  Short documents
    (< n words) contribute their whole text as one shingle.

    ``distinct=True`` dedups through a shuffle — deliberately: the
    exchange it creates is a plan-level REUSE POINT, so consumers that
    fan out (q91's benchmark/probe sides, band unions) evaluate the
    shingling once.  Measured at sf0.1, replacing this with map-side
    ``array_distinct`` made q91 18× slower because every fan-out branch
    re-ran the shingle transform against the scan.
    """
    # HOF-free tokens (text.nonempty_words): split(trim, ' +') ≡
    # filter(split(text,' '), x -> x != '') but whole-stage-codegen'd
    # (higher-order filter is CodegenFallback).  Blank docs guard to
    # wlist=[], which _shingle_array_sql's ELSE branch turns into
    # array(concat_ws(' ', wlist)) = array('') — ONE empty-string
    # shingle per blank doc, exactly what the old filter form produced
    # (behavior-identical; blank docs can only band-match each other
    # and are rejected by the Jaccard verify downstream).
    t = F.trim(F.col(text_col))
    out = (
        ensure_min_partitions(documents)
        .select(
            id_col,
            F.when(t != "", F.split(t, " +"))
            .otherwise(F.expr("CAST(array() AS array<string>)"))
            .alias("wlist"),
        )
        .select(id_col, F.explode(F.expr(_shingle_array_sql(n))).alias("w"))
    )
    return out.distinct() if distinct else out


def minhash_signatures(words: DataFrame, k: int = 6, id_col: str = "doc_id") -> DataFrame:
    """k-column MinHash signature per document (columns h0..h{k-1}) from
    an exploded (doc_id, w) frame.

    Single-digest MinHash: ONE md5 per shingle, with the j-th hash
    function taken as the j-th 5-hex-digit (20-bit) slice of the digest —
    slices of a cryptographic digest are independent, the standard
    one-hash-plus-derivation construction (datasketch does the same with
    one base hash and k permutations).  Versus k independent salted md5s
    this cuts the dominant cost (digesting every shingle k times) by k×,
    and the values stay engine-reproducible: the DuckDB oracle computes
    the identical substrings.

    Plan shape: groupBy partial-aggregates map-side, so the shuffle
    carries per-partition minima (≤ k slices per doc per partition),
    never the shingle text; this codegen'd hash-aggregate measured ~6×
    faster at sf0.1 than evaluating the same hashes through interpreted
    higher-order ``transform`` lambdas over per-doc shingle arrays, and
    the aggregate's exchange is a reuse point for the band-union fan-out.

    k ≤ 6 (32 hex chars / 5 per slice).
    """
    if k > 6:
        raise ValueError("single-digest MinHash supports k <= 6 slices")
    h = F.md5(F.col("w"))
    aggs = [
        F.min(F.substring(h, 1 + 5 * j, 5)).alias(f"h{j}")
        for j in range(k)
    ]
    return words.groupBy(id_col).agg(*aggs)


def lsh_bands(signatures: DataFrame, bands: int, rows_per_band: int,
              id_col: str = "doc_id") -> DataFrame:
    """Explode signatures into (doc_id, band, band_value) rows."""
    parts = []
    for b in range(bands):
        cols = [F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
        parts.append(
            signatures.select(
                F.col(id_col), F.lit(b).alias("band"), F.concat(*cols).alias("bv")
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def minhash_lsh_candidates(documents: DataFrame, k: int = 6, bands: int = 3,
                           shingles: DataFrame | None = None) -> DataFrame:
    """Candidate near-dup pairs (a < b) via MinHash banding.

    Two shuffles total: the signature aggregate (partial-aggregated
    map-side, shuffle carries minima only) and the band equi-join.  The
    join key (band, bv) is high-cardinality so it spreads evenly, and
    identical documents (the common hot case) collapse into per-bucket
    groups that AQE's skew handling splits if one bucket explodes.

    Pass a precomputed ``shingles`` frame (doc_shingles) to share the
    shingling across pipeline stages; multiset (distinct=False) input
    gives identical signatures since min is multiset-invariant.
    """
    rows_per_band = k // bands
    sigs = minhash_signatures(
        shingles if shingles is not None else doc_shingles(documents, distinct=False),
        k=k,
    )
    bl = lsh_bands(sigs, bands, rows_per_band)
    x = bl.alias("x")
    y = bl.alias("y")
    return (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bv") == F.col("y.bv"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .distinct()
    )


def simhash(words: DataFrame, bits: int = 16, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, sh) where sh is a {bits}-char '0'/'1' SimHash signature.

    Bit j is the sign of the sum over words of ±1 — +1 when hex digit j
    of md5(word) has its top bit set.  One groupBy shuffle.

    Production note: the md5-hex bit derivation exists for cross-engine
    oracle parity (DuckDB reproduces it in SQL).  A pipeline that owns
    both ends would use ``xxhash64(word)`` directly — one hash, no hex
    round-trip — with identical plan shape; the signature semantics
    (sign of per-bit sums) are unchanged.

    Bit extraction is integer ops, not string ops: the first ``bits``
    hex digits are folded into two longs with ``conv`` (once per word),
    and each bit test is a codegen'd shift+mask — "hex digit j has its
    top bit set" ⟺ ``(half >> 4*pos) & 15 >= 8``.  Byte-identical to
    the previous per-digit substring/isin derivation (same md5 hex
    chars), without ``bits`` substring evaluations per word.
    """
    if bits > 16:
        raise ValueError("simhash supports at most 16 bits (two conv halves)")
    h = F.md5("w")
    hashed = words.select(
        id_col,
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long").alias("_ha"),
        F.conv(F.substring(h, 9, 8), 16, 10).cast("long").alias("_hb"),
    )
    bit_aggs = []
    for j in range(bits):
        half, off = ("_ha", 4 * (7 - j)) if j < 8 else ("_hb", 4 * (15 - j))
        digit = F.shiftright(F.col(half), off).bitwiseAND(F.lit(15))
        bit_aggs.append(
            F.sum(F.when(digit >= 8, 1).otherwise(-1)).alias(f"b{j}")
        )
    per_doc = hashed.groupBy(id_col).agg(*bit_aggs)
    sig = F.concat(
        *[F.when(F.col(f"b{j}") > 0, F.lit("1")).otherwise(F.lit("0")) for j in range(bits)]
    )
    return per_doc.select(F.col(id_col), sig.alias("sh"))


def doc_shingle_arrays(documents: DataFrame, n: int = 3,
                       id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Per-document DISTINCT shingle set as one ARRAY column, computed
    row-locally — no explode, no shuffle.  Same set per doc as
    ``doc_shingles(distinct=True)`` (array_distinct replaces the
    corpus-wide distinct exchange), packaged for consumers that want
    set algebra per ROW (array_intersect Jaccard) instead of per
    exploded pair.  ~115 shingles ≈ 1.5 kB per doc ride the verify
    joins as a payload column."""
    t = F.trim(F.col(text_col))
    return (
        ensure_min_partitions(documents.select(id_col, text_col))
        .select(
            id_col,
            F.when(t != "", F.split(t, " +"))
            .otherwise(F.expr("CAST(array() AS array<string>)"))
            .alias("wlist"),
        )
        .select(
            id_col,
            F.array_distinct(F.expr(_shingle_array_sql(n))).alias("sharr"),
        )
    )


def jaccard_pairs_arrays(candidates: DataFrame,
                         shingle_arrays: DataFrame) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs via row-local set
    algebra: join each pair to the two docs' shingle ARRAYS and take
    ``size(array_intersect)`` — all codegen'd.

    Versus :func:`jaccard_pairs` (explode-join form): that shape
    shuffles |candidates| × |shingles/doc| exploded rows into a
    per-pair groupBy; this one shuffles |candidates| + 2·|docs| rows
    (arrays as payload) through two hash joins and does the
    intersection inside the row — measured 5.5 s → 2.0 s at sf1 for
    the q74 pipeline.  Same output contract as jaccard_pairs."""
    a_arr = shingle_arrays.select(
        F.col("doc_id").alias("a"), F.col("sharr").alias("sa"))
    b_arr = shingle_arrays.select(
        F.col("doc_id").alias("b"), F.col("sharr").alias("sb"))
    i = F.size(F.array_intersect("sa", "sb"))
    union_sz = F.size("sa") + F.size("sb") - i
    return (
        candidates.join(a_arr, "a")
        .join(b_arr, "b")
        .select(
            "a", "b",
            (i.cast("double") / union_sz.cast("double")).alias("jac"),
        )
    )


def jaccard_pairs(candidates: DataFrame, words: DataFrame) -> DataFrame:
    """Exact word-set Jaccard for candidate pairs (a, b) → (a, b, jac).

    Joins the candidate list back to the word sets — cost is proportional
    to the candidate count, not the corpus size squared.  All three uses
    of ``words`` (both join sides and the size aggregate) reuse the same
    exchange when the caller passes the distinct shingle frame that the
    signature stage consumed, so the whole candidate→verify pipeline
    reads the corpus exactly once.
    """
    sizes = words.groupBy("doc_id").agg(F.count("*").alias("sz"))
    wa = words.select(F.col("doc_id").alias("a"), "w")
    wb = words.select(F.col("doc_id").alias("b"), "w")
    inter = (
        candidates.join(wa, "a")
        .join(wb, ["b", "w"])
        .groupBy("a", "b")
        .agg(F.count("*").alias("i"))
    )
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("b"), F.col("sz").alias("nb"))
    return (
        inter.join(sa, "a")
        .join(sb, "b")
        .select(
            "a",
            "b",
            (
                F.col("i").cast("double")
                / (F.col("na") + F.col("nb") - F.col("i")).cast("double")
            ).alias("jac"),
        )
    )


def connected_components(pairs: DataFrame, a_col: str = "a",
                         b_col: str = "b", max_iter: int = 25,
                         driver_max_pairs: int = 1_000_000) -> DataFrame:
    """Group duplicate pairs into clusters: (doc_id, cluster_id) with
    cluster_id = MIN doc_id reachable through the pair graph.

    The last stage of the candidate→verify→cluster dedup pipeline
    (reference relays this to backends; here it is native): q72/q74
    emit PAIRS, but keep-one-per-group needs the transitive closure —
    a-b and b-c must collapse to one cluster {a,b,c} with canonical a.

    Two paths, dispatched on the VERIFIED pair count (known after one
    cheap count on the pinned edge frame):

    * ``≤ driver_max_pairs`` — driver-side union-find.  A verified
      near-dup pair list is metadata-sized relative to the corpus (two
      longs per confirmed duplicate pair, after LSH candidate pruning
      AND exact-Jaccard verification); 1M pairs is 16 MB.  Same class
      of sanctioned collect as the rank boundary sets (operators/
      rank.py): the driver never sees row data, only the tiny graph.
      Union-find is O(pairs α(n)) with zero extra Spark jobs — at
      sf1 this replaces ~6 s of per-round join/checkpoint overhead
      with milliseconds.
    * above the threshold — Spark-first iterative min-label
      propagation with pointer jumping: each round every node takes
      the min label over its neighbors (one shuffle join + groupBy),
      then labels shortcut through their own labels (path halving — a
      second self-join), giving O(log d) rounds for diameter-d
      components.  Per-round lineage is cut with localCheckpoint; the
      convergence check counts changed labels (a scalar action).

    100 TB shape: the big-graph path's state is one (node, label)
    table of long ids — bytes per node, never document bodies; every
    round is two key-partitioned shuffles of that table.  Both paths
    produce identical output (min reachable id is order-free).
    """
    def _pin(df: DataFrame) -> DataFrame:
        try:
            return df.localCheckpoint(eager=True)
        except Exception:  # Connect or checkpoint-less session
            df.persist()
            df.count()
            return df

    # Pin the PAIRS before anything else: the symmetrizing
    # union(e, e.swap) executes the caller's lineage once per branch,
    # so pinning after the union ran the whole candidate→verify
    # pipeline TWICE inside one job (the q209 unionAll lesson,
    # measured ~1 s of re-run pipeline per CC call at sf0.1 — guide
    # §2.4, duplicated subtrees).  Pinned first, every downstream
    # consumer — the gate count, the driver collect, both union
    # branches — reads checkpointed 16-byte rows.
    # The gate counts RAW directed pairs (one count on the pinned
    # frame, no distinct job): callers are expected to pass
    # deduplicated pair lists (every in-repo caller emits
    # candidate-distinct verified pairs).  A heavily duplicated
    # stream — e.g. many LSH bands re-emitting the same pair without
    # a distinct — can exceed the gate despite a tiny distinct edge
    # set and fall onto the slower distributed path; correctness is
    # unaffected either way (duplicate unions are no-ops).  Gating on
    # e.distinct().count() would cost an extra shuffle job on every
    # call to protect a caller pattern that does not exist here.
    e = _pin(pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v")))
    if e.count() <= driver_max_pairs:
        # Union-find is symmetric in its inputs, so the driver path
        # consumes the pinned DIRECTED pairs as-is — the symmetrize +
        # distinct + second checkpoint the distributed path needs
        # (three more jobs) never run here.  Duplicate pairs are
        # harmless no-op unions.
        spark = pairs.sparkSession
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = root, parent[x]
            return root

        edge_rows = e.collect()
        for row in edge_rows:
            ru, rv = find(row.u), find(row.v)
            if ru != rv:
                # union by value: larger root points at smaller, so the
                # final root of every node IS its min reachable id
                parent[max(ru, rv)] = min(ru, rv)
        out = [(u, find(u))
               for u in {x for row in edge_rows for x in (row.u, row.v)}]
        return local_rows_df(
            spark, sorted(out), "doc_id bigint, cluster_id bigint")

    edges = _pin(
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct())
    labels = _pin(edges.select("u").distinct().withColumn("lab", F.col("u")))
    for _ in range(max_iter):
        nbr = (
            edges.join(
                labels.select(F.col("u").alias("v"), F.col("lab").alias("vlab")),
                "v",
            )
            .groupBy("u")
            .agg(F.min("vlab").alias("nlab"))
        )
        stepped = labels.join(nbr, "u", "left").select(
            "u", F.least("lab", F.coalesce("nlab", "lab")).alias("lab")
        )
        # pointer jump: lab := label(lab) — halves chain lengths
        hop = stepped.select(F.col("u").alias("lab"), F.col("lab").alias("lab2"))
        jumped = stepped.join(hop, "lab", "left").select(
            "u", F.coalesce("lab2", "lab").alias("lab")
        )
        jumped = _pin(jumped)
        changed = (
            jumped.join(labels.select("u", F.col("lab").alias("old")), "u")
            .filter(F.col("lab") != F.col("old"))
            .count()
        )
        labels = jumped
        if changed == 0:
            break
    return labels.select(F.col("u").alias("doc_id"), F.col("lab").alias("cluster_id"))


def keep_first(df: DataFrame, key, order_col: str) -> DataFrame:
    """Generic keep-first dedup: one row per key, lowest order_col wins."""
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(order_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def simhash_multiprobe_pairs(documents: DataFrame, bits: int = 16) -> DataFrame:
    """Near-dup pairs within Hamming distance ≤ 1 of their SimHash
    signatures, via multi-probe LSH: each document emits its signature
    plus every 1-bit flip (bits+1 probes), and ``probe(a) == sig(b)``
    holds exactly when hamming(a, b) ≤ 1 — so the equi-join IS the
    distance predicate, with zero false positives and no verify pass.

    This closes the gap q73 documents (equal signatures ⇒ near-identical
    token multisets): exact-equality SimHash misses pairs that differ in
    one noisy bit; multi-probe recovers them for a (bits+1)× probe-side
    blowup while staying a plain shuffle join — the standard trade, and
    still never O(n²).  Distance-1 pairs are found from both endpoints'
    probe sets; the a<b filter + distinct collapses the two sightings.
    """
    from tidb_gateway_spark.operators.cache import tracked_persist

    # r7 rework, measured at sf1 (50 k docs, 17.8 M result pairs,
    # identical output): 9.3 s → 2.3 s.  Two changes:
    # (1) the (doc_id, signature) table is PERSISTED — it is the one
    #     diamond input both join sides read, and without it each side
    #     re-runs the tokenize→hash→bit-aggregate pipeline inside the
    #     join stage.  The table is |docs| × 16 B (dimension-small;
    #     MEMORY_AND_DISK so a 100 TB corpus spills instead of
    #     evicting); repeated calls build the same analyzed plan, so
    #     Spark's cache manager reuses one entry rather than leaking,
    #     and the tracked-persist LRU (operators/cache.py) bounds the
    #     session's distinct persisted plans (r8, per r7 ADVICE).
    #     This is the in-query form of the signature STORE a
    #     production pipeline materializes at ingest.
    # (2) signatures join as BIGINTs with XOR bit flips — an 8-byte
    #     shuffle key and codegen'd integer probes instead of a
    #     16-char '0'/'1' string rebuilt by substring/translate.
    sigs = tracked_persist(
        simhash(doc_word_sets(documents), bits=bits)
        .select("doc_id", F.conv("sh", 2, 10).cast("bigint").alias("si"))
    )
    probes = sigs.select(
        F.col("doc_id").alias("a"),
        F.explode(F.array(
            F.col("si"),
            *[F.col("si").bitwiseXOR(F.lit(1 << j)) for j in range(bits)],
        )).alias("p"),
    )
    right = sigs.select(F.col("doc_id").alias("b"), F.col("si").alias("p"))
    return (
        probes.join(right, "p")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )

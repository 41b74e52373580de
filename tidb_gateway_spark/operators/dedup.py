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

HEX_HIGH = tuple("89abcdef")  # hex digits with the top bit set


def doc_words(documents: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Distinct (doc_id, word) pairs (unigram sets — SimHash features)."""
    return (
        documents.select(id_col, F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter(F.col("w") != "")
        .distinct()
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


def doc_shingle_arrays(documents: DataFrame, n: int = 3, id_col: str = "doc_id",
                       text_col: str = "text", distinct: bool = True) -> DataFrame:
    """(doc_id, ws: array<string>) with per-document n-word shingles —
    computed row-locally, NO shuffle.

    This is the scale-defining choice for the dedup family: signatures
    derived from these arrays (MinHash via array_min∘transform, exact
    sets via array_distinct) are map-side expressions, so the first
    shuffle in the whole pipeline is the LSH band join itself.  The
    explode→groupBy formulation shuffles |corpus|×|shingles| rows
    before producing the same per-document values.

    ``distinct=False`` skips the in-array dedup — correct for consumers
    that are multiset-invariant (MinHash: min over a multiset equals min
    over its set); Jaccard needs the distinct sets.
    """
    ws = F.expr(_shingle_array_sql(n))
    if distinct:
        ws = F.array_distinct(ws)
    return documents.select(
        id_col,
        F.filter(F.split(F.col(text_col), " "), lambda x: x != "").alias("wlist"),
    ).select(id_col, ws.alias("ws"))


def doc_shingles(documents: DataFrame, n: int = 3, id_col: str = "doc_id",
                 text_col: str = "text", distinct: bool = True) -> DataFrame:
    """(doc_id, shingle) pairs with n-word shingles (exploded form, for
    consumers that need row-per-shingle, e.g. the q91 contamination
    semi-join).

    Shingle choice is load-bearing: unigram sets collapse when the corpus
    shares a small vocabulary (every document collides with every other —
    O(n²) candidate blowup); n-gram shingles have corpus-scale cardinality
    so only genuinely similar documents share them.  Short documents
    (< n words) contribute their whole text as one shingle.
    """
    arrays = doc_shingle_arrays(documents, n=n, id_col=id_col,
                                text_col=text_col, distinct=distinct)
    return arrays.select(id_col, F.explode("ws").alias("w"))


def minhash_signatures(words: DataFrame, k: int = 6, id_col: str = "doc_id") -> DataFrame:
    """k-column MinHash signature per document (columns h0..h{k-1}) from
    an exploded (doc_id, w) frame — one groupBy shuffle.

    Prefer :func:`minhash_signatures_from_arrays` in pipelines: it
    computes the same values map-side with no shuffle at all.
    """
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{j}|"), F.col("w")))).alias(f"h{j}")
        for j in range(k)
    ]
    return words.groupBy(id_col).agg(*aggs)


def minhash_signatures_from_arrays(arrays: DataFrame, k: int = 6,
                                   id_col: str = "doc_id") -> DataFrame:
    """k-column MinHash signature per document, computed row-locally from
    a (doc_id, ws: array<string>) frame — ZERO shuffle.

    ``array_min(transform(ws, w -> md5(j||'|'||w)))`` is the same value
    the exploded groupBy-min form produces (min over a multiset equals
    min over its set), but it never leaves the scan's partition: at
    100 TB the signature stage costs no network at all, and the first
    shuffle of the dedup pipeline is the LSH band join itself.
    """
    def hasher(j: int):
        # Must return a ONE-argument lambda: pyspark treats a second
        # lambda parameter as the (element, index) form, which would bind
        # the index column instead of the salt.
        prefix = f"{j}|"
        return lambda w: F.md5(F.concat(F.lit(prefix), w))

    cols = [
        F.array_min(F.transform("ws", hasher(j))).alias(f"h{j}")
        for j in range(k)
    ]
    return arrays.select(F.col(id_col), *cols)


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
                           shingle_arrays: DataFrame | None = None) -> DataFrame:
    """Candidate near-dup pairs (a < b) via MinHash banding.

    Signatures are map-side (:func:`minhash_signatures_from_arrays`), so
    at scale the band join is the ONLY shuffle; its key (band, bv) is
    high-cardinality so it spreads evenly, and identical documents (the
    common hot case) collapse into per-bucket groups that AQE's skew
    handling splits if one bucket explodes.

    Pass a precomputed ``shingle_arrays`` frame (doc_shingle_arrays) to
    share the shingling across pipeline stages (the candidate→verify
    pipeline reuses it); distinct or multiset arrays give identical
    signatures.
    """
    rows_per_band = k // bands
    sigs = minhash_signatures_from_arrays(
        shingle_arrays if shingle_arrays is not None
        else doc_shingle_arrays(documents, distinct=False),
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
    """
    bit_aggs = [
        F.sum(
            F.when(F.substring(F.md5("w"), j + 1, 1).isin(*HEX_HIGH), 1).otherwise(-1)
        ).alias(f"b{j}")
        for j in range(bits)
    ]
    per_doc = words.groupBy(id_col).agg(*bit_aggs)
    sig = F.concat(
        *[F.when(F.col(f"b{j}") > 0, F.lit("1")).otherwise(F.lit("0")) for j in range(bits)]
    )
    return per_doc.select(F.col(id_col), sig.alias("sh"))


def jaccard_pairs(candidates: DataFrame, arrays: DataFrame) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs (a, b) → (a, b, jac),
    from a (doc_id, ws: array<string>) frame with DISTINCT arrays.

    Two equi-joins attach each side's set to the pair, then
    ``array_intersect`` computes |A∩B| per pair row-locally — no groupBy
    stage at all.  Cost is proportional to the candidate count (the LSH
    output), never corpus², and the per-pair work is a single JVM set
    intersection instead of an exploded shuffle of every shingle.
    """
    aa = arrays.select(F.col("doc_id").alias("a"), F.col("ws").alias("wsa"))
    bb = arrays.select(F.col("doc_id").alias("b"), F.col("ws").alias("wsb"))
    i = F.size(F.array_intersect("wsa", "wsb"))
    return (
        candidates.join(aa, "a")
        .join(bb, "b")
        .select(
            "a",
            "b",
            (
                i.cast("double")
                / (F.size("wsa") + F.size("wsb") - i).cast("double")
            ).alias("jac"),
        )
    )


def keep_first(df: DataFrame, key, order_col: str) -> DataFrame:
    """Generic keep-first dedup: one row per key, lowest order_col wins."""
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(order_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )

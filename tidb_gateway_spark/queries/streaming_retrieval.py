"""Q244/Q254: streaming index maintenance — the write-path streaming
twins of q220 (inverted index) and q94 (IVF ANN index) (VERDICT r8
next-round #7 and r9 next-round #6: the derived-companion families
that had no streaming counterpart).

A Structured Streaming job consumes document arrivals in micro-batches
and maintains the q220-style index companion incrementally via
``foreachBatch``:

* postings/ — (w, doc_id) parquet partitioned by first-char prefix,
  APPEND-ONLY: each micro-batch writes its own posting files into the
  prefix directories (the immutable-segment model every streaming IR
  system uses);
* dict/ — per-batch DELTA dictionaries (w, dfc) appended under the
  same prefix partitioning; the serve path merges deltas with a sum
  (LSM merge-on-read — q225's compaction round-trip is the companion
  operator that would fold deltas into a base segment).

The declared query SERVES the same 3-term conjunctive probe as q220
from the stream-maintained index, so the DuckDB oracle — which
recomputes containment from raw text — proves the incremental
maintenance lossless end-to-end: batch-split → streaming merge →
delta-merged dictionary → pruned posting intersection gives exactly
the batch-built answer.

Scale notes (100 TB): each micro-batch's work is proportional to the
batch (one tokenize pass, batch-sized aggregates); nothing re-reads
the accumulated index on the write path.  Dictionary deltas grow one
segment per batch — merge-on-read is a |batches|-way sum per term,
bounded by periodic compaction (q225).  The fixture staging step
splits the corpus into 4 single-file arrival units (repartition(1)
per split is SIMULATION STAGING — the arrival units of a real stream
are the source's, not ours).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tidb_gateway_spark.catalog import load_table
from tidb_gateway_spark.operators.partitioning import ensure_min_partitions
from tidb_gateway_spark.queries.registry import register
from tidb_gateway_spark.queries.llm_extended import _Q94_ORACLE
from tidb_gateway_spark.queries.retrieval_curation import (
    _Q220_NPROBE,
    _Q220_ORACLE,
    _Q220_TOPK,
    _tok,
)

_Q244_SPLITS = 4  # micro-batch arrival units the staging step simulates


def _q244_index(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per fixture) the STREAM-maintained inverted-index
    companion: stage the corpus as 4 arrival files, run a real
    Structured Streaming query (file source, maxFilesPerTrigger=1,
    availableNow) whose foreachBatch appends batch postings + a batch
    delta dictionary.  Returns the companion root path."""
    import hashlib
    import json
    import os

    from tidb_gateway_spark.operators.sampling import hash_bps
    from tidb_gateway_spark.sources import derived

    src = os.path.abspath(os.path.join(sf_dir, "documents.parquet"))
    key = hashlib.md5(f"invidx-stream-v1|{src}".encode()).hexdigest()[:16]
    path = derived.derived_path("invidx_stream", key)
    if not derived.is_fresh(path, src, marker="meta.json"):
        d = load_table(spark, sf_dir, "documents")
        schema = d.schema

        def build(tmp: str) -> None:
            os.makedirs(tmp, exist_ok=True)
            stage = os.path.join(tmp, "stage")
            # SIMULATION STAGING: one file per arrival unit so the file
            # source's maxFilesPerTrigger=1 yields 4 deterministic
            # micro-batches (a real deployment's units come from the
            # source; this repartition(1) is not on the data path)
            sp = hash_bps(F.col("doc_id"), "q244") % _Q244_SPLITS
            for i in range(_Q244_SPLITS):
                (d.filter(sp == i).repartition(1)
                 .write.mode("append").parquet(stage))

            post_dir = os.path.join(tmp, "postings")
            dict_dir = os.path.join(tmp, "dict")
            counts: list[int] = []

            def merge(batch: DataFrame, batch_id: int) -> None:
                # three consumers (postings write, dict write, doc
                # count) — persist the tokenized frame so the batch
                # source is read once, not three times (r9 ADVICE)
                td = _tok(ensure_min_partitions(batch)).distinct()
                td = td.select(
                    F.substring("w", 1, 1).alias("pfx"), "w", "doc_id")
                td = td.persist()
                try:
                    (td.write.mode("append").partitionBy("pfx")
                     .parquet(post_dir))
                    # batch DELTA dictionary — merge-on-read at serve
                    (td.groupBy("pfx", "w")
                     .agg(F.count("*").alias("dfc"))
                     .write.mode("append").partitionBy("pfx")
                     .parquet(dict_dir))
                    counts.append(
                        td.select("doc_id").distinct().count())
                finally:
                    td.unpersist()

            q = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(stage)
                .writeStream.foreachBatch(merge)
                .option("checkpointLocation", os.path.join(tmp, "chk"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            with open(os.path.join(tmp, "meta.json"), "w") as f:
                json.dump({"n_docs": sum(counts),
                           "n_batches": len(counts)}, f)

        derived.build_atomic(path, build)
    return path


@register(
    "q244_streaming_index_maintenance",
    _Q220_ORACLE,
    doc="Streaming inverted-index maintenance: a Structured Streaming "
        "foreachBatch job consumes the corpus in 4 micro-batches and "
        "appends per-batch postings + DELTA dictionaries (both "
        "prefix-partitioned); the declared query serves q220's 3-term "
        "conjunctive probe from the stream-maintained index, with the "
        "delta dictionaries merged on read (sum per term — the LSM "
        "model; q225's compaction is the folding operator).  The "
        "oracle recomputes containment from raw text, proving "
        "incremental maintenance lossless: batch-split + streaming "
        "merge ≡ batch build.  Write path per batch ∝ batch size — "
        "nothing re-reads the accumulated index.",
    tags=("llm", "text", "retrieval", "streaming", "layout"),
)
def q244(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    path = _q244_index(spark, sf_dir)
    dct = spark.read.parquet(os.path.join(path, "dict"))
    # merge-on-read over the batch deltas, then global top-3 by df via
    # TakeOrdered (partial top-k per partition + driver merge)
    probes = [
        r["w"]
        for r in dct.groupBy("w")
        .agg(F.sum("dfc").cast("bigint").alias("dfc"))
        .orderBy(F.desc("dfc"), "w")
        .limit(_Q220_NPROBE)
        .collect()
    ]
    post = spark.read.parquet(os.path.join(path, "postings"))
    pfxs = sorted({w[:1] for w in probes})
    return (
        post.filter(F.col("pfx").isin(pfxs) & F.col("w").isin(probes))
        .groupBy("doc_id")
        .agg(F.count("*").alias("nw"))
        .filter(F.col("nw") == _Q220_NPROBE)
        .select("doc_id")
        .orderBy("doc_id")
        .limit(_Q220_TOPK)
    )


# ---------------------------------------------------------------- Q254
_Q254_SPLITS = 4


def _q254_index(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per fixture) the STREAM-maintained IVF index: stage
    the embedding corpus as 4 arrival files, run a Structured Streaming
    job (file source, maxFilesPerTrigger=1, availableNow) whose
    foreachBatch assigns each arriving vector to its argmax-inner-
    product cell and APPENDS it under the cell partition — per-batch
    immutable segments accumulate inside each cell directory (the same
    LSM model as q244's postings; the serve path reads them merged).

    Centroids are FROZEN up front (the deterministic seed set q94
    uses) — the precondition for incremental assignment ≡ batch
    rebuild.  A production system trains centroids on a bootstrap
    sample before opening the stream for exactly this reason; centroid
    refresh is a full re-index (or a cell-split compaction), not a
    streaming operation.  Returns the companion root path.
    """
    import hashlib
    import json
    import os

    from tidb_gateway_spark.operators.sampling import hash_bps
    from tidb_gateway_spark.operators.similarity import (
        ivf_centroids,
        with_ivf_cell_arrow,
    )
    from tidb_gateway_spark.queries.llm_extended import _IVF_CELLS
    from tidb_gateway_spark.sources import derived

    src = os.path.abspath(os.path.join(sf_dir, "embeddings.parquet"))
    key = hashlib.md5(f"ivf-stream-v1|{src}|{_IVF_CELLS}".encode()).hexdigest()[:16]
    path = derived.derived_path("ivf_stream", key)
    if not derived.is_fresh(path, src, marker="meta.json"):
        cents = ivf_centroids(spark, src, _IVF_CELLS)
        e = spark.read.parquet(src)
        schema = e.schema

        def build(tmp: str) -> None:
            os.makedirs(tmp, exist_ok=True)
            stage = os.path.join(tmp, "stage")
            # SIMULATION STAGING (see q244): one file per arrival unit
            sp = hash_bps(F.col("vec_id"), "q254") % _Q254_SPLITS
            for i in range(_Q254_SPLITS):
                (e.filter(sp == i).repartition(1)
                 .write.mode("append").parquet(stage))

            cell_dir = os.path.join(tmp, "cells")
            counts: list[int] = []

            def assign(batch: DataFrame, batch_id: int) -> None:
                # cell assignment is one Arrow matmul per batch against
                # the frozen centroid matrix; the append is the only
                # index write — nothing re-reads accumulated segments
                assigned = with_ivf_cell_arrow(
                    ensure_min_partitions(batch), cents)
                (assigned.write.mode("append").partitionBy("cell")
                 .parquet(cell_dir))
                counts.append(1)

            q = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(stage)
                .writeStream.foreachBatch(assign)
                .option("checkpointLocation", os.path.join(tmp, "chk"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            with open(os.path.join(tmp, "meta.json"), "w") as f:
                json.dump({"n_batches": len(counts),
                           "n_cells": _IVF_CELLS}, f)

        derived.build_atomic(path, build)
    return path


@register(
    "q254_streaming_ivf_maintenance",
    _Q94_ORACLE,  # recomputes assignment + probe from raw embeddings
    doc="Streaming IVF-index maintenance: a Structured Streaming "
        "foreachBatch job consumes embedding arrivals in 4 "
        "micro-batches, assigns each vector to its argmax-inner-"
        "product cell against FROZEN seed centroids (one Arrow matmul "
        "per batch), and appends immutable per-batch segments under "
        "the cell partitioning — the LSM model of q244 applied to the "
        "ANN family.  The declared query serves q94's probe (top-3 by "
        "inner product over the probe's 2 best cells, partition-"
        "pruned) from the stream-maintained index; the oracle "
        "recomputes assignment + probe from raw embeddings, proving "
        "incremental maintenance ≡ the batch ivf_index rebuild.  "
        "Write path per batch ∝ batch size; centroid refresh is a "
        "re-index, not a streaming op (documented tradeoff).",
    tags=("llm", "similarity", "ann", "streaming", "layout"),
)
def q254(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from tidb_gateway_spark.operators.similarity import (
        ivf_centroids,
        ivf_query,
    )
    from tidb_gateway_spark.queries.llm_extended import (
        _IVF_CELLS,
        _IVF_NPROBE,
    )

    path = _q254_index(spark, sf_dir)
    idx = spark.read.parquet(os.path.join(path, "cells"))
    cents = ivf_centroids(
        spark, os.path.join(sf_dir, "embeddings.parquet"), _IVF_CELLS)
    return ivf_query(idx, cents, cents[0], k=3, nprobe=_IVF_NPROBE,
                     exclude_id=0)

"""Similarity search over embedding columns (``array<float>``).

Two tiers, mirroring what a 100 TB corpus needs:

* :func:`brute_force_topk` — exact scan: broadcast the query vector(s),
  compute dot/cosine with JVM-side higher-order functions (``zip_with`` +
  ``aggregate`` — no Python in the loop), TakeOrdered for top-k.  Cost is
  one full scan per query batch; the correct *baseline* and fine when
  queries are few.
* :func:`lsh_bucket_topk` — random-hyperplane LSH: each vector gets a
  signed bucket id from ``n_planes`` fixed hyperplanes; candidates are
  restricted to the query's bucket before exact rerank.  The hyperplanes
  are deterministic (seeded from md5, see :func:`hyperplanes`) so results
  are reproducible across engines and runs.  At scale the bucket id
  becomes the partition key — the index is a bucketed table and a query
  touches one partition instead of the whole corpus.

Design note: embeddings are cast to double before multiply so both this
engine and external oracles accumulate identical IEEE sums left-to-right.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tidb_gateway_spark.functions import stable_round


def dot_expr(a: str, b: str) -> Column:
    """Exact dot product of two array columns, accumulated in double."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def norm_expr(a: str) -> Column:
    return F.sqrt(
        F.expr(
            f"aggregate({a}, CAST(0 AS DOUBLE), "
            "(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
        )
    )


def brute_force_topk(
    corpus: DataFrame, query: DataFrame, k: int = 5, metric: str = "dot"
) -> DataFrame:
    """Exact top-k neighbors of a single query vector.

    ``corpus``: (vec_id, embedding); ``query``: one row with ``embedding``.
    Returns (vec_id, dp) — dp rounded to 4 for cross-engine declaration.
    """
    q = F.broadcast(query.select(F.col("embedding").alias("qe")))
    joined = corpus.crossJoin(q)
    score = dot_expr("embedding", "qe")
    if metric == "cosine":
        score = score / (norm_expr("embedding") * norm_expr("qe"))
    return (
        joined.select("vec_id", stable_round(score, 4).alias("dp"))
        .orderBy(F.desc("dp"), F.asc("vec_id"))
        .limit(k)
    )


def cosine_nn_arrow(corpus: DataFrame, probes: list[tuple[int, list[float]]],
                    id_col: str = "nn", vec_col: str = "ce") -> DataFrame:
    """Exact cosine nearest neighbor of each probe over the corpus, via
    Arrow-batched numpy (``mapInPandas``) with per-batch partial argmax.

    ``probes``: small [(qid, vector), ...] list (metadata-sized — the
    probe set is broadcast inside the task closure, like rank.py's bucket
    boundaries).  Each Arrow batch computes a (batch × n_probes) cosine
    matrix with one BLAS matmul and emits at most one (qid, nn, cs) row
    per probe — the map-side reduction, so the shuffle carries
    O(batches × probes) rows regardless of corpus size, identical in
    shape to the ``max(struct)`` JVM plan.  Ties break toward the lowest
    neighbor id, matching ROW_NUMBER() OVER (ORDER BY cs DESC, nn).

    This is the sanctioned Python stage: dense linear algebra is the one
    place interpreted JVM higher-order functions lose by ~20× to
    vectorized BLAS, and the Arrow batch transfer amortizes the Python
    boundary.  Returns (qid, nn, cs) — one row per probe.
    """
    import numpy as np

    P = np.array([v for _, v in probes], dtype=np.float64).T  # dim × q
    p_norm = np.sqrt((P * P).sum(axis=0))
    qids = [int(q) for q, _ in probes]

    def partial_nn(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            M = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            ids = pdf[id_col].to_numpy()
            c_norm = np.sqrt((M * M).sum(axis=1))
            S = (M @ P) / (c_norm[:, None] * p_norm[None, :])
            rows = []
            for j, qid in enumerate(qids):
                col = S[:, j].copy()
                col[ids == qid] = -np.inf  # exclude self-match
                mx = col.max()
                if mx == -np.inf:
                    continue
                rows.append((qid, int(ids[col == mx].min()), float(mx)))
            yield pd.DataFrame(rows, columns=["qid", "nn", "cs"])

    partials = corpus.select(id_col, vec_col).mapInPandas(
        partial_nn, schema="qid long, nn long, cs double"
    )
    best = partials.groupBy("qid").agg(
        F.max(F.struct(F.col("cs"), (-F.col("nn")).alias("neg_nn"))).alias("b")
    )
    return best.select(
        "qid", (-F.col("b.neg_nn")).alias("nn"), F.col("b.cs").alias("cs")
    )


def embedding_neardup_pairs(vectors: DataFrame, tau: float = 0.35,
                            n_planes: int = 6, dim: int = 64,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicate PAIRS (a < b, cosine ≥ tau),
    restricted to LSH buckets — the embedding-space analog of
    MinHash-LSH candidate generation in dedup.py.

    Scale shape: bucket id = sign pattern over ``n_planes`` fixed
    hyperplanes partitions the corpus; all-pairs scoring happens only
    WITHIN a bucket (``applyInPandas`` per bucket, one numpy matmul), so
    total work is Σ bucket² ≈ n²/2^p instead of n² — and bucket size is
    tunable with more planes.  Pairs split across buckets are missed:
    ANN recall semantics, same contract as lsh_bucket_topk.  The
    deterministic md5-seeded planes make an external oracle reproduce
    the identical bucketing.
    """
    import numpy as np

    bucketed = with_lsh_bucket(
        vectors.select(id_col, vec_col), n_planes, dim, col=vec_col)

    def bucket_pairs(pdf):
        import pandas as pd

        empty = pd.DataFrame({
            "a": pd.Series(dtype="int64"),
            "b": pd.Series(dtype="int64"),
            "cs": pd.Series(dtype="float64"),
        })
        if len(pdf) < 2:
            return empty
        ids = pdf[id_col].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        M = np.vstack(pdf[vec_col].to_numpy()[order]).astype(np.float64)
        norm = np.sqrt((M * M).sum(axis=1))
        S = (M @ M.T) / np.outer(norm, norm)
        iu, ju = np.triu_indices(len(ids), k=1)
        keep = S[iu, ju] >= tau
        if not keep.any():
            return empty
        return pd.DataFrame({
            "a": ids[iu[keep]].astype("int64"),
            "b": ids[ju[keep]].astype("int64"),
            "cs": S[iu[keep], ju[keep]],
        })

    return bucketed.groupBy("bucket").applyInPandas(
        bucket_pairs, schema="a long, b long, cs double")


def hyperplanes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic ±1 hyperplanes seeded from md5(plane, coord).

    Pure function of (n_planes, dim) — any engine (or a SQL oracle with
    the literals inlined) derives the same planes.
    """
    planes = []
    for p in range(n_planes):
        row = []
        for i in range(dim):
            h = hashlib.md5(f"{p}_{i}".encode()).hexdigest()
            row.append(1.0 if int(h[0], 16) < 8 else -1.0)
        planes.append(row)
    return planes


def with_lsh_bucket(df: DataFrame, n_planes: int = 8, dim: int = 64,
                    col: str = "embedding") -> DataFrame:
    """Add a ``bucket`` int column = sign pattern across the hyperplanes.

    At 100 TB this column is the bucketing/partition key of the stored
    index table; similar vectors collide with high probability.
    """
    planes = hyperplanes(n_planes, dim)
    bucket = F.lit(0)
    for p, plane in enumerate(planes):
        arr = "array(" + ",".join(f"CAST({v} AS DOUBLE)" for v in plane) + ")"
        proj = F.expr(
            f"aggregate(zip_with({col}, {arr}, (x, y) -> CAST(x AS DOUBLE) * y), "
            "CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
        )
        bucket = bucket + F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return df.withColumn("bucket", bucket.cast("int"))


def lsh_bucket_topk(
    corpus: DataFrame, query: DataFrame, k: int = 5, n_planes: int = 8, dim: int = 64
) -> DataFrame:
    """ANN top-k: restrict to the query's LSH bucket, then exact rerank.

    Recall < 1 by construction (bucket boundary effects); the declared
    check pins the deterministic output, and test_operators verifies
    bucket recall against brute force.
    """
    cb = with_lsh_bucket(corpus, n_planes, dim)
    qb = F.broadcast(
        with_lsh_bucket(query, n_planes, dim)
        .select(F.col("embedding").alias("qe"), F.col("bucket").alias("qbucket"))
    )
    cand = cb.join(qb, cb.bucket == qb.qbucket)
    return (
        cand.select("vec_id", stable_round(dot_expr("embedding", "qe"), 4).alias("dp"))
        .orderBy(F.desc("dp"), F.asc("vec_id"))
        .limit(k)
    )

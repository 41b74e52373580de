"""Sequence packing for LLM training-data pipelines.

Training consumes fixed-length context windows; short documents waste
capacity unless packed together.  This operator implements
*contiguous next-fit* packing: within each shard (partition column,
e.g. language or source), documents in a deterministic order are
assigned to packs by their exclusive prefix-sum of token counts —
``pack_id = prefix_tokens DIV budget``.  A document that straddles a
budget boundary lands in the pack its prefix starts in (next-fit with
overflow), which is the standard streaming-packing compromise: no
global bin-packing shuffle, one window per shard.

100 TB shape: the only shuffle is the window's hash partition on the
shard columns; within a shard the prefix sum is a single sorted pass.
Real pipelines shard by (source, date, file) so no shard exceeds one
executor's sort budget — the operator takes arbitrary shard columns
for exactly that reason.  Contrast with global first-fit-decreasing,
which needs all sizes on one node and is deliberately not offered.

Cross-engine check: the exclusive prefix sum is
``SUM(tok) OVER (PARTITION BY shard ORDER BY key ROWS BETWEEN
UNBOUNDED PRECEDING AND 1 PRECEDING)`` in any SQL engine, and integer
division makes the bucket exact — see q96's DuckDB oracle.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    order_key: str,
    token_col: str | Column,
    budget: int,
    shard_cols: Sequence[str] = ("lang",),
    pack_col: str = "pack_id",
) -> DataFrame:
    """Assign each row a ``pack_id`` by contiguous next-fit packing.

    ``budget`` is the context-window token budget; packs may overflow
    by at most one document (documented next-fit semantics).  The
    assignment is a pure function of (shard, order_key, token counts):
    stable across partitionings and engines.
    """
    tok = F.col(token_col) if isinstance(token_col, str) else token_col
    w = (
        Window.partitionBy(*shard_cols)
        .orderBy(order_key)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = F.coalesce(F.sum(tok).over(w), F.lit(0))
    # floor(int/int) is exact while prefix/budget < 2^53 — i.e. always;
    # an exact-multiple prefix divides exactly (IEEE division of
    # representable ints with a representable quotient is exact)
    return df.withColumn(pack_col, F.floor(prefix / F.lit(budget)).cast("long"))


def pack_stats(packed: DataFrame, token_col: str,
               shard_cols: Sequence[str] = ("lang",),
               pack_col: str = "pack_id") -> DataFrame:
    """Per-pack document count and token total (pack-utilization audit)."""
    return (
        packed.groupBy(*shard_cols, pack_col)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(token_col).cast("bigint").alias("pack_tokens"),
        )
        .orderBy(*shard_cols, pack_col)
    )

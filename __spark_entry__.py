"""Driver contract for the spark-graft builder (PySpark target).

Delegates to :mod:`tidb_gateway_spark.queries` — the declared-query
registry implementing SURVEY.md §2B (Q01–Q71) plus the extended
LLM-pipeline operators.  Each registry entry pairs a Spark
DataFrame/SQL implementation with a DuckDB oracle SQL string whose
column names/types match the Spark output.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape, q22) on /root/testdata/sf0.001."""
    from tidb_gateway_spark.queries import REGISTRY
    from tidb_gateway_spark.session import ensure_session_confs

    ensure_session_confs(spark)
    return REGISTRY["q22_tpch_q1_agg"].spark(spark, "/root/testdata/sf0.001")


# Queries whose implementation changed THIS round and therefore need the
# driver's oracle harness (which may cover only a window of the registry)
# to re-certify them before anything already green in a prior round.
_CHANGED_FIRST = (
    "q101_dedup_clusters",         # new operator (r4)
    "q94_ivf_ann",                 # new operator (r4)
    "q95_int8_quantized_topk",     # new operator (r4)
    "q96_sequence_packing",        # new operator (r4)
    "q97_mixture_resample",        # new operator (r4)
    "q98_word_repetition_filter",  # new operator (r4)
    "q99_tfidf_top_terms",         # new operator (r4)
    "q100_pmi_collocations",       # new operator (r4)
    "q76_ann_lsh_bucket",          # materialized bucketed index (r4)
    "q77_lang_id_heuristic",       # parallelism guard (r4)
    "q78_quality_score_histogram", # parallelism guard (r4)
    "q79_token_count_stats",       # parallelism guard (r4)
    "q19_range_predicate_join",    # shuffle_hash join strategy (r4)
    "q93_embedding_neardup_pairs", # Arrow bucketing path (r4)
    "q32_rank_dense_rank",         # boundary-cache eviction bound (r4)
    "q37_ntile",                   # boundary-cache eviction bound (r4)
)

# Queries whose latest green certification predates the current code
# (changed after their last driver run, or last certified in r1/r2
# before unrelated shared-operator rewrites landed).  These rotate
# through the window right after the changed set; the r3-certified
# unchanged block sorts last.
_STALE_CERT = tuple(
    f"q{n:02d}" for n in (
        # q05–q07 roll to the next rotation: their r2 certs are on code
        # unchanged since r1 (scans_filters.py), lowest re-cert value.
        *range(8, 10),            # q08–q09: last certified r2
        *range(51, 57),           # q51–q56: last certified r2
        *range(58, 68), 69, 70, 71,  # q58–q67, q69–q71: r2
        73,                       # q73: r2
        *range(80, 93),           # q80–q92: r2 (q80/q91/q92 changed r3)
    )
)


def _ordered_qids() -> list[str]:
    """Registry qids ordered by certification staleness: changed this
    round, then stale-cert, then freshly-certified.

    The driver correctness harness may record only the first N entries it
    sees; ordering by staleness makes the certified window cover exactly
    what changed.
    """
    from tidb_gateway_spark.queries import REGISTRY

    def sort_key(qid: str) -> tuple[int, str]:
        if qid in _CHANGED_FIRST:
            return (0, qid)
        if qid[:3] in _STALE_CERT:
            return (1, qid)
        return (2, qid)

    return sorted(REGISTRY, key=sort_key)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from tidb_gateway_spark.queries import REGISTRY

    return {qid: REGISTRY[qid].spark for qid in _ordered_qids()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible registry entry."""
    from tidb_gateway_spark.queries import REGISTRY

    return {
        qid: REGISTRY[qid].oracle
        for qid in _ordered_qids()
        if REGISTRY[qid].oracle
    }

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


# Queries needing the driver's oracle harness first — it records a
# ~50-entry window per round (r01–r04: 50 each; r05: 51), so this tuple
# is PRIORITY-ORDERED (tuple position, not qid) and more than ~50
# entries means the tail defers to the next round by design.
_CHANGED_FIRST = (
    # Tier 0 — round 8 fixes/reworks, riskiest first.  Entering r8 the
    # backlog was exactly q190 (the only r7 red — driver canonicalizer
    # crash on raw array columns) plus whatever r8 changes
    # (VERDICT r7 directive 7).  All entries pass the in-repo
    # driver-faithful oracle diff at sf0.01 before queueing here.
    "q190_array_function_bank",    # r8: array outputs serialized via
                                   # array_join — the r7 driver red
    "q183_trigram_langid_confusion",  # r8: trained model persisted as
                                   # mtime-keyed derived companion;
                                   # declared query = score job only
    "q211_semantic_dedup_cells",   # r8: shared _neardup_keep with
                                   # int64-overflow guard (object-int
                                   # fallback for open tau_bps)
    "q209_neardup_pagerank",       # r8: tracked_persist LRU + driver-
                                   # branch untrack after collect
    "q114_simhash_multiprobe_pairs",  # r8: signature persist now
                                   # tracked (bounded session cache)
    "q122_ttr_quality_battery",    # r8: cl via concat_ws(words) —
                                   # shares the split through CSE
                                   # (1.75→1.05 s sf1); translate was
                                   # single-space-only anyway
    "q194_dup_ngram_coverage",     # r8: ONE doc_id exchange feeds both
                                   # groupBys (1.88→1.61 s sf1)
    "q205_bucketed_join_roundtrip",  # r8: catalog name keys on derived
                                   # root too (stale-LOCATION guard)
    "q208_ann_recall_eval",        # r8: probe cache key drops id(spark)
    "q75_cosine_nearest_neighbor",  # r8: same cache-key change
    "q76_ann_lsh_bucket",          # r8: same cache-key change
    "q94_ivf_ann",                 # r8: same cache-key change
    "q95_int8_quantized_topk",     # r8: same cache-key change
    # Tier 1 — NEW registry entries this round (round 8) append below;
    # tier 0 + tier 1 must stay <= ~45 so the window drains completely
    # with slots to spare (test_cert_window.py enforces the arithmetic).
    "q214_bm25_retrieval",
    "q220_inverted_index_roundtrip",
    "q215_source_js_divergence",
    "q216_heaps_vocab_growth",
    "q217_neardup_triangle_census",
    "q218_gdpr_cascade_audit",
    "q219_exact_group_median",
    "q221_name_similarity_join",
    "q222_seeded_epoch_shuffle",
    "q223_interval_bucket_join",
    "q224_incremental_cluster_merge_audit",
    "q225_compaction_roundtrip",
    "q226_zipf_slope",
    "q227_basket_pair_affinity",
    "q228_replica_divergence_audit",
    "q229_containment_neardup",
    "q230_grouped_ols_trend",
    "q231_markov_transition_matrix",
    "q232_table_profile",
    "q233_mixture_waterfill",
    "q234_sketch_agreement_audit",
    "q235_dedup_waterfall",
    "q236_ks_two_sample",
    "q237_auc_mann_whitney",
    "q238_decile_lift_table",
    "q239_quality_rule_waterfall",
    "q240_weighted_median",
    "q241_centroid_affinity_matrix",
    "q242_top_p_mass_cap",
    "q243_trimmed_winsorized_means",
)

# Queries whose latest green certification predates the current code
# (changed after their last driver run, or last certified in r1/r2
# before unrelated shared-operator rewrites landed).  These rotate
# through the window right after the changed set; the freshly-certified
# (r4) block sorts last.
_STALE_CERT = tuple(
    f"q{n:02d}" for n in (
        # oldest remaining certs: q01–q07 (r2/r3 on unchanged code),
        # the r3-certified operator families, and anything the r5
        # loader/shared-code changes could plausibly touch.
        *range(1, 8),             # q01–q07
        *range(10, 19),           # q10–q18 joins: r3
        *range(22, 26), 27, 28, 30,  # aggs: r3
        38, 39, *range(41, 51),   # sorts/sets/scalars: r3
        72, 74, 75, 92,           # dedup/similarity r3 certs
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

    changed_rank = {qid: i for i, qid in enumerate(_CHANGED_FIRST)}

    def sort_key(qid: str) -> tuple[int, int, str]:
        if qid in changed_rank:
            # tuple POSITION, not qid: _CHANGED_FIRST is priority-ordered
            # so the certified window covers exactly the highest-stakes
            # entries (see the tier comments above).
            return (0, changed_rank[qid], qid)
        if qid[:3] in _STALE_CERT:
            return (1, 0, qid)
        return (2, 0, qid)

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

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
    # Tier 0 — round 9 fixes/reworks, riskiest first (VERDICT r8
    # directives 2 and 5).  All entries pass the in-repo
    # driver-faithful oracle diff at sf0.01 before queueing here.
    "q214_bm25_retrieval",         # r9: query-term table carries dfc —
                                   # the vocabulary-sized
                                   # broadcast(dfreq) join deleted
    "q220_inverted_index_roundtrip",  # r9: dictionary prefix-
                                   # partitioned (no coalesce(1)
                                   # single-task write); top-3 probe
                                   # via TakeOrdered, not global Window
    "q208_ann_recall_eval",        # r9: all IVF probes in ONE pruned
                                   # Arrow pass (per-probe cell mask)
    "q215_source_js_divergence",   # r9: one tokenize via persisted
                                   # (source, w) counts; TakeOrdered
    "q232_table_profile",          # r9: per-column pruned aggregate
                                   # branches, not a 7x Expand
    "q185_label_noise_audit",      # r9: Arrow matmul distance kernel
                                   # with per-batch label partials
    "q240_weighted_median",        # r9: rides the range-bucketed
                                   # grouped_weighted_percentiles
    "q165_session_cooccurrence",   # r9: sessionized (user, sid, type)
                                   # persisted across the self-join
    "q234_sketch_agreement_audit",  # r9: one full-outer join + one
                                   # aggregate (was 2x chain re-exec)
    "q166_three_step_funnel",      # r9: step tables persisted across
                                   # their count + next-step consumers
    # Tier 1 — NEW registry entries this round (round 9) append below
    # AS THEY LAND; tier 0 + tier 1 must stay <= ~20 so the rotation
    # block gets its budgeted >=25 slots (test_cert_window.py enforces
    # the arithmetic).
    "q244_streaming_index_maintenance",
    "q245_grouped_weighted_percentiles",
    "q246_char_entropy_buckets",
    "q247_source_lang_mutual_information",
    "q248_cross_source_dup_matrix",
    "q249_block_jackknife_ci",
    "q250_embedding_norm_drift",
    "q251_seasonal_anomaly_residual",
    "q252_embedding_covariance_block",
    "q253_cohens_kappa",
)

# CERTIFICATION-REFRESH ROTATION (VERDICT r8 directive 6): queries whose
# latest green driver certification is oldest (r2–r4 cohort, code
# unchanged — the in-repo oracle diff covers them at HEAD, but the
# driver's canonicalizer is the ground truth and has caught what the
# sim missed, q190).  PRIORITY-ORDERED oldest-cert-first; ~30 slots per
# round, the tail defers to the next round by design.
_STALE_CERT = (
    # r2 cohort (1)
    "q92_pii_pattern_scan",
    # r3 cohort (27) — joins, aggs, sorts/sets, scalars
    "q10_inner_equijoin", "q11_multiway_join", "q12_left_outer_join",
    "q13_right_outer_join", "q14_full_outer_join", "q15_left_semi_join",
    "q17_cross_join", "q18_theta_join", "q22_tpch_q1_agg",
    "q23_global_agg", "q24_count_distinct", "q25_having", "q27_rollup",
    "q28_cube", "q30_statistical_aggs", "q38_multikey_sort", "q39_topk",
    "q41_union_all", "q42_union_distinct", "q43_intersect", "q44_except",
    "q45_distinct", "q46_string_basics", "q47_pad_position",
    "q48_regex_match", "q49_date_extract", "q50_date_trunc",
    # r4 cohort (33) — fills whatever window remains; next round's
    # rotation starts from wherever this one's window ran out
    "q08_case_when", "q09_cast_groupby", "q100_pmi_collocations",
    "q19_range_predicate_join", "q32_rank_dense_rank", "q37_ntile",
    "q51_date_arith", "q52_math_funcs", "q54_array_access",
    "q55_array_dot_product", "q60_exact_dedup_hash",
    "q61_dedup_keep_first", "q62_neardup_prefix_candidates",
    "q63_similarity_topk", "q64_tokenize_tf",
    "q65_profile_by_lang_source", "q66_embedding_label_stats",
    "q77_lang_id_heuristic", "q78_quality_score_histogram",
    "q79_token_count_stats", "q80_fingerprint_rolling_hash",
    "q81_multimodal_decode_stub", "q82_deterministic_split",
    "q83_hash_sample_per_stratum", "q84_corpus_statistics",
    "q85_length_percentiles", "q88_topk_per_group",
    "q89_embedding_centroids", "q90_incremental_dedup_anti_join",
    "q93_embedding_neardup_pairs", "q96_sequence_packing",
    "q97_mixture_resample", "q99_tfidf_top_terms",
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
    stale_rank = {qid: i for i, qid in enumerate(_STALE_CERT)}

    def sort_key(qid: str) -> tuple[int, int, str]:
        if qid in changed_rank:
            # tuple POSITION, not qid: _CHANGED_FIRST is priority-ordered
            # so the certified window covers exactly the highest-stakes
            # entries (see the tier comments above).
            return (0, changed_rank[qid], qid)
        if qid in stale_rank:
            # oldest-cert-first: the rotation refreshes the r2–r4 cohort
            return (1, stale_rank[qid], qid)
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

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
    # Tier 0 — round 11 changes, riskiest first.  All entries pass the
    # in-repo driver-faithful oracle diff at sf0.01 before queueing.
    "q261_exact_substring_dedup",  # NEW r11: Lee-et-al exact substring
                                   # dedup (stride-1 gram digests →
                                   # interval merge)
    "q262_streaming_lsh_band_index",  # NEW r11: streaming MinHash-LSH
                                   # band index (3rd streaming-index
                                   # family member)
    "q263_incremental_neardup_on_arrival",  # NEW r11: per-epoch
                                   # dup-on-arrival audit vs q262's
                                   # index
    "q264_exact_substring_dedup_apply",  # NEW r11: the APPLY step of
                                   # q261 (interval-cover sweep,
                                   # removed == audited pinned)
    "q265_streaming_dedup_gate",   # NEW r11: ingest-time quarantine
                                   # vs the accumulated ADMITTED index
                                   # (sequential; unrolled oracle)
    "q266_gate_precision_audit",   # NEW r11: exact-Jaccard verify of
                                   # every gate decision (per-epoch
                                   # precision bps)
    "q53_json_extract",            # r11: back on the parse-on-read
                                   # VARIANT plan (r10 ADVICE — the
                                   # shredded serving aliased q102)
    "q257_ivf_centroid_refresh",   # r11: empty-cell masking (r10
                                   # ADVICE) + manifest-pointer
                                   # generation switchover
    "q260_streaming_lsm_index_lifecycle",  # r11: in-stream fold now
                                   # flips a {base_gen, delta_epoch}
                                   # manifest — no directory rename
    "q259_index_delta_compaction",  # r11: compacted companion is
                                   # generation-managed via manifest
    "q244_streaming_index_maintenance",  # r11: meta field renamed
                                   # n_docs -> n_docs_tokenized
    "q195_incremental_agg_maintenance",  # r11: base+delta partials
                                   # from ONE flag-keyed scan (3 corpus
                                   # reads -> 2; direct stays an
                                   # independent scan so the merge ≡
                                   # direct certificate keeps meaning)
)

# CERTIFICATION-REFRESH ROTATION (VERDICT r8 directive 6; r10 directive
# 1: spend the r11 window draining the r5 cohort and biting into r6).
# PRIORITY-ORDERED oldest-cert-first; the tail defers to the next
# round by design.
_STALE_CERT = (
    # r5 cohort — the 34 oldest certs in the registry (complete list;
    # recomputed from CORRECTNESS_r01–r10 latest-green)
    "q16_left_anti_join", "q20_asof_join", "q21_self_join",
    "q26_grouping_sets", "q29_conditional_agg", "q31_row_number",
    "q33_lag_lead", "q34_running_sum", "q35_sliding_rows_frame",
    "q36_first_value_full_frame", "q40_limit_offset",
    "q56_tumbling_window", "q57_sliding_window", "q58_session_window",
    "q59_stateful_dedup", "q67_uncorrelated_scalar_subquery",
    "q69_in_subquery", "q70_cte", "q71_values_inline",
    "q86_latest_event_per_user", "q87_funnel_conversion",
    "q133_gap_fill_locf", "q134_event_path_prefixes",
    "q135_rolling_distinct_types", "q136_snapshot_diff_cdc",
    "q137_outlier_flags", "q139_levenshtein_verify",
    "q140_cohort_retention", "q141_point_in_time_join",
    "q142_hof_vector_stats", "q149_audio_feature_stub",
    "q150_matryoshka_truncation_eval", "q151_temperature_mixture",
    "q152_bigram_lm_score",
    # r6 cohort head (oldest-first by qid; the rest of r6 continues in
    # the r12 rotation from where this window runs out)
    "q104_top_ngram_fraction", "q106_pivot_event_matrix",
    "q107_unpivot_long_form", "q109_video_frame_sampling",
    "q111_curriculum_quartiles", "q115_distribution_drift_psi",
    "q116_full_data_recipe", "q117_recursive_cte_month_series",
    "q118_percent_rank_cume_dist", "q119_lateral_topn_per_key",
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
            # oldest-cert-first: the r11 rotation drains the r5 cohort
            # and bites into r6 (VERDICT r10 directive 1)
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

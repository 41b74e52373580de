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
    # Tier 0 — round 12 changes, riskiest first.  All entries pass the
    # in-repo driver-faithful oracle diff at sf0.01 before queueing.
    "q270_decontamination_apply",  # NEW r12: GPT-3 any-13-gram
                                   # removal rule — the decontamination
                                   # family's apply member (q103's
                                   # hash-only exchange discipline)
    "q269_pq_adc_recall",          # NEW r12: product-quantization ADC
                                   # recall@1/@10 eval — the
                                   # compression member of the ANN
                                   # family (integer-exact ADC sums,
                                   # one Arrow corpus pass)
    "q268_streaming_substring_dup_on_arrival",  # NEW r12: q261's
                                   # semantics at ingest — gram-digest
                                   # index + on-arrival cross-epoch
                                   # dup audit (4th streaming-index
                                   # family member)
    "q267_streaming_gate_lsm_fold",  # NEW r12: the gate composed with
                                   # the q259/q260 manifest LSM fold —
                                   # admitted band segments fold into
                                   # base generations (VERDICT r11
                                   # directive 2); decisions pinned
                                   # bit-identical to q265
    "q264_exact_substring_dedup_apply",  # r12: fused single token pass
                                   # (covered tokens from spans,
                                   # covered chars via broadcast span
                                   # lists + slice-aggregate HOF; the
                                   # corpus token explode and doc-keyed
                                   # sweep window are gone — 1.87x ->
                                   # 0.55x at sf10)
    "q261_exact_substring_dedup",  # r12: hot-gram skew guard (sampled
                                   # gh diagnostic gating run-compressed
                                   # detection; output pinned unchanged)
    "q203_vocab_oov_rate",         # r12: ONE corpus tokenize pass —
                                   # (lang, w) counts serve both the
                                   # vocab rank and the OOV aggregate
                                   # (4.9 -> 1.35 s at sf10, 0.17x)
)

# CERTIFICATION-REFRESH ROTATION (VERDICT r8 directive 6; r11 directive
# 1: spend the r12 window emptying the 43-entry r6 cohort, then bite
# into r7).  PRIORITY-ORDERED oldest-cert-first; the tail defers to
# the next round by design.
_STALE_CERT = (
    # r6 cohort — the 43 oldest certs in the registry (complete list;
    # recomputed from CORRECTNESS_r01–r11 latest-green)
    "q111_curriculum_quartiles", "q115_distribution_drift_psi",
    "q116_full_data_recipe", "q117_recursive_cte_month_series",
    "q118_percent_rank_cume_dist", "q119_lateral_topn_per_key",
    "q120_range_interval_frame", "q121_salted_skew_join",
    "q123_csv_source_roundtrip", "q124_jsonl_source_roundtrip",
    "q125_string_agg_sorted", "q126_map_aggregate_functions",
    "q128_orc_source_roundtrip", "q131_nth_value_lead_default",
    "q132_bitwise_bool_aggs", "q138_skew_diagnostics",
    "q145_ratio_to_report", "q146_grouping_id_rollup",
    "q147_try_cast_dirty_parse", "q148_union_by_name_missing_cols",
    "q153_batch_sessionization", "q154_rolling_zscore_anomaly",
    "q155_k_anonymity_audit", "q156_soft_quality_sampling",
    "q157_stratified_interleave", "q158_rag_chunking",
    "q159_touch_attribution", "q160_dataset_card",
    "q161_nested_struct_ops", "q162_explode_outer_empty_arrays",
    "q163_string_parsing_family", "q164_keyset_pagination",
    "q167_ab_test_zstat", "q168_gini_concentration",
    "q169_weighted_reservoir", "q170_period_over_period",
    "q171_gap_latency_report", "q172_geometric_harmonic_means",
    "q173_deterministic_mode", "q174_adoption_curve",
    "q175_null_safe_join", "q176_multiset_set_ops",
    "q177_topk_with_ties",
    # q265's r12 change (O(1) has-index check — directive 8) is a
    # BUILD-PATH-only edit: the declared output is pinned bit-identical
    # to the r11-certified decisions by q267's test and re-proved by
    # the in-repo oracle diff at HEAD, so its cert refresh yields to
    # the r6 cohort (7 changed + 43 r6 = the exact 50-slot window) and
    # lands first in r13
    "q265_streaming_dedup_gate",
    # r7 cohort head (oldest-first by qid; the rest of r7 continues in
    # the r13 rotation from where this window runs out)
    "q72_minhash_lsh_candidates", "q73_simhash_clusters",
    "q74_jaccard_verify", "q91_contamination_check",
    "q98_word_repetition_filter", "q101_dedup_clusters",
    "q103_ngram_decontamination", "q129_approx_distinct_bounds",
    "q130_canonical_doc_per_cluster", "q143_approx_percentile_bounds",
    "q178_referential_integrity_audit", "q179_cms_heavy_hitters",
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

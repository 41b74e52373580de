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
    # Tier 0 — round 13 changes, riskiest first.  All entries pass the
    # in-repo driver-faithful oracle diff at sf0.01 before queueing.
    "q271_ivfadc_search",          # NEW r13: IVF cells + PQ-ADC codes
                                   # composed (the Jégou IVFADC
                                   # deployment shape — q94's
                                   # partition-pruned cell scan with
                                   # q269's integer-exact ADC ranking)
    "q269_pq_adc_recall",          # r13: kernel touched (dead
                                   # adc.copy() removed in
                                   # pq_adc_eval's partial stage;
                                   # output unchanged by construction
                                   # — re-certified out of caution)
    "q240_weighted_median",        # r13: grouped_weighted_percentiles
                                   # reworked — raw rows bucket
                                   # map-side, the (group, value)
                                   # aggregate moved inside the target
                                   # bucket (corpus-wide exchange
                                   # gone; 7.5x -> 3.6x at sf10)
    "q245_grouped_weighted_percentiles",  # r13: rides the same rework
)

# CERTIFICATION-REFRESH ROTATION (VERDICT r8 directive 6; r12 directive
# 2: q265 leads the r13 window — its r12 change rode q267's pin — then
# the complete 34-entry r7 cohort, then the oldest r8 entries fill the
# 50-slot window).  PRIORITY-ORDERED oldest-cert-first; the tail defers
# to the next round by design.
_STALE_CERT = (
    # q265's r12 change (O(1) has-index check) was build-path-only and
    # its cert refresh yielded its r12 slot to the r6 cohort; it leads
    # the r13 window per VERDICT r12 directive 2.
    "q265_streaming_dedup_gate",
    # r7 cohort — the complete 34-entry set of the oldest remaining
    # certs (latest green = CORRECTNESS_r07; recomputed from
    # CORRECTNESS_r01–r12 latest-green at r13 start)
    "q72_minhash_lsh_candidates", "q73_simhash_clusters",
    "q74_jaccard_verify", "q91_contamination_check",
    "q98_word_repetition_filter", "q101_dedup_clusters",
    "q103_ngram_decontamination", "q129_approx_distinct_bounds",
    "q130_canonical_doc_per_cluster", "q143_approx_percentile_bounds",
    "q178_referential_integrity_audit", "q179_cms_heavy_hitters",
    "q180_merge_upsert_apply", "q181_equiwidth_histogram",
    "q182_ewma_smoothing", "q184_benford_first_digit_audit",
    "q186_bpe_merge_step", "q187_consecutive_dedup_compress",
    "q188_mad_robust_outliers", "q189_time_weighted_average",
    "q191_equidepth_binning", "q192_chisq_contingency",
    "q193_zorder_locality", "q196_quantile_normalization",
    "q197_cluster_aware_split", "q198_token_budget_mixing",
    "q199_zorder_roundtrip", "q200_partitioned_pruning_roundtrip",
    "q201_source_upsampling", "q202_domain_doc_cap",
    "q206_schema_evolution_roundtrip", "q207_padding_waste_report",
    "q212_minhash_calibration", "q213_neardup_provenance_matrix",
    # r8 cohort head (oldest-first by qid) — 11 entries complete the
    # 50-slot window (4 changed + 1 q265 + 34 r7 + 11 r8); the rest of
    # r8 continues in the r14 rotation
    "q01_parquet_scan_count", "q02_full_scan_project_all",
    "q03_projection_arithmetic", "q04_filter_and_or",
    "q05_filter_between_in", "q06_filter_like",
    "q07_null_handling", "q114_simhash_multiprobe_pairs",
    "q122_ttr_quality_battery", "q183_trigram_langid_confusion",
    "q190_array_function_bank",
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

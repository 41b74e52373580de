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
    # Tier 0 — the 21 registry entries added in round 6
    # (q178–q198) that have never appeared in any CORRECTNESS_r*.json.
    # Rounds 1–6 certified the other 176; none is red on its latest
    # check.  All 21 pass the in-repo driver-equivalent oracle diff at
    # sf0.01 (tests/test_oracle_diff.py); this tier routes them through
    # the real driver window.  tests/test_cert_window.py asserts the
    # tier stays inside the next window.
    "q178_referential_integrity_audit",
    "q179_cms_heavy_hitters",
    "q180_merge_upsert_apply",
    "q181_equiwidth_histogram",
    "q182_ewma_smoothing",
    "q183_trigram_langid_confusion",
    "q184_benford_first_digit_audit",
    "q185_label_noise_audit",
    "q186_bpe_merge_step",
    "q187_consecutive_dedup_compress",
    "q188_mad_robust_outliers",
    "q189_time_weighted_average",
    "q190_array_function_bank",
    "q191_equidepth_binning",
    "q192_chisq_contingency",
    "q193_zorder_locality",
    "q194_dup_ngram_coverage",
    "q195_incremental_agg_maintenance",
    "q196_quantile_normalization",
    "q197_cluster_aware_split",
    "q198_token_budget_mixing",
    # Tier 1 — queries whose round-6 rewrites postdate their last green
    # driver certification (all pass the in-repo oracle diff at sf0.01;
    # riskiest first).  Round-7 perf reworks (q53/q183/q194) keep their
    # slots here/above so their current form is what gets certified.
    "q53_json_extract",            # r7: VARIANT parse (try_variant_get)
    "q73_simhash_clusters",        # r6: shared signed-sum signature path
    "q122_ttr_quality_battery",    # r6: HOF-free tokenizer
    "q98_word_repetition_filter",  # r6: HOF-free + unconditional columns
    "q74_jaccard_verify",          # r6: array-intersect verify rework
    "q101_dedup_clusters",         # r6: array-intersect verify rework
    "q103_ngram_decontamination",  # r6: hash-before-distinct shuffle cut
    "q72_minhash_lsh_candidates",  # r6: word_shingles HOF-free tokens
    "q91_contamination_check",     # r6: word_shingles HOF-free tokens
    "q130_canonical_doc_per_cluster",  # r6: word_shingles HOF-free tokens
    "q129_approx_distinct_bounds",  # r7: rsd 0.01->0.02 (4x less state)
    "q143_approx_percentile_bounds",  # r7: array-form shared sketches
    "q114_simhash_multiprobe_pairs",  # r7: persisted int-key signatures
    # Tier 2 — NEW registry entries this round (round 7) append below;
    # 31 backlog slots + new entries must stay <= ~45 so the window
    # drains completely (VERDICT r6 directive 8).
    "q199_zorder_roundtrip",
    "q200_partitioned_pruning_roundtrip",
    "q205_bucketed_join_roundtrip",
    "q206_schema_evolution_roundtrip",
    "q201_source_upsampling",
    "q202_domain_doc_cap",
    "q203_vocab_oov_rate",
    "q207_padding_waste_report",
    "q208_ann_recall_eval",
    "q209_neardup_pagerank",
    "q210_repeated_passage_audit",
    "q211_semantic_dedup_cells",
    "q212_minhash_calibration",
    "q213_neardup_provenance_matrix",
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

"""Declared-query registry — import all modules to populate REGISTRY."""

from tidb_gateway_spark.queries.registry import REGISTRY, QuerySpec  # noqa: F401

# Import order is registration order; keep SURVEY §2B numbering grouped.
from tidb_gateway_spark.queries import (  # noqa: F401, E402
    scans_filters,
    joins,
    aggregates,
    windows,
    sorts_sets,
    scalar_functions,
    streaming_batch,
    llm_pipeline,
    subqueries,
)

try:  # extended ops (Q72+) — registered when present
    from tidb_gateway_spark.queries import llm_extended  # noqa: F401
    from tidb_gateway_spark.queries import analytics_extended  # noqa: F401
    from tidb_gateway_spark.queries import corpus_shaping  # noqa: F401
    from tidb_gateway_spark.queries import multimodal_pipeline  # noqa: F401
    from tidb_gateway_spark.queries import sources_queries  # noqa: F401
    from tidb_gateway_spark.queries import governance  # noqa: F401
    from tidb_gateway_spark.queries import statistics_extended  # noqa: F401
    from tidb_gateway_spark.queries import layout_quality  # noqa: F401
    from tidb_gateway_spark.queries import curation_extended  # noqa: F401
    from tidb_gateway_spark.queries import pipeline_audit  # noqa: F401
    from tidb_gateway_spark.queries import retrieval_curation  # noqa: F401
    from tidb_gateway_spark.queries import affinity_integrity  # noqa: F401
    from tidb_gateway_spark.queries import profiling_mixture  # noqa: F401
    from tidb_gateway_spark.queries import quality_eval  # noqa: F401
    from tidb_gateway_spark.queries import streaming_retrieval  # noqa: F401
    from tidb_gateway_spark.queries import distribution_quality  # noqa: F401
    from tidb_gateway_spark.queries import drift_monitoring  # noqa: F401
    from tidb_gateway_spark.queries import ann_compression  # noqa: F401
except ImportError:
    pass

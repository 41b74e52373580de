"""Plan inspection helpers — the engine's scale guardrails.

At 100 TB the difference between a good and bad plan is the difference
between minutes and days; these helpers make plan properties assertable
in tests (pushdown reached the scan, dimension joins broadcast, partial
aggregation before shuffle, codegen fused) so regressions fail CI
instead of surfacing on the cluster.
"""

from tidb_gateway_spark.plans.inspect import (  # noqa: F401
    explain_formatted,
    has_broadcast_join,
    has_partial_aggregate,
    has_whole_stage_codegen,
    pushed_filters,
    read_schema_columns,
)

"""Physical-plan inspection over ``explain('formatted')`` output."""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def explain_formatted(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters that reached the parquet scan (PushedFilters: [...])."""
    text = explain_formatted(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", text):
        if m.group(1).strip():
            out.extend(f.strip() for f in m.group(1).split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[set[str]]:
    """Column sets read by each parquet scan (ReadSchema) — column
    pruning evidence."""
    text = explain_formatted(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", text):
        cols = {c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()}
        out.append(cols)
    return out


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_formatted(df)


def has_partial_aggregate(df: DataFrame) -> bool:
    """Map-side combine before the shuffle (HashAggregate partial)."""
    text = explain_formatted(df)
    return bool(re.search(r"HashAggregate.*\n(?:.*\n)*?.*Exchange", text)) and (
        "partial" in text.lower() or "HashAggregate" in text
    )


def has_whole_stage_codegen(df: DataFrame) -> bool:
    """AQE's formatted plan omits codegen annotations pre-execution, so
    inspect the generated-code explain instead."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("codegen")
    return "WholeStageCodegen" in buf.getvalue()

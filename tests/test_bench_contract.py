"""The driver parses bench.py's FINAL stdout line as JSON (five rounds
of BENCH_r*.json went parsed:null before round 6 made the last line a
short summary).  Pin the contract: last line is valid JSON with the
scoreable fields, and the full map goes to bench_detail.json."""

from __future__ import annotations

import importlib
import io
import json
import os
from contextlib import redirect_stdout


def test_bench_final_line_is_short_parseable_summary(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_ONLY", "q01")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_RUNS", "1")
    monkeypatch.setattr("sys.argv", ["bench.py"])

    import bench
    importlib.reload(bench)  # re-read env-derived module globals

    buf = io.StringIO()
    with redirect_stdout(buf):
        bench.main()

    lines = [ln for ln in buf.getvalue().splitlines() if ln.strip()]
    summary = json.loads(lines[-1])  # must not raise
    assert summary["metric"] == "declared_query_suite_sec"
    assert summary["unit"] == "sec"
    assert summary["n_queries"] == 1
    assert isinstance(summary["value"], float)
    # short enough for any stdout tail capture
    assert len(lines[-1]) < 4000, len(lines[-1])

    detail = os.path.join(os.path.dirname(bench.__file__),
                          "bench_detail.json")
    with open(detail) as f:
        d = json.load(f)
    assert set(d["queries"]) == {"q01_parquet_scan_count"}

"""The driver parses bench.py's FINAL stdout line as JSON (five rounds
of BENCH_r*.json went parsed:null before round 6 made the last line a
short summary).  Pin the contract: last line is valid JSON with the
scoreable fields, and the full map goes to the detail file.

The detail file is pointed at tmp_path via SPARK_GRAFT_BENCH_DETAIL —
a pytest run must NEVER rewrite the repo's bench_detail.json, which is
the artifact BENCH_r*.json's ``detail_file`` references (a round-6
judge found a green test run silently replacing the round's perf
record with a one-query stub)."""

from __future__ import annotations

import hashlib
import importlib
import io
import json
import os
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _digest(path: str) -> str | None:
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def test_bench_final_line_is_short_parseable_summary(
        spark, monkeypatch, tmp_path):
    repo_detail = os.path.join(REPO, "bench_detail.json")
    before = _digest(repo_detail)

    detail = tmp_path / "bench_detail.json"
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_ONLY", "q01")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_RUNS", "1")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_DETAIL", str(detail))
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

    with open(detail) as f:
        d = json.load(f)
    assert set(d["queries"]) == {"q01_parquet_scan_count"}

    # the round artifact must be byte-identical after the run
    assert _digest(repo_detail) == before, (
        "pytest run modified the repo's bench_detail.json")


def test_bench_only_subset_cannot_clobber_full_detail(
        spark, monkeypatch, tmp_path, capsys):
    """A SPARK_GRAFT_BENCH_ONLY subset sweep with no explicit detail
    path must write bench_detail_subset.json, never the full-suite
    bench_detail.json (an r9 subset run overwrote the 251-query record
    with a 4-query stub — VERDICT r9 'What's wrong' #2)."""
    import shutil

    # run from a scratch copy of the repo root so even a buggy default
    # path cannot touch the real record
    bench_src = os.path.join(REPO, "bench.py")
    scratch = tmp_path / "bench.py"
    shutil.copy(bench_src, scratch)

    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_ONLY", "q01")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_RUNS", "1")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_DUCKDB", "0")
    monkeypatch.delenv("SPARK_GRAFT_BENCH_DETAIL", raising=False)
    monkeypatch.setattr("sys.argv", ["bench.py"])

    import runpy
    ns = runpy.run_path(str(scratch))
    ns["main"]()
    capsys.readouterr()

    assert not (tmp_path / "bench_detail.json").exists(), (
        "subset sweep wrote the full-suite detail filename")
    subset = tmp_path / "bench_detail_subset.json"
    assert subset.exists()
    with open(subset) as f:
        assert set(json.load(f)["queries"]) == {"q01_parquet_scan_count"}

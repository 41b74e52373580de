"""sources/derived.py — the shared companion contract (freshness,
atomicity) that every materialized artifact relies on."""

from __future__ import annotations

import os
import time

import pytest

from tidb_gateway_spark.sources import derived


def _touch(p, mtime=None):
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with open(p, "w") as f:
        f.write("x")
    if mtime is not None:
        os.utime(p, (mtime, mtime))


def test_is_fresh_marker_vs_source_mtime(tmp_path):
    src = str(tmp_path / "src.parquet")
    art = str(tmp_path / "artifact")
    now = time.time()
    _touch(src, now - 100)
    assert not derived.is_fresh(art, src)          # no artifact yet
    _touch(os.path.join(art, "_SUCCESS"), now - 50)
    assert derived.is_fresh(art, src)              # marker newer
    _touch(src, now)                               # source rewritten
    assert not derived.is_fresh(art, src)          # artifact stale


def test_is_fresh_directory_source_uses_newest_file(tmp_path):
    src = str(tmp_path / "srcdir")
    art = str(tmp_path / "artifact")
    now = time.time()
    _touch(os.path.join(src, "a.parquet"), now - 100)
    _touch(os.path.join(art, "_SUCCESS"), now - 50)
    assert derived.is_fresh(art, src)
    # a NEW file appearing inside the source directory invalidates
    _touch(os.path.join(src, "b.parquet"), now)
    assert not derived.is_fresh(art, src)


def test_build_atomic_crash_leaves_no_fresh_half_artifact(tmp_path):
    """The q206 regression class: a multi-write build that dies after
    its first write must NOT leave an artifact that passes the
    freshness check (Spark writes _SUCCESS after the first job)."""
    src = str(tmp_path / "src.parquet")
    art = str(tmp_path / "artifact")
    _touch(src, time.time() - 100)

    def crashy(tmp):
        _touch(os.path.join(tmp, "_SUCCESS"))  # first write commits
        raise RuntimeError("killed between write jobs")

    with pytest.raises(RuntimeError):
        derived.build_atomic(art, crashy)
    assert not derived.is_fresh(art, src)
    assert not os.path.exists(art)

    # a successful retry replaces the leftover temp dir and lands
    def ok(tmp):
        _touch(os.path.join(tmp, "part-0"))
        _touch(os.path.join(tmp, "_SUCCESS"))

    derived.build_atomic(art, ok)
    assert derived.is_fresh(art, src)
    assert os.path.exists(os.path.join(art, "part-0"))


def test_build_atomic_replaces_stale_artifact(tmp_path):
    src = str(tmp_path / "src.parquet")
    art = str(tmp_path / "artifact")
    now = time.time()
    _touch(src, now)
    _touch(os.path.join(art, "old-file"))
    _touch(os.path.join(art, "_SUCCESS"), now - 100)  # stale
    assert not derived.is_fresh(art, src)

    def ok(tmp):
        _touch(os.path.join(tmp, "new-file"))
        _touch(os.path.join(tmp, "_SUCCESS"))

    derived.build_atomic(art, ok)
    assert derived.is_fresh(art, src)
    assert not os.path.exists(os.path.join(art, "old-file"))


def test_derived_root_env_is_per_kind(tmp_path, monkeypatch):
    """SPARK_GRAFT_DERIVED_DIR is a PARENT: kinds get separate subdirs
    (the r7 unification — rollup.py and the format exports used to
    disagree on this)."""
    monkeypatch.setenv("SPARK_GRAFT_DERIVED_DIR", str(tmp_path))
    a = derived.derived_root("csv")
    b = derived.derived_root("zorder")
    assert a != b
    assert a.startswith(str(tmp_path)) and b.startswith(str(tmp_path))
    monkeypatch.delenv("SPARK_GRAFT_DERIVED_DIR")
    assert ".benchdata" in derived.derived_root("csv")


def test_q225_compaction_file_counts(spark, sf_dir):
    """The compaction companion's mechanics (not SQL-observable in the
    declared query): the fragmented generation has the configured
    small-file count, the compacted one the target count, and both
    carry identical row counts."""
    import glob
    import os

    from tidb_gateway_spark.queries import retrieval_curation as rc

    path = rc._q225_compacted(spark, sf_dir)
    n_small = len(glob.glob(os.path.join(path, "small", "*.parquet")))
    n_comp = len(glob.glob(os.path.join(path, "compacted", "*.parquet")))
    assert n_small == rc._Q225_SMALL_FILES, n_small
    assert n_comp == rc._Q225_TARGET_FILES, n_comp
    a = spark.read.parquet(os.path.join(path, "small")).count()
    b = spark.read.parquet(os.path.join(path, "compacted")).count()
    assert a == b

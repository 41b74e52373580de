"""Shared mtime-keyed derived-artifact store (.benchdata companions).

Every materialized companion in the engine — format exports (CSV/
JSONL/ORC), shredded JSON tables, hourly rollups, z-ordered and
day-partitioned copies, bucketed join tables — follows one contract:

* location: ``$SPARK_GRAFT_DERIVED_DIR/<kind>`` if the env var is set,
  else ``<repo>/.benchdata/<kind>`` (gitignored), subdirectory named
  by an md5 of the source path + build parameters;
* freshness: the artifact is fresh iff its ``_SUCCESS`` marker is at
  least as new as the source file — a rewritten fixture invalidates
  every companion derived from it;
* builds are ingest cost: queries measure the SERVING path, the build
  runs once per (fixture, parameters) like ANALYZE statistics.

This module is the single home of that contract (an r7 review found
five hand-rolled copies drifting — rollup.py treated the env var as a
parent directory while the others treated it as the root).
``build_atomic`` additionally makes MULTI-JOB builds crash-safe: Spark
writes ``_SUCCESS`` after the FIRST job, so a companion built by two
writes (e.g. the schema-evolution export's two file generations) must
build in a temp directory and rename into place, or a crash between
the jobs leaves a half-artifact that passes the freshness check
forever.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable


def derived_root(kind: str) -> str:
    env = os.environ.get("SPARK_GRAFT_DERIVED_DIR")
    if env:
        return os.path.join(env, kind)
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.path.join(repo, ".benchdata", kind)


def derived_path(kind: str, name: str) -> str:
    return os.path.join(derived_root(kind), name)


def is_fresh(path: str, src: str, marker: str = "_SUCCESS") -> bool:
    """Artifact at ``path`` is usable iff its marker is no older than
    ``src`` (directory sources: the newest file inside)."""
    m = os.path.join(path, marker)
    if not os.path.exists(m):
        return False
    if os.path.isdir(src):
        src_mtime = max(
            (os.path.getmtime(os.path.join(r, f))
             for r, _, fs in os.walk(src) for f in fs),
            default=os.path.getmtime(src),
        )
    else:
        src_mtime = os.path.getmtime(src)
    return os.path.getmtime(m) >= src_mtime


def build_atomic(path: str, build: Callable[[str], None]) -> None:
    """Run ``build(tmp_dir)`` then atomically rename into ``path``.

    Required whenever the build is more than ONE Spark write job: the
    first job's ``_SUCCESS`` would otherwise mark a half-built
    artifact fresh if the process dies before the last job commits.
    """
    tmp = path + ".build"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    build(tmp)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.rename(tmp, path)

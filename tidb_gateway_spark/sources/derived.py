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

import json
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

    This is the LOCAL-FILESYSTEM fast path (directory rename is atomic
    on POSIX).  Companions that must switch over safely on an
    S3-class object store — where directory rename is copy+delete and
    non-atomic — use the manifest-pointer machinery below instead
    (``publish_generation`` / ``current_generation``).
    """
    tmp = path + ".build"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    build(tmp)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.rename(tmp, path)


# ---------------------------------------------------------------------
# Manifest-pointer switchover (r10 verdict directive 4): the
# object-store-safe form of "atomically replace a companion".
#
# Generations are IMMUTABLE directories under the companion root
# (gen-000001, gen-000002, …); one small MANIFEST.json names the
# current one.  Publishing writes the new generation IN FULL, then
# atomically replaces the manifest (write-temp + fsync + os.replace —
# a single-FILE atomic operation on every POSIX filesystem, and the
# single-key-PUT shape an object-store deployment maps it to).
# Readers resolve every access through the manifest, so a crash at ANY
# point mid-publish leaves them on the old complete generation; a
# half-written gen directory is garbage, never served.  Superseded
# generations are garbage-collected only AFTER the flip.

MANIFEST = "MANIFEST.json"


def read_manifest(root: str) -> dict | None:
    """Current manifest of a generation-managed companion, or None if
    the root has none (missing or legacy single-directory layout)."""
    try:
        with open(os.path.join(root, MANIFEST)) as f:
            return json.load(f)
    except (FileNotFoundError, NotADirectoryError):
        return None


def write_manifest(root: str, state: dict) -> None:
    """Atomically replace the companion's manifest with ``state``.

    os.replace of a same-directory file is atomic on POSIX; the fsync
    before it makes the content durable before the pointer flips, and
    the directory fsync after it makes the FLIP durable (a crash
    cannot resurrect the old pointer after a reader saw the new one).
    """
    os.makedirs(root, exist_ok=True)
    tmp = os.path.join(root, MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(state, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(root, MANIFEST))
    dfd = os.open(root, os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)


def publish_generation(root: str, build: Callable[[str], None]) -> str:
    """Build the NEXT immutable generation of a companion and flip the
    manifest to it; returns the new generation's directory.

    A crash before the ``write_manifest`` call leaves readers on the
    previous generation (the half-built gen-N directory is unreachable
    garbage, rebuilt/overwritten on the next publish); a crash after
    it only skips garbage collection.
    """
    cur = read_manifest(root)
    seq = (int(cur["seq"]) + 1) if cur else 1
    name = f"gen-{seq:06d}"
    gen = os.path.join(root, name)
    if os.path.exists(gen):  # leftovers of a crashed previous publish
        shutil.rmtree(gen)
    os.makedirs(root, exist_ok=True)
    build(gen)
    write_manifest(root, {"seq": seq, "generation": name})
    # lazy GC AFTER the flip: readers resolved through the manifest can
    # no longer reach the superseded generation
    for d in os.listdir(root):
        if d.startswith("gen-") and d != name:
            shutil.rmtree(os.path.join(root, d), ignore_errors=True)
    return gen


def current_generation(root: str) -> str:
    """Directory readers should serve from: the manifest's current
    generation, or the root itself for legacy single-dir companions."""
    m = read_manifest(root)
    if m is None:
        return root
    return os.path.join(root, m["generation"])

"""Driver certification-window simulation (VERDICT r5 directive 7).

The driver records only the first ~50 entries of ``queries()`` per round
(CORRECTNESS_r01–r04: 50 each; r05: 51).  A registry reorder could
silently push a never-certified query out of its planned window.  This
test renders ``__spark_entry__`` through the same protocol the driver
uses — ordering, window size, oracle presence — and fails if any query
that has never appeared in a ``CORRECTNESS_r*.json`` falls outside the
next window.

No SparkSession needed; this is pure registry/metadata inspection.
"""

from __future__ import annotations

import glob
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# Conservative lower bound on the driver's per-round window (observed
# 50, 50, 50, 50, 51 across rounds 1-5).
WINDOW = 50


def _certified_qids() -> set[str]:
    qids: set[str] = set()
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        with open(path) as f:
            qids |= set(json.load(f))
    return qids


def test_window_is_spent_on_never_certified_or_changed():
    """The registry can exceed one window (176+ queries vs ~50 slots),
    so the invariant is not "everything uncertified fits" but "no slot
    is wasted": every query in the next window must be either
    never-certified or explicitly re-queued via _CHANGED_FIRST, and
    never-certified queries must rank AHEAD of every certified query
    whose code did not change (so each round's window drains the
    backlog maximally — a reorder can't silently demote one)."""
    import __spark_entry__ as entry

    order = list(entry.queries())
    certified = _certified_qids()
    changed = set(entry._CHANGED_FIRST)

    # A slot is wasted only if a certified-unchanged query ranks ahead
    # of ANY backlog entry (never-certified or changed).  Once the
    # backlog is smaller than the window, the remaining slots
    # legitimately fall to the stalest certified queries.
    backlog = [q for q in order if q not in certified or q in changed]
    last_backlog = max(
        (i for i, q in enumerate(order)
         if q not in certified or q in changed), default=-1)
    wasted = [q for q in order[:last_backlog + 1]
              if q in certified and q not in changed]
    assert not wasted, (
        f"window slots spent on certified, unchanged queries ahead of "
        f"backlog entries: {wasted}"
    )
    assert len(backlog) <= WINDOW, (
        f"backlog ({len(backlog)}) exceeds the ~{WINDOW}-slot window — "
        f"trim _CHANGED_FIRST or defer new registry entries "
        f"(VERDICT r6 directive 8)"
    )

    # never-certified queries must form a block no certified-unchanged
    # query precedes
    first_settled = next(
        (i for i, q in enumerate(order)
         if q in certified and q not in changed), len(order))
    demoted = [q for q in order[first_settled:] if q not in certified]
    assert not demoted, (
        f"never-certified queries ranked behind certified, unchanged "
        f"ones (would defer their certification a full round): {demoted}"
    )


def test_window_queries_all_have_oracles():
    """Every query in the upcoming window gets the strong (value-hash)
    check — a windowed slot spent on a rows-only check is wasted."""
    import __spark_entry__ as entry

    order = list(entry.queries())
    oracles = entry.oracle_sql()
    missing = [q for q in order[:WINDOW] if q not in oracles]
    assert not missing, f"window queries without oracle SQL: {missing}"


def test_ordering_is_stable_and_complete():
    """queries() must enumerate the full registry exactly once, in a
    deterministic order, with every priority entry resolving."""
    import __spark_entry__ as entry
    from tidb_gateway_spark.queries import REGISTRY

    order = list(entry.queries())
    assert sorted(order) == sorted(REGISTRY)
    assert len(order) == len(set(order))
    unknown = [q for q in entry._CHANGED_FIRST if q not in REGISTRY]
    assert not unknown, f"_CHANGED_FIRST names unknown qids: {unknown}"
    # duplicate priority entries would silently demote a query to its
    # later (lower-priority) rank — forbid them
    assert len(entry._CHANGED_FIRST) == len(set(entry._CHANGED_FIRST))
    # _STALE_CERT gets the same validation (r9 ADVICE): a typo'd or
    # renamed qid would silently drop that query from the
    # certification-refresh rotation to the settled tail
    unknown = [q for q in entry._STALE_CERT if q not in REGISTRY]
    assert not unknown, f"_STALE_CERT names unknown qids: {unknown}"
    assert len(entry._STALE_CERT) == len(set(entry._STALE_CERT))
    overlap = set(entry._STALE_CERT) & set(entry._CHANGED_FIRST)
    assert not overlap, (
        f"qids in both _CHANGED_FIRST and _STALE_CERT (ambiguous "
        f"priority): {sorted(overlap)}"
    )

"""Skew mitigation for joins on hot keys.

A hash join shuffles both sides by the join key; a hot key (one user
with 10% of all events, a null-ish default id, a celebrity entity)
lands its entire partition on ONE task and the stage runs at the speed
of that straggler.  Two escape hatches, in preference order:

1. **AQE skew-join** (``spark.sql.adaptive.skewJoin.enabled``, on in
   our tuned sessions): the runtime splits oversized shuffle partitions
   and replicates the matching build side — zero code change, the
   right default.  It only engages for sort-merge joins above the
   skewedPartitionThreshold, so small-but-pathological cases and
   broadcast-ineligible shapes can still straggle.
2. **Explicit salting** (:func:`salted_join`): split every hot probe
   row into one of ``n_salt`` sub-keys and replicate each build row
   ``n_salt`` times, so the hot key's work spreads across ``n_salt``
   tasks.  Deterministic (salt = pmod(hash(row id), n)) — results are
   a set-equal of the plain join.

Cost model: salting multiplies the BUILD side's shuffle volume by
``n_salt`` — apply it to dimension-sized builds against fact-sized
probes, never fact×fact (there, fix the key or pre-aggregate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(probe: DataFrame, build: DataFrame, key: str,
                n_salt: int = 8, salt_on: Column | None = None,
                how: str = "inner") -> DataFrame:
    """Join ``probe ⋈ build`` on ``key`` with an ``n_salt``-way salt.

    ``salt_on``: expression over probe columns giving the salt basis
    (default: the probe's key itself hashed with a spread column —
    callers with a unique row id should pass it for an even spread
    within the hot key).  The build side is exploded ``n_salt``× so
    every (key, salt) pair finds its build rows.

    Returns the joined frame with the salt column dropped; column set
    identical to a plain ``probe.join(build, key, how)``.
    """
    basis = salt_on if salt_on is not None else F.spark_partition_id()
    p = probe.withColumn("_salt", F.pmod(F.hash(basis), F.lit(n_salt)))
    b = build.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return p.join(b, [key, "_salt"], how).drop("_salt")

"""Engine function shims.

``stable_round`` / ``oracle_round``: cross-engine-deterministic rounding.
Native ROUND differs between engines on half-way representations (Spark
rounds the double's shortest decimal repr HALF_UP via BigDecimal; DuckDB
rounds ``x*10^n`` in binary), so two engines can disagree on *bitwise
identical* doubles.  ``FLOOR(x*10^n + 0.5)/10^n`` uses only IEEE ops that
every engine evaluates identically, so equal inputs give equal outputs —
the property the DuckDB-oracle hash-match actually needs.  (For negative
x this is round-half-toward-+inf; consistency, not MySQL parity, is the
contract here.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def stable_round(col: Column, n: int = 2) -> Column:
    p = float(10 ** n)
    return F.floor(col * F.lit(p) + F.lit(0.5)).cast("double") / F.lit(p)


def oracle_round(expr: str, n: int = 2) -> str:
    p = 10 ** n
    return f"FLOOR(({expr})*{p} + 0.5)/{p}"

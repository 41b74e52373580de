"""tidb_gateway_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the *capabilities* of oh-my-tidb/tidb-gateway
(reference at /root/reference, a MySQL wire-protocol gateway that is
SQL-transparent — gateway/gateway.go:128-130) as a Spark-first engine:

* ``gateway/``   — asyncio MySQL wire-protocol frontend (the part the
                   reference actually implements: packet framing, handshake
                   codecs, zlib compression, username-prefix routing).
* ``queries/``   — the declared-query registry (SURVEY.md §2B Q01–Q71 plus
                   extended LLM-pipeline operators), each entry a Spark
                   DataFrame/SQL callable paired with a DuckDB oracle SQL.
* ``operators/`` — reusable distributed operators (as-of join, dedup
                   families, similarity search, text analysis, multimodal
                   column plumbing) built on DataFrame primitives.
* ``streaming/`` — Structured Streaming jobs over the events stream.
* ``sources/``   — table registration / IO (Parquet/CSV/JSON readers).
* ``functions/`` — MySQL-dialect shims on top of pyspark.sql.functions.
* ``plans/``     — plan-inspection helpers (pushdown / codegen assertions).

Everything is designed for a 1000-executor cluster reading ~100 TB even
though tests run on local[32]: declarative plans (Catalyst does pushdown,
pruning, join selection), explicit broadcasts for dimension tables, no
driver-side collect loops, Arrow-batched pandas UDFs only off the hot path.
"""

__version__ = "0.1.0"

from tidb_gateway_spark.session import get_spark, ensure_session_confs  # noqa: F401

"""Reusable distributed operators (as-of join, dedup, similarity, text).

Each module exposes pure DataFrame→DataFrame transforms; nothing here
collects to the driver.  These are the engine's library surface — the
declared queries in ``tidb_gateway_spark.queries`` compose them.
"""

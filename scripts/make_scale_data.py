#!/usr/bin/env python
"""Generate a larger-scale benchmark dataset by replicating the driver
fixtures with shifted keys (default 10x sf0.1 -> "sf1").

Purpose: BASELINE.md's crossover claim — that the engine/DuckDB ratio is
dominated by Spark's flat per-query cost and shrinks as data grows —
needs a measured point above sf0.1.  The driver provides no sf1
fixtures, so this derives one: each fact-table replica i shifts every
surrogate key by i*stride (stride = max(key)+1 of the base), keeping FK
joins resolvable (nation/region dims stay fixed, as in TPC-H).  Text is
made replica-distinct by suffixing every word with "~i" (otherwise 10
byte-identical clones of each document would inflate near-dup candidate
pairs quadratically and the dedup benchmarks would measure clone
explosion, not corpus scaling); embeddings get a tiny per-replica
component perturbation for the same reason.

This data is for PERFORMANCE measurement only — correctness is gated on
the driver's own sf0.01 fixtures.  Output goes under the repo
(.benchdata/, gitignored), one parquet FILE per table so both
`spark.read.parquet` and DuckDB `read_parquet` address them identically
to the driver fixtures.

Usage: python scripts/make_scale_data.py [--factor 10] [--out .benchdata/sf1]
"""

from __future__ import annotations

import argparse
import os

import duckdb

TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)

# table -> columns shifted by i*stride(key-source table).  Strides come
# from the base table that OWNS the key so FK pairs shift in lockstep.
KEY_SHIFTS: dict[str, list[tuple[str, str]]] = {
    "customer": [("c_custkey", "customer")],
    "supplier": [("s_suppkey", "supplier")],
    "part": [("p_partkey", "part")],
    "orders": [("o_orderkey", "orders"), ("o_custkey", "customer")],
    "lineitem": [
        ("l_orderkey", "orders"),
        ("l_partkey", "part"),
        ("l_suppkey", "supplier"),
    ],
    "events": [("event_id", "events"), ("user_id", "events_user")],
    "documents": [("doc_id", "documents")],
    "embeddings": [("vec_id", "embeddings")],
}

STRIDE_SQL = {
    "customer": "SELECT MAX(c_custkey) + 1 FROM src_customer",
    "supplier": "SELECT MAX(s_suppkey) + 1 FROM src_supplier",
    "part": "SELECT MAX(p_partkey) + 1 FROM src_part",
    "orders": "SELECT MAX(o_orderkey) + 1 FROM src_orders",
    "events": "SELECT MAX(event_id) + 1 FROM src_events",
    "events_user": "SELECT MAX(user_id) + 1 FROM src_events",
    "documents": "SELECT MAX(doc_id) + 1 FROM src_documents",
    "embeddings": "SELECT MAX(vec_id) + 1 FROM src_embeddings",
}


def replica_select(table: str, i: int, strides: dict[str, int],
                   cols: list[str]) -> str:
    shifts = {c: s for c, s in KEY_SHIFTS.get(table, [])}
    exprs = []
    for c in cols:
        if c in shifts and i > 0:
            exprs.append(f"{c} + {i * strides[shifts[c]]} AS {c}")
        elif table == "documents" and c == "text" and i > 0:
            # word-suffix keeps shingle/minhash structure per-replica
            exprs.append(
                "array_to_string(list_transform(string_split(text, ' '), "
                f"x -> x || '~{i}'), ' ') AS text"
            )
        elif table == "embeddings" and c == "embedding" and i > 0:
            # keep the source's FLOAT[] physical type; replicas i>0 get
            # per-DIMENSION deterministic noise with enough magnitude to
            # break near-duplicate similarity between replicas of one
            # base vector.  The old constant shift (x + i*1e-3) barely
            # moved cosine, so N replicas of each base stayed mutual
            # near-dups and pair-enumerating benchmarks (q93) measured
            # clone explosion (~quadratic in factor), not corpus scale.
            amp = 0.05 + 0.02 * (i % 5)
            exprs.append(
                "CAST(list_transform(range(1, len(embedding) + 1), "
                f"j -> embedding[j] + {amp} * sin(j * {i} * 2.399963)) "
                "AS FLOAT[]) AS embedding"
            )
        else:
            exprs.append(c)
    return f"SELECT {', '.join(exprs)} FROM src_{table}"


def _replicate_events_pyarrow(src: str, out: str, factor: int) -> None:
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    base = pq.read_table(src)
    id_stride = pc.max(base["event_id"]).as_py() + 1
    user_stride = pc.max(base["user_id"]).as_py() + 1
    chunks = [base]
    for i in range(1, factor):
        t = base.set_column(
            base.schema.get_field_index("event_id"), "event_id",
            pc.add(base["event_id"], i * id_stride))
        t = t.set_column(
            t.schema.get_field_index("user_id"), "user_id",
            pc.add(t["user_id"], i * user_stride))
        chunks.append(t)
    pq.write_table(pa.concat_tables(chunks), out)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".benchdata", "sf1"))
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW src_{t} AS SELECT * FROM "
            f"read_parquet('{args.src}/{t}.parquet')"
        )
    strides = {k: con.execute(sql).fetchone()[0]
               for k, sql in STRIDE_SQL.items()}

    for t in TABLES:
        out = os.path.join(args.out, f"{t}.parquet")
        if t in ("region", "nation"):  # fixed dims, never replicated
            con.execute(
                f"COPY (SELECT * FROM src_{t}) TO '{out}' (FORMAT PARQUET)"
            )
            continue
        if t == "events":
            # DuckDB reads/writes parquet TIMESTAMP(NANOS) as
            # microseconds; replicate via pyarrow to keep the physical
            # type identical to the driver fixture (the engine's scan
            # path — nanosAsLong — depends on it).
            _replicate_events_pyarrow(
                f"{args.src}/{t}.parquet", out, args.factor)
            n = con.execute(
                f"SELECT COUNT(*) FROM read_parquet('{out}')").fetchone()[0]
            print(f"{t}: {n} rows")
            continue
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM src_{t}").fetchall()]
        union = " UNION ALL ".join(
            replica_select(t, i, strides, cols) for i in range(args.factor)
        )
        con.execute(f"COPY ({union}) TO '{out}' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{out}')").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()

"""Simulate the correctness driver: import __spark_entry__ from /root/repo,
build a VANILLA SparkSession (none of the repo's tuned configs), run
entry(), then run every queries() entry at sf0.01 against oracle_sql()
via DuckDB with an order-insensitive value-hash compare."""
import hashlib
import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as mod

spark = SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

# --- smoke: entry() on a vanilla session
t0 = time.time()
edf = mod.entry(spark)
rows = edf.collect()
print(f"entry(): {len(rows)} rows, schema={edf.schema.simpleString()}, {time.time()-t0:.1f}s")
assert len(rows) >= 0

SF_DIR = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

def vhash(pdf):
    # DRIVER-FAITHFUL canonicalization (CORRECTNESS_r07 q190 lesson):
    # the real driver sorts the pandas frame over all columns via
    # sort_values, which raises on unhashable cells (numpy arrays,
    # dicts).  Reproduce that failure mode here — do NOT str() cells
    # before sorting, or array-typed outputs sail through the sim and
    # red-flag only in the real driver.
    cols = sorted(pdf.columns)
    pdf = pdf[cols].sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    def cell(v):
        if v is None: return "NULL"
        if isinstance(v, float):
            if math.isnan(v): return "NULL"
            return repr(v)
        return str(v)
    rows = [tuple(cell(v) for v in r) for r in pdf.itertuples(index=False, name=None)]
    return hashlib.sha256("\n".join(",".join(r) for r in rows).encode()).hexdigest()

qs = mod.queries()
oracles = mod.oracle_sql()
# optional argv qid prefixes restrict the run (targeted re-verification
# after a rework); no args = the full driver-faithful sweep
if sys.argv[1:]:
    qs = {q: f for q, f in qs.items()
          if any(q.startswith(p) for p in sys.argv[1:])}
print(f"{len(qs)} queries, {len(oracles)} oracles")
fails = []
for qid, fn in sorted(qs.items()):
    t0 = time.time()
    # the real driver records a per-query err instead of aborting the
    # whole window — mirror that (r7: q190's canonicalizer TypeError)
    try:
        sdf = fn(spark, SF_DIR)
        spdf = sdf.toPandas()
        el = time.time() - t0
        if qid not in oracles:
            print(f"  {qid}: rows-only ({len(spdf)} rows) {el:.1f}s")
            continue
        dpdf = con.execute(oracles[qid]).fetchdf()
        ok = len(spdf) == len(dpdf) and vhash(spdf) == vhash(dpdf)
    except Exception as exc:  # noqa: BLE001
        print(f"  {qid}: ERR {type(exc).__name__}: {exc}")
        fails.append(qid)
        continue
    print(f"  {qid}: {'OK' if ok else 'MISMATCH'} ({len(spdf)} rows) {el:.1f}s")
    if not ok:
        fails.append(qid)
print("FAILURES:", fails if fails else "none")
sys.exit(1 if fails else 0)

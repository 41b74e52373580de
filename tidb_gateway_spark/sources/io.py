"""Readers and writers.

The reference advertises ``ClientLocalFiles`` (LOAD DATA LOCAL INFILE,
/root/reference/mysql/constants.go:10) and relays INSERT/CTAS opaquely;
this engine implements the actual IO surface on Spark's DataSource API.

Scale notes: every reader is schema-explicit when possible (schema
inference is a full extra pass at 100 TB); writes partition by a caller-
chosen column so downstream scans prune; ``maxRecordsPerFile`` bounds
file sizes for object-store friendliness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_csv(spark: SparkSession, path: str, schema: T.StructType | None = None,
             header: bool = True, **options) -> DataFrame:
    reader = spark.read.options(header=str(header).lower(), **options)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType | None = None,
              **options) -> DataFrame:
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_orc(spark: SparkSession, path: str,
             schema: T.StructType | None = None) -> DataFrame:
    """ORC reader (Spark-native columnar format besides parquet;
    pushdown/pruning work identically)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc_table(df: DataFrame, path: str, mode: str = "overwrite",
                    partition_by: list[str] | None = None) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def write_parquet_table(df: DataFrame, path: str, mode: str = "overwrite",
                        partition_by: list[str] | None = None,
                        max_records_per_file: int = 5_000_000) -> None:
    """CTAS / INSERT-INTO-SELECT sink: partitioned parquet."""
    writer = df.write.mode(mode).option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed_table(df: DataFrame, table: str, bucket_cols: list[str],
                         num_buckets: int, path: str | None = None,
                         sort_cols: list[str] | None = None,
                         mode: str = "overwrite") -> str:
    """Write a hash-bucketed (and optionally per-bucket sorted) catalog
    table — the co-located-join storage layout.

    At 100 TB, fact tables that are repeatedly joined or aggregated on
    the same key (orders⋈lineitem on orderkey) should be bucketed on
    that key at ingest: both sides then read already-hash-clustered
    data and the join planner drops the shuffle Exchange on each side
    entirely (and with ``sort_cols`` = join key, the sort too).  One
    shuffle paid once at write time replaces a shuffle per query.
    Bucketing requires a catalog table (bucket metadata lives in the
    metastore); ``path`` makes it external.  Returns the table name.

    The frame is repartitioned onto the bucket hash BEFORE the write so
    each bucket lands in exactly ONE file: repartition and bucketBy use
    the same Murmur3-pmod assignment, so writer task *i* holds exactly
    bucket *i*'s rows.  This matters on the READ side — Spark only
    trusts (and reports) the per-bucket sort order when a bucket is a
    single file; with one file per task per bucket (the default
    multi-task write), every downstream sort-merge join silently
    re-sorts both sides per query, which at sf3 cost q205 ~3× its
    floor.  Write parallelism becomes ``num_buckets`` tasks — size
    num_buckets to the cluster (hundreds+ at 100 TB), not to the
    fixture.
    """
    writer = (df.repartition(num_buckets, *bucket_cols)
              .write.mode(mode).format("parquet").bucketBy(
                  num_buckets, *bucket_cols))
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
    return table


def shred_json_column(df: DataFrame, json_col: str, schema: str | T.StructType,
                      keep: list[str] | None = None,
                      drop_source: bool = True,
                      prefix: str = "") -> DataFrame:
    """Shred a JSON string column into typed top-level columns — the
    ingest-time answer to per-query JSON parsing.

    Parsing JSON per query costs ~2.2 s per million rows in Spark
    (measured: get_json_object / json_tuple / from_json all within 10%,
    BASELINE.md) and is pure waste when the same paths are re-extracted
    every query.  At 100 TB the pattern is: parse ONCE at ingest with
    ``from_json`` against an explicit schema, store typed columns in
    parquet, and every later query reads a pruned, pushdown-friendly
    column instead of re-parsing text.  Pair with
    :func:`write_parquet_table` for the materialization.

    ``schema``: DDL string ("k INT, tags ARRAY<STRING>") or StructType.
    ``keep``: subset of parsed fields to surface (default: all).
    ``prefix``: prepended to every surfaced column name.  A surfaced
    name colliding with an existing column (e.g. props containing an
    ``event_id`` field) raises instead of emitting an ambiguous
    duplicate.
    """
    from pyspark.sql import functions as F

    parsed = df.withColumn("_j", F.from_json(F.col(json_col), schema))
    names = (keep if keep is not None
             else parsed.schema["_j"].dataType.fieldNames())
    existing = set(df.columns)
    clashes = [prefix + n for n in names if prefix + n in existing]
    if clashes:
        raise ValueError(
            f"shredded column name(s) {clashes} collide with existing "
            f"columns; pass a prefix= or keep= to disambiguate")
    out = parsed.select(
        "*", *[F.col(f"_j.{n}").alias(prefix + n) for n in names]
    ).drop("_j")
    return out.drop(json_col) if drop_source else out


def load_data_infile(spark: SparkSession, local_path: str, view_name: str,
                     schema: T.StructType | None = None,
                     delimiter: str = ",", header: bool = False) -> DataFrame:
    """LOAD DATA LOCAL INFILE analog: CSV file → registered temp view."""
    df = read_csv(spark, local_path, schema=schema, header=header, sep=delimiter)
    df.createOrReplaceTempView(view_name)
    return df

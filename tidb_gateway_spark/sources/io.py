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


def write_parquet_table(df: DataFrame, path: str, mode: str = "overwrite",
                        partition_by: list[str] | None = None,
                        max_records_per_file: int = 5_000_000) -> None:
    """CTAS / INSERT-INTO-SELECT sink: partitioned parquet."""
    writer = df.write.mode(mode).option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def load_data_infile(spark: SparkSession, local_path: str, view_name: str,
                     schema: T.StructType | None = None,
                     delimiter: str = ",", header: bool = False) -> DataFrame:
    """LOAD DATA LOCAL INFILE analog: CSV file → registered temp view."""
    df = read_csv(spark, local_path, schema=schema, header=header, sep=delimiter)
    df.createOrReplaceTempView(view_name)
    return df

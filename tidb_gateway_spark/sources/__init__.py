"""Source/sink surface (SURVEY.md §2B scans/sources/sinks rows)."""

from tidb_gateway_spark.sources.io import (  # noqa: F401
    read_csv,
    read_json,
    read_parquet,
    write_parquet_table,
    load_data_infile,
)

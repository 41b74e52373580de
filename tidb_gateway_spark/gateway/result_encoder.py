"""DataFrame → MySQL text-protocol result set.

The inverse of SURVEY.md §1.3's type mapping: Spark types → MySQL column
definition type codes (charset 46), then one lenenc text row per record.

Flush discipline mirrors the reference's relay batching: bytes are
buffered and the transport flushed only at result-set boundaries —
column-count, rows streamed, then EOF/OK/ERR triggers the drain
(/root/reference/gateway/relay.go:85-93).

Scale note: rows stream through ``toLocalIterator`` (one partition in
flight on the driver) rather than ``collect`` — a 10 GB result set never
materializes in driver memory at once.
"""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from tidb_gateway_spark.gateway import constants as C
from tidb_gateway_spark.gateway import packets

_BINARY_CHARSET = 63

_TYPE_MAP: list[tuple[type, tuple[int, int, int]]] = [
    # SparkType → (mysql type code, display length, charset)
    (T.ByteType, (C.MYSQL_TYPE_TINY, 4, _BINARY_CHARSET)),
    (T.ShortType, (C.MYSQL_TYPE_SHORT, 6, _BINARY_CHARSET)),
    (T.IntegerType, (C.MYSQL_TYPE_LONG, 11, _BINARY_CHARSET)),
    (T.LongType, (C.MYSQL_TYPE_LONGLONG, 20, _BINARY_CHARSET)),
    (T.FloatType, (C.MYSQL_TYPE_FLOAT, 12, _BINARY_CHARSET)),
    (T.DoubleType, (C.MYSQL_TYPE_DOUBLE, 22, _BINARY_CHARSET)),
    (T.DecimalType, (C.MYSQL_TYPE_NEWDECIMAL, 40, _BINARY_CHARSET)),
    (T.BooleanType, (C.MYSQL_TYPE_TINY, 1, _BINARY_CHARSET)),
    (T.DateType, (C.MYSQL_TYPE_DATE, 10, _BINARY_CHARSET)),
    (T.TimestampType, (C.MYSQL_TYPE_TIMESTAMP, 26, _BINARY_CHARSET)),
    (T.TimestampNTZType, (C.MYSQL_TYPE_TIMESTAMP, 26, _BINARY_CHARSET)),
    (T.BinaryType, (C.MYSQL_TYPE_BLOB, 65535, _BINARY_CHARSET)),
    (T.StringType, (C.MYSQL_TYPE_VAR_STRING, 1024, C.DEFAULT_COLLATION_ID)),
]


def mysql_type_for(dt_: T.DataType) -> tuple[int, int, int]:
    for klass, spec in _TYPE_MAP:
        if isinstance(dt_, klass):
            return spec
    # arrays / maps / structs serialize as JSON-ish strings
    return (C.MYSQL_TYPE_VAR_STRING, 4096, C.DEFAULT_COLLATION_ID)


_TYPE_NAMES: list[tuple[type, str]] = [
    (T.ByteType, "tinyint(4)"),
    (T.ShortType, "smallint(6)"),
    (T.IntegerType, "int(11)"),
    (T.LongType, "bigint(20)"),
    (T.FloatType, "float"),
    (T.DoubleType, "double"),
    (T.BooleanType, "tinyint(1)"),
    (T.DateType, "date"),
    (T.TimestampType, "timestamp(6)"),
    (T.TimestampNTZType, "datetime(6)"),
    (T.BinaryType, "blob"),
    (T.StringType, "varchar(1024)"),
]


def mysql_type_name(dt_: T.DataType) -> str:
    """Spark type → MySQL column-type string (DESCRIBE / SHOW CREATE)."""
    if isinstance(dt_, T.DecimalType):
        return f"decimal({dt_.precision},{dt_.scale})"
    for klass, name in _TYPE_NAMES:
        if isinstance(dt_, klass):
            return name
    return "text"  # arrays/maps/structs serialize as JSON-ish text


def encode_value(v: object) -> bytes | None:
    """Python value → text-protocol bytes (None → NULL marker)."""
    if v is None:
        return None
    if isinstance(v, bool):
        return b"1" if v else b"0"
    if isinstance(v, (int, Decimal)):
        return str(v).encode()
    if isinstance(v, float):
        return repr(v).encode()
    if isinstance(v, bytes):
        return v
    if isinstance(v, dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f" if v.microsecond else "%Y-%m-%d %H:%M:%S").encode()
    if isinstance(v, dt.date):
        return v.isoformat().encode()
    if isinstance(v, (list, tuple)):
        return ("[" + ",".join((encode_value(x) or b"NULL").decode() for x in v) + "]").encode()
    if isinstance(v, dict):
        return str(v).encode()
    return str(v).encode()


def resultset_payloads(df: DataFrame, capability: int,
                       status: int = C.SERVER_STATUS_AUTOCOMMIT,
                       more_results: bool = False):
    """Yield the packet payloads of a text result set, lazily.

    Row production (``toLocalIterator``) happens wherever the generator
    is driven — the server advances it on an executor thread in chunks
    and writes the payloads from the event-loop thread, keeping the
    asyncio transport single-threaded.
    """
    if more_results:
        status |= C.SERVER_MORE_RESULTS_EXISTS
    schema = df.schema
    b = packets.Buffer()
    b.write_lenenc_int(len(schema.fields))
    yield b.getvalue()
    for f in schema.fields:
        code, length, charset = mysql_type_for(f.dataType)
        yield packets.column_definition(f.name, code, charset=charset, column_length=length)
    if not capability & C.CLIENT_DEPRECATE_EOF:
        yield packets.eof_packet(capability, status)
    for row in df.toLocalIterator():
        yield packets.text_row([encode_value(v) for v in row])
    if capability & C.CLIENT_DEPRECATE_EOF:
        yield packets.ok_packet(capability, status=status, header=0xFE)
    else:
        yield packets.eof_packet(capability, status)


def binary_resultset_payloads(df: DataFrame, capability: int,
                              status: int = C.SERVER_STATUS_AUTOCOMMIT):
    """Binary-protocol result set (COM_STMT_EXECUTE responses)."""
    from tidb_gateway_spark.gateway.prepared import encode_binary_row

    schema = df.schema
    type_codes = [mysql_type_for(f.dataType)[0] for f in schema.fields]
    b = packets.Buffer()
    b.write_lenenc_int(len(schema.fields))
    yield b.getvalue()
    for f in schema.fields:
        code, length, charset = mysql_type_for(f.dataType)
        yield packets.column_definition(f.name, code, charset=charset, column_length=length)
    if not capability & C.CLIENT_DEPRECATE_EOF:
        yield packets.eof_packet(capability, status)
    for row in df.toLocalIterator():
        yield encode_binary_row(list(row), type_codes)
    if capability & C.CLIENT_DEPRECATE_EOF:
        yield packets.ok_packet(capability, status=status, header=0xFE)
    else:
        yield packets.eof_packet(capability, status)


def write_simple_resultset(pio, columns: list[str], rows: list[list[object]],
                           capability: int, status: int = C.SERVER_STATUS_AUTOCOMMIT,
                           more_results: bool = False) -> None:
    """Locally synthesized result set (SHOW ..., SELECT @@var, ...)."""
    if more_results:
        status |= C.SERVER_MORE_RESULTS_EXISTS
    b = packets.Buffer()
    b.write_lenenc_int(len(columns))
    pio.write_packet(b.getvalue())
    for name in columns:
        pio.write_packet(packets.column_definition(name, C.MYSQL_TYPE_VAR_STRING))
    if not capability & C.CLIENT_DEPRECATE_EOF:
        pio.write_packet(packets.eof_packet(capability, status))
    for row in rows:
        pio.write_packet(packets.text_row([encode_value(v) for v in row]))
    if capability & C.CLIENT_DEPRECATE_EOF:
        pio.write_packet(packets.ok_packet(capability, status=status, header=0xFE))
    else:
        pio.write_packet(packets.eof_packet(capability, status))

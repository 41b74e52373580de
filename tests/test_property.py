"""Property-based tests (hypothesis) for the wire codecs — extends the
reference's randomized tests (conn_test.go) with shrinking coverage."""

from __future__ import annotations

import asyncio

from hypothesis import given, settings
from hypothesis import strategies as st

from tidb_gateway_spark.gateway import dialect
from tidb_gateway_spark.gateway.wire import Buffer, PacketIO


@given(st.integers(min_value=0, max_value=2**64 - 1))
def test_lenenc_int_roundtrip(v):
    b = Buffer()
    b.write_lenenc_int(v)
    r = Buffer(b.getvalue())
    assert r.read_lenenc_int() == v
    assert r.remaining() == 0


@given(st.binary(max_size=4096))
def test_lenenc_string_roundtrip(data):
    b = Buffer()
    b.write_lenenc_string(data)
    assert Buffer(b.getvalue()).read_lenenc_string() == data


@given(st.lists(st.binary(max_size=70000), min_size=1, max_size=6))
@settings(max_examples=30, deadline=None)
def test_packet_stream_roundtrip(payloads):
    async def go():
        reader = asyncio.StreamReader()

        class W:
            def write(self, d):
                reader.feed_data(d)

        a = PacketIO(reader, W())
        b = PacketIO(reader, W())
        for p in payloads:
            a.write_packet(p)
        for p in payloads:
            assert await b.read_packet() == p

    asyncio.run(go())


@given(st.lists(st.sampled_from(
    ["SELECT 1", "SELECT ';'", 'SELECT ";`;"', "SELECT `a;b` FROM t",
     "-- c;\nSELECT 2", "/* x; */ SELECT 3"]), min_size=1, max_size=5))
def test_split_statements_one_per_part(parts):
    """Quoted/commented ';' never splits: joining N statements always
    yields exactly N back, and re-splitting any output is stable."""
    sql = "; ".join(parts)
    out = dialect.split_statements(sql)
    assert len(out) == len(parts)
    for stmt in out:
        assert dialect.split_statements(stmt) == [stmt]


@given(st.text(max_size=200))
@settings(max_examples=300, deadline=None)
def test_dialect_classify_never_crashes(sql):
    """The gateway statement classifier must TOTAL-function over
    arbitrary client bytes: any text classifies (usually as a plain
    query) without raising — a gateway that throws on a weird
    statement drops the connection."""
    kind, detail = dialect.classify(sql)
    assert isinstance(kind, str)


@given(st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd", "Zs", "Po", "Ps", "Pe")),
    max_size=120))
@settings(max_examples=200, deadline=None)
def test_dialect_rewrite_never_crashes(sql):
    """to_spark_sql (the MySQL→Spark dialect shim) must also be total —
    rewrites apply or pass through, never raise."""
    out = dialect.to_spark_sql(sql)
    assert isinstance(out, str)

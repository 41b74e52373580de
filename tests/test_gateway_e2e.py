"""End-to-end wire tests (SURVEY.md §5.2 item 3): a raw-socket MySQL
client connects to the asyncio gateway, authenticates with the
username-prefix routing rule, and runs queries against Spark — covering
COM_PING, USE, SET, @@vars, SHOW, multi-statement, error mapping,
dialect rewrites, and the compressed protocol."""

from __future__ import annotations

import asyncio
import datetime as dt_mod
import re

import pytest

from tidb_gateway_spark.gateway import constants as C
from tidb_gateway_spark.gateway.auth import native_scramble
from tidb_gateway_spark.gateway.compress import CompressedStream
from tidb_gateway_spark.gateway.packets import Handshake, HandshakeResponse
from tidb_gateway_spark.gateway.server import Gateway
from tidb_gateway_spark.gateway.wire import Buffer, PacketIO

CLIENT_CAPS = (
    C.CLIENT_PROTOCOL_41
    | C.CLIENT_SECURE_CONNECTION
    | C.CLIENT_PLUGIN_AUTH
    | C.CLIENT_MULTI_STATEMENTS
    | C.CLIENT_MULTI_RESULTS
)


class MiniClient:
    """Raw-socket text-protocol MySQL client (client side of the codecs,
    exercising the server's reader path independently)."""

    def __init__(self, host: str, port: int):
        self.host, self.port = host, port
        self.capability = CLIENT_CAPS

    async def connect(self, username: str, password: str = "", compress: bool = False):
        self.reader, self.writer = await asyncio.open_connection(self.host, self.port)
        self.pio = PacketIO(self.reader, self.writer)
        greeting = Handshake.read(await self.pio.read_packet())
        assert greeting.server_version == C.SERVER_VERSION
        self.server_capability = greeting.capability
        self.nonce = greeting.auth_plugin_data  # reused by change_user
        self.conn_id = greeting.connection_id   # KILL / processlist target
        caps = self.capability | (C.CLIENT_COMPRESS if compress else 0)
        auth = native_scramble(password, greeting.auth_plugin_data) if password else b""
        res = HandshakeResponse(
            capability=caps,
            max_packet_size=1 << 24,
            username=username,
            auth_response=auth,
            auth_plugin_name="mysql_native_password",
        )
        self.pio.write_packet(res.write())
        await self.writer.drain()
        reply = await self.pio.read_packet()
        if compress and reply[0] == 0x00:
            cs = CompressedStream(self.reader, self.writer)
            self._stream = cs
            self.pio = PacketIO(cs, cs)
        else:
            self._stream = None
        return reply

    async def _flush(self):
        if self._stream:
            await self._stream.drain()
        else:
            await self.writer.drain()

    async def command(self, cmd: int, payload: bytes = b""):
        self.pio.reset_seq()
        if self._stream:
            self._stream.reset_seq()
        self.pio.write_packet(bytes([cmd]) + payload)
        await self._flush()

    async def query(self, sql: str, infile_data: bytes | None = None):
        """→ list of (columns, rows) result sets, or dict for OK/ERR.

        ``infile_data``: bytes to stream when the server requests a
        LOCAL INFILE (0xFB packet)."""
        await self.command(C.COM_QUERY, sql.encode())
        results = []
        while True:
            first = await self.pio.read_packet()
            if first[:1] == b"\xfb":
                # server requests the local file: stream content packets
                # then an empty terminator, continuing the sequence
                assert infile_data is not None, first
                for i in range(0, len(infile_data), 8192):
                    self.pio.write_packet(infile_data[i : i + 8192])
                self.pio.write_packet(b"")
                await self._flush()
                continue
            if first[0] == 0xFF:
                code = int.from_bytes(first[1:3], "little")
                results.append({"error": code, "message": first[9:].decode(errors="replace")})
                return results
            if first[0] == 0x00:
                b = Buffer(first)
                b.skip(1)
                affected = b.read_lenenc_int()
                b.read_lenenc_int()
                status = b.read_uint(2)
                results.append({"ok": True, "affected": affected, "status": status})
                if status & C.SERVER_MORE_RESULTS_EXISTS:
                    continue
                return results
            ncols = Buffer(first).read_lenenc_int()
            cols = []
            for _ in range(ncols):
                p = Buffer(await self.pio.read_packet())
                p.read_lenenc_string()  # catalog
                p.read_lenenc_string()  # schema
                p.read_lenenc_string()  # table
                p.read_lenenc_string()  # org_table
                cols.append(p.read_lenenc_string().decode())
            eof = await self.pio.read_packet()
            assert eof[0] == 0xFE
            rows = []
            while True:
                p = await self.pio.read_packet()
                if p and p[0] == 0xFE and len(p) < 9:
                    status = int.from_bytes(p[3:5], "little") if len(p) >= 5 else 0
                    break
                b = Buffer(p)
                row = []
                for _ in range(ncols):
                    if b.data[b.pos] == 0xFB:
                        b.skip(1)
                        row.append(None)
                    else:
                        row.append(b.read_lenenc_string().decode())
                rows.append(row)
            results.append((cols, rows))
            if not status & C.SERVER_MORE_RESULTS_EXISTS:
                return results

    async def _read_coldefs(self, ncols):
        cols = []
        for _ in range(ncols):
            p = Buffer(await self.pio.read_packet())
            for _ in range(5):
                p.read_lenenc_string()
            name = p.read_lenenc_string().decode()
            p.read_lenenc_int()      # fixed-length marker
            p.read_uint(2)           # charset
            p.read_uint(4)           # column length
            tcode = p.read_byte()
            cols.append((name, tcode))
        return cols

    async def stmt_prepare(self, sql: str) -> tuple[int, int]:
        await self.command(C.COM_STMT_PREPARE, sql.encode())
        first = await self.pio.read_packet()
        assert first[0] == 0x00, first
        b = Buffer(first)
        b.skip(1)
        stmt_id = b.read_uint(4)
        num_columns = b.read_uint(2)
        num_params = b.read_uint(2)
        if num_params:
            await self._read_coldefs(num_params)
            eof = await self.pio.read_packet()
            assert eof[0] == 0xFE
        self.last_prepare_columns = None
        if num_columns:
            self.last_prepare_columns = await self._read_coldefs(num_columns)
            eof = await self.pio.read_packet()
            assert eof[0] == 0xFE
        return stmt_id, num_params

    def _encode_execute_body(self, stmt_id: int, params: list,
                             cursor: bool = False, send_types: bool = True,
                             omit: tuple = ()):
        """``omit``: indices whose value was streamed ahead via
        COM_STMT_SEND_LONG_DATA — typed but carrying no value bytes."""
        import struct

        body = Buffer()
        body.write_uint(stmt_id, 4)
        body.write_byte(C.CURSOR_TYPE_READ_ONLY if cursor else 0)
        body.write_uint(1, 4)   # iteration count
        if params:
            nulls = bytearray((len(params) + 7) // 8)
            for i, v in enumerate(params):
                if v is None and i not in omit:
                    nulls[i // 8] |= 1 << (i % 8)
            body.write_bytes(bytes(nulls))
            body.write_byte(1 if send_types else 0)
            if send_types:
                for i, v in enumerate(params):
                    if i in omit:
                        body.write_byte(C.MYSQL_TYPE_BLOB)
                        body.write_byte(0)
                    elif v is None:
                        body.write_byte(C.MYSQL_TYPE_NULL)
                        body.write_byte(0)
                    elif isinstance(v, dt_mod.timedelta):
                        body.write_byte(C.MYSQL_TYPE_TIME)
                        body.write_byte(0)
                    elif isinstance(v, int):
                        body.write_byte(C.MYSQL_TYPE_LONGLONG)
                        body.write_byte(0)
                    elif isinstance(v, float):
                        body.write_byte(C.MYSQL_TYPE_DOUBLE)
                        body.write_byte(0)
                    else:
                        body.write_byte(C.MYSQL_TYPE_VAR_STRING)
                        body.write_byte(0)
            for i, v in enumerate(params):
                if i in omit or v is None:
                    continue
                if isinstance(v, dt_mod.timedelta):
                    total_us = int(v / dt_mod.timedelta(microseconds=1))
                    neg = 1 if total_us < 0 else 0
                    total_us = abs(total_us)
                    s, us = divmod(total_us, 1_000_000)
                    days, rem = divmod(s, 86400)
                    h, rem = divmod(rem, 3600)
                    mi, sec = divmod(rem, 60)
                    if us:
                        body.write_byte(12)
                        body.write_byte(neg)
                        body.write_uint(days, 4)
                        body.write_bytes(bytes([h, mi, sec]))
                        body.write_uint(us, 4)
                    else:
                        body.write_byte(8)
                        body.write_byte(neg)
                        body.write_uint(days, 4)
                        body.write_bytes(bytes([h, mi, sec]))
                elif isinstance(v, int):
                    body.write_bytes(struct.pack("<q", v))
                elif isinstance(v, float):
                    body.write_bytes(struct.pack("<d", v))
                else:
                    body.write_lenenc_string(str(v).encode())
        return body.getvalue()

    async def _read_binary_rows(self, cols):
        first = await self.pio.read_packet()
        return await self._read_binary_rows_with_first(first, cols)

    async def send_long_data(self, stmt_id: int, param_id: int, data: bytes):
        """COM_STMT_SEND_LONG_DATA — fire-and-forget, no server reply."""
        body = stmt_id.to_bytes(4, "little") + param_id.to_bytes(2, "little") + data
        await self.command(C.COM_STMT_SEND_LONG_DATA, body)

    async def change_user(self, username: str, password: str = "",
                          database: str = ""):
        """COM_CHANGE_USER with the auth proof computed against the
        ORIGINAL handshake nonce (no new scramble is issued)."""
        auth = native_scramble(password, self.nonce) if password else b""
        body = Buffer()
        body.write_bytes(username.encode() + b"\x00")
        body.write_byte(len(auth))
        body.write_bytes(auth)
        body.write_bytes(database.encode() + b"\x00")
        body.write_uint(C.DEFAULT_COLLATION_ID, 2)
        body.write_bytes(b"mysql_native_password\x00")
        await self.command(C.COM_CHANGE_USER, body.getvalue())
        return await self.pio.read_packet()

    async def reset_connection(self):
        await self.command(C.COM_RESET_CONNECTION)
        return await self.pio.read_packet()

    async def set_option(self, opt: int):
        await self.command(C.COM_SET_OPTION, opt.to_bytes(2, "little"))
        return await self.pio.read_packet()

    async def stmt_execute(self, stmt_id: int, params: list,
                           send_types: bool = True, omit: tuple = ()):
        await self.command(
            C.COM_STMT_EXECUTE,
            self._encode_execute_body(stmt_id, params, send_types=send_types,
                                      omit=omit),
        )
        first = await self.pio.read_packet()
        if first[0] == 0xFF:
            return {"error": int.from_bytes(first[1:3], "little")}
        ncols = Buffer(first).read_lenenc_int()
        cols = await self._read_coldefs(ncols)
        eof = await self.pio.read_packet()
        assert eof[0] == 0xFE
        rows, _ = await self._read_binary_rows(cols)
        return ([c[0] for c in cols], rows)

    async def stmt_execute_cursor(self, stmt_id: int, params: list):
        """EXECUTE with CURSOR_TYPE_READ_ONLY: server answers column
        definitions + EOF only; rows come via stmt_fetch."""
        await self.command(
            C.COM_STMT_EXECUTE,
            self._encode_execute_body(stmt_id, params, cursor=True),
        )
        first = await self.pio.read_packet()
        if first[0] == 0xFF:
            return {"error": int.from_bytes(first[1:3], "little")}
        ncols = Buffer(first).read_lenenc_int()
        cols = await self._read_coldefs(ncols)
        eof = await self.pio.read_packet()
        assert eof[0] == 0xFE
        status = int.from_bytes(eof[3:5], "little") if len(eof) >= 5 else 0
        return cols, status

    async def stmt_fetch(self, stmt_id: int, n: int, cols):
        """COM_STMT_FETCH: up to n binary rows + EOF (no column defs)."""
        body = Buffer()
        body.write_uint(stmt_id, 4)
        body.write_uint(n, 4)
        await self.command(C.COM_STMT_FETCH, body.getvalue())
        first = await self.pio.read_packet()
        if first and first[0] == 0xFF:
            return {"error": int.from_bytes(first[1:3], "little")}
        if first and first[0] == 0xFE and len(first) < 9:
            status = int.from_bytes(first[3:5], "little") if len(first) >= 5 else 0
            return [], status
        # first packet was a row — push back handling: decode it plus rest
        rows_first, eof = await self._read_binary_rows_with_first(first, cols)
        status = int.from_bytes(eof[3:5], "little") if len(eof) >= 5 else 0
        return rows_first, status

    async def _read_binary_rows_with_first(self, first, cols):
        import struct as _s

        ncols = len(cols)
        rows = []
        p = first
        while True:
            if p and p[0] == 0xFE and len(p) < 9:
                return rows, p
            b = Buffer(p)
            assert b.read_byte() == 0x00
            nulls = b.read_bytes((ncols + 9) // 8)
            row = []
            for i, (_, tcode) in enumerate(cols):
                pos = i + 2
                if nulls[pos // 8] & (1 << (pos % 8)):
                    row.append(None)
                elif tcode == C.MYSQL_TYPE_LONGLONG:
                    row.append(_s.unpack("<q", b.read_bytes(8))[0])
                elif tcode == C.MYSQL_TYPE_LONG:
                    row.append(_s.unpack("<i", b.read_bytes(4))[0])
                elif tcode == C.MYSQL_TYPE_DOUBLE:
                    row.append(_s.unpack("<d", b.read_bytes(8))[0])
                elif tcode in (C.MYSQL_TYPE_TIMESTAMP, C.MYSQL_TYPE_DATE, 0x0C):
                    n = b.read_byte()
                    raw = b.read_bytes(n)
                    row.append(raw)
                else:
                    row.append(b.read_lenenc_string().decode())
            rows.append(row)
            p = await self.pio.read_packet()

    async def stmt_close(self, stmt_id: int):
        body = stmt_id.to_bytes(4, "little")
        await self.command(C.COM_STMT_CLOSE, body)

    async def ping(self):
        await self.command(C.COM_PING)
        return await self.pio.read_packet()

    async def quit(self):
        await self.command(C.COM_QUIT)
        self.writer.close()


@pytest.fixture()
def gateway(spark, sf_dir):
    """Run the gateway inside each test's event loop via async context."""

    def make():
        return Gateway(
            spark,
            clusters={"sf001": sf_dir},
            default_cluster=sf_dir,
            users=None,
            port=0,
        )

    return make


def run_with_gateway(gateway_factory, client_coro):
    async def go():
        gw = gateway_factory()
        await gw.start()
        try:
            return await asyncio.wait_for(client_coro(gw), timeout=180)
        finally:
            await gw.stop()

    return asyncio.run(go())


def test_basic_query_roundtrip(gateway):
    async def scenario(gw):
        c = MiniClient("127.0.0.1", gw.bound_port)
        ok = await c.connect("sf001.alice")
        assert ok[0] == 0x00
        res = await c.query("SELECT COUNT(*) AS n FROM lineitem")
        cols, rows = res[0]
        assert cols == ["n"]
        assert int(rows[0][0]) == 6000
        res = await c.query(
            "SELECT l_returnflag, SUM(l_quantity) AS sq FROM lineitem "
            "GROUP BY l_returnflag ORDER BY l_returnflag"
        )
        cols, rows = res[0]
        assert cols == ["l_returnflag", "sq"]
        assert [r[0] for r in rows] == ["A", "N", "R"]
        await c.quit()

    run_with_gateway(gateway, scenario)


def test_session_commands_and_sysvars(gateway):
    async def scenario(gw):
        c = MiniClient("127.0.0.1", gw.bound_port)
        await c.connect("sf001.alice")
        assert (await c.ping())[0] == 0x00
        assert (await c.query("USE analytics"))[0]["ok"]
        assert (await c.query("SET autocommit=0"))[0]["ok"]
        res = await c.query("SELECT @@version, @@autocommit AS ac")
        cols, rows = res[0]
        assert cols == ["@@version", "ac"]
        assert rows[0][0] == C.SERVER_VERSION
        assert rows[0][1] == "0"
        assert (await c.query("BEGIN"))[0]["ok"]
        assert (await c.query("COMMIT"))[0]["ok"]
        cols, rows = (await c.query("SHOW TABLES"))[0]
        assert ["lineitem"] in rows
        cols, rows = (await c.query("SHOW COLLATION"))[0]
        assert any(r[0] == "utf8mb4_bin" for r in rows)
        await c.quit()

    run_with_gateway(gateway, scenario)


def test_multi_statement_and_more_results(gateway):
    async def scenario(gw):
        c = MiniClient("127.0.0.1", gw.bound_port)
        await c.connect("sf001.alice")
        res = await c.query("SELECT 1 AS a; SELECT 2 AS b")
        assert len(res) == 2
        assert res[0][1] == [["1"]]
        assert res[1][1] == [["2"]]
        await c.quit()

    run_with_gateway(gateway, scenario)


def test_error_mapping(gateway):
    async def scenario(gw):
        c = MiniClient("127.0.0.1", gw.bound_port)
        await c.connect("sf001.alice")
        res = await c.query("SELECT * FROM does_not_exist")
        assert res[0]["error"] == 1146
        res = await c.query("SELEC broken")
        assert res[0]["error"] == 1064
        res = await c.query("SELECT nope FROM lineitem")
        assert res[0]["error"] == 1054
        await c.quit()

    run_with_gateway(gateway, scenario)


def test_unknown_cluster_rejected(gateway):
    async def scenario(gw):
        c = MiniClient("127.0.0.1", gw.bound_port)
        reply = await c.connect("nosuch.alice")
        assert reply[0] == 0xFF
        assert b"unknown cluster" in reply

    run_with_gateway(gateway, scenario)


def test_native_password_auth(spark, sf_dir):
    def factory():
        return Gateway(spark, clusters={"sf001": sf_dir}, default_cluster=sf_dir,
                       users={"alice": "s3cret"}, port=0)

    async def scenario(gw):
        good = MiniClient("127.0.0.1", gw.bound_port)
        assert (await good.connect("sf001.alice", password="s3cret"))[0] == 0x00
        await good.quit()
        bad = MiniClient("127.0.0.1", gw.bound_port)
        reply = await bad.connect("sf001.alice", password="wrong")
        assert reply[0] == 0xFF

    run_with_gateway(factory, scenario)


def test_compressed_protocol(gateway):
    async def scenario(gw):
        c = MiniClient("127.0.0.1", gw.bound_port)
        ok = await c.connect("sf001.alice", compress=True)
        assert ok[0] == 0x00
        # result > 128 B so the deflate path engages
        res = await c.query(
            "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey"
        )
        cols, rows = res[0]
        assert len(rows) == 5
        res = await c.query("SELECT COUNT(*) AS n FROM orders")
        assert int(res[0][1][0][0]) == 1500
        await c.quit()

    run_with_gateway(gateway, scenario)


def test_dialect_rewrites_e2e(gateway):
    async def scenario(gw):
        c = MiniClient("127.0.0.1", gw.bound_port)
        await c.connect("sf001.alice")
        res = await c.query("SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 5, 3")
        cols, rows = res[0]
        # o_orderkey starts at 0 in the fixture → offset 5 yields 5,6,7
        assert [int(r[0]) for r in rows] == [5, 6, 7]
        res = await c.query(
            "SELECT GROUP_CONCAT(r_name) AS names FROM "
            "(SELECT r_name FROM region ORDER BY r_regionkey) t"
        )
        cols, rows = res[0]
        assert cols == ["names"]
        assert "," in rows[0][0]
        await c.quit()

    run_with_gateway(gateway, scenario)


def test_load_data_local_infile(gateway):
    async def scenario(gw):
        c = MiniClient("127.0.0.1", gw.bound_port)
        await c.connect("sf001.alice")
        csv = b"1,alpha\n2,beta\n3,gamma\n"
        res = await c.query(
            "LOAD DATA LOCAL INFILE '/client/side/data.csv' INTO TABLE staged "
            "FIELDS TERMINATED BY ','",
            infile_data=csv,
        )
        assert res[0]["ok"] and res[0]["affected"] == 3
        cols, rows = (await c.query("SELECT c0, c1 FROM staged ORDER BY c0"))[0]
        assert rows == [["1", "alpha"], ["2", "beta"], ["3", "gamma"]]
        # second load appends (union semantics)
        res = await c.query(
            "LOAD DATA LOCAL INFILE 'x.csv' INTO TABLE staged "
            "FIELDS TERMINATED BY ','",
            infile_data=b"4,delta\n",
        )
        assert res[0]["affected"] == 1
        cols, rows = (await c.query("SELECT COUNT(*) AS n FROM staged"))[0]
        assert rows == [["4"]]
        await c.quit()

    run_with_gateway(gateway, scenario)


def test_load_data_tab_delimited(gateway):
    """MySQL semantics: FIELDS TERMINATED BY '\\t' arrives as the raw
    two-char escape and must unescape to a real tab; omitting the FIELDS
    clause entirely defaults to tab (not comma)."""
    async def scenario(gw):
        c = MiniClient("127.0.0.1", gw.bound_port)
        await c.connect("sf001.alice")
        tsv = b"1\talpha\n2\tbeta\n"
        res = await c.query(
            "LOAD DATA LOCAL INFILE 't.tsv' INTO TABLE tabbed "
            "FIELDS TERMINATED BY '\\t'",
            infile_data=tsv,
        )
        assert res[0]["ok"] and res[0]["affected"] == 2, res
        cols, rows = (await c.query("SELECT c0, c1 FROM tabbed ORDER BY c0"))[0]
        assert rows == [["1", "alpha"], ["2", "beta"]]
        # no FIELDS clause → MySQL default is tab
        res = await c.query(
            "LOAD DATA LOCAL INFILE 'u.tsv' INTO TABLE tabbed2",
            infile_data=b"7\tzeta\n",
        )
        assert res[0]["ok"] and res[0]["affected"] == 1, res
        cols, rows = (await c.query("SELECT c0, c1 FROM tabbed2"))[0]
        assert rows == [["7", "zeta"]]
        await c.quit()

    run_with_gateway(gateway, scenario)


def test_cross_cluster_session_isolation(spark):
    """Two connections routed to different clusters must see different
    catalogs concurrently (per-connection newSession isolation)."""

    def factory():
        return Gateway(
            spark,
            clusters={"small": "/root/testdata/sf0.001", "big": "/root/testdata/sf0.01"},
            default_cluster=None,
            port=0,
        )

    async def scenario(gw):
        c1 = MiniClient("127.0.0.1", gw.bound_port)
        c2 = MiniClient("127.0.0.1", gw.bound_port)
        await c1.connect("small.alice")
        await c2.connect("big.bob")
        q = "SELECT COUNT(*) AS n FROM lineitem"
        (n1,), (n2,) = await asyncio.gather(c1.query(q), c2.query(q))
        assert int(n1[1][0][0]) == 6000
        assert int(n2[1][0][0]) == 60000
        # interleave again in the other order to catch clobbering
        (n2b,), (n1b,) = await asyncio.gather(c2.query(q), c1.query(q))
        assert int(n1b[1][0][0]) == 6000
        assert int(n2b[1][0][0]) == 60000
        # temp view created on c1 must be invisible to c2
        await c1.query("LOAD DATA LOCAL INFILE 'f' INTO TABLE mine",
                       infile_data=b"9,ok\n")
        res = await c2.query("SELECT COUNT(*) AS n FROM mine")
        assert res[0].get("error") == 1146, res
        await c1.quit()
        await c2.quit()

    run_with_gateway(factory, scenario)


def _make_cert(tmp_path):
    import subprocess

    key, crt = str(tmp_path / "k.pem"), str(tmp_path / "c.pem")
    subprocess.run(
        ["openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes",
         "-keyout", key, "-out", crt, "-days", "1", "-subj", "/CN=localhost"],
        check=True, capture_output=True,
    )
    return key, crt


def test_tls_upgrade(spark, sf_dir, tmp_path):
    """ClientSSL upgrade (gateway.go:88-100 / tls.go analog): client
    sends a bare SSL request, both sides start TLS, handshake response
    re-sent over the encrypted channel, queries flow."""
    import ssl

    key, crt = _make_cert(tmp_path)
    server_ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    server_ctx.load_cert_chain(crt, key)

    def factory():
        return Gateway(spark, clusters={"sf001": sf_dir}, default_cluster=sf_dir,
                       port=0, ssl_context=server_ctx)

    async def scenario(gw):
        reader, writer = await asyncio.open_connection("127.0.0.1", gw.bound_port)
        pio = PacketIO(reader, writer)
        greeting = Handshake.read(await pio.read_packet())
        assert greeting.capability & C.CLIENT_SSL
        caps = CLIENT_CAPS | C.CLIENT_SSL
        # stage 1: bare SSL request (32-byte prefix only)
        pio.write_packet(HandshakeResponse(capability=caps, is_ssl_request=True).write())
        await writer.drain()
        # stage 2: client-side TLS upgrade (InsecureSkipVerify analog)
        client_ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
        client_ctx.check_hostname = False
        client_ctx.verify_mode = ssl.CERT_NONE
        await writer.start_tls(client_ctx)
        # stage 3: real handshake response over TLS (sequence continues)
        res = HandshakeResponse(capability=caps, username="sf001.alice",
                                auth_response=b"", auth_plugin_name="mysql_native_password")
        pio.write_packet(res.write())
        await writer.drain()
        reply = await pio.read_packet()
        assert reply[0] == 0x00, reply
        # run a query over the encrypted channel
        pio.reset_seq()
        pio.write_packet(bytes([C.COM_QUERY]) + b"SELECT COUNT(*) AS n FROM region")
        await writer.drain()
        first = await pio.read_packet()
        assert Buffer(first).read_lenenc_int() == 1  # one column
        writer.close()

    run_with_gateway(factory, scenario)


def test_prepared_statements_binary_protocol(gateway):
    async def scenario(gw):
        c = MiniClient("127.0.0.1", gw.bound_port)
        await c.connect("sf001.alice")
        sid, nparams = await c.stmt_prepare(
            "SELECT o_orderkey, o_totalprice FROM orders "
            "WHERE o_custkey = ? AND o_totalprice > ? ORDER BY o_orderkey"
        )
        assert nparams == 2
        ref = await c.query(
            "SELECT o_orderkey, o_totalprice FROM orders "
            "WHERE o_custkey = 7 AND o_totalprice > 1000.0 ORDER BY o_orderkey"
        )
        cols, rows = await c.stmt_execute(sid, [7, 1000.0])
        assert cols == ["o_orderkey", "o_totalprice"]
        text_rows = [[int(r[0]), float(r[1])] for r in ref[0][1]]
        assert [[r[0], r[1]] for r in rows] == text_rows
        assert rows, "expected at least one row for the chosen customer"

        # string + NULL params, re-execute with different binding
        sid2, _ = await c.stmt_prepare(
            "SELECT COUNT(*) AS n FROM orders WHERE o_orderpriority = ?"
        )
        _, rows_a = await c.stmt_execute(sid2, ["1-URGENT"])
        _, rows_b = await c.stmt_execute(sid2, ["5-LOW"])
        na, nb = rows_a[0][0], rows_b[0][0]
        assert na > 0 and nb > 0 and na != nb or (na > 0 and nb > 0)

        await c.stmt_close(sid)
        # closed statement id now unknown
        res = await c.stmt_execute(sid, [1, 2.0])
        assert res == {"error": 1243}
        await c.quit()

    run_with_gateway(gateway, scenario)


def test_prepare_reports_column_metadata(gateway):
    """COM_STMT_PREPARE resolves the result schema at prepare time
    (num_columns > 0 + column definition packets), so strict clients can
    pre-allocate row buffers before EXECUTE."""
    async def scenario(gw):
        c = MiniClient("127.0.0.1", gw.bound_port)
        await c.connect("sf001.alice")
        sid, nparams = await c.stmt_prepare(
            "SELECT o_orderkey, o_totalprice FROM orders WHERE o_custkey = ?"
        )
        assert nparams == 1
        assert c.last_prepare_columns is not None
        assert [col[0] for col in c.last_prepare_columns] == [
            "o_orderkey", "o_totalprice"
        ]
        # type codes carried through the inverse type mapping
        assert c.last_prepare_columns[0][1] == C.MYSQL_TYPE_LONGLONG
        assert c.last_prepare_columns[1][1] == C.MYSQL_TYPE_DOUBLE
        await c.stmt_close(sid)
        await c.quit()

    run_with_gateway(gateway, scenario)


def test_cursor_fetch_streams_rows(gateway):
    """CURSOR_TYPE_READ_ONLY EXECUTE opens a server-side cursor
    (SERVER_STATUS_CURSOR_EXISTS, constants.go:23-37); COM_STMT_FETCH
    drains it in batches, the final EOF carrying LAST_ROW_SENT."""
    async def scenario(gw):
        c = MiniClient("127.0.0.1", gw.bound_port)
        await c.connect("sf001.alice")
        sid, _ = await c.stmt_prepare(
            "SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 25"
        )
        cols, status = await c.stmt_execute_cursor(sid, [])
        assert status & C.SERVER_STATUS_CURSOR_EXISTS, hex(status)
        fetched = []
        last_seen = False
        for _ in range(10):
            rows, status = await c.stmt_fetch(sid, 10, cols)
            fetched.extend(rows)
            if status & C.SERVER_STATUS_LAST_ROW_SENT:
                last_seen = True
                break
        assert last_seen, "cursor never reported LAST_ROW_SENT"
        assert len(fetched) == 25
        assert fetched[0][0] < fetched[-1][0]
        # fetch after drain → error (cursor closed)
        res = await c.stmt_fetch(sid, 10, cols)
        assert isinstance(res, dict) and res["error"] == 1243, res
        await c.stmt_close(sid)
        await c.quit()

    run_with_gateway(gateway, scenario)


def test_analyze_table_feeds_cbo_stats(gateway):
    """ANALYZE TABLE promotes the fixture to a catalog table, computes
    table + column statistics, and the CBO sees them: EXPLAIN COST
    reports a rowCount afterwards, and queries keep answering."""
    async def scenario(gw):
        c = MiniClient("127.0.0.1", gw.bound_port)
        await c.connect("sf001.alice")
        ok = (await c.query("ANALYZE TABLE orders COMPUTE STATISTICS"))[0]
        assert isinstance(ok, dict) and "error" not in ok, ok
        ok = (await c.query(
            "ANALYZE TABLE orders COMPUTE STATISTICS FOR COLUMNS o_custkey"
        ))[0]
        assert isinstance(ok, dict) and "error" not in ok, ok
        # plan evidence: catalog stats visible to the optimizer
        _, cost_rows = (await c.query(
            "EXPLAIN COST SELECT o_custkey FROM orders"))[0]
        text = "\n".join(str(v) for row in cost_rows for v in row)
        assert "rowCount=" in text, text[:800]
        # plan evidence 2: column stats drive filter SELECTIVITY — the
        # CBO estimates ~100 of 1500 rows pass o_custkey < 10 instead
        # of defaulting to the full table rowCount
        _, sel_rows = (await c.query(
            "EXPLAIN COST SELECT o_orderkey FROM orders WHERE o_custkey < 10"
        ))[0]
        sel = "\n".join(str(v) for row in sel_rows for v in row)
        m = re.search(r"Filter[^\n]*Statistics\([^)]*rowCount=(\d+)", sel)
        assert m and int(m.group(1)) < 1500, sel[:800]
        # the promoted table still answers queries correctly
        _, rows = (await c.query("SELECT COUNT(*) AS n FROM orders"))[0]
        assert int(rows[0][0]) == 1500, rows
        # events promotes as stats-table + normalized persistent view:
        # ANALYZE succeeds, the engine (ts, ts_us) schema survives, and
        # EXPLAIN COST sees base-table stats through the view
        ok = (await c.query("ANALYZE TABLE events COMPUTE STATISTICS"))[0]
        assert isinstance(ok, dict) and "error" not in ok, ok
        cols, rows = (await c.query(
            "SELECT COUNT(*) AS n, COUNT(ts_us) AS n_us FROM events"))[0]
        assert int(rows[0][0]) == int(rows[0][1]) > 0, rows
        _, ev_cost = (await c.query(
            "EXPLAIN COST SELECT user_id FROM events"))[0]
        ev_text = "\n".join(str(v) for row in ev_cost for v in row)
        assert "rowCount=" in ev_text, ev_text[:800]
        pong = await c.ping()
        assert pong[0] == 0x00
        # db-qualified form: this cluster's catalog db resolves...
        ok = (await c.query(
            "ANALYZE TABLE sf001.orders COMPUTE STATISTICS"))[0]
        assert isinstance(ok, dict) and "error" not in ok, ok
        # ...a foreign qualifier is rejected deterministically (clean
        # ERR naming the database, not a temp-view resolution error)
        err = (await c.query(
            "ANALYZE TABLE otherdb.orders COMPUTE STATISTICS"))[0]
        assert isinstance(err, dict) and err.get("error"), err
        assert "otherdb" in err.get("message", ""), err
        await c.quit()

    run_with_gateway(gateway, scenario)


def test_information_schema_tables_and_columns(gateway):
    """ORM/BI-tool probes of information_schema must answer: tables
    lists every fixture table, columns reports names/types/positions
    for a given table, and both survive WHERE/ORDER BY."""
    async def scenario(gw):
        c = MiniClient("127.0.0.1", gw.bound_port)
        await c.connect("sf001.alice")
        _, rows = (await c.query(
            "SELECT table_name FROM information_schema.tables "
            "ORDER BY table_name"))[0]
        names = [r[0] for r in rows]
        for t in ("lineitem", "orders", "documents", "embeddings"):
            assert t in names, names
        cols, rows = (await c.query(
            "SELECT column_name, data_type, is_nullable "
            "FROM information_schema.columns "
            "WHERE table_name = 'orders' ORDER BY ordinal_position"))[0]
        assert cols == ["column_name", "data_type", "is_nullable"]
        assert rows[0][0] == "o_orderkey", rows[:3]
        assert any(r[0] == "o_orderdate" for r in rows)
        _, cnt = (await c.query(
            "SELECT COUNT(*) AS n FROM information_schema.columns "
            "WHERE table_schema = 'default'"))[0]
        assert int(cnt[0][0]) > 50
        await c.quit()

    run_with_gateway(gateway, scenario)


def test_ci_collation_comparison_semantics(gateway):
    """`_ci` collations must give MySQL case-insensitive COMPARISON
    semantics (both sides, not a display artifact), `_bin` must stay
    case-sensitive — served by Spark's native collation engine via the
    dialect's collation-name mapping."""
    async def scenario(gw):
        c = MiniClient("127.0.0.1", gw.bound_port)
        await c.connect("sf001.alice")
        # fixture column is lowercase 'click'; the _ci comparison with
        # mixed-case literal must match exactly what '=' on the exact
        # literal matches
        _, exact = (await c.query(
            "SELECT COUNT(*) AS n FROM events WHERE event_type = 'click'"))[0]
        _, ci = (await c.query(
            "SELECT COUNT(*) AS n FROM events "
            "WHERE event_type COLLATE utf8mb4_general_ci = 'CLICK'"))[0]
        assert int(exact[0][0]) > 0
        assert ci == exact, (ci, exact)
        _, bin_ = (await c.query(
            "SELECT COUNT(*) AS n FROM events "
            "WHERE event_type COLLATE utf8mb4_bin = 'CLICK'"))[0]
        assert int(bin_[0][0]) == 0, bin_
        # mixed-case literal pair: equal under _ci, unequal under _bin
        _, rows = (await c.query(
            "SELECT CAST(('AbC' COLLATE utf8mb4_general_ci) = 'aBc' AS INT) AS ci_eq, "
            "CAST(('AbC' COLLATE utf8mb4_bin) = 'aBc' AS INT) AS bin_eq"))[0]
        assert rows[0] == ["1", "0"], rows
        await c.quit()

    run_with_gateway(gateway, scenario)


def test_json_extract_served_from_shredded_view(gateway):
    """Constant-path JSON extraction through the gateway is routed onto
    the materialized shredded companion view (ingest-time shredding,
    sources/io.py + catalog.SHREDDED_JSON): every MySQL spelling —
    including the ->> operator Spark itself cannot parse — answers with
    values identical to re-parsing the JSON text per query."""
    async def scenario(gw):
        c = MiniClient("127.0.0.1", gw.bound_port)
        await c.connect("sf001.alice")
        # ground truth: force a non-rewritten parse (unknown-path form
        # stays on the query path; '$.k' via a no-op concat dodges the
        # rewrite pattern while computing the same path)
        _, truth = (await c.query(
            "SELECT event_id, get_json_object(props, concat('$.', 'k')) AS k "
            "FROM events ORDER BY event_id LIMIT 20"))[0]
        for spelling in (
            "get_json_object(props, '$.k')",
            "JSON_EXTRACT(props, '$.k')",
            "props->>'$.k'",
        ):
            _, rows = (await c.query(
                f"SELECT event_id, {spelling} AS k FROM events "
                "ORDER BY event_id LIMIT 20"))[0]
            assert rows == truth, (spelling, rows[:3], truth[:3])
        # aggregation over the typed column round-trips too
        _, rows = (await c.query(
            "SELECT COUNT(DISTINCT props->>'$.k') AS n FROM events"))[0]
        assert int(rows[0][0]) > 0
        await c.quit()

    run_with_gateway(gateway, scenario)


def test_binary_date_uses_4_byte_layout(gateway):
    """DATE columns in the binary protocol must use the spec-minimal
    4-byte layout (length, year:2, month, day — mysql/buffer.go wire
    contract), not the 7-byte datetime form with zeroed time fields."""
    async def scenario(gw):
        c = MiniClient("127.0.0.1", gw.bound_port)
        await c.connect("sf001.alice")
        sid, _ = await c.stmt_prepare(
            # o_orderdate is stored as timestamp in the fixture; CAST
            # produces a true DATE column (timestamps keep the 7/11-byte
            # forms — test_prepared_statements covers those).
            "SELECT CAST(o_orderdate AS DATE) AS d FROM orders "
            "ORDER BY o_orderkey LIMIT 3"
        )
        _, rows = await c.stmt_execute(sid, [])
        assert len(rows) == 3
        for (raw,) in rows:
            assert isinstance(raw, bytes) and len(raw) == 4, raw
            year = int.from_bytes(raw[0:2], "little")
            month, day = raw[2], raw[3]
            assert 1990 <= year <= 2030 and 1 <= month <= 12 and 1 <= day <= 31
        await c.stmt_close(sid)
        await c.quit()

    run_with_gateway(gateway, scenario)


def test_reexecute_closes_stale_cursor(gateway):
    """MySQL closes any open cursor on re-EXECUTE: after a partial
    COM_STMT_FETCH, a plain (non-cursor) re-EXECUTE must invalidate the
    old iterator so a later COM_STMT_FETCH errors instead of serving
    stale rows from the prior execution."""
    async def scenario(gw):
        c = MiniClient("127.0.0.1", gw.bound_port)
        await c.connect("sf001.alice")
        sid, _ = await c.stmt_prepare(
            "SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 25"
        )
        cols, status = await c.stmt_execute_cursor(sid, [])
        assert status & C.SERVER_STATUS_CURSOR_EXISTS, hex(status)
        rows, _ = await c.stmt_fetch(sid, 5, cols)  # partial drain
        assert len(rows) == 5
        # non-cursor re-EXECUTE streams a full resultset...
        _, rows2 = await c.stmt_execute(sid, [])
        assert len(rows2) == 25
        # ...and the stale cursor must be gone, not resumed at row 6
        res = await c.stmt_fetch(sid, 5, cols)
        assert isinstance(res, dict) and res["error"] == 1243, res
        await c.stmt_close(sid)
        await c.quit()

    run_with_gateway(gateway, scenario)


def test_reexecute_without_rebound_types(gateway):
    """Connector/J-style re-EXECUTE with new_params_bound_flag=0: the
    server must reuse the types cached from the first EXECUTE instead of
    dropping the connection."""
    async def scenario(gw):
        c = MiniClient("127.0.0.1", gw.bound_port)
        await c.connect("sf001.alice")
        sid, _ = await c.stmt_prepare(
            "SELECT COUNT(*) AS n FROM orders WHERE o_custkey = ?"
        )
        _, rows1 = await c.stmt_execute(sid, [7])
        _, rows2 = await c.stmt_execute(sid, [8], send_types=False)
        assert rows1[0][0] >= 0 and rows2[0][0] >= 0
        # connection still alive
        pong = await c.ping()
        assert pong[0] == 0x00
        await c.quit()

    run_with_gateway(gateway, scenario)


def test_time_param_binds_as_duration(gateway):
    """MYSQL_TYPE_TIME (0x0B) params decode via the binary TIME layout
    and bind as 'HH:MM:SS' literals instead of garbage lenenc bytes."""
    async def scenario(gw):
        c = MiniClient("127.0.0.1", gw.bound_port)
        await c.connect("sf001.alice")
        sid, _ = await c.stmt_prepare("SELECT CAST(? AS STRING) AS t")
        _, rows = await c.stmt_execute(
            sid, [dt_mod.timedelta(hours=1, minutes=2, seconds=3)]
        )
        assert rows == [["01:02:03"]], rows
        await c.quit()

    run_with_gateway(gateway, scenario)


def test_show_collation_full_map(gateway):
    """SHOW COLLATION returns the full MySQL 5.7 collation table (the
    reference ships 220 entries, constants.go:77-298), and the handshake
    accepts an arbitrary valid charset byte."""
    async def scenario(gw):
        c = MiniClient("127.0.0.1", gw.bound_port)
        # connect with a non-default collation byte (33 = utf8_general_ci)
        c.capability = CLIENT_CAPS
        await c.connect("sf001.alice")
        cols, rows = (await c.query("SHOW COLLATION"))[0]
        assert cols[:3] == ["Collation", "Charset", "Id"]
        assert len(rows) == len(C.COLLATIONS) == 220
        by_id = {int(r[2]): r for r in rows}
        assert by_id[46][0] == "utf8mb4_bin" and by_id[46][3] == "Yes"
        assert by_id[33][0] == "utf8_general_ci"
        assert by_id[33][1] == "utf8"
        assert by_id[63][1] == "binary"
        await c.quit()

    run_with_gateway(gateway, scenario)


def test_ssl_not_advertised_without_tls(gateway):
    """A gateway with no ssl_context must mask CLIENT_SSL from the
    greeting so ssl-mode=PREFERRED clients don't attempt an upgrade that
    can only fail."""
    async def scenario(gw):
        c = MiniClient("127.0.0.1", gw.bound_port)
        await c.connect("sf001.alice")
        assert not (c.server_capability & C.CLIENT_SSL)
        await c.quit()

    run_with_gateway(gateway, scenario)


def test_describe_and_show_create(gateway):
    async def scenario(gw):
        c = MiniClient("127.0.0.1", gw.bound_port)
        await c.connect("sf001.alice")
        cols, rows = (await c.query("DESCRIBE orders"))[0]
        assert cols[:3] == ["Field", "Type", "Null"]
        fields = {r[0]: r[1] for r in rows}
        assert fields["o_orderkey"] == "bigint(20)"
        assert fields["o_totalprice"] == "double"
        assert fields["o_orderdate"].startswith("datetime")
        cols2, rows2 = (await c.query("SHOW COLUMNS FROM region"))[0]
        assert {r[0] for r in rows2} == {"r_regionkey", "r_name"}
        cols3, rows3 = (await c.query("SHOW CREATE TABLE region"))[0]
        assert rows3[0][0] == "region"
        assert "`r_name` varchar(1024)" in rows3[0][1]
        await c.quit()

    run_with_gateway(gateway, scenario)


def test_mysql_dialect_functions_e2e(gateway):
    """MySQL-isms a 5.7 client would send (SURVEY §4.2 shim table):
    IFNULL/DIV/backticks are native Spark SQL; LIMIT x,y / GROUP_CONCAT /
    DATE_FORMAT go through the rewriter."""

    async def scenario(gw):
        c = MiniClient("127.0.0.1", gw.bound_port)
        await c.connect("sf001.alice")
        cols, rows = (await c.query(
            "SELECT IFNULL(NULL, 42) AS a, 17 DIV 5 AS b, `r_name` AS c "
            "FROM `region` ORDER BY `r_regionkey` LIMIT 1"
        ))[0]
        assert rows[0][0] == "42" and rows[0][1] == "3"
        cols, rows = (await c.query(
            "SELECT DATE_FORMAT(o_orderdate, '%Y-%m') AS ym, COUNT(*) AS n "
            "FROM orders GROUP BY DATE_FORMAT(o_orderdate, '%Y-%m') "
            "ORDER BY ym LIMIT 3"
        ))[0]
        assert all(len(r[0]) == 7 and r[0][4] == "-" for r in rows)
        await c.quit()

    run_with_gateway(gateway, scenario)


def test_large_result_row_fragmentation(gateway):
    """A >16 MiB row crosses the MAX_PAYLOAD fragmentation boundary
    through the whole server stack (A14/A15 e2e; SURVEY §7 hard part 3)."""

    async def scenario(gw):
        c = MiniClient("127.0.0.1", gw.bound_port)
        await c.connect("sf001.alice")
        n = 17_000_000
        res = await c.query(f"SELECT repeat('x', {n}) AS big, 7 AS t")
        cols, rows = res[0]
        assert cols == ["big", "t"]
        assert len(rows[0][0]) == n
        assert set(rows[0][0]) == {"x"}
        assert rows[0][1] == "7"
        # connection still healthy afterwards
        res = await c.query("SELECT 1 AS ok")
        assert res[0][1] == [["1"]]
        await c.quit()

    run_with_gateway(gateway, scenario)


def test_malformed_packet_closes_only_that_connection(gateway):
    async def scenario(gw):
        import struct

        bad_reader, bad_writer = await asyncio.open_connection("127.0.0.1", gw.bound_port)
        await bad_reader.readexactly(4)  # greeting header
        # garbage with a wrong sequence number
        bad_writer.write(struct.pack("<I", 0xDEADBEEF) * 3)
        await bad_writer.drain()
        # server drops that connection...
        try:
            await asyncio.wait_for(bad_reader.read(), timeout=30)
        except asyncio.TimeoutError:
            pass
        bad_writer.close()
        # ...but keeps serving others
        c = MiniClient("127.0.0.1", gw.bound_port)
        ok = await c.connect("sf001.alice")
        assert ok[0] == 0x00
        res = await c.query("SELECT 1 AS ok")
        assert res[0][1] == [["1"]]
        await c.quit()

    run_with_gateway(gateway, scenario)


def test_prepared_param_quoting(gateway):
    """String params containing quotes/backslashes bind safely (the
    literal-rendering path must not be injectable or lossy)."""

    async def scenario(gw):
        c = MiniClient("127.0.0.1", gw.bound_port)
        await c.connect("sf001.alice")
        sid, _ = await c.stmt_prepare("SELECT ? AS v, length(?) AS l")
        tricky = "O'Brien \\ ' DROP; --"
        cols, rows = await c.stmt_execute(sid, [tricky, tricky])
        assert rows[0][0] == tricky
        assert rows[0][1] == len(tricky)
        await c.quit()

    run_with_gateway(gateway, scenario)


def test_change_user_resets_session(gateway):
    """COM_CHANGE_USER (pooled-client checkout): re-auth mid-connection
    switches identity/db and resets session state — variables gone,
    prepared statements deallocated, queries keep working."""

    async def scenario(gw):
        c = MiniClient("127.0.0.1", gw.bound_port)
        await c.connect("sf001.alice")
        await c.query("SET @marker = 7")
        _, rows = (await c.query("SELECT @@marker AS m"))[0]
        assert rows == [["7"]], rows
        sid, _ = await c.stmt_prepare("SELECT 1 AS one")
        ok = await c.change_user("sf001.bob", database="newdb")
        assert ok[0] == 0x00, ok
        # old session variable is gone
        _, rows = (await c.query("SELECT @@marker AS m"))[0]
        assert rows != [["7"]], rows
        # old prepared statement is deallocated
        res = await c.stmt_execute(sid, [])
        assert res == {"error": 1243}, res
        # the new identity queries normally
        _, rows = (await c.query("SELECT COUNT(*) AS n FROM region"))[0]
        assert rows == [["5"]], rows
        await c.quit()

    run_with_gateway(gateway, scenario)


def test_change_user_auth_verification(spark, sf_dir):
    """COM_CHANGE_USER proofs verify against the ORIGINAL handshake
    scramble; a wrong password is a clean 1045 that leaves the old
    session usable."""

    def factory():
        return Gateway(spark, clusters={"sf001": sf_dir}, default_cluster=sf_dir,
                       users={"alice": "s3cret", "bob": "hunter2"}, port=0)

    async def scenario(gw):
        c = MiniClient("127.0.0.1", gw.bound_port)
        assert (await c.connect("sf001.alice", password="s3cret"))[0] == 0x00
        bad = await c.change_user("sf001.bob", password="wrong")
        assert bad[0] == 0xFF and int.from_bytes(bad[1:3], "little") == 1045
        # failed change keeps the original session alive
        _, rows = (await c.query("SELECT 1 AS ok"))[0]
        assert rows == [["1"]]
        good = await c.change_user("sf001.bob", password="hunter2")
        assert good[0] == 0x00, good
        _, rows = (await c.query("SELECT COUNT(*) AS n FROM nation"))[0]
        assert rows == [["25"]]
        await c.quit()

    run_with_gateway(factory, scenario)


def test_stmt_send_long_data(gateway):
    """COM_STMT_SEND_LONG_DATA: a param streamed in chunks ahead of
    EXECUTE binds as the concatenated value, is consumed by the
    execution, and COM_STMT_RESET discards staged chunks."""

    async def scenario(gw):
        c = MiniClient("127.0.0.1", gw.bound_port)
        await c.connect("sf001.alice")
        sid, _ = await c.stmt_prepare("SELECT ? AS v, length(?) AS l")
        await c.send_long_data(sid, 0, b"hello ")
        await c.send_long_data(sid, 0, b"wide world")
        cols, rows = await c.stmt_execute(sid, [None, "x"], omit=(0,))
        assert rows[0][0] == "hello wide world", rows
        # consumed: the next execute binds normal params again
        cols, rows = await c.stmt_execute(sid, ["plain", "y"])
        assert rows[0][0] == "plain", rows
        # staged-then-RESET chunks are discarded (1 KiB that must NOT
        # leak into the post-reset execution)
        await c.send_long_data(sid, 0, b"Z" * 1024)
        await c.command(C.COM_STMT_RESET, sid.to_bytes(4, "little"))
        assert (await c.pio.read_packet())[0] == 0x00
        cols, rows = await c.stmt_execute(sid, ["after", "z"])
        assert rows[0][0] == "after", rows
        await c.quit()

    run_with_gateway(gateway, scenario)


def test_reset_connection_and_set_option(gateway):
    """COM_RESET_CONNECTION clears session state cheaply; COM_SET_OPTION
    toggles multi-statement splitting."""

    async def scenario(gw):
        c = MiniClient("127.0.0.1", gw.bound_port)
        await c.connect("sf001.alice")
        await c.query("SET @rc = 1")
        sid, _ = await c.stmt_prepare("SELECT 2 AS two")
        ok = await c.reset_connection()
        assert ok[0] == 0x00
        _, rows = (await c.query("SELECT @@rc AS m"))[0]
        assert rows != [["1"]], rows
        assert (await c.stmt_execute(sid, [])) == {"error": 1243}
        # multi-statements off: the compound text is ONE (bad) statement
        eof = await c.set_option(C.MYSQL_OPTION_MULTI_STATEMENTS_OFF)
        assert eof[0] in (0xFE, 0x00)
        res = await c.query("SELECT 1 AS a; SELECT 2 AS b")
        assert isinstance(res[0], dict) and res[0].get("error"), res
        # back on: two result sets
        eof = await c.set_option(C.MYSQL_OPTION_MULTI_STATEMENTS_ON)
        assert eof[0] in (0xFE, 0x00)
        res = await c.query("SELECT 1 AS a; SELECT 2 AS b")
        assert len(res) == 2 and res[0][1] == [["1"]] and res[1][1] == [["2"]]
        await c.quit()

    run_with_gateway(gateway, scenario)


def test_processlist_statistics_and_kill_unknown(gateway):
    """SHOW PROCESSLIST lists live connections with MySQL's 8 columns;
    COM_STATISTICS answers a bare status string; COM_PROCESS_INFO
    answers a resultset; KILL on an unknown id is ER 1094."""

    async def scenario(gw):
        c = MiniClient("127.0.0.1", gw.bound_port)
        await c.connect("sf001.alice")
        c2 = MiniClient("127.0.0.1", gw.bound_port)
        await c2.connect("sf001.bob")
        cols, rows = (await c.query("SHOW PROCESSLIST"))[0]
        assert cols == ["Id", "User", "Host", "db", "Command", "Time",
                        "State", "Info"]
        ids = {int(r[0]) for r in rows}
        assert {c.conn_id, c2.conn_id} <= ids, (ids, c.conn_id, c2.conn_id)
        # the inquiring connection shows as Query (it is running the SHOW)
        me = next(r for r in rows if int(r[0]) == c.conn_id)
        assert me[4] == "Query" and "PROCESSLIST" in (me[7] or "")
        other = next(r for r in rows if int(r[0]) == c2.conn_id)
        assert other[4] == "Sleep" and other[7] is None
        # COM_STATISTICS: raw string payload, no OK/resultset framing
        await c.command(C.COM_STATISTICS)
        stats = await c.pio.read_packet()
        assert stats.startswith(b"Uptime:") and b"Questions:" in stats
        # COM_PROCESS_INFO: a resultset (first packet = lenenc col count)
        await c.command(0x0A)
        first = await c.pio.read_packet()
        assert first[0] == 8, first
        # drain col defs + eof + rows + eof
        while True:
            p = await c.pio.read_packet()
            if p and p[0] == 0xFE and len(p) < 9:
                break
        while True:
            p = await c.pio.read_packet()
            if p and p[0] == 0xFE and len(p) < 9:
                break
        res = await c.query("KILL 999999")
        assert res[0].get("error") == 1094, res
        await c.quit()
        await c2.quit()

    run_with_gateway(gateway, scenario)


def test_kill_query_cancels_running_statement(gateway):
    """KILL QUERY <id> cancels the victim's in-flight Spark jobs via
    job-group cancellation: the victim receives ER 1317 (query
    interrupted) and the connection stays usable — the runaway-scan
    story a gateway over a 100 TB warehouse must have.  The reference
    relayed KILL to its backends (gateway/relay.go:47-66); as the
    engine we own the cancellation."""

    async def scenario(gw):
        victim = MiniClient("127.0.0.1", gw.bound_port)
        await victim.connect("sf001.alice")
        killer = MiniClient("127.0.0.1", gw.bound_port)
        await killer.connect("sf001.bob")
        # ~1e12-row codegen count: minutes uncancelled, interruptible at
        # Range's per-batch kill checks
        long_sql = "SELECT count(*) AS n FROM range(1000000000000)"
        vtask = asyncio.ensure_future(victim.query(long_sql))
        # wait until the victim's statement is visible in processlist
        for _ in range(100):
            await asyncio.sleep(0.1)
            _, rows = (await killer.query("SHOW PROCESSLIST"))[0]
            vrow = next((r for r in rows if int(r[0]) == victim.conn_id), None)
            if vrow is not None and vrow[7] and "range(" in vrow[7]:
                break
        else:
            raise AssertionError("victim query never appeared in processlist")
        res = await killer.query(f"KILL QUERY {victim.conn_id}")
        assert res[0].get("ok"), res
        vres = await asyncio.wait_for(vtask, timeout=60)
        assert vres[0].get("error") == 1317, vres
        # the victim connection survives the kill
        _, rows = (await victim.query("SELECT 1 AS one"))[0]
        assert rows == [["1"]]
        await victim.quit()
        await killer.quit()

    run_with_gateway(gateway, scenario)


def test_kill_connection_drops_victim(gateway):
    """KILL <id> (CONNECTION form) closes the victim's socket; the
    victim's next read fails, and the id disappears from processlist."""

    async def scenario(gw):
        c = MiniClient("127.0.0.1", gw.bound_port)
        await c.connect("sf001.alice")
        v = MiniClient("127.0.0.1", gw.bound_port)
        await v.connect("sf001.bob")
        res = await c.query(f"KILL {v.conn_id}")
        assert res[0].get("ok"), res
        with pytest.raises((ConnectionError, asyncio.IncompleteReadError,
                            EOFError)):
            await asyncio.wait_for(v.query("SELECT 1 AS one"), timeout=10)
        for _ in range(50):
            _, rows = (await c.query("SHOW PROCESSLIST"))[0]
            if all(int(r[0]) != v.conn_id for r in rows):
                break
            await asyncio.sleep(0.1)
        else:
            raise AssertionError("killed connection still in processlist")
        await c.quit()

    run_with_gateway(gateway, scenario)


def test_concurrent_clients_interleave(gateway):
    """Concurrency smoke: four clients fire queries concurrently over
    one gateway (shared SparkContext, per-connection sub-sessions,
    shared executor pool); every result is correct and attributable to
    its own connection — the goroutine-per-connection concurrency story
    (gateway.go:63) under the asyncio + thread-pool analog."""

    async def scenario(gw):
        clients = []
        for i in range(4):
            c = MiniClient("127.0.0.1", gw.bound_port)
            await c.connect(f"sf001.user{i}")
            clients.append(c)

        async def work(i, c):
            out = []
            for n in range(3):
                res = await c.query(
                    f"SELECT {i} AS who, COUNT(*) + {n} AS n FROM region")
                out.append(res[0][1])
            return out

        results = await asyncio.gather(
            *[work(i, c) for i, c in enumerate(clients)])
        for i, out in enumerate(results):
            assert out == [[[str(i), str(5 + n)]] for n in range(3)], (i, out)
        for c in clients:
            await c.quit()

    run_with_gateway(gateway, scenario)


def test_com_refresh_and_debug(gateway):
    """COM_REFRESH (mysqladmin flush-*) drops the cached table frames
    and answers OK — the connection keeps working and the next query
    re-reads; COM_DEBUG answers EOF like mysqld.  Both were relayed
    opaquely by the reference (gateway/relay.go:47-66); as the engine
    we own the flush."""

    async def scenario(gw):
        c = MiniClient("127.0.0.1", gw.bound_port)
        await c.connect("sf001.alice")
        # warm a cached table through a query
        (cols, rows), = await c.query("SELECT COUNT(*) AS n FROM nation")
        assert rows[0][0] == "25"
        # COM_REFRESH flags=0x01 (REFRESH_GRANT) → OK packet
        await c.command(C.COM_REFRESH, b"\x01")
        ok = await c.pio.read_packet()
        assert ok[0] == 0x00, ok
        # cache was dropped; query still answers correctly after reload
        (cols, rows), = await c.query("SELECT COUNT(*) AS n FROM nation")
        assert rows[0][0] == "25"
        # COM_DEBUG → EOF
        await c.command(C.COM_DEBUG)
        eof = await c.pio.read_packet()
        assert eof[0] == 0xFE and len(eof) < 9, eof
        await c.quit()

    run_with_gateway(gateway, scenario)


def test_cache_table_via_gateway(gateway):
    """Spark's CACHE TABLE / UNCACHE TABLE DDL passes through the
    dialect untouched — a client can pin a hot dimension in executor
    memory through the wire protocol (the engine-side analog of a
    backend's buffer pool) and queries keep answering correctly."""

    async def scenario(gw):
        c = MiniClient("127.0.0.1", gw.bound_port)
        await c.connect("sf001.alice")
        res = await c.query("CACHE TABLE nation")
        # CACHE TABLE is zero-column DDL → exactly one OK packet
        assert isinstance(res[0], dict) and res[0].get("ok") is True, res
        (cols, rows), = await c.query(
            "SELECT COUNT(*) AS n FROM nation")
        assert rows[0][0] == "25"
        res = await c.query("UNCACHE TABLE nation")
        (cols, rows), = await c.query(
            "SELECT COUNT(*) AS n FROM nation")
        assert rows[0][0] == "25"
        await c.quit()

    run_with_gateway(gateway, scenario)


def test_explain_over_the_wire(gateway):
    """A MySQL client's EXPLAIN must return a plan result set, not an
    error.  The reference relays its backend's (TiDB's) engine-specific
    EXPLAIN columns verbatim — the engine-specific output here is
    Spark's plan text, same contract.  Both the bare and the FORMATTED
    form must round-trip as result sets."""
    async def scenario(gw):
        c = MiniClient("127.0.0.1", gw.bound_port)
        await c.connect("sf001.alice")
        cols, rows = (await c.query(
            "EXPLAIN SELECT o_orderpriority, COUNT(*) FROM orders "
            "GROUP BY o_orderpriority"))[0]
        assert rows and any("Aggregate" in r[0] or "Scan" in r[0]
                            for r in rows), rows
        cols, rows = (await c.query(
            "EXPLAIN FORMATTED SELECT * FROM nation WHERE n_nationkey = 3"
        ))[0]
        text = "\n".join(r[0] for r in rows)
        assert "Physical Plan" in text or "Scan" in text, text
        await c.quit()

    run_with_gateway(gateway, scenario)


def test_ctas_insert_select_roundtrip(gateway):
    """VERDICT r12 directive 7: DDL already flows through spark.sql
    with OK acks, but nothing e2e-proved a client can CREATE a table
    from a query over the wire and read it back.  Full life cycle:
    CTAS from an aggregate → OK ack, SELECT back (rows match the
    source aggregate), INSERT ... SELECT appends (count doubles),
    INSERT ... VALUES appends a literal row, DROP TABLE cleans up and
    a subsequent SELECT maps to ER_NO_SUCH_TABLE — the engine-as-terminus
    analog of the reference relaying DDL verbatim to its backend
    (gateway.go:128-130)."""

    async def scenario(gw):
        c = MiniClient("127.0.0.1", gw.bound_port)
        await c.connect("sf001.alice")
        tbl = "e2e_ctas_scratch"
        await c.query(f"DROP TABLE IF EXISTS {tbl}")
        res = await c.query(
            f"CREATE TABLE {tbl} USING PARQUET AS "
            "SELECT o_orderpriority AS pri, COUNT(*) AS n FROM orders "
            "GROUP BY o_orderpriority")
        assert isinstance(res[0], dict) and res[0].get("ok") is True, res
        cols, rows = (await c.query(
            f"SELECT pri, n FROM {tbl} ORDER BY pri"))[0]
        assert cols == ["pri", "n"] and len(rows) == 5
        base = {r[0]: int(r[1]) for r in rows}
        # cross-check against the live source through the same wire
        _, src = (await c.query(
            "SELECT o_orderpriority, COUNT(*) FROM orders "
            "GROUP BY o_orderpriority ORDER BY o_orderpriority"))[0]
        assert base == {r[0]: int(r[1]) for r in src}
        res = await c.query(
            f"INSERT INTO {tbl} SELECT o_orderpriority, COUNT(*) "
            "FROM orders GROUP BY o_orderpriority")
        assert isinstance(res[0], dict) and res[0].get("ok") is True, res
        (_, rows), = await c.query(f"SELECT COUNT(*) AS n FROM {tbl}")
        assert int(rows[0][0]) == 10
        res = await c.query(
            f"INSERT INTO {tbl} VALUES ('9-SYNTHETIC', 42)")
        assert isinstance(res[0], dict) and res[0].get("ok") is True, res
        (_, rows), = await c.query(
            f"SELECT n FROM {tbl} WHERE pri = '9-SYNTHETIC'")
        assert [r[0] for r in rows] == ["42"]
        res = await c.query(f"DROP TABLE {tbl}")
        assert isinstance(res[0], dict) and res[0].get("ok") is True, res
        res = await c.query(f"SELECT * FROM {tbl}")
        # missing table maps to MySQL ER_NO_SUCH_TABLE (1146)
        assert isinstance(res[0], dict) and res[0].get("error") == 1146, res
        await c.quit()

    run_with_gateway(gateway, scenario)

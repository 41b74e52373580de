"""Server-side TLS upgrade (reference A8/A10 —
/root/reference/gateway/gateway.go:88-100, gateway/tls.go:11-45).

``asyncio.StreamWriter.start_tls`` has a STARTTLS race on the server
side: the client sends its 32-byte SSL request and the TLS ClientHello
back-to-back, so the ClientHello may already sit in the server's
StreamReader buffer when the transport is swapped — the SSL engine then
waits forever for a record the app layer already consumed.
``TLSServerStream`` avoids this by running the handshake through
``ssl.MemoryBIO`` over the *existing* stream pair: every inbound byte
flows through the StreamReader, buffered or not.

Exposes readexactly/write/drain, so PacketIO — and the compression layer
— stack on top unchanged (same shape as compress.CompressedStream).
"""

from __future__ import annotations

import asyncio
import ssl


def load_server_context(certfile: str, keyfile: str,
                        cafile: str | None = None,
                        min_version: ssl.TLSVersion = ssl.TLSVersion.TLSv1_2) -> ssl.SSLContext:
    """CA pool + keypair + min-version (default TLS1.2) — tls.go:11-45."""
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ctx.load_cert_chain(certfile, keyfile)
    if cafile:
        ctx.load_verify_locations(cafile)
        ctx.verify_mode = ssl.CERT_REQUIRED
    ctx.minimum_version = min_version
    return ctx


class TLSServerStream:
    """Race-free server-side TLS over an asyncio stream pair."""

    def __init__(self, reader: asyncio.StreamReader, writer: asyncio.StreamWriter,
                 context: ssl.SSLContext):
        self._reader = reader
        self._writer = writer
        self._in = ssl.MemoryBIO()
        self._out = ssl.MemoryBIO()
        self._obj = context.wrap_bio(self._in, self._out, server_side=True)

    def _flush_out(self) -> None:
        pending = self._out.read()
        if pending:
            self._writer.write(pending)

    async def _feed(self) -> None:
        data = await self._reader.read(65536)
        if not data:
            raise ConnectionResetError("EOF during TLS")
        self._in.write(data)

    async def handshake(self) -> None:
        while True:
            try:
                self._obj.do_handshake()
                break
            except ssl.SSLWantReadError:
                self._flush_out()
                await self._writer.drain()
                await self._feed()
        self._flush_out()
        await self._writer.drain()

    # ---- stream surface (PacketIO / CompressedStream compatible) ----
    async def readexactly(self, n: int) -> bytes:
        buf = bytearray()
        while len(buf) < n:
            try:
                chunk = self._obj.read(n - len(buf))
                if chunk:
                    buf += chunk
                    continue
                raise ConnectionResetError("TLS EOF")
            except ssl.SSLWantReadError:
                await self._feed()
        return bytes(buf)

    def write(self, data: bytes) -> None:
        self._obj.write(data)
        self._flush_out()

    async def drain(self) -> None:
        await self._writer.drain()

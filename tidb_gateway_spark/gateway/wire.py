"""Wire scalar codecs and packet framing.

Python rebuild of the reference's Buffer type system
(/root/reference/mysql/buffer.go:21-194) and packet
fragmentation/reassembly + sequence tracking
(/root/reference/mysql/conn.go:61-72, 163-235, 257-262).

``Buffer`` is a cursor over bytes for decoding and a bytearray builder
for encoding — all little-endian, matching MySQL wire order.
"""

from __future__ import annotations

from tidb_gateway_spark.gateway.constants import MAX_PAYLOAD


class ProtocolError(Exception):
    pass


class Buffer:
    """Decode cursor / encode builder for MySQL wire scalars."""

    def __init__(self, data: bytes = b""):
        self.data = bytearray(data)
        self.pos = 0

    # ---- reading (buffer.go:21-58, 140-194) ----
    def _take(self, n: int) -> bytes:
        if self.pos + n > len(self.data):
            raise ProtocolError("short read")
        out = bytes(self.data[self.pos : self.pos + n])
        self.pos += n
        return out

    def read_uint(self, n: int) -> int:
        return int.from_bytes(self._take(n), "little")

    def read_byte(self) -> int:
        return self.read_uint(1)

    def read_bytes(self, n: int) -> bytes:
        return self._take(n)

    def skip(self, n: int) -> None:
        self._take(n)

    def read_string_null(self) -> bytes:
        idx = self.data.find(b"\x00", self.pos)
        if idx < 0:
            raise ProtocolError("unterminated string<NUL>")
        out = bytes(self.data[self.pos : idx])
        self.pos = idx + 1
        return out

    def read_lenenc_int(self) -> int:
        # prefixes 0xFB=NULL (caller handles), 0xFC/0xFD/0xFE multi-byte
        # (buffer.go:140-159)
        first = self.read_byte()
        if first < 0xFB:
            return first
        if first == 0xFC:
            return self.read_uint(2)
        if first == 0xFD:
            return self.read_uint(3)
        if first == 0xFE:
            return self.read_uint(8)
        raise ProtocolError(f"invalid lenenc prefix {first:#x}")

    def read_lenenc_string(self) -> bytes:
        return self.read_bytes(self.read_lenenc_int())

    def remaining(self) -> int:
        return len(self.data) - self.pos

    def rest(self) -> bytes:
        out = bytes(self.data[self.pos :])
        self.pos = len(self.data)
        return out

    # ---- writing (buffer.go:61-137, 161-194) ----
    def write_uint(self, v: int, n: int) -> None:
        self.data += v.to_bytes(n, "little")

    def write_byte(self, v: int) -> None:
        self.write_uint(v, 1)

    def write_bytes(self, b: bytes) -> None:
        self.data += b

    def write_string_null(self, b: bytes) -> None:
        self.data += b + b"\x00"

    def write_lenenc_int(self, v: int) -> None:
        if v < 0xFB:
            self.write_byte(v)
        elif v < 1 << 16:
            self.write_byte(0xFC)
            self.write_uint(v, 2)
        elif v < 1 << 24:
            self.write_byte(0xFD)
            self.write_uint(v, 3)
        else:
            self.write_byte(0xFE)
            self.write_uint(v, 8)

    def write_lenenc_string(self, b: bytes) -> None:
        self.write_lenenc_int(len(b))
        self.write_bytes(b)

    def getvalue(self) -> bytes:
        return bytes(self.data)


class PacketIO:
    """Packet framing over a byte stream: [len<3>][seq<1>][payload].

    Payloads ≥ MAX_PAYLOAD are fragmented into max-size chunks with a
    terminating chunk < max size (conn.go:202-235); reads reassemble
    (conn.go:163-173).  Sequence numbers are verified on read and
    incremented per frame; reset lazily via :meth:`reset_seq` (the
    analog of the reference's SeqReset options, conn.go:66-72, 257-262).

    Transport-agnostic: ``reader``/``writer`` expose ``readexactly`` /
    ``write`` (asyncio streams or the in-memory test pipe).
    """

    def __init__(self, reader, writer):
        self.reader = reader
        self.writer = writer
        self.seq = 0

    def reset_seq(self) -> None:
        self.seq = 0

    async def read_packet(self) -> bytes:
        payload = bytearray()
        while True:
            header = await self.reader.readexactly(4)
            length = int.from_bytes(header[:3], "little")
            seq = header[3]
            if seq != self.seq:
                raise ProtocolError(f"sequence mismatch: got {seq} want {self.seq}")
            self.seq = (self.seq + 1) & 0xFF
            if length:
                payload += await self.reader.readexactly(length)
            if length < MAX_PAYLOAD:
                return bytes(payload)

    def write_packet(self, payload: bytes) -> None:
        """Frame and buffer a payload (caller drains/flushes the writer)."""
        view = memoryview(payload)
        while True:
            chunk = view[:MAX_PAYLOAD]
            header = len(chunk).to_bytes(3, "little") + bytes([self.seq])
            self.seq = (self.seq + 1) & 0xFF
            self.writer.write(header + bytes(chunk))
            view = view[len(chunk) :]
            # A payload that is an exact multiple of MAX_PAYLOAD needs a
            # terminating empty frame (conn.go:227-233).
            if len(chunk) < MAX_PAYLOAD:
                break

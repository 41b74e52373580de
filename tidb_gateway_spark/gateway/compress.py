"""MySQL compressed-protocol framing.

Python rebuild of /root/reference/mysql/compress.go:

* frame: [compressed len<3>][seq<1>][uncompressed len<3>][payload];
  uncompressed-len 0 ⇒ payload stored uncompressed (compress.go:47-86)
* payloads < 128 B are sent stored, not deflated (compress.go:11-12,
  118-123)
* write buffer flushes at 2^23−1 B per frame (compress.go:13, 89-106)
"""

from __future__ import annotations

import zlib

from tidb_gateway_spark.gateway.wire import ProtocolError

MIN_COMPRESS_LENGTH = 128          # compress.go:11-12
MAX_COMPRESSED_PAYLOAD = 2**23 - 1  # compress.go:13


class CompressedStream:
    """Wraps a (reader, writer) byte-stream pair with compressed framing.

    Presents the same readexactly/write/drain surface as asyncio streams
    so PacketIO stacks on top unchanged — mirroring how the reference
    swaps its Conn's raw stream for a Compressor (conn.go:107-111 analog).
    """

    def __init__(self, reader, writer):
        self._reader = reader
        self._writer = writer
        self._rbuf = bytearray()
        self._wbuf = bytearray()
        self._rseq = 0
        self._wseq = 0

    # ---- read side (compress.go:36-86) ----
    async def readexactly(self, n: int) -> bytes:
        while len(self._rbuf) < n:
            await self._load_next_frame()
        out = bytes(self._rbuf[:n])
        del self._rbuf[:n]
        return out

    async def _load_next_frame(self) -> None:
        header = await self._reader.readexactly(7)
        comp_len = int.from_bytes(header[:3], "little")
        # seq = header[3] — per-direction counter, tracked but not enforced
        # against lazily-reset client counters
        self._rseq = (header[3] + 1) & 0xFF
        uncomp_len = int.from_bytes(header[4:7], "little")
        body = await self._reader.readexactly(comp_len)
        if uncomp_len == 0:
            self._rbuf += body
        else:
            data = zlib.decompress(body)
            if len(data) != uncomp_len:
                raise ProtocolError(
                    f"declared uncompressed length {uncomp_len} != actual {len(data)}"
                )
            self._rbuf += data

    # ---- write side (compress.go:89-153) ----
    def write(self, data: bytes) -> None:
        self._wbuf += data
        while len(self._wbuf) >= MAX_COMPRESSED_PAYLOAD:
            self._emit(self._wbuf[:MAX_COMPRESSED_PAYLOAD])
            del self._wbuf[:MAX_COMPRESSED_PAYLOAD]

    def _emit(self, chunk: bytes) -> None:
        chunk = bytes(chunk)
        if len(chunk) < MIN_COMPRESS_LENGTH:
            frame = (
                len(chunk).to_bytes(3, "little")
                + bytes([self._wseq])
                + (0).to_bytes(3, "little")
                + chunk
            )
        else:
            comp = zlib.compress(chunk)
            frame = (
                len(comp).to_bytes(3, "little")
                + bytes([self._wseq])
                + len(chunk).to_bytes(3, "little")
                + comp
            )
        self._wseq = (self._wseq + 1) & 0xFF
        self._writer.write(frame)

    async def drain(self) -> None:
        if self._wbuf:
            self._emit(bytes(self._wbuf))
            self._wbuf.clear()
        await self._writer.drain()

    def reset_seq(self) -> None:
        self._rseq = 0
        self._wseq = 0

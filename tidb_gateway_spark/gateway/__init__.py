"""MySQL wire-protocol frontend (the layer the reference actually
implements — /root/reference/gateway + /root/reference/mysql — rebuilt in
asyncio Python).

The reference is a transparent proxy: it speaks the handshake, routes by
username prefix, then relays opaque bytes to a TiDB backend
(gateway/gateway.go:68-181).  This rebuild keeps the same wire surface
toward clients but terminates queries itself: COM_QUERY payloads run
through a MySQL→Spark dialect shim into ``spark.sql`` and stream back as
text-protocol result sets, flushed at result boundaries exactly like the
reference's relay heuristic (gateway/relay.go:85-93).
"""

"""Wire-protocol constants.

Mirrors the semantic values in /root/reference/mysql/constants.go (the
capability/status bit layout is the public MySQL protocol; the chosen
defaults follow the reference): default collation 46 = utf8mb4_bin
(constants.go:6), default capability mask (constants.go:7-21 spirit),
ERR 1105 / SQLSTATE 08S01 for gateway errors (constants.go:525-526),
server version string "5.7.25-TiDB" (gateway/gateway.go:186).
"""

from __future__ import annotations

PROTOCOL_VERSION = 10
SERVER_VERSION = "5.7.25-TiDB"
DEFAULT_COLLATION_ID = 46  # utf8mb4_bin

MAX_PAYLOAD = 2**24 - 1  # packet fragmentation threshold (conn.go:61-64)

# --- capability flags (constants.go:41-66) ---
CLIENT_LONG_PASSWORD = 1 << 0
CLIENT_FOUND_ROWS = 1 << 1
CLIENT_LONG_FLAG = 1 << 2
CLIENT_CONNECT_WITH_DB = 1 << 3
CLIENT_NO_SCHEMA = 1 << 4
CLIENT_COMPRESS = 1 << 5
CLIENT_ODBC = 1 << 6
CLIENT_LOCAL_FILES = 1 << 7
CLIENT_IGNORE_SPACE = 1 << 8
CLIENT_PROTOCOL_41 = 1 << 9
CLIENT_INTERACTIVE = 1 << 10
CLIENT_SSL = 1 << 11
CLIENT_IGNORE_SIGPIPE = 1 << 12
CLIENT_TRANSACTIONS = 1 << 13
CLIENT_RESERVED = 1 << 14
CLIENT_SECURE_CONNECTION = 1 << 15
CLIENT_MULTI_STATEMENTS = 1 << 16
CLIENT_MULTI_RESULTS = 1 << 17
CLIENT_PS_MULTI_RESULTS = 1 << 18
CLIENT_PLUGIN_AUTH = 1 << 19
CLIENT_CONNECT_ATTRS = 1 << 20
CLIENT_PLUGIN_AUTH_LENENC_CLIENT_DATA = 1 << 21
CLIENT_CAN_HANDLE_EXPIRED_PASSWORDS = 1 << 22
CLIENT_SESSION_TRACK = 1 << 23
CLIENT_DEPRECATE_EOF = 1 << 24

DEFAULT_CAPABILITY = (
    CLIENT_LONG_PASSWORD
    | CLIENT_LONG_FLAG
    | CLIENT_CONNECT_WITH_DB
    | CLIENT_PROTOCOL_41
    | CLIENT_TRANSACTIONS
    | CLIENT_SECURE_CONNECTION
    | CLIENT_MULTI_STATEMENTS
    | CLIENT_MULTI_RESULTS
    | CLIENT_PLUGIN_AUTH
    | CLIENT_LOCAL_FILES
    | CLIENT_COMPRESS
    | CLIENT_SSL
    | CLIENT_CONNECT_ATTRS
    | CLIENT_PLUGIN_AUTH_LENENC_CLIENT_DATA
)

# --- server status flags (constants.go:23-37) ---
SERVER_STATUS_IN_TRANS = 1 << 0
SERVER_STATUS_AUTOCOMMIT = 1 << 1  # the only one the reference sets (gateway.go:191)
SERVER_MORE_RESULTS_EXISTS = 1 << 3
SERVER_STATUS_LAST_ROW_SENT = 1 << 7

# --- commands ---
COM_QUIT = 0x01
COM_INIT_DB = 0x02
COM_QUERY = 0x03
COM_FIELD_LIST = 0x04
COM_PING = 0x0E
COM_STMT_PREPARE = 0x16
COM_STMT_EXECUTE = 0x17
COM_STMT_CLOSE = 0x19
COM_STMT_RESET = 0x1A

# --- column type codes (text protocol) ---
MYSQL_TYPE_TINY = 0x01
MYSQL_TYPE_SHORT = 0x02
MYSQL_TYPE_LONG = 0x03
MYSQL_TYPE_FLOAT = 0x04
MYSQL_TYPE_DOUBLE = 0x05
MYSQL_TYPE_NULL = 0x06
MYSQL_TYPE_TIMESTAMP = 0x07
MYSQL_TYPE_LONGLONG = 0x08
MYSQL_TYPE_DATE = 0x0A
MYSQL_TYPE_NEWDECIMAL = 0xF6
MYSQL_TYPE_BLOB = 0xFC
MYSQL_TYPE_VAR_STRING = 0xFD
MYSQL_TYPE_STRING = 0xFE

# Gateway error synthesis (gateway.go:242-251, constants.go:525-526)
ER_UNKNOWN = 1105
SQLSTATE_UNKNOWN = "08S01"

AUTH_NATIVE = "mysql_native_password"

# Collation id → name, subset of constants.go:77-298 sufficient for
# SHOW COLLATION and handshake negotiation; default id 46.
COLLATIONS: dict[int, str] = {
    8: "latin1_swedish_ci",
    33: "utf8_general_ci",
    45: "utf8mb4_general_ci",
    46: "utf8mb4_bin",
    63: "binary",
    83: "utf8_bin",
    224: "utf8mb4_unicode_ci",
    255: "utf8mb4_0900_ai_ci",
}

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
SERVER_STATUS_CURSOR_EXISTS = 1 << 6  # constants.go:23-37 ServerStatusCursorExists
SERVER_STATUS_LAST_ROW_SENT = 1 << 7

# --- commands ---
COM_QUIT = 0x01
COM_INIT_DB = 0x02
COM_QUERY = 0x03
COM_FIELD_LIST = 0x04
COM_STATISTICS = 0x09         # mysqladmin status: raw-string response
COM_PROCESS_INFO = 0x0A       # processlist as a resultset (deprecated)
COM_PROCESS_KILL = 0x0C       # 4-byte LE connection id (deprecated)
COM_DEBUG = 0x0D              # mysqladmin debug: dump state, EOF reply
COM_REFRESH = 0x07            # mysqladmin flush-*: 1-byte flags, OK reply
COM_PING = 0x0E
COM_CHANGE_USER = 0x11        # pooled-client re-auth on checkout
COM_STMT_PREPARE = 0x16
COM_STMT_EXECUTE = 0x17
COM_STMT_SEND_LONG_DATA = 0x18  # chunked BLOB params, no response
COM_STMT_CLOSE = 0x19
COM_STMT_RESET = 0x1A
COM_SET_OPTION = 0x1B
COM_STMT_FETCH = 0x1C
COM_RESET_CONNECTION = 0x1F   # cheap session-state reset (pools)

# COM_SET_OPTION option values
MYSQL_OPTION_MULTI_STATEMENTS_ON = 0
MYSQL_OPTION_MULTI_STATEMENTS_OFF = 1

# COM_STMT_EXECUTE flags
CURSOR_TYPE_READ_ONLY = 0x01

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
MYSQL_TYPE_TIME = 0x0B
MYSQL_TYPE_DATETIME = 0x0C
MYSQL_TYPE_NEWDECIMAL = 0xF6
MYSQL_TYPE_BLOB = 0xFC
MYSQL_TYPE_VAR_STRING = 0xFD
MYSQL_TYPE_STRING = 0xFE

# Gateway error synthesis (gateway.go:242-251, constants.go:525-526)
ER_UNKNOWN = 1105
SQLSTATE_UNKNOWN = "08S01"
ER_NO_SUCH_THREAD = 1094      # "Unknown thread id: %d"
ER_QUERY_INTERRUPTED = 1317   # KILL QUERY landed mid-statement

AUTH_NATIVE = "mysql_native_password"

# Collation id → name: the full MySQL 5.7 collation table (public
# protocol data; reference ships the same map, constants.go:77-298).
# Default id 46 = utf8mb4_bin — matching Spark's binary string
# comparison semantics.  SHOW COLLATION derives the Charset column from
# the name prefix ("utf8mb4_bin" → "utf8mb4", "binary" → "binary").
COLLATIONS: dict[int, str] = {
    1: "big5_chinese_ci",
    2: "latin2_czech_cs",
    3: "dec8_swedish_ci",
    4: "cp850_general_ci",
    5: "latin1_german1_ci",
    6: "hp8_english_ci",
    7: "koi8r_general_ci",
    8: "latin1_swedish_ci",
    9: "latin2_general_ci",
    10: "swe7_swedish_ci",
    11: "ascii_general_ci",
    12: "ujis_japanese_ci",
    13: "sjis_japanese_ci",
    14: "cp1251_bulgarian_ci",
    15: "latin1_danish_ci",
    16: "hebrew_general_ci",
    18: "tis620_thai_ci",
    19: "euckr_korean_ci",
    20: "latin7_estonian_cs",
    21: "latin2_hungarian_ci",
    22: "koi8u_general_ci",
    23: "cp1251_ukrainian_ci",
    24: "gb2312_chinese_ci",
    25: "greek_general_ci",
    26: "cp1250_general_ci",
    27: "latin2_croatian_ci",
    28: "gbk_chinese_ci",
    29: "cp1257_lithuanian_ci",
    30: "latin5_turkish_ci",
    31: "latin1_german2_ci",
    32: "armscii8_general_ci",
    33: "utf8_general_ci",
    34: "cp1250_czech_cs",
    35: "ucs2_general_ci",
    36: "cp866_general_ci",
    37: "keybcs2_general_ci",
    38: "macce_general_ci",
    39: "macroman_general_ci",
    40: "cp852_general_ci",
    41: "latin7_general_ci",
    42: "latin7_general_cs",
    43: "macce_bin",
    44: "cp1250_croatian_ci",
    45: "utf8mb4_general_ci",
    46: "utf8mb4_bin",
    47: "latin1_bin",
    48: "latin1_general_ci",
    49: "latin1_general_cs",
    50: "cp1251_bin",
    51: "cp1251_general_ci",
    52: "cp1251_general_cs",
    53: "macroman_bin",
    54: "utf16_general_ci",
    55: "utf16_bin",
    56: "utf16le_general_ci",
    57: "cp1256_general_ci",
    58: "cp1257_bin",
    59: "cp1257_general_ci",
    60: "utf32_general_ci",
    61: "utf32_bin",
    62: "utf16le_bin",
    63: "binary",
    64: "armscii8_bin",
    65: "ascii_bin",
    66: "cp1250_bin",
    67: "cp1256_bin",
    68: "cp866_bin",
    69: "dec8_bin",
    70: "greek_bin",
    71: "hebrew_bin",
    72: "hp8_bin",
    73: "keybcs2_bin",
    74: "koi8r_bin",
    75: "koi8u_bin",
    77: "latin2_bin",
    78: "latin5_bin",
    79: "latin7_bin",
    80: "cp850_bin",
    81: "cp852_bin",
    82: "swe7_bin",
    83: "utf8_bin",
    84: "big5_bin",
    85: "euckr_bin",
    86: "gb2312_bin",
    87: "gbk_bin",
    88: "sjis_bin",
    89: "tis620_bin",
    90: "ucs2_bin",
    91: "ujis_bin",
    92: "geostd8_general_ci",
    93: "geostd8_bin",
    94: "latin1_spanish_ci",
    95: "cp932_japanese_ci",
    96: "cp932_bin",
    97: "eucjpms_japanese_ci",
    98: "eucjpms_bin",
    99: "cp1250_polish_ci",
    101: "utf16_unicode_ci",
    102: "utf16_icelandic_ci",
    103: "utf16_latvian_ci",
    104: "utf16_romanian_ci",
    105: "utf16_slovenian_ci",
    106: "utf16_polish_ci",
    107: "utf16_estonian_ci",
    108: "utf16_spanish_ci",
    109: "utf16_swedish_ci",
    110: "utf16_turkish_ci",
    111: "utf16_czech_ci",
    112: "utf16_danish_ci",
    113: "utf16_lithuanian_ci",
    114: "utf16_slovak_ci",
    115: "utf16_spanish2_ci",
    116: "utf16_roman_ci",
    117: "utf16_persian_ci",
    118: "utf16_esperanto_ci",
    119: "utf16_hungarian_ci",
    120: "utf16_sinhala_ci",
    121: "utf16_german2_ci",
    122: "utf16_croatian_ci",
    123: "utf16_unicode_520_ci",
    124: "utf16_vietnamese_ci",
    128: "ucs2_unicode_ci",
    129: "ucs2_icelandic_ci",
    130: "ucs2_latvian_ci",
    131: "ucs2_romanian_ci",
    132: "ucs2_slovenian_ci",
    133: "ucs2_polish_ci",
    134: "ucs2_estonian_ci",
    135: "ucs2_spanish_ci",
    136: "ucs2_swedish_ci",
    137: "ucs2_turkish_ci",
    138: "ucs2_czech_ci",
    139: "ucs2_danish_ci",
    140: "ucs2_lithuanian_ci",
    141: "ucs2_slovak_ci",
    142: "ucs2_spanish2_ci",
    143: "ucs2_roman_ci",
    144: "ucs2_persian_ci",
    145: "ucs2_esperanto_ci",
    146: "ucs2_hungarian_ci",
    147: "ucs2_sinhala_ci",
    148: "ucs2_german2_ci",
    149: "ucs2_croatian_ci",
    150: "ucs2_unicode_520_ci",
    151: "ucs2_vietnamese_ci",
    159: "ucs2_general_mysql500_ci",
    160: "utf32_unicode_ci",
    161: "utf32_icelandic_ci",
    162: "utf32_latvian_ci",
    163: "utf32_romanian_ci",
    164: "utf32_slovenian_ci",
    165: "utf32_polish_ci",
    166: "utf32_estonian_ci",
    167: "utf32_spanish_ci",
    168: "utf32_swedish_ci",
    169: "utf32_turkish_ci",
    170: "utf32_czech_ci",
    171: "utf32_danish_ci",
    172: "utf32_lithuanian_ci",
    173: "utf32_slovak_ci",
    174: "utf32_spanish2_ci",
    175: "utf32_roman_ci",
    176: "utf32_persian_ci",
    177: "utf32_esperanto_ci",
    178: "utf32_hungarian_ci",
    179: "utf32_sinhala_ci",
    180: "utf32_german2_ci",
    181: "utf32_croatian_ci",
    182: "utf32_unicode_520_ci",
    183: "utf32_vietnamese_ci",
    192: "utf8_unicode_ci",
    193: "utf8_icelandic_ci",
    194: "utf8_latvian_ci",
    195: "utf8_romanian_ci",
    196: "utf8_slovenian_ci",
    197: "utf8_polish_ci",
    198: "utf8_estonian_ci",
    199: "utf8_spanish_ci",
    200: "utf8_swedish_ci",
    201: "utf8_turkish_ci",
    202: "utf8_czech_ci",
    203: "utf8_danish_ci",
    204: "utf8_lithuanian_ci",
    205: "utf8_slovak_ci",
    206: "utf8_spanish2_ci",
    207: "utf8_roman_ci",
    208: "utf8_persian_ci",
    209: "utf8_esperanto_ci",
    210: "utf8_hungarian_ci",
    211: "utf8_sinhala_ci",
    212: "utf8_german2_ci",
    213: "utf8_croatian_ci",
    214: "utf8_unicode_520_ci",
    215: "utf8_vietnamese_ci",
    223: "utf8_general_mysql500_ci",
    224: "utf8mb4_unicode_ci",
    225: "utf8mb4_icelandic_ci",
    226: "utf8mb4_latvian_ci",
    227: "utf8mb4_romanian_ci",
    228: "utf8mb4_slovenian_ci",
    229: "utf8mb4_polish_ci",
    230: "utf8mb4_estonian_ci",
    231: "utf8mb4_spanish_ci",
    232: "utf8mb4_swedish_ci",
    233: "utf8mb4_turkish_ci",
    234: "utf8mb4_czech_ci",
    235: "utf8mb4_danish_ci",
    236: "utf8mb4_lithuanian_ci",
    237: "utf8mb4_slovak_ci",
    238: "utf8mb4_spanish2_ci",
    239: "utf8mb4_roman_ci",
    240: "utf8mb4_persian_ci",
    241: "utf8mb4_esperanto_ci",
    242: "utf8mb4_hungarian_ci",
    243: "utf8mb4_sinhala_ci",
    244: "utf8mb4_german2_ci",
    245: "utf8mb4_croatian_ci",
    246: "utf8mb4_unicode_520_ci",
    247: "utf8mb4_vietnamese_ci",
    255: "utf8mb4_0900_ai_ci",
}

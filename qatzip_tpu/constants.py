"""Public enums, return codes and default constants.

TPU-native re-design of the QATzip public surface. Parity reference:
``include/qatzip.h`` (enums at :179-290, return codes at :311-361, defaults at
:563-589) — values are kept numerically identical so that code written against
the reference's constants ports over directly.
"""

from __future__ import annotations

import enum

API_VERSION = "2.3-tpu"


class HuffmanHdr(enum.IntEnum):
    """Huffman header type (reference ``QzHuffmanHdr_T``, qatzip.h:179)."""

    DYNAMIC_HDR = 0
    STATIC_HDR = 1


class MemType(enum.IntEnum):
    """Memory placement of a buffer (reference ``PinMem_T``, qatzip.h:196).

    PINNED maps to device-committed / pool-registered buffers (zero-copy into
    the TPU dispatch path); COMMON is ordinary host memory that is staged.
    """

    DEFLATE_4B = -1  # unused placeholder to keep enum non-empty semantics
    COMMON_MEM = 0
    PINNED_MEM = 1


class Direction(enum.IntEnum):
    """Session direction (reference ``QzDirection_T``, qatzip.h:214)."""

    DIR_COMPRESS = 0
    DIR_DECOMPRESS = 1
    DIR_BOTH = 2


class DataFormat(enum.IntEnum):
    """On-wire framing format (reference ``QzDataFormat_T``, qatzip.h:235)."""

    DEFLATE_4B = 0      # 4-byte LE compressed-length header per chunk
    DEFLATE_GZIP = 1    # standard RFC1952 gzip members
    DEFLATE_GZIP_EXT = 2  # gzip members with 'QZ' FEXTRA {src_sz, dest_sz}
    DEFLATE_RAW = 3     # raw RFC1951 deflate stream
    LZ4 = 4             # LZ4 frame (RFC: lz4 frame format v1.6)
    LZ4S = 5            # LZ4s intermediate block stream (post-process input)
    ZLIB = 6            # RFC1950 zlib wrapper (reference exposes via fmt list)


class PollingMode(enum.IntEnum):
    """Polling mode (reference ``QzPollingMode_T``, qatzip.h:257)."""

    PERIODICAL_POLLING = 0
    BUSY_POLLING = 1


class CrcType(enum.IntEnum):
    """Checksum selector (reference ``QzCrcType_T``, qatzip.h:274)."""

    NONE = 0
    CRC32 = 1
    ADLER32 = 2
    XXHASH32 = 3
    CRC64 = 4


class SessionState(enum.IntEnum):
    """Internal session FSM (reference qatzip_internal.h session states)."""

    QZ_NONE = 0
    QZ_INIT_HW = 1
    QZ_INIT_SW = 2
    QZ_SETUP_HW = 3
    QZ_SETUP_SW = 4


# --------------------------------------------------------------------------
# Return codes — reference include/qatzip.h:311-361 (numeric parity).
# --------------------------------------------------------------------------
QZ_OK = 0
QZ_DUPLICATE = 1
QZ_FORCE_SW = 2
QZ_PARAMS = -1
QZ_FAIL = -2
QZ_BUF_ERROR = -3
QZ_DATA_ERROR = -4
QZ_TIMEOUT = -5
QZ_INTEG = -100
QZ_NO_HW = 11
QZ_NO_MDRV = 12
QZ_NO_INST_ATTACH = 13
QZ_LOW_MEM = 14
QZ_LOW_DEST_MEM = 15
QZ_UNSUPPORTED_FMT = 16
QZ_NONE = 100
QZ_NOSW_NO_HW = -101
QZ_NOSW_NO_MDRV = -102
QZ_NOSW_NO_INST_ATTACH = -103
QZ_NOSW_LOW_MEM = -104
QZ_NO_SW_AVAIL = -105
QZ_NOSW_UNSUPPORTED_FMT = -116
QZ_POST_PROCESS_ERROR = -117
QZ_METADATA_OVERFLOW = -118
QZ_OUT_OF_RANGE = -119
QZ_NOT_SUPPORTED = -200

#: Async engine return codes (reference qatzip.h async section)
AQZ_OK = 0
AQZ_NO_SPACE = -300
AQZ_STOPPED = -301

# --------------------------------------------------------------------------
# SW-backup bit flags — reference include/qatzip.h:606-621
# --------------------------------------------------------------------------
QZ_SW_BACKUP_OFF = 0
QZ_SW_BACKUP_ON = 1
QZ_AUTO_SELECT_BEST = 2  # pick smaller of accel/sw output

# --------------------------------------------------------------------------
# Defaults — reference include/qatzip.h:563-589 and src/qatzip.c:135-152
# --------------------------------------------------------------------------
QZ_DIRECTION_DEFAULT = Direction.DIR_BOTH
QZ_COMP_LEVEL_DEFAULT = 1
QZ_COMP_ALGOL_DEFAULT = "deflate"
QZ_POLL_SLEEP_DEFAULT = 10
QZ_DATA_FORMAT_DEFAULT = DataFormat.DEFLATE_GZIP_EXT
QZ_MAX_FORKS_DEFAULT = 3
QZ_SW_BACKUP_DEFAULT = 1
QZ_HW_BUFF_SZ = 64 * 1024          # default chunk size (qatzip.h:571)
QZ_HW_BUFF_MIN_SZ = 1 * 1024       # (qatzip.h:572)
QZ_HW_BUFF_MAX_SZ = 512 * 1024     # (qatzip.h:573)
QZ_STRM_BUFF_SZ_DEFAULT = QZ_HW_BUFF_SZ
QZ_STRM_BUFF_MIN_SZ = 1 * 1024
QZ_STRM_BUFF_MAX_SZ = 2 * 1024 * 1024 - 5 * 1024  # (qatzip.h:578)
QZ_COMP_THRESHOLD_DEFAULT = 1024   # SW route below this (qatzip.h:579)
QZ_COMP_THRESHOLD_MINIMUM = 128    # (qatzip.h:580)
QZ_REQ_THRESHOLD_MINIMUM = 1
QZ_REQ_THRESHOLD_MAXIMUM = 32      # NUM_BUFF analog
QZ_REQ_THRESHOLD_DEFAULT = QZ_REQ_THRESHOLD_MAXIMUM
QZ_WAIT_CNT_THRESHOLD_DEFAULT = 8
QZ_DEFLATE_COMP_LVL_MINIMUM = 1
QZ_DEFLATE_COMP_LVL_MAXIMUM = 9
QZ_DEFLATE_COMP_LVL_MAXIMUM_GEN4 = 12
QZ_LZ4_COMP_LVL_MINIMUM = 1
QZ_LZ4_COMP_LVL_MAXIMUM = 12

#: Size of output for a zero-byte gzipext compress (reference qatzip.h:1694)
QZ_EMPTY_OUT_SZ_GZIP_EXT = 34

#: In-flight ring depth per device lane (reference qatzip_internal.h:63-68)
QZ_NUM_BUFF = 32
QZ_NUM_BUFF_SMALL_CHUNK = 128

#: Max deflate stored-block payload (reference qatzip_internal.h:85)
QZ_STORED_BLK_MAX = 65535

#: History window: 32KB (windowSize=7, reference src/qatzip_utils.c:270)
QZ_HISTORY_WINDOW = 32 * 1024

#: Adaptive polling ladder, microseconds (reference src/qatzip.c:75-78)
QZ_POLLING_LADDER_US = (
    10, 20, 40, 80, 160, 320, 640, 1000,
    2000, 4000, 8000, 16000, 24000, 32000, 48000, 64000,
)

#: Max retries for a device submit before giving up (qatzip_internal.h:69)
QZ_MAX_NUM_RETRY = 500

#: LZ4 frame constants (reference src/qatzip_internal.h:136-158)
LZ4_MAGIC = 0x184D2204
LZ4_SKIPPABLE_MAGIC_MIN = 0x184D2A50
LZ4_SKIPPABLE_MAGIC_MAX = 0x184D2A5F
LZ4_FRAME_VERSION = 1
LZ4_MAX_BLOCK_SIZE_ID = 4  # 64KB max block
LZ4_BLOCK_UNCOMPRESSED_FLAG = 0x80000000

#: LZ4s token parameters (reference src/qatzip_utils.c LZ4s setup)
LZ4S_MIN_MATCH_DEFAULT = 3

# Mapping used by level semantics: reference README.md:109-114
def effective_deflate_sw_level(level: int) -> int:
    """QATzip level → zlib level: 1-4 map through, 5-8 clamp to 4, 9 = 9."""
    if level <= 4:
        return max(1, level)
    if level <= 8:
        return 4
    return 9


# Only genuine return codes — config/limit constants like
# QZ_LZ4_COMP_LVL_MINIMUM share values with rc codes and must not shadow
# their names in error messages.
_RC_CODE_NAMES = (
    "QZ_OK", "QZ_DUPLICATE", "QZ_FORCE_SW", "QZ_PARAMS", "QZ_FAIL",
    "QZ_BUF_ERROR", "QZ_DATA_ERROR", "QZ_TIMEOUT", "QZ_INTEG", "QZ_NO_HW",
    "QZ_NO_MDRV", "QZ_NO_INST_ATTACH", "QZ_LOW_MEM", "QZ_LOW_DEST_MEM",
    "QZ_UNSUPPORTED_FMT", "QZ_NONE", "QZ_NOSW_NO_HW", "QZ_NOSW_NO_MDRV",
    "QZ_NOSW_NO_INST_ATTACH", "QZ_NOSW_LOW_MEM", "QZ_NO_SW_AVAIL",
    "QZ_NOSW_UNSUPPORTED_FMT", "QZ_POST_PROCESS_ERROR",
    "QZ_METADATA_OVERFLOW", "QZ_OUT_OF_RANGE", "QZ_NOT_SUPPORTED",
    "AQZ_OK", "AQZ_NO_SPACE", "AQZ_STOPPED",
)
_RC_NAMES: dict = {}
for _k in _RC_CODE_NAMES:
    _RC_NAMES.setdefault(globals()[_k], _k)  # first (QZ_*) name wins


def rc_name(rc: int) -> str:
    """Human-readable name for a return code."""
    return _RC_NAMES.get(rc, f"QZ_RC({rc})")


class QzError(Exception):
    """Exception carrying a QZ return code, raised by the pythonic API."""

    def __init__(self, rc: int, msg: str = ""):
        self.rc = rc
        super().__init__(f"{rc_name(rc)}{': ' + msg if msg else ''}")

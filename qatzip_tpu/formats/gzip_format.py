"""RFC1952 gzip framing: QZ-extended headers, std headers, 4-byte headers.

Parity reference: ``src/qatzip_gzip.c`` (header/footer generators at :76-133,
:210-219; validators at :135-208; footer scanner at :226-243) and the struct
layouts ``QzGzH_T``/``StdGzH_T``/``StdGzF_T``/``Qz4BH_T``/``QzExtraField_T``
(``src/qatzip_internal.h:357-392``). All multi-byte integers little-endian,
packed (no padding).

Wire layouts (sizes in bytes)::

    StdGzH  (10): 1f 8b 08 <flag> <mtime:4> <xfl> <os>
    QzGzH   (24): StdGzH(flag=0x04) + x_len:u16(=12)
                  + 'Q' 'Z' x2_len:u16(=8) src_sz:u32 dest_sz:u32
    StdGzF  (8):  crc32:u32 isize:u32
    Qz4BH   (4):  blk_size:u32   (compressed length of following raw deflate)
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from typing import List, Optional, Tuple

from ..constants import DataFormat, QZ_OK, QZ_FAIL

GZIP_ID1 = 0x1F
GZIP_ID2 = 0x8B
GZIP_CM_DEFLATE = 8

GZIP_HEADER_SZ = 10
GZIP_EXT_HEADER_SZ = 24
GZIP_FOOTER_SZ = 8
QZ4B_HEADER_SZ = 4

_STD_HDR = struct.Struct("<BBBB4sBB")
_EXT_TAIL = struct.Struct("<HccHII")  # x_len, 'Q','Z', x2_len, src_sz, dest_sz
_FOOTER = struct.Struct("<II")


@dataclass
class QzGzipHeader:
    """Parsed gzip(-ext) member header (reference ``QzGzH_T``)."""

    flag: int = 0
    xfl: int = 0
    os: int = 255
    has_qz_extra: bool = False
    src_sz: int = 0   # uncompressed size of the member (QZ extra field)
    dest_sz: int = 0  # compressed payload size of the member (QZ extra field)
    header_sz: int = GZIP_HEADER_SZ


def gzip_ext_header(src_sz: int, dest_sz: int) -> bytes:
    """QZ extended gzip header (reference qzGzipHeaderGen, qatzip_gzip.c:88)."""
    return (_STD_HDR.pack(GZIP_ID1, GZIP_ID2, GZIP_CM_DEFLATE, 0x04,
                          b"\x00\x00\x00\x00", 0, 255)
            + _EXT_TAIL.pack(12, b"Q", b"Z", 8, src_sz & 0xFFFFFFFF,
                             dest_sz & 0xFFFFFFFF))


def std_gzip_header() -> bytes:
    """Standard gzip header (reference stdGzipHeaderGen, qatzip_gzip.c:109)."""
    return _STD_HDR.pack(GZIP_ID1, GZIP_ID2, GZIP_CM_DEFLATE, 0x00,
                         b"\x00\x00\x00\x00", 0, 255)


def gzip_footer(crc32: int, isize: int) -> bytes:
    """Gzip footer {crc32, ISIZE} (reference qzGzipFooterGen, :210)."""
    return _FOOTER.pack(crc32 & 0xFFFFFFFF, isize & 0xFFFFFFFF)


def qz4b_header(compressed_sz: int) -> bytes:
    """4-byte length header (reference qz4BHeaderGen, qatzip_gzip.c:128)."""
    return struct.pack("<I", compressed_sz & 0xFFFFFFFF)


def parse_gzip_header(buf, offset: int = 0) -> Optional[QzGzipHeader]:
    """Parse a std or QZ-ext gzip header at ``offset``.

    Returns None when the bytes are not a valid gzip header. Mirrors the
    checks of ``qzGzipHeaderExt`` (qatzip_gzip.c:182-208) for the QZ variant
    while also accepting general RFC1952 headers (FEXTRA/FNAME/FCOMMENT/FHCRC)
    the way zlib's inflate does, since the SW path must handle stock gzip.
    """
    buf = memoryview(buf)
    n = len(buf) - offset
    if n < GZIP_HEADER_SZ:
        return None
    id1, id2, cm, flag, _mtime, xfl, os_ = _STD_HDR.unpack_from(buf, offset)
    if id1 != GZIP_ID1 or id2 != GZIP_ID2 or cm != GZIP_CM_DEFLATE:
        return None
    hdr = QzGzipHeader(flag=flag, xfl=xfl, os=os_)
    pos = offset + GZIP_HEADER_SZ
    if flag & 0x04:  # FEXTRA
        if len(buf) - pos < 2:
            return None
        (x_len,) = struct.unpack_from("<H", buf, pos)
        pos += 2
        if len(buf) - pos < x_len:
            return None
        # QZ subfield check (st1='Q', st2='Z', x2_len=8)
        if (x_len == 12 and bytes(buf[pos:pos + 2]) == b"QZ"
                and struct.unpack_from("<H", buf, pos + 2)[0] == 8
                and flag == 0x04
                and xfl in (0, 2, 4) and os_ == 255):
            hdr.has_qz_extra = True
            hdr.src_sz, hdr.dest_sz = struct.unpack_from("<II", buf, pos + 4)
        pos += x_len
    if flag & 0x08:  # FNAME: zero-terminated
        end = _find_nul(buf, pos)
        if end < 0:
            return None
        pos = end + 1
    if flag & 0x10:  # FCOMMENT
        end = _find_nul(buf, pos)
        if end < 0:
            return None
        pos = end + 1
    if flag & 0x02:  # FHCRC
        pos += 2
        if pos > len(buf):
            return None
    hdr.header_sz = pos - offset
    return hdr


def _find_nul(buf, start: int) -> int:
    mv = memoryview(buf)
    for i in range(start, len(mv)):
        if mv[i] == 0:
            return i
    return -1


def verify_qz_ext_header(buf, offset: int = 0) -> int:
    """Strict QZ-ext header validator (reference qzGzipHeaderExt)."""
    h = parse_gzip_header(buf, offset)
    if h is None or not h.has_qz_extra:
        return QZ_FAIL
    return QZ_OK


def find_std_gzip_footer(buf, offset: int, avail: int) -> int:
    """Locate the footer of a std (header-less-of-size) gzip member.

    Scans forward for the next std gzip header and backs off by the footer
    size, falling back to end-of-available-data, exactly like the reference
    ``findStdGzipFooter`` (qatzip_gzip.c:226-243). Returns the absolute
    offset of the footer start.
    """
    mv = memoryview(buf)
    scan = offset + GZIP_HEADER_SZ + GZIP_FOOTER_SZ
    limit = offset + avail - GZIP_HEADER_SZ
    while scan <= limit:
        if (mv[scan] == GZIP_ID1 and mv[scan + 1] == GZIP_ID2
                and mv[scan + 2] == GZIP_CM_DEFLATE and mv[scan + 3] == 0x00):
            return scan - GZIP_FOOTER_SZ
        scan += 1
    return offset + avail - GZIP_FOOTER_SZ


def parse_gzip_footer(buf, offset: int) -> Tuple[int, int]:
    """Returns (crc32, isize) at ``offset``."""
    return _FOOTER.unpack_from(buf, offset)


# ---------------------------------------------------------------------------
# Format dispatch — analog of outputHeaderGen/outputFooterGen/outputHeaderSz/
# outputFooterSz (src/qatzip_utils.c:731-856).
# ---------------------------------------------------------------------------

def output_header_sz(data_fmt: DataFormat) -> int:
    if data_fmt == DataFormat.DEFLATE_GZIP_EXT:
        return GZIP_EXT_HEADER_SZ
    if data_fmt == DataFormat.DEFLATE_GZIP:
        return GZIP_HEADER_SZ
    if data_fmt == DataFormat.DEFLATE_4B:
        return QZ4B_HEADER_SZ
    return 0  # DEFLATE_RAW / ZLIB(stream-level, not per chunk)


def output_footer_sz(data_fmt: DataFormat) -> int:
    if data_fmt in (DataFormat.DEFLATE_GZIP_EXT, DataFormat.DEFLATE_GZIP):
        return GZIP_FOOTER_SZ
    return 0


def output_header_gen(data_fmt: DataFormat, src_sz: int,
                      dest_sz: int) -> bytes:
    """Per-chunk header for ``data_fmt`` (reference outputHeaderGen)."""
    if data_fmt == DataFormat.DEFLATE_GZIP_EXT:
        return gzip_ext_header(src_sz, dest_sz)
    if data_fmt == DataFormat.DEFLATE_GZIP:
        return std_gzip_header()
    if data_fmt == DataFormat.DEFLATE_4B:
        return qz4b_header(dest_sz)
    return b""


def output_footer_gen(data_fmt: DataFormat, crc32: int, isize: int) -> bytes:
    """Per-chunk footer for ``data_fmt`` (reference outputFooterGen)."""
    if data_fmt in (DataFormat.DEFLATE_GZIP_EXT, DataFormat.DEFLATE_GZIP):
        return gzip_footer(crc32, isize)
    return b""


@dataclass
class MemberInfo:
    """One framed member located in a compressed buffer.

    The decompress dispatcher's unit of work — the analog of what
    ``checkHeader`` (src/qatzip.c:2273-2369) extracts per member.
    """

    offset: int            # absolute offset of the member header
    header_sz: int
    payload_sz: int        # compressed payload bytes (between hdr and ftr)
    footer_sz: int
    uncompressed_sz: int   # declared (QZ extra / ISIZE); -1 if unknown
    crc32: Optional[int] = None  # declared footer crc; None if absent

    @property
    def total_sz(self) -> int:
        return self.header_sz + self.payload_sz + self.footer_sz

    @property
    def payload_off(self) -> int:
        return self.offset + self.header_sz


def check_header(buf, offset: int, avail: int,
                 data_fmt: DataFormat) -> Optional[MemberInfo]:
    """Parse one member's framing at ``offset`` (reference checkHeader).

    For GZIP_EXT the sizes come from the QZ extra field; for std GZIP the
    footer is located by scanning for the next header (findStdGzipFooter);
    for DEFLATE_4B the 4-byte prefix holds the compressed length.
    Returns None if no valid member starts at ``offset``.
    """
    mv = memoryview(buf)
    if data_fmt == DataFormat.DEFLATE_4B:
        if avail < QZ4B_HEADER_SZ:
            return None
        (blk_sz,) = struct.unpack_from("<I", mv, offset)
        if blk_sz == 0 or QZ4B_HEADER_SZ + blk_sz > avail:
            return None
        return MemberInfo(offset=offset, header_sz=QZ4B_HEADER_SZ,
                          payload_sz=blk_sz, footer_sz=0, uncompressed_sz=-1)

    if data_fmt in (DataFormat.DEFLATE_GZIP_EXT, DataFormat.DEFLATE_GZIP):
        h = parse_gzip_header(mv, offset)
        if h is None:
            return None
        if h.has_qz_extra:
            total = h.header_sz + h.dest_sz + GZIP_FOOTER_SZ
            if total > avail:
                return None
            crc, isize = parse_gzip_footer(mv, offset + h.header_sz + h.dest_sz)
            return MemberInfo(offset=offset, header_sz=h.header_sz,
                              payload_sz=h.dest_sz, footer_sz=GZIP_FOOTER_SZ,
                              uncompressed_sz=h.src_sz, crc32=crc)
        # std gzip member: locate footer by scanning for the next header
        foot = find_std_gzip_footer(mv, offset, avail)
        payload = foot - (offset + h.header_sz)
        if payload <= 0:
            return None
        crc, isize = parse_gzip_footer(mv, foot)
        return MemberInfo(offset=offset, header_sz=h.header_sz,
                          payload_sz=payload, footer_sz=GZIP_FOOTER_SZ,
                          uncompressed_sz=isize, crc32=crc)

    return None  # RAW has no framing — handled by stream-decode fallback


def scan_members(buf, data_fmt: DataFormat,
                 limit: Optional[int] = None) -> List[MemberInfo]:
    """Walk all members in ``buf``; stops at the first unparseable offset."""
    mv = memoryview(buf)
    n = len(mv) if limit is None else limit
    out: List[MemberInfo] = []
    off = 0
    while off < n:
        m = check_header(mv, off, n - off, data_fmt)
        if m is None:
            break
        out.append(m)
        off += m.total_sz
    return out

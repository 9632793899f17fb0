"""LZ4 frame/block framing and LZ4s block framing.

Parity reference: ``src/qatzip_lz4.c`` (header gen :104-132, footer :134-143,
frame walker ``findLZ4Footer`` :145-173, header verifier :62-102, lz4s block
header :219-231) and constants ``src/qatzip_internal.h:136-158``.

Frame layout emitted by the accelerated path (15-byte header)::

    magic:u32 = 0x184D2204
    FLG:u8    = version=1<<6 | blk_indep=0<<5 | blk_cksum=0<<4
                | cnt_size=1<<3 | cnt_cksum=1<<2 | dict_id=0
    BD:u8     = max_block_size_id(4 = 64KB) << 4
    content_size:u64 (little-endian)
    HC:u8     = (XXH32(FLG..content_size, seed=0) >> 8) & 0xFF

    blocks: [ blk_size:u32 (bit31 = stored/uncompressed flag) payload ]*
    footer: endmark:u32 = 0, content_xxh32:u32
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from typing import List, Optional, Tuple

from ..constants import (
    LZ4_MAGIC, QZ_OK, QZ_FAIL, QZ_FORCE_SW,
    LZ4_BLOCK_UNCOMPRESSED_FLAG,
)

LZ4_MAGIC_SIZE = 4
LZ4_FD_SIZE = 11
LZ4_FRAME_HEADER_SZ = LZ4_MAGIC_SIZE + LZ4_FD_SIZE  # 15
LZ4_FRAME_FOOTER_SZ = 8  # endmark + content checksum
LZ4_BLK_HEADER_SZ = 4
LZ4_MAGIC_SKIPPABLE = 0x184D2A50
LZ4_VERSION = 1
LZ4_MAX_BLK_SIZE_ID = 4  # 64 KB

_FLG = ((LZ4_VERSION & 0x3) << 6) | (0 << 5) | (0 << 4) | (1 << 3) | (1 << 2) | 0
_BD = (LZ4_MAX_BLK_SIZE_ID & 0x7) << 4


def _xxh32(data: bytes, seed: int = 0) -> int:
    from ..ops.xxhash import xxh32  # lazy; host implementation
    return xxh32(data, seed)


def lz4_frame_header(content_size: int) -> bytes:
    """Frame header (reference qzLZ4HeaderGen, qatzip_lz4.c:104-132)."""
    fd = struct.pack("<BBQ", _FLG, _BD, content_size)
    hc = (_xxh32(fd, 0) >> 8) & 0xFF
    return struct.pack("<I", LZ4_MAGIC) + fd + bytes([hc])


def lz4_frame_footer(content_xxh32: int) -> bytes:
    """Frame footer {endmark=0, content checksum} (qzLZ4FooterGen :134)."""
    return struct.pack("<II", 0, content_xxh32 & 0xFFFFFFFF)


@dataclass
class LZ4FrameInfo:
    flg: int
    bd: int
    content_size: Optional[int]
    header_sz: int
    has_content_checksum: bool
    has_block_checksum: bool
    block_independence: bool


def parse_lz4_frame_header(buf, offset: int = 0) -> Optional[LZ4FrameInfo]:
    """Parse a general LZ4 frame header (optional content size, dict id)."""
    mv = memoryview(buf)
    if len(mv) - offset < 7:
        return None
    (magic,) = struct.unpack_from("<I", mv, offset)
    if magic != LZ4_MAGIC:
        return None
    flg = mv[offset + 4]
    bd = mv[offset + 5]
    pos = offset + 6
    content_size = None
    if flg & 0x08:
        if len(mv) - pos < 8:
            return None
        (content_size,) = struct.unpack_from("<Q", mv, pos)
        pos += 8
    if flg & 0x01:  # dict id
        pos += 4
    pos += 1  # header checksum byte
    if pos > len(mv):
        return None
    return LZ4FrameInfo(
        flg=flg, bd=bd, content_size=content_size, header_sz=pos - offset,
        has_content_checksum=bool(flg & 0x04),
        has_block_checksum=bool(flg & 0x10),
        block_independence=bool(flg & 0x20))


def verify_lz4_frame_header(buf, offset: int = 0) -> int:
    """Accelerated-path header verifier (qzVerifyLZ4FrameHeader :62-102).

    QZ_OK → accelerated path can parse it; QZ_FORCE_SW → valid but must go
    through the software frame decoder; QZ_FAIL → not LZ4.
    """
    mv = memoryview(buf)
    if len(mv) - offset < 4:
        return QZ_FAIL
    (magic,) = struct.unpack_from("<I", mv, offset)
    if (magic & 0xFFFFFFF0) == LZ4_MAGIC_SKIPPABLE:
        return QZ_FORCE_SW
    if magic != LZ4_MAGIC:
        return QZ_FAIL
    info = parse_lz4_frame_header(mv, offset)
    if info is None:
        return QZ_FAIL
    if (info.flg >> 6) & 0x3 != LZ4_VERSION:
        return QZ_FAIL
    if (info.flg & 0x01 or info.has_block_checksum
            or not info.has_content_checksum or not (info.flg & 0x08)):
        return QZ_FORCE_SW
    return QZ_OK


def walk_lz4_blocks(buf, offset: int, avail: int, header_sz: int,
                    block_checksum: bool = False,
                    ) -> Optional[Tuple[List[Tuple[int, int, bool]], int]]:
    """Walk block headers from ``offset+header_sz`` until the endmark.

    Returns ([(payload_off, payload_sz, is_stored)], footer_off) or None when
    the frame is truncated. Mirrors ``findLZ4Footer`` (qatzip_lz4.c:145-173).
    ``block_checksum`` skips the 4-byte xxh32 trailing each block (frames
    with the FLG B.Checksum bit).
    """
    mv = memoryview(buf)
    pos = offset + header_sz
    end = offset + avail
    blocks: List[Tuple[int, int, bool]] = []
    while pos + LZ4_BLK_HEADER_SZ <= end:
        (word,) = struct.unpack_from("<I", mv, pos)
        if word == 0:  # endmark
            return blocks, pos
        size = word & 0x7FFFFFFF
        stored = bool(word & LZ4_BLOCK_UNCOMPRESSED_FLAG)
        pos += LZ4_BLK_HEADER_SZ
        if pos + size > end:
            return None
        blocks.append((pos, size, stored))
        pos += size
        if block_checksum:
            if pos + 4 > end:
                return None
            pos += 4
    return None


def find_lz4_footer(buf, offset: int, avail: int) -> Optional[int]:
    """Absolute offset of the frame footer (endmark) or None if truncated."""
    info = parse_lz4_frame_header(buf, offset)
    if info is None:
        return None
    walked = walk_lz4_blocks(buf, offset, avail, info.header_sz)
    if walked is None:
        return None
    return walked[1]


def lz4s_block_header(payload_sz: int) -> bytes:
    """LZ4s block header = 4-byte produced size (qzLZ4SBlockHeaderGen :219)."""
    return struct.pack("<I", payload_sz & 0xFFFFFFFF)

"""Software codec engine: zlib-backed DEFLATE + native LZ4/LZ4s.

Parity reference: ``src/qatzip_sw.c`` —
  * qzDeflateSWCompress (:76-253): chunked zlib with gzip(-ext) members,
    crc combine, back-filled extra-field sizes
  * qzDeflateSWDecompress + multi-member loop (:255-428, :702-734)
  * qzLZ4SWCompress / qzLZ4SWDecompress via lz4frame (:430-628)

We produce one gzip member per hw_buff_sz chunk — identical member framing
to the accelerated path, so SW-compressed buffers decompress on the
accelerated path and vice versa (the reference tests exactly this
equivalence, test/main.c qzFuncTests -m 17).
"""

from __future__ import annotations

import struct
import zlib
from typing import List, Optional, Tuple

from ..constants import (
    DataFormat, QZ_DATA_ERROR, QzError, effective_deflate_sw_level,
)
from ..formats import (
    gzip_ext_header, std_gzip_header, gzip_footer, qz4b_header,
    lz4_frame_header, lz4_frame_footer, parse_lz4_frame_header,
    walk_lz4_blocks, lz4s_block_header,
)
from ..ops import crc32, crc32_combine, xxh32


# ---------------------------------------------------------------------------
# DEFLATE primitives
# ---------------------------------------------------------------------------

def deflate_raw_compress(chunk: bytes, level: int = 1) -> bytes:
    """One complete raw deflate stream (BFINAL set) for a chunk."""
    co = zlib.compressobj(level, zlib.DEFLATED, -15)
    return co.compress(chunk) + co.flush(zlib.Z_FINISH)


def inflate_raw(payload, expected_sz: Optional[int] = None) -> bytes:
    """Decode one raw deflate stream; errors → QzError(QZ_DATA_ERROR)."""
    try:
        do = zlib.decompressobj(-15)
        out = do.decompress(bytes(payload))
        out += do.flush()
    except zlib.error as e:
        raise QzError(QZ_DATA_ERROR, str(e)) from None
    if expected_sz is not None and len(out) != expected_sz:
        raise QzError(QZ_DATA_ERROR,
                      f"size mismatch: got {len(out)}, want {expected_sz}")
    return out


def _chunks(data: bytes, sz: int):
    for off in range(0, len(data), sz):
        yield data[off:off + sz]
    if not data:
        yield b""


def sw_compress(data: bytes, data_fmt: DataFormat, level: int,
                hw_buff_sz: int, mini_match: int = 3) -> Tuple[bytes, int]:
    """Compress ``data`` into the requested framing. Returns (out, crc32).

    Mirrors qzSWCompress dispatch (qatzip_sw.c:632) + qzDeflateSWCompress.
    """
    zlevel = effective_deflate_sw_level(level)
    if data_fmt in (DataFormat.DEFLATE_GZIP_EXT, DataFormat.DEFLATE_GZIP,
                    DataFormat.DEFLATE_4B):
        parts: List[bytes] = []
        total_crc = 0
        for chunk in _chunks(data, hw_buff_sz):
            payload = deflate_raw_compress(chunk, zlevel)
            ccrc = crc32(chunk)
            total_crc = crc32_combine(total_crc, ccrc, len(chunk))
            if data_fmt == DataFormat.DEFLATE_GZIP_EXT:
                parts.append(gzip_ext_header(len(chunk), len(payload)))
                parts.append(payload)
                parts.append(gzip_footer(ccrc, len(chunk)))
            elif data_fmt == DataFormat.DEFLATE_GZIP:
                parts.append(std_gzip_header())
                parts.append(payload)
                parts.append(gzip_footer(ccrc, len(chunk)))
            else:  # DEFLATE_4B
                parts.append(qz4b_header(len(payload)))
                parts.append(payload)
        return b"".join(parts), total_crc

    if data_fmt == DataFormat.DEFLATE_RAW:
        return deflate_raw_compress(data, zlevel), crc32(data)

    if data_fmt == DataFormat.ZLIB:
        co = zlib.compressobj(zlevel, zlib.DEFLATED, 15)
        return co.compress(data) + co.flush(), crc32(data)

    if data_fmt == DataFormat.LZ4:
        out = lz4_frame_compress(data, hw_buff_sz=min(hw_buff_sz, 64 * 1024))
        return out, crc32(data)

    if data_fmt == DataFormat.LZ4S:
        return lz4s_blocks_compress(data, hw_buff_sz=min(hw_buff_sz, 64 * 1024),
                                    mini_match=mini_match), crc32(data)

    raise QzError(QZ_DATA_ERROR, f"unsupported format {data_fmt}")


def sw_decompress_multi(data, data_fmt: DataFormat,
                        max_out: Optional[int] = None) -> Tuple[bytes, int, int]:
    """Multi-member software decompress.

    Returns (out, consumed, crc32). Mirrors qzSWDecompressMulti
    (qatzip_sw.c:702-734): loops zlib/lz4 stream decoders over concatenated
    members until input is exhausted or output budget reached.
    """
    data = bytes(data)
    if data_fmt in (DataFormat.DEFLATE_GZIP_EXT, DataFormat.DEFLATE_GZIP):
        out = bytearray()
        pos = 0
        n = len(data)
        while pos < n:
            do = zlib.decompressobj(31)  # gzip wrapper
            try:
                piece = do.decompress(data[pos:])
                piece += do.flush()
            except zlib.error as e:
                if pos == 0:
                    raise QzError(QZ_DATA_ERROR, str(e)) from None
                break
            if not do.eof:
                break  # truncated trailing member
            out += piece
            consumed = n - pos - len(do.unused_data)
            if consumed <= 0:
                break
            pos += consumed
            if max_out is not None and len(out) >= max_out:
                break
        return bytes(out), pos, crc32(bytes(out))

    if data_fmt == DataFormat.DEFLATE_4B:
        out = bytearray()
        pos = 0
        n = len(data)
        while pos + 4 <= n:
            (blk,) = struct.unpack_from("<I", data, pos)
            if blk == 0 or pos + 4 + blk > n:
                break
            out += inflate_raw(data[pos + 4: pos + 4 + blk])
            pos += 4 + blk
        return bytes(out), pos, crc32(bytes(out))

    if data_fmt == DataFormat.DEFLATE_RAW:
        do = zlib.decompressobj(-15)
        try:
            out = do.decompress(data) + do.flush()
        except zlib.error as e:
            raise QzError(QZ_DATA_ERROR, str(e)) from None
        return out, len(data) - len(do.unused_data), crc32(out)

    if data_fmt == DataFormat.ZLIB:
        do = zlib.decompressobj(15)
        try:
            out = do.decompress(data) + do.flush()
        except zlib.error as e:
            raise QzError(QZ_DATA_ERROR, str(e)) from None
        return out, len(data) - len(do.unused_data), crc32(out)

    if data_fmt == DataFormat.LZ4:
        out, consumed = lz4_frame_decompress(data)
        return out, consumed, crc32(out)

    raise QzError(QZ_DATA_ERROR, f"unsupported format {data_fmt}")


def sw_decompress(data, data_fmt: DataFormat) -> bytes:
    """Single-call decompress of a complete buffer."""
    return sw_decompress_multi(data, data_fmt)[0]


# ---------------------------------------------------------------------------
# LZ4 frame codec (native block codec underneath)
# ---------------------------------------------------------------------------

def _lz4_block_compress(chunk: bytes, max_distance: int = 32768) -> bytes:
    from .. import native
    if native.lib is not None:
        return native.lib.lz4_compress_block(chunk, max_distance)
    from .lz4_py import lz4_compress_block_py
    return lz4_compress_block_py(chunk, max_distance)


def _lz4_block_decompress(payload: bytes, out_cap: int) -> bytes:
    from .. import native
    if native.lib is not None:
        return native.lib.lz4_decompress_block(payload, out_cap)
    from .lz4_py import lz4_decompress_block_py
    return lz4_decompress_block_py(payload, out_cap)


def lz4_frame_compress(data: bytes, hw_buff_sz: int = 64 * 1024) -> bytes:
    """LZ4 frame with the reference accelerated path's header flags
    (content size + content checksum, 64KB blocks, qzLZ4HeaderGen layout)."""
    parts = [lz4_frame_header(len(data))]
    for chunk in _chunks(data, hw_buff_sz):
        if not chunk and data:
            continue
        payload = _lz4_block_compress(chunk)
        if len(payload) >= len(chunk) and len(chunk) > 0:
            # stored (uncompressed) block, bit31 set — reference
            # QZ_LZ4_STOREDBLOCK_FLAG (qatzip_internal.h:157)
            parts.append(struct.pack("<I", len(chunk) | 0x80000000))
            parts.append(chunk)
        else:
            parts.append(struct.pack("<I", len(payload)))
            parts.append(payload)
    parts.append(lz4_frame_footer(xxh32(data)))
    return b"".join(parts)


def lz4_frame_decompress(data) -> Tuple[bytes, int]:
    """Decode concatenated LZ4 frames (incl. skippable). Returns
    (out, consumed)."""
    data = bytes(data)
    out = bytearray()
    pos = 0
    n = len(data)
    while pos + 4 <= n:
        (magic,) = struct.unpack_from("<I", data, pos)
        if (magic & 0xFFFFFFF0) == 0x184D2A50:  # skippable frame
            if pos + 8 > n:
                break
            (sz,) = struct.unpack_from("<I", data, pos + 4)
            pos += 8 + sz
            continue
        info = parse_lz4_frame_header(data, pos)
        if info is None:
            if pos == 0:
                raise QzError(QZ_DATA_ERROR, "not an LZ4 frame")
            break
        walked = walk_lz4_blocks(data, pos, n - pos, info.header_sz,
                                 block_checksum=info.has_block_checksum)
        if walked is None:
            raise QzError(QZ_DATA_ERROR, "truncated LZ4 frame")
        blocks, footer_off = walked
        frame_out = bytearray()
        max_block = 1 << (8 + 2 * max(4, (info.bd >> 4) & 7))
        for (off, sz, stored) in blocks:
            payload = data[off:off + sz]
            if info.has_block_checksum:
                (want_bc,) = struct.unpack_from("<I", data, off + sz)
                if xxh32(payload) != want_bc:
                    raise QzError(QZ_DATA_ERROR,
                                  "LZ4 block checksum mismatch")
            if stored:
                frame_out += payload
            else:
                frame_out += _lz4_block_decompress(payload, max_block)
        pos = footer_off + 4  # endmark
        if info.has_content_checksum:
            if pos + 4 > n:
                raise QzError(QZ_DATA_ERROR, "missing content checksum")
            (want,) = struct.unpack_from("<I", data, pos)
            got = xxh32(bytes(frame_out))
            if want != got:
                raise QzError(QZ_DATA_ERROR, "LZ4 content checksum mismatch")
            pos += 4
        if (info.content_size is not None
                and info.content_size != len(frame_out)):
            raise QzError(QZ_DATA_ERROR, "LZ4 content size mismatch")
        out += frame_out
    return bytes(out), pos


def lz4s_blocks_compress(data: bytes, hw_buff_sz: int = 64 * 1024,
                         mini_match: int = 3) -> bytes:
    """LZ4s block stream: [blk_size:u32][lz4s payload]* (no frame wrapper) —
    the shape handed to the lz4s→zstd post-process callback
    (src/qatzip.c:2217-2249)."""
    from .. import native
    parts = []
    for chunk in _chunks(data, hw_buff_sz):
        if not chunk and data:
            continue
        if native.lib is not None:
            payload = native.lib.lz4s_compress_block(chunk, mini_match)
        else:
            from .lz4_py import lz4s_compress_block_py
            payload = lz4s_compress_block_py(chunk, mini_match)
        parts.append(lz4s_block_header(len(payload)))
        parts.append(payload)
    return b"".join(parts)

"""Compressed-size upper bounds — qzMaxCompressedLength analog.

Parity reference: ``src/qatzip.c:3175-3404`` — Gen2 deflate bound
(9/8·chunk + skid + header/footer per chunk, :3175-3211), Gen4 dynamic
variant (:3213-3274), LZ4 (:3332-3370) and LZ4s (:3292-3330) bounds, and the
34-byte empty-input constant (include/qatzip.h:1694).

These bounds also hold for the TPU encoder: static-Huffman deflate worst
case is 9 bits/byte + block overhead, within 9/8·n + skid; LZ4/LZ4s worst
case is 1 literal-run byte per 255 literals + sequence overhead, within the
reference's per-1520/2000-byte padding.
"""

from __future__ import annotations

from .constants import DataFormat, QZ_EMPTY_OUT_SZ_GZIP_EXT
from .formats import output_header_sz, output_footer_sz
from .formats.lz4_format import (
    LZ4_FRAME_HEADER_SZ, LZ4_FRAME_FOOTER_SZ, LZ4_BLK_HEADER_SZ,
)

#: deflate per-chunk skid pad (reference QZ_SKID_PAD, qatzip_internal.h)
DEFLATE_SKID_PAD = 48
DEFLATE_SKID_PAD_GEN4 = 512
DEFLATE_SKID_PAD_GEN4_DYN = 1029


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def deflate_bound(src_sz: int, data_fmt: DataFormat, hw_buff_sz: int,
                  gen4: bool = False, dynamic: bool = True) -> int:
    """Worst-case framed deflate output size (qzDeflateBound analog)."""
    hdr = output_header_sz(data_fmt)
    ftr = output_footer_sz(data_fmt)
    if src_sz == 0:
        if data_fmt == DataFormat.DEFLATE_GZIP_EXT:
            return QZ_EMPTY_OUT_SZ_GZIP_EXT
        return hdr + ftr + 8
    chunks = _cdiv(src_sz, hw_buff_sz)
    skid = DEFLATE_SKID_PAD
    extra = 0
    if gen4:
        skid = DEFLATE_SKID_PAD_GEN4_DYN if dynamic else DEFLATE_SKID_PAD_GEN4
        if dynamic:
            # Gen4 dynamic-Huffman pathological-input term
            # (reference src/qatzip.c:3213-3274)
            extra = chunks * ((8 * hw_buff_sz * 155 // 7) // 16384)
    per_chunk_overhead = hdr + ftr + skid
    return src_sz + _cdiv(src_sz, 8) + chunks * per_chunk_overhead + extra


def lz4_bound(src_sz: int, hw_buff_sz: int) -> int:
    """Worst-case LZ4 frame output (reference src/qatzip.c:3332-3370)."""
    if src_sz == 0:
        return LZ4_FRAME_HEADER_SZ + LZ4_FRAME_FOOTER_SZ + LZ4_BLK_HEADER_SZ + 1
    chunks = _cdiv(src_sz, min(hw_buff_sz, 64 * 1024))
    body = src_sz + _cdiv(src_sz, 1520) * 13 + 1024
    return (LZ4_FRAME_HEADER_SZ + LZ4_FRAME_FOOTER_SZ
            + chunks * LZ4_BLK_HEADER_SZ + body)


def lz4s_bound(src_sz: int, hw_buff_sz: int) -> int:
    """Worst-case LZ4s block-stream output (reference :3292-3330)."""
    if src_sz == 0:
        return LZ4_BLK_HEADER_SZ + 1
    chunks = _cdiv(src_sz, min(hw_buff_sz, 64 * 1024))
    return src_sz + _cdiv(src_sz, 2000) * 11 + 1024 + chunks * LZ4_BLK_HEADER_SZ


def max_compressed_length(src_sz: int, *, algorithm: str = "deflate",
                          data_fmt: DataFormat = DataFormat.DEFLATE_GZIP_EXT,
                          hw_buff_sz: int = 64 * 1024,
                          gen4: bool = False) -> int:
    """qzMaxCompressedLength analog (dispatch at src/qatzip.c:3372-3404)."""
    if algorithm == "deflate":
        return deflate_bound(src_sz, data_fmt, hw_buff_sz, gen4=gen4)
    if algorithm == "lz4":
        return lz4_bound(src_sz, hw_buff_sz)
    if algorithm == "lz4s":
        return lz4s_bound(src_sz, hw_buff_sz)
    if algorithm == "zstd":
        # post-processed output: zstd's own bound dominates
        return src_sz + (src_sz >> 8) + 1024
    raise ValueError(f"unknown algorithm {algorithm}")

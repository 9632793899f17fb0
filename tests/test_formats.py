"""Format layer: byte-exact framing vs stock tools (reference §4 strategy:
round-trip + cross-validation against stock zlib/gzip)."""

import gzip
import io
import struct
import zlib

import pytest

from qatzip_tpu.constants import DataFormat, QZ_OK, QZ_FAIL, QZ_FORCE_SW
from qatzip_tpu.formats import (
    gzip_ext_header, std_gzip_header, gzip_footer, parse_gzip_header,
    check_header, scan_members, qz4b_header,
    lz4_frame_header, lz4_frame_footer, parse_lz4_frame_header,
    verify_lz4_frame_header, find_lz4_footer,
)
from qatzip_tpu.formats.gzip_format import (
    GZIP_EXT_HEADER_SZ, GZIP_HEADER_SZ, GZIP_FOOTER_SZ, verify_qz_ext_header,
)


def gzip_ext_member(payload_src: bytes, level=6):
    raw = zlib.compress(payload_src, level)[2:-4]  # strip zlib wrapper
    return (gzip_ext_header(len(payload_src), len(raw)) + raw
            + gzip_footer(zlib.crc32(payload_src), len(payload_src)))


class TestGzipHeaders:
    def test_ext_header_layout(self):
        h = gzip_ext_header(1000, 500)
        assert len(h) == GZIP_EXT_HEADER_SZ == 24
        assert h[:4] == b"\x1f\x8b\x08\x04"
        assert h[10:12] == struct.pack("<H", 12)
        assert h[12:14] == b"QZ"
        assert struct.unpack_from("<H", h, 14)[0] == 8
        assert struct.unpack_from("<II", h, 16) == (1000, 500)

    def test_std_header(self):
        h = std_gzip_header()
        assert len(h) == GZIP_HEADER_SZ == 10
        assert h == b"\x1f\x8b\x08\x00\x00\x00\x00\x00\x00\xff"

    def test_parse_roundtrip(self):
        h = parse_gzip_header(gzip_ext_header(7, 9))
        assert h.has_qz_extra and h.src_sz == 7 and h.dest_sz == 9
        assert h.header_sz == 24
        assert verify_qz_ext_header(gzip_ext_header(7, 9)) == QZ_OK
        assert verify_qz_ext_header(std_gzip_header() + b"\0" * 14) == QZ_FAIL

    def test_stock_gzip_reads_ext_member(self):
        data = b"hello world " * 100
        member = gzip_ext_member(data)
        assert gzip.decompress(member) == data

    def test_parse_stock_gzip_header_with_fname(self):
        buf = io.BytesIO()
        with gzip.GzipFile(fileobj=buf, mode="wb", filename="x.txt") as f:
            f.write(b"abc")
        h = parse_gzip_header(buf.getvalue())
        assert h is not None and not h.has_qz_extra
        assert h.flag & 0x08


class TestMemberScan:
    def test_scan_multi_member(self):
        d1, d2 = b"A" * 5000, b"B" * 3000
        buf = gzip_ext_member(d1) + gzip_ext_member(d2)
        ms = scan_members(buf, DataFormat.DEFLATE_GZIP_EXT)
        assert len(ms) == 2
        assert ms[0].uncompressed_sz == 5000
        assert ms[1].uncompressed_sz == 3000
        assert ms[0].crc32 == zlib.crc32(d1)
        assert sum(m.total_sz for m in ms) == len(buf)

    def test_scan_std_gzip_members(self):
        d1, d2 = b"x" * 1000, b"y" * 2000
        buf = gzip.compress(d1, 1, mtime=0) + gzip.compress(d2, 1, mtime=0)
        # rewrite headers to flag=0 std form (python sets FNAME off already
        # with mtime=0 header flag 0)
        ms = scan_members(buf, DataFormat.DEFLATE_GZIP)
        assert len(ms) >= 1
        assert ms[0].uncompressed_sz == 1000

    def test_4b_members(self):
        raw1 = zlib.compress(b"m" * 100, 1)[2:-4]
        buf = qz4b_header(len(raw1)) + raw1
        ms = scan_members(buf, DataFormat.DEFLATE_4B)
        assert len(ms) == 1 and ms[0].payload_sz == len(raw1)

    def test_truncated_member_not_scanned(self):
        member = gzip_ext_member(b"Q" * 4096)
        ms = scan_members(member[:-4], DataFormat.DEFLATE_GZIP_EXT)
        assert ms == []


class TestLZ4Format:
    def test_header_layout(self):
        h = lz4_frame_header(12345)
        assert len(h) == 15
        assert struct.unpack_from("<I", h, 0)[0] == 0x184D2204
        flg = h[4]
        assert (flg >> 6) == 1            # version
        assert flg & 0x08 and flg & 0x04  # content size + checksum
        assert not (flg & 0x20)           # block indep off (reference flags)
        assert (h[5] >> 4) == 4           # 64KB max block
        assert struct.unpack_from("<Q", h, 6)[0] == 12345

    def test_header_checksum_byte(self):
        # xxh32 of FLG..content_size, byte 1 (reference qzLZ4HeaderGen)
        from qatzip_tpu.ops import xxh32
        h = lz4_frame_header(999)
        assert h[14] == (xxh32(h[4:14], 0) >> 8) & 0xFF

    def test_verify(self):
        h = lz4_frame_header(10) + b"\0" * 16
        assert verify_lz4_frame_header(h) == QZ_OK
        skip = struct.pack("<I", 0x184D2A50) + b"\0" * 16
        assert verify_lz4_frame_header(skip) == QZ_FORCE_SW
        assert verify_lz4_frame_header(b"\0" * 16) == QZ_FAIL

    def test_find_footer(self):
        payload = b"\x11" + b"x"  # trivial block bytes
        frame = (lz4_frame_header(1)
                 + struct.pack("<I", len(payload)) + payload
                 + lz4_frame_footer(0xDEAD))
        off = find_lz4_footer(frame, 0, len(frame))
        assert off == len(frame) - 8

    def test_stock_lz4_library_reads_frame(self):
        """Cross-validate against system liblz4 frame decoder when present."""
        import ctypes.util
        path = ctypes.util.find_library("lz4")
        if not path:
            pytest.skip("no system liblz4")
        from qatzip_tpu.sw.codec import lz4_frame_compress
        import ctypes
        lib = ctypes.CDLL(path)
        data = b"compressible compressible compressible! " * 500
        frame = lz4_frame_compress(data)
        # LZ4F one-shot decompress
        ctx = ctypes.c_void_p()
        ver = lib.LZ4F_getVersion()
        assert lib.LZ4F_createDecompressionContext(ctypes.byref(ctx), ver) == 0
        dst = ctypes.create_string_buffer(len(data) + 16)
        dst_sz = ctypes.c_size_t(len(dst))
        src_sz = ctypes.c_size_t(len(frame))
        rc = lib.LZ4F_decompress(ctx, dst, ctypes.byref(dst_sz), frame,
                                 ctypes.byref(src_sz), None)
        assert rc == 0, f"LZ4F_decompress rc={rc}"
        assert dst.raw[: dst_sz.value] == data
        lib.LZ4F_freeDecompressionContext(ctx)


def test_lz4_frame_with_block_checksums():
    """Frames with the B.Checksum FLG bit route through the SW walker,
    which must skip and VERIFY the per-block xxh32."""
    import struct
    from qatzip_tpu.ops import xxh32
    from qatzip_tpu.sw.codec import lz4_frame_decompress, _lz4_block_compress
    from qatzip_tpu.constants import QzError

    data = b"block checksum frame " * 300
    flg = (1 << 6) | (1 << 4) | (1 << 3) | (1 << 2)  # v1, BC, csize, ccheck
    bd = 4 << 4
    fd = struct.pack("<BBQ", flg, bd, len(data))
    hc = (xxh32(fd) >> 8) & 0xFF
    out = struct.pack("<I", 0x184D2204) + fd + bytes([hc])
    payload = _lz4_block_compress(data)
    out += struct.pack("<I", len(payload)) + payload
    out += struct.pack("<I", xxh32(payload))           # block checksum
    out += struct.pack("<II", 0, xxh32(data))          # endmark + content ck
    dec, consumed = lz4_frame_decompress(out)
    assert dec == data and consumed == len(out)

    # corrupt the block checksum → must raise
    bad = bytearray(out)
    bad[-9] ^= 0xFF  # inside block checksum field
    try:
        lz4_frame_decompress(bytes(bad))
        raised = False
    except QzError:
        raised = True
    assert raised


def test_concatenated_std_gzip_members():
    """Concatenated stock-gzip streams (FNAME flag set) decode fully.

    findStdGzipFooter can't see a member boundary when the next header's
    FLG byte is nonzero, so the native fast path reports input-consumed
    per member (qz_inflate_raw2) and the walk falls back to the
    sequential decoder — stock `gzip -dc` semantics, exceeding the
    reference (its scan has the same blind spot, qatzip_gzip.c:226-243)."""
    import gzip as gz
    import io

    import numpy as np

    import qatzip_tpu as qz

    rng = np.random.default_rng(11)
    a = rng.integers(0, 256, 100000, dtype=np.uint8).tobytes()
    b = (b"repetitive content " * 3000)[:50000]
    buf = io.BytesIO()
    with gz.GzipFile(fileobj=buf, mode="wb", filename="x") as f:
        f.write(a)
    with gz.GzipFile(fileobj=buf, mode="wb", filename="y") as f:
        f.write(b)
    s = qz.QzSession()
    s.setup_deflate()
    assert s.decompress(buf.getvalue()) == a + b
    # identical-content members: crc/ISIZE collide by construction, only
    # the consumed-input check can reject the single-member misparse
    buf2 = io.BytesIO()
    for _ in range(2):
        with gz.GzipFile(fileobj=buf2, mode="wb", filename="z") as f:
            f.write(b)
    assert s.decompress(buf2.getvalue()) == b + b

"""7z reader hardening + stock-archive filter chains.

Covers: BCJ x86 / delta coder decode (cross-validated against liblzma's
identical filters), bind-pair decode-order resolution, zip-slip rejection,
symlink-parent write refusal, bounds-checked header parsing, folder-CRC
verification, and encoded-header writing.

Parity reference: utils/qzip_7z.c reader scope (:784-1537) — stock 7-Zip
archives are untrusted input the reader explicitly supports.
"""

import lzma
import os
import struct
import zlib

import pytest

from qatzip_tpu.constants import QzError
from qatzip_tpu.formats import sevenzip as sz


def _branchy_data() -> bytes:
    """Data dense in E8/E9 call/jmp opcodes with convertible rel32s."""
    import random
    rng = random.Random(7)
    out = bytearray()
    for i in range(4000):
        r = rng.random()
        if r < 0.3:
            # call rel32 with small displacement (MSB 00 or FF)
            disp = rng.randrange(-(1 << 20), 1 << 20)
            out += b"\xe8" + struct.pack("<i", disp)
        elif r < 0.4:
            out += b"\xe9" + struct.pack("<i", rng.randrange(-(1 << 16),
                                                             1 << 16))
        elif r < 0.5:
            out += bytes([0xE8, rng.randrange(256)])  # bare opcode bytes
        else:
            out += bytes(rng.randrange(256) for _ in range(rng.randrange(1, 8)))
    return bytes(out)


def _lzma2_raw(data: bytes):
    """Compress with raw LZMA2; returns (stream, props byte for 16MB dict)."""
    c = lzma.LZMACompressor(lzma.FORMAT_RAW,
                            filters=[{"id": lzma.FILTER_LZMA2, "preset": 6}])
    return c.compress(data) + c.flush(), bytes([24])  # (2|0)<<(12+11) = 16MB


def test_bcj_x86_matches_liblzma():
    """Our BCJ transform must be byte-identical to liblzma's FILTER_X86
    (the same filter id stock 7-Zip uses for BCJ folders)."""
    data = _branchy_data()
    # liblzma x86-encodes then LZMA2-compresses; peel only the LZMA2 layer
    comp = lzma.LZMACompressor(
        lzma.FORMAT_RAW,
        filters=[{"id": lzma.FILTER_X86}, {"id": lzma.FILTER_LZMA2,
                                           "preset": 6}])
    blob = comp.compress(data) + comp.flush()
    d = lzma.LZMADecompressor(
        lzma.FORMAT_RAW, filters=[{"id": lzma.FILTER_LZMA2,
                                   "dict_size": 1 << 24}])
    liblzma_encoded = d.decompress(blob)
    ours = sz.bcj_x86_filter(data, encode=True)
    assert ours == liblzma_encoded
    assert ours != data  # the corpus actually exercises conversions
    assert sz.bcj_x86_filter(ours, encode=False) == data


def test_delta_filter_roundtrip_and_cross():
    data = bytes((i * 7 + (i >> 3)) & 0xFF for i in range(10000))
    for dist in (1, 2, 4, 16):
        enc = sz.delta_filter(data, dist, encode=True)
        assert sz.delta_filter(enc, dist, encode=False) == data
    # cross-check vs liblzma FILTER_DELTA
    comp = lzma.LZMACompressor(
        lzma.FORMAT_RAW,
        filters=[{"id": lzma.FILTER_DELTA, "dist": 4},
                 {"id": lzma.FILTER_LZMA2, "preset": 6}])
    blob = comp.compress(data) + comp.flush()
    d = lzma.LZMADecompressor(
        lzma.FORMAT_RAW, filters=[{"id": lzma.FILTER_LZMA2,
                                   "dict_size": 1 << 24}])
    assert sz.delta_filter(d.decompress(blob), 4, encode=False) == data


def _write_archive(tmp_path, packed: bytes, hdr: bytes, name="a.7z"):
    start = struct.pack("<QQI", len(packed), len(hdr),
                        zlib.crc32(hdr) & 0xFFFFFFFF)
    arc = tmp_path / name
    with open(arc, "wb") as fh:
        fh.write(sz.MAGIC + sz.VERSION
                 + struct.pack("<I", zlib.crc32(start) & 0xFFFFFFFF) + start)
        fh.write(packed)
        fh.write(hdr)
    return arc


def _filtered_folder_archive(tmp_path, data, filter_codec, filter_props,
                             crc_in_substreams=True):
    """Handcraft a stock-7z-style folder: [filter, LZMA2] declaration order
    with bind pair (filter.in0 <- lzma2.out), pack stream -> lzma2.in."""
    filtered = (sz.bcj_x86_filter(data, encode=True)
                if filter_codec == sz.CODEC_BCJ_X86
                else sz.delta_filter(data, filter_props[0] + 1, encode=True))
    packed, l2props = _lzma2_raw(filtered)

    hdr = bytearray([sz.K_HEADER, sz.K_MAIN_STREAMS, sz.K_PACK_INFO])
    hdr += sz.write_number(0) + sz.write_number(1)
    hdr += bytes([sz.K_SIZE]) + sz.write_number(len(packed))
    hdr += bytes([sz.K_END, sz.K_UNPACK_INFO, sz.K_FOLDER])
    hdr += sz.write_number(1) + bytes([0])
    hdr += sz.write_number(2)                     # two coders: filter, lzma2
    if filter_props:
        hdr += bytes([0x20 | len(filter_codec)]) + filter_codec
        hdr += sz.write_number(len(filter_props)) + filter_props
    else:
        hdr += bytes([len(filter_codec)]) + filter_codec
    hdr += bytes([0x20 | len(sz.CODEC_LZMA2)]) + sz.CODEC_LZMA2
    hdr += sz.write_number(len(l2props)) + l2props
    # bind pair: filter's in-stream 0 <- lzma2's out-stream 1
    hdr += sz.write_number(0) + sz.write_number(1)
    hdr += bytes([sz.K_CODERS_UNPACK_SIZE])
    hdr += sz.write_number(len(data))             # filter out (folder output)
    hdr += sz.write_number(len(filtered))         # lzma2 out
    hdr += bytes([sz.K_END, sz.K_SUBSTREAMS_INFO])
    if crc_in_substreams:
        hdr += bytes([sz.K_CRC, 1]) + struct.pack("<I", zlib.crc32(data))
    hdr += bytes([sz.K_END, sz.K_END])
    hdr += bytes([sz.K_FILES_INFO]) + sz.write_number(1)
    names = bytearray([0]) + "payload.bin".encode("utf-16-le") + b"\x00\x00"
    hdr += bytes([sz.K_NAME]) + sz.write_number(len(names)) + names
    hdr += bytes([sz.K_END, sz.K_END])
    return _write_archive(tmp_path, packed, bytes(hdr))


def test_7z_bcj_lzma2_folder(tmp_path):
    data = _branchy_data()
    arc = _filtered_folder_archive(tmp_path, data, sz.CODEC_BCJ_X86, b"")
    out = tmp_path / "o"
    sz.extract_7z(str(arc), str(out))
    assert (out / "payload.bin").read_bytes() == data


def test_7z_delta_lzma2_folder(tmp_path):
    data = bytes(((i % 333) * 3) & 0xFF for i in range(50000))
    arc = _filtered_folder_archive(tmp_path, data, sz.CODEC_DELTA,
                                   bytes([3]))  # dist 4
    out = tmp_path / "o"
    sz.extract_7z(str(arc), str(out))
    assert (out / "payload.bin").read_bytes() == data


def test_7z_folder_crc_used_when_substream_crc_absent(tmp_path):
    """Single-stream folders from stock 7-Zip record only a folder CRC;
    the reader must still verify it (ADVICE.md round-1 finding)."""
    data = b"folder crc only " * 500
    packed, l2props = _lzma2_raw(data)
    hdr = bytearray([sz.K_HEADER, sz.K_MAIN_STREAMS, sz.K_PACK_INFO])
    hdr += sz.write_number(0) + sz.write_number(1)
    hdr += bytes([sz.K_SIZE]) + sz.write_number(len(packed))
    hdr += bytes([sz.K_END, sz.K_UNPACK_INFO, sz.K_FOLDER])
    hdr += sz.write_number(1) + bytes([0])
    hdr += sz.write_number(1)
    hdr += bytes([0x20 | len(sz.CODEC_LZMA2)]) + sz.CODEC_LZMA2
    hdr += sz.write_number(len(l2props)) + l2props
    hdr += bytes([sz.K_CODERS_UNPACK_SIZE]) + sz.write_number(len(data))
    # folder CRC digest — deliberately WRONG to prove it is checked
    hdr += bytes([sz.K_CRC, 1]) + struct.pack("<I",
                                              (zlib.crc32(data) ^ 1)
                                              & 0xFFFFFFFF)
    hdr += bytes([sz.K_END, sz.K_END])
    hdr += bytes([sz.K_FILES_INFO]) + sz.write_number(1)
    names = bytearray([0]) + "f.bin".encode("utf-16-le") + b"\x00\x00"
    hdr += bytes([sz.K_NAME]) + sz.write_number(len(names)) + names
    hdr += bytes([sz.K_END, sz.K_END])
    arc = _write_archive(tmp_path, packed, bytes(hdr))
    with pytest.raises(QzError):
        sz.extract_7z(str(arc), str(tmp_path / "o"))


def _empty_file_archive(tmp_path, name: str):
    """Archive holding a single empty file with an arbitrary name."""
    hdr = bytearray([sz.K_HEADER, sz.K_FILES_INFO]) + sz.write_number(1)
    hdr += bytes([sz.K_EMPTY_STREAM]) + sz.write_number(1) + b"\x80"
    hdr += bytes([sz.K_EMPTY_FILE]) + sz.write_number(1) + b"\x80"
    names = bytearray([0]) + name.encode("utf-16-le") + b"\x00\x00"
    hdr += bytes([sz.K_NAME]) + sz.write_number(len(names)) + names
    hdr += bytes([sz.K_END, sz.K_END])
    return _write_archive(tmp_path, b"", bytes(hdr))


def test_zip_slip_dotdot_rejected(tmp_path):
    arc = _empty_file_archive(tmp_path, "../evil.txt")
    dest = tmp_path / "dest"
    with pytest.raises(QzError):
        sz.extract_7z(str(arc), str(dest))
    assert not (tmp_path / "evil.txt").exists()


def test_zip_slip_absolute_rejected(tmp_path):
    arc = _empty_file_archive(tmp_path, "/tmp/evil-absolute.txt")
    with pytest.raises(QzError):
        sz.extract_7z(str(arc), str(tmp_path / "dest"))
    assert not os.path.exists("/tmp/evil-absolute.txt")


def test_write_through_symlinked_parent_refused(tmp_path):
    """A symlink (pre-existing or extracted) must not redirect writes
    outside the destination."""
    outside = tmp_path / "outside"
    outside.mkdir()
    dest = tmp_path / "dest"
    dest.mkdir()
    (dest / "link").symlink_to(outside)
    arc = _empty_file_archive(tmp_path, "link/inner.txt")
    with pytest.raises(QzError):
        sz.extract_7z(str(arc), str(dest))
    assert not (outside / "inner.txt").exists()


def test_symlinks_created_last(tmp_path):
    """Symlink entries are deferred so a link cannot hijack a later file
    write within the same archive."""
    src = tmp_path / "tree"
    src.mkdir()
    (src / "a.txt").write_bytes(b"hello" * 100)
    (src / "lnk").symlink_to("a.txt")
    arc = tmp_path / "t.7z"
    sz.create_7z([str(src)], str(arc))
    out = tmp_path / "out"
    sz.extract_7z(str(arc), str(out))
    assert (out / "tree" / "a.txt").read_bytes() == b"hello" * 100
    assert os.path.islink(out / "tree" / "lnk")


def test_truncated_header_is_qzerror(tmp_path):
    """Corrupt/truncated end headers must raise QzError, not IndexError
    (ADVICE.md low finding)."""
    src = tmp_path / "f.bin"
    src.write_bytes(os.urandom(4096))
    arc = tmp_path / "t.7z"
    sz.create_7z([str(src)], str(arc))
    blob = bytearray(open(arc, "rb").read())
    # truncate the end header but fix up the signature so the CRC passes
    hdr_off, hdr_sz, _ = struct.unpack_from("<QQI", blob, 12)
    cut = hdr_sz // 2
    hdr = bytes(blob[32 + hdr_off:32 + hdr_off + cut])
    start = struct.pack("<QQI", hdr_off, cut, zlib.crc32(hdr) & 0xFFFFFFFF)
    out = blob[:6 + 2] + struct.pack(
        "<I", zlib.crc32(start) & 0xFFFFFFFF) + start \
        + blob[32:32 + hdr_off + cut]
    bad = tmp_path / "bad.7z"
    bad.write_bytes(bytes(out))
    with pytest.raises(QzError):
        sz.extract_7z(str(bad), str(tmp_path / "o"))
    with pytest.raises(QzError):
        sz.list_7z(str(bad))


def test_encoded_header_roundtrip(tmp_path):
    src = tmp_path / "tree"
    src.mkdir()
    (src / "x.bin").write_bytes(os.urandom(20000))
    (src / "y.txt").write_bytes(b"text " * 4000)
    arc = tmp_path / "enc.7z"
    sz.create_7z([str(src)], str(arc), encode_header=True)
    names = {f["name"] for f in sz.list_7z(str(arc))}
    assert "tree/x.bin" in names and "tree/y.txt" in names
    out = tmp_path / "out"
    sz.extract_7z(str(arc), str(out))
    assert (out / "tree" / "x.bin").read_bytes() == (src / "x.bin").read_bytes()
    assert (out / "tree" / "y.txt").read_bytes() == (src / "y.txt").read_bytes()

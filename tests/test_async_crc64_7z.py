"""Tests for the async engine, CRC64/metadata APIs, 7z container and CLIs."""

import os
import threading
import zlib

import pytest

os.environ.setdefault("QZTPU_FORCE_SW", "0")

from qatzip_tpu import (  # noqa: E402
    QzSession, QzError, params as P,
    AQzSession, aqz_init, aqz_stop, AQZ_OK,
    Crc64, Crc64Config, qz_compress_crc64, qz_decompress_crc64,
    qz_set_session_crc64_config, qz_get_session_crc64_config,
    qz_allocate_metadata, qz_metadata_block_read, qz_metadata_block_write,
    qz_compress_with_metadata,
)
from qatzip_tpu.constants import QZ_OK, QZ_OUT_OF_RANGE  # noqa: E402


# --- async engine -----------------------------------------------------------

def test_async_compress_ordered_callbacks():
    assert aqz_init(num_threads=2) == QZ_OK
    try:
        sess = AQzSession()
        sess.setup_deflate()
        data = [(b"piece-%d " % i) * 500 for i in range(16)]
        results = {}
        done = threading.Event()

        def cb(external, src, dest, rc, crc):
            results[external] = (rc, dest, crc)
            if len(results) == len(data):
                done.set()

        for i, piece in enumerate(data):
            assert sess.compress(piece, cb, external=i) == AQZ_OK
        # generous window: a cold XLA cache compiles the batched device
        # graph inside the wait (~90-130s on a busy 4-core host)
        assert done.wait(timeout=300)
        blob = b"".join(results[i][1] for i in range(len(data)))
        # multi-member gzip decodes through a plain session
        d = QzSession()
        d.setup_deflate()
        assert d.decompress(blob) == b"".join(data)
        for i, piece in enumerate(data):
            assert results[i][0] == QZ_OK
            assert results[i][2] == (zlib.crc32(piece) & 0xFFFFFFFF)
    finally:
        aqz_stop()


def test_async_decompress_and_no_space():
    from qatzip_tpu.async_engine import AQzRuntime, _Request
    from qatzip_tpu.constants import Direction

    rt = AQzRuntime()
    assert rt.init(num_threads=1, ring_depth=2) == QZ_OK
    try:
        sess = QzSession()
        sess.setup_deflate()
        comp = sess.compress(b"hello async world " * 100)
        got = {}
        ev = threading.Event()

        def cb(external, src, dest, rc, crc):
            got["out"] = (rc, dest)
            ev.set()

        rc = rt.submit(_Request(seq=0, session=sess,
                                direction=Direction.DIR_DECOMPRESS,
                                src=comp, callback=cb, external=None))
        assert rc == AQZ_OK
        assert ev.wait(timeout=30)
        assert got["out"][0] == QZ_OK
        assert got["out"][1] == b"hello async world " * 100
    finally:
        rt.stop()


# --- crc64 / metadata -------------------------------------------------------

def test_crc64_check_vectors():
    assert Crc64()(b"123456789") == 0x6C40DF5F0B497347  # CRC-64/ECMA-182
    xz = Crc64(Crc64Config(initial_value=(1 << 64) - 1, reflect_in=True,
                           reflect_out=True, xor_out=(1 << 64) - 1))
    assert xz(b"123456789") == 0x995DC9BBDF1939FA       # CRC-64/XZ


def test_session_crc64_roundtrip():
    sess = QzSession()
    sess.setup_deflate()
    cfg = qz_get_session_crc64_config(sess)
    assert cfg.polynomial == 0x42F0E1EBA9EA3693
    assert qz_set_session_crc64_config(
        sess, Crc64Config(initial_value=(1 << 64) - 1, reflect_in=True,
                          reflect_out=True, xor_out=(1 << 64) - 1)) == QZ_OK
    data = b"crc64 payload " * 300
    rc, out, crc = qz_compress_crc64(sess, data)
    assert rc == QZ_OK and crc == Crc64(qz_get_session_crc64_config(sess))(data)
    d = QzSession()
    d.setup_deflate()
    rc, dec, _dcrc = qz_decompress_crc64(d, out)
    assert rc == QZ_OK and dec == data


def test_metadata_blocks():
    data = (b"meta " * 40000)  # ~200KB → 4 chunks at 64KB
    md = qz_allocate_metadata(len(data), 64 * 1024)
    assert len(md.blocks) == 4
    sess = QzSession()
    sess.setup_deflate()
    rc, out = qz_compress_with_metadata(sess, data, md)
    assert rc == QZ_OK
    total = 0
    from qatzip_tpu.ops import xxh32
    for i in range(4):
        off, size, flags, h = qz_metadata_block_read(i, md)
        assert flags == 1 and size > 0
        assert h == xxh32(data[i * 65536:(i + 1) * 65536])
        total += size
    assert total == len(out)
    assert qz_metadata_block_write(1, md, block_flags=0) == QZ_OK
    assert qz_metadata_block_read(1, md)[2] == 0
    with pytest.raises(QzError):
        qz_metadata_block_read(99, md)


# --- 7z container -----------------------------------------------------------

def test_7z_roundtrip(tmp_path):
    from qatzip_tpu.formats.sevenzip import create_7z, extract_7z, list_7z

    src = tmp_path / "src"
    (src / "sub").mkdir(parents=True)
    (src / "a.txt").write_bytes(b"alpha " * 1000)
    (src / "sub" / "b.bin").write_bytes(bytes(range(256)) * 50)
    (src / "empty.txt").write_bytes(b"")

    arc = tmp_path / "t.7z"
    sess = QzSession()
    sess.setup_deflate()
    create_7z([str(src)], str(arc), sess)

    names = {f["name"] for f in list_7z(str(arc))}
    assert {"src", "src/a.txt", "src/sub", "src/sub/b.bin",
            "src/empty.txt"} <= names

    out = tmp_path / "out"
    out.mkdir()
    extract_7z(str(arc), str(out))
    assert (out / "src" / "a.txt").read_bytes() == b"alpha " * 1000
    assert (out / "src" / "sub" / "b.bin").read_bytes() == bytes(range(256)) * 50
    assert (out / "src" / "empty.txt").read_bytes() == b""


def test_7z_crc_detects_corruption(tmp_path):
    from qatzip_tpu.formats.sevenzip import create_7z, extract_7z

    f = tmp_path / "x.dat"
    f.write_bytes(b"payload " * 5000)
    arc = tmp_path / "x.7z"
    create_7z([str(f)], str(arc))
    blob = bytearray(arc.read_bytes())
    blob[40] ^= 0xFF  # flip a byte inside the packed stream
    arc.write_bytes(bytes(blob))
    out = tmp_path / "o"
    out.mkdir()
    with pytest.raises(QzError):
        extract_7z(str(arc), str(out))


# --- CLIs (in-process) ------------------------------------------------------

def test_qzip_cli_roundtrip(tmp_path, monkeypatch):
    from qatzip_tpu.cli import qzip as cli

    monkeypatch.chdir(tmp_path)
    p = tmp_path / "f.txt"
    p.write_bytes(b"cli round trip " * 4000)
    assert cli.main(["-k", str(p)]) == 0
    gz = tmp_path / "f.txt.gz"
    assert gz.exists()
    import gzip as _gz
    assert _gz.decompress(gz.read_bytes()) == b"cli round trip " * 4000
    p.unlink()
    assert cli.main(["-d", str(gz)]) == 0
    assert p.read_bytes() == b"cli round trip " * 4000


def test_qzstd_cli_roundtrip(tmp_path):
    from qatzip_tpu.cli import qzstd as cli

    p = tmp_path / "z.txt"
    p.write_bytes(b"zstd bridge " * 9000)
    assert cli.main(["-k", str(p)]) == 0
    z = tmp_path / "z.txt.zst"
    assert z.exists()
    p.unlink()
    assert cli.main(["-d", str(z)]) == 0
    assert p.read_bytes() == b"zstd bridge " * 9000


def test_qztest_driver_modes():
    import subprocess
    import sys
    env = dict(os.environ, QZTPU_FORCE_SW="1")
    # all 22 reference modes (test/main.c:4115-4185); 1 and 3 print the
    # reference's removed-mode message and exit 0
    for mode in [str(m) for m in range(1, 24)]:   # 23 = batching ext
        r = subprocess.run(
            [sys.executable, "tools/qztest.py", "-m", mode, "-t", "2",
             "-l", "3", "-b", "16384", "-v"],
            capture_output=True, text=True, timeout=300, env=env,
            cwd=os.path.join(os.path.dirname(__file__), ".."))
        assert r.returncode == 0, f"mode {mode}: {r.stdout} {r.stderr}"
        if mode in ("1", "3"):
            assert "has been removed" in r.stderr


def test_async_chain_compress_and_hash():
    import hashlib
    assert aqz_init(num_threads=1) == QZ_OK
    try:
        sess = AQzSession()
        sess.setup_deflate()
        data = b"chain me " * 1000
        got = {}
        ev = threading.Event()

        def cb(external, src, dest, rc, crc, digest):
            got[external] = (rc, dest, digest)
            if len(got) == 2:
                ev.set()

        assert sess.chain_compress(data, cb, external="chain") == 0
        assert sess.hash(data, cb, external="hash") == 0
        # generous: first-compile storms elsewhere in the suite can starve
        # the single async worker for minutes on a loaded CI box
        assert ev.wait(timeout=300)
        rc, dest, digest = got["chain"]
        assert rc == QZ_OK and digest == hashlib.sha256(data).digest()
        d = QzSession()
        d.setup_deflate()
        assert d.decompress(dest) == data
        rc, dest, digest = got["hash"]
        assert rc == QZ_OK and dest == b""
        assert digest == hashlib.sha256(data).digest()
    finally:
        aqz_stop()


def test_config_file_section(tmp_path, monkeypatch):
    from qatzip_tpu import config as C
    from qatzip_tpu import params as P

    conf = tmp_path / "qztpu.conf"
    conf.write_text(
        "[SHIM]\nhw_buff_sz = 32768\ncomp_lvl = 4\n"
        "[SMALL]\nhw_buff_sz = 16384\n")
    monkeypatch.setenv("QZTPU_CONF", str(conf))
    p = P.get_defaults("deflate")
    assert p.common.hw_buff_sz == 32768 and p.common.comp_lvl == 4
    monkeypatch.setenv("QZTPU_SECTION_NAME", "SMALL")
    p = P.get_defaults("deflate")
    assert p.common.hw_buff_sz == 16384
    monkeypatch.delenv("QZTPU_SECTION_NAME")
    # config must produce valid sessions end-to-end
    monkeypatch.setenv("QZTPU_FORCE_SW", "1")
    s = QzSession()
    s.setup_deflate()
    data = b"configured " * 500
    assert s.decompress(s.compress(data)) == data


def test_qzip_cli_zstd_roundtrip(tmp_path):
    from qatzip_tpu.cli import qzip as cli

    p = tmp_path / "w.txt"
    p.write_bytes(b"zstd via qzip " * 5000)
    assert cli.main(["-A", "zstd", "-k", str(p)]) == 0
    z = tmp_path / "w.txt.zst"
    assert z.exists()
    p.unlink()
    assert cli.main(["-d", str(z)]) == 0
    assert p.read_bytes() == b"zstd via qzip " * 5000


def test_7z_symlinks_and_multifolder(tmp_path):
    from qatzip_tpu.formats.sevenzip import create_7z, extract_7z

    src = tmp_path / "tree"
    src.mkdir()
    (src / "a.bin").write_bytes(b"A" * 30000)
    (src / "b.bin").write_bytes(b"B" * 30000)
    (src / "c.bin").write_bytes(b"C" * 30000)
    os.symlink("a.bin", src / "lnk")
    arc = tmp_path / "m.7z"
    # tiny folder limit → forces 3 folders
    create_7z([str(src)], str(arc), folder_limit=40000)
    out = tmp_path / "out"
    out.mkdir()
    extract_7z(str(arc), str(out))
    assert (out / "tree" / "a.bin").read_bytes() == b"A" * 30000
    assert (out / "tree" / "b.bin").read_bytes() == b"B" * 30000
    assert (out / "tree" / "c.bin").read_bytes() == b"C" * 30000
    assert os.path.islink(out / "tree" / "lnk")
    assert os.readlink(out / "tree" / "lnk") == "a.bin"
    # symlink resolves to the extracted file
    assert (out / "tree" / "lnk").read_bytes() == b"A" * 30000


def test_7z_reads_lzma_folder(tmp_path):
    """Stock 7-Zip writes LZMA folders — handcraft one and verify the
    reader's LZMA1 coder path (PARITY: stock-archive reading)."""
    import lzma
    import struct
    import zlib as _z
    from qatzip_tpu.formats import sevenzip as sz

    data = b"stock seven zip lzma payload " * 1000
    filt = [{"id": lzma.FILTER_LZMA1, "preset": 6}]
    comp = lzma.LZMACompressor(lzma.FORMAT_ALONE, filters=filt)
    alone = comp.compress(data) + comp.flush()
    props, packed = alone[:5], alone[13:]  # strip .lzma header (5B props + 8B size)

    hdr = bytearray([sz.K_HEADER, sz.K_MAIN_STREAMS, sz.K_PACK_INFO])
    hdr += sz.write_number(0) + sz.write_number(1)
    hdr += bytes([sz.K_SIZE]) + sz.write_number(len(packed))
    hdr += bytes([sz.K_END, sz.K_UNPACK_INFO, sz.K_FOLDER])
    hdr += sz.write_number(1) + bytes([0])
    hdr += sz.write_number(1)
    hdr += bytes([0x20 | len(sz.CODEC_LZMA1)]) + sz.CODEC_LZMA1  # has props
    hdr += sz.write_number(len(props)) + props
    hdr += bytes([sz.K_CODERS_UNPACK_SIZE]) + sz.write_number(len(data))
    hdr += bytes([sz.K_END, sz.K_SUBSTREAMS_INFO, sz.K_NUM_UNPACK_STREAM])
    hdr += sz.write_number(1)
    hdr += bytes([sz.K_CRC, 1]) + struct.pack("<I", _z.crc32(data))
    hdr += bytes([sz.K_END, sz.K_END])
    # FilesInfo: one file
    hdr += bytes([sz.K_FILES_INFO]) + sz.write_number(1)
    names = bytearray([0]) + "payload.bin".encode("utf-16-le") + b"\x00\x00"
    hdr += bytes([sz.K_NAME]) + sz.write_number(len(names)) + names
    hdr += bytes([sz.K_END, sz.K_END])

    start = struct.pack("<QQI", len(packed), len(hdr),
                        _z.crc32(bytes(hdr)) & 0xFFFFFFFF)
    arc = tmp_path / "lzma.7z"
    with open(arc, "wb") as fh:
        fh.write(sz.MAGIC + sz.VERSION
                 + struct.pack("<I", _z.crc32(start) & 0xFFFFFFFF) + start)
        fh.write(packed)
        fh.write(bytes(hdr))

    out = tmp_path / "o"
    out.mkdir()
    sz.extract_7z(str(arc), str(out))
    assert (out / "payload.bin").read_bytes() == data

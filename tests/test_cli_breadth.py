"""CLI and streaming breadth tests (recursive dirs, static Huffman,
async decompress, LZ4 streaming, 4B format CLI)."""

import gzip as _gzip
import os
import zlib

import pytest


def test_qzip_recursive_dir(tmp_path):
    from qatzip_tpu.cli import qzip as cli

    d = tmp_path / "t"
    (d / "sub").mkdir(parents=True)
    (d / "a.txt").write_bytes(b"alpha " * 2000)
    (d / "sub" / "b.txt").write_bytes(b"beta " * 2000)
    assert cli.main(["-R", "-k", str(d)]) == 0
    assert (d / "a.txt.gz").exists() and (d / "sub" / "b.txt.gz").exists()
    assert _gzip.decompress((d / "a.txt.gz").read_bytes()) == b"alpha " * 2000
    # recursive decompress (deletes .gz, restores originals)
    (d / "a.txt").unlink()
    (d / "sub" / "b.txt").unlink()
    assert cli.main(["-R", "-d", "-f", str(d)]) == 0
    assert (d / "a.txt").read_bytes() == b"alpha " * 2000
    assert (d / "sub" / "b.txt").read_bytes() == b"beta " * 2000


def test_qzip_static_huffman_flag(tmp_path):
    from qatzip_tpu.cli import qzip as cli

    p = tmp_path / "s.txt"
    p.write_bytes(b"static huffman " * 3000)
    assert cli.main(["-H", "static", "-k", str(p)]) == 0
    blob = (tmp_path / "s.txt.gz").read_bytes()
    assert _gzip.decompress(blob) == b"static huffman " * 3000


def test_qzip_deflate_4b_format(tmp_path):
    from qatzip_tpu.cli import qzip as cli
    from qatzip_tpu import QzSession, params as P
    from qatzip_tpu.constants import DataFormat

    p = tmp_path / "q.bin"
    p.write_bytes(b"fourbyte " * 4000)
    assert cli.main(["-O", "deflate_4B", "-k", "-o",
                     str(tmp_path / "q.4b"), str(p)]) == 0
    params = P.get_defaults("deflate")
    params.data_fmt = DataFormat.DEFLATE_4B
    s = QzSession()
    s.setup_deflate(params)
    assert s.decompress((tmp_path / "q.4b").read_bytes()) == b"fourbyte " * 4000


def test_aqzip_cli_decompress(tmp_path):
    from qatzip_tpu.cli import aqzip as cli

    p = tmp_path / "a.dat"
    data = b"async round trip " * 5000
    p.write_bytes(data)
    assert cli.main(["-k", "-C", "16384", str(p)]) == 0
    gz = tmp_path / "a.dat.gz"
    assert gz.exists()
    p.unlink()
    assert cli.main(["-d", "-k", "-C", "16384", str(gz)]) == 0
    assert p.read_bytes() == data


def test_lz4_streaming_session():
    from qatzip_tpu import QzSession, QzStream, params as P

    data = os.urandom(10000) + b"compressible tail " * 2000
    sess = QzSession()
    sess.setup_lz4(P.get_defaults("lz4"))
    strm = QzStream(sess, strm_buff_sz=8192)
    out = bytearray()
    for off in range(0, len(data), 3000):
        out += strm.compress(data[off:off + 3000],
                             last=off + 3000 >= len(data))
    strm.end()
    d = QzSession()
    d.setup_lz4(P.get_defaults("lz4"))
    dstrm = QzStream(d)
    dec = bytearray()
    comp = bytes(out)
    for off in range(0, len(comp), 4096):
        dec += dstrm.decompress(comp[off:off + 4096],
                                last=off + 4096 >= len(comp))
    assert bytes(dec) == data


def test_qzip_block_device_input(tmp_path):
    """Block-device inputs stream through qzip like the reference's
    BLKGETSIZE path (utils/qzip.c:279-286); the device node is kept."""
    import shutil
    import subprocess
    import pytest
    if os.geteuid() != 0 or not shutil.which("losetup"):
        pytest.skip("needs root + losetup")
    img = tmp_path / "blk.img"
    img.write_bytes(os.urandom(256 * 1024))
    r = subprocess.run(["losetup", "-f"], capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip("no free loop device")
    dev = r.stdout.strip()
    if subprocess.run(["losetup", dev, str(img)]).returncode != 0:
        pytest.skip("cannot attach loop device")
    try:
        from qatzip_tpu.cli import qzip as cli
        out = tmp_path / "blk.gz"
        assert cli.main(["-o", str(out), dev]) == 0
        import gzip as _gz
        assert _gz.decompress(out.read_bytes()) == img.read_bytes()
        assert os.path.exists(dev)      # node not unlinked despite no -k
    finally:
        subprocess.run(["losetup", "-d", dev])


def test_qzip_truncated_member_is_data_error(tmp_path, capsys):
    """A recognized magic with no decodable member reports a DATA error
    (stock gzip's "unexpected end of file"), not an unknown format."""
    from qatzip_tpu.cli import qzip as cli

    full = _gzip.compress(b"payload " * 4000, 1)
    t = tmp_path / "t.gz"
    t.write_bytes(full[: len(full) // 2])
    assert cli.main(["-d", "-o", str(tmp_path / "t.out"), str(t)]) == 1
    err = capsys.readouterr().err
    assert "unexpected end of input" in err
    assert not (tmp_path / "t.out").exists()   # no partial output
    # garbage without a known magic still reports unsupported format
    j = tmp_path / "j.gz"
    j.write_bytes(b"\x00\x01\x02garbage")
    assert cli.main(["-d", "-o", str(tmp_path / "j.out"), str(j)]) == 1

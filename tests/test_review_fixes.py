"""Regression tests for code-review findings."""

import zlib

import numpy as np
import pytest


def test_large_hw_buff_session_on_engine():
    """hw_buff_sz > 64 KiB must work on the accelerated path (chunks are
    split into device rows and payloads joined into one raw stream)."""
    import jax
    from qatzip_tpu import QzSession, params as P
    from qatzip_tpu.parallel.dispatch import TpuEngine

    rng = np.random.default_rng(5)
    blob = (b"large chunk config " * 9000
            + bytes(rng.integers(0, 256, 30000, dtype=np.uint8)))  # ~200KB
    params = P.get_defaults("deflate")
    params.common.hw_buff_sz = 131072
    sess = QzSession()
    sess.setup_deflate(params)
    sess._engine = TpuEngine(jax.devices(), "deflate")
    out = sess.compress(blob)
    # stock zlib multi-member decode
    pieces, pos = [], 0
    while pos < len(out):
        do = zlib.decompressobj(31)
        pieces.append(do.decompress(out[pos:]) + do.flush())
        used = len(out) - pos - len(do.unused_data)
        assert used > 0
        pos += used
    assert b"".join(pieces) == blob
    d = QzSession()
    d.setup_deflate(P.get_defaults("deflate"))
    assert d.decompress(out) == blob


def test_auto_select_best_lz4s_mini_match():
    """QZ_AUTO_SELECT_BEST must re-encode LZ4s with the session's
    mini_match (4), not the default 3."""
    from qatzip_tpu import QzSession, params as P
    from qatzip_tpu.constants import QZ_AUTO_SELECT_BEST
    from qatzip_tpu import native

    if native.lib is None:
        pytest.skip("native lib unavailable")
    data = b"mini match four " * 2000
    params = P.get_defaults("lz4s")
    params.lz4s_mini_match = 4
    params.common.sw_backup = QZ_AUTO_SELECT_BEST
    sess = QzSession()
    sess.setup_lz4s(params)
    out = sess.compress(data)
    # decode the lz4s block stream with mini_match=4 — wrong base would
    # corrupt the reconstruction
    import struct
    pos = 0
    rec = bytearray()
    while pos + 4 <= len(out):
        (blk,) = struct.unpack_from("<I", out, pos)
        pos += 4
        ll, mm, oo = native.lib.lz4s_decode_block(out[pos:pos + blk], 4)
        for li, mi, oi in zip(ll.tolist(), mm.tolist(), oo.tolist()):
            rec += data[len(rec):len(rec) + li]
            if mi:
                st = len(rec) - oi
                for k in range(mi):
                    rec.append(rec[st + k])
        pos += blk
    assert bytes(rec) == data


def test_qzip_recursive_zst_suffix_skip(tmp_path):
    """qzip -R must not re-compress .zst outputs and must decompress
    them on -R -d."""
    from qatzip_tpu.cli import qzip as cli

    d = tmp_path / "t"
    d.mkdir()
    (d / "x.txt").write_bytes(b"zst suffix " * 2000)
    assert cli.main(["-A", "zstd", "-R", "-k", str(d)]) == 0
    assert (d / "x.txt.zst").exists()
    assert not (d / "x.txt.zst.gz").exists()
    # second recursive compress run must skip the .zst entirely
    (d / "x.txt").unlink()
    assert cli.main(["-A", "zstd", "-R", "-k", str(d)]) == 0
    assert not (d / "x.txt.zst.zst").exists()
    assert not (d / "x.txt.zst.gz").exists()
    assert cli.main(["-R", "-d", "-f", str(d)]) == 0
    assert (d / "x.txt").read_bytes() == b"zst suffix " * 2000


def test_aqzip_decompress_multi_member(tmp_path):
    """aqzip -d must handle .gz files whose members straddle any chunk
    size (whole-file decompress requests)."""
    from qatzip_tpu.cli import aqzip as cli
    import os

    rng = np.random.default_rng(11)
    data = bytes(rng.integers(0, 256, 300000, dtype=np.uint8))  # incompressible
    p = tmp_path / "big.dat"
    p.write_bytes(data)
    assert cli.main(["-k", "-C", "65536", str(p)]) == 0
    gz = tmp_path / "big.dat.gz"
    assert gz.exists() and gz.stat().st_size > 150000  # many large members
    p.unlink()
    assert cli.main(["-d", "-k", "-C", "65536", str(gz)]) == 0
    assert p.read_bytes() == data
    # unknown suffix in decompress mode is refused, not inverted to .gz
    bad = tmp_path / "notgz.bin"
    bad.write_bytes(b"x")
    assert cli.main(["-d", str(bad)]) == 1


def test_trace_utility_captures_profile(tmp_path):
    """qz_trace wraps jax.profiler; stage() feeds the service counters
    (the reference's QZ_DEBUG timers + dumpCounters analog, SURVEY §5)."""
    import os
    import qatzip_tpu as qz
    from qatzip_tpu.utils.trace import qz_trace, stage
    from qatzip_tpu.utils.debug import get_counters

    d = tmp_path / "prof"
    data = b"trace me " * 5000
    with qz_trace(str(d)):
        with stage("unit_compress"):
            s = qz.QzSession()
            s.setup_deflate()
            blob = s.compress(data)
    assert s.decompress(blob) == data
    # a profile artifact was produced
    found = []
    for root, _dirs, files in os.walk(d):
        found.extend(files)
    assert found, "no trace files written"
    snap = get_counters().snapshot()
    total = {}
    for c in snap.values():
        for k, v in c.items():
            total[k] = total.get(k, 0) + v
    assert total.get("stage_unit_compress", 0) >= 1
    assert total.get("stage_unit_compress_us", 0) > 0

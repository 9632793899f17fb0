"""LZ4s sessions + the lz4s→zstd post-process bridge (qzstd analog).

Reference: utils/qzstd.c — LZ4S_BK session + zstdCallBack post-process, and
the declared callback hook qzLZ4SCallbackFn (include/qatzip.h:447-449).
"""

import pytest

import qatzip_tpu as qz
from qatzip_tpu import params as P
from qatzip_tpu import native
from qatzip_tpu.constants import QZ_OK


needs_native = pytest.mark.skipif(native.lib is None,
                                  reason="native library unavailable")


def zstd_callback(external, src, lz4s_blocks, mini_match):
    """The qzstd zstdCallBack analog backed by ZSTD_compressSequences."""
    return native.lib.zstd_post_process(src, lz4s_blocks, mini_match)


def make_lz4s_sess(mini_match=3, callback=None):
    s = qz.QzSession()
    p = P.SessionParamsLZ4S(lz4s_mini_match=mini_match, qzCallback=callback)
    assert s.setup_lz4s(p) == QZ_OK
    return s


class TestLZ4SBlocks:
    @needs_native
    @pytest.mark.parametrize("mm", [3, 4])
    def test_lz4s_decode_content_total(self, corpus, mm):
        data = corpus["text"][:65536]
        blob = native.lib.lz4s_compress_block(data, mm)
        ll, ml, oo = native.lib.lz4s_decode_block(blob, mm)
        assert int(ll.sum() + ml.sum()) == len(data)
        assert (oo[ml > 0] > 0).all()
        # reconstruct by replay
        out = bytearray()
        pos = 0
        for l, m, o in zip(ll.tolist(), ml.tolist(), oo.tolist()):
            out += data[pos:pos + l]
            pos += l
            if m:
                start = len(out) - o
                for k in range(m):
                    out.append(out[start + k])
                pos += m
        assert bytes(out) == data

    @needs_native
    def test_session_lz4s_block_stream(self, corpus):
        s = make_lz4s_sess()
        blob = s.compress(corpus["json"])
        # walk [size][payload] framing
        import struct
        pos = 0
        total = 0
        while pos < len(blob):
            (sz,) = struct.unpack_from("<I", blob, pos)
            pos += 4 + sz
            total += 1
        assert pos == len(blob) and total >= 1


class TestZstdBridge:
    @needs_native
    @pytest.mark.parametrize("mm", [3, 4])
    def test_post_process_roundtrip(self, corpus, mm):
        data = corpus["text"]
        s = make_lz4s_sess(mini_match=mm, callback=zstd_callback)
        zframe = s.compress(data)
        out = native.lib.zstd_decompress(zframe, len(data) + 16)
        assert out == data

    @needs_native
    def test_zstd_ratio_sane(self, corpus):
        data = corpus["text"]
        s = make_lz4s_sess(callback=zstd_callback)
        zframe = s.compress(data)
        assert len(zframe) < len(data) // 2

    @needs_native
    def test_stock_zstd_cli_if_present(self, corpus, tmp_path):
        import shutil, subprocess
        if shutil.which("zstd") is None:
            pytest.skip("no zstd CLI")
        data = corpus["json"]
        s = make_lz4s_sess(callback=zstd_callback)
        zframe = s.compress(data)
        f = tmp_path / "x.zst"
        f.write_bytes(zframe)
        out = subprocess.run(["zstd", "-d", "-c", str(f)],
                             capture_output=True)
        assert out.returncode == 0 and out.stdout == data


def test_zstd_frames_decode_with_thirdparty_zstandard():
    """Our lz4s→zstd bridge output must decode with the independent
    `zstandard` binding (stock-tool cross-validation)."""
    zstd = pytest.importorskip("zstandard")
    from qatzip_tpu import QzSession, params as P
    from qatzip_tpu.postproc import zstd_callback

    data = (b"cross validate me with stock zstd " * 3000)
    params = P.get_defaults("lz4s")
    params.qzCallback = zstd_callback
    sess = QzSession()
    sess.setup_lz4s(params)
    frames = sess.compress(data)
    dctx = zstd.ZstdDecompressor()
    out = bytearray()
    pos = 0
    # frames may be concatenated — stream-decode them all
    reader = dctx.decompressobj()
    out = reader.decompress(frames)
    while reader.unused_data:
        rest = reader.unused_data
        reader = dctx.decompressobj()
        out += reader.decompress(rest)
    assert bytes(out) == data

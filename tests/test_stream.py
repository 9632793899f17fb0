"""Streaming API tests (reference test/main.c -m 9..16 streaming modes)."""

import gzip
import zlib

import pytest

import qatzip_tpu as qz
from qatzip_tpu import params as P
from qatzip_tpu.constants import DataFormat, QZ_OK


def make_sess(fmt=DataFormat.DEFLATE_GZIP_EXT, strm_buff_sz=64 * 1024):
    s = qz.QzSession()
    assert s.setup_deflate(P.SessionParamsDeflate(
        common=P.SessionParamsCommon(strm_buff_sz=strm_buff_sz),
        data_fmt=fmt)) == QZ_OK
    return s


def feed(strm, data, piece, last_tail=True, op="compress"):
    out = bytearray()
    fn = getattr(strm, op)
    for off in range(0, len(data), piece):
        out += fn(data[off:off + piece])
    out += fn(b"", last=True)
    return bytes(out)


class TestCompressStream:
    @pytest.mark.parametrize("piece", [1000, 4096, 100_000])
    def test_piecemeal_compress(self, corpus, piece):
        data = corpus["text"]
        s = make_sess()
        strm = qz.QzStream(s)
        blob = feed(strm, data, piece)
        assert gzip.decompress(blob) == data
        assert strm.crc_32 == zlib.crc32(data)
        assert strm.end() == QZ_OK

    def test_small_strm_buff_many_members(self, corpus):
        data = corpus["json"]
        s = make_sess(strm_buff_sz=8 * 1024)
        strm = qz.QzStream(s)
        blob = feed(strm, data, 3000)
        from qatzip_tpu.formats import scan_members
        assert len(scan_members(blob, DataFormat.DEFLATE_GZIP_EXT)) >= 2
        assert gzip.decompress(blob) == data

    def test_raw_stream_single_deflate_stream(self, corpus):
        data = corpus["binary"]
        s = make_sess(DataFormat.DEFLATE_RAW)
        strm = qz.QzStream(s)
        blob = feed(strm, data, 10_000)
        assert zlib.decompress(blob, -15) == data
        assert strm.crc_32 == zlib.crc32(data)

    def test_empty_stream(self):
        s = make_sess()
        strm = qz.QzStream(s)
        blob = strm.compress(b"", last=True)
        assert gzip.decompress(blob) == b""


class TestDecompressStream:
    @pytest.mark.parametrize("piece", [777, 16 * 1024])
    def test_piecemeal_decompress(self, corpus, piece):
        data = corpus["text"]
        s = make_sess()
        blob = s.compress(data)
        d = make_sess()
        strm = qz.QzStream(d)
        out = feed(strm, blob, piece, op="decompress")
        assert out == data

    def test_pending_member_carry(self, corpus):
        """A split mid-member must produce nothing until it completes."""
        data = corpus["one_chunk"]
        s = make_sess()
        blob = s.compress(data)
        d = make_sess()
        strm = qz.QzStream(d)
        half = len(blob) // 2
        assert strm.decompress(blob[:half]) == b""
        assert strm.decompress(blob[half:], last=True) == data

    def test_raw_decompress_stream(self, corpus):
        data = corpus["json"]
        s = make_sess(DataFormat.DEFLATE_RAW)
        blob = s.compress(data)
        d = make_sess(DataFormat.DEFLATE_RAW)
        strm = qz.QzStream(d)
        out = feed(strm, blob, 5000, op="decompress")
        assert out == data

    def test_compress_then_decompress_streams(self, corpus):
        data = corpus["binary"]
        cs = qz.QzStream(make_sess())
        blob = feed(cs, data, 7000)
        ds = qz.QzStream(make_sess())
        assert feed(ds, blob, 1234, op="decompress") == data

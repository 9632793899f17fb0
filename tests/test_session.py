"""Session API round-trips (the -m 4 qzCompressAndDecompress analog) plus
param validation, level semantics, SW gating and cross-tool verification."""

import gzip
import zlib

import pytest

import qatzip_tpu as qz
from qatzip_tpu import params as P
from qatzip_tpu.constants import DataFormat, QZ_OK, QZ_PARAMS, HuffmanHdr


def make_sess(fmt=DataFormat.DEFLATE_GZIP_EXT, level=1, algo="deflate",
              hw_buff_sz=64 * 1024, threshold=1024):
    s = qz.QzSession()
    common = P.SessionParamsCommon(comp_lvl=level, hw_buff_sz=hw_buff_sz,
                                   input_sz_thrshold=threshold)
    if algo == "deflate":
        assert s.setup_deflate(P.SessionParamsDeflate(common=common,
                                                      data_fmt=fmt)) == QZ_OK
    elif algo == "lz4":
        assert s.setup_lz4(P.SessionParamsLZ4(common=common)) == QZ_OK
    elif algo == "lz4s":
        assert s.setup_lz4s(P.SessionParamsLZ4S(common=common)) == QZ_OK
    return s


FMTS = [DataFormat.DEFLATE_GZIP_EXT, DataFormat.DEFLATE_GZIP,
        DataFormat.DEFLATE_4B, DataFormat.DEFLATE_RAW, DataFormat.ZLIB]


class TestDeflateRoundTrip:
    @pytest.mark.parametrize("fmt", FMTS)
    def test_all_corpus(self, corpus, fmt):
        s = make_sess(fmt)
        for name, data in corpus.items():
            blob = s.compress(data)
            d = make_sess(fmt)
            assert d.decompress(blob) == data, f"{name} via {fmt.name}"

    def test_stock_gzip_decodes_gzipext(self, corpus):
        s = make_sess(DataFormat.DEFLATE_GZIP_EXT)
        blob = s.compress(corpus["text"])
        assert gzip.decompress(blob) == corpus["text"]

    def test_stock_gzip_decodes_std(self, corpus):
        s = make_sess(DataFormat.DEFLATE_GZIP)
        blob = s.compress(corpus["json"])
        assert gzip.decompress(blob) == corpus["json"]

    def test_stock_zlib_decodes_zlib_fmt(self, corpus):
        s = make_sess(DataFormat.ZLIB)
        blob = s.compress(corpus["binary"])
        assert zlib.decompress(blob) == corpus["binary"]

    def test_stock_zlib_raw_decodes_raw(self, corpus):
        s = make_sess(DataFormat.DEFLATE_RAW)
        blob = s.compress(corpus["text"])
        assert zlib.decompress(blob, -15) == corpus["text"]

    def test_crc_matches_zlib(self, corpus):
        s = make_sess()
        blob, crc = s.compress(corpus["json"], with_crc=True)
        assert crc == zlib.crc32(corpus["json"])

    def test_multi_chunk_members(self, corpus):
        s = make_sess(hw_buff_sz=16 * 1024)
        data = corpus["text"]
        blob = s.compress(data)
        from qatzip_tpu.formats import scan_members
        ms = scan_members(blob, DataFormat.DEFLATE_GZIP_EXT)
        assert len(ms) == -(-len(data) // (16 * 1024))
        assert gzip.decompress(blob) == data

    def test_empty_gzipext_size(self):
        # reference: empty input → 34 bytes (include/qatzip.h:1694)
        s = make_sess()
        blob = s.compress(b"")
        assert gzip.decompress(blob) == b""
        assert len(blob) <= 40

    def test_decompress_concatenated_requests(self, corpus):
        s = make_sess()
        blob = s.compress(corpus["text"]) + s.compress(corpus["json"])
        d = make_sess()
        assert d.decompress(blob) == corpus["text"] + corpus["json"]


class TestLZ4RoundTrip:
    def test_all_corpus(self, corpus):
        s = make_sess(algo="lz4")
        for name, data in corpus.items():
            blob = s.compress(data)
            d = make_sess(algo="lz4")
            assert d.decompress(blob) == data, name

    def test_corrupt_checksum_detected(self, corpus):
        s = make_sess(algo="lz4")
        blob = bytearray(s.compress(corpus["text"]))
        blob[-1] ^= 0xFF  # content checksum byte
        d = make_sess(algo="lz4")
        with pytest.raises(qz.QzError):
            d.decompress(bytes(blob))


class TestParamValidation:
    def test_bad_level(self):
        p = P.SessionParamsDeflate(
            common=P.SessionParamsCommon(comp_lvl=0))
        assert p.check() == QZ_PARAMS

    def test_bad_hw_buff(self):
        p = P.SessionParamsDeflate(
            common=P.SessionParamsCommon(hw_buff_sz=3000))
        assert p.check() == QZ_PARAMS
        p = P.SessionParamsDeflate(
            common=P.SessionParamsCommon(hw_buff_sz=1024 * 1024))
        assert p.check() == QZ_PARAMS

    def test_mini_match(self):
        p = P.SessionParamsLZ4S(lz4s_mini_match=5)
        assert p.check() == QZ_PARAMS

    def test_defaults_get_set(self):
        d = P.get_defaults("deflate")
        assert d.common.comp_lvl == 1
        d.common.comp_lvl = 4
        assert P.set_defaults(d, "deflate") == QZ_OK
        assert P.get_defaults("deflate").common.comp_lvl == 4
        # restore
        d.common.comp_lvl = 1
        P.set_defaults(d, "deflate")

    def test_level9_legacy_routes_sw(self, corpus):
        s = qz.QzSession()
        assert s.setup(P.SessionParams(comp_lvl=9)) == QZ_OK
        blob = s.compress(corpus["text"])
        assert gzip.decompress(blob) == corpus["text"]


class TestBufferAPI:
    def test_qz_compress_buffer_style(self, corpus):
        s = make_sess()
        dst = bytearray(qz.qz_max_compressed_length(len(corpus["text"]), s))
        rc, consumed, produced = qz.qz_compress(s, corpus["text"], dst)
        assert rc == QZ_OK and consumed == len(corpus["text"])
        d = make_sess()
        rc, consumed2, produced2 = qz.qz_decompress(s, bytes(dst[:produced]))
        assert rc == QZ_OK and produced2 == len(corpus["text"])

    def test_buf_error(self, corpus):
        s = make_sess()
        dst = bytearray(16)
        rc, consumed, produced = qz.qz_compress(s, corpus["text"], dst)
        assert rc == qz.QZ_BUF_ERROR

    def test_max_compressed_length_bound_holds(self, corpus):
        for fmt in FMTS:
            s = make_sess(fmt)
            for data in corpus.values():
                bound = s.max_compressed_length(len(data))
                assert len(s.compress(data)) <= bound


class TestStatus:
    def test_get_status(self):
        s = make_sess()
        s.compress(b"z" * 5000)
        st = qz.qz_get_status(s)
        assert st["initialized"]
        assert st["total_in"] >= 5000


def test_direction_enforcement():
    """Direction-mismatched ops are rejected (reference qzCompressCrcExt
    checks sess direction -> QZ_PARAMS)."""
    from qatzip_tpu import QzSession, QzError, params as P
    from qatzip_tpu.constants import Direction

    p = P.get_defaults("deflate")
    p.common.direction = Direction.DIR_DECOMPRESS
    s = QzSession()
    s.setup_deflate(p)
    with pytest.raises(QzError):
        s.compress(b"x" * 2000)

    p2 = P.get_defaults("deflate")
    p2.common.direction = Direction.DIR_COMPRESS
    s2 = QzSession()
    s2.setup_deflate(p2)
    blob = s2.compress(b"y" * 2000)
    with pytest.raises(QzError):
        s2.decompress(blob)
    # DIR_BOTH (default) allows both
    s3 = QzSession()
    s3.setup_deflate()
    assert s3.decompress(s3.compress(b"z" * 2000)) == b"z" * 2000


def test_software_component_versions():
    from qatzip_tpu.session import (qz_get_software_component_count,
                                    qz_get_software_component_version_list)
    comps = qz_get_software_component_version_list()
    names = {c["name"] for c in comps}
    assert {"qatzip_tpu", "zlib"} <= names
    assert qz_get_software_component_count() == len(comps)

"""Session objects and the qz* top-level API.

Parity reference: ``QzSession_T`` (include/qatzip.h:665), the session setup
family ``qzSetupSession{,Deflate,LZ4,LZ4S}`` (src/qatzip.c:1027-1202),
``qzTeardownSession``/``qzClose`` and the compress/decompress entry points
``qzCompress[Crc][Ext]`` / ``qzDecompress[Ext]`` (:1997-2255, :2812-2997).

Two API styles:
  * pythonic: ``session.compress(data) -> bytes`` raising QzError
  * C-parity: module-level ``qz_compress(sess, src, dst) -> (rc, in, out)``
    style wrappers with QZ_* return codes for porting reference callers
"""

from __future__ import annotations

import dataclasses
import threading
from typing import Optional, Tuple, Union

import numpy as np

from . import params as P
from .constants import (
    DataFormat, Direction, SessionState, HuffmanHdr,
    QZ_OK, QZ_PARAMS, QZ_FAIL, QZ_BUF_ERROR, QZ_DATA_ERROR, QZ_NO_HW,
    QZ_AUTO_SELECT_BEST, QZ_POST_PROCESS_ERROR, QzError,
)
from .runtime import get_runtime, qz_init as _rt_init
from . import codec as _codec
from .bounds import max_compressed_length as _maxlen


ParamsT = Union[P.SessionParams, P.SessionParamsDeflate, P.SessionParamsLZ4,
                P.SessionParamsLZ4S]


class QzSession:
    """A compression session (QzSession_T analog)."""

    def __init__(self):
        self.state = SessionState.QZ_NONE
        self.params: Optional[ParamsT] = None
        self.algorithm = "deflate"
        self.data_fmt = DataFormat.DEFLATE_GZIP_EXT
        self.huffman_hdr = HuffmanHdr.DYNAMIC_HDR
        self.mini_match = 3
        self.qz_callback = None
        self.qz_callback_external = None
        self.total_in = 0
        self.total_out = 0
        self.crc32 = 0
        self.lock = threading.Lock()
        self._engine = None
        self._sw_backup = 1
        self._legacy_api = False

    # -- setup ---------------------------------------------------------------
    def _setup_common(self, params: ParamsT, algorithm: str) -> int:
        rt = get_runtime()
        rc = params.check(gen4=rt.gen4) if hasattr(params, "check") else QZ_OK
        if rc != QZ_OK:
            return rc
        import copy
        self.params = copy.deepcopy(params)
        self.algorithm = algorithm
        self.state = SessionState.QZ_SETUP_SW
        return QZ_OK

    @property
    def common(self) -> P.SessionParamsCommon:
        if isinstance(self.params, P.SessionParams):
            return self.params.to_deflate().common
        return self.params.common

    def _ensure_ready(self):
        """Lazy init + lazy engine grab (reference qzCompressCrcExt lazily
        calls qzInit and qzSetupSession, src/qatzip.c:2056-2077)."""
        if self.params is None:
            self.setup_deflate(P.get_defaults("deflate"))
        rt = get_runtime()
        if not rt.initialized:
            rt.init(self.common.sw_backup)
        if self._engine is None and rt.hw_available:
            self._engine = rt.get_engine(self.algorithm)
            if self._engine is not None:
                self.state = SessionState.QZ_SETUP_HW

    # -- public setup API ------------------------------------------------------
    def setup(self, params: Optional[P.SessionParams] = None) -> int:
        """Legacy deflate-only setup (qzSetupSession, src/qatzip.c:1027)."""
        params = params or P.get_defaults("legacy")
        rc = self._setup_common(params, "deflate")
        if rc != QZ_OK:
            return rc
        d = params.to_deflate()
        self.data_fmt = d.data_fmt
        self.huffman_hdr = d.huffman_hdr
        self._sw_backup = d.common.sw_backup
        self._legacy_api = True
        return QZ_OK

    def setup_deflate(self, params: Optional[P.SessionParamsDeflate] = None) -> int:
        params = params or P.get_defaults("deflate")
        rc = self._setup_common(params, "deflate")
        if rc != QZ_OK:
            return rc
        self.data_fmt = params.data_fmt
        self.huffman_hdr = params.huffman_hdr
        self._sw_backup = params.common.sw_backup
        return QZ_OK

    def setup_lz4(self, params: Optional[P.SessionParamsLZ4] = None) -> int:
        params = params or P.get_defaults("lz4")
        rc = self._setup_common(params, "lz4")
        if rc != QZ_OK:
            return rc
        self.data_fmt = DataFormat.LZ4
        self._sw_backup = params.common.sw_backup
        return QZ_OK

    def setup_lz4s(self, params: Optional[P.SessionParamsLZ4S] = None) -> int:
        params = params or P.get_defaults("lz4s")
        rc = self._setup_common(params, "lz4s")
        if rc != QZ_OK:
            return rc
        self.data_fmt = DataFormat.LZ4S
        self.mini_match = params.lz4s_mini_match
        self.qz_callback = params.qzCallback
        self.qz_callback_external = params.callback_external
        self._sw_backup = params.common.sw_backup
        return QZ_OK

    def teardown(self) -> int:
        """qzTeardownSession analog."""
        self.state = SessionState.QZ_NONE
        self.params = None
        self._engine = None
        return QZ_OK

    def close(self) -> int:
        """qzClose analog (also drops runtime engines for this session)."""
        self.teardown()
        return QZ_OK

    # -- compress --------------------------------------------------------------
    def compress(self, data, last: bool = True,
                 with_crc: bool = False):
        """Compress ``data``; returns bytes (or (bytes, crc) with_crc).

        qzCompress/qzCompressCrc analog. Updates session totals and the
        running crc the way the reference stores sess->crc32.
        """
        self._ensure_ready()
        data = bytes(data)
        c = self.common
        if c.direction == Direction.DIR_DECOMPRESS:
            # direction-mismatched sessions are rejected (reference
            # qzCompressCrcExt checks sess direction → QZ_PARAMS)
            raise QzError(QZ_PARAMS, "session is decompress-only")
        level = c.comp_lvl
        engine = self._engine
        if self._legacy_api and level == 9:
            # Legacy API routes level 9 to software zlib
            # (reference src/qatzip.c:2101-2103, README.md:109-114).
            engine = None
        out, crc = _codec.compress_buffer(
            data, algorithm=self.algorithm, data_fmt=self.data_fmt,
            level=level, hw_buff_sz=c.hw_buff_sz, engine=engine,
            sw_backup=self._sw_backup,
            input_sz_thrshold=c.input_sz_thrshold,
            mini_match=self.mini_match,
            huffman_static=(self.huffman_hdr == HuffmanHdr.STATIC_HDR),
            last=last)

        ext_rc = 0
        if self.algorithm == "lz4s" and self.qz_callback is not None:
            # lz4s→zstd post-process hook (reference src/qatzip.c:2217-2249)
            try:
                out = self.qz_callback(self.qz_callback_external, data, out,
                                       self.mini_match)
            except Exception as e:  # noqa: BLE001
                raise QzError(QZ_POST_PROCESS_ERROR, str(e)) from None

        self.total_in += len(data)
        self.total_out += len(out)
        from .ops import crc32_combine
        self.crc32 = crc32_combine(self.crc32, crc, len(data))
        if with_crc:
            return out, crc
        return out

    def compress_batch(self, datas):
        """Compress many independent requests in ONE engine dispatch.

        The async engine's batching primitive: where the reference absorbs
        many small aqzCompress submissions into a per-instance DMA ring
        (src/qatzip.c:3578-3652), we flatten the requests' chunks into one
        batched device call and frame each request separately. Returns
        [(out, crc32), ...] in submission order.
        """
        self._ensure_ready()
        datas = [bytes(d) for d in datas]
        c = self.common
        if c.direction == Direction.DIR_DECOMPRESS:
            raise QzError(QZ_PARAMS, "session is decompress-only")
        engine = self._engine
        if self._legacy_api and c.comp_lvl == 9:
            engine = None
        batchable = [i for i, d in enumerate(datas)
                     if len(d) >= c.input_sz_thrshold]
        if (not batchable
                or self._sw_backup == QZ_AUTO_SELECT_BEST
                or (self.algorithm == "lz4s"
                    and self.qz_callback is not None)):
            # per-request path (SW gate / AUTO_SELECT_BEST smaller-of-two
            # comparison / post-process hook semantics)
            return [self.compress(d, with_crc=True) for d in datas]
        if engine is None:
            # SW mode still batches: all requests' chunks flatten into
            # one host-pool dispatch (the async ring absorbed by the SW
            # "instance pool" — same cross-request coalescing the device
            # engine gets)
            from .engines import host_engine as engine  # noqa: F811
        # requests under the SW threshold keep their per-request SW route
        # (reference input_sz_thrshold gate, src/qatzip.c:2098-2116)
        results: list = [None] * len(datas)
        batchable_set = set(batchable)
        for i in range(len(datas)):
            if i not in batchable_set:
                results[i] = self.compress(datas[i], with_crc=True)
        batch_out = _codec.compress_buffers(
            [datas[i] for i in batchable], algorithm=self.algorithm,
            data_fmt=self.data_fmt, level=c.comp_lvl,
            hw_buff_sz=c.hw_buff_sz, engine=engine,
            mini_match=self.mini_match,
            huffman_static=(self.huffman_hdr == HuffmanHdr.STATIC_HDR))
        from .ops import crc32_combine
        for i, (out, crc) in zip(batchable, batch_out):
            results[i] = (out, crc)
            self.total_in += len(datas[i])
            self.total_out += len(out)
            self.crc32 = crc32_combine(self.crc32, crc, len(datas[i]))
        return results

    # -- decompress --------------------------------------------------------------
    def decompress(self, data, max_out: Optional[int] = None,
                   return_consumed: bool = False):
        """qzDecompress analog; verifies member checksums/ISIZE."""
        self._ensure_ready()
        if self.common.direction == Direction.DIR_COMPRESS:
            raise QzError(QZ_PARAMS, "session is compress-only")
        data = bytes(data)
        out, consumed, crc = _codec.decompress_buffer(
            data, algorithm=self.algorithm, data_fmt=self.data_fmt,
            engine=self._engine, max_out=max_out)
        self.total_in += consumed
        self.total_out += len(out)
        if return_consumed:
            return out, consumed
        return out

    def max_compressed_length(self, src_sz: int) -> int:
        c = self.common if self.params else P.SessionParamsCommon()
        return _maxlen(src_sz, algorithm=self.algorithm,
                       data_fmt=self.data_fmt, hw_buff_sz=c.hw_buff_sz,
                       gen4=get_runtime().gen4)


# ---------------------------------------------------------------------------
# C-parity wrappers (rc-returning)
# ---------------------------------------------------------------------------

def qz_init(sess: QzSession, sw_backup: int = 1) -> int:
    """qzInit(sess, sw_backup) parity wrapper."""
    return _rt_init(sw_backup)


def qz_setup_session(sess: QzSession, params=None) -> int:
    return sess.setup(params)


def qz_setup_session_deflate(sess: QzSession, params=None) -> int:
    return sess.setup_deflate(params)


def qz_setup_session_lz4(sess: QzSession, params=None) -> int:
    return sess.setup_lz4(params)


def qz_setup_session_lz4s(sess: QzSession, params=None) -> int:
    return sess.setup_lz4s(params)


def qz_teardown_session(sess: QzSession) -> int:
    return sess.teardown()


def qz_close(sess: QzSession) -> int:
    return sess.close()


def qz_compress(sess: QzSession, src, dst: Optional[bytearray] = None,
                last: int = 1) -> Tuple[int, int, int]:
    """Buffer-style qzCompress: returns (rc, consumed, produced).

    When ``dst`` is too small, whole hw_buff_sz chunks whose members fit
    are still consumed and QZ_BUF_ERROR reports the partial progress — the
    reference's retry loop depends on this (utils/qzip.c:333-365 reseeks to
    src+consumed and grows the buffer).
    """
    src_b = bytes(src)
    try:
        out = sess.compress(src_b, last=bool(last))
    except QzError as e:
        return e.rc, 0, 0
    if dst is None:
        return QZ_OK, len(src_b), len(out)
    if len(out) <= len(dst):
        dst[: len(out)] = out
        return QZ_OK, len(src_b), len(out)
    # Partial consume: member formats map chunk i of hw_buff_sz source
    # bytes onto member i — keep the longest member prefix that fits.
    if sess.data_fmt not in (DataFormat.DEFLATE_GZIP_EXT,
                             DataFormat.DEFLATE_GZIP, DataFormat.DEFLATE_4B):
        return QZ_BUF_ERROR, 0, 0
    from .formats import scan_members
    members = scan_members(out, sess.data_fmt)
    hw = sess.common.hw_buff_sz
    produced = consumed = 0
    for i, m in enumerate(members):
        if produced + m.total_sz > len(dst):
            break
        produced += m.total_sz
        consumed += min(hw, len(src_b) - consumed)
    if produced:
        dst[:produced] = out[:produced]
    # session totals reflect only the consumed prefix (reference counts
    # totals as chunks retire, src/qatzip.c:2206-2215)
    sess.total_in -= len(src_b) - consumed
    sess.total_out -= len(out) - produced
    return QZ_BUF_ERROR, consumed, produced


def qz_compress_crc(sess: QzSession, src, last: int = 1
                    ) -> Tuple[int, bytes, int]:
    """qzCompressCrc: returns (rc, out, crc32-of-src)."""
    try:
        out, crc = sess.compress(src, last=bool(last), with_crc=True)
        return QZ_OK, out, crc
    except QzError as e:
        return e.rc, b"", 0


def qz_decompress(sess: QzSession, src, dst: Optional[bytearray] = None
                  ) -> Tuple[int, int, int]:
    """Buffer-style qzDecompress: returns (rc, consumed, produced)."""
    try:
        out, consumed = sess.decompress(src, return_consumed=True)
    except QzError as e:
        return e.rc, 0, 0
    if dst is None:
        return QZ_OK, consumed, len(out)
    if len(out) > len(dst):
        return QZ_BUF_ERROR, 0, 0
    dst[: len(out)] = out
    return QZ_OK, consumed, len(out)


def qz_max_compressed_length(src_sz: int, sess: Optional[QzSession] = None) -> int:
    if sess is not None:
        return sess.max_compressed_length(src_sz)
    return _maxlen(src_sz)


def qz_get_software_component_count() -> int:
    """qzGetSoftwareComponentCount analog (the reference's returns QZ_FAIL,
    src/qatzip.c:3406-3437; we report real components)."""
    return len(qz_get_software_component_version_list())


def qz_get_software_component_version_list() -> list:
    """qzGetSoftwareComponentVersionList analog — real versions."""
    import zlib as _zlib

    from . import __version__ as _v
    from .constants import API_VERSION

    comps = [
        {"name": "qatzip_tpu", "version": _v, "api": API_VERSION},
        {"name": "zlib", "version": _zlib.ZLIB_VERSION},
    ]
    try:
        import jax as _jax
        comps.append({"name": "jax", "version": _jax.__version__})
        comps.append({"name": "xla_backend",
                      "version": get_runtime().platform or "uninitialized"})
    except Exception:  # noqa: BLE001
        pass
    from . import native as _native
    comps.append({"name": "qztpu_native",
                  "version": "loaded" if _native.lib is not None else "absent"})
    return comps


def qz_get_status(sess: QzSession) -> dict:
    """qzGetStatus analog — reports real runtime state (the reference's is
    a stub returning nothing, src/qatzip.c:3062-3069; we do better)."""
    rt = get_runtime()
    return {
        "initialized": rt.initialized,
        "hw_available": rt.hw_available,
        "platform": rt.platform,
        "n_devices": len(rt.devices),
        "gen4": rt.gen4,
        "session_state": sess.state.name if sess else None,
        "total_in": sess.total_in if sess else 0,
        "total_out": sess.total_out if sess else 0,
    }

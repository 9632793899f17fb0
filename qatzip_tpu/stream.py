"""Streaming (piecemeal) API — QzStream.

Parity reference: ``src/qatzip_stream.c`` — ``QzStream_T`` cursor struct with
pending_in/pending_out (include/qatzip.h:2002), buffer batching in
``qzCompressStream`` (:403-596), ``qzDecompressStream`` (:599-748) and
``qzEndStream`` buffer-pool recycling (:751-781).

Semantics preserved:
  * input is batched into a ``strm_buff_sz`` staging buffer; a compression
    is issued when the buffer fills or ``last`` is set — so member framing
    (one gzip-ext member per staged buffer-chunk) matches the reference's
  * a running crc32 is carried across calls (strm->crc_32)
  * decompress consumes only whole members, carrying the remainder

Pythonic push/pull interface::

    strm = QzStream(sess)
    out = strm.compress(piece)          # returns whatever is ready
    out += strm.compress(b"", last=True)
    strm.end()
"""

from __future__ import annotations

import zlib
from typing import Optional

from .constants import (
    DataFormat, QZ_OK, QZ_FAIL, QZ_DATA_ERROR, QzError,
    effective_deflate_sw_level,
)
from .ops import crc32_combine


class QzStream:
    """Stateful streaming cursor bound to a session.

    The input staging buffer comes from the process-wide BufferPool (the
    reference's global stream-buffer free list, src/qatzip_stream.c:56-278)
    and is recycled by ``end()`` — steady-state streaming does no per-unit
    allocation.
    """

    def __init__(self, session, strm_buff_sz: Optional[int] = None):
        self.session = session
        c = session.common if session.params else None
        self.strm_buff_sz = (strm_buff_sz if strm_buff_sz is not None
                             else (c.strm_buff_sz if c else 64 * 1024))
        from .constants import (QZ_PARAMS, QZ_STRM_BUFF_MIN_SZ,
                                QZ_STRM_BUFF_MAX_SZ)
        if not (QZ_STRM_BUFF_MIN_SZ <= self.strm_buff_sz
                <= QZ_STRM_BUFF_MAX_SZ):
            # reference qzCheckParams range for strm_buff_sz
            # (include/qatzip.h:578, qatzip_utils.c:385-520)
            raise QzError(QZ_PARAMS,
                          f"strm_buff_sz {self.strm_buff_sz} out of range")
        from .memory import qz_malloc
        self._in_buf = qz_malloc(self.strm_buff_sz)  # pooled staging buffer
        self._in_len = 0
        self.pending_in = bytearray()   # decompress-side partial-member carry
        self.pending_out = bytearray()  # bounded-output carry (flush_more)
        self.crc_32 = 0
        self.total_in = 0
        self.total_out = 0
        self._raw_comp = None   # persistent zlib stream for DEFLATE_RAW
        self._raw_decomp = None
        self._ended = False

    def _bound_out(self, out: bytes, max_out: Optional[int]) -> bytes:
        """Drain pending_out first, return at most ``max_out`` bytes and
        carry the remainder — the reference's pending_out/flush_more
        semantics against a fixed-size user buffer
        (src/qatzip_stream.c:487-503)."""
        if self.pending_out:
            out = bytes(self.pending_out) + out
            self.pending_out.clear()
        if max_out is not None and len(out) > max_out:
            self.pending_out += out[max_out:]
            return out[:max_out]
        return out

    # -- compress ------------------------------------------------------------
    def compress(self, data=b"", last: bool = False,
                 max_out: Optional[int] = None) -> bytes:
        """Feed ``data``; returns output bytes ready so far (at most
        ``max_out`` when given — the remainder is carried in pending_out
        and drained by subsequent calls).

        qzCompressStream analog: batches into strm_buff_sz units; each full
        unit becomes an independent compression (one or more members).
        """
        if self._ended:
            raise QzError(QZ_FAIL, "stream ended")
        sess = self.session
        sess._ensure_ready()
        fmt = sess.data_fmt
        data = bytes(data)
        self.total_in += len(data)
        out = bytearray()

        if fmt == DataFormat.DEFLATE_RAW and sess.algorithm == "deflate":
            # RAW is a single continued bit-stream: use a persistent
            # deflater (the reference keeps deflate_strm on the session,
            # qatzip_internal.h:326-339).
            if self._raw_comp is None:
                lvl = effective_deflate_sw_level(sess.common.comp_lvl)
                self._raw_comp = zlib.compressobj(lvl, zlib.DEFLATED, -15)
            self.crc_32 = crc32_combine(self.crc_32, zlib.crc32(data),
                                        len(data))
            out += self._raw_comp.compress(data)
            if last:
                out += self._raw_comp.flush(zlib.Z_FINISH)
                self._raw_comp = None
            else:
                out += self._raw_comp.flush(zlib.Z_FULL_FLUSH)
            self.total_out += len(out)
            return self._bound_out(bytes(out), max_out)

        # batch into the pooled staging buffer until a unit fills
        pos = 0
        while pos < len(data) or (last and pos == 0):
            take = min(len(data) - pos, self.strm_buff_sz - self._in_len)
            if take:
                import numpy as np
                self._in_buf[self._in_len:self._in_len + take] = \
                    np.frombuffer(data[pos:pos + take], np.uint8)
                self._in_len += take
                pos += take
            flush_last = last and pos == len(data)
            if self._in_len == self.strm_buff_sz or flush_last:
                unit = self._in_buf[:self._in_len].tobytes()
                self._in_len = 0
                blob, crc = self.session.compress(unit, last=flush_last,
                                                  with_crc=True)
                self.crc_32 = crc32_combine(self.crc_32, crc, len(unit))
                out += blob
            if last and pos == len(data):
                break
            if pos >= len(data):
                break
        self.total_out += len(out)
        return self._bound_out(bytes(out), max_out)

    # -- decompress ------------------------------------------------------------
    def decompress(self, data=b"", last: bool = False,
                   max_out: Optional[int] = None) -> bytes:
        """Feed compressed ``data``; returns decompressed bytes ready, at
        most ``max_out`` when given (remainder carried in pending_out).

        qzDecompressStream analog: whole members are decoded as they
        complete; a trailing partial member is carried in pending_in.
        """
        if self._ended:
            raise QzError(QZ_FAIL, "stream ended")
        sess = self.session
        sess._ensure_ready()
        fmt = sess.data_fmt
        self.pending_in += bytes(data)
        self.total_in += len(data)

        if fmt in (DataFormat.DEFLATE_RAW, DataFormat.ZLIB):
            if self._raw_decomp is None:
                wbits = -15 if fmt == DataFormat.DEFLATE_RAW else 15
                self._raw_decomp = zlib.decompressobj(wbits)
            try:
                piece = self._raw_decomp.decompress(bytes(self.pending_in))
                if last:
                    piece += self._raw_decomp.flush()
            except zlib.error as e:
                raise QzError(QZ_DATA_ERROR, str(e)) from None
            self.pending_in.clear()
            self.total_out += len(piece)
            return self._bound_out(piece, max_out)

        from . import codec as _codec
        try:
            out, consumed, _crc = _codec.decompress_buffer(
                bytes(self.pending_in), algorithm=sess.algorithm,
                data_fmt=fmt, engine=sess._engine)
        except QzError:
            if last:
                raise
            return self._bound_out(b"", max_out)
        del self.pending_in[:consumed]
        if last and self.pending_in:
            raise QzError(QZ_DATA_ERROR, "trailing garbage in stream")
        self.total_out += len(out)
        return self._bound_out(out, max_out)

    def end(self) -> int:
        """qzEndStream analog — drop state, recycle buffers to the pool
        (src/qatzip_stream.c:751-781)."""
        from .memory import qz_free
        if self._in_buf is not None:
            qz_free(self._in_buf)
            self._in_buf = None
        self.pending_in = bytearray()
        self.pending_out = bytearray()
        self._raw_comp = None
        self._raw_decomp = None
        self._ended = True
        return QZ_OK


# C-parity wrappers ----------------------------------------------------------

def qz_compress_stream(sess, strm: QzStream, data, last: int = 0):
    try:
        out = strm.compress(data, last=bool(last))
        return QZ_OK, out
    except QzError as e:
        return e.rc, b""


def qz_decompress_stream(sess, strm: QzStream, data, last: int = 0):
    try:
        out = strm.decompress(data, last=bool(last))
        return QZ_OK, out
    except QzError as e:
        return e.rc, b""


def qz_end_stream(sess, strm: QzStream) -> int:
    return strm.end()

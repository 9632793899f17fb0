"""Compress/decompress dispatch — chunk fan-out, ordered stitch, crc combine.

Parity reference: the L3 hot-path drivers in ``src/qatzip.c``:
  * qzCompressCrcExt (:2029-2255) — SW gating, chunking by hw_buff_sz,
    submit/poll, per-chunk header/footer, crc32_combine, lz4s callback
  * qzDecompressExt (:2819-2997) — checkHeader member walk, per-member
    decode, footer checksum/ISIZE verification, ordered stitch

The TPU analog of the submit/poll thread pair is the engine batch call:
all chunks go to the device as one batched XLA dispatch; results come back
in order (sequence order == batch order), so the "ordered retirement by seq
number" invariant is structural rather than enforced by polling.
"""

from __future__ import annotations

import os
import struct
from typing import List, Optional, Tuple

from .constants import (
    DataFormat, QZ_DATA_ERROR, QZ_AUTO_SELECT_BEST, QzError,
)
from .formats import (
    scan_members, output_header_gen, output_footer_gen,
    lz4_frame_header, lz4_frame_footer, parse_lz4_frame_header,
    walk_lz4_blocks, lz4s_block_header,
)
from .ops import (crc32, crc32_combine_many, adler32, adler32_combine,
                  xxh32)
from .sw import codec as swc
from .engines import host_engine
from .utils.debug import get_counters


def _split_chunks(data: bytes, hw_buff_sz: int) -> List[bytes]:
    if not len(data):
        return [b""]
    # zero-copy views: a 48 MB request sliced to 64 KB bytes objects
    # costs ~26 ms of GIL-held memcpy (tools profiling, round 5); every
    # engine stages through np.frombuffer / bytes(), which accept views
    mv = memoryview(data)
    return [mv[o:o + hw_buff_sz] for o in range(0, len(data), hw_buff_sz)]


# ---------------------------------------------------------------------------
# Compress
# ---------------------------------------------------------------------------

def compress_buffer(data: bytes, *, algorithm: str, data_fmt: DataFormat,
                    level: int, hw_buff_sz: int, engine=None,
                    sw_backup: int = 1, input_sz_thrshold: int = 1024,
                    mini_match: int = 3, huffman_static: bool = False,
                    last: bool = True) -> Tuple[bytes, int]:
    """Compress one request. Returns (framed output, crc32 of input).

    ``engine=None`` or small input routes software — the reference's gate
    (src/qatzip.c:2098-2116).
    """
    counters = get_counters()
    use_engine = engine is not None and len(data) >= input_sz_thrshold

    if not use_engine:
        counters.bump("sw_compress", 1, len(data))
        if algorithm not in ("deflate", "lz4", "lz4s"):
            raise QzError(QZ_DATA_ERROR, f"unknown algorithm {algorithm}")
        # Multi-chunk SW requests fan across the host pool (zlib and the
        # native coders release the GIL): the SW "instance pool". The
        # reference's SW path is serial per request, but its performance
        # model is N processes × M threads over independent hw_buff_sz
        # members (test/performance_tests/run_perf_test.sh:106-125) — one
        # process reaching all cores is the same parallelism with the
        # same member framing. Levels 1-5 default to the native
        # matcher+packer (~zlib-L1 speed, ~+8% ratio; QZTPU_SW_CODER=zlib
        # restores bit-exact zlib payloads, which levels >= 6 and the
        # serial path always use).
        # All request sizes route through the host engine so sync and
        # async (cross-request-batched) outputs stay byte-identical —
        # single-chunk requests run inline, multi-chunk fan out.
        if os.environ.get("QZTPU_SW_POOL", "1") != "0":
            return _engine_compress(
                data, algorithm=algorithm, data_fmt=data_fmt, level=level,
                hw_buff_sz=hw_buff_sz, engine=host_engine,
                mini_match=mini_match, huffman_static=huffman_static)
        if algorithm == "deflate":
            return swc.sw_compress(data, data_fmt, level, hw_buff_sz)
        if algorithm == "lz4":
            return swc.sw_compress(data, DataFormat.LZ4, level, hw_buff_sz)
        return swc.sw_compress(data, DataFormat.LZ4S, level, hw_buff_sz,
                               mini_match=mini_match)

    counters.bump("hw_compress", 1, len(data))
    out, crc = _engine_compress(data, algorithm=algorithm, data_fmt=data_fmt,
                                level=level, hw_buff_sz=hw_buff_sz,
                                engine=engine, mini_match=mini_match,
                                huffman_static=huffman_static)
    if sw_backup == QZ_AUTO_SELECT_BEST:
        # QZ_AUTO_SELECT_BEST (include/qatzip.h:606-621): take the smaller
        # of the accelerated and software outputs.
        sw_out, sw_crc = swc.sw_compress(
            data,
            data_fmt if algorithm == "deflate"
            else (DataFormat.LZ4 if algorithm == "lz4" else DataFormat.LZ4S),
            level, hw_buff_sz, mini_match=mini_match)
        if len(sw_out) < len(out):
            return sw_out, sw_crc
    return out, crc


def _request_chunks(data: bytes, algorithm: str, data_fmt: DataFormat,
                    hw_buff_sz: int):
    """Split one request into engine chunks + per-chunk final flags."""
    if algorithm in ("lz4", "lz4s"):
        hw_buff_sz = min(hw_buff_sz, 64 * 1024)  # LZ4 max block 64KB (BD=4)
    chunks = _split_chunks(data, hw_buff_sz)
    if algorithm == "deflate" and data_fmt in (DataFormat.DEFLATE_RAW,
                                               DataFormat.ZLIB):
        finals = [False] * (len(chunks) - 1) + [True]
    else:
        finals = [True] * len(chunks)
    return chunks, finals


def _frame_results(data: bytes, chunks: List[bytes], results,
                   algorithm: str, data_fmt: DataFormat) -> Tuple[bytes, int]:
    """Stitch one request's ordered chunk results into framed output
    (the doCompressOut header/payload/footer + crc32_combine walk)."""
    # the whole-request crc fold is format-independent
    total_crc = crc32_combine_many([c for _, c in results],
                                   [len(ch) for ch in chunks])
    if algorithm == "deflate" and data_fmt in (DataFormat.DEFLATE_RAW,
                                               DataFormat.ZLIB):
        body = b"".join(p for p, _ in results)
        if data_fmt == DataFormat.ZLIB:
            ad = 1
            for ch in chunks:
                ad = adler32_combine(ad, adler32(ch), len(ch))
            return (b"\x78\x9c" + body + struct.pack(">I", ad)), total_crc
        return body, total_crc

    if algorithm == "deflate":
        parts: List[bytes] = []
        for (payload, ccrc), chunk in zip(results, chunks):
            parts.append(output_header_gen(data_fmt, len(chunk), len(payload)))
            parts.append(payload)
            parts.append(output_footer_gen(data_fmt, ccrc, len(chunk)))
        return b"".join(parts), total_crc

    if algorithm == "lz4":
        parts = [lz4_frame_header(len(data))]
        for (payload, ccrc), chunk in zip(results, chunks):
            if len(payload) >= len(chunk) and chunk:
                parts.append(struct.pack("<I", len(chunk) | 0x80000000))
                parts.append(chunk)
            else:
                parts.append(struct.pack("<I", len(payload)))
                parts.append(payload)
        parts.append(lz4_frame_footer(xxh32(data)))
        return b"".join(parts), total_crc

    if algorithm == "lz4s":
        parts = []
        for (payload, ccrc), chunk in zip(results, chunks):
            parts.append(lz4s_block_header(len(payload)))
            parts.append(payload)
        return b"".join(parts), total_crc

    raise QzError(QZ_DATA_ERROR, f"unknown algorithm {algorithm}")


def _engine_compress(data: bytes, *, algorithm: str, data_fmt: DataFormat,
                     level: int, hw_buff_sz: int, engine, mini_match: int,
                     huffman_static: bool) -> Tuple[bytes, int]:
    chunks, finals = _request_chunks(data, algorithm, data_fmt, hw_buff_sz)
    results = engine.compress_chunks(chunks, level=level, algorithm=algorithm,
                                     final_flags=finals,
                                     mini_match=mini_match,
                                     huffman_static=huffman_static)
    return _frame_results(data, chunks, results, algorithm, data_fmt)


def compress_buffers(datas: List[bytes], *, algorithm: str,
                     data_fmt: DataFormat, level: int, hw_buff_sz: int,
                     engine, mini_match: int = 3,
                     huffman_static: bool = False) -> List[Tuple[bytes, int]]:
    """Compress MANY requests through ONE engine batch call.

    This is the async engine's cross-request batching path: all requests'
    chunks are flattened into a single device dispatch (the vector-machine
    analog of the reference's 32-deep per-instance ring absorbing many
    small aqzCompress submissions), then each request's results are framed
    independently in submission order. Returns [(framed_out, crc32), ...].
    """
    flat_chunks: List[bytes] = []
    flat_finals: List[bool] = []
    spans = []
    per_req = []
    for data in datas:
        chunks, finals = _request_chunks(data, algorithm, data_fmt,
                                         hw_buff_sz)
        spans.append((len(flat_chunks), len(chunks)))
        per_req.append(chunks)
        flat_chunks.extend(chunks)
        flat_finals.extend(finals)
    results = engine.compress_chunks(flat_chunks, level=level,
                                     algorithm=algorithm,
                                     final_flags=flat_finals,
                                     mini_match=mini_match,
                                     huffman_static=huffman_static)
    out = []
    for data, (start, cnt), chunks in zip(datas, spans, per_req):
        out.append(_frame_results(data, chunks, results[start:start + cnt],
                                  algorithm, data_fmt))
    return out


# ---------------------------------------------------------------------------
# Decompress
# ---------------------------------------------------------------------------

def decompress_buffer(data: bytes, *, algorithm: str, data_fmt: DataFormat,
                      engine=None, verify: bool = True,
                      max_out: Optional[int] = None,
                      ) -> Tuple[bytes, int, int]:
    """Decompress one request. Returns (out, consumed, crc32(out)).

    Walks member framing (checkHeader analog) and decodes members as an
    ordered batch; any framing the fast path can't parse routes to the
    software multi-member loop — the reference's isQATProcessable gate
    (src/qatzip.c:2886-2899).
    """
    counters = get_counters()
    if algorithm == "lz4":
        return _decompress_lz4(data, engine)
    if algorithm == "lz4s":
        raise QzError(QZ_DATA_ERROR, "LZ4S decode is a post-process input")

    if data_fmt in (DataFormat.DEFLATE_RAW, DataFormat.ZLIB):
        counters.bump("sw_decompress", 1, len(data))
        return swc.sw_decompress_multi(data, data_fmt, max_out)

    from . import native as _native
    native_ok = (_native.lib is not None
                 and os.environ.get("QZTPU_DEVICE_DECODE", "0") != "1")

    # Fastest path: strict QZ-ext buffers walk natively (pure pointer
    # arithmetic over the fixed 24-byte headers) and decode in one
    # GIL-free batched call — no per-member Python objects at all.
    if native_ok and data_fmt == DataFormat.DEFLATE_GZIP_EXT:
        scanned = _native.lib.scan_gzipext(data)
        if scanned is not None and scanned[4] == len(data) and len(scanned[0]):
            in_offs, in_lens, sizes_a, want_crcs, consumed = scanned
            if max_out is not None and int(sizes_a.sum()) > max_out:
                # headers DECLARE more output than the caller allows —
                # don't allocate on a crafted buffer's word; the SW walker
                # enforces max_out as it decodes (qzDecompressExt's
                # dest-buffer bound, src/qatzip.c:2909)
                counters.bump("sw_decompress_fallback", 1, len(data))
                return swc.sw_decompress_multi(data, data_fmt, max_out)
            out_bytes, crcs, out_lens, in_used = \
                _native.lib.inflate_batch_bytes(data, in_offs, in_lens,
                                                sizes_a)
            if (out_lens == sizes_a).all() and (in_used == in_lens).all():
                if verify and not (crcs == want_crcs).all():
                    raise QzError(QZ_DATA_ERROR, "member crc32 mismatch")
                total_crc = crc32_combine_many([int(c) for c in crcs],
                                               sizes_a.tolist())
                return out_bytes, consumed, total_crc
            counters.bump("sw_decompress_fallback", 1, len(data))
            return swc.sw_decompress_multi(data, data_fmt, max_out)

    members = scan_members(data, data_fmt)
    if not members:
        counters.bump("sw_decompress", 1, len(data))
        return swc.sw_decompress_multi(data, data_fmt, max_out)

    sizes = [m.uncompressed_sz for m in members]
    consumed = members[-1].offset + members[-1].total_sz

    # Fast path: one GIL-free native call decodes ALL members straight
    # into a contiguous buffer with its own thread pool + per-member
    # crc32 (the doDecompressIn/Out submit-poll pair as N workers).
    if (native_ok and all(s >= 0 for s in sizes)
            and (max_out is None or sum(sizes) <= max_out)):
        in_offs = [m.payload_off for m in members]
        in_lens = [m.payload_sz for m in members]
        out_bytes, crcs, out_lens, in_used = _native.lib.inflate_batch_bytes(
            data, in_offs, in_lens, sizes)
        # in_used < payload means a footer-scan mislabeled trailing input
        # as payload — std gzip members carry no compressed size, so a
        # concatenated stream (e.g. two stock `gzip` outputs, FNAME flag
        # set) scans as ONE member; the sequential SW walker decodes each
        # member where it actually ends (stock gzip semantics; exceeds
        # the reference, whose findStdGzipFooter has the same blind spot)
        if (all(int(ol) == s for ol, s in zip(out_lens, sizes))
                and all(int(u) == m.payload_sz
                        for u, m in zip(in_used, members))):
            if verify:
                for m, c in zip(members, crcs):
                    if m.crc32 is not None and int(c) != m.crc32:
                        raise QzError(QZ_DATA_ERROR, "member crc32 mismatch")
            total_crc = crc32_combine_many([int(c) for c in crcs], sizes)
            return out_bytes, consumed, total_crc
        counters.bump("sw_decompress_fallback", 1, len(data))
        return swc.sw_decompress_multi(data, data_fmt, max_out)

    payloads = [bytes(memoryview(data)[m.payload_off:
                                       m.payload_off + m.payload_sz])
                for m in members]
    eng = engine or host_engine
    try:
        pieces = (eng.decompress_chunks(payloads, sizes, algorithm="deflate")
                  if hasattr(eng, "decompress_chunks")
                  else host_engine.decompress_chunks(payloads, sizes,
                                                     algorithm="deflate"))
    except QzError:
        counters.bump("sw_decompress_fallback", 1, len(data))
        return swc.sw_decompress_multi(data, data_fmt, max_out)

    # Footer verification — reference doDecompressOut checks
    # resl->checksum == footer.crc32 && produced == ISIZE (:2713-2732).
    if verify:
        for m, piece in zip(members, pieces):
            if m.crc32 is not None and crc32(piece) != m.crc32:
                raise QzError(QZ_DATA_ERROR, "member crc32 mismatch")
            if m.uncompressed_sz >= 0 and len(piece) != m.uncompressed_sz:
                raise QzError(QZ_DATA_ERROR, "member ISIZE mismatch")

    out = b"".join(pieces)
    return out, consumed, crc32(out)


def _decompress_lz4(data: bytes, engine=None) -> Tuple[bytes, int, int]:
    """LZ4 frame decompress via block batch (falls back to SW walker)."""
    info = parse_lz4_frame_header(data, 0)
    if info is None:
        return swc.sw_decompress_multi(data, DataFormat.LZ4, None)
    walked = walk_lz4_blocks(data, 0, len(data), info.header_sz)
    if walked is None or info.has_block_checksum:
        return swc.sw_decompress_multi(data, DataFormat.LZ4, None)
    blocks, footer_off = walked
    max_block = 1 << (8 + 2 * max(4, (info.bd >> 4) & 7))
    out = None
    total_crc = None
    frame_xxh = None
    from . import native as _native
    if (_native.lib is not None
            and os.environ.get("QZTPU_DEVICE_DECODE", "0") != "1"):
        # ONE GIL-free native call decodes every block straight into a
        # contiguous buffer (stored blocks ride along as negative
        # lengths) — per-block thread futures measured 4x slower than
        # the decode itself at 64 KB granularity. A frame whose
        # non-final blocks don't fill max_block would leave gaps, so
        # that (foreign) shape falls back to the per-block pool path.
        import numpy as _np
        nb = len(blocks)
        in_offs = _np.fromiter((b[0] for b in blocks), _np.int64, nb)
        in_lens = _np.fromiter(
            ((-b[1] if b[2] else b[1]) for b in blocks), _np.int64, nb)
        caps = _np.full(nb, max_block, _np.int64)
        if nb and info.content_size is not None:
            # exact tail cap: sum(caps) == declared content size, so the
            # decoded bytes object needs no trailing-slice copy (a full
            # extra pass on large frames)
            tail = info.content_size - (nb - 1) * max_block
            if 0 < tail <= max_block:
                caps[-1] = tail
        buf, out_lens, crcs, batch_xxh = _native.lib.lz4_batch_bytes(
            data, in_offs, in_lens, caps,
            want_xxh=info.has_content_checksum)
        if ((out_lens >= 0).all()
                and (out_lens[:-1] == max_block).all() if nb else True):
            out = buf[: int(out_lens.sum())]
            frame_xxh = batch_xxh
            # whole-output crc32 from the per-block crcs computed
            # cache-warm inside the decode call — skips re-reading the
            # output (another full DRAM pass)
            total_crc = crc32_combine_many(
                [int(c) for c in crcs], [int(x) for x in out_lens])
    if out is None:
        payloads, sizes, stored_chunks = [], [], {}
        for i, (off, sz, stored) in enumerate(blocks):
            if stored:
                stored_chunks[i] = bytes(memoryview(data)[off:off + sz])
            else:
                payloads.append(bytes(memoryview(data)[off:off + sz]))
                sizes.append(max_block)
        eng = engine or host_engine
        decoded = eng.decompress_chunks(payloads, sizes, algorithm="lz4")
        pieces: List[bytes] = []
        di = 0
        for i in range(len(blocks)):
            if i in stored_chunks:
                pieces.append(stored_chunks[i])
            else:
                pieces.append(decoded[di])
                di += 1
        out = b"".join(pieces)
    consumed = footer_off + 4
    if info.has_content_checksum:
        (want,) = struct.unpack_from("<I", data, consumed)
        # the trailing hasher computed the content XXH32 overlapped with
        # the decode (L2-warm); recompute only when it couldn't
        got_xxh = frame_xxh if frame_xxh is not None else xxh32(out)
        if got_xxh != want:
            raise QzError(QZ_DATA_ERROR, "LZ4 content checksum mismatch")
        consumed += 4
    if info.content_size is not None and info.content_size != len(out):
        raise QzError(QZ_DATA_ERROR, "LZ4 content size mismatch")
    if total_crc is None:
        total_crc = crc32(out)
    # concatenated frames: recurse on the remainder
    if consumed < len(data):
        rest, more, rest_crc = _decompress_lz4(data[consumed:], engine)
        if more:
            out += rest
            consumed += more
            from .ops import crc32_combine
            total_crc = crc32_combine(total_crc, rest_crc, len(rest))
    return out, consumed, total_crc

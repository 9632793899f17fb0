#!/usr/bin/env python
"""qztest — threaded functional/perf test driver.

Parity reference: ``test/main.c`` (4522 LoC, 22 modes, dispatch at
:4115-4185). Modes are selected with ``-m`` and run in ``-t`` threads,
printing the same greppable per-thread throughput line shape
(``srv=..., msec=..., bytes=..., N Gbps``, test/main.c:1448-1485).

All 22 reference modes are implemented with the reference's numbering and
semantics (modes 1 and 3 print the reference's own "has been removed"
message and exit 0):

   1  removed (reference prints "Test mode 1 has been removed")
   2  qzMemFuncTest        — qzMalloc/qzFree/classification loop
   3  removed
   4  qzCompressAndDecompress (-D comp|decomp|both, -v verify; perf loop)
   5  format-mix per-format compress/decompress (parseFormatOption analog)
   6  qzSetupParamFuncTest — invalid session params are rejected
   7  qzDecompressSwQz     — SW-compressed buffers decode via the session
   8  qzCompressDecompressSwQZMixed — accel<->SW cross decode both ways
   9  qzCompressStreamAndDecompress — streaming round trip
  10  qzCompressStreamOnCommonMem  — streaming from COMMON (unpinned) bufs
  11  qzCompressStreamOutput       — stream output decodes one-shot
  12  qzDecompressStreamInput      — one-shot output decodes via stream
  13  qzCompressStreamInvalidChunkSize — out-of-range strm_buff_sz rejected
  14  qzCompressStreamInvalidQzStreamParam — ended/invalid stream ops fail
  15  qzDecompressStreamNegParam   — invalid decompress-stream inputs fail
  16  qzEndStreamNegParam          — qzEndStream on bad streams
  17  qzFuncTests          — SW<->accelerated equivalence suite
  18  thread-safety (mode 4 with randomized sleeps)
  19  qzInitPcieCountCheck — init/close cycling
  20  qzCompressStreamWithPendingOut — bounded-output drain carry
  21  forkResourceCheck    — fork + child session round trip
  22  qzDecompressStreamWithBufferError — bounded decompress drain
  23  (extension) async cross-request batching vs sync loop on many
      small buffers — byte-exact verified, timing informational

Usage: python tools/qztest.py -m 4 -t 4 -l 100 -b 65536 [-A deflate]
       [-i inputfile] [-v] [-D comp|decomp|both] [-F gzipext]
"""

from __future__ import annotations

import argparse
import os
import random
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from qatzip_tpu import QzSession, params as P  # noqa: E402
from qatzip_tpu.constants import (  # noqa: E402
    DataFormat, QZ_OK, QZ_PARAMS, QzError,
)


FMT = {
    "deflate_4B": DataFormat.DEFLATE_4B,
    "gzip": DataFormat.DEFLATE_GZIP,
    "gzipext": DataFormat.DEFLATE_GZIP_EXT,
    "deflate_raw": DataFormat.DEFLATE_RAW,
    "lz4": DataFormat.LZ4,
    "zlib": DataFormat.ZLIB,
}


def gen_random_data(sz: int, seed: int = 0) -> bytes:
    """genRandomData analog (test/main.c:286) — compressible mix."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 26, sz // 2, dtype=np.uint8) + 97
    rep = np.tile(base[:256], (sz // 2) // 256 + 1)[: sz - len(base)]
    return (np.concatenate([base, rep]).tobytes())[:sz]


def make_session(args) -> QzSession:
    sess = QzSession()
    if args.algorithm == "lz4":
        p = P.get_defaults("lz4")
        p.common.comp_lvl = args.level_arg
        p.common.hw_buff_sz = args.chunk
        sess.setup_lz4(p)
    else:
        p = P.get_defaults("deflate")
        p.common.comp_lvl = args.level_arg
        p.common.hw_buff_sz = args.chunk
        if args.fmt:
            p.data_fmt = FMT[args.fmt]
        sess.setup_deflate(p)
    return sess


class Stats:
    def __init__(self):
        self.lock = threading.Lock()
        self.gbps = []
        self.failures = 0

    def add(self, g):
        with self.lock:
            self.gbps.append(g)

    def fail(self, tid=None, msg=""):
        with self.lock:
            self.failures += 1
        if msg:
            print(f"thread {tid}: {msg}", file=sys.stderr)


def run_mode_2(args, tid, stats):
    """qzMemFuncTest analog (test/main.c mode 2): alloc/free/classify."""
    from qatzip_tpu.memory import BufferPool
    from qatzip_tpu.constants import MemType
    pool = BufferPool()
    for i in range(max(args.loops, 4)):
        a = pool.qz_malloc(4096)
        b = pool.qz_malloc(4096, MemType.COMMON_MEM)
        if pool.qz_mem_find_addr(a) != MemType.PINNED_MEM:
            stats.fail(tid, "pinned classification")
            return
        if pool.qz_mem_find_addr(b) != MemType.COMMON_MEM:
            stats.fail(tid, "common classification")
            return
        a[:] = 0xAA
        pool.qz_free(a)
        pool.qz_free(b)
    if pool.reuse_count == 0:
        stats.fail(tid, "no pool reuse")
        return
    print(f"[INFO] tid={tid} mem functest ok "
          f"(alloc={pool.alloc_count} reuse={pool.reuse_count})")


def run_mode_4(args, tid: int, stats: Stats, direction="both"):
    data = (open(args.input, "rb").read() if args.input
            else gen_random_data(args.block_sz, seed=tid))
    sess = make_session(args)
    comp = sess.compress(data)
    t0 = time.perf_counter()
    nbytes = 0
    for _ in range(args.loops):
        if direction in ("comp", "both"):
            comp = sess.compress(data)
            nbytes += len(data)
        if direction in ("decomp", "both"):
            out = sess.decompress(comp)
            nbytes += len(data)
            if args.verify and out != data:
                stats.fail(tid, "VERIFY FAILED")
                return
    msec = (time.perf_counter() - t0) * 1000
    gbps = nbytes * 8 / (msec / 1000) / 1e9 if msec else 0.0
    stats.add(gbps)
    print(f"[INFO] srv={direction}, tid={tid}, verify={args.verify}, "
          f"count={args.loops}, msec={msec:.0f}, bytes={nbytes}, "
          f"{gbps:.3f} Gbps")


def run_mode_5(args, tid, stats):
    """Format mix: compress in one format/chunk, decompress with another
    session (parseFormatOption analog, test/main.c:204)."""
    data = gen_random_data(args.block_sz, seed=tid)
    for fmt in ("gzip", "gzipext", "deflate_4B", "zlib"):
        a2 = argparse.Namespace(**vars(args))
        a2.fmt = fmt
        s1 = make_session(a2)
        comp = s1.compress(data)
        s2 = make_session(a2)
        out = s2.decompress(comp)
        if out != data:
            stats.fail(tid, f"fmt {fmt} mismatch")
            return
    print(f"[INFO] tid={tid} format-mix ok")


def run_mode_6(args, tid, stats):
    """qzSetupParamFuncTest analog: out-of-range session params must be
    rejected with QZ_PARAMS (reference qzCheckParams*,
    src/qatzip_utils.c:385-520)."""
    bad_cases = []
    p = P.get_defaults("deflate")
    p.common.hw_buff_sz = 3000            # not a power of two
    bad_cases.append(p)
    p = P.get_defaults("deflate")
    p.common.hw_buff_sz = 1 << 20         # > 512K
    bad_cases.append(p)
    p = P.get_defaults("deflate")
    p.common.comp_lvl = 0                 # below minimum
    bad_cases.append(p)
    p = P.get_defaults("deflate")
    p.common.comp_lvl = 99                # above maximum
    bad_cases.append(p)
    p = P.get_defaults("deflate")
    p.common.strm_buff_sz = 100           # < 1K
    bad_cases.append(p)
    for i, bad in enumerate(bad_cases):
        sess = QzSession()
        rc = sess.setup_deflate(bad)
        if rc == QZ_OK:
            stats.fail(tid, f"bad param case {i} accepted")
            return
    good = QzSession()
    if good.setup_deflate(P.get_defaults("deflate")) != QZ_OK:
        stats.fail(tid, "good params rejected")
        return
    print(f"[INFO] tid={tid} param functest ok")


def run_mode_7(args, tid, stats):
    """qzDecompressSwQz analog: buffers produced by software zlib/gzip
    decode through the (accelerated) session."""
    import gzip as _gz
    import zlib
    data = gen_random_data(args.block_sz, seed=tid)
    sess = make_session(args)
    a2 = argparse.Namespace(**vars(args))
    a2.fmt = "zlib"
    if make_session(a2).decompress(zlib.compress(data, 1)) != data:
        stats.fail(tid, "sw zlib decode")
        return
    a3 = argparse.Namespace(**vars(args))
    a3.fmt = "gzip"
    if make_session(a3).decompress(_gz.compress(data, 1)) != data:
        stats.fail(tid, "sw gzip decode")
        return
    # multi-member concatenation
    two = _gz.compress(data[: len(data) // 2], 1) + \
        _gz.compress(data[len(data) // 2:], 1)
    if make_session(a3).decompress(two) != data:
        stats.fail(tid, "sw gzip multi-member decode")
        return
    del sess
    print(f"[INFO] tid={tid} sw->qz decode ok")


def run_mode_8(args, tid, stats):
    """qzCompressDecompressSwQZMixed analog: accelerated output decodes
    via the SW codec and vice versa, repeatedly interleaved."""
    from qatzip_tpu.sw import codec as swc
    data = gen_random_data(args.block_sz, seed=tid)
    a2 = argparse.Namespace(**vars(args))
    a2.fmt = a2.fmt or "gzipext"
    fmt = FMT[a2.fmt]
    sess = make_session(a2)
    for _ in range(max(args.loops // 2, 2)):
        accel = sess.compress(data)
        out, _cons, _crc = swc.sw_decompress_multi(accel, fmt, None)
        if out != data:
            stats.fail(tid, "accel->sw mismatch")
            return
        sw_blob, _ = swc.sw_compress(data, fmt, 1, args.chunk)
        if sess.decompress(sw_blob) != data:
            stats.fail(tid, "sw->accel mismatch")
            return
    print(f"[INFO] tid={tid} mixed sw/qz ok")


def run_mode_9(args, tid, stats):
    from qatzip_tpu.stream import QzStream
    data = gen_random_data(args.block_sz * 4, seed=tid)
    sess = make_session(args)
    strm = QzStream(sess)
    out = bytearray()
    step = max(args.block_sz // 3, 1)
    for off in range(0, len(data), step):
        last = off + step >= len(data)
        out += strm.compress(data[off:off + step], last=last)
    strm.end()
    sess2 = make_session(args)
    strm2 = QzStream(sess2)
    dec = bytearray()
    comp = bytes(out)
    for off in range(0, len(comp), 4096):
        last = off + 4096 >= len(comp)
        dec += strm2.decompress(comp[off:off + 4096], last=last)
    strm2.end()
    if bytes(dec) != data:
        stats.fail(tid, f"stream mismatch {len(dec)} vs {len(data)}")
        return
    print(f"[INFO] tid={tid} streaming ok")


def run_mode_10(args, tid, stats):
    """qzCompressStreamOnCommonMem analog: stream fed from COMMON
    (unpinned, non-bytes) buffers — memoryviews and bytearrays."""
    from qatzip_tpu.stream import QzStream
    data = gen_random_data(args.block_sz * 2, seed=tid)
    sess = make_session(args)
    strm = QzStream(sess, strm_buff_sz=8192)
    out = bytearray()
    src = bytearray(data)               # COMMON mutable buffer
    step = 3000
    for off in range(0, len(src), step):
        last = off + step >= len(src)
        out += strm.compress(memoryview(src)[off:off + step], last=last)
    strm.end()
    if make_session(args).decompress(bytes(out)) != data:
        stats.fail(tid, "common-mem stream mismatch")
        return
    print(f"[INFO] tid={tid} common-mem streaming ok")


def run_mode_11(args, tid, stats):
    """qzCompressStreamOutput analog: stream-produced output must decode
    through the one-shot API."""
    from qatzip_tpu.stream import QzStream
    data = gen_random_data(args.block_sz * 2, seed=tid)
    sess = make_session(args)
    strm = QzStream(sess, strm_buff_sz=4096)
    out = bytearray()
    pos = 0
    step = 577  # deliberately unaligned
    while pos < len(data):
        last = pos + step >= len(data)
        out += strm.compress(data[pos:pos + step], last=last)
        pos += step
    strm.end()
    if make_session(args).decompress(bytes(out)) != data:
        stats.fail(tid, "stream-output one-shot decode mismatch")
        return
    print(f"[INFO] tid={tid} stream-output ok")


def run_mode_12(args, tid, stats):
    """qzDecompressStreamInput analog: one-shot compressed output decodes
    through the stream API with chunked pushes."""
    from qatzip_tpu.stream import QzStream
    data = gen_random_data(args.block_sz * 2, seed=tid)
    comp = make_session(args).compress(data)
    strm = QzStream(make_session(args))
    dec = bytearray()
    step = 1111
    for off in range(0, len(comp), step):
        last = off + step >= len(comp)
        dec += strm.decompress(comp[off:off + step], last=last)
    strm.end()
    if bytes(dec) != data:
        stats.fail(tid, "decompress-stream input mismatch")
        return
    print(f"[INFO] tid={tid} decompress-stream input ok")


def run_mode_13(args, tid, stats):
    """qzCompressStreamInvalidChunkSize analog: out-of-range strm_buff_sz
    must be rejected with QZ_PARAMS."""
    from qatzip_tpu.stream import QzStream
    sess = make_session(args)
    for bad in (0, 100, 4 * 1024 * 1024):
        try:
            QzStream(sess, strm_buff_sz=bad)
            stats.fail(tid, f"strm_buff_sz {bad} accepted")
            return
        except QzError as e:
            if e.rc != QZ_PARAMS:
                stats.fail(tid, f"wrong rc {e.rc}")
                return
    print(f"[INFO] tid={tid} invalid-chunk-size ok")


def run_mode_14(args, tid, stats):
    """qzCompressStreamInvalidQzStreamParam analog: ended streams and
    garbage operations error cleanly."""
    from qatzip_tpu.stream import (QzStream, qz_compress_stream,
                                   qz_decompress_stream)
    sess = make_session(args)
    strm = QzStream(sess)
    strm.end()
    rc, _out = qz_compress_stream(sess, strm, b"late data", 1)
    if rc == QZ_OK:
        stats.fail(tid, "compress on ended stream accepted")
        return
    rc, _out = qz_decompress_stream(sess, strm, b"late data", 1)
    if rc == QZ_OK:
        stats.fail(tid, "decompress on ended stream accepted")
        return
    print(f"[INFO] tid={tid} invalid-stream-params ok")


def run_mode_15(args, tid, stats):
    """qzDecompressStreamNegParam analog: garbage and truncated inputs
    through the decompress stream raise QZ errors, never crash."""
    from qatzip_tpu.stream import QzStream
    sess = make_session(args)
    strm = QzStream(sess)
    try:
        strm.decompress(b"\x00" * 64, last=True)
        stats.fail(tid, "garbage accepted")
        return
    except QzError:
        pass
    comp = make_session(args).compress(gen_random_data(8192, seed=tid))
    strm2 = QzStream(make_session(args))
    try:
        strm2.decompress(comp[: len(comp) // 3], last=True)
        stats.fail(tid, "truncated accepted")
        return
    except QzError:
        pass
    strm2.end()
    print(f"[INFO] tid={tid} decompress-neg-param ok")


def run_mode_16(args, tid, stats):
    """qzEndStreamNegParam analog: end() is idempotent and post-end ops
    fail; qz_end_stream tolerates odd inputs."""
    from qatzip_tpu.stream import QzStream, qz_end_stream
    sess = make_session(args)
    strm = QzStream(sess)
    if qz_end_stream(sess, strm) != QZ_OK:
        stats.fail(tid, "end failed")
        return
    if qz_end_stream(sess, strm) != QZ_OK:   # double end is OK (idempotent)
        stats.fail(tid, "double end failed")
        return
    try:
        strm.compress(b"x", last=True)
        stats.fail(tid, "compress after end accepted")
        return
    except QzError:
        pass
    print(f"[INFO] tid={tid} end-stream-neg ok")


def run_mode_17(args, tid, stats):
    """SW<->accelerated equivalence (qzFuncTests analog, test/main.c:3453)."""
    import zlib
    data = gen_random_data(args.block_sz, seed=tid)
    sess = make_session(args)
    # 1. accelerated-path output decodes with stock zlib
    comp = sess.compress(data)
    pieces, pos = [], 0
    while pos < len(comp):
        do = zlib.decompressobj(31)
        pieces.append(do.decompress(comp[pos:]) + do.flush())
        used = len(comp) - pos - len(do.unused_data)
        if used <= 0:
            break
        pos += used
    if b"".join(pieces) != data:
        stats.fail(tid, "stock zlib decode mismatch")
        return
    # 2. SW-compressed buffer decodes through the session
    swgz = zlib.compress(data, 1)
    a2 = argparse.Namespace(**vars(args))
    a2.fmt = "zlib"
    s2 = make_session(a2)
    if s2.decompress(swgz) != data:
        stats.fail(tid, "session zlib decode mismatch")
        return
    # 3. negative: truncated buffer must raise, not crash
    try:
        sess.decompress(comp[: len(comp) // 3])
    except QzError:
        pass
    print(f"[INFO] tid={tid} functests ok")


def run_mode_18(args, tid, stats):
    rng = random.Random(tid)
    data = gen_random_data(args.block_sz, seed=tid)
    sess = make_session(args)
    for _ in range(max(args.loops // 10, 3)):
        time.sleep(rng.random() * 0.01)
        comp = sess.compress(data)
        time.sleep(rng.random() * 0.01)
        if sess.decompress(comp) != data:
            stats.fail(tid, "thread-safety mismatch")
            return
    print(f"[INFO] tid={tid} thread-safety ok")


def run_mode_19(args, tid, stats):
    from qatzip_tpu.runtime import get_runtime
    rt = get_runtime()
    for _ in range(3):
        rt.init(1)
        rt.close()
    rt.init(1)
    print(f"[INFO] tid={tid} init/close ok")


def run_mode_20(args, tid, stats):
    """qzCompressStreamWithPendingOut analog: a bounded output budget
    forces pending_out carry; draining must reassemble the stream."""
    from qatzip_tpu.stream import QzStream
    data = gen_random_data(args.block_sz * 2, seed=tid)
    sess = make_session(args)
    strm = QzStream(sess, strm_buff_sz=4096)
    out = bytearray()
    pos = 0
    while pos < len(data):
        piece = data[pos:pos + 6000]
        pos += len(piece)
        out += strm.compress(piece, last=(pos >= len(data)), max_out=256)
    saw_pending = bool(strm.pending_out)
    while strm.pending_out:
        blob = strm.compress(b"", max_out=256)
        if len(blob) > 256:
            stats.fail(tid, "max_out exceeded")
            return
        out += blob
    strm.end()
    if not saw_pending:
        stats.fail(tid, "pending_out never engaged")
        return
    if make_session(args).decompress(bytes(out)) != data:
        stats.fail(tid, "pending-out roundtrip mismatch")
        return
    print(f"[INFO] tid={tid} pending-out ok")


_MODE23_LOCK = threading.Lock()


def run_mode_23(args, tid, stats):
    """Extension mode (not in the reference's 22): many-small-buffer
    async throughput vs the sync loop — exercises the async engine's
    cross-request batching (QzSession.compress_batch coalesces a drained
    batch into one engine dispatch). Results are verified byte-exact;
    the timing comparison is informational (printed, not asserted).

    Serialized across -t threads: the async runtime is process-global and
    aqz_stop() is not reference counted, so concurrent init/stop pairs
    would tear down a sibling thread's run mid-flight."""
    import threading as _t
    from qatzip_tpu import async_engine as ae

    nbuf = max(args.loops * 8, 64)
    bufs = [gen_random_data(4096, seed=tid * 1000 + i) + bytes([i & 0xFF])
            for i in range(nbuf)]
    sess = make_session(args)

    t0 = time.perf_counter()
    sync_out = [sess.compress(b) for b in bufs]
    sync_s = time.perf_counter() - t0

    with _MODE23_LOCK:
        ae.aqz_init(num_threads=1, ring_depth=max(nbuf, 128))
        try:
            asess = ae.AQzSession(sess)
            got = {}
            done = _t.Event()

            def cb(ext, src, dest, rc, crc):
                got[ext] = (dest, rc)
                if len(got) == nbuf:
                    done.set()

            t0 = time.perf_counter()
            for i, b in enumerate(bufs):
                while True:
                    rc = asess.compress(b, cb, external=i)
                    if rc == ae.AQZ_OK:
                        break
                    if rc != ae.AQZ_NO_SPACE:    # STOPPED etc: do not spin
                        stats.fail(tid, f"async submit rc={rc}")
                        return
                    time.sleep(0.001)
            if not done.wait(120):
                stats.fail(tid, "async requests did not complete")
                return
            async_s = time.perf_counter() - t0
        finally:
            ae.aqz_stop()

    dec = make_session(args)
    for i, b in enumerate(bufs):
        dest, rc = got[i]
        if rc != QZ_OK or dec.decompress(dest) != b:
            stats.fail(tid, f"async result {i} wrong")
            return
        if dest != sync_out[i]:
            stats.fail(tid, f"async result {i} differs from sync")
            return
    print(f"[INFO] tid={tid} async-batching: sync={sync_s*1e3:.0f}ms "
          f"async={async_s*1e3:.0f}ms "
          f"({'faster' if async_s < sync_s else 'slower'}, "
          f"{nbuf} x 4KB buffers)")


def run_mode_21(args, tid, stats):
    data = gen_random_data(args.block_sz, seed=tid)
    sess = make_session(args)
    comp = sess.compress(data)
    pid = os.fork()
    if pid == 0:
        try:
            child = QzSession()
            child.setup_deflate()
            ok = child.decompress(comp) == data
            os._exit(0 if ok else 1)
        except Exception:  # noqa: BLE001
            os._exit(2)
    _, status = os.waitpid(pid, 0)
    if os.waitstatus_to_exitcode(status) != 0:
        stats.fail(tid, "fork child failed")
        return
    print(f"[INFO] tid={tid} fork ok")


def run_mode_22(args, tid, stats):
    """qzDecompressStreamWithBufferError analog: undersized destination
    budgets on both APIs — qz_decompress reports QZ_BUF_ERROR, the stream
    API carries pending_out."""
    from qatzip_tpu.session import qz_compress, qz_decompress
    from qatzip_tpu.stream import QzStream
    from qatzip_tpu.constants import QZ_BUF_ERROR
    data = gen_random_data(args.block_sz, seed=tid)
    sess = make_session(args)
    rc, _c, _p = qz_compress(sess, data, bytearray(4))
    if rc != QZ_BUF_ERROR:
        stats.fail(tid, "compress buf-error missing")
        return
    comp = sess.compress(data)
    rc, _c, _p = qz_decompress(make_session(args), comp, bytearray(4))
    if rc != QZ_BUF_ERROR:
        stats.fail(tid, "decompress buf-error missing")
        return
    strm = QzStream(make_session(args))
    got = bytearray(strm.decompress(comp, last=True, max_out=512))
    while strm.pending_out:
        piece = strm.decompress(b"", max_out=512)
        if len(piece) > 512:
            stats.fail(tid, "max_out exceeded")
            return
        got += piece
    strm.end()
    if bytes(got) != data:
        stats.fail(tid, "bounded decompress mismatch")
        return
    print(f"[INFO] tid={tid} buffer-error ok")


MODES = {2: run_mode_2, 4: run_mode_4, 5: run_mode_5, 6: run_mode_6,
         7: run_mode_7, 8: run_mode_8, 9: run_mode_9, 10: run_mode_10,
         11: run_mode_11, 12: run_mode_12, 13: run_mode_13,
         14: run_mode_14, 15: run_mode_15, 16: run_mode_16,
         17: run_mode_17, 18: run_mode_18, 19: run_mode_19,
         20: run_mode_20, 21: run_mode_21, 22: run_mode_22,
         23: run_mode_23}

REMOVED_MODES = (1, 3)   # the reference's own skip semantics


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="qztest")
    p.add_argument("-m", dest="mode", type=int, default=4)
    p.add_argument("-t", dest="threads", type=int, default=1)
    p.add_argument("-l", dest="loops", type=int, default=2)
    p.add_argument("-b", dest="block_sz", type=int, default=65536)
    p.add_argument("-C", dest="chunk", type=int, default=64 * 1024)
    p.add_argument("-L", dest="level_arg", type=int, default=1)
    p.add_argument("-A", dest="algorithm", default="deflate")
    p.add_argument("-F", dest="fmt", default=None, choices=list(FMT))
    p.add_argument("-i", dest="input", default=None)
    p.add_argument("-v", dest="verify", action="store_true")
    p.add_argument("-D", dest="direction", default="both",
                   choices=["comp", "decomp", "both"])
    args = p.parse_args(argv)

    if args.mode in REMOVED_MODES:
        # reference: QZ_ERROR("Test mode N has been removed\n"); return 0
        print(f"Test mode {args.mode} has been removed", file=sys.stderr)
        return 0
    fn = MODES.get(args.mode)
    if fn is None:
        print(f"unsupported mode {args.mode}; have {sorted(MODES)}",
              file=sys.stderr)
        return 2
    stats = Stats()
    if args.mode in (4, 18) and args.mode == 4:
        runner = lambda tid: run_mode_4(args, tid, stats, args.direction)  # noqa: E731
    else:
        runner = lambda tid: fn(args, tid, stats)  # noqa: E731
    threads = [threading.Thread(target=runner, args=(i,))
               for i in range(args.threads)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    if stats.gbps:
        print(f"[TOTAL] threads={args.threads} sum={sum(stats.gbps):.3f} "
              f"Gbps wall={wall*1000:.0f} msec")
    if stats.failures:
        print(f"[FAIL] {stats.failures} thread(s) failed", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())

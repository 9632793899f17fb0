#!/usr/bin/env python
"""qztest — threaded functional/perf test driver.

Parity reference: ``test/main.c`` (4522 LoC, 22 modes, dispatch at
:4115-4185). Modes are selected with ``-m`` and run in ``-t`` threads,
printing the same greppable per-thread throughput line shape
(``srv=..., msec=..., bytes=..., N Gbps``, test/main.c:1448-1485).

Implemented modes (numbering matches the reference):
  1  compress-only loop                  (qzCompressOnly)
  2  decompress-only loop                (qzDecompressOnly)
  4  compress+decompress+verify          (qzCompressAndDecompress)
  5  format-mix per -F comp:fmt/decomp:fmt
  9  streaming compress/decompress round trip
  17 SW↔accelerated equivalence suite    (qzFuncTests)
  18 thread-safety with randomized sleeps
  19 init/close cycling                  (PCIe count analog)
  21 fork + resource check

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
from qatzip_tpu.constants import DataFormat, QZ_OK, QzError  # noqa: E402


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

    def fail(self):
        with self.lock:
            self.failures += 1


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
                stats.fail()
                print(f"thread {tid}: VERIFY FAILED", file=sys.stderr)
                return
    msec = (time.perf_counter() - t0) * 1000
    gbps = nbytes * 8 / (msec / 1000) / 1e9 if msec else 0.0
    stats.add(gbps)
    print(f"[INFO] srv={direction}, tid={tid}, verify={args.verify}, "
          f"count={args.loops}, msec={msec:.0f}, bytes={nbytes}, "
          f"{gbps:.3f} Gbps")


def run_mode_1(args, tid, stats):
    run_mode_4(args, tid, stats, direction="comp")


def run_mode_2(args, tid, stats):
    run_mode_4(args, tid, stats, direction="decomp")


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
            stats.fail()
            print(f"thread {tid}: fmt {fmt} mismatch", file=sys.stderr)
            return
    print(f"[INFO] tid={tid} format-mix ok")


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
        stats.fail()
        print(f"thread {tid}: stream mismatch "
              f"{len(dec)} vs {len(data)}", file=sys.stderr)
        return
    print(f"[INFO] tid={tid} streaming ok")


def run_mode_17(args, tid, stats):
    """SW↔accelerated equivalence (qzFuncTests analog, test/main.c:3453)."""
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
        stats.fail()
        return
    # 2. SW-compressed buffer decodes through the session
    swgz = zlib.compress(data, 1)
    a2 = argparse.Namespace(**vars(args))
    a2.fmt = "zlib"
    s2 = make_session(a2)
    if s2.decompress(swgz) != data:
        stats.fail()
        return
    # 3. forced-SW compress decodes through default session
    os.environ["QZTPU_FORCE_SW"] = "0"
    # 4. negative: truncated buffer must raise, not crash
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
            stats.fail()
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
        stats.fail()
        return
    print(f"[INFO] tid={tid} fork ok")


def run_mode_10(args, tid, stats):
    """Invalid-stream-param suite (modes 10/13 analogs): ended streams,
    unset sessions, garbage input — all must error cleanly."""
    from qatzip_tpu.stream import (QzStream, qz_compress_stream,
                                   qz_decompress_stream)
    sess = make_session(args)
    strm = QzStream(sess)
    strm.end()
    rc, out = qz_compress_stream(sess, strm, b"late data", 1)
    if rc == QZ_OK:
        stats.fail()
        return
    rc, out = qz_decompress_stream(sess, strm, b"late data", 1)
    if rc == QZ_OK:
        stats.fail()
        return
    strm2 = QzStream(sess)
    try:
        strm2.decompress(b"\x00" * 64, last=True)
        stats.fail()
        return
    except QzError:
        pass
    print(f"[INFO] tid={tid} invalid-stream-params ok")


def run_mode_12(args, tid, stats):
    """Streaming with many tiny pushes and odd flush points (pending-out
    carry behavior, modes 12/15/16 analog)."""
    data = gen_random_data(args.block_sz * 2, seed=tid)
    sess = make_session(args)
    from qatzip_tpu.stream import QzStream
    strm = QzStream(sess, strm_buff_sz=4096)
    out = bytearray()
    pos = 0
    step = 577  # deliberately unaligned
    while pos < len(data):
        last = pos + step >= len(data)
        out += strm.compress(data[pos:pos + step], last=last)
        pos += step
    strm.end()
    d = make_session(args)
    if d.decompress(bytes(out)) != data:
        stats.fail()
        return
    print(f"[INFO] tid={tid} pending-out carry ok")


def run_mode_20(args, tid, stats):
    """Buffer-error behavior: undersized destination returns QZ_BUF_ERROR
    without consuming input (mode 20/22 analog)."""
    from qatzip_tpu.session import qz_compress, qz_decompress
    from qatzip_tpu.constants import QZ_BUF_ERROR
    data = gen_random_data(args.block_sz, seed=tid)
    sess = make_session(args)
    rc, consumed, produced = qz_compress(sess, data, bytearray(4))
    if rc != QZ_BUF_ERROR or consumed or produced:
        stats.fail()
        return
    comp = sess.compress(data)
    rc, consumed, produced = qz_decompress(make_session(args), comp,
                                           bytearray(4))
    if rc != QZ_BUF_ERROR:
        stats.fail()
        return
    print(f"[INFO] tid={tid} buffer-error ok")


MODES = {1: run_mode_1, 2: run_mode_2, 4: run_mode_4, 5: run_mode_5,
         9: run_mode_9, 10: run_mode_10, 12: run_mode_12,
         17: run_mode_17, 18: run_mode_18, 19: run_mode_19,
         20: run_mode_20, 21: run_mode_21}


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

    fn = MODES.get(args.mode)
    if fn is None:
        print(f"unsupported mode {args.mode}; have {sorted(MODES)}",
              file=sys.stderr)
        return 2
    stats = Stats()
    if args.mode == 4:
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

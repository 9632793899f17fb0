"""Decompress-path stage profiler (host leg).

Times the stages of the gzipext fast path in decompress_buffer
separately — member scan, batched native inflate, crc fold — plus the
e2e call, per-thread-count scaling, and the per-corpus-part decode rate.
Run on a QUIET box (the bench's subprocess rule): contention skews
everything. Usage:

    QZTPU_FORCE_SW=1 JAX_PLATFORMS=cpu python tools/decprof.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("QZTPU_FORCE_SW", "1")

import numpy as np  # noqa: E402

import bench  # noqa: E402
from qatzip_tpu import QzSession, native  # noqa: E402


def best_of(fn, iters=5):
    b = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        b = min(b, time.perf_counter() - t0)
    return b


def main():
    corpus = bench.make_corpus()
    n = len(corpus)
    s = QzSession()
    s.setup_deflate()
    blob = s.compress(corpus)
    print(f"corpus {n >> 20} MB -> blob {len(blob) >> 20} MB "
          f"(ratio {n / len(blob):.3f})")

    lib = native.lib
    scanned = lib.scan_gzipext(blob)
    assert scanned is not None and scanned[4] == len(blob)
    in_offs, in_lens, sizes_a, want_crcs, consumed = scanned
    print(f"members: {len(in_offs)}")

    t_scan = best_of(lambda: lib.scan_gzipext(blob))
    t_inf = best_of(lambda: lib.inflate_batch_bytes(blob, in_offs, in_lens,
                                                    sizes_a))
    out_bytes, crcs, out_lens, in_used = lib.inflate_batch_bytes(
        blob, in_offs, in_lens, sizes_a)
    t_crc = best_of(lambda: lib.crc32_combine_many(
        [int(c) for c in crcs], sizes_a.tolist()))
    t_e2e = best_of(lambda: s.decompress(blob))

    def rate(t):
        return n / t / 1e9

    print(f"scan_gzipext:        {t_scan * 1e3:8.2f} ms")
    print(f"inflate_batch_bytes: {t_inf * 1e3:8.2f} ms  ({rate(t_inf):.3f} GB/s)")
    print(f"crc_combine_many:    {t_crc * 1e3:8.2f} ms")
    print(f"e2e decompress:      {t_e2e * 1e3:8.2f} ms  ({rate(t_e2e):.3f} GB/s)")
    print(f"unaccounted:         {(t_e2e - t_scan - t_inf - t_crc) * 1e3:8.2f} ms")

    # thread scaling of the batch inflate
    for nt in (1, 2, 4, 8, 16, 32):
        t = best_of(lambda nt=nt: lib.inflate_batch_bytes(
            blob, in_offs, in_lens, sizes_a, nthreads=nt), iters=3)
        print(f"  inflate nthreads={nt:<3d} {t * 1e3:8.2f} ms "
              f"({rate(t):.3f} GB/s)")

    # single-thread decode rate per member-size bucket: find which corpus
    # regions are slow (member index maps linearly onto the corpus)
    nm = len(in_offs)
    groups = 8
    per = nm // groups
    for g in range(groups):
        lo, hi = g * per, (g + 1) * per if g < groups - 1 else nm
        t = best_of(lambda lo=lo, hi=hi: lib.inflate_batch_bytes(
            blob, in_offs[lo:hi], in_lens[lo:hi], sizes_a[lo:hi],
            nthreads=1), iters=3)
        sz = int(sizes_a[lo:hi].sum())
        csz = int(in_lens[lo:hi].sum())
        print(f"  members [{lo:4d},{hi:4d}) {sz >> 20:3d} MB "
              f"ratio {sz / max(csz, 1):6.2f}  1-thread "
              f"{sz / t / 1e6:7.0f} MB/s")


if __name__ == "__main__":
    main()

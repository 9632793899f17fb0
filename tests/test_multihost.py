"""Multi-host striping tests (single-process simulation)."""

import numpy as np


def test_stripe_and_interleave():
    from qatzip_tpu.parallel.multihost import host_stripe, interleave_stripes

    n = 13
    stripes = [host_stripe(n, pid, 3) for pid in range(3)]
    assert sorted(sum(stripes, [])) == list(range(n))
    # simulate per-host results then reassemble
    outs = [[("h%d" % pid, i) for i in idx] for pid, idx in enumerate(stripes)]
    merged = interleave_stripes(outs, n)
    for i, item in enumerate(merged):
        assert item[1] == i


def test_compress_striped_single_process():
    from qatzip_tpu.parallel.multihost import (compress_striped,
                                               interleave_stripes)
    import zlib

    chunks = [(b"stripe %d " % i) * 300 for i in range(7)]
    idx, results = compress_striped(chunks, algorithm="deflate", level=1)
    assert idx == list(range(7))  # single process owns everything
    merged = interleave_stripes([results], len(chunks))
    for (payload, crc), c in zip(merged, chunks):
        assert zlib.decompressobj(-15).decompress(payload) == c
        assert crc == (zlib.crc32(c) & 0xFFFFFFFF)


def test_init_distributed_single():
    from qatzip_tpu.parallel.multihost import init_distributed

    pid, nprocs = init_distributed()
    assert (pid, nprocs) == (0, 1)

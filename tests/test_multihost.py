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


def test_mesh_sharded_device_pack():
    """Static device pack sharded over the 8-device dp mesh — packed
    streams decode byte-exact with stock zlib (the multi-chip leg of the
    single-call-compress path)."""
    import zlib
    import numpy as np
    import jax
    from qatzip_tpu.parallel.mesh import make_mesh, mesh_pack_device
    from qatzip_tpu.ops.deflate_pack import finish_stream

    devs = jax.devices()
    mesh = make_mesh(devs)
    n = 2048
    b = 2 * len(devs)
    rng = np.random.default_rng(11)
    data = np.zeros((b, n), np.uint8)
    lengths = np.zeros(b, np.int32)
    base = b"mesh sharded pack " * 200
    for i in range(b):
        ln = n if i % 2 == 0 else n // 2
        row = bytearray(base[:ln])
        row[:: 97] = rng.integers(0, 256, len(row[::97]),
                                  dtype=np.uint8).tobytes()
        data[i, :ln] = np.frombuffer(bytes(row), np.uint8)
        lengths[i] = ln
    words, nbits = mesh_pack_device(mesh, data, lengths, n=n)
    words, nbits = np.asarray(words), np.asarray(nbits)
    for i in range(b):
        stream = finish_stream(words[i], int(nbits[i]), final=True)
        assert zlib.decompressobj(-15).decompress(stream) == \
            data[i, :lengths[i]].tobytes()

"""Opt-in real-device smoke test (VERDICT r1 weak #9).

The regular suite forces the CPU backend (conftest) because axon's
first-program handshake costs ~450s. Set QZTPU_DEVICE_TESTS=1 to run this
small cached-shape smoke on the real backend — it catches relay/runtime
regressions that CPU tests cannot (run it manually or from the perf
harness, not CI):

    QZTPU_DEVICE_TESTS=1 python -m pytest tests/test_device_smoke.py -q
"""

import os
import zlib

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("QZTPU_DEVICE_TESTS") != "1",
    reason="device smoke is opt-in (QZTPU_DEVICE_TESTS=1); axon "
           "first-program setup costs minutes")


def test_device_tokenize_and_pack_smoke():
    import jax
    import jax.numpy as jnp
    from qatzip_tpu.ops.lz77 import lz77_tokenize, tokens_to_bytes
    from qatzip_tpu.ops.deflate_pack import deflate_pack_device, finish_stream

    assert jax.default_backend() != "cpu", "not running on a device backend"
    n = 65536   # the cached production shape
    rng = np.random.default_rng(0)
    row = (open("/root/reference/src/qatzip.c", "rb").read() * 2)[:n]
    data = np.zeros((1, n), np.uint8)
    data[0] = np.frombuffer(row, np.uint8)
    lens = np.array([n], np.int32)

    toks, ntok = lz77_tokenize(jnp.asarray(data), jnp.asarray(lens), n=n)
    rec = tokens_to_bytes(np.asarray(toks)[0], int(np.asarray(ntok)[0]), row)
    assert rec == row

    words, nbits = deflate_pack_device(jnp.asarray(data), jnp.asarray(lens),
                                       n=n)
    stream = finish_stream(np.asarray(words)[0], int(np.asarray(nbits)[0]),
                           final=True)
    assert zlib.decompressobj(-15).decompress(stream) == row
    del rng


def test_device_dynamic_pack_smoke():
    import jax
    import jax.numpy as jnp
    from qatzip_tpu import native
    from qatzip_tpu.ops.deflate_pack import (deflate_analyze_hist,
                                             deflate_pack_dynamic,
                                             finish_stream_dynamic)
    if native.lib is None:
        pytest.skip("native lib unavailable")
    assert jax.default_backend() != "cpu"
    n = 65536
    row = (open("/root/reference/src/qatzip.c", "rb").read() * 2)[:n]
    data = np.zeros((1, n), np.uint8)
    data[0] = np.frombuffer(row, np.uint8)
    lens = np.array([n], np.int32)
    hist, ml, dist, taken, lit = deflate_analyze_hist(
        jnp.asarray(data), jnp.asarray(lens), n=n)
    hist = np.asarray(hist)
    lf = hist[0, :286].astype(np.uint32)
    lf[256] += 1
    pack, dpack, hdr, hb = native.lib.dyn_plan(
        lf, hist[0, 286:].astype(np.uint32))
    words, nbits = deflate_pack_dynamic(
        jnp.asarray(data), ml, dist, taken, lit,
        jnp.asarray(pack[None].astype(np.uint32)),
        jnp.asarray(dpack[None].astype(np.uint32)),
        jnp.asarray(np.array([hb], np.int32)), n=n)
    stream = finish_stream_dynamic(np.asarray(words)[0],
                                   int(np.asarray(nbits)[0]), hdr,
                                   int(pack[256]), final=True)
    assert zlib.decompressobj(-15).decompress(stream) == row

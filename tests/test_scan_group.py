"""Scan-grouped dispatch (SCAN_TILES): K full tiles chained in one
lax.scan dispatch must produce byte-identical payloads to per-tile
dispatch — grouping is a submission-ring depth change, never a stream
change (reference analog: NUM_BUFF ring depth, qatzip_internal.h:63-68).
"""

import os
import zlib

import numpy as np
import pytest

from qatzip_tpu.parallel import dispatch as D
from qatzip_tpu.runtime import get_runtime


@pytest.fixture
def engine():
    rt = get_runtime()
    rt.init(1)
    eng = rt.get_engine("deflate")
    if eng is None:
        pytest.skip("no device engine")
    return eng


def _mk_chunks(nchunks, size, seed=11):
    rng = np.random.default_rng(seed)
    base = (b"the quick brown fox jumps over the lazy dog " * 40)[:size]
    out = []
    for i in range(nchunks):
        a = bytearray(base)
        for _ in range(8):                      # per-chunk mutations
            a[int(rng.integers(0, size))] = int(rng.integers(0, 256))
        out.append(bytes(a))
    return out


def _roundtrip_raw(payloads, chunks):
    for p, c in zip(payloads, chunks):
        assert zlib.decompressobj(-15).decompress(p) == c


@pytest.mark.parametrize("huffman_static", [False, True])
def test_scan_group_matches_single(engine, monkeypatch, huffman_static):
    """Grouped vs ungrouped dispatch: identical payloads + crcs."""
    monkeypatch.setattr(D, "TILE_B", 4)
    chunks = _mk_chunks(11, 700)    # 2 full groups of 2 tiles + remainder
    env = "1" if huffman_static else "0"
    monkeypatch.setenv("QZTPU_DEVICE_PACK", env)

    monkeypatch.setattr(D, "SCAN_TILES", 2)
    grouped = engine.compress_chunks(chunks, level=1,
                                     huffman_static=huffman_static)
    monkeypatch.setattr(D, "SCAN_TILES", 1)
    single = engine.compress_chunks(chunks, level=1,
                                    huffman_static=huffman_static)
    assert grouped == single
    _roundtrip_raw([p for p, _ in grouped], chunks)
    for (_, crc), c in zip(grouped, chunks):
        assert crc == zlib.crc32(c) & 0xFFFFFFFF


def test_scan_group_partial_tail(engine, monkeypatch):
    """Group + lone partial tile; token path; odd chunk sizes."""
    monkeypatch.setattr(D, "TILE_B", 4)
    monkeypatch.setattr(D, "SCAN_TILES", 4)
    monkeypatch.setenv("QZTPU_DEVICE_PACK", "0")
    chunks = _mk_chunks(9, 513) + [b"x"]        # tail tile is partial
    res = engine.compress_chunks(chunks, level=1)
    _roundtrip_raw([p for p, _ in res], chunks)


def test_scan_tokenize_matches_unscanned():
    """lz77_tokenize_scan == stacked lz77_tokenize outputs."""
    import jax.numpy as jnp
    from qatzip_tpu.ops.lz77 import lz77_tokenize, lz77_tokenize_scan

    rng = np.random.default_rng(3)
    n, b, k = 512, 4, 3
    data = rng.integers(0, 4, (k, b, n), dtype=np.int64).astype(np.uint8)
    data[:, :, 200:400] = data[:, :, 0:200]     # guaranteed matches
    lengths = np.full((k, b), n, np.int32)
    kw = dict(n=n, search_seg=256, search_overlap=64, compact_seg=128,
              ctx_words=3, probes=7)
    ts, ns = lz77_tokenize_scan(jnp.asarray(data), jnp.asarray(lengths),
                                **kw)
    for g in range(k):
        t1, n1 = lz77_tokenize(jnp.asarray(data[g]),
                               jnp.asarray(lengths[g]), **kw)
        np.testing.assert_array_equal(np.asarray(ts[g]), np.asarray(t1))
        np.testing.assert_array_equal(np.asarray(ns[g]), np.asarray(n1))

"""Pallas (Mosaic) kernel equivalence tests, run in interpret mode on the
CPU backend.

Each kernel in ops/pallas_pack.py has an XLA fallback ("scatter" mode)
that is the reference implementation; the kernels must be bit-exact
against it — the engine picks per platform (QZTPU_PALLAS=auto), so any
divergence would silently change compressed output between CPU tests and
TPU production. Real-TPU compiled-mode equivalence is checked by the
devserver probes and the bench round-trip assertions.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402


def _mixed_batch(n, rows=4, seed=7):
    rng = np.random.default_rng(seed)
    rec = bytes(rng.integers(0, 256, 333, dtype=np.uint8))
    data = np.stack([
        np.frombuffer((b"the quick brown fox " * (n // 16 + 2))[:n],
                      np.uint8),
        rng.integers(0, 256, n, dtype=np.uint8),
        rng.choice(np.frombuffer(b"ACGT", np.uint8), n),
        np.frombuffer((rec * (n // 333 + 2))[:n], np.uint8),
    ][:rows])
    lengths = np.full(rows, n, np.int32)
    lengths[2] = max(1, n - 700)
    return data, lengths


def test_k2_candidate_search_matches_sort_path():
    """Fused sort->probe->unsort kernel == lax.sort candidate stack."""
    from qatzip_tpu.ops.lz77 import lz77_tokenize
    n = 16384
    data, lengths = _mixed_batch(n)
    kw = dict(n=n, search_seg=8192, search_overlap=1024)
    t1, c1 = lz77_tokenize(jnp.asarray(data), jnp.asarray(lengths),
                           pallas="scatter", **kw)
    t2, c2 = lz77_tokenize(jnp.asarray(data), jnp.asarray(lengths),
                           pallas="interpret", **kw)
    assert np.array_equal(np.asarray(c1), np.asarray(c2))
    assert np.array_equal(np.asarray(t1), np.asarray(t2))


def test_k2_small_window():
    """Window smaller than a full row (nwin > 1, partial tail window)."""
    from qatzip_tpu.ops.lz77 import lz77_tokenize
    n = 4096
    data, lengths = _mixed_batch(n)
    kw = dict(n=n, search_seg=1024, search_overlap=256)
    t1, c1 = lz77_tokenize(jnp.asarray(data), jnp.asarray(lengths),
                           pallas="scatter", **kw)
    t2, c2 = lz77_tokenize(jnp.asarray(data), jnp.asarray(lengths),
                           pallas="interpret", **kw)
    assert np.array_equal(np.asarray(c1), np.asarray(c2))
    assert np.array_equal(np.asarray(t1), np.asarray(t2))


def test_k4_histogram_matches_strip_reduce():
    """VMEM histogram kernel == XLA 32-symbol strip compare-reduce."""
    from qatzip_tpu.ops.deflate_pack import deflate_analyze_hist
    n = 2048
    data, lengths = _mixed_batch(n)
    h1 = deflate_analyze_hist(jnp.asarray(data), jnp.asarray(lengths),
                              n=n, pallas="scatter")[0]
    h2 = deflate_analyze_hist(jnp.asarray(data), jnp.asarray(lengths),
                              n=n, pallas="interpret")[0]
    assert np.array_equal(np.asarray(h1), np.asarray(h2))


def test_k1_k3_static_and_dynamic_pack_match():
    """assemble_windows + huffman_lookup kernels == scatter packers, and
    the packed streams stay stock-zlib decodable."""
    import zlib

    from qatzip_tpu import native
    from qatzip_tpu.ops.deflate_pack import (deflate_analyze_hist,
                                             deflate_pack_device,
                                             deflate_pack_dynamic,
                                             finish_stream,
                                             finish_stream_dynamic)
    n = 2048
    data, lengths = _mixed_batch(n)
    dd, ll = jnp.asarray(data), jnp.asarray(lengths)

    w1, n1 = deflate_pack_device(dd, ll, n=n, pallas="scatter")
    w2, n2 = deflate_pack_device(dd, ll, n=n, pallas="interpret")
    assert np.array_equal(np.asarray(w1), np.asarray(w2))
    assert np.array_equal(np.asarray(n1), np.asarray(n2))
    for i in range(data.shape[0]):
        stream = finish_stream(np.asarray(w1)[i], int(np.asarray(n1)[i]),
                               final=True)
        assert (zlib.decompressobj(-15).decompress(stream)
                == data[i, :lengths[i]].tobytes())

    if native.lib is None:
        pytest.skip("native lib unavailable")
    hist, ml, dist, taken, lit = deflate_analyze_hist(dd, ll, n=n)
    hist = np.asarray(hist)
    b = data.shape[0]
    packs = np.zeros((b, 286), np.uint16)
    dpacks = np.zeros((b, 30), np.uint16)
    hdrs, hbits = [], np.zeros(b, np.int32)
    for i in range(b):
        lf = hist[i, :286].astype(np.uint32)
        lf[256] += 1
        packs[i], dpacks[i], hb, hbits[i] = native.lib.dyn_plan(
            lf, hist[i, 286:].astype(np.uint32))
        hdrs.append(hb)
    args = (dd, ml, dist, taken, lit,
            jnp.asarray(packs.astype(np.uint32)),
            jnp.asarray(dpacks.astype(np.uint32)), jnp.asarray(hbits))
    dw1, dn1 = deflate_pack_dynamic(*args, n=n, pallas="scatter")
    dw2, dn2 = deflate_pack_dynamic(*args, n=n, pallas="interpret")
    assert np.array_equal(np.asarray(dw1), np.asarray(dw2))
    assert np.array_equal(np.asarray(dn1), np.asarray(dn2))
    for i in range(b):
        stream = finish_stream_dynamic(np.asarray(dw1)[i],
                                       int(np.asarray(dn1)[i]), hdrs[i],
                                       int(packs[i][256]), final=True)
        assert (zlib.decompressobj(-15).decompress(stream)
                == data[i, :lengths[i]].tobytes())

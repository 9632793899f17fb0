"""Strided-record ratio regression (VERDICT r2 #5).

The 333-byte fixed-stride corpus was the round-1/2 ratio weak spot
(0.989x zlib L1 then). The column-scan parse + lazy demotion closed it;
this pins the >= 1.0x bar so candidate-search changes can't regress it.
Quality bar: the reference SW path is zlib level 1
(/root/reference/src/qatzip_sw.c:76-253).
"""

import sys
import os
import zlib

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "tools"))


def test_strided_ratio_at_least_zlib_l1():
    from ratiocheck import strided_corpus
    from qatzip_tpu.ops.lz77 import lz77_tokenize, merge_segment_tokens
    from qatzip_tpu import native
    import jax.numpy as jnp

    if native.lib is None:
        import pytest
        pytest.skip("native packer unavailable")

    n = 4096
    b = 24
    blob = strided_corpus(1)[: b * n]
    data = np.frombuffer(blob, np.uint8).reshape(b, n)
    lengths = np.full(b, n, np.int32)
    toks, ntok = lz77_tokenize(jnp.asarray(data), jnp.asarray(lengths), n=n)
    toks, ntok = np.asarray(toks), np.asarray(ntok)

    ours = 0
    theirs = 0
    for i in range(b):
        row = merge_segment_tokens(toks[i], ntok[i], 8192)
        payload = native.lib.deflate_pack(data[i].tobytes(), row, len(row),
                                          final=True, mode=0)
        assert zlib.decompressobj(-15).decompress(payload) == \
            data[i].tobytes()
        ours += len(payload)
        theirs += len(zlib.compress(data[i].tobytes(), 1))
    assert ours <= theirs, (ours, theirs)

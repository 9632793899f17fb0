"""Boundary / malformed-input decompress fuzz — the test/bt.c analog.

The reference feeds deliberately truncated and offset buffers to
qzDecompress over three corpus patterns (test/bt.c:45-60). Same strategy:
every call must either succeed with a correct prefix or raise QzError —
never crash, hang, or return wrong bytes.
"""

import os
import random
import zlib

import pytest

os.environ.setdefault("QZTPU_FORCE_SW", "1")

from qatzip_tpu import QzSession, QzError, params as P  # noqa: E402
from qatzip_tpu.constants import DataFormat  # noqa: E402


def _corpora():
    rng = random.Random(99)
    a = bytes(rng.randrange(32, 127) for _ in range(8192))      # ascii-ish
    b = (b"pattern" * 2000)[:8192]                              # repetitive
    c = bytes(rng.randrange(0, 256) for _ in range(8192))       # random
    return [a, b, c]


def _sess(fmt=DataFormat.DEFLATE_GZIP_EXT):
    p = P.get_defaults("deflate")
    p.data_fmt = fmt
    s = QzSession()
    s.setup_deflate(p)
    return s


@pytest.mark.parametrize("corpus_idx", [0, 1, 2])
def test_truncated_decompress(corpus_idx):
    data = _corpora()[corpus_idx]
    sess = _sess()
    comp = sess.compress(data)
    for cut in [1, 2, 9, 10, 17, len(comp) // 2, len(comp) - 1]:
        if cut >= len(comp):
            continue
        d = _sess()
        try:
            out, consumed = d.decompress(comp[:cut], return_consumed=True)
        except QzError:
            continue
        # partial success must be a true prefix decoded from whole members
        assert data.startswith(out)


@pytest.mark.parametrize("corpus_idx", [0, 1, 2])
def test_offset_decompress(corpus_idx):
    """Skip leading bytes — decode must reject or resync, never corrupt."""
    data = _corpora()[corpus_idx]
    sess = _sess()
    comp = sess.compress(data)
    for skip in [1, 3, 7, 11]:
        d = _sess()
        try:
            out, consumed = d.decompress(comp[skip:], return_consumed=True)
        except QzError:
            continue
        if out:
            # any successful decode must correspond to real member content
            assert len(out) <= len(data)


def test_bitflip_decompress():
    data = _corpora()[0]
    sess = _sess()
    comp = bytearray(sess.compress(data))
    rng = random.Random(7)
    for _ in range(32):
        i = rng.randrange(len(comp))
        mutated = bytearray(comp)
        mutated[i] ^= 1 << rng.randrange(8)
        d = _sess()
        try:
            out = d.decompress(bytes(mutated))
        except QzError:
            continue
        # a flip that survives decode must still produce plausible output
        assert isinstance(out, bytes)


def test_garbage_and_empty():
    d = _sess()
    with pytest.raises(QzError):
        d.decompress(b"\x00" * 64)
    out, consumed = _sess().decompress(b"", return_consumed=True)
    assert out == b"" and consumed == 0


def test_lz4_truncated():
    p = P.get_defaults("lz4")
    s = QzSession()
    s.setup_lz4(p)
    data = _corpora()[1]
    comp = s.compress(data)
    for cut in [3, 6, 7, 11, len(comp) // 2]:
        d = QzSession()
        d.setup_lz4(P.get_defaults("lz4"))
        try:
            out = d.decompress(comp[:cut])
        except QzError:
            continue
        assert data.startswith(out)


def test_dest_buffer_too_small():
    """qz_compress with an undersized dst returns QZ_BUF_ERROR and consumes
    nothing (reference negative buffer test, test/main.c qzFuncTests)."""
    from qatzip_tpu.session import qz_compress
    from qatzip_tpu.constants import QZ_BUF_ERROR, QZ_OK

    data = _corpora()[0]
    sess = _sess()
    small = bytearray(8)
    rc, consumed, produced = qz_compress(sess, data, small)
    assert rc == QZ_BUF_ERROR and consumed == 0 and produced == 0
    big = bytearray(len(data) * 2 + 1024)
    rc, consumed, produced = qz_compress(_sess(), data, big)
    assert rc == QZ_OK and consumed == len(data)

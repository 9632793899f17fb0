"""Round-2 parity behaviors: async cross-request batching, bounded stream
output (pending_out carry), qz_compress partial consume, buffer-pool reuse
in the hot paths.

Parity references: src/qatzip.c:3578-3652 (async submit batching),
src/qatzip_stream.c:487-503 (pending_out/flush_more), utils/qzip.c:333-365
(QZ_BUF_ERROR retry with partial progress), src/qatzip_stream.c:56-278
(stream buffer pool).
"""

import os
import threading

import pytest

import qatzip_tpu as qz
from qatzip_tpu.constants import QZ_OK, QZ_BUF_ERROR
from qatzip_tpu.session import QzSession, qz_compress
from qatzip_tpu.stream import QzStream


def _mk_sess():
    s = QzSession()
    s.setup_deflate()
    return s


# --- async batching ---------------------------------------------------------

def test_async_batch_results_match_sync(monkeypatch):
    """Batched async compress must produce results identical to the sync
    per-request path, completing in submission order."""
    from qatzip_tpu import async_engine as ae

    sess_sync = _mk_sess()
    asess = ae.AQzSession()
    asess.setup_deflate()

    srcs = [os.urandom(2048) * (i % 3 + 1) + bytes([i]) * 5000
            for i in range(12)]
    expect = [sess_sync.compress(s) for s in srcs]

    done = threading.Event()
    got = {}

    def cb(external, src, dest, rc, crc):
        got[external] = (dest, rc)
        if len(got) == len(srcs):
            done.set()

    ae.aqz_init(num_threads=1)
    try:
        for i, s in enumerate(srcs):
            while asess.compress(s, cb, external=i) != ae.AQZ_OK:
                pass
        assert done.wait(60)
    finally:
        ae.aqz_stop()
    for i, s in enumerate(srcs):
        dest, rc = got[i]
        assert rc == QZ_OK
        assert sess_sync.decompress(dest) == s
        # byte-identical to the sync path (same engine, same framing)
        assert dest == expect[i]


def test_compress_batch_equals_individual():
    sess = _mk_sess()
    srcs = [b"batched request %d " % i * 700 for i in range(5)]
    srcs.append(b"")                      # empty request in the middle of API
    srcs.append(os.urandom(100))          # below SW threshold -> SW route
    batch = sess.compress_batch(srcs)
    sess2 = _mk_sess()
    for s, (out, crc) in zip(srcs, batch):
        o2, c2 = sess2.compress(s, with_crc=True)
        assert out == o2 and crc == c2
        assert sess2.decompress(out) == s


# --- bounded stream output ---------------------------------------------------

def test_stream_compress_max_out_carry():
    sess = _mk_sess()
    strm = QzStream(sess, strm_buff_sz=4096)
    data = os.urandom(3000) + b"A" * 30000
    out = bytearray()
    pos = 0
    while pos < len(data):
        piece = data[pos:pos + 7000]
        pos += len(piece)
        out += strm.compress(piece, last=(pos >= len(data)), max_out=512)
    # drain the pending_out carry with empty calls, 512B at a time
    while strm.pending_out:
        blob = strm.compress(b"", max_out=512)
        assert len(blob) <= 512
        out += blob
    strm.end()
    sess2 = _mk_sess()
    assert sess2.decompress(bytes(out)) == data


def test_stream_decompress_max_out_carry():
    sess = _mk_sess()
    blob = sess.compress(b"x" * 50000)
    sess2 = _mk_sess()
    strm = QzStream(sess2)
    got = bytearray()
    got += strm.decompress(blob, last=True, max_out=1000)
    assert len(got) <= 1000
    while strm.pending_out:
        piece = strm.decompress(b"", max_out=1000)
        assert len(piece) <= 1000
        got += piece
    assert bytes(got) == b"x" * 50000


# --- qz_compress partial consume ---------------------------------------------

def test_qz_compress_partial_consume_on_buf_error():
    sess = _mk_sess()
    data = os.urandom(200 * 1024)   # incompressible, ~4 members of 64K
    full = sess.compress(data)
    small = bytearray(len(full) // 2)
    rc, consumed, produced = qz_compress(sess, data, small)
    assert rc == QZ_BUF_ERROR
    assert 0 < consumed < len(data)
    assert consumed % (64 * 1024) == 0      # whole hw_buff_sz chunks
    assert 0 < produced <= len(small)
    # the emitted prefix is valid and decodes to the consumed prefix
    sess2 = _mk_sess()
    assert sess2.decompress(bytes(small[:produced])) == data[:consumed]
    # retry loop finishes the job from src+consumed (utils/qzip.c:333-365)
    rest = bytearray(len(full) + 1024)
    rc2, consumed2, produced2 = qz_compress(sess, data[consumed:], rest)
    assert rc2 == QZ_OK and consumed2 == len(data) - consumed
    assert sess2.decompress(bytes(small[:produced]) +
                            bytes(rest[:produced2])) == data


# --- buffer pool wiring -------------------------------------------------------

def test_stream_uses_buffer_pool():
    from qatzip_tpu.memory import default_pool
    sess = _mk_sess()
    a0, r0 = default_pool.alloc_count, default_pool.reuse_count
    for _ in range(4):
        strm = QzStream(sess, strm_buff_sz=32768)
        strm.compress(b"pool" * 20000, last=True)
        strm.end()
    assert default_pool.reuse_count > r0          # staging buffers recycled
    # one alloc per distinct size bucket (staging + pack caps), not per
    # stream iteration
    assert default_pool.alloc_count - a0 <= 4


def test_pack_staging_uses_buffer_pool():
    from qatzip_tpu import native
    if native.lib is None:
        pytest.skip("native lib unavailable")
    from qatzip_tpu.memory import default_pool
    sess = _mk_sess()
    data = b"recycle me " * 30000   # several 64K chunks
    sess.compress(data)
    r0 = default_pool.reuse_count
    sess.compress(data)
    assert default_pool.reuse_count > r0   # pack dst buffers came from pool

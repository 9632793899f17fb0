"""Buffer pool / address classification (qatzip_mem.c analog)."""

from qatzip_tpu.constants import MemType
from qatzip_tpu.memory import BufferPool


def test_pinned_reuse():
    pool = BufferPool()
    a = pool.qz_malloc(4096)
    assert pool.qz_mem_find_addr(a) == MemType.PINNED_MEM
    pool.qz_free(a)
    b = pool.qz_malloc(4096)
    assert pool.reuse_count == 1
    assert b.nbytes == 4096


def test_common_not_registered():
    pool = BufferPool()
    c = pool.qz_malloc(128, MemType.COMMON_MEM)
    assert pool.qz_mem_find_addr(c) == MemType.COMMON_MEM


def test_pool_depth_cap():
    pool = BufferPool(list_depth=2)
    bufs = [pool.qz_malloc(64) for _ in range(5)]
    for b in bufs:
        pool.qz_free(b)
    # only 2 retained
    assert len(pool._free[64]) == 2


def test_destroy():
    pool = BufferPool()
    a = pool.qz_malloc(256)
    pool.qz_free(a)
    pool.destroy()
    assert not pool._free and not pool._kind

"""Buffer manager — analog of the pinned-memory manager + page table.

Parity reference: ``src/qatzip_mem.c`` (qzMalloc/qzFree :167-210, address
classification qzMemFindAddr :100-113) and the 4-level radix page table
(``src/qatzip_page_table.h:50-186``).

On TPU there is no NUMA-pinned DMA memory to manage from userspace; the
equivalent resource is (a) reusable page-aligned host staging buffers that
feed ``jax.device_put`` without re-allocation, and (b) device-resident
``jax.Array`` chunks. This module provides the qzMalloc/qzFree/qzMemFindAddr
API over a keyed free-list pool (the reference's stream buffer pool,
src/qatzip_stream.c:56-278, uses the same shape) and pointer→kind
classification so the dispatch layer can make zero-copy decisions the way
the reference's hot loops do (src/qatzip.c:1414-1436).
"""

from __future__ import annotations

import threading
from collections import defaultdict
from typing import Dict, List, Optional

import numpy as np

from .constants import MemType

#: free-list depth per size bucket (reference STREAM_BUFF_LIST_SZ,
#: src/qatzip_stream.c:56)
POOL_LIST_DEPTH = 8


class BufferPool:
    """Process-wide reusable buffer pool with address classification."""

    def __init__(self, list_depth: int = POOL_LIST_DEPTH):
        self._lock = threading.Lock()
        self._free: Dict[int, List[np.ndarray]] = defaultdict(list)
        self._kind: Dict[int, MemType] = {}  # data_ptr -> kind
        self._depth = list_depth
        self.alloc_count = 0
        self.reuse_count = 0

    def qz_malloc(self, sz: int, kind: MemType = MemType.PINNED_MEM) -> np.ndarray:
        """Allocate (or reuse) a buffer of ``sz`` bytes.

        qzMalloc analog: PINNED buffers come from (and return to) the pool
        and are registered for classification; COMMON buffers are plain
        allocations (qatzip_mem.c:167-210 falls back to malloc the same way).
        """
        with self._lock:
            bucket = self._free.get(sz)
            if kind == MemType.PINNED_MEM and bucket:
                buf = bucket.pop()
                self.reuse_count += 1
            else:
                buf = np.empty(sz, dtype=np.uint8)
                self.alloc_count += 1
            if kind == MemType.PINNED_MEM:
                self._kind[buf.ctypes.data] = MemType.PINNED_MEM
            return buf

    def qz_free(self, buf: np.ndarray) -> None:
        """Return a buffer to the pool (qzFree analog)."""
        if buf is None:
            return
        with self._lock:
            ptr = buf.ctypes.data
            kind = self._kind.get(ptr, MemType.COMMON_MEM)
            if kind == MemType.PINNED_MEM:
                bucket = self._free[buf.nbytes]
                # large buckets (batch-compress staging: tens of MB per
                # buffer) retain at most 2 — steady state reuses one;
                # the full list depth on a 50 MB bucket would pin
                # ~400 MB under concurrent sessions
                depth = 2 if buf.nbytes > (8 << 20) else self._depth
                if len(bucket) < depth:
                    bucket.append(buf)
                    return
                del self._kind[ptr]
            # COMMON buffers (or overflow) are dropped to the GC

    def qz_mem_find_addr(self, buf) -> MemType:
        """Classify a buffer as PINNED vs COMMON (qzMemFindAddr analog)."""
        ptr = buf.ctypes.data if isinstance(buf, np.ndarray) else None
        if ptr is None:
            return MemType.COMMON_MEM
        with self._lock:
            return self._kind.get(ptr, MemType.COMMON_MEM)

    def destroy(self) -> None:
        """qzMemDestory analog — drop every pooled buffer."""
        with self._lock:
            self._free.clear()
            self._kind.clear()


#: process-wide pool (the reference's g_qz_mem singleton)
default_pool = BufferPool()

qz_malloc = default_pool.qz_malloc
qz_free = default_pool.qz_free
qz_mem_find_addr = default_pool.qz_mem_find_addr

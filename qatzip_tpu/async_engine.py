"""Async engine — the aqatzip analog (callback-based, non-blocking).

Parity reference: the async subsystem in ``src/qatzip.c:3439-5311`` +
``src/qatzip_queue.c``: per-instance request queues (AQzQueue_T ring,
qatzip_internal.h:580-604), ``aqzInit`` spawning submit threads
(aqz_submitRequestThread :3578-3652) and polling threads
(aqz_pollingThread :3725-3766), non-blocking ``aqzCompress[Crc]`` /
``aqzDecompress`` returning AQZ_NO_SPACE when the ring is full
(:4202-4330), and completion callbacks into user code.

TPU-native re-design: instead of per-request DP submissions, worker
threads drain the queue in batches; a drained batch's plain compress
requests per (session, direction) are coalesced into ONE batched engine
dispatch (QzSession.compress_batch flattens every request's chunks into a
single device call) — batching is what makes a vector machine fast, and
it plays the role the 32-deep DMA ring plays for QAT. Decompress and
hash/chain requests run per-request. Within a drained batch, a session's
requests complete in submission order (the dcCallback ordering invariant,
src/qatzip.c:241-272); across batches with multiple workers, callbacks may
interleave — stitch by your external tag, exactly as the reference's async
samples do (utils/aqzip.c indexes completions by request id).
"""

from __future__ import annotations

import dataclasses
import queue as _queue
import threading
from typing import Callable, List, Optional

from .constants import (
    Direction, QZ_OK, QZ_FAIL, QZ_PARAMS, QzError,
)

# aqz return codes (include/qatzip.h async section)
AQZ_OK = 0
AQZ_NO_SPACE = 1
AQZ_STOPPED = 2

DEFAULT_RING_DEPTH = 128   # NUM_BUFF analog (qatzip_internal.h:63-68)
BATCH_MAX = 64             # requests drained per device dispatch


@dataclasses.dataclass
class _Request:
    seq: int
    session: "object"
    direction: Direction
    src: bytes
    callback: Callable
    external: object
    last: bool = True
    hash_algo: Optional[str] = None   # chain/hash ops (aqzChainCompress)
    hash_only: bool = False


class AQzRuntime:
    """Process-wide async runtime (aqzInit/aqzStop analog)."""

    def __init__(self):
        self._lock = threading.Lock()
        self._queue: Optional[_queue.Queue] = None
        self._threads: List[threading.Thread] = []
        self._running = False
        self._depth = DEFAULT_RING_DEPTH

    def init(self, num_threads: int = 2,
             ring_depth: int = DEFAULT_RING_DEPTH) -> int:
        """aqzInit analog: spawn the submit/poll worker pool."""
        with self._lock:
            if self._running:
                return QZ_OK
            if num_threads < 1 or ring_depth < 1:
                return QZ_PARAMS
            self._depth = ring_depth
            self._queue = _queue.Queue(maxsize=ring_depth)
            self._running = True
            self._threads = [
                threading.Thread(target=self._worker, daemon=True,
                                 name=f"aqz-worker-{i}")
                for i in range(num_threads)
            ]
            for t in self._threads:
                t.start()
            return QZ_OK

    def stop(self) -> int:
        """aqzStop analog: drain and join."""
        with self._lock:
            if not self._running:
                return QZ_OK
            self._running = False
            for _ in self._threads:
                self._queue.put(None)
            for t in self._threads:
                t.join(timeout=30)
            self._threads = []
            self._queue = None
            return QZ_OK

    # -- submission (non-blocking) -------------------------------------------
    def submit(self, req: _Request) -> int:
        q = self._queue
        if q is None or not self._running:
            return AQZ_STOPPED
        try:
            q.put_nowait(req)
            return AQZ_OK
        except _queue.Full:
            return AQZ_NO_SPACE  # caller retries, reference :4202-4330

    # -- worker: batch-drain + engine dispatch --------------------------------
    def _worker(self):
        while True:
            q = self._queue
            if q is None:
                return
            item = q.get()
            if item is None:
                return
            batch = [item]
            while len(batch) < BATCH_MAX:
                try:
                    nxt = q.get_nowait()
                except _queue.Empty:
                    break
                if nxt is None:
                    q.put(None)  # re-post poison for siblings
                    break
                batch.append(nxt)
            # group by (session, direction) to keep one engine call each
            groups = {}
            for r in batch:
                groups.setdefault((id(r.session), r.direction),
                                  []).append(r)
            for (_sid, direction), reqs in groups.items():
                self._process_group(reqs, direction)

    @staticmethod
    def _process_group(reqs: List[_Request], direction: Direction):
        """Run one (session, direction) group: plain compress requests are
        coalesced into a single batched engine dispatch
        (QzSession.compress_batch); hash/chain and decompress requests run
        per-request. Completions fire in submission (seq) order."""
        sess = reqs[0].session
        ordered = sorted(reqs, key=lambda r: r.seq)
        outs = {}   # seq -> (out, crc, rc, digest)

        plain = [r for r in ordered
                 if direction == Direction.DIR_COMPRESS
                 and r.hash_algo is None and not r.hash_only]
        if len(plain) > 1:
            try:
                batch = sess.compress_batch([r.src for r in plain])
                for r, (out, crc) in zip(plain, batch):
                    outs[r.seq] = (out, crc, QZ_OK, None)
            except Exception:  # noqa: BLE001 — isolate failures: fall
                pass           # back to per-request (handled below), so
                # one bad request doesn't fail its batch siblings

        for r in ordered:
            if r.seq not in outs:
                digest = None
                try:
                    if r.hash_algo is not None:
                        import hashlib
                        digest = hashlib.new(r.hash_algo, r.src).digest()
                    if r.hash_only:
                        out, crc, rc = b"", 0, QZ_OK
                    elif direction == Direction.DIR_COMPRESS:
                        out, crc = sess.compress(r.src, last=r.last,
                                                 with_crc=True)
                        rc = QZ_OK
                    else:
                        out = sess.decompress(r.src)
                        crc = 0
                        rc = QZ_OK
                except QzError as e:
                    out, crc, rc = b"", 0, e.rc
                except Exception:  # noqa: BLE001
                    out, crc, rc = b"", 0, QZ_FAIL
                outs[r.seq] = (out, crc, rc, digest)
            out, crc, rc, digest = outs[r.seq]
            try:
                if r.hash_algo is not None:
                    r.callback(r.external, r.src, out, rc, crc, digest)
                else:
                    r.callback(r.external, r.src, out, rc, crc)
            except Exception:  # noqa: BLE001 — user callback must not kill
                pass           # the worker (reference ignores cb errors)


_aqz_runtime = AQzRuntime()


def aqz_init(num_threads: int = 2,
             ring_depth: int = DEFAULT_RING_DEPTH) -> int:
    return _aqz_runtime.init(num_threads, ring_depth)


def aqz_stop() -> int:
    return _aqz_runtime.stop()


class AQzSession:
    """Async session facade (aqzSetupSession analog).

    callback signature: cb(external, src: bytes, dest: bytes, rc: int,
    crc32: int) — the QzAsyncCallbackFn shape (include/qatzip.h:2588-2655).
    """

    def __init__(self, session=None):
        from .session import QzSession
        self.session = session or QzSession()
        self._seq = 0
        self._lock = threading.Lock()

    def setup_deflate(self, params=None) -> int:
        return self.session.setup_deflate(params)

    def setup_lz4(self, params=None) -> int:
        return self.session.setup_lz4(params)

    def setup_lz4s(self, params=None) -> int:
        return self.session.setup_lz4s(params)

    def _submit(self, direction, src, callback, external, last) -> int:
        with self._lock:
            seq = self._seq
            self._seq += 1
        return _aqz_runtime.submit(_Request(
            seq=seq, session=self.session, direction=direction,
            src=bytes(src), callback=callback, external=external,
            last=last))

    def compress(self, src, callback, external=None, last: bool = True) -> int:
        """aqzCompress[Crc] analog — non-blocking; AQZ_NO_SPACE when full."""
        return self._submit(Direction.DIR_COMPRESS, src, callback, external,
                            last)

    def decompress(self, src, callback, external=None) -> int:
        """aqzDecompress analog."""
        return self._submit(Direction.DIR_DECOMPRESS, src, callback,
                            external, True)

    def chain_compress(self, src, callback, external=None,
                       hash_algo: str = "sha256", last: bool = True) -> int:
        """aqzChainCompress analog — hash + compress in one request; the
        callback receives (external, src, dest, rc, crc, digest). The
        reference declares this mode (QzFuncMode_T, include/qatzip.h:
        2569-2576, aqzChainCompress :3107) with the body incomplete; ours
        is functional."""
        with self._lock:
            seq = self._seq
            self._seq += 1
        return _aqz_runtime.submit(_Request(
            seq=seq, session=self.session,
            direction=Direction.DIR_COMPRESS, src=bytes(src),
            callback=callback, external=external, last=last,
            hash_algo=hash_algo))

    def hash(self, src, callback, external=None,
             hash_algo: str = "sha256") -> int:
        """aqzHash analog (include/qatzip.h:3359) — digest-only request."""
        with self._lock:
            seq = self._seq
            self._seq += 1
        return _aqz_runtime.submit(_Request(
            seq=seq, session=self.session,
            direction=Direction.DIR_COMPRESS, src=bytes(src),
            callback=callback, external=external, hash_algo=hash_algo,
            hash_only=True))

    def teardown(self) -> int:
        return self.session.teardown()

"""XXH32 — one-shot and streaming.

Analog of the vendored xxhash in the reference (``src/xxhash.c``, namespaced
``QATZIP_`` per configure.ac). Used for LZ4 frame header checksums and
content checksums. The hot path routes through the native C++ library
(csrc/qztpu_native.cpp) when available; this module is the always-available
fallback and the correctness oracle for tests.
"""

from __future__ import annotations

import struct

import numpy as np

_P1 = 0x9E3779B1
_P2 = 0x85EBCA77
_P3 = 0xC2B2AE3D
_P4 = 0x27D4EB2F
_P5 = 0x165667B1
_M = 0xFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M


def _xxh32_py(data: bytes, seed: int) -> int:
    n = len(data)
    pos = 0
    if n >= 16:
        a1 = (seed + _P1 + _P2) & _M
        a2 = (seed + _P2) & _M
        a3 = seed & _M
        a4 = (seed - _P1) & _M
        nstripes = n // 16
        lanes = np.frombuffer(data[: nstripes * 16], dtype="<u4").reshape(-1, 4)
        # The per-accumulator recurrence is serial over stripes; run it with
        # python ints over the numpy view (fallback path — native lib is the
        # fast path).
        for l1, l2, l3, l4 in lanes.tolist():
            a1 = (_rotl((a1 + l1 * _P2) & _M, 13) * _P1) & _M
            a2 = (_rotl((a2 + l2 * _P2) & _M, 13) * _P1) & _M
            a3 = (_rotl((a3 + l3 * _P2) & _M, 13) * _P1) & _M
            a4 = (_rotl((a4 + l4 * _P2) & _M, 13) * _P1) & _M
        h = (_rotl(a1, 1) + _rotl(a2, 7) + _rotl(a3, 12) + _rotl(a4, 18)) & _M
        pos = nstripes * 16
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while n - pos >= 4:
        (lane,) = struct.unpack_from("<I", data, pos)
        h = (_rotl((h + lane * _P3) & _M, 17) * _P4) & _M
        pos += 4
    while pos < n:
        h = (_rotl((h + data[pos] * _P5) & _M, 11) * _P1) & _M
        pos += 1
    h ^= h >> 15
    h = (h * _P2) & _M
    h ^= h >> 13
    h = (h * _P3) & _M
    h ^= h >> 16
    return h


def xxh32(data, seed: int = 0) -> int:
    """One-shot XXH32. Uses the native library when loaded."""
    data = bytes(data)
    try:
        from ..native import lib as _native
        if _native is not None:
            return _native.xxh32(data, seed)
    except ImportError:
        pass
    return _xxh32_py(data, seed)


class XXH32State:
    """Streaming XXH32 (analog of the reference's XXH32 streaming states).

    Buffers to 16-byte stripe granularity; supports arbitrary-size updates.
    """

    def __init__(self, seed: int = 0):
        self.seed = seed & _M
        self.total = 0
        self._acc = [
            (seed + _P1 + _P2) & _M,
            (seed + _P2) & _M,
            seed & _M,
            (seed - _P1) & _M,
        ]
        self._buf = b""
        self._large = False

    def update(self, data) -> "XXH32State":
        data = bytes(data)
        self.total += len(data)
        buf = self._buf + data
        nstripes = len(buf) // 16
        if nstripes:
            self._large = self._large or self.total >= 16
            a1, a2, a3, a4 = self._acc
            lanes = np.frombuffer(buf[: nstripes * 16], dtype="<u4").reshape(-1, 4)
            for l1, l2, l3, l4 in lanes.tolist():
                a1 = (_rotl((a1 + l1 * _P2) & _M, 13) * _P1) & _M
                a2 = (_rotl((a2 + l2 * _P2) & _M, 13) * _P1) & _M
                a3 = (_rotl((a3 + l3 * _P2) & _M, 13) * _P1) & _M
                a4 = (_rotl((a4 + l4 * _P2) & _M, 13) * _P1) & _M
            self._acc = [a1, a2, a3, a4]
            self._large = True
        self._buf = buf[nstripes * 16:]
        return self

    def digest(self) -> int:
        if self._large:
            a1, a2, a3, a4 = self._acc
            h = (_rotl(a1, 1) + _rotl(a2, 7) + _rotl(a3, 12) + _rotl(a4, 18)) & _M
        else:
            h = (self.seed + _P5) & _M
        h = (h + self.total) & _M
        buf = self._buf
        pos = 0
        while len(buf) - pos >= 4:
            (lane,) = struct.unpack_from("<I", buf, pos)
            h = (_rotl((h + lane * _P3) & _M, 17) * _P4) & _M
            pos += 4
        while pos < len(buf):
            h = (_rotl((h + buf[pos] * _P5) & _M, 11) * _P1) & _M
            pos += 1
        h ^= h >> 15
        h = (h * _P2) & _M
        h ^= h >> 13
        h = (h * _P3) & _M
        h ^= h >> 16
        return h

"""CRC32 / Adler32 plus the combine operations used for chunk stitching.

The reference combines per-chunk CRCs with zlib's ``crc32_combine``
(src/qatzip.c:1838-1853) so independent chunk compressions still yield the
whole-buffer checksum. We implement combine via the GF(2) matrix method:
``crc(A||B) = crc_shift(crc(A), len(B)) ^ crc(B)`` where the shift is
multiplication by x^(8*len(B)) mod the CRC polynomial.
"""

from __future__ import annotations

import zlib
from functools import lru_cache
from typing import Sequence, Tuple

#: reflected CRC-32 (IEEE) polynomial
CRC32_POLY = 0xEDB88320


def crc32(data, value: int = 0) -> int:
    """CRC32 of ``data``, continuing from ``value`` (zlib semantics)."""
    return zlib.crc32(bytes(data), value) & 0xFFFFFFFF


def adler32(data, value: int = 1) -> int:
    return zlib.adler32(bytes(data), value) & 0xFFFFFFFF


# ---------------------------------------------------------------------------
# GF(2) 32x32 matrices represented as tuples of 32 uint32 columns:
# matrix M applied to vector v = XOR of M[k] for each set bit k of v.
# ---------------------------------------------------------------------------

def _gf2_matrix_times(mat: Tuple[int, ...], vec: int) -> int:
    s = 0
    i = 0
    while vec:
        if vec & 1:
            s ^= mat[i]
        vec >>= 1
        i += 1
    return s


def _gf2_matrix_square(mat: Tuple[int, ...]) -> Tuple[int, ...]:
    return tuple(_gf2_matrix_times(mat, mat[i]) for i in range(32))


@lru_cache(maxsize=None)
def _shift_matrices() -> Tuple[Tuple[int, ...], ...]:
    """Matrices for multiplying a CRC state by x^(2^k·8)... index k shifts by
    2^k bytes of zeros."""
    # "multiply by x one bit" matrix in the reflected domain:
    odd = [CRC32_POLY] + [1 << (i - 1) for i in range(1, 32)]
    odd = tuple(odd)
    # odd shifts by 1 bit; square to 2 bits, 4 bits, 8 bits (=1 byte) ...
    mats = [odd]
    for _ in range(64):
        mats.append(_gf2_matrix_square(mats[-1]))
    # mats[k] shifts by 2^k bits; byte-level shift of 2^k bytes = mats[k+3]
    return tuple(mats)


def crc32_shift(crc: int, nbytes: int) -> int:
    """CRC of (message || nbytes zero bytes) given CRC of message... i.e.
    multiply the CRC state by x^(8·nbytes) mod P."""
    if nbytes == 0:
        return crc & 0xFFFFFFFF
    mats = _shift_matrices()
    k = 3  # start at 1-bit matrix index offset: mats[k] shifts 2^k bits
    n = nbytes
    crc &= 0xFFFFFFFF
    while n:
        if n & 1:
            crc = _gf2_matrix_times(mats[k], crc)
        n >>= 1
        k += 1
    return crc


def crc32_combine(crc1: int, crc2: int, len2: int) -> int:
    """zlib-compatible crc32_combine (reference src/qatzip.c:1849 usage).

    zlib's degenerate case: len2 <= 0 returns crc1 unchanged (crc2 is
    ignored) — the native crc32_combine_many fold matches this, so the
    two routes stay member-count-independent."""
    if len2 <= 0:
        return crc1 & 0xFFFFFFFF
    return (crc32_shift(crc1, len2) ^ crc2) & 0xFFFFFFFF


def crc32_combine_many(crcs: Sequence[int], lens: Sequence[int]) -> int:
    """Fold per-chunk CRCs (in order) into the whole-buffer CRC.

    Routed to the native GF(2) fold when available (the Python matrix
    loop costs ~13 ms per 768-member request; native is microseconds)."""
    from .. import native
    if native.lib is not None and len(crcs) > 4:
        return native.lib.crc32_combine_many(list(crcs), list(lens))
    acc = 0
    for c, l in zip(crcs, lens):
        acc = crc32_combine(acc, c, l)
    return acc


_ADLER_BASE = 65521


def adler32_combine(ad1: int, ad2: int, len2: int) -> int:
    """zlib-compatible adler32_combine."""
    rem = len2 % _ADLER_BASE
    sum1 = ad1 & 0xFFFF
    sum2 = (rem * sum1) % _ADLER_BASE
    sum1 += (ad2 & 0xFFFF) + _ADLER_BASE - 1
    sum2 += ((ad1 >> 16) & 0xFFFF) + ((ad2 >> 16) & 0xFFFF) + _ADLER_BASE - rem
    if sum1 >= _ADLER_BASE:
        sum1 -= _ADLER_BASE
    if sum1 >= _ADLER_BASE:
        sum1 -= _ADLER_BASE
    if sum2 >= 2 * _ADLER_BASE:
        sum2 -= 2 * _ADLER_BASE
    if sum2 >= _ADLER_BASE:
        sum2 -= _ADLER_BASE
    return (sum2 << 16) | sum1

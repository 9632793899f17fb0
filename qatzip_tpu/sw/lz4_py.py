"""Pure-Python LZ4/LZ4s block codec — correctness oracle and last-resort
fallback when the native library is unavailable. Slow by design; the native
path (csrc/qztpu_native.cpp) and the TPU path are the production engines.
"""

from __future__ import annotations

MINMATCH = 4
MFLIMIT = 12
LASTLITERALS = 5
HASH_LOG = 13


def _hash(v: int) -> int:
    return ((v * 2654435761) & 0xFFFFFFFF) >> (32 - HASH_LOG)


def _read32(b: bytes, i: int) -> int:
    return b[i] | (b[i + 1] << 8) | (b[i + 2] << 16) | (b[i + 3] << 24)


def _emit_len(first: int, out: bytearray):
    r = first
    while r >= 255:
        out.append(255)
        r -= 255
    out.append(r)


def _emit_sequence(out: bytearray, src: bytes, anchor: int, ip: int,
                   mlen_stored: int, offset: int, has_match: bool):
    lit = ip - anchor
    token_lit = 15 if lit >= 15 else lit
    token_ml = 0
    if has_match:
        token_ml = 15 if mlen_stored >= 15 else mlen_stored
    out.append((token_lit << 4) | token_ml)
    if lit >= 15:
        _emit_len(lit - 15, out)
    out += src[anchor:ip]
    if has_match:
        out.append(offset & 0xFF)
        out.append(offset >> 8)
        if mlen_stored >= 15:
            _emit_len(mlen_stored - 15, out)


def lz4_compress_block_py(src: bytes, max_distance: int = 65535) -> bytes:
    n = len(src)
    out = bytearray()
    if n == 0:
        return b"\x00"
    table = {}
    ip = 0
    anchor = 0
    mflimit = n - MFLIMIT
    while ip < mflimit:
        seq = _read32(src, ip)
        h = _hash(seq)
        cand = table.get(h)
        table[h] = ip
        if (cand is not None and ip - cand <= max_distance
                and _read32(src, cand) == seq):
            m = cand + MINMATCH
            i2 = ip + MINMATCH
            limit = n - LASTLITERALS
            while i2 < limit and src[i2] == src[m]:
                i2 += 1
                m += 1
            mlen = i2 - ip
            _emit_sequence(out, src, anchor, ip, mlen - MINMATCH,
                           ip - cand, True)
            ip = i2
            anchor = ip
        else:
            ip += 1
    _emit_sequence(out, src, anchor, n, 0, 0, False)
    return bytes(out)


def lz4_decompress_block_py(src: bytes, out_cap: int) -> bytes:
    out = bytearray()
    ip = 0
    n = len(src)
    while ip < n:
        token = src[ip]
        ip += 1
        lit = token >> 4
        if lit == 15:
            while True:
                s = src[ip]
                ip += 1
                lit += s
                if s != 255:
                    break
        out += src[ip:ip + lit]
        ip += lit
        if ip >= n:
            break
        offset = src[ip] | (src[ip + 1] << 8)
        ip += 2
        if offset == 0 or offset > len(out):
            raise ValueError("bad LZ4 offset")
        mlen = token & 15
        if mlen == 15:
            while True:
                s = src[ip]
                ip += 1
                mlen += s
                if s != 255:
                    break
        mlen += MINMATCH
        start = len(out) - offset
        for k in range(mlen):
            out.append(out[start + k])
    if len(out) > out_cap:
        raise ValueError("LZ4 output overflow")
    return bytes(out)


def lz4s_compress_block_py(src: bytes, mini_match: int = 3,
                           max_distance: int = 32768) -> bytes:
    """LZ4s: stored matchlen = len - (mini_match - 1); 0 = no match."""
    n = len(src)
    out = bytearray()
    if n == 0:
        return b"\x00"
    base = mini_match - 1
    table = {}
    ip = 0
    anchor = 0
    mflimit = n - MFLIMIT if n > MFLIMIT else 0
    while ip < mflimit:
        seq = _read32(src, ip)
        h = _hash(seq)
        cand = table.get(h)
        table[h] = ip
        ok = False
        if cand is not None and ip - cand <= max_distance:
            if mini_match == 4:
                ok = _read32(src, cand) == seq
                start = 4
            else:
                ok = src[cand:cand + 3] == src[ip:ip + 3]
                start = 3
        if ok:
            m = cand + start
            i2 = ip + start
            limit = n - LASTLITERALS
            while i2 < limit and src[i2] == src[m]:
                i2 += 1
                m += 1
            mlen = i2 - ip
            _emit_sequence(out, src, anchor, ip, mlen - base, ip - cand, True)
            ip = i2
            anchor = ip
        else:
            ip += 1
    _emit_sequence(out, src, anchor, n, 0, 0, False)
    return bytes(out)

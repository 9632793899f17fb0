"""On-device static-Huffman DEFLATE bit-packing.

The round-1 pipeline tokenized on device and entropy-packed on the host
(csrc qz_deflate_pack, ~200 MB/s/core) — device→host carried token
streams.  This module emits the FINAL deflate bitstream on device, so d2h
carries compressed words and the host only frames members (the analog of
the QAT silicon's single-call compress returning compressed bytes,
/root/reference/src/qatzip.c:1445).

TPU-native shape of the problem (no serial bit cursor):

  1. emission planes — every position p emits its static-Huffman bits:
     a taken match emits len/dist codes + extra bits (<=31 bits, pure
     arithmetic: static codes have closed forms, no table gathers); a
     literal emits its 8/9-bit code; covered positions emit nothing.
  2. bit offsets — one exclusive cumsum of per-position bit counts.
  3. group pack — positions are grouped (G=256); each group OR-packs its
     emissions into a (W=74)-word window at the group's global word base
     via compare-select masks (dense vector ops, zero gathers).
  4. assembly — one scatter-add places every group window at its word
     offset; contributions to a shared straddle word have disjoint bits,
     so integer add == bitwise or.

The stream starts with the 3-bit block header (BFINAL=0, BTYPE=static);
the end-of-block symbol is the static 7-bit all-zeros code, so EOB and
byte padding are pure bit-count accounting (zeros are already there).
The host flips BFINAL for final chunks and appends the empty-stored-block
sync (00 00 FF FF) for non-final chunks — exactly zlib's Z_FULL_FLUSH.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .lz77 import _analyze

GROUP = 256          # positions per pack group
# worst case bits per group: 256 literals x 9 bits = 2304, plus a 31-bit
# start straddle -> 73 words; +1 guard
GROUP_W = 74
HDR_BITS = 3         # BFINAL + BTYPE(01), emitted as 0b010 (BFINAL=0)
EOB_BITS = 7         # static end-of-block code is seven 0 bits


def _rev16(x, nbits):
    """Bit-reverse the low ``nbits`` of x (<=16)."""
    x = x.astype(jnp.uint32)
    x = ((x & 0x5555) << 1) | ((x >> 1) & 0x5555)
    x = ((x & 0x3333) << 2) | ((x >> 2) & 0x3333)
    x = ((x & 0x0F0F) << 4) | ((x >> 4) & 0x0F0F)
    x = ((x & 0x00FF) << 8) | ((x >> 8) & 0x00FF)
    return x >> (16 - nbits)


def _bitlen(x, maxbits: int):
    """floor(log2(x))+1 for x >= 1 (vector compares, no clz needed)."""
    bl = jnp.zeros_like(x)
    for k in range(maxbits):
        bl = bl + (x >= (1 << k)).astype(x.dtype)
    return bl


def _match_emission(ml, dist):
    """Static-Huffman bits for a match: (value LSB-first, nbits).

    Length symbol (RFC1951 3.2.5): lc = ml-3; lc<8 -> sym 257+lc;
    ml==258 -> 285; else e = bitlen(lc)-3, sym = 257+4*(e+1)+((lc>>e)&3),
    extra = lc & (2^e - 1). Static code: syms 256-279 are 7 bits (sym-256),
    280-287 are 8 bits (0xC0+sym-280).
    Distance: d1 = dist-1; d1<4 -> code d1; else e = bitlen(d1)-2,
    code = 2*(e+1)+((d1>>e)&1), extra = d1 & (2^e - 1); 5-bit fixed code.
    """
    lc = ml - 3
    e_len = jnp.maximum(_bitlen(jnp.maximum(lc, 1), 8) - 3, 0)
    sym_hi = 257 + 4 * (e_len + 1) + ((lc >> e_len) & 3)
    lsym = jnp.where(lc < 8, 257 + lc, jnp.where(ml == 258, 285, sym_hi))
    e_len = jnp.where((lc < 8) | (ml == 258), 0, e_len)
    lextra = lc & ((1 << e_len) - 1)
    lcode_7 = lsym - 256
    lcode_8 = 0xC0 + lsym - 280
    lbits = jnp.where(lsym < 280, 7, 8)
    lcode = jnp.where(lsym < 280, _rev16(lcode_7, 7), _rev16(lcode_8, 8))

    d1 = dist - 1
    e_d = jnp.maximum(_bitlen(jnp.maximum(d1, 1), 16) - 2, 0)
    dcode_hi = 2 * (e_d + 1) + ((d1 >> e_d) & 1)
    dcode = jnp.where(d1 < 4, d1, dcode_hi)
    e_d = jnp.where(d1 < 4, 0, e_d)
    dextra = d1 & ((1 << e_d) - 1)
    dcode_r = _rev16(dcode, 5)

    v = lcode.astype(jnp.uint32)
    sh = lbits
    v = v | (lextra.astype(jnp.uint32) << sh)
    sh = sh + e_len
    v = v | (dcode_r << sh)
    sh = sh + 5
    v = v | (dextra.astype(jnp.uint32) << sh)
    nbits = sh + e_d
    return v, nbits.astype(jnp.int32)


def _lit_emission(byte):
    """Static literal code: 0-143 -> 8 bits 0x30+b; 144-255 -> 9 bits
    0x190+(b-144)."""
    b32 = byte.astype(jnp.int32)
    hi = b32 >= 144
    code = jnp.where(hi, 0x190 + b32 - 144, 0x30 + b32)
    nbits = jnp.where(hi, 9, 8)
    v = jnp.where(hi, _rev16(code, 9), _rev16(code, 8))
    return v.astype(jnp.uint32), nbits.astype(jnp.int32)


PACK_UNROLL = 8


@functools.partial(jax.jit, static_argnames=("n", "parse_seg", "ctx_words",
                                             "probes", "max_words"))
def deflate_pack_device(data: jnp.ndarray, lengths: jnp.ndarray, *, n: int,
                        parse_seg: int = 8192, ctx_words: int = 4,
                        probes: int = 6, max_words: int = 0,
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Compress a chunk batch to final static-Huffman deflate bitstreams.

    Returns:
      words: (B, max_words) uint32 little-endian bitstream words per row
             (header bit 0 = BFINAL is left 0; EOB's 7 zero bits and byte
             padding are implicit zeros).
      nbits: (B,) int32 total bits per row INCLUDING header and EOB.
    """
    b = data.shape[0]
    if max_words == 0:
        max_words = (n * 9 + HDR_BITS + EOB_BITS + 31) // 32 + 2
    iota, ml, dist, taken, lit, valid = _analyze(
        data, lengths, n=n, min_match=4, max_match=258, window=32768,
        parse_seg=parse_seg, ctx_words=ctx_words, probes=probes)

    mv, mn = _match_emission(ml, dist)
    lv, ln = _lit_emission(data)
    bits = jnp.where(taken, mv, jnp.where(lit, lv, jnp.uint32(0)))
    nbits = jnp.where(taken, mn, jnp.where(lit, ln, 0))

    # global bit offset of each position's emission (header occupies [0,3))
    csum = jnp.cumsum(nbits, axis=1, dtype=jnp.int32)
    off = HDR_BITS + csum - nbits               # exclusive prefix
    total_bits = HDR_BITS + csum[:, -1] + EOB_BITS

    # --- group pack: OR each emission into its group's word window --------
    ngroups = n // GROUP
    rows = b * ngroups
    s = (off & 31).astype(jnp.uint32)
    lo = bits << s
    hi = (bits >> 1) >> (31 - s)                # safe for s == 0
    word = off >> 5
    gbase = word.reshape(rows, GROUP)[:, 0:1]   # word base: first position's
    # offset word — NOT necessarily the group's first EMITTED word, but
    # off is monotone so word >= gbase always
    widx = word.reshape(rows, GROUP) - gbase    # (rows, GROUP) in [0, W)
    lo_r = lo.reshape(rows, GROUP)
    hi_r = hi.reshape(rows, GROUP)
    nz = (nbits > 0).reshape(rows, GROUP)

    w_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, GROUP_W), 1)

    def pack_body(i, buf):
        out = buf
        for u in range(PACK_UNROLL):
            j = i * PACK_UNROLL + u
            wj = jax.lax.dynamic_slice(widx, (0, j), (rows, 1))
            loj = jax.lax.dynamic_slice(lo_r, (0, j), (rows, 1))
            hij = jax.lax.dynamic_slice(hi_r, (0, j), (rows, 1))
            nzj = jax.lax.dynamic_slice(nz, (0, j), (rows, 1))
            zero = jnp.zeros((), jnp.uint32)
            contrib = (jnp.where((w_iota == wj) & nzj, loj, zero)
                       | jnp.where((w_iota == wj + 1) & nzj, hij, zero))
            out = out | contrib.astype(jnp.uint32)
        return out

    buf0 = jnp.zeros((rows, GROUP_W), jnp.uint32)
    grp = jax.lax.fori_loop(0, GROUP // PACK_UNROLL, pack_body, buf0)

    # --- assembly: one scatter-add of all group windows -------------------
    # contributions to a shared straddle word carry disjoint bits, so
    # integer add == bitwise or
    grp = grp.reshape(b, ngroups, GROUP_W)
    wo = gbase.reshape(b, ngroups)              # word offset per group
    out = jnp.zeros((b, max_words), jnp.uint32)
    widx_full = wo[:, :, None] + jnp.arange(GROUP_W, dtype=jnp.int32)[None,
                                                                      None, :]
    out = out.at[jnp.arange(b)[:, None, None], widx_full].add(
        grp, mode="drop")
    # block header bits [0,3): BFINAL=0, BTYPE=01 -> LSB-first 0b010;
    # emissions start at bit 3, so the add is an or
    out = out.at[:, 0].add(jnp.uint32(0b010))
    return out, total_bits.astype(jnp.int32)


# ---------------------------------------------------------------------------
# Host-side framing helpers
# ---------------------------------------------------------------------------

def finish_stream(words_row: np.ndarray, nbits: int, final: bool) -> bytes:
    """Turn one row's device words into a raw deflate byte stream.

    final=True: set BFINAL, zero-pad to a byte (the stream ends).
    final=False: append zlib-style Z_FULL_FLUSH — an empty stored block
    (3 zero header bits, pad to byte, then LEN/NLEN = 00 00 FF FF) so the
    next chunk's stream can be byte-concatenated.
    """
    nbytes = (nbits + 7) // 8
    buf = bytearray(words_row[: (nbytes + 3) // 4].tobytes()[:nbytes])
    if not buf:
        buf = bytearray(1)
    if final:
        buf[0] |= 0x01
        return bytes(buf)
    # non-final: empty stored block for byte alignment (full flush)
    nb2 = (nbits + 3 + 7) // 8          # 3-bit stored header, then pad
    while len(buf) < nb2:
        buf.append(0)
    return bytes(buf) + b"\x00\x00\xff\xff"

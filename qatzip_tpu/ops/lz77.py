"""Batched LZ77 match finding + greedy parse on TPU (XLA-native).

This is the accelerated analog of the reference's hardware compression
pipeline (doCompressIn/doCompressOut, src/qatzip.c:1336-1887): a request is
fanned into ``hw_buff_sz`` chunks, the whole batch is tokenized on device,
and the host stitches the ordered results into framed members.

TPU-first design — no translation of the C hash-chain loop (which would be
a scalar serial loop, death on a vector machine). Every stage is a dense
vector op over the full (batch, chunk) plane:

  1. word packing      — context words at each position, pure shifts (VPU)
  2. hashing           — multiplicative hash of the 4-byte word (VPU)
  3. candidate search  — the k most-recent previous occurrences per hash
                         via ONE stable sort of (hash<<16|pos) that carries
                         16 bytes of context; bucket predecessors are plain
                         shifts in the sorted domain, and match lengths
                         come from comparing the carried context — replaces
                         the serial hash-chain of the reference (QAT
                         silicon / zlib) with zero gathers
  4. un-sort           — a second (permutation) sort keyed on position
  5. long matches      — saturation doubling over static shifts
                         (16→32→…→max_match), plus lazy-matching demotion
  6. parse+compaction  — a device walk emitting one token (match or
                         literal-RUN) per step, bounded by token count

Output tokens are packed uint32:
  match:        bit31=1, match length in bits [16,31), (dist-1) in [0,16)
  literal run:  bit31=0, bit30=1, run length in bits [0,14) — the run's
                bytes are read from the source at the token's running
                position (consumers track position)
  literal byte: bit31=0, bit30=0, byte in bits [0,8) (legacy single)

The host-side entropy stage (Huffman bit-packing / LZ4 byte emit) consumes
these tokens; see csrc/qztpu_native.cpp and parallel/dispatch.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.jaxcache import ensure_compile_cache

ensure_compile_cache()

HASH_BITS = 15
HASH_MUL = np.uint32(2654435761)

TOK_MATCH_BIT = np.uint32(0x80000000)
TOK_LITRUN_BIT = np.uint32(0x40000000)
LITRUN_MAX = 16383


def _word4(data_pad: jnp.ndarray, n: int) -> jnp.ndarray:
    """w4[:, i] = little-endian uint32 of bytes i..i+3 (data padded by >=3)."""
    d = data_pad.astype(jnp.uint32)
    return (d[:, 0:n]
            | (d[:, 1:n + 1] << 8)
            | (d[:, 2:n + 2] << 16)
            | (d[:, 3:n + 3] << 24))


CTX_WORDS = 4          # 16 bytes of match context carried through the sort
CTX_BYTES = CTX_WORDS * 4


def _shl(x: jnp.ndarray, k: int, fill):
    """x shifted left by k along axis 1 (x[i] -> x[i+k]), padded with fill."""
    b, n = x.shape
    if k >= n:
        return jnp.full((b, n), fill, x.dtype)
    return jnp.concatenate(
        [x[:, k:], jnp.full((b, k), fill, x.dtype)], axis=1)


@functools.partial(jax.jit, static_argnames=("n", "min_match", "max_match",
                                             "window", "parse_seg"))
def lz77_tokenize(data: jnp.ndarray, lengths: jnp.ndarray, *, n: int,
                  min_match: int = 4, max_match: int = 258,
                  window: int = 32768, parse_seg: int = 8192,
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Tokenize a batch of chunks.

    TPU cost model (measured on v5e): sorts and shifts are fast; arbitrary
    per-element gathers/scatters serialize (~90ms per (128,64K) gather).
    Every stage here is therefore sorts + shifts only:

      * candidates: one stable sort of (hash<<16|pos) carrying 24 bytes of
        per-position context; predecessors in sort order are the exact
        most-recent previous occurrences, and match lengths up to 24 are
        computed by comparing the CARRIED context words — zero gathers
      * un-sort: a second sort keyed on position (a permutation)
      * long matches: saturation doubling — a match saturated at length L
        whose continuation position i+L holds a same-distance match chains
        to L + ml[i+L]; i+L is a static shift, so lengths grow 24→48→…→
        max_match with log rounds of pure shifts
      * greedy parse + compaction: a single device walk emitting one token
        per step (the only gathers left: one (B,)-element lookup per
        emitted token), bounded by the token count, not the byte count

    Args:
      data: (B, n) uint8, zero-padded beyond per-row ``lengths``.
      lengths: (B,) int32 valid byte count per row.
      n: static chunk capacity (power of two, <= 65536).
      min_match: minimum match length (>= 4; hash-4 candidates).
      max_match: cap on emitted match length (258 deflate, larger for LZ4).
      window: max backward distance (32768 deflate).

    Returns:
      tokens: (B, n) uint32 packed tokens; each parse segment's tokens are
              compacted at its own offset (s*parse_seg for segment s).
      ntok:   (B, n // parse_seg) int32 token count per parse segment.
    """
    assert n <= 65536, "position field is 16 bits"
    b = data.shape[0]
    lengths = lengths.astype(jnp.int32)
    pad = jnp.zeros((b, CTX_BYTES + 8), jnp.uint8)
    dp = jnp.concatenate([data, pad], axis=1).astype(jnp.uint32)

    def word4(off):
        return (dp[:, off:off + n]
                | (dp[:, off + 1:off + 1 + n] << 8)
                | (dp[:, off + 2:off + 2 + n] << 16)
                | (dp[:, off + 3:off + 3 + n] << 24))

    ctx = [word4(4 * k) for k in range(CTX_WORDS)]
    w4 = ctx[0]

    iota = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
    hashable = (iota + min_match) <= lengths[:, None]

    h = ((w4 * HASH_MUL) >> np.uint32(32 - HASH_BITS)).astype(jnp.uint32)
    # unhashable positions go to a private overflow bucket
    h = jnp.where(hashable, h, np.uint32(1 << HASH_BITS))

    # --- sort by (hash, pos); context rides along -------------------------
    key = (h << 16) | iota.astype(jnp.uint32)
    sorted_ops = jax.lax.sort((key, *ctx), dimension=1, num_keys=1)
    key_s, ctx_s = sorted_ops[0], sorted_ops[1:]
    pos_s = (key_s & 0xFFFF).astype(jnp.int32)
    h_s = key_s >> 16

    def cand_at(delta):
        """Match (len, dist) against the delta-th predecessor in the same
        hash bucket — pure shifts over the sorted operands."""
        zpad = jnp.zeros((b, delta), jnp.uint32)
        same = jnp.concatenate(
            [jnp.zeros((b, delta), bool),
             h_s[:, delta:] == h_s[:, :-delta]], axis=1)
        dist = pos_s - jnp.concatenate(
            [jnp.zeros((b, delta), jnp.int32), pos_s[:, :-delta]], axis=1)
        ml = jnp.zeros((b, n), jnp.int32)
        alive = same
        for k in range(CTX_WORDS):
            prev = jnp.concatenate([zpad, ctx_s[k][:, :-delta]], axis=1)
            x = ctx_s[k] ^ prev
            full = (x == 0) & alive
            partial = jnp.where(
                alive & ~full,
                ((x & 0xFF) == 0).astype(jnp.int32)
                + ((x & 0xFFFF) == 0).astype(jnp.int32)
                + ((x & 0xFFFFFF) == 0).astype(jnp.int32),
                0)
            ml = ml + jnp.where(full, 4, partial)
            alive = full
        ok = same & (dist >= 1) & (dist <= window) & (ml >= min_match)
        return jnp.where(ok, ml, 0), jnp.where(ok, dist, 1)

    # probe the 6 most recent same-hash predecessors (a deeper chain than
    # zlib L1's max_chain≈4 — each probe is just shifts in the sorted
    # domain); keep the longest match, nearest on ties
    ml_s, dist_s = cand_at(1)
    for delta in (2, 3, 4, 5, 6):
        mld, distd = cand_at(delta)
        better = mld > ml_s
        ml_s = jnp.where(better, mld, ml_s)
        dist_s = jnp.where(better, distd, dist_s)

    # --- un-sort by position (a permutation → exact) ----------------------
    # pack (ml, dist-1) into one operand: sort compile/run cost grows with
    # operand count (ml needs <=15 bits even for LZ4's cap, dist-1 <=15
    # bits for the 32K window)
    packed = (ml_s.astype(jnp.uint32) << 15) | (dist_s - 1).astype(jnp.uint32)
    _, packed_p = jax.lax.sort(
        (pos_s.astype(jnp.uint32), packed), dimension=1, num_keys=1)
    ml = (packed_p >> 15).astype(jnp.int32)
    dist = (packed_p & 0x7FFF).astype(jnp.int32) + 1

    # --- saturation-doubling extension (pure shifts) ----------------------
    cap = CTX_BYTES
    while cap < max_match and cap < n:
        nml = _shl(ml, cap, 0)
        ndist = _shl(dist, cap, 0)
        cont = (ml == cap) & (ndist == dist) & (nml >= min_match)
        ml = jnp.where(cont, jnp.minimum(cap + nml, max_match), ml)
        cap *= 2

    ml = jnp.minimum(ml, lengths[:, None] - iota)
    is_match = ml >= min_match
    ml = jnp.where(is_match, ml, 0)

    # lazy matching (one shift): when the next position holds a strictly
    # longer match, emit this position as a literal so the greedy walk
    # takes the longer one — the zlib lazy-evaluation heuristic, which
    # level 1 doesn't even apply, so this pushes ratio past the baseline
    is_match = is_match & ~(_shl(ml, 1, 0) > ml)
    ml = jnp.where(is_match, ml, 0)

    # --- segment the PARSE (not the match search) -------------------------
    # The walk's cost is (iterations × per-small-gather overhead); breaking
    # each row into parse segments multiplies the rows the walk advances in
    # parallel and divides its iteration count. Matches are trimmed at
    # segment boundaries (distances still reach across segments, so decode
    # semantics are untouched); ratio cost is ~avg_match/segment.
    # NOTE: must precede the literal-run computation — trimmed matches
    # become literals and need run coverage.
    seg = min(parse_seg, n)
    nseg = n // seg
    seg_rem = seg - (iota % seg)
    ml = jnp.minimum(ml, seg_rem)
    is_match = is_match & (ml >= min_match)
    ml = jnp.where(is_match, ml, 0)

    # --- token plane -------------------------------------------------------
    # literal RUN length starting at each position (saturation doubling,
    # pure shifts) — runs collapse to one token each, cutting walk
    # iterations, d2h volume and host-pack token traffic roughly in half
    lr = jnp.where(is_match, 0, 1).astype(jnp.int32)

    def lr_round(k, lr):
        span = jnp.int32(1) << k
        rolled = jnp.roll(lr, -span, axis=1)
        nlr = jnp.where(iota + span < n, rolled, 0)
        return jnp.where(lr == span, lr + nlr, lr)

    lr = jax.lax.fori_loop(0, LITRUN_MAX.bit_length(), lr_round, lr)
    lr = jnp.minimum(lr, LITRUN_MAX)
    lr = jnp.minimum(lr, jnp.maximum(lengths[:, None] - iota, 0))
    lr = jnp.minimum(lr, seg_rem)

    run_tok = TOK_LITRUN_BIT | lr.astype(jnp.uint32)
    match_tok = (TOK_MATCH_BIT
                 | (ml.astype(jnp.uint32) << 16)
                 | (dist - 1).astype(jnp.uint32))
    tok = jnp.where(is_match, match_tok, run_tok).reshape(b * nseg, seg)

    seg_off = jnp.arange(nseg, dtype=jnp.int32) * seg
    seg_lengths = jnp.clip(lengths[:, None] - seg_off[None, :], 0,
                           seg).reshape(b * nseg)

    # --- greedy parse walk: UNROLL tokens per iteration -------------------
    # the step is decoded from the token itself (one gather per token)
    UNROLL = 8
    rows = b * nseg

    def tok_step(cur):
        isl = (cur >> 30) == 1
        ism = (cur >> 31) == 1
        return jnp.where(ism, (cur >> 16) & 0x7FFF,
                         jnp.where(isl, jnp.maximum(cur & 0x3FFF, 1),
                                   1)).astype(jnp.int32)

    def cond(state):
        pos, t, _out, _ntok = state
        return jnp.any(pos < seg_lengths) & (t < seg)

    def body(state):
        pos, t, out, ntok = state
        cols = []
        for _ in range(UNROLL):
            active = pos < seg_lengths
            pc = jnp.clip(pos, 0, seg - 1)[:, None]
            cur = jnp.take_along_axis(tok, pc, axis=1)      # (rows,1)
            st = tok_step(cur[:, 0])
            cols.append(jnp.where(active[:, None], cur, jnp.uint32(0)))
            ntok = ntok + active.astype(jnp.int32)
            pos = jnp.where(active, pos + st, pos)
        out = jax.lax.dynamic_update_slice(
            out, jnp.concatenate(cols, axis=1), (0, t))
        return pos, t + UNROLL, out, ntok

    pos0 = jnp.zeros((rows,), jnp.int32)
    out0 = jnp.zeros((rows, seg), jnp.uint32)
    ntok0 = jnp.zeros((rows,), jnp.int32)
    _, _, tokens, ntok = jax.lax.while_loop(
        cond, body, (pos0, jnp.int32(0), out0, ntok0))
    return tokens.reshape(b, n), ntok.reshape(b, nseg)


# ---------------------------------------------------------------------------
# Host-side helpers
# ---------------------------------------------------------------------------

def merge_segment_tokens(tokens_row: np.ndarray, ntok_row,
                         parse_seg: int = 8192) -> np.ndarray:
    """Concatenate one row's per-segment compacted token slices into a
    single token stream (host-side; each slice is a contiguous memcpy)."""
    segs = np.atleast_1d(np.asarray(ntok_row)).ravel()
    tokens_row = np.asarray(tokens_row)
    if segs.size == 1:
        return tokens_row[: int(segs[0])]
    parts = [tokens_row[s * parse_seg: s * parse_seg + int(c)]
             for s, c in enumerate(segs) if int(c) > 0]
    if not parts:
        return np.zeros(0, np.uint32)
    return np.concatenate(parts)


def tokens_to_bytes(tokens: np.ndarray, ntok: int,
                    src: bytes = b"") -> bytes:
    """Reconstruct the chunk from packed tokens — the CnV-style verify
    oracle (reference runs compress-and-verify on every op,
    src/qatzip.c:1387). ``src`` supplies literal-run bytes."""
    out = bytearray()
    for t in np.asarray(tokens[:ntok], dtype=np.uint32):
        t = int(t)
        if t & 0x80000000:
            ml = (t >> 16) & 0x7FFF
            dist = (t & 0xFFFF) + 1
            start = len(out) - dist
            if start < 0:
                raise ValueError("bad token distance")
            for k in range(ml):
                out.append(out[start + k])
        elif t & 0x40000000:
            run = t & 0x3FFF
            pos = len(out)
            if pos + run > len(src):
                raise ValueError("literal run past end of source")
            out += src[pos:pos + run]
        else:
            out.append(t & 0xFF)
    return bytes(out)

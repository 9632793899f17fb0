"""Batched LZ77 match finding + greedy parse on TPU (XLA-native).

This is the accelerated analog of the reference's hardware compression
pipeline (doCompressIn/doCompressOut, src/qatzip.c:1336-1887): a request is
fanned into ``hw_buff_sz`` chunks, the whole batch is tokenized on device,
and the host stitches the ordered results into framed members.

TPU-first design — no translation of the C hash-chain loop (which would be
a scalar serial loop, death on a vector machine). Every stage is a dense
vector op over the full (batch, chunk) plane:

  1. word packing      — w4[i] = 4 bytes at i, pure shifts/ORs (VPU)
  2. hashing           — multiplicative hash of w4 (VPU)
  3. candidate search  — *exact* most-recent-previous-occurrence per hash
                         via one stable sort of (hash, pos) per row; the
                         predecessor in sort order is the latest j < i with
                         the same hash.  Replaces the serial hash-table
                         insert of the reference (src/qatzip.c LZ77 done in
                         QAT silicon; src/qatzip_sw.c via zlib).
  4. match extension   — 4-byte-word compare loop: a fixed prologue plus a
                         bounded while_loop that exits when every lane's
                         match has ended (the data-dependent part is a
                         whole-batch reduction, not per-lane control flow)
  5. greedy parse      — pointer doubling (log2(N) rounds of gather+scatter)
                         computes exactly the sequential greedy cover
  6. token compaction  — prefix-sum + scatter into a dense token stream

Output tokens are packed uint32:
  literal:  bit31=0, byte in bits [0,8)
  match:    bit31=1, match length in bits [16,31), (dist-1) in bits [0,16)

The host-side entropy stage (Huffman bit-packing / LZ4 byte emit) consumes
these tokens; see csrc/qztpu_native.cpp and parallel/dispatch.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

HASH_BITS = 15
HASH_MUL = np.uint32(2654435761)

TOK_MATCH_BIT = np.uint32(0x80000000)


def _word4(data_pad: jnp.ndarray, n: int) -> jnp.ndarray:
    """w4[:, i] = little-endian uint32 of bytes i..i+3 (data padded by >=3)."""
    d = data_pad.astype(jnp.uint32)
    return (d[:, 0:n]
            | (d[:, 1:n + 1] << 8)
            | (d[:, 2:n + 2] << 16)
            | (d[:, 3:n + 3] << 24))


@functools.partial(jax.jit, static_argnames=("n", "min_match", "max_match",
                                             "window"))
def lz77_tokenize(data: jnp.ndarray, lengths: jnp.ndarray, *, n: int,
                  min_match: int = 4, max_match: int = 258,
                  window: int = 32768) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Tokenize a batch of chunks.

    Args:
      data: (B, n) uint8, zero-padded beyond per-row ``lengths``.
      lengths: (B,) int32 valid byte count per row.
      n: static chunk capacity (power of two).
      min_match: minimum match length (4: hash-4 candidates).
      max_match: cap on emitted match length (258 deflate, larger for LZ4).
      window: max backward distance (32768 deflate, 65535 LZ4).

    Returns:
      tokens: (B, n) uint32 packed tokens (see module docstring).
      ntok:   (B,) int32 token count per row.
    """
    b = data.shape[0]
    lengths = lengths.astype(jnp.int32)
    pad = jnp.zeros((b, 8), jnp.uint8)
    data_pad = jnp.concatenate([data, pad], axis=1)
    w4 = _word4(data_pad, n)

    iota = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
    valid_pos = iota < lengths[:, None]
    # positions that can start a hash-4 match
    hashable = (iota + min_match) <= lengths[:, None]

    h = ((w4 * HASH_MUL) >> np.uint32(32 - HASH_BITS)).astype(jnp.int32)
    # shove unhashable positions into a private overflow bucket so they
    # never become candidates for (or steal predecessors from) real ones
    h = jnp.where(hashable, h, np.int32(1 << HASH_BITS))

    # --- candidate: exact most-recent previous occurrence of h ------------
    # stable sort by hash carries positions ascending within a bucket
    h_s, pos_s = jax.lax.sort((h, iota), dimension=1, is_stable=True,
                              num_keys=1)
    same1 = h_s[:, 1:] == h_s[:, :-1]
    cand_s = jnp.where(same1, pos_s[:, :-1], -1)
    cand_s = jnp.concatenate(
        [jnp.full((b, 1), -1, jnp.int32), cand_s], axis=1)
    # second-most-recent occurrence as an alternate candidate
    same2 = h_s[:, 2:] == h_s[:, :-2]
    cand2_s = jnp.where(same2, pos_s[:, :-2], -1)
    cand2_s = jnp.concatenate(
        [jnp.full((b, 2), -1, jnp.int32), cand2_s], axis=1)

    def _scatter_back(ps, cs):
        return jnp.zeros((n,), jnp.int32).at[ps].set(cs)

    cand = jax.vmap(_scatter_back)(pos_s, cand_s)
    cand2 = jax.vmap(_scatter_back)(pos_s, cand2_s)

    def _match_len(cj):
        dist = iota - cj
        ok = (cj >= 0) & (dist >= 1) & (dist <= window) & hashable
        cjc = jnp.clip(cj, 0, n - 1)
        ok = ok & (jnp.take_along_axis(w4, cjc, axis=1) == w4)
        ml0 = jnp.where(ok, min_match, 0).astype(jnp.int32)
        # hash-4 guarantees only 4 verified bytes even if min_match < 4
        # (min_match >= 4 enforced by callers)

        max_iters = (max_match - min_match) // 4 + 2

        def cond(state):
            _ml, alive, it = state
            return jnp.any(alive) & (it < max_iters)

        def body(state):
            ml, alive, it = state
            ia = jnp.clip(iota + ml, 0, n - 1)
            ja = jnp.clip(cjc + ml, 0, n - 1)
            wi = jnp.take_along_axis(w4, ia, axis=1)
            wj = jnp.take_along_axis(w4, ja, axis=1)
            x = wi ^ wj
            full = (x == 0) & alive
            partial = jnp.where(
                alive & ~full,
                ((x & 0xFF) == 0).astype(jnp.int32)
                + ((x & 0xFFFF) == 0).astype(jnp.int32)
                + ((x & 0xFFFFFF) == 0).astype(jnp.int32),
                0)
            ml = ml + jnp.where(full, 4, partial)
            alive = full & (ml < max_match) & ((iota + ml) < n)
            return ml, alive, it + 1

        alive0 = ok & ((iota + min_match) < n)
        ml, _, _ = jax.lax.while_loop(cond, body,
                                      (ml0, alive0, jnp.int32(0)))
        ml = jnp.minimum(ml, max_match)
        ml = jnp.minimum(ml, lengths[:, None] - iota)
        return jnp.where(ok, ml, 0), dist

    ml1, dist1 = _match_len(cand)
    ml2, dist2 = _match_len(cand2)
    # prefer the nearer candidate on ties (cheaper distance codes)
    use2 = ml2 > ml1
    ml = jnp.where(use2, ml2, ml1)
    dist = jnp.where(use2, dist2, dist1)
    is_match = ml >= min_match

    # --- greedy parse by pointer doubling ---------------------------------
    step = jnp.where(is_match, ml, 1)
    nxt = jnp.minimum(iota + step, n)
    sentinel = jnp.full((b, 1), n, jnp.int32)
    ptr = jnp.concatenate([nxt, sentinel], axis=1)          # (B, n+1)
    mark = jnp.zeros((b, n + 1), jnp.int32).at[:, 0].set(1)
    rounds = max(1, (n).bit_length())                        # ceil(log2)+1

    def parse_round(_, state):
        mark, ptr = state
        t = jnp.where(mark == 1, ptr, n)

        def scat(m, tt):
            return m.at[tt].max(m)

        mark = jax.vmap(scat)(mark, t)
        ptr = jnp.take_along_axis(ptr, ptr, axis=1)
        return mark, ptr

    mark, _ = jax.lax.fori_loop(0, rounds, parse_round, (mark, ptr))
    emit = (mark[:, :n] == 1) & valid_pos

    # --- token pack + compaction ------------------------------------------
    lit_tok = data[:, :n].astype(jnp.uint32)
    match_tok = (TOK_MATCH_BIT
                 | (ml.astype(jnp.uint32) << 16)
                 | (dist - 1).astype(jnp.uint32))
    tok = jnp.where(is_match, match_tok, lit_tok)

    idx = jnp.cumsum(emit.astype(jnp.int32), axis=1) - 1
    ntok = jnp.sum(emit.astype(jnp.int32), axis=1)
    t_idx = jnp.where(emit, idx, n)

    def scat_tok(tt, tk):
        return jnp.zeros((n + 1,), jnp.uint32).at[tt].set(tk)

    tokens = jax.vmap(scat_tok)(t_idx, tok)[:, :n]
    return tokens, ntok


# ---------------------------------------------------------------------------
# Host-side reference decoder (test oracle)
# ---------------------------------------------------------------------------

def tokens_to_bytes(tokens: np.ndarray, ntok: int) -> bytes:
    """Reconstruct the chunk from packed tokens — the CnV-style verify
    oracle (reference runs compress-and-verify on every op,
    src/qatzip.c:1387)."""
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
        else:
            out.append(t & 0xFF)
    return bytes(out)


def unpack_tokens(tokens: np.ndarray, ntok: int):
    """Split packed tokens into (lits u8, lens u16, dists u16) arrays for
    the native bit-packers (len==0 marks a literal)."""
    t = np.asarray(tokens[:ntok], dtype=np.uint32)
    is_match = (t >> 31).astype(bool)
    lens = np.where(is_match, (t >> 16) & 0x7FFF, 0).astype(np.uint16)
    dists = np.where(is_match, (t & 0xFFFF) + 1, 0).astype(np.uint16)
    lits = np.where(is_match, 0, t & 0xFF).astype(np.uint8)
    return lits, lens, dists

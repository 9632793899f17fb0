"""Pallas (Mosaic TPU) kernels for the deflate pack hot path.

The group-window OR-pack (ops/deflate_pack.py) ends with "place every
group's W-word window at its global word offset and OR overlaps" — in
XLA that is a scatter-add over (B, ngroups, W) windows, measured at
~51 ms per 16 MB batch on the v5e (the single largest stage of the
full-device pack, BENCH r2's device_pack_gbps gap). Arbitrary scatters
serialize on TPU; but this scatter is really "OR a 128-word vector at a
dynamic bit... word offset", which Mosaic expresses directly:

  * output rows are (MWR, 128) u32 — 128 words per sublane row
  * a group window (padded to 128 words = one lane row) lands at word
    offset `start`: sublane r0 = start // 128, lane shift start % 128
  * `pltpu.roll` rotates the window within a (1, 256) double-row, and a
    dynamic-sublane store ORs it into rows [r0, r0+2) — both measured
    supported on v5e Mosaic (tools/devprims.py probes)

One grid step per batch row; the per-row loop over groups runs on the
scalar core while the VPU ORs — the kernel replaces the 51 ms scatter
with ~1.4 ms/128 rows (probe 31_k1k3b: k1_assemble).

This is the accelerator-speed role the QAT silicon's compress engine
plays in the reference hot loop (/root/reference/src/qatzip.c:1445) —
the bit-packing stage runs at hardware speed instead of serializing.

The same kernel serves the static packer (GROUP_W=74 -> padded 128) and
the dynamic packer (DYN_GROUP_W=99 -> padded 128).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WP = 128          # padded window words = one lane row


def _assemble_kernel(wo_ref, grp_ref, out_ref, *, ngroups: int, mwr: int):
    """OR each of ngroups (1, WP)-word windows into (1, mwr, WP) output
    at its word offset wo[g] (monotone, in [0, (mwr-2)*WP])."""
    i = pl.program_id(0)
    out_ref[:] = jnp.zeros((1, mwr, WP), jnp.uint32)

    def body(g, _):
        start = wo_ref[i, g]
        r0 = start // WP
        sft = start % WP
        w = grp_ref[0, pl.ds(g, 1), :]               # (1, WP)
        win = jnp.concatenate(
            [w.reshape(1, WP), jnp.zeros((1, WP), jnp.uint32)], axis=1)
        win = pltpu.roll(win, sft, 1)                # (1, 2*WP)
        cur = out_ref[0, pl.ds(r0, 2), :]
        out_ref[0, pl.ds(r0, 2), :] = cur | win.reshape(2, WP)
        return 0

    jax.lax.fori_loop(0, ngroups, body, 0)


def _lookup_kernel(lit_ref, dist_ref, sym_ref, dsym_ref, lout_ref, dout_ref,
                   *, rpb: int):
    """Per-row Huffman table lookup: 286-entry lit/len table as 3 lane
    subtables selected by sym>>7 + a lane-gather on sym&127; 30-entry
    distance table as one subtable. Lane dynamic_gather runs at
    ~3.7G elem/s on v5e (tools/devprims.py) — the XLA alternative is a
    sort-merge over width n+286, which XLA pads to the next power of two
    (131072 for 64K chunks)."""
    t0 = jnp.broadcast_to(lit_ref[0, 0:1, :], (rpb, 128))
    t1 = jnp.broadcast_to(lit_ref[0, 1:2, :], (rpb, 128))
    t2 = jnp.broadcast_to(lit_ref[0, 2:3, :], (rpb, 128))
    sym = sym_ref[:]
    lo = sym & 127
    hi = sym >> 7
    g0 = jnp.take_along_axis(t0, lo, axis=1)
    g1 = jnp.take_along_axis(t1, lo, axis=1)
    g2 = jnp.take_along_axis(t2, lo, axis=1)
    lout_ref[:] = jnp.where(hi == 0, g0, jnp.where(hi == 1, g1, g2))
    td = jnp.broadcast_to(dist_ref[0, 0:1, :], (rpb, 128))
    dout_ref[:] = jnp.take_along_axis(td, dsym_ref[:], axis=1)


@functools.partial(jax.jit, static_argnames=("n", "interpret"))
def huffman_lookup(lit_pack: jnp.ndarray, dist_pack: jnp.ndarray,
                   sym: jnp.ndarray, dsym: jnp.ndarray, *, n: int,
                   interpret: bool = False):
    """Resolve per-position codes against per-chunk Huffman tables.

    Args:
      lit_pack:  (B, 286) uint32 packed lit/len codes (code | len<<12).
      dist_pack: (B, 30) uint32 packed distance codes.
      sym:  (B, n) int32 lit/len symbol in [0, 286] (286 -> pack 0).
      dsym: (B, n) int32 distance symbol in [0, 30).
    Returns:
      (lpack, dpack): (B, n) uint32 table entries per position.
    """
    b = sym.shape[0]
    rpb = n // 128
    lit3 = jnp.pad(lit_pack, ((0, 0), (0, 384 - 286))).reshape(b, 3, 128)
    dist1 = jnp.pad(dist_pack, ((0, 0), (0, 128 - 30))).reshape(b, 1, 128)
    lout, dout = pl.pallas_call(
        functools.partial(_lookup_kernel, rpb=rpb),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, 3, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((rpb, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((rpb, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((rpb, 128), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((rpb, 128), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((b * rpb, 128), jnp.uint32),
                   jax.ShapeDtypeStruct((b * rpb, 128), jnp.uint32)],
        interpret=interpret,
    )(lit3, dist1, sym.reshape(b * rpb, 128), dsym.reshape(b * rpb, 128))
    return lout.reshape(b, n), dout.reshape(b, n)


def _flat_shift_up(x, delta: int, lane, fill):
    """y[j] = x[j - delta] over the FLAT (S*128) sequence of a (S, 128)
    sublane-major block (delta < 128); the first delta flat elements get
    ``fill`` via the caller's mask (they wrap — callers guard with an
    idx >= delta mask)."""
    y = pltpu.roll(x, delta, axis=1)
    y_prev = pltpu.roll(y, 1, axis=0)
    del fill
    return jnp.where(lane >= delta, y, y_prev)


def _candsearch_kernel(key_ref, c0_ref, c1_ref, c2_ref, c3_ref, out_ref, *,
                       w: int, probes: int, ctx_words: int, min_match: int,
                       pbits: int):
    """Fused candidate search for one window: bitonic sort by
    (hash | relpos) key, context gather, predecessor probes, bitonic
    unsort — everything stays in VMEM.

    XLA's lax.sort materializes every compare-exchange stage to HBM
    (~58 GB per 16 MB batch for the 5-operand sort + unsort pair, the
    measured 45+13 ms floor of the tokenizer). Here the sort runs on a
    SINGLE u32 operand (the key), context words are fetched afterwards
    with a 64-row select-gather, and the unsort packs (pos, ml, dist)
    into 31 bits so it is single-operand too.
    """
    S = w // 128
    key = key_ref[:]                              # (S, 128) uint32
    srow = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 1)
    idx = srow * 128 + lane

    def bitonic(x):
        """Ascending bitonic sort of unique u32 keys over the flat
        (S*128) sequence (sublane-major)."""
        for kk in [1 << j for j in range(1, w.bit_length())]:
            d = kk // 2
            while d >= 1:
                if d < 128:
                    left = pltpu.roll(x, 128 - d, axis=1)   # x[i + d]
                    right = pltpu.roll(x, d, axis=1)        # x[i - d]
                else:
                    m = d // 128
                    left = jnp.concatenate(
                        [x[m:, :], x[:m, :]], axis=0)
                    right = jnp.concatenate(
                        [x[-m:, :], x[:-m, :]], axis=0)
                lower = (idx & d) == 0
                px = jnp.where(lower, left, right)
                asc = (idx & kk) == 0 if kk < w else (idx >= 0)
                gt = x > px
                lt = x < px
                # take = where(asc == lower, gt, lt) as pure boolean
                # algebra — Mosaic cannot select between i1 vectors
                flip = asc ^ lower
                take = (~flip & gt) | (flip & lt)
                x = jnp.where(take, px, x)
                d //= 2
        return x

    key = bitonic(key)
    pos_s = (key & jnp.uint32((1 << pbits) - 1)).astype(jnp.int32)
    h_s = key >> pbits

    # --- context gather: ctx[pos_s] via 64-row select + lane gather ----
    t_srow = pos_s >> 7
    t_lane = pos_s & 127
    ctx_refs = [c0_ref, c1_ref, c2_ref, c3_ref][:ctx_words]
    ctx_s = []
    for cref in ctx_refs:
        c = cref[:]
        g = jnp.zeros((S, 128), jnp.uint32)
        for r in range(S):
            rowvals = jnp.broadcast_to(c[r:r + 1, :], (S, 128))
            gr = jnp.take_along_axis(rowvals, t_lane, axis=1)
            g = jnp.where(t_srow == r, gr, g)
        ctx_s.append(g)

    # --- probe the `probes` most recent same-hash predecessors --------
    best_ml = jnp.zeros((S, 128), jnp.int32)
    best_d1 = jnp.zeros((S, 128), jnp.int32)     # dist - 1
    for delta in range(1, probes + 1):
        guard = idx >= delta
        hp = _flat_shift_up(h_s, delta, lane, 0)
        pp = _flat_shift_up(pos_s, delta, lane, 0)
        same = guard & (h_s == hp)
        dist = pos_s - pp
        ml = jnp.zeros((S, 128), jnp.int32)
        alive = same
        for kc in range(ctx_words):
            prev = _flat_shift_up(ctx_s[kc], delta, lane, 0)
            x = ctx_s[kc] ^ prev
            full = (x == 0) & alive
            partial = jnp.where(
                alive & ~full,
                ((x & 0xFF) == 0).astype(jnp.int32)
                + ((x & 0xFFFF) == 0).astype(jnp.int32)
                + ((x & 0xFFFFFF) == 0).astype(jnp.int32),
                0)
            ml = ml + jnp.where(full, 4, partial)
            alive = full
        ok = same & (dist >= 1) & (ml >= min_match)
        ml = jnp.where(ok, ml, 0)
        d1 = jnp.where(ok, dist - 1, 0)
        better = ml > best_ml
        best_ml = jnp.where(better, ml, best_ml)
        best_d1 = jnp.where(better, d1, best_d1)

    # --- unsort: single-operand bitonic on (pos << 18 | ml << 13 | d1) -
    packed = ((pos_s.astype(jnp.uint32) << 18)
              | (best_ml.astype(jnp.uint32) << 13)
              | best_d1.astype(jnp.uint32))
    out_ref[:] = bitonic(packed)


@functools.partial(jax.jit, static_argnames=("w", "probes", "ctx_words",
                                             "min_match", "pbits",
                                             "interpret"))
def candidate_search(key: jnp.ndarray, ctx, *, w: int, probes: int,
                     ctx_words: int, min_match: int, pbits: int,
                     interpret: bool = False) -> jnp.ndarray:
    """Fused sort->probe->unsort candidate search over window rows.

    Args:
      key: (rows, w) uint32, (hash << pbits) | relpos, keys unique per
           row; w must be a power of two, <= 2**pbits * anything s.t.
           pbits + 5 + pbits <= 31 (pos 13 + ml 5 + dist 13 for w=8192).
      ctx: list of ctx_words (rows, w) uint32 context planes.
    Returns:
      (rows, w) uint32: (relpos << 18) | (ml << 13) | (dist - 1), in
      window-position order; ml <= 16 (extension happens outside), ml=0
      where no candidate matched.
    """
    rows = key.shape[0]
    S = w // 128
    specs = [pl.BlockSpec((S, 128), lambda i: (i, 0),
                          memory_space=pltpu.VMEM) for _ in range(5)]
    cs = list(ctx) + [ctx[0]] * (4 - len(ctx))
    out = pl.pallas_call(
        functools.partial(_candsearch_kernel, w=w, probes=probes,
                          ctx_words=ctx_words, min_match=min_match,
                          pbits=pbits),
        grid=(rows,),
        in_specs=specs,
        out_specs=pl.BlockSpec((S, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows * S, 128), jnp.uint32),
        interpret=interpret,
    )(key.reshape(rows * S, 128),
      *[c.reshape(rows * S, 128) for c in cs])
    return out.reshape(rows, w)


NBINS = 316       # lit/len symbols 0..285 + distance symbols 286..315


def _hist_kernel(sym_ref, dsym_ref, out_ref, *, rpb: int):
    """Per-row symbol histogram, everything in VMEM.

    The XLA strip formulation (compare sym against 32-symbol strips and
    reduce) materializes (B, n, 32) intermediates to HBM — measured
    ~190 ms per 16 MB batch, which made dynamic pass 1 the flagship-mode
    bottleneck (57 MB/s). Here the (NBINS, 8, 128) compare-accumulate
    never leaves VMEM: bins ride the sublane-outer axis, 1024 positions
    per step. Distance symbols occupy only bins 286..315, so they get a
    32-bin accumulator instead of a full-width one."""
    bins = jax.lax.broadcasted_iota(jnp.int32, (320, 1, 1), 0)
    dbins = bins[:32] + 284  # dsym_ref carries 286+dsym; 284..315 covers

    def body(i, accs):
        acc, acc_d = accs
        blk = sym_ref[pl.ds(i * 8, 8), :]            # (8, 128)
        dblk = dsym_ref[pl.ds(i * 8, 8), :]
        acc = acc + (bins == blk[None, :, :]).astype(jnp.int32)
        acc_d = acc_d + (dbins == dblk[None, :, :]).astype(jnp.int32)
        return acc, acc_d

    acc0 = jnp.zeros((320, 8, 128), jnp.int32)
    acc0_d = jnp.zeros((32, 8, 128), jnp.int32)
    acc, acc_d = jax.lax.fori_loop(0, rpb // 8, body, (acc0, acc0_d))
    # Mosaic restriction: a both-trailing-dims reduce must end in a
    # size-1 trailing axis — reduce in two stages to (320, 1)
    hist = acc.sum(axis=1).sum(axis=1, keepdims=True)
    hist_d = acc_d.sum(axis=1).sum(axis=1, keepdims=True)
    out_ref[0] = hist + jnp.pad(hist_d, ((284, 4), (0, 0)))


@functools.partial(jax.jit, static_argnames=("n", "interpret"))
def symbol_histogram(sym: jnp.ndarray, dsym: jnp.ndarray, *, n: int,
                     interpret: bool = False) -> jnp.ndarray:
    """Per-row histogram over the 316 deflate symbols.

    Args:
      sym:  (B, n) int32 lit/len symbol in [0, 285], or >= NBINS for
            positions that emit nothing.
      dsym: (B, n) int32 distance symbol + 286 for taken matches, else
            >= NBINS.
    Returns:
      (B, 316) int32 counts (lit/len 0..285, distances 286..315).
    """
    b = sym.shape[0]
    rpb = n // 128
    out = pl.pallas_call(
        functools.partial(_hist_kernel, rpb=rpb),
        grid=(b,),
        in_specs=[pl.BlockSpec((rpb, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((rpb, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 320, 1), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 320, 1), jnp.int32),
        interpret=interpret,
    )(sym.reshape(b * rpb, 128), dsym.reshape(b * rpb, 128))
    return out.reshape(b, 320)[:, :NBINS]


@functools.partial(jax.jit, static_argnames=("max_words", "interpret"))
def assemble_windows(grp: jnp.ndarray, wo: jnp.ndarray, *, max_words: int,
                     interpret: bool = False) -> jnp.ndarray:
    """Place group windows at word offsets, OR-combining overlaps.

    Args:
      grp: (B, ngroups, W) uint32 windows, W <= 128 (padded to 128 here).
      wo:  (B, ngroups) int32 word offset per window, monotone
           nondecreasing along groups, wo + W <= max_words + slack.
      max_words: output words per row.
    Returns:
      (B, max_words) uint32 — scatter-add equivalent (overlapping words
      carry disjoint bits by construction, so OR == add).
    """
    b, ngroups, w = grp.shape
    if w < WP:
        grp = jnp.pad(grp, ((0, 0), (0, 0), (0, WP - w)))
    # +2 guard rows: a window at the last legal offset rolls into r0+1
    mwr = -(-max_words // WP) + 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, ngroups, WP), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, mwr, WP), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_assemble_kernel, ngroups=ngroups, mwr=mwr),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, mwr, WP), jnp.uint32),
        interpret=interpret,
    )(wo, grp)
    return out.reshape(b, mwr * WP)[:, :max_words]

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

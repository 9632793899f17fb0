#!/usr/bin/env python
"""devprims — measure TPU primitive costs that drive the Pallas sort design.

One warm process (axon first-program cost ~450s), one JSON line per case,
each case isolated in try/except so an unsupported lowering doesn't kill
the sweep. Timing materializes a host scalar per iteration (the axon
relay's block_until_ready does not wait for execution — CLAUDE.md).

Cases:
  sort1/sort2/sort5      lax.sort baselines on (B, 65536) u32 rows
  sortseg2-<s>           2-op lax.sort on segmented rows (B*65536/s, s)
  xla_gather             jnp.take_along_axis outside Pallas (the ~86M/s claim)
  pl_gather_lane         Pallas lane gather (R,128) idx<128  [tpu.dynamic_gather]
  pl_gather_lane_wide    Pallas lane gather (R,1024) idx<1024
  pl_gather_sublane      Pallas sublane gather (512,128) axis0 idx<512
  pl_roll_static/dyn     Pallas roll, static vs traced shift
  pl_bitonic128          Pallas 28-stage bitonic sort of 128-lane rows (roll trick)
  lax_sort128            lax.sort of the same (R,128) rows for comparison
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

B = int(os.environ.get("PRIMS_B", "128"))
N = 65536
ITERS = int(os.environ.get("PRIMS_ITERS", "3"))


def run_case(name, fn, nbytes):
    """fn() -> python int (materialized). Prints one JSON line."""
    try:
        t0 = time.perf_counter()
        fn()
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(ITERS):
            t0 = time.perf_counter()
            fn()
            times.append(time.perf_counter() - t0)
        best = min(times)
        print(json.dumps({
            "case": name, "compile_s": round(compile_s, 1),
            "best_ms": round(best * 1e3, 3),
            "gbps": round(nbytes / best / 1e9, 3),
        }), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({
            "case": name,
            "error": f"{type(e).__name__}: {str(e)[:300]}"}), flush=True)
        if os.environ.get("PRIMS_TRACE"):
            traceback.print_exc()


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interp = jax.default_backend() == "cpu"

    rng = np.random.default_rng(7)
    keys = rng.integers(0, 1 << 31, (B, N), dtype=np.uint32)
    ctx = [rng.integers(0, 1 << 32, (B, N), dtype=np.uint32)
           for _ in range(4)]
    dk = jax.device_put(keys)
    dctx = [jax.device_put(c) for c in ctx]

    # ---- lax.sort baselines ------------------------------------------------
    @functools.partial(jax.jit, static_argnames=("nops",))
    def sort_n(k, c, nops):
        ops = (k, *c[:nops - 1])
        out = jax.lax.sort(ops, dimension=1, num_keys=1)
        return sum(jnp.sum(o) for o in out).astype(jnp.uint32)

    for nops in (1, 2, 5):
        run_case(f"sort{nops}", lambda nops=nops: int(sort_n(dk, dctx, nops)),
                 B * N * 4 * nops)

    # ---- segmented 2-op sort ----------------------------------------------
    @functools.partial(jax.jit, static_argnames=("s",))
    def sort_seg(k, c, s):
        ks = k.reshape(-1, s)
        cs = c.reshape(-1, s)
        out = jax.lax.sort((ks, cs), dimension=1, num_keys=1)
        return (jnp.sum(out[0]) + jnp.sum(out[1])).astype(jnp.uint32)

    for s in (8192, 2048):
        run_case(f"sortseg2-{s}",
                 lambda s=s: int(sort_seg(dk, dctx[0], s)), B * N * 8)

    # ---- XLA gather --------------------------------------------------------
    idx_w = jax.device_put(
        rng.integers(0, N, (B, N)).astype(np.int32))

    @jax.jit
    def xgather(x, idx):
        return jnp.sum(jnp.take_along_axis(x, idx, axis=1)
                       ).astype(jnp.uint32)

    run_case("xla_gather", lambda: int(xgather(dk, idx_w)), B * N * 4)

    # ---- Pallas gathers ----------------------------------------------------
    def pl_gather(axis, R, C):
        x = jax.device_put(
            rng.integers(0, 1 << 31, (R, C), dtype=np.uint32))
        hi = C if axis == 1 else R
        idx = jax.device_put(rng.integers(0, hi, (R, C)).astype(np.int32))

        def kern(x_ref, i_ref, o_ref):
            o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=axis)

        @jax.jit
        def go(x, idx):
            out = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((R, C), jnp.uint32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                interpret=interp,
            )(x, idx)
            return jnp.sum(out).astype(jnp.uint32)

        return lambda: int(go(x, idx)), R * C * 4

    for name, axis, R, C in (
            ("pl_gather_lane", 1, N // 128 * B, 128),
            ("pl_gather_lane_wide", 1, 8192, 1024),
            ("pl_gather_sublane", 0, 512, 128)):
        try:
            fn, nb = pl_gather(axis, R, C)
            run_case(name, fn, nb)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"case": name,
                              "error": str(e)[:300]}), flush=True)

    # ---- Pallas rolls ------------------------------------------------------
    x512 = jax.device_put(
        rng.integers(0, 1 << 31, (4096, 128), dtype=np.uint32))

    def roll_static_kern(x_ref, o_ref):
        acc = x_ref[:]
        for k in (1, 2, 4, 8, 16, 32, 64):
            acc = acc + pltpu.roll(x_ref[:], k, 1)
        o_ref[:] = acc

    @jax.jit
    def roll_static(x):
        out = pl.pallas_call(
            roll_static_kern,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interp,
        )(x)
        return jnp.sum(out).astype(jnp.uint32)

    run_case("pl_roll_static7", lambda: int(roll_static(x512)),
             x512.size * 4 * 7)

    def roll_dyn_kern(s_ref, x_ref, o_ref):
        acc = x_ref[:]
        for k in range(7):
            acc = acc + pltpu.roll(x_ref[:], s_ref[k], 1)
        o_ref[:] = acc

    @jax.jit
    def roll_dyn(x, shifts):
        out = pl.pallas_call(
            roll_dyn_kern,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interp,
        )(shifts, x)
        return jnp.sum(out).astype(jnp.uint32)

    shifts = jax.device_put(np.array([1, 3, 9, 27, 31, 77, 111], np.int32))
    run_case("pl_roll_dyn7", lambda: int(roll_dyn(x512, shifts)),
             x512.size * 4 * 7)

    # ---- Pallas bitonic sort of 128-lane rows (key + 1 payload) -----------
    R = N // 128 * B  # all rows of the (B, N) problem as 128-lane segments

    def bitonic_kern(k_ref, v_ref, ko_ref, vo_ref):
        k = k_ref[:]
        v = v_ref[:]
        lane = jax.lax.broadcasted_iota(jnp.int32, k.shape, 1)
        size = 2
        while size <= 128:
            j = size >> 1
            while j >= 1:
                pk = jnp.where((lane & j) == 0,
                               pltpu.roll(k, 128 - j, 1),
                               pltpu.roll(k, j, 1))
                pv = jnp.where((lane & j) == 0,
                               pltpu.roll(v, 128 - j, 1),
                               pltpu.roll(v, j, 1))
                up = (lane & size) == 0
                lower = (lane & j) == 0
                take_min = lower == up
                swap = jnp.where(take_min, pk < k, pk > k)
                k = jnp.where(swap, pk, k)
                v = jnp.where(swap, pv, v)
                j >>= 1
            size <<= 1
        ko_ref[:] = k
        vo_ref[:] = v

    @jax.jit
    def bitonic(k, v):
        ko, vo = pl.pallas_call(
            bitonic_kern,
            out_shape=(jax.ShapeDtypeStruct((R, 128), jnp.uint32),
                       jax.ShapeDtypeStruct((R, 128), jnp.uint32)),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 2,
            interpret=interp,
        )(k, v)
        return (jnp.sum(ko) + jnp.sum(vo)).astype(jnp.uint32)

    k128 = jax.device_put(keys.reshape(R, 128))
    v128 = jax.device_put(ctx[0].reshape(R, 128))
    run_case("pl_bitonic128", lambda: int(bitonic(k128, v128)), R * 128 * 8)

    @jax.jit
    def lax_sort128(k, v):
        out = jax.lax.sort((k, v), dimension=1, num_keys=1)
        return (jnp.sum(out[0]) + jnp.sum(out[1])).astype(jnp.uint32)

    run_case("lax_sort128", lambda: int(lax_sort128(k128, v128)),
             R * 128 * 8)

    # correctness spot-check of the bitonic network (tiny, on host)
    try:
        ks, vs = pl.pallas_call(
            bitonic_kern,
            out_shape=(jax.ShapeDtypeStruct((R, 128), jnp.uint32),
                       jax.ShapeDtypeStruct((R, 128), jnp.uint32)),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 2,
            interpret=interp,
        )(k128, v128)
        ok = bool((np.asarray(ks[:4]) ==
                   np.sort(keys.reshape(R, 128)[:4], axis=1)).all())
        print(json.dumps({"case": "bitonic128_correct", "ok": ok}),
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"case": "bitonic128_correct",
                          "error": str(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""devstages — isolate device pipeline stage costs on the real TPU.

Each stage is its own jit (sequential compiles; keep the machine idle).
Timing forces host materialization per iteration (axon relay rule).

  python tools/devstages.py --b 128 --stages sync,sort1,analyze,full
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def measure(fn, args, iters):
    t0 = time.perf_counter()
    int(fn(*args))
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        int(fn(*args))
        times.append(time.perf_counter() - t0)
    return compile_s, min(times)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--b", type=int, default=128)
    p.add_argument("--n", type=int, default=65536)
    p.add_argument("--seg", type=int, default=8192)
    p.add_argument("--ctx", type=int, default=4)
    p.add_argument("--probes", type=int, default=6)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--stages", default="sync,sort1,analyze,full")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from qatzip_tpu.ops import lz77 as L

    from devperf import corpus_batch
    data = corpus_batch(args.b, args.n)
    lengths = np.full(args.b, args.n, np.int32)
    dd = jax.device_put(data)
    ll = jax.device_put(lengths)
    n, b = args.n, args.b

    @jax.jit
    def st_sync(data, lengths):
        return (jnp.sum(data.astype(jnp.uint32))
                + jnp.sum(lengths).astype(jnp.uint32))

    @jax.jit
    def st_sort1(data, lengths):
        # main 5-operand sort + candidate probing (no unsort/parse)
        ctx_bytes = args.ctx * 4
        pad = jnp.zeros((b, ctx_bytes + 8), jnp.uint8)
        dp = jnp.concatenate([data, pad], axis=1).astype(jnp.uint32)

        def word4(off):
            return (dp[:, off:off + n] | (dp[:, off + 1:off + 1 + n] << 8)
                    | (dp[:, off + 2:off + 2 + n] << 16)
                    | (dp[:, off + 3:off + 3 + n] << 24))
        ctx = [word4(4 * k) for k in range(args.ctx)]
        iota = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
        h = ((ctx[0] * L.HASH_MUL) >> np.uint32(32 - L.HASH_BITS)).astype(
            jnp.uint32)
        key = (h << 16) | iota.astype(jnp.uint32)
        sorted_ops = jax.lax.sort((key, *ctx), dimension=1, num_keys=1)
        return sum(jnp.sum(o) for o in sorted_ops).astype(jnp.uint32)

    @jax.jit
    def st_analyze(data, lengths):
        iota, ml, dist, taken, lit, valid = L._analyze(
            data, lengths, n=n, min_match=4, max_match=258, window=32768,
            parse_seg=args.seg, ctx_words=args.ctx, probes=args.probes)
        return (jnp.sum(ml) + jnp.sum(dist)
                + jnp.sum(taken) + jnp.sum(lit)).astype(jnp.uint32)

    @functools.partial(jax.jit, static_argnames=())
    def st_full(data, lengths):
        toks, ntok = L.lz77_tokenize(data, lengths, n=n, parse_seg=args.seg,
                                     ctx_words=args.ctx, probes=args.probes)
        return (jnp.sum(toks.astype(jnp.uint32))
                + jnp.sum(ntok).astype(jnp.uint32))

    stages = {"sync": st_sync, "sort1": st_sort1, "analyze": st_analyze,
              "full": st_full}
    out = {"b": b, "n": n, "seg": args.seg, "ctx": args.ctx,
           "backend": jax.default_backend()}
    for name in args.stages.split(","):
        compile_s, best = measure(stages[name], (dd, ll), args.iters)
        out[name] = {"compile_s": round(compile_s, 1),
                     "best_ms": round(best * 1000, 2)}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

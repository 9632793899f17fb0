#!/usr/bin/env python
"""devsweep — measure many tokenizer/pack configs in ONE process.

The axon backend costs ~450s for the first program of a process; each
further graph compiles in ~20s. So all variants are swept here in one
process, in sequence (one JSON line each).
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from qatzip_tpu.ops.lz77 import lz77_tokenize
    from qatzip_tpu.ops.deflate_pack import deflate_pack_device
    from devperf import corpus_batch

    iters = int(os.environ.get("SWEEP_ITERS", "3"))
    n = 65536
    data512 = corpus_batch(512, n)
    cases = []
    for b in (128, 256, 512):
        for ctx in (4, 2):
            cases.append(("tok", b, ctx))
    for b in (128, 256):
        cases.append(("pack", b, 4))

    put = {}

    def get_batch(b):
        if b not in put:
            put[b] = (jax.device_put(data512[:b]),
                      jax.device_put(np.full(b, n, np.int32)))
        return put[b]

    @functools.partial(jax.jit, static_argnames=("n", "ctx"))
    def tok_step(data, lengths, n, ctx):
        toks, ntok = lz77_tokenize(data, lengths, n=n, ctx_words=ctx)
        return (jnp.sum(toks.astype(jnp.uint32))
                + jnp.sum(ntok).astype(jnp.uint32))

    @functools.partial(jax.jit, static_argnames=("n", "ctx"))
    def pack_step(data, lengths, n, ctx):
        words, nbits = deflate_pack_device(data, lengths, n=n, ctx_words=ctx)
        return jnp.sum(words) + jnp.sum(nbits).astype(jnp.uint32)

    for kind, b, ctx in cases:
        dd, ll = get_batch(b)
        fn = tok_step if kind == "tok" else pack_step
        t0 = time.perf_counter()
        int(fn(dd, ll, n, ctx))
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            int(fn(dd, ll, n, ctx))
            times.append(time.perf_counter() - t0)
        best = min(times)
        print(json.dumps({
            "kind": kind, "b": b, "ctx": ctx,
            "compile_s": round(compile_s, 1),
            "best_ms": round(best * 1000, 2),
            "mbps": round(b * n / 1e6 / best, 1),
        }), flush=True)


if __name__ == "__main__":
    main()

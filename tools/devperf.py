#!/usr/bin/env python
"""devperf — stage-level device timing for the tokenizer pipeline.

Measures per-iteration wall time of the jitted tokenize graph with forced
host materialization (the axon relay's block_until_ready does not wait for
remote execution — see CLAUDE.md). One JSON line per configuration.

Usage:
  python tools/devperf.py --b 128 --seg 8192 --ctx 4 --probes 6 --iters 3
  JAX_PLATFORMS=cpu python tools/devperf.py ...   # CPU-relative numbers
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


def corpus_batch(b: int, n: int) -> np.ndarray:
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import make_corpus
    blob = make_corpus(max(1, (b * n) >> 20))
    data = np.zeros((b, n), np.uint8)
    mv = memoryview(blob)
    for i in range(b):
        data[i] = np.frombuffer(mv[i * n:(i + 1) * n], np.uint8)
    return data


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--b", type=int, default=128)
    p.add_argument("--n", type=int, default=65536)
    p.add_argument("--seg", type=int, default=8192)
    p.add_argument("--ctx", type=int, default=4)
    p.add_argument("--probes", type=int, default=6)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--stage", default="full", choices=["full", "match"])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from qatzip_tpu.ops.lz77 import lz77_tokenize

    data = corpus_batch(args.b, args.n)
    lengths = np.full(args.b, args.n, np.int32)
    dd = jax.device_put(data)
    ll = jax.device_put(lengths)

    @functools.partial(jax.jit, static_argnames=("n", "seg", "ctx", "probes"))
    def step(data, lengths, n, seg, ctx, probes):
        toks, ntok = lz77_tokenize(data, lengths, n=n, parse_seg=seg,
                                   ctx_words=ctx, probes=probes)
        return (jnp.sum(toks.astype(jnp.uint32))
                + jnp.sum(ntok).astype(jnp.uint32))

    t0 = time.perf_counter()
    int(step(dd, ll, args.n, args.seg, args.ctx, args.probes))
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        int(step(dd, ll, args.n, args.seg, args.ctx, args.probes))
        times.append(time.perf_counter() - t0)
    best = min(times)
    mb = args.b * args.n / 1e6
    print(json.dumps({
        "b": args.b, "n": args.n, "seg": args.seg, "ctx": args.ctx,
        "probes": args.probes, "backend": jax.default_backend(),
        "compile_s": round(compile_s, 1),
        "best_ms": round(best * 1000, 2),
        "all_ms": [round(t * 1000, 2) for t in times],
        "mbps": round(mb / best, 1),
    }))


if __name__ == "__main__":
    main()

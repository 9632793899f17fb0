#!/usr/bin/env python
"""dynperf — measure the dynamic two-pass device pack rate on the real
TPU (histogram pass + host tree build + pack pass, per batch size).
Run in ONE warm process like tools/devsweep.py."""
import sys, os, time, json, functools
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np
import jax, jax.numpy as jnp
from qatzip_tpu.ops.deflate_pack import deflate_analyze_hist, deflate_pack_dynamic
from qatzip_tpu import native
from devperf import corpus_batch
n = 65536
for b in (128, 256):
    data = corpus_batch(b, n)
    dd = jax.device_put(data); ll = jax.device_put(np.full(b, n, np.int32))
    def run_once():
        hist, ml, dist, taken, lit = deflate_analyze_hist(dd, ll, n=n)
        hist_np = np.asarray(hist)          # forces pass-1 completion
        packs = np.zeros((b, 286), np.uint16); dpacks = np.zeros((b, 30), np.uint16)
        hbits = np.zeros(b, np.int32)
        for i in range(b):
            lf = hist_np[i, :286].astype(np.uint32); lf[256] += 1
            packs[i], dpacks[i], _h, hbits[i] = native.lib.dyn_plan(
                lf, hist_np[i, 286:].astype(np.uint32))
        words, nbits = deflate_pack_dynamic(dd, ml, dist, taken, lit,
            jnp.asarray(packs.astype(np.uint32)), jnp.asarray(dpacks.astype(np.uint32)),
            jnp.asarray(hbits), n=n)
        return int(jnp.sum(words)) + int(jnp.sum(nbits))
    t0 = time.perf_counter(); run_once(); compile_s = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter(); run_once(); times.append(time.perf_counter() - t0)
    best = min(times)
    print(json.dumps({"kind": "dynpack2pass", "b": b, "compile_s": round(compile_s,1),
                      "best_ms": round(best*1000,2), "mbps": round(b*n/1e6/best,1)}), flush=True)

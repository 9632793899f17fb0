# Round-4 stage baseline on the warm devserver: tokenize compute and full
# static-pack compute per 16 MB batch (256x64K), forced per-iteration
# materialization (axon timing rule). Compare vs round-3: 50.7 / 89.7 ms.
import functools
import numpy as np
import sys
sys.path.insert(0, "/root/repo")
from bench import make_corpus, _device_batch, _engine_knobs
from qatzip_tpu.ops.lz77 import lz77_tokenize
from qatzip_tpu.ops.deflate_pack import deflate_pack_device

corpus = make_corpus(16)
n = 65536
ss, ov, cs = _engine_knobs(n)[:3]
dd, ll = _device_batch(corpus, 256, n)

@functools.partial(jax.jit, static_argnames=("n",))
def tok(data, lengths, n):
    t, k = lz77_tokenize(data, lengths, n=n, ctx_words=4, search_seg=ss,
                         search_overlap=ov, compact_seg=cs)
    return jnp.sum(t.astype(jnp.uint32)) + jnp.sum(k).astype(jnp.uint32)

@functools.partial(jax.jit, static_argnames=("n",))
def pack(data, lengths, n):
    w, b = deflate_pack_device(data, lengths, n=n, search_seg=ss,
                               search_overlap=ov)
    return jnp.sum(w) + jnp.sum(b).astype(jnp.uint32)

for name, fn in (("tokenize", tok), ("static_pack", pack)):
    int(fn(dd, ll, n))          # compile
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        int(fn(dd, ll, n))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1e3:.1f} ms/16MB = {16/best/1e3:.3f} GB/s")

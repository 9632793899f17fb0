# k2 kernel cost attribution: time the full fused candidate_search vs a
# sort-only bitonic kernel over the SAME operands, to locate whether the
# O(S^2) ctx gather or the bitonic itself makes k2 lose to lax.sort.
import functools
import numpy as np
import sys
sys.path.insert(0, "/root/repo")
from qatzip_tpu.ops import pallas_pack as pp

rows, W = 2560, 8192            # the production window shape at 16MB
rng = np.random.default_rng(0)
key = jnp.asarray((rng.integers(0, 1 << 15, (rows, W), dtype=np.int64).astype(np.uint32) << 13)
                  | jax.lax.broadcasted_iota(jnp.uint32, (rows, W), 1))
ctx = [jnp.asarray(rng.integers(0, 2**31, (rows, W), dtype=np.int64)
                   .astype(np.uint32)) for _ in range(4)]

@jax.jit
def full(key, c0, c1, c2, c3):
    out = pp.candidate_search(key, [c0, c1, c2, c3], w=W, probes=6,
                              ctx_words=4, min_match=4, pbits=13)
    return jnp.sum(out)

@jax.jit
def xla_sort5(key, c0, c1, c2, c3):
    ops = jax.lax.sort((key, c0, c1, c2, c3), dimension=1, num_keys=1,
                       is_stable=False)
    return sum(jnp.sum(o) for o in ops)

@jax.jit
def xla_sort1(key):
    return jnp.sum(jax.lax.sort(key, dimension=1, is_stable=False))

for name, fn, args in (("k2_full", full, (key, *ctx)),
                       ("lax5op", xla_sort5, (key, *ctx)),
                       ("lax1op", xla_sort1, (key,))):
    int(fn(*args))
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        int(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1e3:.1f} ms")

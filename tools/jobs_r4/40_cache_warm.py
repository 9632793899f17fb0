# Warm the persistent XLA compile cache with every graph bench.py needs,
# so the driver-time bench (fresh process) only pays the handshake.
import os
import sys
sys.path.insert(0, "/root/repo")
from bench import make_corpus
import qatzip_tpu as qz
from qatzip_tpu import params as P

corpus = make_corpus(48)
s = qz.QzSession(); s.setup_deflate(P.get_defaults("deflate"))
t0 = time.perf_counter()
s.compress(corpus[: 8 << 20])     # b=128 bucket graphs
print("warm 8MB token path:", round(time.perf_counter() - t0, 1), "s")
t0 = time.perf_counter()
s.compress(corpus[: 16 << 20])    # b=256 bucket graphs
print("warm 16MB token path:", round(time.perf_counter() - t0, 1), "s")
os.environ["QZTPU_DEVICE_PACK"] = "1"
sp = qz.QzSession(); sp.setup_deflate(P.get_defaults("deflate"))
t0 = time.perf_counter()
sp.compress(corpus[: 16 << 20])   # dynamic device pack graphs
print("warm device pack:", round(time.perf_counter() - t0, 1), "s")
os.environ.pop("QZTPU_DEVICE_PACK", None)
# tokenize-only + static pack probe graphs (bench _device_pipeline/_pack)
from bench import _device_pipeline_gbps, _device_pack_gbps
print("pipeline:", _device_pipeline_gbps(corpus, 1))
print("pack:", _device_pack_gbps(corpus, 1))
print("cache warm complete")

# Pipelined/sync device rates exactly as bench.py computes them.
import sys
sys.path.insert(0, "/root/repo")
from bench import make_corpus, _device_pipeline_gbps, _device_pack_gbps, _probe_d2h_mbps
corpus = make_corpus(48)
d2h = _probe_d2h_mbps()
print("d2h_mbps:", round(d2h, 2))
pipe, sync = _device_pipeline_gbps(corpus, 3)
print(f"device_pipeline: {pipe:.3f} GB/s (sync {sync:.3f})")
pk = _device_pack_gbps(corpus, 3)
print(f"device_pack: {pk:.3f} GB/s")

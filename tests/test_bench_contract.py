"""Driver-facing contracts: the bench JSON line shape (all paths emit
the same keys — the round-3 post-mortem requirement) and the
relay-limited router override."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

KEYS = {"metric", "value", "unit", "vs_baseline", "e2e_compress_gbps",
        "e2e_device_pack_gbps", "device_pack_ratio", "decompress_gbps",
        "device_pipeline_gbps", "device_pipeline_sync_gbps",
        "device_pack_gbps", "d2h_mbps", "relay_limited", "ratio",
        "zlib_l1_ratio", "ratio_vs_zlib_l1", "e2e_multicore_gbps",
        "host_workers", "lz4_compress_gbps", "lz4_ratio", "lz4_decompress_gbps", "input_mb",
        "backend", "engine", "device_error"}


def test_bench_deadline_fallback_emits_full_contract():
    """Even a hard-killed bench (relay hang) must print one JSON line
    with every contract key and the failure recorded."""
    env = dict(os.environ, QZTPU_BENCH_DEADLINE="3", QZTPU_FORCE_SW="1",
               JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                       capture_output=True, text=True, timeout=120,
                       env=env, cwd=REPO)
    lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
    assert lines, r.stdout + r.stderr
    d = json.loads(lines[-1])
    assert set(d.keys()) == KEYS
    assert d["device_error"] and "deadline" in d["device_error"]


def test_relay_limited_env_override():
    from qatzip_tpu.parallel import dispatch as D

    old = D._RELAY_LIMITED
    try:
        for v, want in (("1", True), ("0", False)):
            D._RELAY_LIMITED = None
            os.environ["QZTPU_RELAY_LIMITED"] = v
            assert D.relay_limited() is want
    finally:
        os.environ.pop("QZTPU_RELAY_LIMITED", None)
        D._RELAY_LIMITED = old

#!/usr/bin/env python
"""devserver — persistent warm TPU process executing spooled job files.

The axon relay charges ~200-450s for the FIRST program of each process;
every further graph compiles in seconds. This server pays the handshake
once and then execs python job files dropped into the spool dir, sharing
one namespace (jax/jnp/pl/pltpu pre-imported, plus anything a previous
job defined).

Usage:
    python tools/devserver.py /tmp/tpujobs &
    cp myjob.py /tmp/tpujobs/10_probe.py        # runs, output in 10_probe.out
    touch /tmp/tpujobs/STOP                     # shuts the server down

Jobs run in filename order; each job's stdout+traceback goes to
<job>.out (written atomically: .tmp then rename). The namespace persists
across jobs — stash arrays/functions in globals for later jobs.
"""

from __future__ import annotations

import io
import contextlib
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    spool = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpujobs"
    os.makedirs(spool, exist_ok=True)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ns = dict(jax=jax, jnp=jnp, np=np, pl=pl, pltpu=pltpu, time=time)

    # warm the backend: first program (the expensive handshake)
    t0 = time.perf_counter()
    int(jax.jit(lambda x: jnp.sum(x))(jnp.arange(8)))
    warm_s = time.perf_counter() - t0
    with open(os.path.join(spool, "READY"), "w") as f:
        f.write(f"backend={jax.default_backend()} warm_s={warm_s:.1f}\n")
    print(f"devserver ready: {jax.default_backend()} warm={warm_s:.1f}s",
          flush=True)

    done = set()
    while True:
        if os.path.exists(os.path.join(spool, "STOP")):
            print("devserver: STOP", flush=True)
            return
        jobs = sorted(f for f in os.listdir(spool)
                      if f.endswith(".py") and f not in done)
        if not jobs:
            time.sleep(0.5)
            continue
        job = jobs[0]
        done.add(job)
        path = os.path.join(spool, job)
        with open(path) as f:
            code = f.read()
        buf = io.StringIO()
        t0 = time.perf_counter()
        try:
            with contextlib.redirect_stdout(buf):
                exec(compile(code, path, "exec"), ns)
            status = "ok"
        except Exception:  # noqa: BLE001
            buf.write(traceback.format_exc())
            status = "error"
        dt = time.perf_counter() - t0
        out = os.path.join(spool, job[:-3] + ".out")
        with open(out + ".tmp", "w") as f:
            f.write(f"# status={status} wall={dt:.1f}s\n")
            f.write(buf.getvalue())
        os.replace(out + ".tmp", out)
        print(f"devserver: {job} -> {status} ({dt:.1f}s)", flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Quick tunnel-health probe: times the small-transfer path (RTT and
one fresh executable load) and then one bulk host->device upload
(fresh bytes each call — the axon terminal memoizes identical
executions). Prints a partial JSON line BEFORE the bulk stage and a
full one after, so the asymmetric wedge observed 2026-08-20 — bulk
uploads hang indefinitely while small transfers + executable loads
stay fast — still yields a diagnosis: a probe that prints the
``tunnel_probe_small`` line but never the final line is exactly that
wedge (run under ``timeout``; the hung upload is un-interruptible
inside the PJRT call).

Usage: python scripts/tunnel_probe.py [MB]
"""

import json
import os
import sys
import time

import numpy as np


def main():
    mb = float(sys.argv[1]) if len(sys.argv) > 1 else 16.0
    os.environ.setdefault("LAC_TPU_COLD_BLOCKS", "0")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import lac_tpu

    lac_tpu.configure_jax()
    import jax
    import jax.numpy as jnp

    n = int(mb * 1e6 // 2)
    rng = np.random.RandomState(int(time.time()) & 0x7FFFFFFF)
    fn = jax.jit(lambda x: jnp.sum(x, dtype=jnp.int32))
    # warm the executable + transfer path once (128 KB: small enough to
    # survive the bulk-side wedge)
    jax.block_until_ready(fn(jax.device_put(rng.randint(-100, 100, 1 << 16).astype(np.int16))))
    best_rtt = float("inf")
    for _ in range(3):
        tiny = jax.device_put(rng.randint(-100, 100, 8).astype(np.int16))
        t1 = time.perf_counter()
        int(fn(tiny))
        best_rtt = min(best_rtt, time.perf_counter() - t1)
    # executable-LOAD latency: compile+load one fresh-shaped trivial
    # program (size varies per call so neither the in-process nor the
    # persistent cache can serve it). This dimension degrades
    # independently of bulk bandwidth (see CLAUDE.md) and predicts warm
    # cost: good hours ~0.3-1 s, degraded hours seconds.
    n_odd = 16 + 2 * (int(time.time()) % 4096)
    t2 = time.perf_counter()
    g = jax.jit(lambda x: jnp.sum(x * jnp.int32(3), dtype=jnp.int32))
    int(g(jax.device_put(np.ones(n_odd, np.int32))))
    load_s = time.perf_counter() - t2
    print(json.dumps({
        "metric": "tunnel_probe_small",
        "rtt_ms": round(best_rtt * 1e3, 1),
        "exec_load_s": round(load_s, 2),
    }), flush=True)

    best_up = float("inf")
    for _ in range(3):
        buf = rng.randint(-3000, 3000, n).astype(np.int16)
        t0 = time.perf_counter()
        dev = jax.device_put(buf)
        s = fn(dev)
        int(s)  # force via a tiny fetch
        best_up = min(best_up, time.perf_counter() - t0)
    print(json.dumps({
        "metric": "tunnel_probe",
        "upload_mb": round(mb, 1),
        "upload_mbps": round(mb / best_up, 1),
        "rtt_ms": round(best_rtt * 1e3, 1),
        "exec_load_s": round(load_s, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Same-session interleaved A/B of the partial-chunk upload buckets
(LAC_TPU_UPLOAD_BUCKETS) on the 30 s bench corpus (80 full blocks at
K=128: the bucketed upload ships 96 rows + device pad instead of a
host-padded 128 — 25% fewer tunnel bytes on the bottleneck link).

Usage: python scripts/time_upload_buckets.py [ROUNDS]
"""

import os
import pathlib
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
os.environ.setdefault("LAC_TPU_COLD_BLOCKS", "0")

from lac_tpu.encoder import FrameEncoder  # noqa: E402

SR = 44100
FRAMES = SR * 30


def corpus(seed):
    rng = np.random.RandomState(seed)
    t = np.arange(FRAMES, dtype=np.float64)
    sig = sum(
        rng.uniform(2000, 9000) * np.sin(2 * np.pi * rng.uniform(80, 4000) * t / SR)
        for _ in range(3)
    )
    left = np.clip(sig + rng.randint(-1500, 1500, FRAMES), -32768, 32767).astype(np.int32)
    right = np.clip(sig * 0.6 + rng.randint(-800, 800, FRAMES), -32768, 32767).astype(np.int32)
    return left, right


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    import jax.numpy as jnp

    enc = FrameEncoder(12, 2, SR, 16, xp=jnp)
    # warm both variants (loads every executable incl. the pad)
    for v in ("0", "1"):
        os.environ["LAC_TPU_UPLOAD_BUCKETS"] = v
        enc.encode(*corpus(1))
    times = {"0": [], "1": []}
    seed = 100
    for r in range(rounds):
        for v in ("0", "1") if r % 2 == 0 else ("1", "0"):
            os.environ["LAC_TPU_UPLOAD_BUCKETS"] = v
            left, right = corpus(seed)
            seed += 1
            t0 = time.perf_counter()
            enc.encode(left, right)
            times[v].append(time.perf_counter() - t0)
    for v, label in (("0", "host-pad-to-K"), ("1", "bucketed")):
        ts = sorted(times[v])
        print(f"{label}: best {ts[0]*1e3:.1f} ms  median {ts[len(ts)//2]*1e3:.1f} ms "
              f"(best {FRAMES/ts[0]/1e6:.2f} M fps)")
    return 0


if __name__ == "__main__":
    sys.exit(main())

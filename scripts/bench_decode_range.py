#!/usr/bin/env python
"""Random-access serving: FrameDecoder.decode_range vs a full decode.

The reference CLI has no range decode — seeking into a long file costs
a full-file decode there. The v3 block table makes every block
independently decodable, so decode_range touches only the blocks
overlapping the requested window.

Usage: python scripts/bench_decode_range.py [MINUTES] [RANGE_SECONDS]
"""

import pathlib
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

from lac_tpu.decoder import FrameDecoder  # noqa: E402
from lac_tpu.encoder import FrameEncoder  # noqa: E402

SR = 44100


def main():
    minutes = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    range_s = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
    frames = SR * 60 * minutes
    rng = np.random.RandomState(3)
    t = np.arange(frames, dtype=np.float64)
    sig = sum(rng.uniform(2000, 8000) * np.sin(2 * np.pi * rng.uniform(80, 3000) * t / SR)
              for _ in range(3))
    left = np.clip(sig + rng.randint(-1200, 1200, frames), -32768, 32767).astype(np.int32)
    right = np.clip(sig * 0.6 + rng.randint(-700, 700, frames), -32768, 32767).astype(np.int32)
    bs = FrameEncoder(12, 2, SR, 16, xp=np).encode(left, right)

    dec = FrameDecoder()
    count = int(SR * range_s)
    # median-of-5 seeks at spread positions (first call warms the JIT-free
    # native lib; still included — this is a cold-ish serving number)
    seeks = []
    for frac in (0.1, 0.3, 0.5, 0.7, 0.9):
        start = int(frames * frac)
        t0 = time.perf_counter()
        rl, rr, _ = dec.decode_range(bs, start, count)
        seeks.append(time.perf_counter() - t0)
        assert np.array_equal(rl, left[start:start + count])
        assert np.array_equal(rr, right[start:start + count])
    t0 = time.perf_counter()
    fl, fr, _ = dec.decode(bs)
    full_s = time.perf_counter() - t0
    assert np.array_equal(fl, left)

    med = sorted(seeks)[len(seeks) // 2]
    print({"metric": "decode_range_seek", "file_minutes": minutes,
           "range_frames": count, "median_seek_ms": round(med * 1e3, 2),
           "full_decode_s": round(full_s, 3),
           "speedup_vs_full": round(full_s / med, 1)})
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Profile the native block planner (lac_plan_blocks) on realistic lanes.

Builds the same lane set the encoder would plan for a synthetic stereo
corpus (L, R, M, S planes per block) and times plan_blocks_native,
optionally with LAC_PLAN_PROFILE=1 to get the runtime's internal phase
breakdown (when compiled with -DLAC_PLAN_PROFILE).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lac_tpu.runtime.native import plan_blocks_native  # noqa: E402
from lac_tpu import encoder as enc  # noqa: E402


def synth_corpus(seconds=30, sr=44100, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(seconds * sr, dtype=np.float64) / sr
    sig = (
        0.35 * np.sin(2 * np.pi * 220 * t)
        + 0.2 * np.sin(2 * np.pi * 331 * t + 0.3)
        + 0.08 * np.sin(2 * np.pi * 2793 * t)
    )
    am = 0.6 + 0.4 * np.sin(2 * np.pi * 0.7 * t)
    noise = rng.normal(0, 0.02, sig.shape) * am
    left = np.clip((sig * am + noise) * 2**14, -(2**15), 2**15 - 1).astype(np.int32)
    rng2 = np.random.default_rng(seed + 1)
    right = np.clip(
        (0.9 * sig * am + rng2.normal(0, 0.02, sig.shape)) * 2**14,
        -(2**15),
        2**15 - 1,
    ).astype(np.int32)
    return left, right


def main():
    n = 16384
    left, right = synth_corpus(seconds=int(os.environ.get("SECS", "30")))
    nblocks = len(left) // n
    left = left[: nblocks * n].reshape(nblocks, n)
    right = right[: nblocks * n].reshape(nblocks, n)
    mid = (left + right) >> 1
    side = left - right
    lanes = np.concatenate([left, right, mid, side], axis=0)
    B = lanes.shape[0]
    print(f"lanes: {B} x {n}")

    # LPC candidates for every lane (same host path as the encoder)
    from lac_tpu.ops import lpc as lpc_ops

    t0 = time.perf_counter()
    R = lpc_ops.autocorrelation(lanes, 12)
    coeffs, used, valid, _ = enc.lpc_candidates_from_lags(R, n)
    t1 = time.perf_counter()
    print(f"lpc candidates (host): {t1 - t0:.3f}s")

    for _ in range(3):
        t0 = time.perf_counter()
        meta = plan_blocks_native(lanes, coeffs, valid, 1, 1, num_threads=1)
        t1 = time.perf_counter()
        dt = t1 - t0
        print(
            f"plan_blocks_native: {dt:.3f}s  "
            f"({B * n / dt / 1e6:.2f} Msamples/s, {B / dt:.1f} lanes/s)"
        )
    assert meta is not None
    print("meta checksum:", int(meta.astype(np.int64).sum()))


if __name__ == "__main__":
    main()

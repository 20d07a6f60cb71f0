"""Time the warm plane-pipeline analyze executable + cost analysis.

Tracks the MXU-autocorrelation rework: the (128, auto, int16) analyze
ran ~36.8 ms warm with emulated-int64 VPU lag loops; the 5-bit-limb
Gram matmul formulation (ops/lpc.py autocorrelation_limbs) moves the
lag FLOPs onto the MXU.

Usage: python scripts/time_analyze.py [K ...]   (default 128 256)
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import lac_tpu  # noqa: E402

lac_tpu.configure_jax()

import jax  # noqa: E402

from lac_tpu import device_pipeline as DP  # noqa: E402


def main():
    widths = [int(a) for a in sys.argv[1:]] or [128, 256]
    rng = np.random.RandomState(1)
    for K in widths:
        for kind, dt in (("auto", np.int16), ("auto", np.int32)):
            fn = DP._jitted_analyze(K, kind, str(np.dtype(dt)))
            lmat = rng.randint(-30000, 30000, (K, DP.N)).astype(dt)
            rmat = (lmat * 0.8).astype(dt)
            args = (jax.device_put(lmat), jax.device_put(rmat))
            t0 = time.time()
            out = fn(*args)
            jax.block_until_ready(out["hostbuf"])
            print(f"K={K} {kind}/{np.dtype(dt).name}: first call (load) "
                  f"{time.time() - t0:.1f}s", flush=True)
            try:
                ca = fn.lower(*args).compile().cost_analysis()
                print(f"  cost analysis: {ca.get('flops', 0) / 1e9:.1f} GFLOP, "
                      f"{ca.get('bytes accessed', 0) / 1e9:.2f} GB accessed")
            except Exception as e:
                print(f"  cost analysis unavailable ({e})")
            best = float("inf")
            for i in range(6):
                l2 = lmat.copy()
                l2[:, i] ^= 1  # fresh inputs: the axon terminal memoizes
                d2 = jax.device_put(l2)
                d2.block_until_ready()
                t0 = time.perf_counter()
                o = fn(d2, args[1])
                np.asarray(o["hostbuf"][:4])  # tiny fetch forces execution
                best = min(best, time.perf_counter() - t0)
            print(f"  warm best-of-6: {best * 1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()

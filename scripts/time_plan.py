"""Time the warm plan executable and print its XLA cost analysis.

Tracks the round-2 verdict's roofline item: the (128, 16384) plan ran
~60 ms warm against a ~22 ms HBM roofline, with the f64-emulated exact
divisions as the flops bulk. After the division-free adapter rewrite
this script reports the new warm time and FLOP/byte totals.

Usage: python scripts/time_plan.py [B ...]   (default 128 256)
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import lac_tpu  # noqa: E402

lac_tpu.configure_jax()

import jax  # noqa: E402

from lac_tpu import encoder as E  # noqa: E402

N = 16384


def main():
    batches = [int(a) for a in sys.argv[1:]] or [128, 256]
    rng = np.random.RandomState(1)
    for B in batches:
        fn = E._jitted_plan(N, True, True, False)
        pcm = rng.laplace(0, 80, (B, N)).astype(np.int32)
        coeffs = rng.randint(-(1 << 14), 1 << 14, (5, B, 13)).astype(np.int16)
        valid = np.ones((5, B), bool)
        args = (jax.device_put(pcm), jax.device_put(coeffs), jax.device_put(valid))
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out["meta"])
        print(f"B={B}: first call (compile/load) {time.time() - t0:.1f}s", flush=True)
        try:
            ca = fn.lower(*args).compile().cost_analysis()
            fl = ca.get("flops", 0.0)
            by = ca.get("bytes accessed", 0.0)
            print(f"B={B}: cost analysis {fl / 1e9:.1f} GFLOP, {by / 1e9:.1f} GB accessed")
        except Exception as e:  # cost analysis is best-effort per backend
            print(f"B={B}: cost analysis unavailable ({e})")
        best = float("inf")
        for i in range(6):
            p2 = pcm.copy()
            p2[:, i] ^= 1  # fresh inputs: the axon terminal memoizes
            # upload OUTSIDE the timed region: this times the executable,
            # not the tunnel (the pipeline overlaps uploads anyway)
            d2 = jax.device_put(p2)
            d2.block_until_ready()
            t0 = time.perf_counter()
            o = fn(d2, args[1], args[2])
            np.asarray(o["meta"][0, :4])  # tiny fetch forces execution
            best = min(best, time.perf_counter() - t0)
        print(f"B={B}: warm plan executable {best * 1e3:.1f} ms "
              f"({B * N / best / 1e6:.1f} Msamp/s)", flush=True)


if __name__ == "__main__":
    main()

"""Differential: native block planner (lac_plan_blocks) vs the batched
array planner (encoder.plan_group) — meta rows must match exactly for
every signal class, block length, and flag combination."""

import numpy as np
import pytest

from lac_tpu.encoder import lpc_candidates_from_lags, plan_group
from lac_tpu.ops import lpc
from lac_tpu.runtime.native import native_available, plan_blocks_native

from .signals import lcg_noise, sine

pytestmark = pytest.mark.skipif(not native_available(), reason="native runtime unavailable")


def _signals(n, seed):
    rng = np.random.default_rng(seed)
    out = {
        "noise": lcg_noise(n, 14000, seed),
        "sine": sine(n, 44100, 437.0, 21000) + lcg_noise(n, 300, seed + 1),
        "silence": np.zeros(n, np.int32),
        "ramp": (np.arange(n) % 3000).astype(np.int32),
        "spikes": np.zeros(n, np.int32),
        "mixed": np.zeros(n, np.int32),
    }
    out["spikes"][:: max(1, n // 37)] = 0x7FFF
    out["spikes"][1:: max(1, n // 53)] = -0x8000
    m = out["mixed"]
    m[: n // 3] = lcg_noise(n // 3, 2, seed + 2)  # sparse ±2 -> bin mode
    m[n // 3 : n // 2] = 0  # zero runs
    m[n // 2 :] = sine(n - n // 2, 44100, 900.0, 25000)
    out["rand24"] = rng.integers(-(2**23), 2**23, n, dtype=np.int32)
    return out


def _compare(pcm, zero_run, partitioning):
    n = pcm.shape[-1]
    R = lpc.autocorrelation(pcm, 12, xp=np)
    coeffs, used, lvalid, mvo = lpc_candidates_from_lags(R, n)
    want = np.asarray(
        plan_group(pcm, coeffs, lvalid, n, zero_run, partitioning, np, emit_fields=False)["meta"]
    )
    got = plan_blocks_native(pcm, coeffs, lvalid, zero_run, partitioning)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("n", [257, 300, 4096, 12160, 14848, 16384])
def test_planner_matches_plan_group(n):
    pcm = np.stack(list(_signals(n, 11).values()))
    _compare(pcm, True, True)


@pytest.mark.parametrize("zero_run,partitioning", [(False, True), (True, False), (False, False)])
def test_planner_flag_combinations(zero_run, partitioning):
    pcm = np.stack(list(_signals(5000, 23).values()))
    _compare(pcm, zero_run, partitioning)


def test_planner_tiny_blocks():
    # below MIN_PARTITION_SIZE and near-warmup lengths
    for n in (1, 2, 5, 16, 31, 32, 33, 255, 256):
        pcm = np.stack([lcg_noise(n, 9000, n), np.zeros(n, np.int32)])
        _compare(pcm, True, True)


def test_planner_flags_overflow_lane():
    # out-of-domain PCM drives the open-loop LPC residual outside int32:
    # the native planner must flag the lane (meta[:,2] == 0) exactly like
    # plan_group so the host ladder replans it
    n = 4096
    x = np.zeros(n, np.int32)
    x[::2] = 2**30
    x[1::2] = -(2**30)
    pcm = np.stack([x, lcg_noise(n, 10000, 3)])
    R = lpc.autocorrelation(pcm, 12, xp=np)
    coeffs, used, lvalid, mvo = lpc_candidates_from_lags(R, n)
    want = np.asarray(plan_group(pcm, coeffs, lvalid, n, True, True, np, emit_fields=False)["meta"])
    got = plan_blocks_native(pcm, coeffs, lvalid, True, True)
    np.testing.assert_array_equal(got, want)


def test_autocorr_native_matches_numpy():
    # exact int64 lags: the AVX-512 MAC kernel vs the numpy spec twin
    # (ops/lpc.py autocorrelation; reference lpc.cpp:80-96), including
    # 24-bit extremes, odd lengths, and lanes shorter than the lag count
    from lac_tpu.runtime.native import autocorr_native

    for n in (7, 13, 100, 4096, 16383):
        sigs = _signals(max(n, 64), 31)
        pcm = np.stack([s[:n] for s in sigs.values()])
        want = lpc.autocorrelation(pcm, 12, xp=np)
        got = autocorr_native(pcm, 12)
        np.testing.assert_array_equal(got, want)
    # k >= n: lags beyond the lane length are zero
    short = np.array([[5, -3]], np.int32)
    got = autocorr_native(short, 12)
    want = np.zeros((1, 13), np.int64)
    want[0, 0] = 34
    want[0, 1] = -15
    np.testing.assert_array_equal(got, want)


def test_planner_prune_fuzz_near_ties():
    """Multi-seed fuzz aimed at the branch-and-bound paths: signals where
    several candidates land within a few bits of each other (scaled noise
    over weak tonal content) plus zero-heavy mixes that trigger scoring
    aborts and sweep-stage abandons. The native planner must still match
    plan_group's meta exactly, including lexicographic tie-breaks."""
    n = 2048
    for seed in range(16):
        rng = np.random.default_rng(1000 + seed)
        rows = []
        # weak sine + noise at a ratio that keeps fixed orders competitive
        amp = int(rng.integers(2, 2000))
        rows.append(sine(n, 44100, float(rng.integers(100, 4000)), amp)
                    + lcg_noise(n, max(1, amp // 2), seed))
        # near-tie between predictors: piecewise constant + tiny jitter
        pc = np.repeat(rng.integers(-50, 50, n // 64), 64).astype(np.int32)
        rows.append(pc + lcg_noise(n, 1, seed + 7))
        # zero-heavy with bursts (stage aborts + zero-run mode)
        z = np.zeros(n, np.int32)
        burst = rng.integers(0, n - 64)
        z[burst : burst + 32] = rng.integers(-30000, 30000, 32, dtype=np.int32)
        rows.append(z)
        pcm = np.stack(rows)
        _compare(pcm, True, True)
        _compare(pcm, True, False)

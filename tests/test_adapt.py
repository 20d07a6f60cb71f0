"""Closed-form k-adaptation vs the scalar spec oracle."""

import numpy as np
import pytest

from lac_tpu.ops import adapt
from . import oracle


def lcg_noise(n, scale, state=12345):
    out = np.empty(n, dtype=np.int64)
    for i in range(n):
        state = (state * 1664525 + 1013904223) & 0xFFFFFFFF
        out[i] = (state % (2 * scale + 1)) - scale
    return out


def _check_stateful(us, initial_k):
    us = np.asarray(us, dtype=np.uint64)
    want = oracle.k_used_sequence_stateful([int(u) for u in us], initial_k)
    k_after = adapt.k_after_stateful(us[None, :])
    got = adapt.k_used_from_after(k_after, initial_k)[0]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want, dtype=np.int32))


@pytest.mark.parametrize("scale", [0, 1, 3, 100, 30000, 2**23])
def test_stateful_matches_oracle_noise(scale):
    v = lcg_noise(700, scale)
    us = np.array([oracle.zigzag(int(x)) for x in v], dtype=np.uint64)
    _check_stateful(us, initial_k=5)


def test_stateful_long_constant_and_bursts():
    us = np.concatenate(
        [
            np.zeros(300, np.uint64),
            np.full(200, 1000, np.uint64),
            np.zeros(50, np.uint64),
            np.full(400, 7, np.uint64),
            (np.abs(lcg_noise(500, 2**30))).astype(np.uint64),
        ]
    )
    _check_stateful(us, initial_k=0)


def test_stateful_extreme_values():
    us = np.array([0xFFFFFFFF] * 150 + [0] * 150 + [1, 2, 3, 4] * 50, dtype=np.uint64)
    _check_stateful(us, initial_k=31)


def test_stateless_matches_oracle():
    v = lcg_noise(500, 5000)
    us = np.array([oracle.zigzag(int(x)) for x in v], dtype=np.uint64)
    want = oracle.k_used_sequence_stateless([int(u) for u in us], 7)
    pos = np.arange(500, dtype=np.int64)
    got = adapt.k_used_stateless_segmented(
        us[None, :], pos[None, :], np.full((1, 500), 7, np.int32)
    )[0]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want, dtype=np.int32))


def test_stateless_segmented_restarts():
    v = lcg_noise(256, 900)
    us = np.array([oracle.zigzag(int(x)) for x in v], dtype=np.uint64)
    # two segments of 100 + one of 56, initial ks 3, 9, 0
    pos = np.concatenate([np.arange(100), np.arange(100), np.arange(56)]).astype(np.int64)
    init = np.concatenate([np.full(100, 3), np.full(100, 9), np.full(56, 0)]).astype(np.int32)
    want = (
        oracle.k_used_sequence_stateless([int(u) for u in us[:100]], 3)
        + oracle.k_used_sequence_stateless([int(u) for u in us[100:200]], 9)
        + oracle.k_used_sequence_stateless([int(u) for u in us[200:]], 0)
    )
    got = adapt.k_used_stateless_segmented(us[None, :], pos[None, :], init[None, :])[0]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want, dtype=np.int32))


def test_stateful_jax_matches_numpy():
    import jax.numpy as jnp

    v = lcg_noise(400, 12000)
    us = np.array([oracle.zigzag(int(x)) for x in v], dtype=np.uint64)
    k_np = adapt.k_after_stateful(us[None, :])
    k_jx = adapt.k_after_stateful(jnp.asarray(us)[None, :], xp=jnp)
    np.testing.assert_array_equal(np.asarray(k_np), np.asarray(k_jx))


def test_floordiv3_exhaustive_boundaries():
    # every value near each multiple-of-3 boundary across the full
    # stated domain (< 2^35), plus a dense low sweep
    xs = np.concatenate(
        [
            np.arange(0, 200000, dtype=np.uint64),
            (np.uint64(3) * np.arange(1, 2**33 // 3, 2**21, dtype=np.uint64))[:, None]
            + np.arange(-2, 3, dtype=np.int64)[None, :].astype(np.uint64),
        ],
        axis=None,
    ).ravel()
    xs = xs[xs < np.uint64(2**35)]
    np.testing.assert_array_equal(adapt._floordiv3(xs, np), xs // np.uint64(3))


def test_k_base_divfree_brute_force():
    # direct check of min(31, bit_width(mean-1)) against integer division
    # across counts, including the huge-u regime (u up to 2^32-1)
    rng = np.random.RandomState(0xD1F)
    counts = np.concatenate([np.arange(1, 300), np.array([511, 512, 8191, 16384])]).astype(np.uint64)
    for scale_bits in (3, 16, 32, 46):
        sums = rng.randint(0, 2**scale_bits, size=counts.shape, dtype=np.uint64)
        N = sums + (counts >> np.uint64(1))
        mean = N // counts
        want = np.where(
            mean <= 1, 0, np.minimum(31, [max(int(m) - 1, 0).bit_length() for m in mean])
        ).astype(np.int32)
        got = adapt.k_after_stateless(sums, (counts - 1).astype(np.int64))
        np.testing.assert_array_equal(np.asarray(got), want)


def test_stateful_drift_threshold_extremes():
    # long alternating extreme/zero sequences push lm vs mean to the
    # division-free threshold boundaries on both sides of the 256-sample
    # drift window fill
    pat = np.array([0xFFFFFFFF, 0, 0, 0xFFFFFFFF] * 200, dtype=np.uint64)
    _check_stateful(pat, initial_k=12)
    ramp = (np.arange(700, dtype=np.uint64) * np.uint64(6150533)) % np.uint64(0xFFFFFFFF)
    _check_stateful(ramp, initial_k=0)
    # quiet prefix then loud tail: drift bias flips sign around the join
    mix = np.concatenate([np.full(300, 2, np.uint64), np.full(300, 0x7FFFFFFF, np.uint64)])
    _check_stateful(mix, initial_k=1)

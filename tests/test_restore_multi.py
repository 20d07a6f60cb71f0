"""Unit tests for the order-generic batched restore primitives
(device_decode's two-call path): fixed_restore_multi vs per-order
fixed_restore, recurrence_restore vs fir_restore/lpc_restore."""

import numpy as np
import pytest

import jax.numpy as jnp

from lac_tpu.format import constants as C
from lac_tpu.ops import predictors


@pytest.mark.parametrize("xp", [np, jnp], ids=["numpy", "jax"])
def test_fixed_restore_multi_matches_per_order(xp):
    rng = np.random.RandomState(3)
    L = 96
    res = rng.randint(-4000, 4000, (10, L)).astype(np.int32)
    order = np.asarray([0, 1, 2, 3, 4, 4, 3, 2, 1, 0])
    lens = np.asarray([L, L, L, L, L, 40, 17, 5, 1, L])
    got, ok = predictors.fixed_restore_multi(xp.asarray(res), xp.asarray(order),
                                             valid_len=xp.asarray(lens), xp=xp)
    got, ok = np.asarray(got), np.asarray(ok)
    for g in range(10):
        want, w_ok = predictors.fixed_restore(res[g : g + 1], int(order[g]),
                                              valid_len=np.asarray([lens[g]]), xp=np)
        np.testing.assert_array_equal(got[g, : lens[g]], np.asarray(want)[0, : lens[g]])
        assert bool(ok[g]) == bool(np.asarray(w_ok)[0])


@pytest.mark.parametrize("xp", [np, jnp], ids=["numpy", "jax"])
def test_recurrence_restore_matches_fir_and_lpc(xp):
    rng = np.random.RandomState(7)
    L = 80
    G = 8
    res = rng.randint(-2500, 2500, (G, L)).astype(np.int32)
    coeffs = np.zeros((G, 33), np.int64)
    order = np.zeros(G, np.int64)
    shift = np.zeros(G, np.int64)
    minp = np.zeros(G, np.int64)
    is_fir = np.arange(G) % 2 == 0
    for g in range(G):
        if is_fir[g]:
            coeffs[g, 1], coeffs[g, 2] = C.FIR_TAPS
            order[g], shift[g], minp[g] = C.FIR_ORDER, C.FIR_SHIFT, C.FIR_ORDER
        else:
            od = [4, 8, 12, 12][g // 2]
            coeffs[g, 1 : od + 1] = rng.randint(-20000, 20000, od)
            order[g], shift[g], minp[g] = od, 15, 0
    lens = np.asarray([L, L, 33, 50, 7, L, 1, 0], np.int64)
    got, ok = predictors.recurrence_restore(
        xp.asarray(res), xp.asarray(coeffs), xp.asarray(order), xp.asarray(shift),
        xp.asarray(minp), valid_len=xp.asarray(lens), xp=xp,
    )
    got, ok = np.asarray(got), np.asarray(ok)
    for g in range(G):
        if is_fir[g]:
            want, w_ok = predictors.fir_restore(res[g : g + 1], valid_len=np.asarray([lens[g]]), xp=np)
        else:
            want, w_ok = predictors.lpc_restore(
                res[g : g + 1], coeffs[g : g + 1], int(order[g]),
                valid_len=np.asarray([lens[g]]), xp=np,
            )
        assert bool(ok[g]) == bool(np.asarray(w_ok)[0])
        if bool(ok[g]):  # rejected lanes leave unspecified tails
            np.testing.assert_array_equal(got[g, : lens[g]], np.asarray(want)[0, : lens[g]])


def test_recurrence_restore_overflow_flag():
    # order-1 "LPC" with tap 2^15 doubles each step -> leaves int32
    L = 64
    res = np.zeros((1, L), np.int32)
    res[0, 0] = 1 << 24
    coeffs = np.zeros((1, 33), np.int64)
    coeffs[0, 1] = 2 << 15
    _, ok = predictors.recurrence_restore(
        res, coeffs, np.asarray([1]), np.asarray([15]), np.asarray([0]), xp=np,
    )
    assert not bool(ok[0])

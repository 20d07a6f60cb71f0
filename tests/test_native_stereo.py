"""Differential: native stereo proxy (lac_stereo_estimate) vs the array
implementation (ops.stereo.estimate_stereo_mode)."""

import numpy as np
import pytest

from lac_tpu.ops.stereo import estimate_stereo_mode
from lac_tpu.runtime.native import native_available, stereo_estimate_native

from .signals import lcg_noise, sine

pytestmark = pytest.mark.skipif(not native_available(), reason="native runtime unavailable")


def test_stereo_estimate_matches():
    n = 16384
    base = sine(n, 44100, 220.0, 20000)
    cases = [
        (base, base + lcg_noise(n, 300, 7)),                     # correlated -> MS
        (lcg_noise(n, 20000, 1), lcg_noise(n, 20000, 2)),        # independent -> LR
        (base, -base),                                           # anticorrelated
        (base, base.copy()),                                     # identical (side 0)
        (sine(n, 44100, 900.0, 15000), np.zeros(n, np.int32)),   # silent right
        (np.zeros(n, np.int32), np.zeros(n, np.int32)),          # silence
        ((np.arange(n) % 1000).astype(np.int32), (np.arange(n) % 997).astype(np.int32)),
        (lcg_noise(n, 2**23 - 1, 3), lcg_noise(n, 2**23 - 1, 4)),  # 24-bit domain
    ]
    lmat = np.stack([c[0] for c in cases])
    rmat = np.stack([c[1] for c in cases])
    want_cm, want_un = estimate_stereo_mode(lmat, rmat, np.ones(lmat.shape, bool), xp=np)
    got_cm, got_un = stereo_estimate_native(lmat, rmat)
    np.testing.assert_array_equal(got_cm, np.asarray(want_cm))
    np.testing.assert_array_equal(got_un, np.asarray(want_un))

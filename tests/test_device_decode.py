"""Device (batched) decode backend parity with the native/python paths."""

import numpy as np
import pytest

from lac_tpu.decoder import DecodeError, FrameDecoder
from lac_tpu.encoder import FrameEncoder
from lac_tpu.runtime.native import native_available

from .signals import lcg_noise, sine

pytestmark = pytest.mark.skipif(not native_available(), reason="native runtime unavailable")


def test_device_backend_matches_all_predictors():
    # mixed content: LPC-friendly tones, fixed-friendly ramps, silence
    parts = [
        sine(8000, 44100, 440.0, 20000),
        (np.arange(8000) * 5 % 4000).astype(np.int32),
        np.zeros(4000, np.int32),
        lcg_noise(8000, 25000, 3),
    ]
    l = np.concatenate(parts)
    r = np.concatenate(parts[::-1])
    bs = FrameEncoder(12, 2, 44100, 16).encode(l, r)
    dl, dr, _ = FrameDecoder(backend="device").decode(bs)
    np.testing.assert_array_equal(dl, l)
    np.testing.assert_array_equal(dr, r)


def test_device_backend_rejects_malformed():
    sig = lcg_noise(600, 3000, 7)
    bs = bytearray(FrameEncoder(12, 0, 44100, 16).encode(sig))
    bs[-1] ^= 0xFF  # corrupt final payload byte
    with pytest.raises(DecodeError):
        FrameDecoder(backend="device").decode(bytes(bs))

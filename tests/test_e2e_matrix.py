"""Full configuration matrix E2E (mirrors reference tests/test_e2e.cpp:92-221):
{1,2} channels x {44.1, 48, 96, 192} kHz x {16, 24} bit, exact PCM equality,
plus the multiblock boundary case."""

import numpy as np
import pytest

from lac_tpu.decoder import FrameDecoder
from lac_tpu.encoder import FrameEncoder
from lac_tpu.format import constants as C

from .signals import lcg_noise, sine


@pytest.mark.parametrize("sr", C.SUPPORTED_SAMPLE_RATES)
@pytest.mark.parametrize("depth", C.SUPPORTED_BIT_DEPTHS)
@pytest.mark.parametrize("channels", [1, 2])
def test_matrix_roundtrip(sr, depth, channels):
    amp = 28000 if depth == 16 else (1 << 22)
    n = 3000
    left = sine(n, sr, 440.0, amp) + lcg_noise(n, amp // 100, sr)
    lo, hi = C.pcm_range(depth)
    left = np.clip(left, lo, hi).astype(np.int32)
    if channels == 2:
        right = np.clip(sine(n, sr, 443.0, amp) + lcg_noise(n, amp // 90, sr + 1), lo, hi).astype(np.int32)
    else:
        right = np.empty(0, np.int32)
    for smode in ([0] if channels == 1 else [0, 1, 2]):
        bs = FrameEncoder(12, smode, sr, depth).encode(left, right)
        dl, dr, hdr = FrameDecoder().decode(bs)
        np.testing.assert_array_equal(dl, left)
        np.testing.assert_array_equal(dr, right)
        assert (hdr.sample_rate, hdr.bit_depth, hdr.channels) == (sr, depth, channels)


def test_multiblock_boundary_max_plus_37():
    n = C.MAX_BLOCK_SIZE + 37
    left = lcg_noise(n, 20000, 11)
    right = lcg_noise(n, 20000, 12)
    bs = FrameEncoder(12, 2, 44100, 16).encode(left, right)
    dl, dr, _ = FrameDecoder().decode(bs)
    np.testing.assert_array_equal(dl, left)
    np.testing.assert_array_equal(dr, right)


def test_single_sample_and_tiny_blocks():
    for n in (1, 2, 5, 31, 32, 255, 256):
        sig = lcg_noise(n, 1000, n)
        bs = FrameEncoder(12, 0, 44100, 16).encode(sig)
        dl, dr, _ = FrameDecoder().decode(bs)
        np.testing.assert_array_equal(dl, sig)
        assert len(dr) == 0

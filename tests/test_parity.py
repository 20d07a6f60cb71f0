"""Byte-parity against the reference implementation.

Two layers:
* golden fixtures committed in tests/golden/ (generated once by the
  reference binary) — always run;
* live differential vs the reference binary when .refbuild/lac_cli
  exists.
"""

import pathlib
import subprocess

import numpy as np
import pytest

from lac_tpu.decoder import FrameDecoder
from lac_tpu.encoder import FrameEncoder
from lac_tpu.io import write_wav

from .signals import cases

GOLDEN = pathlib.Path(__file__).resolve().parent / "golden"
ALL_CASES = list(cases().items())


@pytest.mark.parametrize("name", [n for n, _ in ALL_CASES])
def test_encoder_matches_golden(name):
    left, right, sr, depth, smode = dict(ALL_CASES)[name]
    golden_path = GOLDEN / f"{name}.lac"
    if not golden_path.exists():
        pytest.skip("golden fixture missing — run tests/make_goldens.py")
    want = golden_path.read_bytes()
    enc = FrameEncoder(12, smode if len(right) else 0, sr, depth)
    got = enc.encode(left, right)
    assert got == want, f"{name}: encoder output differs from reference golden"


@pytest.mark.parametrize("name", [n for n, _ in ALL_CASES])
def test_decoder_restores_golden(name):
    left, right, sr, depth, smode = dict(ALL_CASES)[name]
    golden_path = GOLDEN / f"{name}.lac"
    if not golden_path.exists():
        pytest.skip("golden fixture missing")
    dl, dr, hdr = FrameDecoder().decode(golden_path.read_bytes())
    np.testing.assert_array_equal(dl, left)
    np.testing.assert_array_equal(dr, right)
    assert hdr.sample_rate == sr and hdr.bit_depth == depth


@pytest.mark.parametrize("sr,depth", [(44100, 16), (48000, 24), (96000, 16), (192000, 24)])
def test_live_reference_matrix(tmp_path, reference_cli, sr, depth):
    """Fresh-signal differential across the configuration matrix."""
    from .signals import lcg_noise, sine
    import numpy as np
    from lac_tpu.format import constants as C

    lo, hi = C.pcm_range(depth)
    amp = (hi * 2) // 3
    n = 20000
    l = np.clip(sine(n, sr, 260.0, amp) + lcg_noise(n, amp // 64, sr), lo, hi).astype(np.int32)
    r = np.clip(sine(n, sr, 262.0, amp - 100) + lcg_noise(n, amp // 60, sr + 7), lo, hi).astype(np.int32)
    wav = str(tmp_path / "m.wav")
    assert write_wav(wav, l, r, 2, sr, depth)
    for flag, smode in ((None, 2), ("--stereo-mode=lr", 0), ("--stereo-mode=ms", 1)):
        lac = str(tmp_path / f"m{smode}.lac")
        args = [reference_cli, "encode", wav, lac] + ([flag] if flag else [])
        subprocess.run(args, check=True, capture_output=True)
        want = open(lac, "rb").read()
        got = FrameEncoder(12, smode, sr, depth).encode(l, r)
        assert got == want, f"sr={sr} depth={depth} mode={smode}"


def test_live_reference_adversarial_spikes(tmp_path, reference_cli):
    """Pathological residual statistics: isolated full-scale spikes (huge
    Rice quotients at tiny adapted k) and alternating extremes."""
    import numpy as np

    n = 2048
    spikes = np.zeros(n, np.int32)
    spikes[3::4] = 0x7FFFFF
    spikes[7::8] = -0x800000
    alternating = np.tile(np.array([0x7FFFFF, -0x800000], np.int32), n // 2)
    for name, sig in (("spikes", spikes), ("alternating", alternating)):
        wav = str(tmp_path / f"{name}.wav")
        lac = str(tmp_path / f"{name}.lac")
        assert write_wav(wav, sig, np.empty(0, np.int32), 1, 48000, 24)
        subprocess.run([reference_cli, "encode", wav, lac], check=True, capture_output=True)
        got = FrameEncoder(12, 0, 48000, 24).encode(sig)
        assert got == open(lac, "rb").read(), name
        dl, _, _ = FrameDecoder().decode(got)
        np.testing.assert_array_equal(dl, sig)


def test_live_reference_differential(tmp_path, reference_cli):
    """End-to-end: both encoders on a fresh signal not in the fixtures."""
    from .signals import lcg_noise, sine

    rng_l = sine(16384 + 5000, 44100, 330.0, 25000) + lcg_noise(16384 + 5000, 100, 3)
    rng_r = sine(16384 + 5000, 44100, 331.0, 24000) + lcg_noise(16384 + 5000, 120, 4)
    wav = str(tmp_path / "x.wav")
    assert write_wav(wav, rng_l, rng_r, 2, 44100, 16)
    lac = str(tmp_path / "x.lac")
    subprocess.run([reference_cli, "encode", wav, lac], check=True, capture_output=True)
    want = open(lac, "rb").read()
    got = FrameEncoder(12, 2, 44100, 16).encode(rng_l, rng_r)
    assert got == want

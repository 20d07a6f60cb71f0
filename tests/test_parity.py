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

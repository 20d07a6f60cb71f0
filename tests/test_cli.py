"""CLI contract tests (mirrors tests/test_cli.cpp behaviors)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from lac_tpu.io import read_wav, write_wav

from .signals import lcg_noise

ENV = {**os.environ, "JAX_PLATFORMS": "cpu"}


def run_cli(*args, env=None):
    return subprocess.run(
        [sys.executable, "-m", "lac_tpu.cli", *args],
        capture_output=True,
        text=True,
        env=env or ENV,
    )


@pytest.fixture()
def sample_wav(tmp_path):
    left = lcg_noise(3000, 20000, 1)
    right = lcg_noise(3000, 20000, 2)
    p = str(tmp_path / "in.wav")
    assert write_wav(p, left, right, 2, 44100, 16)
    return p, left, right


def test_encode_decode_roundtrip(tmp_path, sample_wav):
    wav, left, right = sample_wav
    lac = str(tmp_path / "out.lac")
    back = str(tmp_path / "back.wav")
    r = run_cli("encode", wav, lac)
    assert r.returncode == 0, r.stderr
    assert r.stdout.startswith(f"Encoded {wav} -> {lac} (")
    r = run_cli("decode", lac, back)
    assert r.returncode == 0, r.stderr
    assert r.stdout.startswith(f"Decoded {lac} -> {back} (3000 samples per channel)")
    got = read_wav(back)
    np.testing.assert_array_equal(got[0], left)
    np.testing.assert_array_equal(got[1], right)
    # canonical writer: byte-identical restored WAV
    assert open(wav, "rb").read() == open(back, "rb").read()


def test_same_path_rejected(sample_wav):
    wav, _, _ = sample_wav
    r = run_cli("encode", wav, wav)
    assert r.returncode == 1
    assert "Input and output paths must be different" in r.stderr
    # input unchanged
    assert read_wav(wav) is not None


def test_hardlink_same_file_rejected(tmp_path, sample_wav):
    wav, _, _ = sample_wav
    link = str(tmp_path / "alias.wav")
    os.link(wav, link)
    r = run_cli("encode", wav, link)
    assert r.returncode == 1
    assert "Input and output paths must be different" in r.stderr


def test_malformed_input_leaves_output_untouched(tmp_path):
    bad = str(tmp_path / "bad.wav")
    open(bad, "wb").write(b"not a wav at all")
    out = str(tmp_path / "out.lac")
    open(out, "wb").write(b"sentinel")
    r = run_cli("encode", bad, out)
    assert r.returncode == 1
    assert "Failed to read WAV" in r.stderr
    assert open(out, "rb").read() == b"sentinel"
    # no staged temp dirs left behind
    assert not [p for p in os.listdir(tmp_path) if p.startswith(".lac-tmp.")]


def test_decode_malformed_lac(tmp_path):
    bad = str(tmp_path / "bad.lac")
    open(bad, "wb").write(b"LA\x03garbagegarbage")
    out = str(tmp_path / "o.wav")
    r = run_cli("decode", bad, out)
    assert r.returncode == 1
    assert not os.path.exists(out)
    assert not [p for p in os.listdir(tmp_path) if p.startswith(".lac-tmp.")]


def test_unknown_flag_usage(sample_wav, tmp_path):
    wav, _, _ = sample_wav
    r = run_cli("encode", wav, str(tmp_path / "o.lac"), "--bogus")
    assert r.returncode == 1
    assert "Usage:" in r.stderr


def test_threads_flag_validation(sample_wav, tmp_path):
    wav, _, _ = sample_wav
    r = run_cli("encode", wav, str(tmp_path / "o.lac"), "--threads=0")
    assert r.returncode == 1
    r = run_cli("encode", wav, str(tmp_path / "o.lac"), "--threads=abc")
    assert r.returncode == 1
    r = run_cli("encode", wav, str(tmp_path / "o.lac"), "--threads=2")
    assert r.returncode == 0


def test_lac_threads_env(sample_wav, tmp_path):
    wav, _, _ = sample_wav
    env = {**ENV, "LAC_THREADS": "nope"}
    r = run_cli("encode", wav, str(tmp_path / "o.lac"), env=env)
    assert r.returncode == 1
    assert "LAC_THREADS must be a positive integer" in r.stderr
    env["LAC_THREADS"] = "3"
    r = run_cli("encode", wav, str(tmp_path / "o.lac"), env=env)
    assert r.returncode == 0


def test_overwrite_existing_output(tmp_path, sample_wav):
    wav, _, _ = sample_wav
    out = str(tmp_path / "out.lac")
    open(out, "wb").write(b"old-contents")
    r = run_cli("encode", wav, out)
    assert r.returncode == 0
    assert open(out, "rb").read()[:2] == b"LA"


def test_stereo_mode_flags(tmp_path, sample_wav):
    wav, _, _ = sample_wav
    for flag, want_mode in (("--stereo-mode=lr", 0), ("--stereo-mode=ms", 1)):
        out = str(tmp_path / f"m{want_mode}.lac")
        r = run_cli("encode", wav, out, flag)
        assert r.returncode == 0
        data = open(out, "rb").read()
        assert data[4] == want_mode


def test_no_partitioning_flag(tmp_path, sample_wav):
    wav, _, _ = sample_wav
    out = str(tmp_path / "np.lac")
    r = run_cli("encode", wav, out, "--no-partitioning")
    assert r.returncode == 0
    back = str(tmp_path / "np.wav")
    assert run_cli("decode", out, back).returncode == 0
    assert open(back, "rb").read() == open(wav, "rb").read()

"""System-level CLI behaviors: staged output safety, symlinks, umask,
long paths (mirrors reference tests/test_cli.cpp:249-401)."""

import os
import subprocess
import sys

import pytest

from lac_tpu.io import write_wav

from .signals import lcg_noise

ENV = {**os.environ, "JAX_PLATFORMS": "cpu"}


def run_cli(*args, env=None):
    return subprocess.run(
        [sys.executable, "-m", "lac_tpu.cli", *args], capture_output=True, text=True, env=env or ENV
    )


def no_staged_siblings(directory):
    return not [p for p in os.listdir(directory) if p.startswith(".lac-tmp.")]


@pytest.fixture()
def wav(tmp_path):
    p = str(tmp_path / "in.wav")
    assert write_wav(p, lcg_noise(2000, 15000, 1), lcg_noise(2000, 15000, 2), 2, 44100, 16)
    return p


def test_symlink_target_not_clobbered_on_failure(tmp_path, wav):
    target = str(tmp_path / "precious.dat")
    open(target, "wb").write(b"precious")
    link = str(tmp_path / "out.lac")
    os.symlink(target, link)
    bad = str(tmp_path / "bad.wav")
    open(bad, "wb").write(b"junk")
    r = run_cli("encode", bad, link)
    assert r.returncode == 1
    assert open(target, "rb").read() == b"precious"
    assert no_staged_siblings(tmp_path)


def test_symlink_output_replaced_atomically(tmp_path, wav):
    target = str(tmp_path / "t.lac")
    open(target, "wb").write(b"old")
    link = str(tmp_path / "out.lac")
    os.symlink(target, link)
    r = run_cli("encode", wav, link)
    assert r.returncode == 0
    # os.replace replaces the symlink itself (not the target) — the link
    # is now a regular file with the encoded stream
    assert open(link, "rb").read()[:2] == b"LA"
    assert no_staged_siblings(tmp_path)


def test_restrictive_umask(tmp_path, wav):
    out = str(tmp_path / "o.lac")
    r = subprocess.run(
        f"umask 077 && {sys.executable} -m lac_tpu.cli encode {wav} {out}",
        shell=True, capture_output=True, text=True, env=ENV,
    )
    assert r.returncode == 0
    assert os.path.exists(out)


def test_long_filename(tmp_path, wav):
    name = "x" * 240 + ".lac"
    out = str(tmp_path / name)
    r = run_cli("encode", wav, out)
    assert r.returncode == 0
    back = str(tmp_path / "back.wav")
    assert run_cli("decode", out, back).returncode == 0
    assert open(back, "rb").read() == open(wav, "rb").read()


def test_decode_input_cap(tmp_path):
    big = str(tmp_path / "big.lac")
    with open(big, "wb") as f:
        f.seek((1 << 30) + 10)
        f.write(b"\0")
    out = str(tmp_path / "o.wav")
    r = run_cli("decode", big, out)
    assert r.returncode == 1
    assert "Failed to read LAC file" in r.stderr


def test_output_into_missing_directory_fails_cleanly(tmp_path, wav):
    out = str(tmp_path / "nodir" / "o.lac")
    r = run_cli("encode", wav, out)
    assert r.returncode == 1
    assert no_staged_siblings(tmp_path)

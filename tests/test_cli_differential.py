"""Differential CLI contract: run OUR CLI and the reference binary on
the same inputs with the same relative argv (separate working dirs) and
require identical exit codes, stdout, and stderr for every success and
failure class (VERDICT r4 #6 — message drift must not creep in).

Reference behavior: /root/reference/src/main.cpp:600-918.
"""

import os
import pathlib
import subprocess
import sys

import numpy as np
import pytest

from lac_tpu.io.wav import write_wav

REPO = str(pathlib.Path(__file__).resolve().parent.parent)


def _write_fixture(d):
    rng = np.random.RandomState(123)
    n = 30000
    t = np.arange(n, dtype=np.float64)
    sig = np.sin(2 * np.pi * 440 * t / 44100) * 9000
    l = np.clip(sig + rng.standard_normal(n) * 300, -32768, 32767).astype(np.int32)
    r = np.clip(np.roll(sig, 5) * 0.7, -32768, 32767).astype(np.int32)
    assert write_wav(str(d / "in.wav"), l, r, 2, 44100, 16)


def _prep_dir(tmp_path, name, with_lac=False, reference_cli=None):
    d = tmp_path / name
    d.mkdir()
    _write_fixture(d)
    (d / "trunc.wav").write_bytes((d / "in.wav").read_bytes()[:40])
    (d / "bad.lac").write_bytes(b"NOTALAC" + b"\x00" * 64)
    if with_lac:
        subprocess.run([reference_cli, "encode", "in.wav", "ok.lac"],
                       cwd=d, capture_output=True, check=True)
    return d


# (argv, scenario id) — every row runs through both CLIs
SCENARIOS = [
    (["encode", "in.wav", "out.lac"], "encode-ok"),
    (["encode", "in.wav", "out.lac", "--stereo-mode=ms"], "encode-ms"),
    (["encode", "in.wav", "out.lac", "--no-partitioning"], "encode-nopart"),
    (["decode", "ok.lac", "out.wav"], "decode-ok"),
    (["encode", "missing.wav", "out.lac"], "encode-missing-input"),
    (["encode", "trunc.wav", "out.lac"], "encode-malformed-wav"),
    (["encode", "in.wav", "in.wav"], "encode-same-path"),
    (["decode", "ok.lac", "ok.lac"], "decode-same-path"),
    (["decode", "missing.lac", "out.wav"], "decode-missing-input"),
    (["decode", "bad.lac", "out.wav"], "decode-malformed"),
    (["encode", "in.wav", "out.lac", "--threads=0"], "bad-threads-zero"),
    (["encode", "in.wav", "out.lac", "--threads=abc"], "bad-threads-text"),
    (["encode", "in.wav", "out.lac", "--threads="], "bad-threads-empty"),
    (["encode", "in.wav", "out.lac", "--stereo-mode=xy"], "bad-stereo-mode"),
    (["encode", "in.wav"], "encode-too-few-args"),
    (["decode", "ok.lac"], "decode-too-few-args"),
    (["frobnicate", "a", "b"], "unknown-command"),
    ([], "no-args"),
]


@pytest.mark.parametrize("argv,name", SCENARIOS, ids=[s[1] for s in SCENARIOS])
def test_cli_differential(tmp_path, reference_cli, argv, name):
    ours_d = _prep_dir(tmp_path, "ours", with_lac=True, reference_cli=reference_cli)
    ref_d = _prep_dir(tmp_path, "ref", with_lac=True, reference_cli=reference_cli)

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("LAC_THREADS", None)
    ours = subprocess.run([sys.executable, "-m", "lac_tpu.cli", *argv],
                          cwd=ours_d, capture_output=True, text=True,
                          env=env, timeout=300)
    ref = subprocess.run([reference_cli, *argv],
                         cwd=ref_d, capture_output=True, text=True,
                         env=env, timeout=300)
    assert ours.returncode == ref.returncode, (
        f"{name}: rc {ours.returncode} != {ref.returncode}\n"
        f"ours stderr: {ours.stderr!r}\nref stderr: {ref.stderr!r}"
    )
    assert ours.stdout == ref.stdout, f"{name}: stdout diverged"
    assert ours.stderr == ref.stderr, f"{name}: stderr diverged"
    # success scenarios must also leave identical artifacts
    for artifact in ("out.lac", "out.wav"):
        o, r = ours_d / artifact, ref_d / artifact
        assert o.exists() == r.exists(), f"{name}: {artifact} existence diverged"
        if o.exists():
            assert o.read_bytes() == r.read_bytes(), f"{name}: {artifact} bytes"

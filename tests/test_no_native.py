"""The pure-Python fallback paths (no native runtime) must produce the
same bytes: compact-ship emission + numpy packer + python decoder."""

import os
import pathlib
import subprocess
import sys

import pytest

GOLDEN = pathlib.Path(__file__).resolve().parent / "golden"

_SCRIPT = r"""
import sys, pathlib
import numpy as np
sys.path.insert(0, sys.argv[1])
sys.path.insert(0, str(pathlib.Path(sys.argv[1]) / "tests"))
from lac_tpu.runtime.native import native_available
assert not native_available(), "native must be disabled for this test"
from lac_tpu.encoder import FrameEncoder
from lac_tpu.decoder import FrameDecoder
from signals import cases

golden_dir = pathlib.Path(sys.argv[2])
checked = 0
for name in ("sine-auto", "sparse", "noise24", "silence"):
    left, right, sr, depth, smode = cases()[name]
    want = (golden_dir / f"{name}.lac").read_bytes()
    got = FrameEncoder(12, smode if len(right) else 0, sr, depth).encode(left, right)
    assert got == want, name
    dl, dr, _ = FrameDecoder().decode(got)
    assert np.array_equal(dl, left) and np.array_equal(dr, right), name
    checked += 1
print(f"fallback parity ok on {checked} cases")
"""


def test_fallback_paths_byte_identical(tmp_path):
    if not (GOLDEN / "sine-auto.lac").exists():
        pytest.skip("golden fixtures missing")
    env = {**os.environ, "LAC_TPU_NO_NATIVE": "1", "JAX_PLATFORMS": "cpu"}
    root = str(pathlib.Path(__file__).resolve().parent.parent)
    r = subprocess.run(
        [sys.executable, "-c", _SCRIPT, root, str(GOLDEN)],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert r.returncode == 0, r.stderr
    assert "fallback parity ok" in r.stdout

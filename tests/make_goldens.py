"""Regenerate golden .lac fixtures from the reference binary.

Run from the repo root with the reference built in .refbuild:
    python tests/make_goldens.py
"""

import pathlib
import subprocess
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

from lac_tpu.io import write_wav  # noqa: E402
from tests.signals import cases  # noqa: E402

GOLDEN = pathlib.Path(__file__).resolve().parent / "golden"
REF = pathlib.Path(__file__).resolve().parent.parent / ".refbuild" / "lac_cli"

MODE_FLAG = {0: "--stereo-mode=lr", 1: "--stereo-mode=ms", 2: None}


def main():
    GOLDEN.mkdir(exist_ok=True)
    with tempfile.TemporaryDirectory() as td:
        for name, (left, right, sr, depth, smode) in cases().items():
            wav = f"{td}/{name}.wav"
            lac = f"{td}/{name}.lac"
            ch = 2 if len(right) else 1
            assert write_wav(wav, left, right, ch, sr, depth)
            args = [str(REF), "encode", wav, lac]
            flag = MODE_FLAG[smode if ch == 2 else 0]
            if flag:
                args.append(flag)
            subprocess.run(args, check=True, capture_output=True)
            data = open(lac, "rb").read()
            (GOLDEN / f"{name}.lac").write_bytes(data)
            print(f"{name}: {len(data)} bytes")


if __name__ == "__main__":
    main()

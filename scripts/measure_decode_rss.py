"""Measure peak RSS of streaming vs in-memory decode.

Builds an N-sample stereo .lac (default 24M samples/ch ~ 192 MB int32
PCM), then decodes it in a fresh subprocess per mode and reports
ru_maxrss. Usage: python scripts/measure_decode_rss.py [samples]
"""

import os
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHILD = r"""
import resource, sys, time
import lac_tpu
from lac_tpu.decoder import FrameDecoder

mode, lac_path, wav_path = sys.argv[1:4]
data = open(lac_path, "rb").read()
t0 = time.perf_counter()
dec = FrameDecoder()
if mode == "stream":
    res = dec.decode_to_wav(data, wav_path)
    assert res is not None
else:
    from lac_tpu.io import write_wav_unchecked_samples
    l, r, hdr = dec.decode(data)
    assert write_wav_unchecked_samples(wav_path, l, r, hdr.channels, hdr.sample_rate, hdr.bit_depth)
dt = time.perf_counter() - t0
rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
print(f"{mode}: peak_rss={rss/1024:.0f} MiB wall={dt:.2f}s")
"""


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 24_000_000
    with tempfile.TemporaryDirectory() as d:
        lac_path = os.path.join(d, "big.lac")
        print(f"encoding {n} samples/ch stereo 16-bit ...", flush=True)
        rng = np.random.default_rng(7)
        t = np.arange(n, dtype=np.float64)
        left = (np.sin(2 * np.pi * 220.0 / 44100.0 * t) * 18000).astype(np.int32)
        left += rng.integers(-400, 401, n, dtype=np.int32)
        right = left + rng.integers(-300, 301, n, dtype=np.int32)
        ref = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           ".refbuild", "lac_cli")
        if os.path.exists(ref):  # fast fixture: reference binary encode
            from lac_tpu.io import write_wav

            wav_path = os.path.join(d, "big.wav")
            assert write_wav(wav_path, left, right, 2, 44100, 16)
            subprocess.run([ref, "encode", wav_path, lac_path], check=True,
                           capture_output=True)
            os.unlink(wav_path)
        else:
            from lac_tpu.encoder import FrameEncoder

            data = FrameEncoder(12, 2, 44100, 16, xp=np).encode(left, right)
            with open(lac_path, "wb") as f:
                f.write(data)
            del data
        del left, right
        print(f"lac size: {os.path.getsize(lac_path)/2**20:.1f} MiB", flush=True)

        env = {**os.environ, "JAX_PLATFORMS": "cpu"}
        for mode in ("stream", "memory"):
            wav = os.path.join(d, f"{mode}.wav")
            r = subprocess.run(
                [sys.executable, "-c", CHILD, mode, lac_path, wav],
                env=env, capture_output=True, text=True,
            )
            sys.stdout.write(r.stdout + r.stderr)
        a = open(os.path.join(d, "stream.wav"), "rb").read()
        b = open(os.path.join(d, "memory.wav"), "rb").read()
        print("outputs byte-identical:", a == b)


if __name__ == "__main__":
    main()

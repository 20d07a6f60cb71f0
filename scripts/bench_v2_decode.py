#!/usr/bin/env python
"""v2 legacy decode throughput: ours (native serial v2 path,
lac_runtime.cpp lac_decode_v2_stream) vs the reference CLI (which
routes v2 through its serial library decoder, main.cpp:769-784).

Builds a large v3 stream with the native encoder, rewrites the table
to the v2 layout (version byte 2, sizes-only table, same payloads —
the two formats share block payloads byte-for-byte), and times
full-file decode-to-WAV on both sides. PCM is verified equal to the
v3 decode.

Usage: python scripts/bench_v2_decode.py [SECONDS_OF_AUDIO]
"""

import pathlib
import subprocess
import sys
import tempfile
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
REF = ROOT / ".refbuild" / "lac_cli"

from lac_tpu.decoder import FrameDecoder  # noqa: E402
from lac_tpu.encoder import FrameEncoder  # noqa: E402
from lac_tpu.format import constants as C  # noqa: E402
from lac_tpu.io import read_wav  # noqa: E402

SR = 44100


def v3_to_v2(bs: bytes) -> bytes:
    nb = int.from_bytes(bs[C.HEADER_BYTES:C.HEADER_BYTES + 4], "big")
    table = np.frombuffer(bs, dtype=">u4", count=2 * nb,
                          offset=C.HEADER_BYTES + 4).reshape(nb, 2)
    hdr = bytearray(bs[:C.HEADER_BYTES])
    hdr[2] = 2  # version byte (format.md header layout)
    return (bytes(hdr) + nb.to_bytes(4, "big")
            + table[:, 0].astype(">u4").tobytes()
            + bs[C.HEADER_BYTES + 4 + 8 * nb:])


def main():
    seconds = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    frames = SR * seconds
    rng = np.random.RandomState(11)
    t = np.arange(frames, dtype=np.float64)
    sig = sum(rng.uniform(2000, 9000) * np.sin(2 * np.pi * rng.uniform(80, 4000) * t / SR)
              for _ in range(3))
    left = np.clip(sig + rng.randint(-1500, 1500, frames), -32768, 32767).astype(np.int32)
    right = np.clip(sig * 0.6 + rng.randint(-800, 800, frames), -32768, 32767).astype(np.int32)

    bs = FrameEncoder(12, 2, SR, 16, xp=np).encode(left, right)
    v2 = v3_to_v2(bs)

    dec = FrameDecoder()
    l2, r2, hdr = dec.decode(v2)
    assert hdr.version == 2
    assert np.array_equal(l2, left) and np.array_equal(r2, right)

    with tempfile.TemporaryDirectory() as td:
        v2p, wav_ours, wav_ref = f"{td}/a.v2.lac", f"{td}/ours.wav", f"{td}/ref.wav"
        open(v2p, "wb").write(v2)

        t0 = time.perf_counter()
        dec.decode_to_wav(v2, wav_ours)
        ours_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        r = subprocess.run([str(REF), "decode", v2p, wav_ref], capture_output=True)
        ref_s = time.perf_counter() - t0
        assert r.returncode == 0, r.stderr

        assert open(wav_ours, "rb").read() == open(wav_ref, "rb").read()
        got = read_wav(wav_ours)
        assert np.array_equal(got[0], left)

    print({"metric": "v2_decode_throughput", "frames": frames,
           "value": round(frames / ours_s, 1), "unit": "frames/s",
           "ref_value": round(frames / ref_s, 1),
           "vs_ref": round(ref_s / ours_s, 3), "parity": "WAV byte-identical"})
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Large-scale differential validation campaign vs the reference binary.

Generates fresh random signals (not the fixed suite fixtures) across six
signal classes x random lengths x all three stereo modes x both bit
depths, asserts our encoder's .lac bytes equal the reference CLI's on
every one, and round-trips each stream back to the exact PCM through our
decoder. This is the repeatable form of the ad-hoc post-rework campaigns
recorded in docs/benchmarks.md.

Usage:
    python scripts/campaign.py [N_SIGNALS] [SEED0]
Defaults: 60 signals, seed 0 (about 4 minutes on one core). Exits
nonzero on the first divergence, printing a repro line.
"""

import os
import pathlib
import subprocess
import sys
import tempfile

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
REF = ROOT / ".refbuild" / "lac_cli"

from lac_tpu.decoder import FrameDecoder  # noqa: E402
from lac_tpu.encoder import FrameEncoder  # noqa: E402
from lac_tpu.io.wav import read_wav, write_wav  # noqa: E402


def gen_signal(rng, n, depth):
    lim = 32768 if depth == 16 else 1 << 23
    cls = rng.randint(6)
    t = np.arange(n, dtype=np.float64)
    if cls == 0:  # music-like: gliding tones + filtered noise + envelope
        sig = np.zeros(n)
        for _ in range(rng.randint(1, 4)):
            f0, f1 = rng.uniform(60, 8000, 2)
            freq = np.linspace(f0, f1, n)
            sig += rng.uniform(0.05, 0.4) * np.sin(2 * np.pi * np.cumsum(freq) / 44100)
        noise = rng.standard_normal(n)
        for _ in range(rng.randint(0, 3)):
            noise = 0.5 * noise + 0.5 * np.concatenate([[0.0], noise[:-1]])
        sig += rng.uniform(0, 0.1) * noise
        env = 0.5 * (1 + np.sin(2 * np.pi * rng.uniform(0.1, 2.0) * t / 44100))
        x = sig * env * lim * 0.8
    elif cls == 1:  # white/laplacian noise at random scale
        x = rng.laplace(0, rng.uniform(1, lim / 4), n)
    elif cls == 2:  # near-silence with sparse impulses
        x = np.zeros(n)
        k = max(1, n // rng.randint(20, 400))
        x[rng.randint(0, n, k)] = rng.randint(-lim, lim, k)
    elif cls == 3:  # ramps / piecewise linear
        pts = np.sort(rng.randint(0, n, rng.randint(2, 8)))
        x = np.interp(t, pts, rng.uniform(-lim, lim - 1, len(pts)))
    elif cls == 4:  # AR(2) resonator (near-unstable)
        e = rng.standard_normal(n)
        r = rng.uniform(0.9, 0.999)
        th = rng.uniform(0.01, np.pi - 0.01)
        a1, a2 = 2 * r * np.cos(th), -r * r
        x = np.zeros(n)
        for i in range(2, n):
            x[i] = a1 * x[i - 1] + a2 * x[i - 2] + e[i]
        m = np.abs(x).max() or 1.0
        x = x / m * lim * rng.uniform(0.3, 0.98)
    else:  # boundary-heavy square-ish
        x = np.where(np.sin(2 * np.pi * rng.uniform(50, 2000) * t / 44100) > 0, lim - 1, -lim)
        x = x * rng.uniform(0.5, 1.0)
    return np.clip(x, -lim, lim - 1).astype(np.int32)


def main():
    n_signals = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    seed0 = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    assert REF.exists(), "build the reference first (see CLAUDE.md)"
    dec = FrameDecoder()
    ok = 0
    with tempfile.TemporaryDirectory() as td:
        for i in range(n_signals):
            rng = np.random.RandomState(seed0 + i)
            depth = 16 if rng.rand() < 0.7 else 24
            sr = int(rng.choice([44100, 48000, 96000, 192000]))
            n = int(rng.randint(700, 60000))
            stereo = rng.rand() < 0.8
            mode = int(rng.randint(3)) if stereo else 0
            l = gen_signal(rng, n, depth)
            r = gen_signal(rng, n, depth) if stereo else np.empty(0, np.int32)
            if stereo and rng.rand() < 0.5:  # correlated channels half the time
                r = np.clip(
                    l * rng.uniform(0.5, 1.0) + r * rng.uniform(0, 0.2),
                    -(1 << (depth - 1)), (1 << (depth - 1)) - 1,
                ).astype(np.int32)
            wav = f"{td}/c{i}.wav"
            lac = f"{td}/c{i}.lac"
            assert write_wav(wav, l, r, 2 if stereo else 1, sr, depth)
            mode_flag = ["--stereo-mode=lr", "--stereo-mode=ms", None][mode] if stereo else None
            cmd = [str(REF), "encode", wav, lac] + ([mode_flag] if mode_flag else [])
            subprocess.run(cmd, check=True, capture_output=True)
            ref_bytes = open(lac, "rb").read()
            smode = mode if stereo else 0
            ours = FrameEncoder(12, smode, sr, depth).encode(l, r)
            repro = f"seed={seed0 + i} n={n} sr={sr} depth={depth} stereo={stereo} mode={mode}"
            if ours != ref_bytes:
                print(f"ENCODE DIVERGENCE: {repro}")
                return 1
            dl, dr, _hdr = dec.decode(ours)
            wl, wr = read_wav(wav)[:2]
            for c, w in ((dl, wl), (dr, wr)):
                if not np.array_equal(np.asarray(c), np.asarray(w)):
                    print(f"DECODE MISMATCH: {repro}")
                    return 1
            ok += 1
            if (i + 1) % 10 == 0:
                print(f"{i + 1}/{n_signals} byte-identical", flush=True)
    print(f"campaign: {ok}/{n_signals} signals byte-identical + PCM-exact")
    return 0


if __name__ == "__main__":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    sys.exit(main())

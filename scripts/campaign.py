"""Large-scale differential validation campaign vs the reference binary.

Two modes:

- random (default): fresh random signals across six signal classes x
  random lengths x all three stereo modes x both bit depths.
- ``--edges``: constructed signals sitting ON the reference's decision
  boundaries, where byte-parity risk actually lives. Each family sweeps
  a parameter densely ACROSS a threshold, so some instances land on
  each side and some exactly at it — if our implementation flips a
  decision at a different point than the reference, bytes diverge at
  the crossing. Families (reference citations):
    zero-run length around ZERO_RUN_MIN_LENGTH=4     block/encoder.cpp:218
    escape threshold u == 2^min(24,k+3)              block/encoder.cpp:719
    stereo band |lr-ms| <= smaller/100 + saturation  lac/encoder.cpp:188-196
    partition speed margin best/20 and p-ties        block/encoder.cpp:539-544
    static-mode decode-speed margin bits/20          block/encoder.cpp:190-192,518-522
    predictor-cost ties (polynomial signals)         block/encoder.cpp:352-359
    adapt-k drift (4/3, 3/4) and micro (75%/80%)     rice/rice.hpp:85-106

Every case is encoded by the reference CLI and by FrameEncoder,
byte-compared, and round-tripped back to exact PCM through our decoder.

Usage:
    python scripts/campaign.py [N_SIGNALS] [SEED0]
    python scripts/campaign.py --edges [SCALE] [SEED0]
Defaults: 60 random signals / scale 1 (~270 edge cases; scale 4 ~ 1,050),
seed 0.
Exits nonzero on the first divergence, printing a repro line.
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


def run_case(td, i, label, l, r, sr, depth, mode, dec):
    """Encode one case through both implementations; returns an error
    string or None. ``mode``: 0=lr, 1=ms, 2=per-block (stereo only)."""
    stereo = r is not None and len(r)
    wav = f"{td}/c{i}.wav"
    lac = f"{td}/c{i}.lac"
    r = r if stereo else np.empty(0, np.int32)
    assert write_wav(wav, l, r, 2 if stereo else 1, sr, depth)
    mode_flag = ["--stereo-mode=lr", "--stereo-mode=ms", None][mode] if stereo else None
    cmd = [str(REF), "encode", wav, lac] + ([mode_flag] if mode_flag else [])
    subprocess.run(cmd, check=True, capture_output=True)
    ref_bytes = open(lac, "rb").read()
    ours = FrameEncoder(12, mode if stereo else 0, sr, depth).encode(l, r)
    if ours != ref_bytes:
        return f"ENCODE DIVERGENCE: {label}"
    dl, dr, _hdr = dec.decode(ours)
    wl, wr = read_wav(wav)[:2]
    for c, w in ((dl, wl), (dr, wr)):
        if not np.array_equal(np.asarray(c), np.asarray(w)):
            return f"DECODE MISMATCH: {label}"
    return None


def random_cases(n_signals, seed0):
    for i in range(n_signals):
        rng = np.random.RandomState(seed0 + i)
        depth = 16 if rng.rand() < 0.7 else 24
        sr = int(rng.choice([44100, 48000, 96000, 192000]))
        n = int(rng.randint(700, 60000))
        stereo = rng.rand() < 0.8
        mode = int(rng.randint(3)) if stereo else 0
        l = gen_signal(rng, n, depth)
        r = gen_signal(rng, n, depth) if stereo else None
        if stereo and rng.rand() < 0.5:  # correlated channels half the time
            r = np.clip(
                l * rng.uniform(0.5, 1.0) + r * rng.uniform(0, 0.2),
                -(1 << (depth - 1)), (1 << (depth - 1)) - 1,
            ).astype(np.int32)
        yield (
            f"seed={seed0 + i} n={n} sr={sr} depth={depth} stereo={stereo} mode={mode}",
            l, r, sr, depth, mode,
        )


# ---------------------------------------------------------------- edges

def _inv_zigzag(u):
    """v with unsigned_from_residual(v) == u (u=2v / u=-2v-1)."""
    return u // 2 if u % 2 == 0 else -((u + 1) // 2)


def _clip(x, depth):
    lim = 1 << (depth - 1)
    return np.clip(np.asarray(x), -lim, lim - 1).astype(np.int32)


def edges_zero_run(scale, seed0):
    """Zero runs of exact lengths around ZERO_RUN_MIN_LENGTH=4, at block
    starts/ends and straddling partition boundaries. Mostly-zero signals
    make fixed order-0 win, so the residual IS the signal."""
    for rep in range(scale):
        rng = np.random.RandomState(seed0 + 7000 + rep)
        for rl in range(1, 9):
            for amp in (1, 2, 7):
                # short block: impulses separated by an exact rl-run
                n = 600
                x = np.zeros(n, np.int64)
                pos = 17
                while pos < n - rl - 2:
                    x[pos] = amp if (pos // 50) % 2 else -amp
                    pos += rl + 1  # next nonzero after an exact rl-run
                yield f"zr rl={rl} amp={amp} rep={rep}", _clip(x, 16), None, 44100, 16, 0
        # runs straddling partition boundaries of a full 16384 block
        for rl in (3, 4, 5, 8):
            for p in (1, 3, 5):
                n = 16384 + 100
                x = rng.randint(-40, 40, n).astype(np.int64)
                step = 16384 >> p
                for b in range(step, 16384, step):
                    x[b - rl // 2 : b - rl // 2 + rl] = 0
                yield f"zr-part rl={rl} p={p} rep={rep}", _clip(x, 16), None, 44100, 16, 0
        # all-zero, run-to-end, run-from-start, alternating 3/4/5 runs
        z = np.zeros(5000, np.int32)
        yield f"zr-allzero rep={rep}", z, None, 44100, 16, 0
        for rl in (3, 4, 5):
            x = np.zeros(3000, np.int64)
            x[: 3000 - rl] = rng.randint(1, 9, 3000 - rl) * np.where(
                rng.rand(3000 - rl) < 0.5, -1, 1
            )  # nonzero body, exact rl-run of zeros at the end
            yield f"zr-tail rl={rl} rep={rep}", _clip(x, 16), None, 44100, 16, 0
        pat = []
        for j in range(400):
            pat.extend([0] * (3 + j % 3))
            pat.append(int(rng.randint(1, 5)) * (1 if j % 2 else -1))
        yield f"zr-mix rep={rep}", _clip(pat, 16), None, 44100, 16, 0


def edges_escape(scale, seed0):
    """Spikes with u swept across 2^min(24,k+3): background noise pins
    k via the adaptive mean, spikes land on T-1/T/T+1 (and the k-1/k+1
    neighborhoods, since k wanders +-1 with bias)."""
    for rep in range(scale):
        rng = np.random.RandomState(seed0 + 8000 + rep)
        for k in (0, 1, 2, 4, 6, 8, 10, 12):
            depth = 16 if k <= 10 else 24
            n = 4000
            # u background uniform in [2^(k-1), 2^k) -> adaptive k near k
            lo = 1 << max(0, k - 1)
            u_bg = rng.randint(lo, max(lo + 1, 1 << k), n)
            x = np.array([_inv_zigzag(int(u)) for u in u_bg], np.int64)
            T = 1 << min(24, k + 3)
            spikes = [T - 2, T - 1, T, T + 1, T + 2,
                      T // 2 - 1, T // 2, T // 2 + 1, 2 * T - 1, 2 * T, 2 * T + 1]
            lim = 1 << (depth - 1)
            for j, u in enumerate(spikes):
                v = _inv_zigzag(int(u))
                if -lim <= v < lim:
                    x[500 + 300 * j] = v
            yield f"esc k={k} rep={rep}", _clip(x, depth), None, 44100, depth, 0
        # the min(24, k+3) cap: sawtooth at 24-bit (order-1 residual is
        # the constant step; wrap jumps sweep u across 2^24)
        for step_scale in (0.8, 1.0, 1.25):
            step = int((1 << 21) * step_scale)
            n = 16384
            x = (np.arange(n, dtype=np.int64) * step + (1 << 22)) % (1 << 24) - (1 << 23)
            noise = rng.randint(-(1 << 18), 1 << 18, n)
            yield (
                f"esc-cap step={step} rep={rep}",
                _clip(x + noise, 24), None, 96000, 24, 0,
            )


def edges_stereo(scale, seed0):
    """lr vs ms proxy-cost band (|diff| <= smaller/100), exact-tie and
    saturating-accumulator cases (lac/encoder.cpp:150-196)."""
    for rep in range(scale):
        rng = np.random.RandomState(seed0 + 9000 + rep)
        for n in (2048, 4096, 16384):
            base = rng.randint(-8000, 8000, n).astype(np.int64)
            for ratio in np.geomspace(0.55, 1.8, 13):
                d = (rng.randint(-8000, 8000, n) * ratio).astype(np.int64)
                l = _clip(base, 16)
                r = _clip(base - d, 16)
                for mode in (2, 0, 1) if n == 4096 else (2,):
                    yield f"st n={n} ratio={ratio:.3f} m={mode} rep={rep}", l, r, 44100, 16, mode
        # identical channels (difference == 0), silence (smaller == 0)
        mono = _clip(rng.randint(-500, 500, 3000), 16)
        yield f"st-same rep={rep}", mono, mono.copy(), 44100, 16, 2
        yield f"st-silence rep={rep}", np.zeros(3000, np.int32), np.zeros(3000, np.int32), 44100, 16, 2
        # saturating adds: full-scale alternation makes every zigzag
        # difference huge; 16- and 24-bit, including one full block
        for depth, n in ((16, 4096), (24, 4096), (16, 16384)):
            lim = 1 << (depth - 1)
            l = np.where(np.arange(n) % 2 == 0, lim - 1, -lim).astype(np.int32)
            r = np.where(np.arange(n) % 2 == 1, lim - 1, -lim).astype(np.int32)
            yield f"st-sat depth={depth} n={n} rep={rep}", l, r, 44100, depth, 2
        # near-saturation mixed with correlation sweep
        for a in np.linspace(0.1, 0.9, 5):
            lim = 1 << 15
            l = _clip(rng.randint(-lim, lim, 4096), 16)
            r = _clip(l * a + rng.randint(-2000, 2000, 4096), 16)
            yield f"st-corr a={a:.2f} rep={rep}", l, r, 44100, 16, 2


def edges_partition(scale, seed0):
    """Partition choice: speed margin best/20 (a p>0 win must beat p=0
    by >5%), p-ties, and per-partition mode flips at segment edges."""
    for rep in range(scale):
        rng = np.random.RandomState(seed0 + 10000 + rep)
        n = 16384
        half = np.concatenate([np.ones(n // 2), np.ones(n // 2) * 0.0])
        for ratio in np.geomspace(1.0, 3.5, 15):
            prof = 1.0 + (ratio - 1.0) * half
            x = rng.randint(-300, 300, n) * prof
            yield f"part ratio={ratio:.3f} rep={rep}", _clip(x, 16), None, 44100, 16, 0
        # 4-segment variance for higher partition orders
        for ratio in np.geomspace(1.1, 4.0, 6):
            prof = np.repeat([1.0, ratio, 1.0 / ratio, ratio * 0.7], n // 4)
            x = rng.randint(-400, 400, n) * prof
            yield f"part4 ratio={ratio:.3f} rep={rep}", _clip(x, 16), None, 44100, 16, 0
        # stationary noise: all p nearly tie, metadata decides; the
        # lowest-p preference on exact ties is the target
        for scale_amp in (5, 60, 900):
            x = rng.randint(-scale_amp, scale_amp, n)
            yield f"part-flat amp={scale_amp} rep={rep}", _clip(x, 16), None, 44100, 16, 0


def edges_static(scale, seed0):
    """Static-rice vs adaptive margin (within_decode_speed_margin: static
    wins whenever static <= bits + bits/20): drift rate swept so the
    adaptive advantage crosses 5%."""
    for rep in range(scale):
        rng = np.random.RandomState(seed0 + 11000 + rep)
        for n in (1200, 4096, 16384):
            for drift in np.geomspace(1.0, 2.6, 9):
                env = np.linspace(1.0, drift, n)
                x = rng.laplace(0, 70, n) * env
                yield f"static n={n} drift={drift:.3f} rep={rep}", _clip(x, 16), None, 44100, 16, 0
        for amp in (2, 9, 33, 130, 510, 2000):
            x = rng.laplace(0, amp, 4096)
            yield f"static-flat amp={amp} rep={rep}", _clip(x, 16), None, 44100, 16, 0


def edges_predictor_tie(scale, seed0):
    """best_bits ties between predictor candidates (strict-< keeps the
    first/lowest type): polynomial signals zero out every fixed order
    above the degree; tiny tail blocks tie trivially."""
    for rep in range(scale):
        rng = np.random.RandomState(seed0 + 12000 + rep)
        for deg in range(5):
            for c in (1, 3, 17):
                i = np.arange(3000, dtype=np.int64)
                x = sum(int(rng.randint(1, 4)) * i**d for d in range(deg + 1)) * c
                x = x % 20011 - 10005  # keep in range, preserve polynomial locally
                yield f"tie deg={deg} c={c} rep={rep}", _clip(x, 16), None, 44100, 16, 0
        for n in list(range(1, 12)) + [16, 24, 33, 64]:
            x = rng.randint(-4, 4, n)
            yield f"tie-tiny n={n} rep={rep}", _clip(x, 16), None, 44100, 16, 0
            yield f"tie-const n={n} rep={rep}", _clip(np.full(n, 7), 16), None, 44100, 16, 0
        # constant, ramp, alternating over a full block + tiny tail
        for pat in ("const", "ramp", "alt"):
            n = 16384 + 3
            if pat == "const":
                x = np.full(n, -123)
            elif pat == "ramp":
                x = (np.arange(n) % 8000) - 4000
            else:
                x = np.where(np.arange(n) % 2 == 0, 55, -55)
            yield f"tie-{pat} rep={rep}", _clip(x, 16), None, 44100, 16, 0
        # low-amplitude pure tones: LPC vs fixed-order cost race
        for ampl in (4, 12, 40, 150):
            t = np.arange(6000)
            x = ampl * np.sin(2 * np.pi * 441.3 * t / 44100)
            yield f"tie-tone amp={ampl} rep={rep}", _clip(x, 16), None, 44100, 16, 0


def edges_adapt_bias(scale, seed0):
    """adapt_k bias flips: drift ratios swept across 4/3 and 3/4, micro
    large-q fraction across 75%, zero-q fraction across 80%
    (rice/rice.hpp:85-106)."""
    for rep in range(scale):
        rng = np.random.RandomState(seed0 + 13000 + rep)
        n = 4000
        for r in np.linspace(1.15, 1.55, 9):  # local/global mean across 4/3
            env = np.concatenate([np.ones(n // 2), np.full(n - n // 2, r)])
            u = (rng.randint(16, 48, n) * env).astype(np.int64)
            x = np.array([_inv_zigzag(int(v)) for v in u])
            yield f"bias-up r={r:.3f} rep={rep}", _clip(x, 16), None, 44100, 16, 0
        for r in np.linspace(0.6, 0.9, 7):  # across 3/4
            env = np.concatenate([np.ones(n // 2), np.full(n - n // 2, r)])
            u = (rng.randint(16, 48, n) * env).astype(np.int64)
            x = np.array([_inv_zigzag(int(v)) for v in u])
            yield f"bias-down r={r:.3f} rep={rep}", _clip(x, 16), None, 44100, 16, 0
        for f in np.linspace(0.65, 0.85, 7):  # large-q fraction across 3/4
            big = rng.randint(0, n, int(n * f))
            u = rng.randint(4, 8, n).astype(np.int64)  # k ~ 2-3
            u[big] = rng.randint(200, 400, len(big))  # q >> 3
            x = np.array([_inv_zigzag(int(v)) for v in u])
            yield f"bias-large f={f:.3f} rep={rep}", _clip(x, 16), None, 44100, 16, 0
        for f in np.linspace(0.7, 0.9, 7):  # zero-q fraction across 4/5
            zero = rng.randint(0, n, int(n * f))
            u = rng.randint(40, 90, n).astype(np.int64)
            u[zero] = rng.randint(0, 3, len(zero))  # q == 0 at k ~ 5-6
            x = np.array([_inv_zigzag(int(v)) for v in u])
            yield f"bias-zero f={f:.3f} rep={rep}", _clip(x, 16), None, 44100, 16, 0


def edges_ladder(scale, seed0):
    """LPC residual int32-overflow fallback ladder {12,10,8,6,4,0}
    (reference lpc.cpp:188-229): repeatedly integrated noise at 24-bit
    full scale has near-unit-circle poles, so direct-form Q15 coeffs
    grow binomially (hundreds) and the order-12 dot product crosses the
    int32 range check; amplitude swept across the overflow boundary."""
    for rep in range(scale):
        rng = np.random.RandomState(seed0 + 14000 + rep)
        for integ in (2, 4, 6, 8, 10, 12):
            for amp_frac in (0.2, 0.6, 0.9, 0.999):
                n = 16384 + 50
                x = rng.randn(n)
                for _ in range(integ):
                    x = np.cumsum(x)
                    x -= x.mean()
                peak = np.abs(x).max() or 1.0
                x = x * ((1 << 23) - 1) * amp_frac / peak
                yield (
                    f"ladder integ={integ} a={amp_frac} rep={rep}",
                    _clip(x, 24), None, 96000, 24, 0,
                )
        # smooth tone at full 24-bit scale + integrated-noise floor:
        # high predictability with huge dynamic range
        t = np.arange(16384, dtype=np.float64)
        for f0 in (30.0, 61.7, 123.4):
            x = ((1 << 23) - 2) * np.sin(2 * np.pi * f0 * t / 96000)
            d = np.cumsum(np.cumsum(rng.randn(16384)))
            x += d * 1000.0 / (np.abs(d).max() or 1.0)
            yield f"ladder-tone f={f0} rep={rep}", _clip(x, 24), None, 96000, 24, 0


def edges_k_drift(scale, seed0):
    """Adaptive-k long walks: background u crosses bit_width(mean-1)
    boundaries (mean pinned just below/at/above 2^m) and ramps that
    drag k monotonically up then down many steps inside one partition
    (rice.hpp:45-114 global-mean recompute + drift window)."""
    for rep in range(scale):
        rng = np.random.RandomState(seed0 + 15000 + rep)
        n = 8192
        for m in (2, 4, 6, 8, 10):
            for off in (-2, -1, 0, 1, 2):
                mean = (1 << m) + off
                if mean < 1:
                    continue
                # u i.i.d. with mean EXACTLY pinned near 2^m: alternate
                # mean-1/mean+1 with occasional exact-mean runs
                u = np.full(n, mean, np.int64)
                flip = rng.rand(n) < 0.5
                u[flip] += 1
                u[~flip] -= 1
                u[u < 0] = 0
                x = np.array([_inv_zigzag(int(v)) for v in u])
                yield f"kdrift m={m} off={off} rep={rep}", _clip(x, 16), None, 44100, 16, 0
        # geometric ramp up 2^1 -> 2^12 -> back down across one block:
        # k walks the whole range, bias flipping at each crossover
        env = np.concatenate([np.geomspace(2, 4096, n // 2),
                              np.geomspace(4096, 2, n - n // 2)])
        u = (env * (0.75 + 0.5 * rng.rand(n))).astype(np.int64)
        x = np.array([_inv_zigzag(int(v)) for v in u])
        yield f"kdrift-ramp rep={rep}", _clip(x, 16), None, 44100, 16, 0
        # step square wave between k~1 and k~9 every 96 samples: the
        # micro window (96 entries) exactly spans each plateau
        steps = np.tile(np.repeat([4, 700], 96), n // 192 + 1)[:n]
        u = (steps * (0.7 + 0.6 * rng.rand(n))).astype(np.int64)
        x = np.array([_inv_zigzag(int(v)) for v in u])
        yield f"kdrift-micro rep={rep}", _clip(x, 16), None, 44100, 16, 0


def edges_sizes(scale, seed0):
    """Final-block sizes at the partition-minimum (32) and metadata
    boundaries, plus mid/side rounding at full-scale parity combos
    ((l+r)>>1 floor semantics, lac/encoder.cpp:303-317)."""
    for rep in range(scale):
        rng = np.random.RandomState(seed0 + 16000 + rep)
        tails = [1, 2, 3, 31, 32, 33, 63, 64, 65, 255, 256, 257,
                 4095, 4096, 16383]
        for tail in tails:
            n = 16384 + tail
            x = rng.laplace(0, 120, n)
            yield f"size tail={tail} rep={rep}", _clip(x, 16), None, 44100, 16, 0
        for tail in (1, 32, 257, 16383):  # stereo + 24-bit variants
            n = 16384 + tail
            l = rng.laplace(0, 300000, n)
            r = l * 0.8 + rng.laplace(0, 9000, n)
            yield (f"size24 tail={tail} rep={rep}", _clip(l, 24),
                   _clip(r, 24), 192000, 24, 2)
        # MS parity extremes: every sign/parity combo at the rails so
        # mid's floor shift and side's 17/25-bit range are exercised
        lim16, lim24 = 1 << 15, 1 << 23
        combos = []
        for a in (lim16 - 1, lim16 - 2, -lim16, -lim16 + 1, 1, 0, -1):
            for b in (lim16 - 1, lim16 - 2, -lim16, -lim16 + 1, 0):
                combos.append((a, b))
        l = np.array([c[0] for c in combos] * 37, np.int32)
        r = np.array([c[1] for c in combos] * 37, np.int32)
        for mode in (1, 2):
            yield f"ms-rails16 m={mode} rep={rep}", l, r, 44100, 16, mode
        l24 = (l.astype(np.int64) * (lim24 // lim16)).astype(np.int32)
        r24 = (r.astype(np.int64) * (lim24 // lim16)).astype(np.int32)
        np.clip(l24, -lim24, lim24 - 1, out=l24)
        np.clip(r24, -lim24, lim24 - 1, out=r24)
        yield f"ms-rails24 rep={rep}", l24, r24, 96000, 24, 2
        # one full block of rail pairs (partitioned side-channel paths)
        idx = rng.randint(0, len(combos), 16384)
        lf = np.array([combos[i][0] for i in idx], np.int32)
        rf = np.array([combos[i][1] for i in idx], np.int32)
        yield f"ms-rails-block rep={rep}", lf, rf, 44100, 16, 2


def edge_cases(scale, seed0):
    for fam in (edges_zero_run, edges_escape, edges_stereo, edges_partition,
                edges_static, edges_predictor_tie, edges_adapt_bias,
                edges_ladder, edges_k_drift, edges_sizes):
        yield from fam(scale, seed0)


def main():
    args = sys.argv[1:]
    assert REF.exists(), "build the reference first (see CLAUDE.md)"
    if args and args[0] == "--edges":
        scale = int(args[1]) if len(args) > 1 else 1
        seed0 = int(args[2]) if len(args) > 2 else 0
        cases = edge_cases(scale, seed0)
        what = f"edge cases (scale {scale})"
    else:
        n_signals = int(args[0]) if args else 60
        seed0 = int(args[1]) if len(args) > 1 else 0
        cases = random_cases(n_signals, seed0)
        what = f"{n_signals} random signals"
    dec = FrameDecoder()
    ok = 0
    with tempfile.TemporaryDirectory() as td:
        for i, (label, l, r, sr, depth, mode) in enumerate(cases):
            err = run_case(td, i, label, l, r, sr, depth, mode, dec)
            if err:
                print(err)
                return 1
            ok += 1
            if (i + 1) % 50 == 0:
                print(f"{i + 1} byte-identical", flush=True)
    print(f"campaign: {ok}/{ok} {what} byte-identical + PCM-exact")
    return 0


if __name__ == "__main__":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    sys.exit(main())

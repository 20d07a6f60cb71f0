"""Deterministic test signals shared by parity/roundtrip tests and the
golden-fixture generator."""

import numpy as np


def lcg_noise(n, scale, state=12345):
    out = np.empty(n, dtype=np.int64)
    s = state
    for i in range(n):
        s = (s * 1664525 + 1013904223) & 0xFFFFFFFF
        out[i] = (s % (2 * scale + 1)) - scale
    return out.astype(np.int32)


def sine(n, sr, freq, amp):
    t = np.arange(n, dtype=np.float64) / sr
    return (np.sin(2.0 * np.pi * freq * t) * amp).astype(np.int32)


EMPTY = np.empty(0, np.int32)


def cases():
    """name -> (left, right, sample_rate, bit_depth, stereo_mode)."""
    out = {}
    n = 44100 // 20
    amp = 30000
    l = sine(n, 44100, 440.0, amp)
    r = (np.sin(2 * np.pi * 443.0 * np.arange(n) / 44100) * (amp * 0.95)).astype(np.int32)
    out["sine-lr"] = (l, r, 44100, 16, 0)
    out["sine-ms"] = (l, r, 44100, 16, 1)
    out["sine-auto"] = (l, r, 44100, 16, 2)
    out["sine-mono"] = (l, EMPTY, 44100, 16, 0)
    amp24 = 0x7FFFFF // 3
    l24 = sine(2400, 48000, 440.0, amp24)
    r24 = (np.sin(2 * np.pi * 443.0 * np.arange(2400) / 48000) * (amp24 * 0.95)).astype(np.int32)
    out["sine24-auto"] = (l24, r24, 48000, 24, 2)
    out["noise"] = (lcg_noise(5000, 30000), lcg_noise(5000, 30000, 999), 44100, 16, 2)
    out["noise24"] = (lcg_noise(5000, 2**23 - 1, 7), lcg_noise(5000, 2**23 - 1, 8), 48000, 24, 2)
    out["silence"] = (np.zeros(4000, np.int32), np.zeros(4000, np.int32), 44100, 16, 2)
    sparse = np.zeros(4000, np.int32)
    sparse[::37] = 1
    sparse[::91] = -2
    out["sparse"] = (sparse, EMPTY, 44100, 16, 0)
    out["ramp"] = ((np.arange(5000) % 3000).astype(np.int32), EMPTY, 44100, 16, 0)
    out["multiblock"] = (lcg_noise(16384 + 37, 12000, 5), lcg_noise(16384 + 37, 12000, 6), 44100, 16, 2)
    base = sine(16384 * 2 + 100, 44100, 220.0, 20000)
    out["correlated"] = (base, base + lcg_noise(16384 * 2 + 100, 300, 77), 44100, 16, 2)
    ident = sine(3000, 96000, 1000.0, amp24)
    out["identical-ch"] = (ident, ident.copy(), 96000, 24, 2)
    out["silent-right"] = (sine(3000, 192000, 900.0, 20000), np.zeros(3000, np.int32), 192000, 24, 2)
    anti = sine(3000, 44100, 500.0, 15000)
    out["anticorrelated"] = (anti, -anti, 44100, 16, 2)
    out["boundary"] = (
        np.array([-0x8000, 0x7FFF] * 300, np.int32),
        np.array([0x7FFF, -0x8000] * 300, np.int32),
        44100,
        16,
        2,
    )
    return out

"""Delta-bitpacked 24-bit plane uploads (device_pipeline._pack_delta24_host
/ _jitted_unpack_delta24) are transport-only: the device reconstruction
must be bit-exact for ANY 24-bit-range int32 content (modular
wrapped-delta design at the 24-bit domain modulus), and routing the
upload through them must never change frame bytes."""

import jax.numpy as jnp
import numpy as np

from lac_tpu import device_pipeline as DP
from lac_tpu.encoder import FrameEncoder

LO24, HI24 = -(1 << 23), (1 << 23) - 1


def _roundtrip(m, expect_b):
    b, ph = DP._pack_delta24_host(m)
    assert b == expect_b, (b, expect_b)
    if b is None:
        return
    K = m.shape[0]
    out = np.asarray(DP._jitted_unpack_delta24(b, K, K)(jnp.asarray(ph)))
    np.testing.assert_array_equal(out, m)


def test_pack_delta24_roundtrip_exact():
    N = DP.N
    rng = np.random.RandomState(7)
    t = np.arange(N, dtype=np.float64)

    # near-silence -> 8-bit deltas
    smooth = (np.sin(2 * np.pi * 50 * t / 44100) * 800).astype(np.int32)
    _roundtrip(np.stack([smooth, -smooth]), 8)

    # quiet 24-bit content -> 12-bit deltas (delta amp ~ amp*2*pi*f/sr)
    sig12 = (np.sin(2 * np.pi * 100 * t / 44100) * 100000).astype(np.int32)
    _roundtrip(sig12[None, :], 12)

    # 16-bit-scale deltas (24-bit music commonly lands here)
    sig16 = (np.sin(2 * np.pi * 400 * t / 44100) * 450000).astype(np.int32)
    sig16 = sig16 + rng.randint(-800, 800, N).astype(np.int32)
    _roundtrip(sig16[None, :], 16)

    # loud content -> 20-bit deltas
    sig20 = (np.sin(2 * np.pi * 2000 * t / 44100) * 1800000).astype(np.int32)
    _roundtrip(sig20[None, :], 20)

    # 24-bit wraparound: alternating domain extremes have TRUE deltas of
    # 2^24-1 but WRAPPED deltas of -1/+1 — the modular cumsum + 24-bit
    # re-wrap must still land exactly
    wrap = np.where(np.arange(N) % 2 == 0, LO24, HI24).astype(np.int32)
    _roundtrip(wrap[None, :], 8)

    # full-scale 24-bit white noise -> deltas overflow 20 bits -> pack24
    noise = rng.randint(LO24, HI24 + 1, N).astype(np.int32)
    b, ph = DP._pack_delta24_host(noise[None, :])
    assert b is None and ph is None

    # partial-chunk fuse: bucket rows zero-extend to K
    b, ph = DP._pack_delta24_host(np.stack([smooth, sig16]))
    assert b == 16
    out = np.asarray(DP._jitted_unpack_delta24(b, 2, 4)(jnp.asarray(ph)))
    np.testing.assert_array_equal(out[:2], np.stack([smooth, sig16]))
    np.testing.assert_array_equal(out[2:], 0)


def test_delta24_upload_routing_never_changes_bytes(monkeypatch):
    rng = np.random.RandomState(11)
    n = 5 * DP.N + 333
    t = np.arange(n, dtype=np.float64)
    sig = np.sin(2 * np.pi * 330 * t / 44100) * 2100000
    l = np.clip(sig + rng.standard_normal(n) * 5000, LO24, HI24).astype(np.int32)
    r = np.clip(np.roll(sig, 9) * 0.75, LO24, HI24).astype(np.int32)

    monkeypatch.setenv("LAC_TPU_UPLOAD_DELTA", "0")
    off = FrameEncoder(12, 2, 96000, 24, xp=jnp).encode(l, r)
    monkeypatch.setenv("LAC_TPU_UPLOAD_DELTA", "1")
    monkeypatch.setenv("LAC_TPU_UPLOAD_PACK24", "0")  # isolate the delta route
    on = FrameEncoder(12, 2, 96000, 24, xp=jnp).encode(l, r)
    assert on == off
    # and the delta24 route actually engages for this content
    db, _ = DP._pack_delta24_host(
        np.ascontiguousarray(l[: 5 * DP.N].reshape(5, DP.N), dtype=np.int32)
    )
    assert db in (12, 16, 20)

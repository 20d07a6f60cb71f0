"""Delta-bitpacked 16-bit plane uploads (device_pipeline._pack_delta_host
/ _jitted_unpack_delta) are transport-only: the device reconstruction
must be bit-exact for ANY int16 content (modular wrapped-delta design),
and routing the upload through them must never change frame bytes."""

import jax.numpy as jnp
import numpy as np

from lac_tpu import device_pipeline as DP
from lac_tpu.encoder import FrameEncoder


def _roundtrip(m, expect_b):
    b, ph = DP._pack_delta_host(m)
    assert b == expect_b, (b, expect_b)
    if b is None:
        return
    K = m.shape[0]
    out = np.asarray(DP._jitted_unpack_delta(b, K, K)(jnp.asarray(ph)))
    np.testing.assert_array_equal(out, m)


def test_pack_delta_roundtrip_exact():
    N = DP.N
    rng = np.random.RandomState(5)

    # smooth content -> 8-bit deltas
    t = np.arange(N, dtype=np.float64)
    smooth = (np.sin(2 * np.pi * 60 * t / 44100) * 3000).astype(np.int16)
    _roundtrip(np.stack([smooth, -smooth]), 8)

    # moderate content -> 12-bit deltas
    sig12 = (np.sin(2 * np.pi * 440 * t / 44100) * 9000).astype(np.int16)
    sig12 = sig12 + rng.randint(-40, 40, N).astype(np.int16)
    _roundtrip(sig12[None, :], 12)

    # music-scale content -> 14-bit deltas (the bench-content tier)
    sig = (np.sin(2 * np.pi * 440 * t / 44100) * 26000).astype(np.int16)
    sig = sig + rng.randint(-700, 700, N).astype(np.int16)
    _roundtrip(sig[None, :], 14)

    # int16 wraparound: alternating extremes have TRUE deltas of 65535
    # but WRAPPED deltas of -1/+1 — the modular cumsum must still land
    # exactly (this is the case a naive true-delta scheme gets wrong)
    wrap = np.where(np.arange(N) % 2 == 0, -32768, 32767).astype(np.int16)
    _roundtrip(wrap[None, :], 8)

    # white noise at full scale -> deltas overflow 14 bits -> identity
    noise = rng.randint(-32768, 32768, N).astype(np.int16)
    b, ph = DP._pack_delta_host(noise[None, :])
    assert b is None and ph is None

    # partial-chunk fuse: bucket rows zero-extend to K
    b, ph = DP._pack_delta_host(np.stack([smooth, sig]))
    out = np.asarray(DP._jitted_unpack_delta(b, 2, 4)(jnp.asarray(ph)))
    np.testing.assert_array_equal(out[:2], np.stack([smooth, sig]))
    np.testing.assert_array_equal(out[2:], 0)


def test_delta_upload_routing_never_changes_bytes(monkeypatch):
    rng = np.random.RandomState(9)
    n = 9 * DP.N + 777
    t = np.arange(n, dtype=np.float64)
    sig = np.sin(2 * np.pi * 330 * t / 44100) * 21000
    l = np.clip(sig + rng.standard_normal(n) * 120, -32768, 32767).astype(np.int32)
    r = np.clip(np.roll(sig, 9) * 0.75, -32768, 32767).astype(np.int32)

    monkeypatch.setenv("LAC_TPU_UPLOAD_DELTA", "0")
    off = FrameEncoder(12, 2, 44100, 16, xp=jnp).encode(l, r)
    monkeypatch.setenv("LAC_TPU_UPLOAD_DELTA", "1")
    on = FrameEncoder(12, 2, 44100, 16, xp=jnp).encode(l, r)
    assert on == off
    # and the delta route actually engaged for this content
    db, _ = DP._pack_delta_host(
        np.ascontiguousarray(l[: 9 * DP.N].reshape(9, DP.N), dtype=np.int16)
    )
    assert db in (8, 12, 14)

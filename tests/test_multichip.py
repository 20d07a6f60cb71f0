"""Sharded plan + driver entry points on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax


needs_devices = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")


@needs_devices
def test_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out["ship"])
    assert out["ship"].shape[0] == args[0].shape[0]


@needs_devices
def test_sharded_plan_matches_single_device():
    import jax.numpy as jnp

    from lac_tpu.encoder import plan_group
    from lac_tpu.parallel import make_mesh, plan_group_sharded

    B, n = 16, 512
    rng = np.random.RandomState(3)
    pcm = rng.randint(-20000, 20000, (B, n)).astype(np.int32)
    coeffs = np.zeros((5, B, 13), np.int16)
    coeffs[:, :, 1] = 15000
    valid = np.ones((5, B), bool)

    mesh = make_mesh(jax.devices()[:8])
    sharded = plan_group_sharded(mesh, pcm, coeffs, valid, n)
    single = plan_group(pcm, coeffs, valid, n, True, True, jnp)
    np.testing.assert_array_equal(np.asarray(sharded["ship"]), np.asarray(single["ship"]))
    np.testing.assert_array_equal(np.asarray(sharded["meta"]), np.asarray(single["meta"]))


@needs_devices
def test_frame_encoder_mesh_is_product_path():
    """FrameEncoder with a mesh shards the full-block plan batches over
    8 devices and must produce byte-identical frames (single + batch)."""
    import jax.numpy as jnp

    from lac_tpu.batch import encode_batch
    from lac_tpu.encoder import FrameEncoder
    from lac_tpu.parallel import make_mesh

    rng = np.random.RandomState(21)
    n = 16384 * 12 + 5000  # 12 full blocks + tail
    t = np.arange(n, dtype=np.float64)
    sig = np.sin(2 * np.pi * 440 * t / 44100) * 18000 + rng.standard_normal(n) * 400
    l = np.clip(sig, -32768, 32767).astype(np.int32)
    r = np.clip(np.roll(sig, 9) * 0.8, -32768, 32767).astype(np.int32)

    mesh = make_mesh(jax.devices()[:8])
    sharded = FrameEncoder(12, 2, 44100, 16, xp=jnp, mesh=mesh).encode(l, r)
    single = FrameEncoder(12, 2, 44100, 16, xp=jnp).encode(l, r)
    assert sharded == single

    files = [(l[: 16384 * 9], r[: 16384 * 9]), (l[5:], r[5:]), (l, np.empty(0, np.int32))]
    batch_sharded = encode_batch(files, 44100, 16, xp=jnp, mesh=mesh)
    batch_single = encode_batch(files, 44100, 16, xp=jnp)
    assert batch_sharded == batch_single


def test_thread_count_invariance():
    """Worker caps must not change any byte (decode + emit pools)."""
    from lac_tpu.decoder import FrameDecoder
    from lac_tpu.encoder import FrameEncoder

    from .signals import lcg_noise

    l = lcg_noise(40000, 20000, 1)
    r = lcg_noise(40000, 20000, 2)
    enc = FrameEncoder(12, 2, 44100, 16)
    enc.set_thread_count(1)
    bs1 = enc.encode(l, r)
    enc.set_thread_count(8)
    bs8 = enc.encode(l, r)
    assert bs1 == bs8
    for tc in (1, 2, 8):
        dec = FrameDecoder()
        dec.set_thread_count(tc)
        dl, dr, _ = dec.decode(bs1)
        np.testing.assert_array_equal(dl, l)
        np.testing.assert_array_equal(dr, r)


@needs_devices
def test_plane_pipeline_engages_under_mesh():
    """The sharded plane pipeline (not the legacy fallback) must serve
    meshed encodes whenever the chunk width divides over the mesh."""
    import jax.numpy as jnp

    from lac_tpu import device_pipeline as DP
    from lac_tpu.encoder import FrameEncoder
    from lac_tpu.parallel import make_mesh

    mesh = make_mesh(jax.devices()[:8])
    enc = FrameEncoder(12, 2, 44100, 16, xp=jnp, mesh=mesh)
    assert DP.chunk_width(100) % 8 == 0
    assert DP.applicable(enc, 100)
    # odd mesh sizes that do not divide the chunk width fall back
    mesh3 = make_mesh(jax.devices()[:3])
    enc3 = FrameEncoder(12, 2, 44100, 16, xp=jnp, mesh=mesh3)
    assert not DP.applicable(enc3, 100)


@needs_devices
def test_default_mesh_gate(monkeypatch):
    """The product default is mesh-on for >1 device; LAC_TPU_MESH=0 is
    the off switch and =1 (the historical opt-in) behaves like unset."""
    from lac_tpu.parallel import mesh as M

    monkeypatch.delenv("LAC_TPU_MESH", raising=False)
    assert M.default_mesh() is not None
    monkeypatch.setenv("LAC_TPU_MESH", "0")
    assert M.default_mesh() is None
    monkeypatch.setenv("LAC_TPU_MESH", "1")
    assert M.default_mesh() is not None


@needs_devices
def test_encode_pooled_shards_over_mesh():
    """Pooled waves with meshed encoders shard (PlanePipeline.mesh set)
    and stay byte-identical to per-item single-device encodes."""
    import jax.numpy as jnp

    from lac_tpu import device_pipeline as DP
    from lac_tpu.encoder import FrameEncoder
    from lac_tpu.parallel import make_mesh
    from lac_tpu.pool import encode_pooled

    rng = np.random.RandomState(5)
    items = []
    for i in range(3):
        n = 16384 * (8 + i) + 321 * i
        t = np.arange(n, dtype=np.float64)
        sig = np.sin(2 * np.pi * (320 + 30 * i) * t / 44100) * 15000
        l = np.clip(sig + rng.standard_normal(n) * 350, -32768, 32767).astype(np.int32)
        r = np.clip(np.roll(sig, 7) * 0.8, -32768, 32767).astype(np.int32)
        items.append((l, r))

    mesh = make_mesh(jax.devices()[:8])
    seen = []
    orig_init = DP.PlanePipeline.__init__

    def spy(self, *a, **kw):
        orig_init(self, *a, **kw)
        seen.append(self.mesh)

    DP.PlanePipeline.__init__ = spy
    try:
        pooled = encode_pooled(items, 44100, 16, stereo_mode=2, xp=jnp, mesh=mesh)
    finally:
        DP.PlanePipeline.__init__ = orig_init
    assert seen and all(m is mesh for m in seen), "wave did not shard over the mesh"
    for i, ((l, r), got) in enumerate(zip(items, pooled)):
        assert got == FrameEncoder(12, 2, 44100, 16, xp=jnp).encode(l, r), f"item {i}"


@needs_devices
def test_cli_default_meshes(tmp_path, monkeypatch):
    """One-shot CLI encodes shard over the default mesh with identical
    bytes to LAC_TPU_MESH=0 (the sharding-off escape hatch)."""
    from lac_tpu import cli
    from lac_tpu.io.wav import write_wav

    rng = np.random.RandomState(11)
    n = 16384 * 9 + 123
    t = np.arange(n, dtype=np.float64)
    sig = np.sin(2 * np.pi * 500 * t / 44100) * 12000
    l = np.clip(sig + rng.standard_normal(n) * 300, -32768, 32767).astype(np.int32)
    r = np.clip(np.roll(sig, 13) * 0.7, -32768, 32767).astype(np.int32)
    wav = tmp_path / "m.wav"
    write_wav(str(wav), l, r, 2, 44100, 16)

    from lac_tpu.encoder import FrameEncoder

    meshes = []
    orig = FrameEncoder.set_mesh

    def spy(self, mesh):
        meshes.append(mesh)
        orig(self, mesh)

    monkeypatch.setattr(FrameEncoder, "set_mesh", spy)
    monkeypatch.setenv("LAC_TPU_BACKEND", "jax")  # CPU-JAX defaults to numpy
    monkeypatch.delenv("LAC_TPU_MESH", raising=False)
    assert cli.main(["encode", str(wav), str(tmp_path / "on.lac")]) == 0
    assert meshes and meshes[-1] is not None, "CLI default did not mesh"
    monkeypatch.setenv("LAC_TPU_MESH", "0")
    assert cli.main(["encode", str(wav), str(tmp_path / "off.lac")]) == 0
    assert (tmp_path / "on.lac").read_bytes() == (tmp_path / "off.lac").read_bytes()

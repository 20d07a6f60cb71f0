"""LPC residual-overflow fallback ladder (reference lpc.cpp:188-229).

Out-of-domain int32 inputs (beyond the CLI's validated 16/24-bit PCM
range) can make the open-loop LPC residual leave int32; the reference
walks the order ladder {start, 12, 10, 8, 6, 4, 0} and drops the
candidate at 0 (block/encoder.cpp:395-403). These tests drive the
*reference* ``Block::Encoder`` directly through a shim built against
``.refbuild/liblac.a`` (the CLI would reject such samples) and assert
our encoder's block payloads are byte-identical.
"""

import pathlib
import subprocess

import numpy as np
import pytest

from lac_tpu.encoder import ChannelBlockEncoder
from lac_tpu.ops import predictors

ROOT = pathlib.Path(__file__).resolve().parent.parent
SHIM = ROOT / ".refbuild" / "block_shim"
LIB = ROOT / ".refbuild" / "liblac.a"
SRC = pathlib.Path(__file__).resolve().parent / "block_shim.cpp"


@pytest.fixture(scope="module")
def shim():
    if not SHIM.exists():
        if not LIB.exists():
            pytest.skip("reference liblac.a not built (.refbuild)")
        r = subprocess.run(
            ["g++", "-std=c++20", "-O2", "-I/root/reference/src",
             "-o", str(SHIM), str(SRC), str(LIB)],
            capture_output=True,
        )
        if r.returncode != 0:
            pytest.skip(f"block_shim build failed: {r.stderr.decode()[:200]}")
    return str(SHIM)


def ref_encode(shim, pcm, zero_run=True, partitioning=True):
    return subprocess.run(
        [shim, "encode", "1" if zero_run else "0", "1" if partitioning else "0"],
        input=np.ascontiguousarray(pcm, np.int32).tobytes(),
        capture_output=True, check=True,
    ).stdout


def _glitched_sine(seed, n=2048):
    """Big predictable sine with one full-scale glitch: overflows the
    open-loop residual at high orders on many seeds."""
    rng = np.random.RandomState(seed)
    t = np.arange(n)
    f = rng.uniform(0.002, 0.3)
    x = np.sin(2 * np.pi * f * t + rng.uniform(0, 6)) * rng.uniform(1.5e9, 2.1e9)
    x += rng.standard_normal(n) * rng.uniform(1e3, 1e6)
    pcm = np.clip(x, -2**31, 2**31 - 1).astype(np.int64).astype(np.int32)
    j = rng.randint(100, n - 20)
    pcm[j] = np.int32(rng.choice([-2**31, 2**31 - 1]))
    return pcm


def test_full_overflow_drops_lpc_candidate(shim):
    """Every ladder order overflows -> LPC candidates dropped, fixed wins."""
    a = 1_600_000_000
    pcm = np.full(2048, a, np.int32)
    pcm[1::2] = a - 1000
    pcm[-7:] = -a
    ref = ref_encode(shim, pcm)
    ours = ChannelBlockEncoder().encode_group(pcm[None, :])[0]
    assert ours == ref


def test_intermediate_ladder_orders_byte_identical(shim):
    """Seeds where the ladder lands at an order below the analysis order
    (several with the fallback-order LPC candidate *winning*, so the
    truncated-coefficient emission path is exercised end to end)."""
    enc = ChannelBlockEncoder()
    exercised = 0
    for seed in (10, 17, 27, 36, 133, 141):
        pcm = _glitched_sine(seed)
        coeffs, used, lvalid, mvo = enc._lpc_analysis(pcm[None, :], len(pcm))
        for li, cand in enumerate((4, 6, 8, 10, 12)):
            if lvalid[li, 0]:
                o = predictors.lpc_ladder_order(pcm, coeffs[li, 0], used[li, 0], cand)
                if o != used[li, 0]:
                    exercised += 1
        ref = ref_encode(shim, pcm)
        ours = enc.encode_group(pcm[None, :])[0]
        assert ours == ref, f"seed {seed}"
    assert exercised > 0, "corpus regressed: no lane walked the ladder"


def test_mixed_group_splices_ladder_lanes(shim):
    """A batch mixing in-range and overflowing lanes must splice the
    host-replanned payloads back in order."""
    rng = np.random.RandomState(3)
    normal = rng.randint(-20000, 20000, (3, 2048)).astype(np.int32)
    over = _glitched_sine(27)
    group = np.stack([normal[0], over, normal[1], normal[2]])
    enc = ChannelBlockEncoder()
    payloads = enc.encode_group(group)
    for row in range(4):
        assert payloads[row] == ref_encode(shim, group[row]), f"row {row}"


def test_out_of_domain_jax_group_matches_numpy(shim):
    """A jax-backend group whose values exceed the 24-bit MXU-autocorr
    domain must route through the exact int64 lag path (nlimbs=0,
    encoder._GroupJob.dispatch_autocorr) and stay byte-identical."""
    import jax.numpy as jnp

    rng = np.random.RandomState(99)
    x = rng.standard_normal(16384)
    for _ in range(3):
        x = 0.7 * x + 0.3 * np.concatenate([[0.0], x[:-1]])
    pcm = np.clip(x * 1.9e9, -2**31, 2**31 - 1).astype(np.int64).astype(np.int32)
    ours = ChannelBlockEncoder(xp=jnp).encode_group(pcm[None, :])[0]
    assert ours == ChannelBlockEncoder().encode_group(pcm[None, :])[0]
    assert ours == ref_encode(shim, pcm)


def test_random_out_of_domain_differential(shim):
    enc = ChannelBlockEncoder()
    for seed in range(24):
        rng = np.random.RandomState(1000 + seed)
        x = rng.standard_normal(1024)
        for _ in range(rng.randint(0, 4)):
            x = 0.7 * x + 0.3 * np.concatenate([[0.0], x[:-1]])
        amp = rng.choice([1.2e9, 1.6e9, 2.0e9, 2.14e9])
        pcm = np.clip(x * amp, -2**31, 2**31 - 1).astype(np.int64).astype(np.int32)
        gl = rng.random(1024) < 0.02
        pcm[gl] = rng.randint(-2**31, 2**31 - 1, gl.sum())
        assert enc.encode_group(pcm[None, :])[0] == ref_encode(shim, pcm), f"seed {seed}"

"""Pallas k-cost kernel parity (interpreter mode on CPU)."""

import numpy as np
import pytest

from lac_tpu.ops import pallas_kernels as pk

pytestmark = pytest.mark.skipif(not pk.pallas_available(), reason="pallas unavailable")


def test_k_cost_sums_matches_reference_math():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, n = pk._CHUNK_ROWS, 1024
    rng = np.random.RandomState(7)
    u = rng.randint(0, 2**32, (rows, n), dtype=np.uint64).astype(np.uint32)

    call = pl.pallas_call(
        pk._kernel,
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=True,
    )
    got = np.asarray(call(jax.lax.bitcast_convert_type(jnp.asarray(u), "int32")))
    got = got[:, :17].astype(np.int64) % (1 << 32)

    hi = (u >> 16).astype(np.uint64)
    lo = (u & 0xFFFF).astype(np.uint64)
    want = np.stack([hi.sum(-1)] + [(lo >> k).sum(-1) for k in range(16)], axis=-1)
    np.testing.assert_array_equal(got, want.astype(np.int64))


def test_k_cost_sums_gridded_matches_reference_math():
    """Production layout: 1-D grid over row tiles, int32 index-map
    constants (the x64 legalization fix in pallas_kernels._build)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, n = 4 * pk._CHUNK_ROWS, 512
    rng = np.random.RandomState(11)
    u = rng.randint(0, 2**32, (rows, n), dtype=np.uint64).astype(np.uint32)

    call = pl.pallas_call(
        pk._kernel,
        grid=(rows // pk._CHUNK_ROWS,),
        in_specs=[pl.BlockSpec((pk._CHUNK_ROWS, n), lambda i: (i, jnp.int32(0)), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((pk._CHUNK_ROWS, 128), lambda i: (i, jnp.int32(0)), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.int32),
        interpret=True,
    )
    got = np.asarray(call(jax.lax.bitcast_convert_type(jnp.asarray(u), "int32")))
    got = got[:, :17].astype(np.int64) % (1 << 32)

    hi = (u >> 16).astype(np.uint64)
    lo = (u & 0xFFFF).astype(np.uint64)
    want = np.stack([hi.sum(-1)] + [(lo >> k).sum(-1) for k in range(16)], axis=-1)
    np.testing.assert_array_equal(got, want.astype(np.int64))


def test_split_cumsums_kernel_matches_numpy():
    """Interpret-mode check of the production scan layout: hi/lo split
    + carry across column tiles."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, n = 2 * pk._SCAN_TR, 3 * pk._SCAN_TC
    rng = np.random.RandomState(5)
    u = rng.randint(0, 2**32, (rows, n), dtype=np.uint64).astype(np.uint32)

    call = pl.pallas_call(
        pk._split_cumsum_kernel,
        grid=(rows // pk._SCAN_TR, n // pk._SCAN_TC),
        in_specs=[pl.BlockSpec((pk._SCAN_TR, pk._SCAN_TC), lambda i, j: (i, j), memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((pk._SCAN_TR, pk._SCAN_TC), lambda i, j: (i, j), memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((rows, n), jnp.int32)] * 2,
        scratch_shapes=[pltpu.VMEM((pk._SCAN_TR, 1), jnp.int32)] * 2,
        interpret=True,
    )
    hi, lo = call(jax.lax.bitcast_convert_type(jnp.asarray(u), "int32"))
    hi = np.asarray(hi).astype(np.uint32)
    lo = np.asarray(lo).astype(np.uint32)
    np.testing.assert_array_equal(hi, np.cumsum(u >> 16, -1, dtype=np.uint32))
    np.testing.assert_array_equal(lo, np.cumsum(u & 0xFFFF, -1, dtype=np.uint32))


def test_cumsum_kernel_matches_numpy():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, n = pk._SCAN_TR, 2 * pk._SCAN_TC
    rng = np.random.RandomState(9)
    u = rng.randint(0, 2**17, (rows, n)).astype(np.uint32)

    call = pl.pallas_call(
        pk._cumsum_kernel,
        grid=(rows // pk._SCAN_TR, n // pk._SCAN_TC),
        in_specs=[pl.BlockSpec((pk._SCAN_TR, pk._SCAN_TC), lambda i, j: (i, j), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((pk._SCAN_TR, pk._SCAN_TC), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, n), jnp.int32),
        scratch_shapes=[pltpu.VMEM((pk._SCAN_TR, 1), jnp.int32)],
        interpret=True,
    )
    out = np.asarray(call(jax.lax.bitcast_convert_type(jnp.asarray(u), "int32"))).astype(np.uint32)
    np.testing.assert_array_equal(out, np.cumsum(u, -1, dtype=np.uint32))


@pytest.mark.parametrize("which", ["pmax", "smin"])
def test_break_scan_kernels_match_numpy(which):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, n = 2 * pk._SCAN_TR, 3 * pk._SCAN_TC
    rng = np.random.RandomState(13)
    x = rng.randint(-(10**6), 10**6, (rows, n)).astype(np.int32)

    ncols = n // pk._SCAN_TC
    if which == "pmax":
        kernel, cmap = pk._prefix_max_kernel, (lambda i, j: (i, j))
        want = np.maximum.accumulate(x, axis=-1)
    else:
        kernel = pk._suffix_min_kernel
        cmap = lambda i, j: (i, jnp.int32(ncols - 1) - j)
        want = np.flip(np.minimum.accumulate(np.flip(x, -1), -1), -1)
    call = pl.pallas_call(
        kernel,
        grid=(rows // pk._SCAN_TR, ncols),
        in_specs=[pl.BlockSpec((pk._SCAN_TR, pk._SCAN_TC), cmap, memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((pk._SCAN_TR, pk._SCAN_TC), cmap, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, n), jnp.int32),
        scratch_shapes=[pltpu.VMEM((pk._SCAN_TR, 1), jnp.int32)],
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(call(jnp.asarray(x))), want)

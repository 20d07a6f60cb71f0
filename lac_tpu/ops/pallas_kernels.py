"""Pallas TPU kernels for the encoder's hottest reductions.

``k_cost_sums``: for every lane, the Rice cost stack needs
``sum(u >> k)`` for k in [0, 16] — the XLA formulation is 17 separate
shift+reduce passes over the (B, ncand, n) candidate tensor (the
biggest memory-traffic item in the planner). This kernel computes all
17 partial sums in ONE pass over the data with VMEM-resident tiles.

Environment note (axon v5e toolchain, 2026-08): *gridded* pallas_call
fails to legalize in the remote Mosaic AOT path, so the kernel is
grid-less (whole-block in VMEM) and the row dimension is driven by
``jax.lax.map`` over fixed-size chunks.

Exactness: identical integer math to the XLA path (hi/lo u16 halves;
every sum <= 2^30 fits int32 lanes — Mosaic has no unsigned
reductions); the u64 combination happens outside on tiny arrays.
"""

import functools

_CHUNK_ROWS = 64  # 64 x 16384 x 4B = 4MB in VMEM


def pallas_available() -> bool:
    try:
        from jax.experimental import pallas as pl  # noqa: F401
        from jax.experimental.pallas import tpu as pltpu  # noqa: F401
    except Exception:
        return False
    return True


def _kernel(u_ref, o_ref):
    import jax
    import jax.numpy as jnp

    u = u_ref[:]  # (CHUNK_ROWS, n) int32 (bitcast from uint32)
    hi = (u >> jnp.int32(16)) & jnp.int32(0xFFFF)
    lo = u & jnp.int32(0xFFFF)
    rows = u.shape[0]
    # place the 17 per-row sums into lane columns with iota selects
    # (concatenate/scatter do not lower for this layout)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    acc = jnp.where(
        col_ids == 0,
        jnp.sum(hi, axis=-1, dtype=jnp.int32, keepdims=True),
        jnp.zeros((rows, 128), jnp.int32),
    )
    t = lo
    for k in range(16):
        acc = jnp.where(col_ids == k + 1, jnp.sum(t, axis=-1, dtype=jnp.int32, keepdims=True), acc)
        t = t >> jnp.int32(1)
    o_ref[:] = acc


@functools.lru_cache(maxsize=32)
def _build(n):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    call = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((_CHUNK_ROWS, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    def over_rows(x_i32):  # (rows, n) with rows % CHUNK_ROWS == 0
        chunks = x_i32.reshape(-1, _CHUNK_ROWS, n)
        out = jax.lax.map(call, chunks)
        return out.reshape(-1, 128)

    return over_rows


def k_cost_sums(u32_rows):
    """(rows, n) uint32 -> (rows, 17) uint32: [sum(u>>16), sum(lo>>k) k=0..15].

    Requires supported_shape(rows, n); callers pad rows or fall back.
    """
    import jax

    rows, n = u32_rows.shape
    as_i32 = jax.lax.bitcast_convert_type(u32_rows, "int32")
    out = _build(n)(as_i32)
    return jax.lax.bitcast_convert_type(out[:, :17], "uint32")


def supported_shape(rows, n):
    return (
        rows % _CHUNK_ROWS == 0
        and n % 128 == 0
        and n >= 128
        and _CHUNK_ROWS * n * 4 <= (8 << 20)
    )

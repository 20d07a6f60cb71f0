"""Pallas TPU kernels for the encoder's hottest reductions.

``k_cost_sums``: for every lane, the Rice cost stack needs
``sum(u >> k)`` for k in [0, 16] — the XLA formulation is 17 separate
shift+reduce passes over the (B, ncand, n) candidate tensor (the
biggest memory-traffic item in the planner). This kernel computes all
17 partial sums in ONE pass over the data with VMEM-resident tiles.

Environment note (axon v5e toolchain): gridded ``pallas_call`` failed
to legalize in the remote Mosaic AOT path until 2026-08; it compiles
and verifies again on the current toolchain, so the kernel runs with a
proper 1-D grid (one 64-row VMEM tile per step).

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


@functools.lru_cache(maxsize=64)
def _build(rows, n):
    """Gridded pallas_call over (rows, n): one VMEM tile of _CHUNK_ROWS
    rows per grid step. The 2026-08 axon Mosaic toolchain legalizes
    gridded kernels again, so the former grid-less ``lax.map`` fallback
    (one pallas dispatch per 64-row chunk) is gone."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # index-map constants MUST be built as jnp.int32 inside the lambda:
    # under jax_enable_x64 a bare 0 promotes to i64 and the Mosaic
    # remote-compile path dies with "failed to legalize func.return
    # (i32, i64)" — this was the whole round-1 "gridded pallas_call is
    # broken" toolchain bug.
    return pl.pallas_call(
        _kernel,
        grid=(rows // _CHUNK_ROWS,),
        in_specs=[pl.BlockSpec((_CHUNK_ROWS, n), lambda i: (i, jnp.int32(0)), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((_CHUNK_ROWS, 128), lambda i: (i, jnp.int32(0)), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.int32),
    )


def k_cost_sums(u32_rows):
    """(rows, n) uint32 -> (rows, 17) uint32: [sum(u>>16), sum(lo>>k) k=0..15].

    Requires supported_shape(rows, n); callers pad rows or fall back.
    """
    import jax

    rows, n = u32_rows.shape
    as_i32 = jax.lax.bitcast_convert_type(u32_rows, "int32")
    out = _build(rows, n)(as_i32)
    return jax.lax.bitcast_convert_type(out[:, :17], "uint32")


def supported_shape(rows, n):
    return (
        rows % _CHUNK_ROWS == 0
        and n % 128 == 0
        and n >= 128
        and _CHUNK_ROWS * n * 4 <= (8 << 20)
    )


# ------------------------------------------------------- scan kernels
# Prefix scans along the sample axis. XLA lowers cumsum on a
# (rows, 16384) operand as a two-level scan that materializes a
# (rows, 128, 128) intermediate in HBM; these kernels keep the whole
# scan in VMEM — log-step lane rotations within 2048-wide column tiles
# and a per-row carry in scratch across tiles (measured 5.7ms vs 7.7ms
# XLA per (1408, 16384) dual cumsum, amortized). Integer math is
# identical (adds in a different association — exact), verified
# bit-equal in tests/test_pallas.py.

_SCAN_TR, _SCAN_TC = 8, 2048  # full-width rolls blow up the Mosaic compile


def _tile_cumsum(x):
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    sh = 1
    while sh < x.shape[-1]:
        y = pltpu.roll(x, jnp.int32(sh), 1)
        x = x + jnp.where(col >= sh, y, jnp.zeros_like(x))
        sh *= 2
    return x


def _split_cumsum_kernel(u_ref, hi_ref, lo_ref, chi_ref, clo_ref):
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        chi_ref[...] = jnp.zeros_like(chi_ref)
        clo_ref[...] = jnp.zeros_like(clo_ref)

    u = u_ref[:]  # int32 bitcast of uint32
    hi = _tile_cumsum((u >> jnp.int32(16)) & jnp.int32(0xFFFF))
    lo = _tile_cumsum(u & jnp.int32(0xFFFF))
    hi_ref[:] = hi + chi_ref[...]
    lo_ref[:] = lo + clo_ref[...]
    chi_ref[...] = chi_ref[...] + hi[:, -1:]
    clo_ref[...] = clo_ref[...] + lo[:, -1:]


def _cumsum_kernel(u_ref, o_ref, c_ref):
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        c_ref[...] = jnp.zeros_like(c_ref)

    c = _tile_cumsum(u_ref[:])
    o_ref[:] = c + c_ref[...]
    c_ref[...] = c_ref[...] + c[:, -1:]


def scan_shape_supported(rows, n):
    return rows % _SCAN_TR == 0 and n % _SCAN_TC == 0


@functools.lru_cache(maxsize=32)
def _build_split_cumsum(rows, n):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return pl.pallas_call(
        _split_cumsum_kernel,
        grid=(rows // _SCAN_TR, n // _SCAN_TC),
        in_specs=[pl.BlockSpec((_SCAN_TR, _SCAN_TC), lambda i, j: (i, j), memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((_SCAN_TR, _SCAN_TC), lambda i, j: (i, j), memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((rows, n), jnp.int32)] * 2,
        scratch_shapes=[pltpu.VMEM((_SCAN_TR, 1), jnp.int32)] * 2,
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary", "arbitrary")),
    )


@functools.lru_cache(maxsize=32)
def _build_cumsum(rows, n):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return pl.pallas_call(
        _cumsum_kernel,
        grid=(rows // _SCAN_TR, n // _SCAN_TC),
        in_specs=[pl.BlockSpec((_SCAN_TR, _SCAN_TC), lambda i, j: (i, j), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((_SCAN_TR, _SCAN_TC), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, n), jnp.int32),
        scratch_shapes=[pltpu.VMEM((_SCAN_TR, 1), jnp.int32)],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary", "arbitrary")),
    )


def split_cumsums_u32(u32_rows):
    """(rows, n) uint32 -> (cumsum(u >> 16), cumsum(u & 0xFFFF)), both
    uint32 — the 16-bit-split prefix sums of adapt.k_after_stateful,
    with the halving done in VMEM (no uhi/ulo HBM materialization)."""
    import jax

    rows, n = u32_rows.shape
    as_i32 = jax.lax.bitcast_convert_type(u32_rows, "int32")
    hi, lo = _build_split_cumsum(rows, n)(as_i32)
    return (jax.lax.bitcast_convert_type(hi, "uint32"),
            jax.lax.bitcast_convert_type(lo, "uint32"))


def cumsum_u32(u32_rows):
    """(rows, n) uint32 inclusive prefix sum along the last axis."""
    import jax

    rows, n = u32_rows.shape
    as_i32 = jax.lax.bitcast_convert_type(u32_rows, "int32")
    out = _build_cumsum(rows, n)(as_i32)
    return jax.lax.bitcast_convert_type(out, "uint32")


def pallas_default():
    """Pallas kernels default ON for the TPU backend, OFF elsewhere
    (no Mosaic on CPU); LAC_TPU_PALLAS=0/1 forces."""
    import os

    env = os.environ.get("LAC_TPU_PALLAS")
    if env in ("0", "1"):
        return env == "1"
    try:
        import jax

        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _tile_scan(x, op, roll_dir):
    """Log-step in-tile scan: op in {max, min-from-right} via masked
    lane rotations. roll_dir=+1 scans left->right, -1 right->left."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    width = x.shape[-1]
    sh = 1
    while sh < width:
        # rotation is modular: a leftward shift by sh is a rotation by
        # width - sh (negative rotate amounts SIGABRT the Mosaic
        # compiler on this toolchain)
        amount = sh if roll_dir > 0 else width - sh
        y = pltpu.roll(x, jnp.int32(amount), 1)
        valid = (col >= sh) if roll_dir > 0 else (col < width - sh)
        x = jnp.where(valid, op(x, y), x)
        sh *= 2
    return x


def _prefix_max_kernel(x_ref, o_ref, c_ref):
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        c_ref[...] = jnp.full_like(c_ref, jnp.iinfo(jnp.int32).min)

    s = _tile_scan(x_ref[:], jnp.maximum, 1)
    o_ref[:] = jnp.maximum(s, c_ref[...])
    c_ref[...] = jnp.maximum(c_ref[...], s[:, -1:])


def _suffix_min_kernel(x_ref, o_ref, c_ref):
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        c_ref[...] = jnp.full_like(c_ref, jnp.iinfo(jnp.int32).max)

    s = _tile_scan(x_ref[:], jnp.minimum, -1)
    o_ref[:] = jnp.minimum(s, c_ref[...])
    c_ref[...] = jnp.minimum(c_ref[...], s[:, :1])


@functools.lru_cache(maxsize=32)
def _build_scan(rows, n, which):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ncols = n // _SCAN_TC
    if which == "pmax":
        kernel, cmap = _prefix_max_kernel, (lambda i, j: (i, j))
    else:  # suffix min walks the column tiles right-to-left
        kernel, cmap = _suffix_min_kernel, (lambda i, j: (i, jnp.int32(ncols - 1) - j))
    return pl.pallas_call(
        kernel,
        grid=(rows // _SCAN_TR, ncols),
        in_specs=[pl.BlockSpec((_SCAN_TR, _SCAN_TC), cmap, memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((_SCAN_TR, _SCAN_TC), cmap, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, n), jnp.int32),
        scratch_shapes=[pltpu.VMEM((_SCAN_TR, 1), jnp.int32)],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary", "arbitrary")),
    )


def prefix_max_i32(x_rows):
    """(rows, n) int32 running maximum along the last axis."""
    rows, n = x_rows.shape
    return _build_scan(rows, n, "pmax")(x_rows)


def suffix_min_i32(x_rows):
    """(rows, n) int32 running minimum from the right."""
    rows, n = x_rows.shape
    return _build_scan(rows, n, "smin")(x_rows)

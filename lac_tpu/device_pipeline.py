"""Device-resident plane pipeline for full-size blocks.

The legacy group path (encoder._GroupJob) builds per-lane host arrays
(M/S transform, stacking, padding) and uploads the *chosen* channel
lanes — on long files the host-side data movement and the duplicate
M/S upload dominate the single host core. This pipeline instead keeps
whole channel *planes* resident on device:

1. upload L and R once per chunk of K full blocks (int16 for 16-bit
   content — half the tunnel bytes; zero host copies for int32),
2. derive M/S, the per-block stereo proxy decision
   (lac/encoder.cpp:126-197), probe slices, and autocorrelation lags for
   every plane in one fused jit ("analyze"),
3. gather the chosen per-block channel rows on device and feed them
   straight into the persistently-cached ``plan_group`` executable —
   only lags, flags, and plan metadata ever cross the tunnel,
4. replay the plan natively on host (lac_emit_blocks).

Uncertain blocks (probe-resolved in the reference,
lac/encoder.cpp:332-372) stay in-pipeline: their 3x256-sample probe
lanes for both variants are planned on device from static plane slices,
and both full variants are planned speculatively; the probe byte totals
pick the winner, exactly like the legacy path.

Chunks flow through a 3-stage software pipeline (analyze / plan /
emit) with a sliding window, so uploads pace steadily, device compute
stays ~2 chunks ahead, and the serial host emit overlaps device work.
"""

import functools
import os

import numpy as np

from .format import constants as C
from .ops import lpc
from .ops.stereo import estimate_stereo_mode
from .utils import debug as _dbg

N = C.MAX_BLOCK_SIZE
PROBE = C.STEREO_PROBE_SIZE
PROBE_POS = (0, (N - PROBE) // 2, N - PROBE)  # lac/encoder.cpp:336-343
# chunk width: fixed shapes for every analyze/plan executable (shape
# diversity = minutes of extra compiles). The TPU production widths form
# a three-step ladder — 64 for short files (a single chunk has NO
# pipeline overlap, so splitting a sub-128-block file into 64-wide
# chunks overlaps chunk 1's upload/analyze/plan with chunk 0's plan and
# host emit: 30 s corpus measured 219-226 ms best at K=64 vs 253-259 ms
# at K=128 in two interleaved A/B sessions, byte-identical), 128 in the
# middle, 256 once a file has at least 256 full blocks (fewer tunnel
# round trips; 25M frames measured 4.8-5.6M fps at K=128 vs 5.7-7.2M at
# K=256; K=512 showed no further gain). The CPU test suite pins a small
# width via LAC_TPU_CHUNK_BLOCKS (tests/conftest.py) because a
# (128, 16384) planner compile takes tens of minutes on one CPU core.
CHUNK_BLOCKS = int(os.environ.get("LAC_TPU_CHUNK_BLOCKS", "0"))  # 0 = ladder
CHUNK_LADDER = (64, 128, 256)
MIN_FULL_BLOCKS = 8

# process warmth: loading the cached device executables costs many
# seconds per process (compiles are persistently cached, loads are not).
# The first device encode pays it; FrameEncoder routes short inputs in a
# still-cold process to the native host planner instead (one-shot CLI).
_PROC_WARM = False


def mark_warm():
    global _PROC_WARM
    _PROC_WARM = True


def process_warm():
    return _PROC_WARM


def chunk_width(nfull):
    if CHUNK_BLOCKS:
        return CHUNK_BLOCKS
    k = CHUNK_LADDER[0]
    for cand in CHUNK_LADDER[1:]:
        if nfull >= cand:
            k = cand
    return k


def plan_batches(total, K):
    """Batch widths for ``total`` full-block plan lanes at chunk width
    ``K``: prefer one doubled dispatch over two K-wide ones when the
    doubled executable is already a ladder shape (measured on the v5e:
    the (256, 16384) plan runs ~71 ms warm vs ~47 ms for (128, 16384),
    so one 256 beats two 128s by ~23 ms). Yields (lo, nsub, bp)."""
    lo = 0
    while lo < total:
        rem = total - lo
        bp = K
        if rem > K and 2 * K in CHUNK_LADDER:
            bp = 2 * K
        yield lo, min(rem, bp), bp
        lo += bp


def applicable(frame_enc, nfull):
    from .ops._backend import is_jax
    from .runtime.native import native_available

    if not (is_jax(frame_enc.xp) and native_available() and nfull >= MIN_FULL_BLOCKS):
        return False
    mesh = getattr(frame_enc, "mesh", None)
    if mesh is None:
        return True
    # sharded plane pipeline: the chunk's block axis splits evenly over
    # the mesh (128/256 cover every power-of-two mesh; odd meshes and
    # mesh-like stand-ins fall back to the sharded legacy group path)
    try:
        nd = int(np.prod(list(mesh.shape.values())))
    except Exception:
        return False
    return chunk_width(nfull) % nd == 0


@functools.lru_cache(maxsize=16)
def _jitted_analyze(K, kind, in_dtype, mesh=None):
    """Fused per-chunk analyze. With a mesh, the SAME per-block body runs
    under shard_map over the block axis — every output keeps a
    shard-major layout (shard s owns blocks [s*K/nd, (s+1)*K/nd)), so
    downstream lane indexing goes through :func:`_row_of` and the plan
    consumes the sharded ``planes`` array with zero resharding."""
    import jax
    import jax.numpy as jnp

    Kl = K if mesh is None else K // int(np.prod(list(mesh.shape.values())))
    mask_np = np.ones((Kl, N), bool)
    # exact MXU autocorrelation: the plane domain is static per upload
    # dtype (16-bit content: |side| <= 65535 -> 4 limbs; 24-bit content:
    # |side| <= 2^24 - 2 -> 5 limbs), so the 5-bit-limb Gram path is
    # bit-exact (ops/lpc.py autocorrelation_limbs)
    nlimb = 4 if in_dtype == "int16" else 5

    def analyze(lmat, rmat):
        l32 = lmat.astype(jnp.int32)
        out = {}
        if kind == "mono":
            planes = l32[None]
        else:
            r32 = rmat.astype(jnp.int32)
            if kind == "lr":
                planes = jnp.stack([l32, r32])
            else:
                m32 = ((l32.astype(jnp.int64) + r32.astype(jnp.int64)) >> jnp.int64(1)).astype(jnp.int32)
                s32 = (l32.astype(jnp.int64) - r32.astype(jnp.int64)).astype(jnp.int32)
                if kind == "ms":
                    planes = jnp.stack([m32, s32])
                else:  # auto: per-block proxy decision + probe lanes
                    planes = jnp.stack([l32, r32, m32, s32])
                    cm, un = estimate_stereo_mode(l32, r32, mask_np, xp=jnp)
                    out["cm"], out["un"] = cm, un
                    probes = jnp.stack(
                        [planes[:, :, p : p + PROBE] for p in PROBE_POS], axis=2
                    )  # (4, K, 3, PROBE)
                    out["probes"] = probes.reshape(-1, PROBE)
                    out["plags"] = lpc.autocorrelation_limbs(out["probes"], 12, nlimb, xp=jnp)
        P = planes.shape[0]
        out["planes"] = planes.reshape(P * Kl, N)
        out["lags"] = lpc.autocorrelation_limbs(out["planes"], 12, nlimb, xp=jnp)
        if mesh is None:
            # single-device path: the outputs dispatch_plan BLOCKS on
            # (cm/un/lags) ride one packed i64 buffer -> one D2H fetch.
            # The dev tunnel moves these small fetches at only a few
            # MB/s with ~10 ms latency each, so both fetch count AND
            # fetched bytes matter. plags (12K x 13 i64, 75% of the
            # bytes) stays a separate buffer: its async copy starts at
            # analyze time and is only ever awaited inside the probe
            # path, overlapped with the full-lane plan dispatch.
            parts = []
            if kind == "auto":
                parts += [out.pop("cm").astype(jnp.int64),
                          out.pop("un").astype(jnp.int64)]
            parts.append(out.pop("lags").reshape(-1))
            out["hostbuf"] = jnp.concatenate(parts)
        return out

    if mesh is None:
        return jax.jit(analyze)

    from jax.sharding import PartitionSpec as SP

    from .parallel.mesh import BLOCK_AXIS, shard_map

    out_specs = {"planes": SP(BLOCK_AXIS), "lags": SP(BLOCK_AXIS)}
    if kind == "auto":
        out_specs.update(
            cm=SP(BLOCK_AXIS), un=SP(BLOCK_AXIS),
            probes=SP(BLOCK_AXIS), plags=SP(BLOCK_AXIS),
        )
    fn = shard_map(
        analyze, mesh=mesh,
        in_specs=(SP(BLOCK_AXIS, None), SP(BLOCK_AXIS, None)),
        out_specs=out_specs, check_vma=False,
    )
    return jax.jit(fn)


@functools.lru_cache(maxsize=8)
def _jitted_gather(n):
    import jax

    return jax.jit(lambda flat, rows: flat[rows])


def _bucket_step(K):
    """Upload-bucket row granularity for chunk width ``K`` (shared by
    the pipeline and serve.warm_process so warmed pad shapes always
    match the shapes a real partial chunk will use).

    div=8 measured best-case-neutral vs 4 (249.9 vs 251.1 ms on the
    live corpus A/B): the tunnel's latency floor dominates once the
    padded bytes are gone, so keep the coarser grid (fewer pad
    executables to compile/load per process)."""
    try:
        div = int(os.environ.get("LAC_TPU_UPLOAD_BUCKET_DIV", "4"))
    except ValueError:
        div = 4
    return max(1, K // max(1, div))


def _upload_bucket(kc, K, mesh):
    """Rows actually uploaded for a partial chunk of ``kc`` real blocks:
    the next step on a K/4 ladder (4 fixed shapes per K keep executable
    diversity bounded; the K/4 step caps padded upload waste at ~33%
    instead of the up-to-16x a host pad to K ships). Meshes keep the
    full-K host pad — row counts must stay divisible over the shards —
    and LAC_TPU_UPLOAD_BUCKETS=0 restores the old behavior."""
    if mesh is not None or os.environ.get("LAC_TPU_UPLOAD_BUCKETS", "1") == "0":
        return K
    step = _bucket_step(K)
    return min(K, -(-kc // step) * step)


def _pack24_enabled(dtype_str, mesh):
    """24-bit planes ship as three u8 byte-planes (-25% on the
    bottleneck host->device link; 16-bit planes are already minimal
    int16). Mesh path keeps whole int32 rows (shard layouts).

    Default is backend-aware: on accelerators the link is the pipeline
    bottleneck and fewer bytes win; on CPU-JAX there is no transfer, so
    the host pack + device unpack is pure overhead (measured 5x slower
    at small scale). LAC_TPU_UPLOAD_PACK24=1/0 forces either way."""
    if dtype_str != "int32" or mesh is not None:
        return False
    forced = os.environ.get("LAC_TPU_UPLOAD_PACK24")
    if forced is not None:
        return forced != "0"
    try:
        import jax

        return jax.default_backend() != "cpu"
    except Exception:  # pragma: no cover - no jax backend at all
        return False


def _delta_enabled(dtype_str, mesh):
    """16-bit planes can usually ship as delta-bitpacked bytes: audio
    deltas are small, so wrapped int16 first differences packed to 8 or
    12 bits cut the bottleneck host->device link traffic 25-50%. The
    device inverts exactly (sign-extend, int32 cumsum, wrap to int16 —
    modular arithmetic makes wrapped deltas lossless for ANY int16
    content). Transport-only: bytes on the wire never change.

    Default mirrors pack24: accelerator backends only (on CPU-JAX there
    is no transfer to save). LAC_TPU_UPLOAD_DELTA=1/0 forces."""
    if dtype_str != "int16" or mesh is not None:
        return False
    forced = os.environ.get("LAC_TPU_UPLOAD_DELTA")
    if forced is not None:
        return forced != "0"
    try:
        import jax

        return jax.default_backend() != "cpu"
    except Exception:  # pragma: no cover - no jax backend at all
        return False


def _pack_delta_host(m):
    """int16 (rows, N) -> (b, packed uint8 (rows, 2 + N*b/8)) or
    (None, None) when the wrapped deltas need more than 14 bits.

    Row layout: 2 bytes x0 (LE, the absolute first sample — it needs 16
    bits and would otherwise force the field width), then N b-bit
    two's-complement fields of the WRAPPED int16 delta stream (field 0
    is always 0). Field bytes are written straight into the output
    through strided views — one pass, no assemble-then-copy (this host
    copies at ~200 MB/s, so a second body pass is real money)."""
    rows, n = m.shape
    d = np.empty_like(m)
    np.subtract(m[:, 1:], m[:, :-1], out=d[:, 1:])  # int16 wraparound
    d[:, 0] = 0
    lo, hi = int(d.min()), int(d.max())
    if -128 <= lo and hi < 128:
        b = 8
    elif -2048 <= lo and hi < 2048:
        b = 12
    elif -8192 <= lo and hi < 8192:
        b = 14  # music-scale deltas land here (bench content: +-4.4k/6.4k)
    else:
        return None, None
    out = np.empty((rows, 2 + n * b // 8), np.uint8)
    u0 = m[:, 0].astype(np.uint16)
    out[:, 0] = u0 & np.uint16(0xFF)
    out[:, 1] = u0 >> np.uint16(8)
    u = d.view(np.uint16)
    strided = np.lib.stride_tricks.as_strided
    if b == 8:
        out[:, 2:] = u  # uint16 -> uint8 assignment keeps the low byte
    elif b == 12:
        v0 = u[:, 0::2] & np.uint16(0xFFF)
        v1 = u[:, 1::2] & np.uint16(0xFFF)
        t = strided(out[:, 2:], shape=(rows, n // 2, 3),
                    strides=(out.strides[0], 3, 1))
        t[..., 0] = v0 & np.uint16(0xFF)
        t[..., 1] = (v0 >> np.uint16(8)) | ((v1 & np.uint16(0xF)) << np.uint16(4))
        t[..., 2] = v1 >> np.uint16(4)
    else:  # b == 14
        q = (u & np.uint16(0x3FFF)).reshape(rows, n // 4, 4)
        v0, v1, v2, v3 = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
        t = strided(out[:, 2:], shape=(rows, n // 4, 7),
                    strides=(out.strides[0], 7, 1))
        t[..., 0] = v0 & np.uint16(0xFF)
        t[..., 1] = (v0 >> np.uint16(8)) | ((v1 & np.uint16(0x3)) << np.uint16(6))
        t[..., 2] = (v1 >> np.uint16(2)) & np.uint16(0xFF)
        t[..., 3] = (v1 >> np.uint16(10)) | ((v2 & np.uint16(0xF)) << np.uint16(4))
        t[..., 4] = (v2 >> np.uint16(4)) & np.uint16(0xFF)
        t[..., 5] = (v2 >> np.uint16(12)) | ((v3 & np.uint16(0x3F)) << np.uint16(2))
        t[..., 6] = v3 >> np.uint16(6)
    return b, out


@functools.lru_cache(maxsize=64)
def _jitted_unpack_delta(b, bucket, K):
    """(bucket, 2 + N*b/8) uint8 delta rows -> zero-extended (K, N)
    int16 planes: the exact device inverse of ``_pack_delta_host``
    fused with the partial-chunk row pad. Modular reconstruction:
    int32 cumsum of sign-extended fields, + x0, wrap to int16."""
    import jax
    import jax.numpy as jnp

    from . import configure_jax

    configure_jax()

    def unpack(p):
        x0 = p[:, 0].astype(jnp.int32) | (p[:, 1].astype(jnp.int32) << jnp.int32(8))
        x0 = (x0 ^ jnp.int32(0x8000)) - jnp.int32(0x8000)
        body = p[:, 2:]
        if b == 8:
            d = body.astype(jnp.int32)
            d = (d ^ jnp.int32(0x80)) - jnp.int32(0x80)
        elif b == 12:
            t = body.reshape(bucket, N // 2, 3).astype(jnp.int32)
            v0 = t[..., 0] | ((t[..., 1] & jnp.int32(0xF)) << jnp.int32(8))
            v1 = (t[..., 1] >> jnp.int32(4)) | (t[..., 2] << jnp.int32(4))
            d = jnp.stack([v0, v1], axis=-1).reshape(bucket, N)
            d = (d ^ jnp.int32(0x800)) - jnp.int32(0x800)
        else:  # b == 14
            t = body.reshape(bucket, N // 4, 7).astype(jnp.int32)
            v0 = t[..., 0] | ((t[..., 1] & jnp.int32(0x3F)) << jnp.int32(8))
            v1 = ((t[..., 1] >> jnp.int32(6)) | (t[..., 2] << jnp.int32(2))
                  | ((t[..., 3] & jnp.int32(0xF)) << jnp.int32(10)))
            v2 = ((t[..., 3] >> jnp.int32(4)) | (t[..., 4] << jnp.int32(4))
                  | ((t[..., 5] & jnp.int32(0x3)) << jnp.int32(12)))
            v3 = (t[..., 5] >> jnp.int32(2)) | (t[..., 6] << jnp.int32(6))
            d = jnp.stack([v0, v1, v2, v3], axis=-1).reshape(bucket, N)
            d = (d ^ jnp.int32(0x2000)) - jnp.int32(0x2000)
        vals = jnp.cumsum(d, axis=1) + x0[:, None]
        vals = (vals << jnp.int32(16)) >> jnp.int32(16)  # int16 wrap
        out = vals.astype(jnp.int16)
        if bucket < K:
            out = jnp.concatenate([out, jnp.zeros((K - bucket, N), jnp.int16)], axis=0)
        return out

    return jax.jit(unpack)


def _delta24_enabled(dtype_str, mesh):
    """24-bit (int32) planes get the same delta-bitpack treatment as
    16-bit ones: wrapped 24-bit first differences packed to 8/12/16/20
    bit fields beat the 3-byte/sample pack24 byte-planes by 17-67% on
    the bottleneck link whenever the content's deltas fit. Same
    precondition as pack24 (values fit signed 24 bits — enforced at the
    encode boundary for every backend); same gating knob."""
    if dtype_str != "int32" or mesh is not None:
        return False
    forced = os.environ.get("LAC_TPU_UPLOAD_DELTA")
    if forced is not None:
        return forced != "0"
    try:
        import jax

        return jax.default_backend() != "cpu"
    except Exception:  # pragma: no cover - no jax backend at all
        return False


def _pack_delta24_host(m):
    """int32 24-bit-range (rows, N) -> (b, packed uint8
    (rows, 3 + N*b/8)) or (None, None) when the wrapped 24-bit deltas
    need more than 20 bits (pack24 wins at 24).

    Row layout mirrors ``_pack_delta_host``: 3 bytes x0 (LE, absolute
    first sample), then N b-bit two's-complement fields of the WRAPPED
    24-bit delta stream (field 0 always 0). Wrapping at the 24-bit
    domain modulus is lossless for any in-domain content — the device
    inverse cumsums and re-wraps to 24 bits."""
    rows, n = m.shape
    d = np.empty_like(m)
    np.subtract(m[:, 1:], m[:, :-1], out=d[:, 1:])  # exact in int32
    d[:, 0] = 0
    # wrap to the 24-bit modulus (full-range jumps become small fields)
    d &= np.int32(0xFFFFFF)
    d ^= np.int32(0x800000)
    d -= np.int32(0x800000)
    lo, hi = int(d.min()), int(d.max())
    if -128 <= lo and hi < 128:
        b = 8
    elif -2048 <= lo and hi < 2048:
        b = 12
    elif -32768 <= lo and hi < 32768:
        b = 16
    elif -524288 <= lo and hi < 524288:
        b = 20
    else:
        return None, None
    out = np.empty((rows, 3 + n * b // 8), np.uint8)
    u0 = (m[:, 0] & np.int32(0xFFFFFF)).astype(np.uint32)
    out[:, 0] = u0 & np.uint32(0xFF)
    out[:, 1] = (u0 >> np.uint32(8)) & np.uint32(0xFF)
    out[:, 2] = u0 >> np.uint32(16)
    strided = np.lib.stride_tricks.as_strided
    if b == 8:
        out[:, 3:] = d & np.int32(0xFF)
    elif b == 12:
        u = d & np.int32(0xFFF)
        v0, v1 = u[:, 0::2], u[:, 1::2]
        t = strided(out[:, 3:], shape=(rows, n // 2, 3),
                    strides=(out.strides[0], 3, 1))
        t[..., 0] = v0 & np.int32(0xFF)
        t[..., 1] = (v0 >> np.int32(8)) | ((v1 & np.int32(0xF)) << np.int32(4))
        t[..., 2] = v1 >> np.int32(4)
    elif b == 16:
        out[:, 3:] = d.astype("<i2").view(np.uint8)
    else:  # b == 20
        u = (d & np.int32(0xFFFFF)).astype(np.uint32)
        v0, v1 = u[:, 0::2], u[:, 1::2]
        t = strided(out[:, 3:], shape=(rows, n // 2, 5),
                    strides=(out.strides[0], 5, 1))
        t[..., 0] = v0 & np.uint32(0xFF)
        t[..., 1] = (v0 >> np.uint32(8)) & np.uint32(0xFF)
        t[..., 2] = (v0 >> np.uint32(16)) | ((v1 & np.uint32(0xF)) << np.uint32(4))
        t[..., 3] = (v1 >> np.uint32(4)) & np.uint32(0xFF)
        t[..., 4] = v1 >> np.uint32(12)
    return b, out


@functools.lru_cache(maxsize=64)
def _jitted_unpack_delta24(b, bucket, K):
    """(bucket, 3 + N*b/8) uint8 delta rows -> zero-extended (K, N)
    int32 planes: the exact device inverse of ``_pack_delta24_host``
    fused with the partial-chunk row pad. Modular reconstruction:
    int32 cumsum of sign-extended fields, + x0, wrap to 24 bits."""
    import jax
    import jax.numpy as jnp

    from . import configure_jax

    configure_jax()

    def unpack(p):
        x0 = (p[:, 0].astype(jnp.int32)
              | (p[:, 1].astype(jnp.int32) << jnp.int32(8))
              | (p[:, 2].astype(jnp.int32) << jnp.int32(16)))
        x0 = (x0 ^ jnp.int32(0x800000)) - jnp.int32(0x800000)
        body = p[:, 3:]
        if b == 8:
            d = body.astype(jnp.int32)
            d = (d ^ jnp.int32(0x80)) - jnp.int32(0x80)
        elif b == 12:
            t = body.reshape(bucket, N // 2, 3).astype(jnp.int32)
            v0 = t[..., 0] | ((t[..., 1] & jnp.int32(0xF)) << jnp.int32(8))
            v1 = (t[..., 1] >> jnp.int32(4)) | (t[..., 2] << jnp.int32(4))
            d = jnp.stack([v0, v1], axis=-1).reshape(bucket, N)
            d = (d ^ jnp.int32(0x800)) - jnp.int32(0x800)
        elif b == 16:
            t = body.reshape(bucket, N, 2).astype(jnp.int32)
            d = t[..., 0] | (t[..., 1] << jnp.int32(8))
            d = (d ^ jnp.int32(0x8000)) - jnp.int32(0x8000)
        else:  # b == 20
            t = body.reshape(bucket, N // 2, 5).astype(jnp.int32)
            v0 = (t[..., 0] | (t[..., 1] << jnp.int32(8))
                  | ((t[..., 2] & jnp.int32(0xF)) << jnp.int32(16)))
            v1 = ((t[..., 2] >> jnp.int32(4)) | (t[..., 3] << jnp.int32(4))
                  | (t[..., 4] << jnp.int32(12)))
            d = jnp.stack([v0, v1], axis=-1).reshape(bucket, N)
            d = (d ^ jnp.int32(0x80000)) - jnp.int32(0x80000)
        vals = jnp.cumsum(d, axis=1) + x0[:, None]
        vals = (vals << jnp.int32(8)) >> jnp.int32(8)  # 24-bit wrap
        if bucket < K:
            vals = jnp.concatenate(
                [vals, jnp.zeros((K - bucket, N), jnp.int32)], axis=0
            )
        return vals

    return jax.jit(unpack)


def _pack24_host(m):
    """int32 (rows, N) in 24-bit range -> (3, rows, N) uint8 byte-planes
    (little-endian low/mid/high; the sign lives in byte 2's MSB).

    Precondition: every value fits signed 24 bits. Both product routes
    guarantee it before any plane reaches here — WAV reads sign-extend
    into the declared depth (io/wav.py), and direct library input is
    range-rejected at the encode boundary for all backends alike
    (encoder._validate; pool.encode_pooled validates before pooling)."""
    b = np.ascontiguousarray(m, dtype="<i4").view(np.uint8).reshape(*m.shape, 4)
    out = np.empty((3,) + m.shape, np.uint8)
    out[0], out[1], out[2] = b[..., 0], b[..., 1], b[..., 2]
    return out


@functools.lru_cache(maxsize=32)
def _jitted_unpack24(b, K):
    """(3, b, N) uint8 byte-planes -> zero-extended (K, N) int32 planes:
    the device-side inverse of ``_pack24_host`` fused with the partial-
    chunk row pad (io/wav.py ``_sign_extend`` semantics, bit-exact)."""
    import jax
    import jax.numpy as jnp

    from . import configure_jax

    configure_jax()

    def unpack(p):
        lo = p[0].astype(jnp.int32)
        mid = p[1].astype(jnp.int32)
        hi = p[2].astype(jnp.int8).astype(jnp.int32)  # sign-extends
        vals = lo | (mid << jnp.int32(8)) | (hi << jnp.int32(16))
        if b < K:
            vals = jnp.concatenate([vals, jnp.zeros((K - b, N), jnp.int32)], axis=0)
        return vals

    return jax.jit(unpack)


@functools.lru_cache(maxsize=32)
def _jitted_padrows(b, K, in_dtype):
    """Zero-extend an uploaded (b, N) plane matrix to the (K, N) analyze
    shape on device (data movement only; bit-exact by construction)."""
    import jax
    import jax.numpy as jnp

    from . import configure_jax

    configure_jax()

    def pad(m):
        return jnp.concatenate(
            [m, jnp.zeros((K - b, N), jnp.dtype(in_dtype))], axis=0
        )

    return jax.jit(pad)


class _ChunkJob:
    """One chunk of K full blocks through analyze -> plan -> emit."""

    def __init__(self, pipe, c0, kc):
        self.pipe = pipe
        self.c0 = c0  # first block index (within the full-block prefix)
        self.kc = kc  # real blocks in this chunk (<= K)

    # lane-row helpers: analyze output layouts are plane-major on one
    # device, shard-major (shard, plane, local-block) under a mesh
    def _row_of(self, p, i):
        pipe = self.pipe
        if pipe.mesh is None:
            return p * pipe.K + i
        Kl = pipe.K // pipe.nd
        s, ib = divmod(i, Kl)
        return (s * pipe.nplanes + p) * Kl + ib

    def _probe_row_of(self, p, i, pos):
        pipe = self.pipe
        if pipe.mesh is None:
            return (p * pipe.K + i) * 3 + pos
        Kl = pipe.K // pipe.nd
        s, ib = divmod(i, Kl)
        return ((s * 4 + p) * Kl + ib) * 3 + pos

    # ------------------------------------------------------------ stage 1
    def dispatch_analyze(self):
        import jax

        pipe = self.pipe
        K = pipe.K
        with _dbg.phase("plane_upload"):
            lmat = pipe.lview[self.c0 : self.c0 + self.kc]
            rmat = pipe.rview[self.c0 : self.c0 + self.kc] if pipe.rview is not None else None
            if pipe.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as SP

                from .parallel.mesh import BLOCK_AXIS

                sh = NamedSharding(pipe.mesh, SP(BLOCK_AXIS, None))
                put = lambda a: jax.device_put(a, sh)
            else:
                put = jax.device_put
            pack24 = _pack24_enabled(str(pipe.lview.dtype), pipe.mesh)
            delta_ok = _delta_enabled(str(pipe.lview.dtype), pipe.mesh)
            delta24_ok = _delta24_enabled(str(pipe.lview.dtype), pipe.mesh)
            if self.kc < K:  # pad the final partial chunk to the K shape
                bucket = _upload_bucket(self.kc, K, pipe.mesh)
                padfn = (
                    _jitted_padrows(bucket, K, str(lmat.dtype))
                    if bucket < K and not pack24
                    else None
                )

                def pad_put(m):
                    # the upload link is the pipeline's bottleneck:
                    # ship only ceil(kc/(K/div)) bucket rows of real
                    # bytes and zero-extend to (K, N) on device (the
                    # headline 30 s corpus has 80 full blocks — a
                    # host-side pad to K=128 uploaded 60% extra zeros).
                    # When kc lands exactly on the grid, skip the host
                    # zeros+copy too (this host copies at ~200 MB/s).
                    # 24-bit planes additionally ship as 3 u8 byte-
                    # planes (-25% bytes); 16-bit planes as wrapped-
                    # delta 8/12-bit fields (-25..50%); pad+unpack fuse
                    # on device.
                    if delta_ok:
                        db, ph = _pack_delta_host(m)
                        if db is not None:
                            if bucket > self.kc:
                                z = np.zeros((bucket, ph.shape[1]), np.uint8)
                                z[: self.kc] = ph
                                ph = z
                            return _jitted_unpack_delta(db, bucket, K)(put(ph))
                    if delta24_ok:
                        db, ph = _pack_delta24_host(m)
                        if db is not None:
                            if bucket > self.kc:
                                z = np.zeros((bucket, ph.shape[1]), np.uint8)
                                z[: self.kc] = ph
                                ph = z
                            return _jitted_unpack_delta24(db, bucket, K)(put(ph))
                    if pack24:
                        if bucket == self.kc:
                            ph = _pack24_host(m)
                        else:
                            ph = np.zeros((3, bucket, N), np.uint8)
                            ph[:, : self.kc] = _pack24_host(m)
                        return _jitted_unpack24(bucket, K)(put(ph))
                    if bucket == self.kc:
                        padh = np.ascontiguousarray(m)
                    else:
                        padh = np.zeros((bucket, N), m.dtype)
                        padh[: self.kc] = m
                    dev = put(padh)
                    return padfn(dev) if padfn is not None else dev

                lmat_d = pad_put(lmat)
                rmat_d = pad_put(rmat) if rmat is not None else lmat_d
            else:

                def full_ship(m):
                    if delta_ok:
                        db, ph = _pack_delta_host(m)
                        if db is not None:
                            return _jitted_unpack_delta(db, K, K)(put(ph))
                    if delta24_ok:
                        db, ph = _pack_delta24_host(m)
                        if db is not None:
                            return _jitted_unpack_delta24(db, K, K)(put(ph))
                    if pack24:
                        return _jitted_unpack24(K, K)(put(_pack24_host(m)))
                    return put(m)

                lmat_d = full_ship(lmat)
                rmat_d = full_ship(rmat) if rmat is not None else lmat_d
            fn = _jitted_analyze(K, pipe.kind, str(pipe.lview.dtype), pipe.mesh)
            self.dev = fn(lmat_d, rmat_d)
        for key in ("hostbuf", "cm", "un", "lags", "plags"):
            if key in self.dev:
                try:
                    self.dev[key].copy_to_host_async()
                except AttributeError:
                    pass

    # ------------------------------------------------------------ stage 2
    def dispatch_plan(self):
        import jax
        import jax.numpy as jnp

        from .encoder import _jitted_plan, lpc_candidates_from_lags

        pipe, K, kc = self.pipe, self.pipe.K, self.kc
        with _dbg.phase("flags_fetch"):
            if "hostbuf" in self.dev:
                buf = np.asarray(self.dev["hostbuf"])
                if pipe.kind == "auto":
                    cm = buf[:K].astype(bool)[:kc]
                    un = buf[K : 2 * K].astype(bool)[:kc]
                    o = 2 * K
                else:
                    cm = un = None
                    o = 0
                nl = pipe.nplanes * K
                lags = buf[o : o + nl * 13].reshape(nl, 13)
            else:
                lags = np.asarray(self.dev["lags"])
                if pipe.kind == "auto":
                    cm = np.asarray(self.dev["cm"])[:kc]
                    un = np.asarray(self.dev["un"])[:kc]
                else:
                    cm = un = None
        self.cm, self.un = cm, un

        # full-lane row list: (flat plane row, local block, variant, slot)
        # variant/slot -> plane index: L=0 R=1 (or M=0 S=1 when the kind
        # itself is ms), M=2 S=3 within the 4-plane auto layout
        rows, recs = [], []
        for i in range(kc):
            if pipe.kind == "mono":
                rows += [self._row_of(0, i)]
                recs += [(i, "lr", 0)]
            elif pipe.kind == "lr":
                rows += [self._row_of(0, i), self._row_of(1, i)]
                recs += [(i, "lr", 0), (i, "lr", 1)]
            elif pipe.kind == "ms":
                rows += [self._row_of(0, i), self._row_of(1, i)]
                recs += [(i, "ms", 0), (i, "ms", 1)]
            elif un[i]:
                rows += [self._row_of(p, i) for p in range(4)]
                recs += [(i, "lr", 0), (i, "lr", 1), (i, "ms", 0), (i, "ms", 1)]
            elif cm[i]:
                rows += [self._row_of(2, i), self._row_of(3, i)]
                recs += [(i, "ms", 0), (i, "ms", 1)]
            else:
                rows += [self._row_of(0, i), self._row_of(1, i)]
                recs += [(i, "lr", 0), (i, "lr", 1)]
        self.rows, self.recs = np.asarray(rows, np.int32), recs

        if pipe.mesh is not None:
            # sharded plan: every plane lane of every block is planned in
            # place — the sharded `planes` array feeds shard_map'd
            # plan_group with zero resharding and no cross-shard gather
            # (each block's lanes live on its own shard); per-lane work
            # is identical, the extra (losing-variant) lanes ride the
            # mesh's spare throughput. Selection happens at meta level.
            from jax.sharding import NamedSharding, PartitionSpec as SP

            from .parallel.mesh import BLOCK_AXIS, _sharded_plan_fn

            with _dbg.phase("host_ld"):
                coeffs, used, lvalid, mvo = lpc_candidates_from_lags(lags, N)
            self.coeffs = coeffs[:, self.rows]
            self.used = used[:, self.rows]
            self.mvo = mvo
            fn = _sharded_plan_fn(pipe.mesh, N, pipe.zero_run, pipe.partitioning, False)
            with _dbg.phase("plan_dispatch"):
                with pipe.mesh:
                    lane_sh = NamedSharding(pipe.mesh, SP(None, BLOCK_AXIS))
                    cs = jax.device_put(jnp.asarray(coeffs), lane_sh)
                    vs = jax.device_put(jnp.asarray(lvalid), lane_sh)
                    fut = fn(self.dev["planes"], cs, vs)
                try:
                    fut["meta"].copy_to_host_async()
                except AttributeError:
                    pass
                self.futs = [(fut, self.dev["planes"].shape[0])]
        else:
            with _dbg.phase("host_ld"):
                coeffs, used, lvalid, mvo = lpc_candidates_from_lags(lags[self.rows], N)
            self.coeffs, self.used, self.mvo = coeffs, used, mvo

            gather = _jitted_gather(N)
            plan = _jitted_plan(N, pipe.zero_run, pipe.partitioning, False)
            self.futs = []
            with _dbg.phase("plan_dispatch"):
                for lo, nsub, bp in plan_batches(len(rows), K):
                    sub = self.rows[lo : lo + nsub]
                    if nsub < bp:
                        sub = np.concatenate([sub, np.zeros(bp - nsub, np.int32)])
                    cpad = np.zeros((coeffs.shape[0], bp, 13), np.int16)
                    cpad[:, :nsub] = coeffs[:, lo : lo + nsub]
                    vpad = np.zeros((lvalid.shape[0], bp), bool)
                    vpad[:, :nsub] = lvalid[:, lo : lo + nsub]
                    g = gather(self.dev["planes"], jnp.asarray(sub))
                    fut = plan(g, jnp.asarray(cpad), jnp.asarray(vpad))
                    try:
                        fut["meta"].copy_to_host_async()
                    except AttributeError:
                        pass
                    self.futs.append((fut, nsub))

        if pipe.kind == "auto" and un.any():
            self._dispatch_probe_plan()
        else:
            self.probe_futs = None

    def _dispatch_probe_plan(self):
        import jax
        import jax.numpy as jnp

        from .encoder import _jitted_plan, lpc_candidates_from_lags

        pipe, K = self.pipe, self.pipe.K
        plags = np.asarray(self.dev["plags"])
        # probe row layout inside (4, Kl, 3, PROBE).reshape(-1, PROBE)
        # (plane-major on one device, shard-major under a mesh):
        rows, recs = [], []
        for i in np.nonzero(self.un)[0]:
            for variant, pl0 in (("lr", 0), ("ms", 2)):
                for pl in (pl0, pl0 + 1):
                    for pos in range(3):
                        rows.append(self._probe_row_of(pl, int(i), pos))
                        recs.append((int(i), variant))
        self.probe_rows, self.probe_recs = np.asarray(rows, np.int32), recs

        if pipe.mesh is not None:
            # sharded probe plan over ALL 12K probe lanes in place
            from jax.sharding import NamedSharding, PartitionSpec as SP

            from .parallel.mesh import BLOCK_AXIS, _sharded_plan_fn

            with _dbg.phase("host_ld"):
                coeffs, used, lvalid, mvo = lpc_candidates_from_lags(plags, PROBE)
            self.probe_coeffs = coeffs[:, self.probe_rows]
            self.probe_used = used[:, self.probe_rows]
            self.probe_mvo = mvo
            fn = _sharded_plan_fn(pipe.mesh, PROBE, pipe.zero_run, pipe.partitioning, False)
            with _dbg.phase("plan_dispatch"):
                with pipe.mesh:
                    lane_sh = NamedSharding(pipe.mesh, SP(None, BLOCK_AXIS))
                    cs = jax.device_put(jnp.asarray(coeffs), lane_sh)
                    vs = jax.device_put(jnp.asarray(lvalid), lane_sh)
                    fut = fn(self.dev["probes"], cs, vs)
                try:
                    fut["meta"].copy_to_host_async()
                except AttributeError:
                    pass
                self.probe_futs = [(fut, self.dev["probes"].shape[0])]
            return

        with _dbg.phase("host_ld"):
            coeffs, used, lvalid, mvo = lpc_candidates_from_lags(plags[self.probe_rows], PROBE)
        self.probe_coeffs, self.probe_used, self.probe_mvo = coeffs, used, mvo

        gather = _jitted_gather(PROBE)
        plan = _jitted_plan(PROBE, pipe.zero_run, pipe.partitioning, False)
        # one fixed probe batch shape (12 probe lanes x up to K blocks):
        # padding is cheap (256-sample lanes), a second executable is not
        cap = 12 * K
        self.probe_futs = []
        with _dbg.phase("plan_dispatch"):
            for lo in range(0, len(rows), cap):
                sub = self.probe_rows[lo : lo + cap]
                nsub = len(sub)
                bp = cap
                if nsub < bp:
                    sub = np.concatenate([sub, np.zeros(bp - nsub, np.int32)])
                cpad = np.zeros((coeffs.shape[0], bp, 13), np.int16)
                cpad[:, :nsub] = coeffs[:, lo : lo + nsub]
                vpad = np.zeros((lvalid.shape[0], bp), bool)
                vpad[:, :nsub] = lvalid[:, lo : lo + nsub]
                g = gather(self.dev["probes"], jnp.asarray(sub))
                fut = plan(g, jnp.asarray(cpad), jnp.asarray(vpad))
                try:
                    fut["meta"].copy_to_host_async()
                except AttributeError:
                    pass
                self.probe_futs.append((fut, nsub))

    # ------------------------------------------------------------ stage 3
    def finish(self):
        from .encoder import expand_plan
        from .runtime.native import emit_blocks_planes_native

        pipe, K, kc = self.pipe, self.pipe.K, self.kc
        with _dbg.phase("meta_fetch"):
            metas = [np.asarray(f["meta"])[:nsub] for f, nsub in self.futs]
        meta = np.concatenate(metas) if len(metas) > 1 else metas[0]
        if pipe.mesh is not None:  # all-lane shard-major meta -> recs order
            meta = meta[self.rows]

        # resolve uncertain stereo decisions BEFORE full-lane emission:
        # the device planned both full variants speculatively (one wave,
        # no extra round trip), but the serial host emit only runs for
        # the winning variant's two lanes per block
        flags, uncertain = {}, {}
        if pipe.kind == "auto":
            for i in range(kc):
                uncertain[i] = bool(self.un[i])
                if not self.un[i]:
                    flags[i] = 1 if self.cm[i] else 0
            if self.un.any():
                self._finish_probes(flags)

        def _wins(i, variant):
            if pipe.kind in ("mono", "lr"):
                return variant == "lr"
            if pipe.kind == "ms":
                return variant == "ms"
            return variant == ("ms" if flags[i] else "lr")

        sel = [j for j, (i, v, _) in enumerate(self.recs) if _wins(i, v)]
        recs = [self.recs[j] for j in sel]

        # lanes replay straight from the resident channel planes: the
        # native emitter derives L/R/M/S rows in-cache (no host-side
        # (lanes, N) PCM assembly pass)
        with _dbg.phase("emit_prep"):
            rows = np.asarray([self.c0 + i for i, _, _ in recs], np.int32)
            variants = np.asarray([v == "ms" for _, v, _ in recs], np.uint8)
            slots = np.asarray([s for _, _, s in recs], np.uint8)
            starts = np.zeros(len(recs), np.uint32)
            sel_np = np.asarray(sel, np.intp)
            plan = expand_plan(
                meta[sel_np], self.coeffs[:, sel_np], self.used[:, sel_np],
                self.mvo, N, pipe.partitioning,
            )
        with _dbg.phase("native_emit"):
            payloads = emit_blocks_planes_native(
                pipe.lview, pipe.rview, rows, variants, slots, starts, N,
                *plan, num_threads=pipe.thread_count,
            )
            if payloads is None:
                raise RuntimeError("native emitter unavailable")

        result = {}
        for (i, variant, slot), pb in zip(recs, payloads):
            result.setdefault(self.c0 + i, {})[slot] = pb
        return (
            result,
            {self.c0 + i: f for i, f in flags.items()},
            {self.c0 + i: u for i, u in uncertain.items()},
        )

    def _finish_probes(self, flags):
        from .encoder import expand_plan
        from .runtime.native import emit_blocks_planes_native

        pipe = self.pipe
        with _dbg.phase("meta_fetch"):
            metas = [np.asarray(f["meta"])[:nsub] for f, nsub in self.probe_futs]
        meta = np.concatenate(metas) if len(metas) > 1 else metas[0]
        if pipe.mesh is not None:  # all-lane shard-major meta -> recs order
            meta = meta[self.probe_rows]

        with _dbg.phase("emit_prep"):
            rows, variants, slots, starts = [], [], [], []
            un_local = sorted({i for i, _ in self.probe_recs})
            for i in un_local:
                for variant in ("lr", "ms"):
                    for slot in (0, 1):
                        for pos in PROBE_POS:
                            rows.append(self.c0 + i)
                            variants.append(variant == "ms")
                            slots.append(slot)
                            starts.append(pos)
            plan = expand_plan(
                meta, self.probe_coeffs, self.probe_used, self.probe_mvo, PROBE,
                pipe.partitioning,
            )
        with _dbg.phase("native_emit"):
            payloads = emit_blocks_planes_native(
                pipe.lview, pipe.rview,
                np.asarray(rows, np.int32), np.asarray(variants, np.uint8),
                np.asarray(slots, np.uint8), np.asarray(starts, np.uint32), PROBE,
                *plan, num_threads=pipe.thread_count,
            )
            if payloads is None:
                raise RuntimeError("native emitter unavailable")
        totals = {}
        for (i, variant), pb in zip(self.probe_recs, payloads):
            t = totals.setdefault(i, {"lr": 0, "ms": 0})
            t[variant] += len(pb)
        for i, t in totals.items():
            flags[i] = 1 if t["ms"] < t["lr"] else 0


class PlanePipeline:
    def __init__(self, frame_enc, left, right, nfull, kind, views=None):
        from . import configure_jax

        configure_jax()
        self.kind = kind
        self.zero_run = bool(frame_enc.zero_run_enabled)
        self.partitioning = bool(frame_enc.partitioning_enabled)
        self.thread_count = int(frame_enc.thread_count)
        self.mesh = getattr(frame_enc, "mesh", None)
        self.nd = (
            int(np.prod(list(self.mesh.shape.values()))) if self.mesh is not None else 1
        )
        self.nplanes = {"mono": 1, "lr": 2, "ms": 2, "auto": 4}[kind]
        # fixed chunk width: every analyze/plan executable has one shape
        # (compiles are minutes on the axon remote-compile service, so
        # shape diversity is the enemy; short files pad up)
        self.K = chunk_width(nfull)
        if self.mesh is not None and self.K % self.nd != 0:
            # the chunk's block axis must split evenly over the shards;
            # pooled waves reach here without the applicable() check, so
            # an odd mesh quietly takes the single-device pipeline
            # (bytes are sharding-invariant either way)
            self.mesh, self.nd = None, 1
        if views is not None:
            # cross-file pooled serving (lac_tpu.pool): the caller hands
            # prebuilt (nfull, N) plane matrices whose block rows may be
            # drawn from MANY files — blocks are file-agnostic once the
            # planes are cut, so the pipeline is unchanged
            self.lview, self.rview = views
            assert self.lview.shape == (nfull, N)
        else:
            dt = np.int16 if frame_enc.bit_depth == 16 else np.int32
            self.lview = np.ascontiguousarray(
                left[: nfull * N].reshape(nfull, N), dtype=dt
            )
            self.rview = (
                np.ascontiguousarray(right[: nfull * N].reshape(nfull, N), dtype=dt)
                if kind != "mono"
                else None
            )
        self.jobs = [
            _ChunkJob(self, c0, min(self.K, nfull - c0))
            for c0 in range(0, nfull, self.K)
        ]

    def run(self, progress_cb=None):
        """Sliding-window software pipeline: analyze chunk j while
        planning chunk j-D and emitting chunk j-D-1.

        ``D`` (LAC_TPU_PIPE_DEPTH, default 2) is the analyze->plan gap.
        At D=2 the lags/flags a plan dispatch consumes were
        ``copy_to_host_async``'d two iterations earlier and their
        analyze preceded the previous plan in the device queue, so the
        host-side fetch in ``dispatch_plan`` never blocks on the device
        or the tunnel RTT — the host dispatches plans back-to-back with
        no per-chunk sync (the round-2 verdict's "per-chunk lag fetch").
        Host Levinson-Durbin stays 80-bit exact; only scheduling moved.
        Cost: one extra chunk of resident planes (~64 MB at K=256).

        ``progress_cb(done_blocks, payloads, flags, uncertain)`` fires
        after each chunk's emit with the count of contiguously-complete
        leading blocks (chunks finish strictly in block order) and the
        accumulating result dicts — the pooled serving layer uses it to
        release per-file results (and pop their entries) while later
        chunks are still on the device.
        """
        payloads, flags, uncertain = {}, {}, {}
        jobs = self.jobs
        try:
            depth = max(1, int(os.environ.get("LAC_TPU_PIPE_DEPTH", "2")))
        except ValueError:
            depth = 2

        def _finish(i):
            p, f, u = jobs[i].finish()
            payloads.update(p)
            flags.update(f)
            uncertain.update(u)
            jobs[i].dev = jobs[i].futs = None  # release device buffers
            if progress_cb is not None:
                progress_cb(jobs[i].c0 + jobs[i].kc, payloads, flags, uncertain)

        for j, job in enumerate(jobs):
            job.dispatch_analyze()
            if j >= depth:
                jobs[j - depth].dispatch_plan()
            if j >= depth + 1:
                _finish(j - depth - 1)
        for i in range(max(len(jobs) - depth, 0), len(jobs)):
            jobs[i].dispatch_plan()
        for i in range(max(len(jobs) - depth - 1, 0), len(jobs)):
            _finish(i)
        return payloads, flags, uncertain


def encode_full_blocks(frame_enc, left, right, nfull, kind):
    """Encode the leading ``nfull`` full-size blocks via device-resident
    planes. Returns (payloads: {block: {slot: bytes}}, flags: {block:
    0|1}, uncertain: {block: bool}) — flags/uncertain only for auto."""
    out = PlanePipeline(frame_enc, left, right, nfull, kind).run()
    mark_warm()  # device executables are now loaded in this process
    return out

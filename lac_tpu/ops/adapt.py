"""Closed-form Rice k-adaptation sequences.

The reference adapts ``k`` serially after every residual sample
(rice.hpp:45-114 stateful; block/encoder.cpp:72-77 stateless). The key
TPU-native observation: the adaptation state is a pure function of the
*history of unsigned residuals* — there is no feedback from ``k`` into
the state. Concretely, for sample index ``i`` (0-based) of a segment:

* ``sum_i``/``count_i`` are prefix sums,
* the 256-entry drift window holds exactly the last 256 ``u`` values, so
  ``window_sum_i = sum_i - sum_{i-256}`` (sliding-window sum),
* the 96-entry micro window's large/zero counters are sliding-window
  sums of per-sample flags derived from ``u_i`` and the mean-based k,
* the micro trigger ``window_index+1 >= 96 || window_filled >= 96``
  reduces to ``count_i >= 96``.

Hence the whole k-sequence is cumsum + elementwise ops — embarrassingly
parallel across samples, partitions, candidates, and blocks. This module
computes ``k_used[i]`` — the k that encodes sample ``i`` (``initial_k``
for the first sample, then the adapted value).
"""

import numpy as np

from ..format import constants as C
from ._backend import bit_width, exact_udiv, is_jax, shift_right


def recip_count_table(L):
    """Baked float64 table recip[i] = 1/(i+1) — lets every adaptation
    division compile as a multiply (see _backend.exact_udiv)."""
    return 1.0 / np.arange(1, L + 1, dtype=np.float64)


def k_after_stateless(seg_sum, pos_in_seg, xp=np, recip_table=None, recip=None):
    """Stateless adapted k after each sample (block/encoder.cpp:72-77).

    ``seg_sum``: segment-local inclusive prefix sum of u (uint64).
    ``pos_in_seg``: 0-based position within the segment (int64; may be a
    baked numpy constant for static partition geometry).
    ``recip_table``: optional (L,) float64 1/(i+1) table (gathered at
    pos); ``recip``: optional precomputed per-sample reciprocal (beats
    the gather when the geometry is static).
    """
    if isinstance(pos_in_seg, np.ndarray) or isinstance(pos_in_seg, int):
        count_np = np.asarray(pos_in_seg, dtype=np.int64) + 1
        count = xp.asarray(count_np.astype(np.uint64))
        if recip is None and recip_table is not None and isinstance(recip_table, np.ndarray):
            recip = recip_table[np.asarray(pos_in_seg)]
    else:
        count = (pos_in_seg + 1).astype(xp.uint64)
        if recip is None and recip_table is not None:
            recip = xp.asarray(recip_table)[pos_in_seg]
    mean = exact_udiv(seg_sum + (count >> xp.uint64(1)), count, xp=xp, recip=recip)
    k = xp.minimum(xp.int32(C.MAX_RICE_K), bit_width(mean - xp.uint64(1), xp=xp))
    return xp.where(mean <= xp.uint64(1), xp.int32(0), k)


def k_after_stateful(u, xp=np, recip_table=None):
    """Stateful adapted k after each sample of a whole block (rice.hpp:45-114).

    ``u``: (..., L) uint64 unsigned residuals. Returns int32 (..., L).
    """
    one = xp.uint64(1)
    u = u.astype(xp.uint64)
    L = u.shape[-1]
    lead = u.shape[:-1]
    rows = int(np.prod(lead)) if lead else 1
    # prefix sums via 16-bit-split u32 cumsums (emulated u64 cumsum is
    # ~5x slower on TPU); the u64 reconstruction is one elementwise op.
    # On TPU the splits + both scans run in one VMEM-resident Pallas
    # kernel (pallas_kernels.split_cumsums_u32) — bit-identical.
    u32v = u.astype(xp.uint32)
    use_pk = False
    if is_jax(xp):
        from . import pallas_kernels as _pk

        use_pk = (_pk.pallas_available() and _pk.pallas_default()
                  and _pk.scan_shape_supported(rows, L))
    if use_pk:
        cs_hi, cs_lo = _pk.split_cumsums_u32(u32v.reshape(rows, L))
        cs_hi = cs_hi.reshape(lead + (L,))
        cs_lo = cs_lo.reshape(lead + (L,))
    else:
        cs_hi = xp.cumsum(u32v >> xp.uint32(16), axis=-1)
        cs_lo = xp.cumsum(u32v & xp.uint32(0xFFFF), axis=-1)
    s = (cs_hi.astype(xp.uint64) << xp.uint64(16)) + cs_lo.astype(xp.uint64)
    idx = xp.arange(L, dtype=xp.int64)
    count = (idx + 1).astype(xp.uint64)
    if recip_table is None:
        recip_count = recip_filled = None
    else:
        recip_count = xp.asarray(recip_table)
        lim = np.float64(1.0 / C.DRIFT_WINDOW)
        recip_filled = xp.where(idx < C.DRIFT_WINDOW, recip_count, lim)

    mean = exact_udiv(s + (count >> one), count, xp=xp, recip=recip_count)
    k_base = xp.where(
        mean <= one,
        xp.int32(0),
        xp.minimum(xp.int32(C.MAX_RICE_K), bit_width(mean - one, xp=xp)),
    )

    # drift window: sum of the last min(i+1, 256) values
    window_sum = s - shift_right(s, C.DRIFT_WINDOW, xp=xp)
    filled = xp.minimum(count, xp.uint64(C.DRIFT_WINDOW))
    local_mean = xp.where(
        filled == xp.uint64(C.DRIFT_WINDOW),
        (window_sum + xp.uint64(C.DRIFT_WINDOW >> 1)) >> xp.uint64(8),
        exact_udiv(window_sum + (filled >> one), filled, xp=xp, recip=recip_filled),
    )
    three, four = xp.uint64(3), xp.uint64(4)
    bias = xp.where(
        local_mean * three > mean * four,
        xp.int32(1),
        xp.where(local_mean * four + three < mean * three, xp.int32(-1), xp.int32(0)),
    )
    bias = xp.where(mean > xp.uint64(0), bias, xp.int32(0))

    # micro window: quotient-distribution counters over the last 96
    # samples. Both flag cumsums ride ONE u32 scan: counts are <= L <=
    # 16384 < 2^16, so is_large packs in the low half and is_zero in the
    # high half with no carry between them.
    q_base = xp.where(k_base >= xp.int32(C.MAX_RICE_K), xp.uint64(0), u >> k_base.astype(xp.uint64))
    packed = (q_base > three).astype(xp.uint32) + ((q_base == xp.uint64(0)).astype(xp.uint32) << xp.uint32(16))
    if use_pk:
        cp = _pk.cumsum_u32(packed.reshape(rows, L)).reshape(lead + (L,))
    else:
        cp = xp.cumsum(packed, axis=-1)
    wp = cp - shift_right(cp, C.MICRO_WINDOW, xp=xp)
    large_cnt = (wp & xp.uint32(0xFFFF)).astype(xp.int32)
    zero_cnt = (wp >> xp.uint32(16)).astype(xp.int32)
    trigger = count >= xp.uint64(C.MICRO_WINDOW)
    wsize = xp.minimum(idx + 1, xp.int64(C.MICRO_WINDOW)).astype(xp.int32)
    cond_large = large_cnt * 4 >= wsize * 3
    cond_zero = zero_cnt * 5 >= wsize * 4
    bias = xp.where(
        trigger & cond_large,
        xp.minimum(bias + xp.int32(1), xp.int32(1)),
        xp.where(trigger & ~cond_large & cond_zero, xp.maximum(bias - xp.int32(1), xp.int32(-1)), bias),
    )

    return xp.clip(k_base + bias, 0, C.MAX_RICE_K).astype(xp.int32)


def k_used_from_after(k_after, initial_k, xp=np):
    """Shift the post-sample k sequence into the pre-sample (encoding) k.

    ``initial_k`` may be scalar or broadcastable to the leading shape.
    """
    shifted = shift_right(k_after, 1, xp=xp)
    L = k_after.shape[-1]
    first = xp.arange(L, dtype=xp.int64) == 0
    init = xp.asarray(initial_k, dtype=xp.int32)
    if getattr(init, "ndim", 0) > 0:
        init = init[..., None]
    return xp.where(first, init, shifted).astype(xp.int32)


def k_used_stateless_from_cumsum(s_incl, pos_in_seg, initial_k_per_sample, xp=np, recip_table=None):
    """Per-sample encoding k for stateless (partitioned) adaptation, from
    a precomputed inclusive global cumsum of u (reused across partition
    orders during the sweep).
    """
    # segment-local prefix sums: subtract the global cumsum just before
    # each segment start (gathered via i - pos_in_seg).
    idx = xp.arange(s_incl.shape[-1], dtype=xp.int64)
    seg_start = idx - pos_in_seg
    s_shift = shift_right(s_incl, 1, xp=xp)  # exclusive global cumsum
    base = xp.take_along_axis(
        s_shift, xp.broadcast_to(seg_start, s_incl.shape).astype(xp.int64), axis=-1
    ) if s_incl.ndim > 1 else s_shift[seg_start]
    seg_sum = s_incl - base
    k_after = k_after_stateless(seg_sum, pos_in_seg, xp=xp, recip_table=recip_table)
    shifted = shift_right(k_after, 1, xp=xp)
    return xp.where(pos_in_seg == 0, initial_k_per_sample, shifted).astype(xp.int32)


def k_used_stateless_segmented(u, pos_in_seg, initial_k_per_sample, xp=np):
    """Per-sample encoding k for stateless (partitioned) adaptation.

    ``u``: (..., L) uint64; ``pos_in_seg``: (..., L) int64 position within
    each sample's partition; ``initial_k_per_sample``: int32 per-sample
    initial k (the owning partition's initial_k, used at pos 0).
    """
    s = xp.cumsum(u.astype(xp.uint64), axis=-1)
    return k_used_stateless_from_cumsum(s, pos_in_seg, initial_k_per_sample, xp=xp)

"""Stereo mid/side transform + per-block stereo-mode proxy decision.

* M/S transform (format.md:86-100): ``mid = (l + r) >> 1``,
  ``side = l - r`` — exact for the validated 16/24-bit domain.
* Proxy decision (lac/encoder.cpp:104-197): zigzag-magnitude sums of
  raw / first-difference / first-anti-difference sequences for L, R, M,
  S approximate per-channel Rice cost; MS is chosen when cheaper, and
  the decision is *uncertain* (triggering probe/full comparisons) when
  the margin is below 1%, either side is zero, or a non-difference
  predictor looks competitive.

Everything is a masked reduction — one pass over the block tensor.
"""

import numpy as np

from ..format import constants as C
from ._backend import bit_width, shift_right


def ms_transform(left, right, xp=np):
    """-> (mid, side) int32 (neon.cpp:14-30 scalar semantics)."""
    l64 = left.astype(xp.int64)
    r64 = right.astype(xp.int64)
    mid = (l64 + r64) >> xp.int64(1)
    side = l64 - r64
    return mid.astype(xp.int32), side.astype(xp.int32)


def ms_inverse(mid, side, xp=np):
    """-> (left, right) int64 (format.md:96-100; lac/decoder.cpp:48-65)."""
    m = mid.astype(xp.int64)
    s = side.astype(xp.int64)
    left = m + ((s + (s & xp.int64(1))) >> xp.int64(1))
    right = left - s
    return left, right


def _zigzag_mag(v, xp):
    """Zigzag magnitude of a difference (lac/encoder.cpp:38-41).

    ``zigzag(v) = 2v`` for v >= 0 and ``2(-v-1)+1 = -2v-1`` for v < 0 —
    i.e. ``2|v| - (v < 0)``; per-sample values are <= 2^27 for the
    validated PCM domain (int32-safe), and sums over <= 16384 terms stay
    <= 2^41 (int64 reductions) — the reference's uint64 saturation is
    unreachable.
    """
    one = v.dtype.type(1)
    return (xp.abs(v) << one) - (v < 0)


def _approx_rice_bits(total, count, xp):
    """approximate_rice_bits (lac/encoder.cpp:53-57): k from rounded
    mean, cost = (sum >> k) + count * (k + 1). All values fit int64
    comfortably (the reference's uint64 saturation is unreachable for
    <= 2^14 samples of <= 26-bit magnitudes)."""
    cnt = count.astype(xp.int64)
    mean = (total + (cnt >> xp.int64(1))) // xp.maximum(cnt, xp.int64(1))
    k = xp.where(
        mean <= xp.int64(1),
        xp.int32(0),
        xp.minimum(xp.int32(C.MAX_RICE_K), bit_width(mean - xp.int64(1), xp=xp)),
    )
    k64 = k.astype(xp.int64)
    bits = (total >> k64) + cnt * (k64 + xp.int64(1))
    return xp.where(cnt > 0, bits, xp.int64(0))


def _channel_proxy(raw_sum, diff_sum, anti_sum, count, xp):
    raw_bits = _approx_rice_bits(raw_sum, count, xp)
    diff_bits = _approx_rice_bits(diff_sum, count, xp)
    anti_bits = _approx_rice_bits(anti_sum, count, xp)
    bits = xp.minimum(xp.minimum(raw_bits, diff_bits), anti_bits)
    non_diff = (raw_bits < diff_bits) | (anti_bits < diff_bits)
    return bits, non_diff


def estimate_stereo_mode(left, right, valid, xp=np):
    """Per-lane stereo decision (lac/encoder.cpp:126-197).

    ``left``/``right``: (..., L) int32; ``valid``: bool mask.
    Returns (choose_ms, uncertain) bool arrays of the leading shape.
    """
    # int32 elementwise math (inputs are validated <= 25-bit PCM; every
    # intermediate fits comfortably), int64 reductions
    l32 = left.astype(xp.int32)
    r32 = right.astype(xp.int32)
    m32 = (l32 + r32) >> xp.int32(1)
    s32 = l32 - r32
    all_valid = bool(np.asarray(valid).all()) if not hasattr(valid, "aval") else False
    w = valid.astype(xp.int64)
    count = xp.sum(w, axis=-1)

    idx = xp.arange(left.shape[-1], dtype=xp.int64)
    first = idx == 0

    def rsum(a):
        if xp is np:
            return np.sum(a, axis=-1, dtype=np.int64)
        return xp.sum(a.astype(xp.int64), axis=-1)

    sums = {}
    for name, ch in (("l", l32), ("r", r32), ("m", m32), ("s", s32)):
        prev = shift_right(ch, 1, xp=xp)
        raw = _zigzag_mag(ch, xp)
        diff = xp.where(first, raw, _zigzag_mag(ch - prev, xp))
        anti = xp.where(first, raw, _zigzag_mag(ch + prev, xp))
        if all_valid:
            sums[name] = (rsum(raw), rsum(diff), rsum(anti))
        else:
            sums[name] = (rsum(raw * w), rsum(diff * w), rsum(anti * w))

    bits = {}
    non_diff_any = None
    for name in ("l", "r", "m", "s"):
        b, nd = _channel_proxy(*sums[name], count, xp)
        bits[name] = b
        non_diff_any = nd if non_diff_any is None else (non_diff_any | nd)

    lr_bits = bits["l"] + bits["r"]
    ms_bits = bits["m"] + bits["s"]
    smaller = xp.minimum(lr_bits, ms_bits)
    difference = xp.where(lr_bits >= ms_bits, lr_bits - ms_bits, ms_bits - lr_bits)
    choose_ms = ms_bits < lr_bits
    uncertain = (
        (smaller == 0)
        | (difference == 0)
        | non_diff_any
        | (difference <= smaller // xp.int64(C.STEREO_CONFIDENCE_DIVISOR))
    )
    return choose_ms, uncertain

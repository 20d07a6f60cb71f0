"""TPU-side batched decode: native tokenizer -> device reconstruction.

v3 block payloads are bit-serial, so tokenization runs in the native
runtime (parallel over independent blocks); everything after that is an
array program on device:

* fixed-predictor reconstruction inverts to repeated prefix sums
  (fully parallel across lanes and samples),
* FIR/LPC reconstruction is a vmapped lax.scan (the ``>> 15``/``>> 2``
  truncations are genuine recurrences),
* mid/side inversion and PCM range validation are elementwise.

This is the demonstration/alternate backend
(``FrameDecoder(backend="device")``); the pure-native path remains the
latency default for single files.
"""

import numpy as np

from .format import constants as C
from .ops import predictors
from .ops.stereo import ms_inverse


def _restore_groups(res_planes, block_sizes, sample_offsets, ptype, order, coeffs, xp):
    """Restore every (block, channel) lane on device, grouped by
    (predictor type, order). Returns int64 planes + ok flag."""
    channels = res_planes.shape[0]
    nb = len(block_sizes)
    out = res_planes.astype(np.int64).copy()
    ok = True

    lanes = [(bi, ch) for bi in range(nb) for ch in range(channels)]
    groups = {}
    for bi, ch in lanes:
        key = (int(ptype[bi, ch]), int(order[bi, ch]))
        groups.setdefault(key, []).append((bi, ch))

    lmax = int(max(block_sizes))
    for (pt, od), members in groups.items():
        G = len(members)
        batch = np.zeros((G, lmax), dtype=np.int32)
        lens = np.zeros(G, dtype=np.int64)
        for g, (bi, ch) in enumerate(members):
            sz = int(block_sizes[bi])
            off = int(sample_offsets[bi])
            batch[g, :sz] = res_planes[ch, off : off + sz]
            lens[g] = sz
        if pt == C.PREDICTOR_FIXED:
            restored, g_ok = predictors.fixed_restore(xp.asarray(batch), od, valid_len=xp.asarray(lens), xp=xp)
        elif pt == C.PREDICTOR_FIR:
            restored, g_ok = predictors.fir_restore(xp.asarray(batch), valid_len=xp.asarray(lens), xp=xp)
        else:
            carr = np.zeros((G, 33), dtype=np.int64)
            for g, (bi, ch) in enumerate(members):
                carr[g] = coeffs[bi, ch]
            restored, g_ok = predictors.lpc_restore(
                xp.asarray(batch), xp.asarray(carr), od, valid_len=xp.asarray(lens), xp=xp
            )
        restored = np.asarray(restored)
        g_ok = np.asarray(g_ok)
        ok = ok and bool(g_ok.all())
        if not ok:
            return out, False
        for g, (bi, ch) in enumerate(members):
            sz = int(block_sizes[bi])
            off = int(sample_offsets[bi])
            out[ch, off : off + sz] = restored[g, :sz]
    return out, ok


def decode_v3_device(hdr, block_sizes, payload_sizes, block_payload, total_samples, thread_count=0, xp=None):
    """Device-batched v3 decode. Returns (left, right) int32 arrays or
    raises ValueError (bad block index in the message)."""
    if xp is None:
        from . import configure_jax

        configure_jax()
        import jax.numpy as jnp

        xp = jnp
    from .runtime.native import tokenize_v3_blocks_native

    payload_offsets = np.concatenate([[0], np.cumsum(payload_sizes)])[:-1]
    sample_offsets = np.concatenate([[0], np.cumsum(block_sizes)])[:-1]
    tok = tokenize_v3_blocks_native(
        block_payload, payload_offsets, payload_sizes, block_sizes, sample_offsets,
        hdr.channels, hdr.stereo_mode, total_samples, thread_count,
    )
    if tok is None:
        raise RuntimeError("native runtime unavailable for device decode")
    res, ptype, order, coeffs, msflag = tok

    planes, ok = _restore_groups(res, block_sizes, sample_offsets, ptype, order, coeffs, xp)
    if not ok:
        raise ValueError("reconstruction outside int32 range")

    lo, hi = C.pcm_range(hdr.bit_depth)
    left = planes[0]
    if hdr.channels == 2:
        right = planes[1]
        # per-sample ms flag from per-block flags
        ms_mask = np.repeat(msflag.astype(bool), block_sizes)
        l_ms, r_ms = ms_inverse(left, right)
        l_ms, r_ms = np.asarray(l_ms), np.asarray(r_ms)
        left = np.where(ms_mask, l_ms, left)
        right = np.where(ms_mask, r_ms, right)
        if (left.min(initial=0) < lo or left.max(initial=0) > hi or
                right.min(initial=0) < lo or right.max(initial=0) > hi):
            raise ValueError("decoded sample outside PCM bit depth")
        return left.astype(np.int32), right.astype(np.int32)
    if left.min(initial=0) < lo or left.max(initial=0) > hi:
        raise ValueError("decoded sample outside PCM bit depth")
    return left.astype(np.int32), np.empty(0, np.int32)

"""Zigzag signed<->unsigned residual mapping (format.md:222-236).

Array-native: the same code path works on numpy and jax.numpy arrays
(both honour modular unsigned arithmetic). ``0 -> 0, -1 -> 1, 1 -> 2``.
"""

import numpy as np

_U32_ALL = np.uint32(0xFFFFFFFF)


def zigzag_encode(v):
    """int32 residuals -> uint32 codes: ``(u32(v) << 1) ^ (v < 0 ? ~0 : 0)``."""
    if isinstance(v, (int, np.integer)):
        return (((int(v) & 0xFFFFFFFF) << 1) ^ (0xFFFFFFFF if v < 0 else 0)) & 0xFFFFFFFF
    u = v.astype(np.uint32)
    sign_mask = (v < 0).astype(np.uint32) * _U32_ALL
    return (u << np.uint32(1)) ^ sign_mask


def zigzag_decode(u):
    """uint32 codes -> int32 residuals: ``(u >> 1) ^ -(u & 1)`` (two's complement)."""
    if isinstance(u, (int, np.integer)):
        half = int(u) >> 1
        return half if (u & 1) == 0 else -(half + 1)
    u = u.astype(np.uint32)
    r = (u >> np.uint32(1)) ^ ((u & np.uint32(1)) * _U32_ALL)
    return r.astype(np.int32)

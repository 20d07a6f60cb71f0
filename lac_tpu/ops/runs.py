"""Vectorized zero-run geometry (segment-aware).

Zero-run tokens group maximal runs of >= ZERO_RUN_MIN_LENGTH zero
residuals inside a partition (format.md:344-366). Run boundaries never
cross partition boundaries. This derives, fully in parallel:

* ``run_len``   — length of the maximal zero run containing each sample,
* ``long_run``  — sample is covered by a run token,
* ``run_start`` — sample is the first of a run token.

via prefix-max (last break before i) and suffix-min (next break after i).
"""

import numpy as np

from ..format import constants as C
from ._backend import cummax, cummin_reverse


def zero_run_info(z, pos_in_seg, seg_end_exclusive, xp=np):
    """Compute run geometry.

    ``z``: (..., L) bool — residual == 0 AND within valid length (callers
    must clear ``z`` on padding).
    ``pos_in_seg``: (..., L) int64 position inside the owning partition.
    ``seg_end_exclusive``: (..., L) int64 index one past the partition end.

    Returns (run_len, long_run, run_start).
    """
    L = z.shape[-1]
    idx = xp.arange(L, dtype=xp.int64)
    neg = xp.int64(-L - 2)

    # last break at-or-before i: a non-zero sample breaks at its own
    # index; a zero at partition start has its break just before it.
    a = xp.where(~z, idx, xp.where(pos_in_seg == 0, idx - 1, neg))
    last_break = cummax(a, xp=xp)
    run_first = last_break + 1

    # next break at-or-after i: next non-zero sample, capped by the
    # partition end.
    big = xp.int64(L + 2)
    b = xp.where(~z, idx, big)
    next_break = xp.minimum(cummin_reverse(b, xp=xp), seg_end_exclusive)

    run_len = xp.where(z, next_break - run_first, xp.int64(0))
    long_run = z & (run_len >= C.ZERO_RUN_MIN_LENGTH)
    run_start = long_run & (idx == run_first)
    return run_len, long_run, run_start

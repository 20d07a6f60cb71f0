"""Multi-file batch encoding/decoding for serving workloads.

Files are independent, so the simplest correct scale-out is a host
worker pool: each worker runs the full frame pipeline, and their device
work (already dispatched asynchronously per group) interleaves on the
accelerator stream while other workers pack/assemble on the host. All
jitted executables are shared via the in-process caches, so concurrency
costs no extra compilation.

For very large corpora spanning chips, combine this with
``lac_tpu.parallel`` (shard the block axis of each wave over the mesh).
"""

from concurrent.futures import ThreadPoolExecutor

import numpy as np

from .decoder import FrameDecoder
from .encoder import FrameEncoder


def encode_batch(items, sample_rate, bit_depth, stereo_mode=2, xp=None,
                 max_workers=4, **encoder_opts):
    """Encode many PCM pairs -> list of .lac frames (input order).

    ``items``: iterable of (left, right) int32 arrays (right empty/None
    for mono). All items share the format parameters.
    """
    if xp is None:
        xp = np
    items = [(l, (r if r is not None else np.empty(0, np.int32))) for l, r in items]

    def one(pair):
        left, right = pair
        enc = FrameEncoder(12, stereo_mode if len(right) else 0, sample_rate, bit_depth, xp=xp)
        for key, val in encoder_opts.items():
            getattr(enc, f"set_{key}")(val)
        return enc.encode(left, right)

    if len(items) <= 1 or max_workers <= 1:
        return [one(p) for p in items]
    with ThreadPoolExecutor(max_workers=min(max_workers, len(items))) as ex:
        return list(ex.map(one, items))


def decode_batch(frames, max_workers=8):
    """Decode many .lac frames -> list of (left, right, header)."""
    if len(frames) <= 1 or max_workers <= 1:
        return [FrameDecoder().decode(f) for f in frames]
    with ThreadPoolExecutor(max_workers=min(max_workers, len(frames))) as ex:
        return list(ex.map(lambda f: FrameDecoder().decode(f), frames))

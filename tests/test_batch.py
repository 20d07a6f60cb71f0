"""Batch API: concurrent encodes must be byte-identical to serial ones."""

import numpy as np

from lac_tpu.batch import decode_batch, encode_batch
from lac_tpu.encoder import FrameEncoder

from .signals import lcg_noise, sine


def test_encode_batch_matches_serial():
    items = []
    for i in range(6):
        n = 5000 + 700 * i
        l = sine(n, 44100, 200.0 + 17 * i, 20000) + lcg_noise(n, 200, i)
        r = sine(n, 44100, 203.0 + 17 * i, 19000) + lcg_noise(n, 210, i + 50)
        items.append((l.astype(np.int32), r.astype(np.int32)))
    items.append((lcg_noise(3000, 9000, 99), None))  # mono

    batched = encode_batch(items, 44100, 16, max_workers=4)
    for (l, r), bs in zip(items, batched):
        r = r if r is not None else np.empty(0, np.int32)
        want = FrameEncoder(12, 2 if len(r) else 0, 44100, 16).encode(l, r)
        assert bs == want

    decoded = decode_batch(batched)
    for (l, r), (dl, dr, _) in zip(items, decoded):
        np.testing.assert_array_equal(dl, l)
        np.testing.assert_array_equal(dr, r if r is not None else np.empty(0, np.int32))

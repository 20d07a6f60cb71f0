"""Random-access range decode (FrameDecoder.decode_range).

The v3 per-block compressed-size table makes every block independently
decodable (docs/format.md; reference lac/decoder.cpp:236-292 exploits
the same property for parallelism) — decode_range turns that into a
seek API: only the blocks overlapping the range are read, verified here
by corrupting bytes OUTSIDE the range and still decoding it.
"""

import numpy as np
import pytest

from lac_tpu.decoder import DecodeError, FrameDecoder
from lac_tpu.encoder import FrameEncoder

from .signals import lcg_noise

N = 16384


def _stream(depth=16, blocks=4, tail=1234, stereo=True, mode=2):
    n = blocks * N + tail
    scale = 20000 if depth == 16 else 5_000_000
    l = lcg_noise(n, scale, 5)
    r = lcg_noise(n, scale, 9) if stereo else np.empty(0, np.int32)
    sr = 44100 if depth == 16 else 96000
    enc = FrameEncoder(12, mode if stereo else 0, sr, depth)
    return enc.encode(l, r), l, r, n


STREAM16 = _stream()


@pytest.mark.parametrize("use_native", [True, False], ids=["native", "python"])
def test_ranges_match_full_decode(use_native):
    bs, l, r, n = STREAM16
    dec = FrameDecoder(use_native=use_native)
    fl, fr, hdr = dec.decode(bs)
    cases = [
        (0, 100),            # head
        (5, 1),              # single sample
        (N - 1, 2),          # spans a block boundary
        (N, N),              # exactly one aligned block
        (N // 2, 2 * N),     # spans three blocks
        (0, n),              # whole stream
        (n - 1, 1),          # last sample
        (4 * N, 1234),       # the short tail block
        (123, 0),            # empty range
    ]
    for start, count in cases:
        gl, gr, ghdr = dec.decode_range(bs, start, count)
        assert len(gl) == count and len(gr) == count
        np.testing.assert_array_equal(gl, fl[start : start + count])
        np.testing.assert_array_equal(gr, fr[start : start + count])
        assert ghdr.sample_rate == hdr.sample_rate


def test_mono_and_24bit_ranges():
    for depth, stereo in ((16, False), (24, True)):
        bs, l, r, n = _stream(depth=depth, blocks=2, tail=700, stereo=stereo)
        dec = FrameDecoder()
        fl, fr, _ = dec.decode(bs)
        for start, count in ((0, 50), (N - 3, 10), (n - 700, 700)):
            gl, gr, _ = dec.decode_range(bs, start, count)
            np.testing.assert_array_equal(gl, fl[start : start + count])
            if stereo:
                np.testing.assert_array_equal(gr, fr[start : start + count])
            else:
                assert gr.size == 0


def test_out_of_range_rejected():
    bs, _, _, n = STREAM16
    dec = FrameDecoder()
    for start, count in ((-1, 5), (0, n + 1), (n, 1), (n - 5, 6)):
        with pytest.raises(ValueError):
            dec.decode_range(bs, start, count)


def _payload_byte_of_block(bs, k):
    """Absolute offset of block k's first compressed-payload byte (the
    per-block stereo flag / predictor byte region)."""
    dec = FrameDecoder()
    hdr, br, payload, block_sizes, payload_sizes = dec._parse_frame(bs)
    avail = br.bits_remaining() // 8
    return len(bs) - avail + int(np.sum(payload_sizes[:k], dtype=np.int64))


def test_corruption_outside_range_is_never_read():
    bs, l, r, n = STREAM16
    dec = FrameDecoder()
    fl, fr, _ = dec.decode(bs)
    # stomp block 3's leading byte (stereo flag 0xFF is always invalid);
    # ranges inside blocks 0-2 must still decode
    bad = bytearray(bs)
    pos = _payload_byte_of_block(bs, 3)
    bad[pos] = 0xFF
    bad = bytes(bad)
    gl, gr, _ = dec.decode_range(bad, 0, 2 * N + 17)
    np.testing.assert_array_equal(gl, fl[: 2 * N + 17])
    np.testing.assert_array_equal(gr, fr[: 2 * N + 17])
    # the full decode (and a range touching block 3) must reject it
    with pytest.raises(DecodeError):
        dec.decode(bad)
    with pytest.raises(DecodeError):
        dec.decode_range(bad, 3 * N + 10, 20)
    # python path agrees on both verdicts
    pdec = FrameDecoder(use_native=False)
    pgl, pgr, _ = pdec.decode_range(bad, 0, 2 * N + 17)
    np.testing.assert_array_equal(pgl, gl)
    with pytest.raises(DecodeError):
        pdec.decode_range(bad, 3 * N + 10, 20)


def test_v2_fallback_slices():
    sig = lcg_noise(700, 2500, 3)
    bs = FrameEncoder(12, 0, 44100, 16).encode(sig)
    v2 = bytearray(bs[:10])
    v2[2] = 2
    v2 += (1).to_bytes(4, "big") + (700).to_bytes(4, "big") + bs[22:]
    gl, gr, hdr = FrameDecoder().decode_range(bytes(v2), 100, 50)
    np.testing.assert_array_equal(gl, sig[100:150])
    assert hdr.version == 2

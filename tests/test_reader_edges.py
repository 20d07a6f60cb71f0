"""Adversarial shapes for the native 64-bit windowed Rice reader.

The native decoder reads tokens through an 8-byte big-endian window
(lac_runtime.cpp read_rice_u / read_unary_ones): a single-load fast path
when the whole token fits the window, 64-bit strides for longer unary
runs, and zero-extended tail windows at the end of the buffer. These
tests pin the shapes that stress each regime against the scalar Python
oracle (bitio/reader.py), and spot-check verdicts against the reference
binary (reference: src/codec/bitstream/bit_reader.hpp:140-172).
"""

import subprocess

import numpy as np

from lac_tpu.decoder import DecodeError, FrameDecoder
from lac_tpu.encoder import FrameEncoder


def _verdict(data, backend):
    try:
        left, right, hdr = FrameDecoder(backend=backend).decode(data)
        return ("ok", left, right)
    except DecodeError:
        return ("reject", None, None)


def _assert_backends_agree(data):
    vn = _verdict(data, "native")
    vp = _verdict(data, "python")
    assert vn[0] == vp[0], "native/python verdicts disagree"
    if vn[0] == "ok":
        np.testing.assert_array_equal(vn[1], vp[1])
        if vn[2] is not None or vp[2] is not None:
            np.testing.assert_array_equal(vn[2], vp[2])
    return vn[0]


def _signals():
    """Signals chosen to force extreme Rice token shapes on the wire."""
    n = 6000
    out = {}
    # huge isolated residual spikes -> very long unary runs (q far past
    # one 64-bit window even after k adaptation)
    spikes = np.zeros(n, np.int32)
    spikes[::97] = 32767
    spikes[50::193] = -32768
    out["spikes"] = spikes
    # silence -> zero-run mode + k=0 tokens
    out["zeros"] = np.zeros(n, np.int32)
    # full-scale alternation -> high k, dense remainder bits
    alt = np.empty(n, np.int32)
    alt[0::2] = 32767
    alt[1::2] = -32768
    out["alternate"] = alt
    # one spike in silence near the end -> long run ending at the buffer
    tail = np.zeros(n, np.int32)
    tail[-3] = 30000
    out["tail-spike"] = tail
    # sawtooth with period 64 -> tokens straddle window boundaries at
    # every bit offset as k adapts
    out["saw"] = (np.arange(n, dtype=np.int32) % 64 * 1024) - 32000
    return out


def test_extreme_token_shapes_roundtrip():
    for name, sig in _signals().items():
        enc = FrameEncoder(12, 2, 44100, 16)
        data = enc.encode(sig, np.clip(-sig, -32768, 32767))
        status = _assert_backends_agree(data)
        assert status == "ok", name
        left, right, _ = FrameDecoder(backend="native").decode(data)
        np.testing.assert_array_equal(left, sig)
        np.testing.assert_array_equal(right, np.clip(-sig, -32768, 32767))


def test_truncation_sweep_backends_agree():
    """Every truncation point near the end of the stream: the reader's
    zero-extended tail window must produce the same verdict as the
    byte-exact Python oracle (no accepted-but-different, no crash)."""
    sig = _signals()["spikes"]
    data = FrameEncoder(12, 2, 44100, 16).encode(sig, np.clip(-sig, -32768, 32767))
    for cut in range(max(1, len(data) - 48), len(data)):
        _assert_backends_agree(data[:cut])
    # interior cuts land mid-token in the dense region
    for cut in range(len(data) // 2, len(data) // 2 + 16):
        _assert_backends_agree(data[:cut])


def test_truncation_sweep_vs_reference(tmp_path, reference_cli):
    sig = _signals()["tail-spike"]
    data = FrameEncoder(12, 2, 44100, 16).encode(sig, sig.copy())
    for i, cut in enumerate(range(max(1, len(data) - 24), len(data))):
        mutated = data[:cut]
        lac = str(tmp_path / f"t{i}.lac")
        out = str(tmp_path / f"t{i}.wav")
        open(lac, "wb").write(mutated)
        ref = subprocess.run(
            [reference_cli, "decode", lac, out], capture_output=True, text=True
        )
        ours = _verdict(mutated, "native")
        assert (ours[0] == "ok") == (ref.returncode == 0), f"cut {cut}"


def test_unary_run_bitflip_storm():
    """Bit flips inside the long unary runs of the spike stream: strides
    across 64-bit windows must agree with the oracle bit-for-bit."""
    sig = _signals()["spikes"]
    data = FrameEncoder(12, 2, 44100, 16).encode(sig, np.clip(-sig, -32768, 32767))
    rng = np.random.RandomState(0xB17)
    body_start = min(64, len(data) // 4)
    for _ in range(200):
        pos = rng.randint(body_start, len(data))
        mutated = bytearray(data)
        mutated[pos] ^= 1 << rng.randint(8)
        _assert_backends_agree(bytes(mutated))

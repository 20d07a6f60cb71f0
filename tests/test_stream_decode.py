"""Memory-bounded streaming decode (reference mmap fast path analog,
main.cpp:184-430): chunk-of-blocks native decode streamed straight into
the WAV file must be byte-identical to the in-memory decode + canonical
writer, for every chunk size."""

import pytest

from lac_tpu.decoder import DecodeError, FrameDecoder
from lac_tpu.encoder import FrameEncoder
from lac_tpu.io import write_wav_unchecked_samples
from lac_tpu.runtime.native import native_available

from .signals import lcg_noise, sine


def _reference_wav_bytes(tmp_path, data):
    left, right, hdr = FrameDecoder().decode(data)
    p = tmp_path / "ref.wav"
    assert write_wav_unchecked_samples(
        str(p), left, right, hdr.channels, hdr.sample_rate, hdr.bit_depth
    )
    return p.read_bytes()


@pytest.mark.skipif(not native_available(), reason="native runtime unavailable")
@pytest.mark.parametrize("chunk", ["16384", "40000", str(1 << 22)])
def test_streaming_matches_in_memory_stereo(tmp_path, monkeypatch, chunk):
    n = 16384 * 3 + 500
    left = sine(n, 44100, 220.0, 20000) + lcg_noise(n, 400, 3)
    right = sine(n, 44100, 223.0, 19000) + lcg_noise(n, 400, 4)
    data = FrameEncoder(12, 2, 44100, 16).encode(left, right)

    expected = _reference_wav_bytes(tmp_path, data)
    monkeypatch.setenv("LAC_TPU_DECODE_CHUNK_SAMPLES", chunk)
    out = tmp_path / "stream.wav"
    res = FrameDecoder().decode_to_wav(data, str(out))
    assert res is not None and res[0] == n
    assert out.read_bytes() == expected


@pytest.mark.skipif(not native_available(), reason="native runtime unavailable")
def test_streaming_mono24_odd_padding(tmp_path, monkeypatch):
    # odd data payload (mono 24-bit, odd frame count) exercises the
    # RIFF pad byte after the last streamed chunk
    n = 16384 + 333
    left = sine(n, 48000, 440.0, 0x7FFFF) + lcg_noise(n, 5000, 9)
    data = FrameEncoder(12, 0, 48000, 24).encode(left)

    expected = _reference_wav_bytes(tmp_path, data)
    monkeypatch.setenv("LAC_TPU_DECODE_CHUNK_SAMPLES", "16384")
    out = tmp_path / "stream.wav"
    res = FrameDecoder().decode_to_wav(data, str(out))
    assert res is not None and res[0] == n
    assert out.read_bytes() == expected
    assert len(expected) % 2 == 0  # pad byte present


def test_non_native_fallback_matches(tmp_path):
    n = 5000
    left = lcg_noise(n, 15000, 1)
    right = lcg_noise(n, 15000, 2)
    data = FrameEncoder(12, 2, 44100, 16).encode(left, right)

    expected = _reference_wav_bytes(tmp_path, data)
    out = tmp_path / "fallback.wav"
    res = FrameDecoder(use_native=False).decode_to_wav(data, str(out))
    assert res is not None and res[0] == n
    assert out.read_bytes() == expected


@pytest.mark.skipif(not native_available(), reason="native runtime unavailable")
def test_streaming_rejects_corrupt_block(tmp_path, monkeypatch):
    n = 16384 * 2 + 100
    left = lcg_noise(n, 12000, 5)
    data = bytearray(FrameEncoder(12, 0, 44100, 16).encode(left))
    # corrupt the final block's predictor byte (255 > 2 is rejected,
    # block/decoder.cpp:407-417)
    _, _, _, _, payload_sizes = FrameDecoder()._parse_frame(bytes(data))
    data[len(data) - payload_sizes[-1]] = 0xFF
    monkeypatch.setenv("LAC_TPU_DECODE_CHUNK_SAMPLES", "16384")
    out = tmp_path / "bad.wav"
    with pytest.raises(DecodeError):
        FrameDecoder().decode_to_wav(bytes(data), str(out))


@pytest.mark.skipif(not native_available(), reason="native runtime unavailable")
@pytest.mark.parametrize("depth", [16, 24])
@pytest.mark.parametrize("mode,stereo", [(0, False), (0, True), (1, True), (2, True)])
def test_native_pcm_pack_matrix(tmp_path, depth, mode, stereo):
    """The in-worker PCM pack (lac_decode_v3_to_pcm — blocks write
    interleaved little-endian WAV bytes cache-hot, reference
    main.cpp:150-182 pack semantics) must equal the planes +
    numpy-interleave path bit-for-bit across depth x layout x stereo
    mode."""
    n = 16384 + 777
    amp = 20000 if depth == 16 else 0x500000
    left = sine(n, 44100, 220.0, amp) + lcg_noise(n, amp // 50, 31)
    right = sine(n, 44100, 227.0, amp - 1) + lcg_noise(n, amp // 40, 32)
    enc = FrameEncoder(12, mode if stereo else 0, 44100, depth)
    data = enc.encode(left, right) if stereo else enc.encode(left)

    expected = _reference_wav_bytes(tmp_path, data)
    out = tmp_path / "packed.wav"
    res = FrameDecoder().decode_to_wav(data, str(out))
    assert res is not None and res[0] == n
    assert out.read_bytes() == expected

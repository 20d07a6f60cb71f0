"""Streaming (bounded-memory) encode: byte parity with the in-memory
encoder, WAV-walker equivalence, and roundtrip integrity."""

import numpy as np
import pytest

from lac_tpu.decoder import FrameDecoder
from lac_tpu.encoder import FrameEncoder
from lac_tpu.format import constants as C
from lac_tpu.io import read_wav, write_wav
from lac_tpu.stream import encode_wav_to_lac, scan_wav

from .signals import EMPTY, lcg_noise, sine

B = C.MAX_BLOCK_SIZE


def _mixed_signal(n, seed, amp=24000):
    """Blocks with different characters so chunking crosses real
    decision boundaries (stereo flags, predictors, partitioning)."""
    out = np.zeros(n, np.int32)
    third = n // 3
    out[:third] = sine(third, 44100, 440.0, amp)[:third]
    out[third : 2 * third] = lcg_noise(third, amp // 2, seed)
    # final third: sparse + silence stretches (zero-run territory)
    tail = np.zeros(n - 2 * third, np.int32)
    tail[:: 53] = seed % 700 + 1
    out[2 * third :] = tail
    return out


CASES = [
    # (name, frames, channels, sample_rate, depth, stereo_mode)
    ("auto-5blocks-tail", 5 * B + 1234, 2, 44100, 16, 2),
    ("lr-3blocks", 3 * B, 2, 44100, 16, 0),
    ("ms-2blocks-tail", 2 * B + 7, 2, 48000, 16, 1),
    ("mono-4blocks-tail", 4 * B + 999, 1, 44100, 16, 0),
    ("auto24-3blocks-tail", 3 * B + 321, 2, 96000, 24, 2),
    ("single-partial-block", 5000, 2, 44100, 16, 2),
]


@pytest.mark.parametrize("name,frames,channels,sr,depth,mode", CASES)
def test_stream_matches_monolithic(tmp_path, name, frames, channels, sr, depth, mode):
    amp = 24000 if depth == 16 else 2**22
    left = _mixed_signal(frames, 11, amp)
    right = (
        left + lcg_noise(frames, max(1, amp // 64), 23) if channels == 2 else EMPTY
    )
    if depth == 16:
        right = np.clip(right, -0x8000, 0x7FFF) if channels == 2 else right
    wav = str(tmp_path / f"{name}.wav")
    assert write_wav(wav, left, right, channels, sr, depth)

    out = str(tmp_path / f"{name}.lac")
    nbytes = encode_wav_to_lac(wav, out, mode, chunk_blocks=2)
    assert nbytes is not None

    eff = mode if channels == 2 else 0
    mono = FrameEncoder(12, eff, sr, depth).encode(left, right)
    streamed = open(out, "rb").read()
    assert nbytes == len(streamed)
    assert streamed == mono

    dl, dr, hdr = FrameDecoder().decode(streamed)
    np.testing.assert_array_equal(dl, left)
    if channels == 2:
        np.testing.assert_array_equal(dr, right)


def test_stream_chunk_size_invariance(tmp_path):
    frames = 4 * B + 100
    left = _mixed_signal(frames, 5)
    right = lcg_noise(frames, 9000, 6)
    wav = str(tmp_path / "inv.wav")
    assert write_wav(wav, left, right, 2, 44100, 16)
    outs = []
    for cb in (1, 3, 1000):
        out = str(tmp_path / f"inv-{cb}.lac")
        assert encode_wav_to_lac(wav, out, 2, chunk_blocks=cb)
        outs.append(open(out, "rb").read())
    assert outs[0] == outs[1] == outs[2]


def test_stream_encoder_reuse_and_mismatch(tmp_path):
    left = lcg_noise(B + 50, 8000, 3)
    wav = str(tmp_path / "m.wav")
    assert write_wav(wav, left, EMPTY, 1, 44100, 16)
    enc = FrameEncoder(12, 0, 44100, 16)
    out = str(tmp_path / "m.lac")
    assert encode_wav_to_lac(wav, out, 0, chunk_blocks=1, encoder=enc)
    assert open(out, "rb").read() == enc.encode(left)
    bad = FrameEncoder(12, 0, 48000, 16)
    with pytest.raises(ValueError):
        encode_wav_to_lac(wav, str(tmp_path / "m2.lac"), 0, encoder=bad)


def _wav_mutations(tmp_path):
    """A corpus of valid + malformed WAV byte strings."""
    p = str(tmp_path / "base.wav")
    left = sine(3000, 44100, 440.0, 20000)
    right = sine(3000, 44100, 443.0, 19000)
    assert write_wav(p, left, right, 2, 44100, 16)
    raw = open(p, "rb").read()
    cases = {"valid": raw}
    b = bytearray(raw)
    b[4] ^= 1
    cases["riff-size"] = bytes(b)
    b = bytearray(raw)
    b[8:12] = b"WAVX"
    cases["wave-tag"] = bytes(b)
    b = bytearray(raw)
    b[20] = 3  # audio_format != 1
    cases["format-tag"] = bytes(b)
    b = bytearray(raw)
    b[22] = 5  # channels
    cases["channels"] = bytes(b)
    b = bytearray(raw)
    b[24:28] = (12345).to_bytes(4, "little")  # unsupported rate
    cases["rate"] = bytes(b)
    b = bytearray(raw)
    b[32] = 9  # block_align inconsistent
    cases["align"] = bytes(b)
    cases["truncated"] = raw[: len(raw) // 2]
    cases["tiny"] = raw[:10]
    # data size not a multiple of block_align: shrink data chunk by 1
    b = bytearray(raw)
    dsz = int.from_bytes(b[40:44], "little")
    b[40:44] = (dsz - 1).to_bytes(4, "little")
    b[4:8] = (len(b) - 8 - 1).to_bytes(4, "little")
    cases["data-align"] = bytes(b[:-1])
    # trailing junk chunk that fits (both readers must accept-or-reject alike)
    extra = b"junk" + (4).to_bytes(4, "little") + b"ABCD"
    b = bytearray(raw + extra)
    b[4:8] = (len(b) - 8).to_bytes(4, "little")
    cases["trailing-chunk"] = bytes(b)
    # trailing garbage not covered by a chunk header
    b = bytearray(raw + b"xy")
    b[4:8] = (len(b) - 8).to_bytes(4, "little")
    cases["trailing-garbage"] = bytes(b)
    return cases


def test_scan_wav_matches_read_wav(tmp_path):
    for name, blob in _wav_mutations(tmp_path).items():
        p = str(tmp_path / f"case-{name}.wav")
        open(p, "wb").write(blob)
        scanned = scan_wav(p)
        parsed = read_wav(p)
        assert (scanned is None) == (parsed is None), name
        if scanned is not None:
            left, right, channels, sr, depth = parsed
            assert scanned.frames == len(left)
            assert scanned.channels == channels
            assert scanned.sample_rate == sr
            assert scanned.bit_depth == depth
    assert scan_wav(str(tmp_path / "missing.wav")) is None


def test_stream_rejects_malformed(tmp_path):
    p = str(tmp_path / "bad.wav")
    open(p, "wb").write(b"RIFF\x00\x00\x00\x00WAVE")
    assert encode_wav_to_lac(p, str(tmp_path / "bad.lac")) is None


def test_stream_failure_never_clobbers_output(tmp_path):
    """A mid-encode input failure must leave a pre-existing out_path
    byte-identical and no temp litter (direct-API crash safety)."""
    from lac_tpu.stream import WavReadError

    left = lcg_noise(B + 70, 9000, 41)
    wav = str(tmp_path / "ok.wav")
    assert write_wav(wav, left, EMPTY, 1, 44100, 16)
    info = scan_wav(wav)
    assert info is not None
    # truncate a copy mid-data, but hand over the full-file scan result:
    # the chunked read hits EOF -> WavReadError
    raw = open(wav, "rb").read()
    cut = str(tmp_path / "cut.wav")
    open(cut, "wb").write(raw[: len(raw) - 1000])
    out = str(tmp_path / "out.lac")
    sentinel = b"precious bytes"
    open(out, "wb").write(sentinel)
    with pytest.raises(WavReadError):
        encode_wav_to_lac(cut, out, 0, chunk_blocks=1, info=info)
    assert open(out, "rb").read() == sentinel
    assert [p.name for p in tmp_path.iterdir() if ".tmp-" in p.name] == []


def test_stream_info_param_skips_rescan(tmp_path):
    left = lcg_noise(2 * B, 7000, 8)
    wav = str(tmp_path / "i.wav")
    assert write_wav(wav, left, EMPTY, 1, 44100, 16)
    info = scan_wav(wav)
    out = str(tmp_path / "i.lac")
    nbytes = encode_wav_to_lac(wav, out, 0, chunk_blocks=1, info=info)
    assert nbytes == len(open(out, "rb").read())
    assert open(out, "rb").read() == FrameEncoder(12, 0, 44100, 16).encode(left)


def test_cli_streaming_route(tmp_path):
    """CLI routes big inputs through the streaming encoder when
    LAC_TPU_STREAM_BLOCKS is reached; bytes and message shape are
    identical to the in-memory path."""
    import os
    import subprocess
    import sys

    frames = 3 * B + 500
    left = _mixed_signal(frames, 31)
    right = lcg_noise(frames, 9000, 32)
    wav = str(tmp_path / "in.wav")
    assert write_wav(wav, left, right, 2, 44100, 16)

    def run(env_extra, out):
        env = {**os.environ, "JAX_PLATFORMS": "cpu", **env_extra}
        return subprocess.run(
            [sys.executable, "-m", "lac_tpu.cli", "encode", wav, out],
            capture_output=True, text=True, env=env,
        )

    out_s = str(tmp_path / "s.lac")
    out_m = str(tmp_path / "m.lac")
    rs = run({"LAC_TPU_STREAM_BLOCKS": "2", "LAC_TPU_STREAM_CHUNK_BLOCKS": "2"}, out_s)
    rm = run({"LAC_TPU_STREAM_BLOCKS": "0"}, out_m)
    assert rs.returncode == 0 and rm.returncode == 0, (rs.stderr, rm.stderr)
    assert open(out_s, "rb").read() == open(out_m, "rb").read()
    assert rs.stdout.replace(out_s, "OUT") == rm.stdout.replace(out_m, "OUT")

    # malformed env values fall back to defaults instead of crashing
    out_g = str(tmp_path / "g.lac")
    rg = run({"LAC_TPU_STREAM_BLOCKS": "abc", "LAC_TPU_STREAM_CHUNK_BLOCKS": "zzz"}, out_g)
    assert rg.returncode == 0, rg.stderr
    assert open(out_g, "rb").read() == open(out_m, "rb").read()

"""Scale-limit soak: the format's ceilings exercised for real.

Two layers (reference caps: lac/decoder.cpp:17-23 block-count/total-
samples/decoded-PCM caps, :100-148 table validation and the RIFF-size
guard):

1. Cap-edge rejection differentials (always on): crafted v3 tables
   sitting just past each cap must be rejected by our decoder AND by
   the reference CLI — verdict parity at the ceilings, not just in the
   random fuzz.
2. LAC_TPU_SLOW=1 soaks: a stereo file at EXACTLY the decoded-PCM cap
   (2^27 frames ~ 50.7 min at 44.1 kHz, 1 GiB of int32 channel
   vectors) and a max-rate 192 kHz/24-bit file, stream-encoded and
   stream-decoded with byte parity against the reference CLI and peak
   RSS asserted far below the decoded size.

The RIFF-size guard (decoder.cpp:146-148) is unreachable below the
decoded-PCM cap for every supported depth: wav_data_bytes is at most
(24/32) x decoded_pcm_bytes <= 0.75 GiB, far under the u32 RIFF limit —
mirrored but untestable through the front door, so not soaked here.
"""

import filecmp
import os
import struct
import subprocess
import sys

import numpy as np
import pytest

from lac_tpu.decoder import DecodeError, FrameDecoder
from lac_tpu.format import constants as C
from lac_tpu.format.header import FrameHeader

slow = pytest.mark.skipif(
    os.environ.get("LAC_TPU_SLOW") != "1",
    reason="scale soak (minutes; run with LAC_TPU_SLOW=1)",
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _v3_table_stream(channels, entries, block_count=None):
    """Header + block_count + v3 (size, payload_size) table, no payload.

    Every case here must be rejected DURING table validation, so the
    absent block payloads are never reached.
    """
    hdr = FrameHeader(
        channels=channels, stereo_mode=0 if channels == 1 else 2,
        sample_rate=44100, bit_depth=16,
    )
    out = bytearray(hdr.pack())
    out += struct.pack(">I", len(entries) if block_count is None else block_count)
    for size, payload in entries:
        out += struct.pack(">II", size, payload)
    return bytes(out)


def _assert_both_reject(data, tmp_path, reference_cli, tag):
    with pytest.raises(DecodeError):
        FrameDecoder().decode(data)
    if reference_cli is not None:
        lac = tmp_path / f"{tag}.lac"
        lac.write_bytes(data)
        r = subprocess.run(
            [reference_cli, "decode", str(lac), str(tmp_path / f"{tag}.wav")],
            capture_output=True, text=True,
        )
        assert r.returncode != 0, f"reference accepted {tag}"
        assert "Decode failed" in (r.stderr + r.stdout), (tag, r.stderr)


def test_caps_rejection_differential(tmp_path, reference_cli):
    # block_count = 0 and block_count just past MAX_BLOCK_COUNT reject
    # before any table is read (decoder.cpp:100-102)
    _assert_both_reject(
        _v3_table_stream(2, [], block_count=0), tmp_path, reference_cli, "bc0")
    _assert_both_reject(
        _v3_table_stream(2, [], block_count=C.MAX_BLOCK_COUNT + 1),
        tmp_path, reference_cli, "bc-over")
    # a maximal claimed count with no table bytes: truncated-table rule
    _assert_both_reject(
        _v3_table_stream(2, [], block_count=C.MAX_BLOCK_COUNT),
        tmp_path, reference_cli, "bc-trunc")

    # total-samples cap (10 h @ 192 kHz): the cumulative sum crosses
    # 6,912,000,000 inside the table (entry 421,876 of full blocks);
    # rejected mid-parse by both (decoder.cpp:122-125)
    n_over = C.MAX_TOTAL_SAMPLES // C.MAX_BLOCK_SIZE + 5  # 421,880
    big = _v3_table_stream(1, [(C.MAX_BLOCK_SIZE, 1)] * n_over)
    _assert_both_reject(big, tmp_path, reference_cli, "total-samples")

    # decoded-PCM cap: stereo 2^27 frames is EXACTLY 1 GiB of int32
    # channel vectors (allowed — soaked below); four more samples tips
    # decoded_pcm_bytes over the cap (decoder.cpp:140-144)
    at_cap_frames = C.MAX_DECODED_PCM_BYTES // (2 * 4)
    nfull = at_cap_frames // C.MAX_BLOCK_SIZE
    assert nfull * C.MAX_BLOCK_SIZE == at_cap_frames  # 8192 full blocks
    over = _v3_table_stream(2, [(C.MAX_BLOCK_SIZE, 1)] * nfull + [(4, 1)])
    _assert_both_reject(over, tmp_path, reference_cli, "pcm-over")


def _run_child(code, *argv):
    """Run ``code`` in a fresh CPU-backend child; returns its peak RSS
    in MiB (printed by the child as the last line).

    Linux preserves the RSS high-water mark across fork+execve, so a
    child forked from a fat pytest parent (signal generation below
    peaks ~5.3 GiB of numpy temporaries) starts with ru_maxrss already
    at the parent's resident size. The child resets the mark
    (``echo 5 > /proc/self/clear_refs``, proc(5)) and reports VmHWM so
    the number is the encode/decode's own footprint.
    """
    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           "PYTHONPATH": REPO + os.pathsep + os.environ.get("PYTHONPATH", "")}
    r = subprocess.run([sys.executable, "-c", _RESET_HWM + code + _PRINT_HWM,
                        *map(str, argv)],
                       capture_output=True, text=True, env=env, cwd=REPO)
    assert r.returncode == 0, r.stderr[-4000:]
    return float(r.stdout.strip().splitlines()[-1])


_RESET_HWM = r"""
open("/proc/self/clear_refs", "w").write("5")
"""

_PRINT_HWM = r"""
print(int(next(l for l in open("/proc/self/status")
               if l.startswith("VmHWM")).split()[1]) / 1024)
"""

_ENCODE_CHILD = r"""
import sys
import lac_tpu
from lac_tpu.stream import encode_wav_to_lac
n = encode_wav_to_lac(sys.argv[1], sys.argv[2])
assert n is not None and n > 0
"""

_DECODE_CHILD = r"""
import sys
import lac_tpu
from lac_tpu.decoder import FrameDecoder
res = FrameDecoder().decode_to_wav(open(sys.argv[1], "rb").read(), sys.argv[2])
assert res is not None
"""


def _soak_roundtrip(tmp_path, reference_cli, frames, sr, depth, rss_cap_mib):
    """Stream-encode + stream-decode a stereo file of ``frames`` and
    byte-compare everything against the reference CLI; peak child RSS
    must stay under ``rss_cap_mib``."""
    from lac_tpu.io.wav import write_wav

    lim = 1 << (depth - 1)
    amp = lim // 4
    rng = np.random.default_rng(20260819)
    t = np.arange(frames, dtype=np.float64)
    left = (np.sin(2 * np.pi * 220.0 / sr * t) * amp).astype(np.int64)
    left += rng.integers(-amp // 40, amp // 40, frames)
    right = left // 2 + rng.integers(-amp // 60, amp // 60, frames)
    left = np.clip(left, -lim, lim - 1).astype(np.int32)
    right = np.clip(right, -lim, lim - 1).astype(np.int32)
    del t
    wav = tmp_path / "soak.wav"
    assert write_wav(str(wav), left, right, 2, sr, depth)
    del left, right

    ours = tmp_path / "soak.lac"
    enc_rss = _run_child(_ENCODE_CHILD, wav, ours)
    assert enc_rss < rss_cap_mib, f"encode peak RSS {enc_rss:.0f} MiB"

    ref = tmp_path / "ref.lac"
    r = subprocess.run([reference_cli, "encode", str(wav), str(ref)],
                       capture_output=True)
    assert r.returncode == 0, r.stderr
    # filecmp: the outputs are hundreds of MB — compare without pulling
    # them into this process (fat parents distort later children's RSS)
    assert filecmp.cmp(ours, ref, shallow=False), "encode bytes diverge at scale"

    back = tmp_path / "back.wav"
    dec_rss = _run_child(_DECODE_CHILD, ours, back)
    assert dec_rss < rss_cap_mib, f"decode peak RSS {dec_rss:.0f} MiB"
    assert filecmp.cmp(back, wav, shallow=False), "stream decode WAV diverges"

    ref_back = tmp_path / "refback.wav"
    r = subprocess.run([reference_cli, "decode", str(ref), str(ref_back)],
                       capture_output=True)
    assert r.returncode == 0, r.stderr
    assert filecmp.cmp(ref_back, wav, shallow=False)
    return enc_rss, dec_rss


@slow
def test_soak_pcm_cap_file(tmp_path, reference_cli):
    """2^27 stereo frames at 44.1 kHz/16-bit: EXACTLY the decoded-PCM
    cap (1 GiB int32 vectors, 512 MiB WAV, ~50.7 minutes of audio)."""
    frames = C.MAX_DECODED_PCM_BYTES // (2 * 4)
    enc_rss, dec_rss = _soak_roundtrip(
        tmp_path, reference_cli, frames, 44100, 16, rss_cap_mib=1024)
    print(f"pcm-cap soak: encode rss {enc_rss:.0f} MiB, decode rss {dec_rss:.0f} MiB")


@slow
def test_soak_max_rate_192k_24bit(tmp_path, reference_cli):
    """Max-rate point of the format: 192 kHz / 24-bit stereo, 2 min."""
    _soak_roundtrip(
        tmp_path, reference_cli, 192000 * 120, 192000, 24, rss_cap_mib=1024)

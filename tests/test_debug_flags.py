"""--debug-* observability: flags must print *real* data.

Reference analogs: [stereo-est]/[stereo-mode] (lac/encoder.cpp:356-380),
[debug-lpc] (block/encoder.cpp:824-835), [part-plan]
(block/encoder.cpp:558-582), measured ThreadCollector ids
(main.cpp:699-708). Our reports are parsed from the emitted wire bytes
and from the native pools' worker-id collector — never fabricated.
"""

import re
import subprocess
import sys

import numpy as np
import pytest

from lac_tpu.format import constants as C
from lac_tpu.format.inspect import parse_block_header
from lac_tpu.io import write_wav

from .signals import lcg_noise, sine


def _run_cli(args):
    return subprocess.run(
        [sys.executable, "-m", "lac_tpu.cli", *args],
        capture_output=True, text=True, env=None,
    )


@pytest.fixture()
def stereo_wav(tmp_path):
    n = 50000
    l = (sine(n, 44100, 440, 18000) + lcg_noise(n, 600, 7)).astype(np.int32)
    r = (sine(n, 44100, 443, 17000) + lcg_noise(n, 600, 8)).astype(np.int32)
    p = tmp_path / "in.wav"
    write_wav(str(p), l, r, 2, 44100, 16)
    return str(p)


def test_debug_stereo_est_prints_decisions(stereo_wav, tmp_path):
    out = str(tmp_path / "o.lac")
    r = _run_cli(["encode", stereo_wav, out, "--debug-stereo-est"])
    assert r.returncode == 0
    est = re.findall(r"\[stereo-est\] block=(\d+) uncertain=([01]) chosen=(MS|LR)", r.stderr)
    modes = re.findall(r"\[stereo-mode\] global=2 block=(\d+) mode_used=(MS|LR)", r.stderr)
    nblocks = -(-50000 // C.MAX_BLOCK_SIZE)
    assert len(est) == nblocks and len(modes) == nblocks
    # decisions must be consistent between the two report lines
    for (b1, _, c1), (b2, c2) in zip(est, modes):
        assert b1 == b2 and c1 == c2
    # ...and must match the per-block flag bytes actually on the wire
    data = open(out, "rb").read()
    # frame header 10 bytes + block count u32 + table entries (8 bytes each)
    table_off = 10 + 4
    payload_off = table_off + 8 * nblocks
    pos = payload_off
    off = table_off
    for bi in range(nblocks):
        comp = int.from_bytes(data[off + 4 : off + 8], "big")
        flag = data[pos]
        assert ("MS" if flag == 1 else "LR") == est[bi][2]
        pos += comp
        off += 8
    assert pos == len(data)


def test_debug_lpc_and_partitions_match_wire(stereo_wav, tmp_path):
    out = str(tmp_path / "o.lac")
    r = _run_cli(["encode", stereo_wav, out, "--debug-lpc", "--debug-partitions"])
    assert r.returncode == 0
    lpc_lines = re.findall(
        r"\[debug-lpc\] block=(\d+) chosen_order=(\d+) predictor=(\d+) part_order=(\d+) bytes=(\d+)",
        r.stderr,
    )
    part_lines = re.findall(r"\[part-plan\] block=(\d+) ch=(\d+) order=(\d+) parts=(\d+)", r.stderr)
    nblocks = -(-50000 // C.MAX_BLOCK_SIZE)
    assert len(lpc_lines) == 2 * nblocks  # one per channel payload
    assert len(part_lines) == 2 * nblocks
    # cross-check one reported header against an independent parse
    data = open(out, "rb").read()
    table_off = 10 + 4
    payload_off = table_off + 8 * nblocks
    size0 = int.from_bytes(data[table_off : table_off + 4], "big")
    # first block: flag byte then channel payload
    info = parse_block_header(data[payload_off + 1 :], size0)
    assert info is not None
    assert int(lpc_lines[0][1]) == info["order"]
    assert int(lpc_lines[0][2]) == info["ptype"]
    assert int(lpc_lines[0][3]) == info["partition_order"]


def test_debug_threads_reports_measured_count(stereo_wav, tmp_path):
    out = str(tmp_path / "o.lac")
    r = _run_cli(["encode", stereo_wav, out, "--debug-threads"])
    assert r.returncode == 0
    m = re.search(r"Thread usage: (\d+) threads", r.stdout)
    assert m, r.stdout
    workers = int(m.group(1))
    assert workers >= 1
    # this host exposes cpu_count() cores; the measured count can never
    # exceed hardware concurrency (the old fabricated report could)
    import os

    assert workers <= max(1, (os.cpu_count() or 1))

    back = str(tmp_path / "b.wav")
    r2 = _run_cli(["decode", out, back, "--debug-threads"])
    assert r2.returncode == 0
    m2 = re.search(r"Decoder thread usage: (\d+) threads", r2.stdout)
    assert m2, r2.stdout
    assert int(m2.group(1)) >= 1

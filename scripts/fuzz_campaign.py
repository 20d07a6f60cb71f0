#!/usr/bin/env python
"""Large-scale differential decode-fuzz campaign vs the reference binary.

The suite's fuzz tests (tests/test_fuzz_decode.py) run 180 mutations for
speed; this is the scaled, repeatable form: several base streams
(stereo modes x bit depths x multiblock), thousands of mutations
(bit flips, byte stomps, truncations, garbage tails, and table-targeted
stomps — the v3 block table is the highest-value corruption surface),
each decoded by our native decoder AND the reference CLI. Any
disagreement on the accept/reject verdict, or on decoded PCM when both
accept, fails with a repro line.

Usage:
    python scripts/fuzz_campaign.py [N_MUTATIONS_PER_BASE] [SEED]
Defaults: 400 per base (6 bases -> 2400 total), seed 0.
"""

import pathlib
import subprocess
import sys
import tempfile
import zlib

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
REF = ROOT / ".refbuild" / "lac_cli"

from lac_tpu.decoder import DecodeError, FrameDecoder  # noqa: E402
from lac_tpu.encoder import FrameEncoder  # noqa: E402
from lac_tpu.format import constants as C  # noqa: E402
from lac_tpu.io import read_wav  # noqa: E402


def lcg_noise(n, scale, state=12345):
    out = np.empty(n, dtype=np.int64)
    s = state
    for i in range(n):
        s = (s * 1664525 + 1013904223) & 0xFFFFFFFF
        out[i] = (s % (2 * scale + 1)) - scale
    return out.astype(np.int32)


def make_bases():
    """Six base streams spanning modes, depths, and block counts."""
    t = np.arange(40000, dtype=np.float64)
    tone = (18000 * np.sin(2 * np.pi * 440.0 * t / 44100.0)).astype(np.int32)
    bases = []
    sig16 = (tone[:20000] + lcg_noise(20000, 300, 7)).astype(np.int32)
    bases.append(("auto16", FrameEncoder(12, 2, 44100, 16).encode(
        sig16, (sig16 // 2).copy())))
    bases.append(("lr16", FrameEncoder(12, 0, 48000, 16).encode(
        sig16[:6000], lcg_noise(6000, 2000, 9))))
    bases.append(("ms16", FrameEncoder(12, 1, 44100, 16).encode(
        sig16[:5000], (sig16[:5000] // 3).copy())))
    sig24 = (tone * 200 + lcg_noise(40000, 40000, 11)).clip(
        -(1 << 23), (1 << 23) - 1).astype(np.int32)
    bases.append(("auto24-multiblock", FrameEncoder(12, 2, 96000, 24).encode(
        sig24, (sig24 // 2).copy())))
    bases.append(("mono16-sparse", FrameEncoder(12, 0, 44100, 16).encode(
        (lcg_noise(C.MAX_BLOCK_SIZE + 500, 1, 13)))))
    silence = np.zeros(9000, np.int32)
    silence[::97] = 5
    bases.append(("mono16-zr", FrameEncoder(12, 0, 192000, 16).encode(silence)))
    return bases


def mutations(base: bytes, rng: np.random.RandomState, count: int):
    nb = int.from_bytes(base[C.HEADER_BYTES:C.HEADER_BYTES + 4], "big")
    table_end = C.HEADER_BYTES + 4 + 8 * nb
    for _ in range(count):
        kind = rng.randint(6)
        data = bytearray(base)
        if kind == 0:  # single bit flip anywhere
            pos = rng.randint(len(data))
            data[pos] ^= 1 << rng.randint(8)
        elif kind == 1:  # byte stomp anywhere
            data[rng.randint(len(data))] = rng.randint(256)
        elif kind == 2:  # truncate
            data = data[: rng.randint(1, len(data))]
        elif kind == 3:  # garbage tail
            data += bytes(rng.randint(0, 256, rng.randint(1, 16), dtype=np.uint8))
        elif kind == 4:  # header/table-targeted stomp
            pos = rng.randint(min(table_end + 8, len(data)))
            data[pos] = rng.randint(256)
        else:  # table u32 rewrite (sizes / compressed sizes)
            if nb > 0:
                row = rng.randint(nb)
                col = rng.randint(2)
                off = C.HEADER_BYTES + 4 + 8 * row + 4 * col
                val = int(rng.randint(0, 1 << rng.randint(1, 33)))
                data[off:off + 4] = val.to_bytes(4, "big", signed=False)[-4:]
            else:
                data[rng.randint(len(data))] = rng.randint(256)
        yield bytes(data)


def our_verdict(data):
    try:
        left, right, hdr = FrameDecoder(backend="native").decode(data)
        return ("ok", left, right)
    except DecodeError:
        return ("reject", None, None)


def main():
    per_base = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    if not REF.exists():
        print("reference binary missing; build .refbuild first", file=sys.stderr)
        return 2
    bases = make_bases()
    total = done = accepted = 0
    with tempfile.TemporaryDirectory() as td:
        lac, wav = f"{td}/f.lac", f"{td}/f.wav"
        for name, base in bases:
            # crc32, not hash(): str hashing is process-salted and would
            # break the "same seed = same campaign" repro contract
            rng = np.random.RandomState(
                (seed * 7919 + zlib.crc32(name.encode())) & 0x7FFFFFFF
            )
            for i, mutated in enumerate(mutations(base, rng, per_base)):
                total += 1
                open(lac, "wb").write(mutated)
                ref = subprocess.run([str(REF), "decode", lac, wav],
                                     capture_output=True, text=True)
                ref_ok = ref.returncode == 0
                ours = our_verdict(mutated)
                if (ours[0] == "ok") != ref_ok:
                    print(f"DIVERGENCE base={name} i={i} seed={seed}: "
                          f"reference {'accepted' if ref_ok else 'rejected'}, "
                          f"we {'accepted' if ours[0] == 'ok' else 'rejected'}")
                    return 1
                if ref_ok:
                    accepted += 1
                    got = read_wav(wav)
                    if got is None or not (
                        np.array_equal(ours[1], got[0])
                        and np.array_equal(ours[2], got[1])
                    ):
                        print(f"PCM DIVERGENCE base={name} i={i} seed={seed}")
                        return 1
                    pathlib.Path(wav).unlink()
                done += 1
                if done % 200 == 0:
                    print(f"{done} mutations, verdicts agree "
                          f"({accepted} accepted)", flush=True)
    print(f"fuzz campaign: {total} mutations across {len(bases)} bases, "
          f"all verdicts agree with the reference ({accepted} accepted "
          f"streams PCM-exact)")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""``lac_cli``-compatible command line (main.cpp:593-918).

Same subcommands, flags, env resolution, staged atomic output, message
shapes, and exit codes as the reference CLI:

    lac_cli encode input.wav output.lac [--stereo-mode=lr|ms] [--threads=N]
            [--debug-threads] [--debug-lpc] [--debug-stereo-est] [--debug-zr]
            [--debug-partitions] [--no-partitioning]
    lac_cli decode input.lac output.wav [--threads=N] [--debug-threads]
    lac_cli selftest
"""

import math
import os
import sys
import threading
import time

import numpy as np

from .format import constants as C
from .utils.staged_output import StagedOutputFile, paths_refer_to_same_file
from .utils.threads import parse_thread_limit, parse_threads_flag


def _usage():
    sys.stderr.write("Usage:\n")
    sys.stderr.write(
        "  lac_cli encode input.wav output.lac [--stereo-mode=lr|ms] [--threads=N] "
        "[--debug-threads] [--debug-lpc] [--debug-stereo-est] [--debug-zr] "
        "[--debug-partitions] [--no-partitioning]\n"
    )
    sys.stderr.write("  lac_cli decode input.lac output.wav [--threads=N] [--debug-threads]\n")
    sys.stderr.write("  lac_cli selftest\n")


def _resolve_threads(explicit: int) -> int:
    if explicit > 0:
        return explicit
    return parse_thread_limit(os.environ.get("LAC_THREADS"))


def _encoder_xp():
    """Pick the compute backend: the device planner when an accelerator
    is the default JAX backend (odd-length blocks still take the host
    path — see encoder._GroupJob), else numpy. LAC_TPU_BACKEND=numpy|jax
    overrides."""
    forced = os.environ.get("LAC_TPU_BACKEND")
    if forced == "numpy":
        import numpy

        return numpy
    if forced == "jax":
        import jax.numpy as jnp

        return jnp
    # decide from the environment without initializing a JAX backend
    # (backend init costs seconds per process)
    platforms = os.environ.get("JAX_PLATFORMS", "")
    if platforms and "cpu" in platforms.split(","):
        import numpy

        return numpy
    if platforms:  # an accelerator platform is explicitly requested
        import jax.numpy as jnp

        return jnp
    try:
        import jax

        if jax.default_backend() != "cpu":
            import jax.numpy as jnp

            return jnp
    except Exception:
        pass
    import numpy

    return numpy


def _load_file(path: str):
    try:
        size = os.path.getsize(path)
        if size > C.MAX_LAC_INPUT_BYTES:
            return None
        with open(path, "rb") as f:
            return f.read()
    except OSError:
        return None


# pooled-serving injection (lac_tpu.pool): the batcher pre-reads the
# WAV and plans a file's full blocks inside a shared device wave, then
# replays the ordinary CLI encode with both handed over thread-locally —
# the CLI path (flags, staged output, messages, exit codes) stays the
# single source of truth and the WAV is never read twice.
_inject_tls = threading.local()


def _set_encode_injection(in_path, wav, planes):
    _inject_tls.data = (in_path, wav, planes)


def _pop_encode_injection(in_path):
    d = getattr(_inject_tls, "data", None)
    if d is not None and d[0] == in_path:
        _inject_tls.data = None
        return d
    return None


def _parse_encode_flags(flags_argv):
    """Parse encode trailing flags; returns an options dict or None on a
    bad flag (shared by _cmd_encode and the pooled-serving prescreen so
    the two can never diverge)."""
    opts = {
        "stereo_mode": C.STEREO_PER_BLOCK,
        "partitioning": True,
        "thread_count": 0,
        "debug_threads": False,
        "debug_zr": False,
        "debug_lpc": False,
        "debug_stereo_est": False,
        "debug_partitions": False,
    }
    for flag in flags_argv:
        if flag in ("--debug-threads",):
            opts["debug_threads"] = True
        elif flag == "--debug-zr":
            opts["debug_zr"] = True
        elif flag == "--debug-lpc":
            opts["debug_lpc"] = True
        elif flag == "--debug-stereo-est":
            opts["debug_stereo_est"] = True
        elif flag == "--debug-partitions":
            opts["debug_partitions"] = True
        elif flag == "--no-partitioning":
            opts["partitioning"] = False
        elif flag == "--stereo-mode=lr":
            opts["stereo_mode"] = C.STEREO_LR
        elif flag == "--stereo-mode=ms":
            opts["stereo_mode"] = C.STEREO_MS
        else:
            n = parse_threads_flag(flag)
            if n is None:
                return None
            opts["thread_count"] = n
    return opts


def _cmd_encode(argv) -> int:
    from .encoder import FrameEncoder
    from .io import read_wav

    if len(argv) < 2:
        _usage()
        return 1
    in_path, out_path = argv[0], argv[1]
    if paths_refer_to_same_file(in_path, out_path):
        sys.stderr.write("Input and output paths must be different\n")
        return 1
    opts = _parse_encode_flags(argv[2:])
    if opts is None:
        _usage()
        return 1
    stereo_mode = opts["stereo_mode"]
    partitioning = opts["partitioning"]
    debug_threads = opts["debug_threads"]
    debug_zr = opts["debug_zr"]
    debug_lpc = opts["debug_lpc"]
    debug_stereo_est = opts["debug_stereo_est"]
    debug_partitions = opts["debug_partitions"]
    thread_count = _resolve_threads(opts["thread_count"])

    # bounded-memory routing: inputs at/above LAC_TPU_STREAM_BLOCKS
    # blocks (default 2048 = 33.5M frames) stream chunk-of-blocks at a
    # time instead of loading the whole PCM; output bytes are identical
    # (tests/test_stream_encode.py). Debug flags print per-block data,
    # so they keep the single-pass in-memory path.
    any_debug = debug_zr or debug_lpc or debug_stereo_est or debug_partitions
    # pooled-serving handoff: the batcher already read this WAV and
    # planned its full blocks in a shared device wave — reuse both (a
    # re-read could diverge from the planned planes if the file changed)
    inject = _pop_encode_injection(in_path)
    stream_info = None
    try:
        stream_threshold = int(os.environ.get("LAC_TPU_STREAM_BLOCKS", "2048"))
    except ValueError:
        stream_threshold = 2048
    if inject is None and not any_debug and stream_threshold > 0:
        from .stream import scan_wav

        info = scan_wav(in_path)
        if info is not None and -(-info.frames // C.MAX_BLOCK_SIZE) >= stream_threshold:
            stream_info = info

    if stream_info is not None:
        left = right = None
        channels = stream_info.channels
        sample_rate = stream_info.sample_rate
        bit_depth = stream_info.bit_depth
    elif inject is not None:
        left, right, channels, sample_rate, bit_depth = inject[1]
    else:
        wav = read_wav(in_path)
        if wav is None:
            sys.stderr.write(f"Failed to read WAV: {in_path}\n")
            return 1
        left, right, channels, sample_rate, bit_depth = wav
    effective_mode = 0 if channels == 1 else stereo_mode
    xp = _encoder_xp()
    encoder = FrameEncoder(12, effective_mode, sample_rate, bit_depth, xp=xp)
    encoder.set_partitioning_enabled(partitioning)
    encoder.set_thread_count(thread_count)
    encoder.set_debug_lpc(debug_lpc)
    encoder.set_debug_stereo_est(debug_stereo_est)
    encoder.set_debug_partitions(debug_partitions)
    if inject is not None:
        encoder._injected_planes = inject[2]
    from .encoder import _cold_route
    from .ops._backend import is_jax

    n_in = stream_info.frames if stream_info is not None else len(left)
    if is_jax(xp) and not _cold_route(-(-n_in // C.MAX_BLOCK_SIZE)):
        # product default: shard plan batches over ALL local devices,
        # like the reference saturates every core without an opt-in
        # flag (lac/encoder.cpp:385-435). Bytes are identical to the
        # single-device path by construction; LAC_TPU_MESH=0 opts out.
        # Skipped when the cold route will take the native host planner
        # — counting devices would initialize the accelerator backend,
        # exactly the latency the cold route exists to avoid.
        from .parallel.mesh import default_mesh

        mesh = default_mesh()
        if mesh is not None:
            encoder.set_mesh(mesh)
    if debug_threads:
        from .runtime.native import thread_collector_reset

        thread_collector_reset()
    if stream_info is not None:
        from .stream import WavReadError, encode_wav_to_lac

        with StagedOutputFile(out_path) as staged:
            if not staged.is_ready():
                sys.stderr.write(f"Failed to write LAC file: {out_path}\n")
                return 1
            try:
                nbytes = encode_wav_to_lac(in_path, staged.path(), effective_mode,
                                           encoder=encoder, info=stream_info)
            except WavReadError:
                nbytes = None  # input broke/changed mid-encode: a read failure
            except OSError:
                sys.stderr.write(f"Failed to write LAC file: {out_path}\n")
                return 1
            if nbytes is None:
                sys.stderr.write(f"Failed to read WAV: {in_path}\n")
                return 1
            if not staged.publish(in_path):
                sys.stderr.write(f"Failed to write LAC file: {out_path}\n")
                return 1
        sys.stdout.write(f"Encoded {in_path} -> {out_path} ({nbytes} bytes)\n")
        _report_threads(debug_threads)
        return 0
    bitstream = encoder.encode(left, right)
    if debug_zr:
        baseline = FrameEncoder(12, effective_mode, sample_rate, bit_depth, xp=xp)
        baseline.set_zero_run_enabled(False)
        baseline.set_partitioning_enabled(partitioning)
        baseline.set_thread_count(thread_count)
        baseline_bs = baseline.encode(left, right)
        gain = (1.0 - len(bitstream) / len(baseline_bs)) * 100.0 if baseline_bs else 0.0
        sys.stdout.write(
            f"[debug-zr] baseline_bytes={len(baseline_bs)} zr_bytes={len(bitstream)} gain={gain:g}%\n"
        )

    with StagedOutputFile(out_path) as staged:
        ok = staged.is_ready()
        if ok:
            try:
                with open(staged.path(), "wb") as f:
                    f.write(bitstream)
            except OSError:
                ok = False
        if not ok or not staged.publish(in_path):
            sys.stderr.write(f"Failed to write LAC file: {out_path}\n")
            return 1
    sys.stdout.write(f"Encoded {in_path} -> {out_path} ({len(bitstream)} bytes)\n")
    _report_threads(debug_threads)
    return 0


def _report_threads(debug_threads: bool):
    if not debug_threads:
        return
    from .runtime.native import thread_collector_count

    # measured distinct worker ids from the native pools (reference
    # ThreadCollector, main.cpp:699-708); pure-Python paths run on
    # the calling thread only
    workers = max(1, thread_collector_count())
    sys.stdout.write(f"Thread usage: {workers} threads\n")
    if workers <= 1:
        sys.stdout.write("WARNING: Multi-threading not active (single-threaded execution).\n")


def _cmd_decode(argv) -> int:
    from .decoder import DecodeError, FrameDecoder

    if len(argv) < 2:
        _usage()
        return 1
    in_path, out_path = argv[0], argv[1]
    if paths_refer_to_same_file(in_path, out_path):
        sys.stderr.write("Input and output paths must be different\n")
        return 1
    thread_count = 0
    debug_threads = False
    for flag in argv[2:]:
        if flag == "--debug-threads":
            debug_threads = True
        else:
            n = parse_threads_flag(flag)
            if n is None:
                _usage()
                return 1
            thread_count = n
    thread_count = _resolve_threads(thread_count)

    data = _load_file(in_path)
    if data is None:
        sys.stderr.write(f"Failed to read LAC file: {in_path}\n")
        return 1

    with StagedOutputFile(out_path) as staged:
        if not staged.is_ready():
            sys.stderr.write(f"Failed to write WAV: {out_path}\n")
            return 1
        if debug_threads:
            from .runtime.native import thread_collector_reset

            thread_collector_reset()
        decoder = FrameDecoder()
        decoder.set_thread_count(thread_count)
        try:
            # memory-bounded streaming decode straight into the staged
            # file (reference mmap fast path analog, main.cpp:184-430)
            res = decoder.decode_to_wav(data, staged.path())
        except DecodeError as e:
            sys.stderr.write(f"Decode failed: {str(e).replace('[decode-error] ', '')}\n")
            return 1
        if res is None:
            sys.stderr.write(f"Failed to write WAV: {out_path}\n")
            return 1
        samples_per_channel, hdr = res
        if samples_per_channel == 0:
            sys.stderr.write("Decode failed or produced no samples\n")
            return 1
        if not staged.publish(in_path):
            sys.stderr.write(f"Failed to write WAV: {out_path}\n")
            return 1
    sys.stdout.write(
        f"Decoded {in_path} -> {out_path} ({samples_per_channel} samples per channel)\n"
    )
    if debug_threads:
        from .runtime.native import thread_collector_count

        workers = max(1, thread_collector_count())
        sys.stdout.write(f"Decoder thread usage: {workers} threads\n")
        if workers <= 1:
            sys.stdout.write("WARNING: Decoder multi-threading may not be active.\n")
    return 0


def _cmd_selftest() -> int:
    from .decoder import FrameDecoder
    from .encoder import FrameEncoder

    pcm24_max = 0x7FFFFF

    def generate(sample_rate, bit_depth, frames):
        amp = pcm24_max // 3 if bit_depth == 24 else 30000
        t = np.arange(frames, dtype=np.float64) / sample_rate
        left = (np.sin(2.0 * math.pi * 440.0 * t) * amp).astype(np.int32)
        right = (np.sin(2.0 * math.pi * 443.0 * t) * (amp * 0.95)).astype(np.int32)
        return left, right

    def run_pair(sample_rate, bit_depth) -> bool:
        frames = max(sample_rate // 20, 2048)
        src_l, src_r = generate(sample_rate, bit_depth, frames)
        dec = FrameDecoder()

        bs_lr = FrameEncoder(12, 0, sample_rate, bit_depth).encode(src_l, src_r)
        t0 = time.perf_counter()
        dl, dr, hdr_lr = dec.decode(bs_lr)
        t1 = time.perf_counter()
        if not (np.array_equal(dl, src_l) and np.array_equal(dr, src_r)):
            sys.stderr.write(f"LR roundtrip mismatch for sr={sample_rate} depth={bit_depth}\n")
            return False
        if hdr_lr.sample_rate != sample_rate or hdr_lr.bit_depth != bit_depth:
            sys.stderr.write(f"LR header mismatch sr={hdr_lr.sample_rate} depth={hdr_lr.bit_depth}\n")
            return False

        bs_ms = FrameEncoder(12, 1, sample_rate, bit_depth).encode(src_l, src_r)
        t2 = time.perf_counter()
        dl, dr, hdr_ms = dec.decode(bs_ms)
        t3 = time.perf_counter()
        if not (np.array_equal(dl, src_l) and np.array_equal(dr, src_r)):
            sys.stderr.write(f"MS roundtrip mismatch for sr={sample_rate} depth={bit_depth}\n")
            return False
        if hdr_ms.sample_rate != sample_rate or hdr_ms.bit_depth != bit_depth:
            sys.stderr.write(f"MS header mismatch sr={hdr_ms.sample_rate} depth={hdr_ms.bit_depth}\n")
            return False

        bs_auto = FrameEncoder(12, 2, sample_rate, bit_depth).encode(src_l, src_r)
        dl, dr, hdr_auto = dec.decode(bs_auto)
        if not (np.array_equal(dl, src_l) and np.array_equal(dr, src_r)):
            sys.stderr.write(f"Auto-stereo roundtrip mismatch for sr={sample_rate} depth={bit_depth}\n")
            return False
        if hdr_auto.stereo_mode != 2:
            sys.stderr.write(f"Auto-stereo header mismatch stereo_mode={hdr_auto.stereo_mode}\n")
            return False

        bs_mono = FrameEncoder(12, 0, sample_rate, bit_depth).encode(src_l)
        dl, dr, hdr_mono = dec.decode(bs_mono)
        if not (np.array_equal(dl, src_l) and len(dr) == 0):
            sys.stderr.write(f"Mono roundtrip mismatch for sr={sample_rate} depth={bit_depth}\n")
            return False
        if hdr_mono.channels != 1:
            sys.stderr.write(f"Mono header mismatch channels={hdr_mono.channels}\n")
            return False

        lr_us = int((t1 - t0) * 1e6)
        ms_us = int((t3 - t2) * 1e6)
        smaller = "smaller" if len(bs_ms) < len(bs_lr) else "not smaller"
        sys.stdout.write(
            f"Selftest sr={sample_rate}Hz depth={bit_depth}"
            f" LR={len(bs_lr)} bytes ({lr_us}us decode)"
            f" MS={len(bs_ms)} bytes ({ms_us}us decode)"
            f" -> MS is {smaller}\n"
        )
        return True

    for sr, depth in ((44100, 16), (48000, 24), (96000, 24), (192000, 24)):
        if not run_pair(sr, depth):
            return 1
    sys.stdout.write("Selftest complete: adaptive block tests passed.\n")
    return 0


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    try:
        if not argv:
            _usage()
            return 1
        mode = argv[0]
        if mode == "encode":
            if len(argv) < 3:
                _usage()
                return 1
            return _cmd_encode(argv[1:])
        if mode == "decode":
            if len(argv) < 3:
                _usage()
                return 1
            return _cmd_decode(argv[1:])
        if mode == "selftest":
            return _cmd_selftest()
        _usage()
        return 1
    except Exception as e:  # noqa: BLE001 — CLI boundary (main.cpp:914-917)
        sys.stderr.write(f"Error: {e}\n")
        return 1


if __name__ == "__main__":
    sys.exit(main())

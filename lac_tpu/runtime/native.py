"""ctypes loader for the native runtime (lac_runtime.cpp).

The shared library is built lazily with g++ on first use and cached in
``runtime/build/`` keyed by a source hash; pure-Python fallbacks keep
everything working when no compiler is available
(``LAC_TPU_NO_NATIVE=1`` disables it explicitly).
"""

import ctypes
import hashlib
import os
import pathlib
import subprocess
import threading

import numpy as np

_HERE = pathlib.Path(__file__).resolve().parent
_SRC = _HERE / "src" / "lac_runtime.cpp"
_BUILD = _HERE / "build"

_lock = threading.Lock()
_lib = None
_tried = False


def _build_library():
    src = _SRC.read_bytes()
    tag = hashlib.sha256(src).hexdigest()[:16]
    # LAC_TPU_SANITIZE=1 builds the runtime under ASan+UBSan (the
    # reference runs its whole suite sanitized, ci.yml:79-101). The
    # sanitized .so needs libasan/libubsan preloaded into the host
    # process: LD_PRELOAD="$(g++ -print-file-name=libasan.so) $(g++
    # -print-file-name=libubsan.so)" ASAN_OPTIONS=detect_leaks=0.
    sanitize = os.environ.get("LAC_TPU_SANITIZE") == "1"
    if sanitize:
        tag += "-san"
    out = _BUILD / f"lac_runtime-{tag}.so"
    if out.exists():
        return out
    _BUILD.mkdir(exist_ok=True)
    tmp = out.with_suffix(".so.tmp")
    if sanitize:
        opts = [
            "-O1", "-g", "-fno-omit-frame-pointer",
            "-fsanitize=address,undefined", "-fno-sanitize-recover=all",
        ]
    else:
        opts = ["-O3", "-march=native"]
    cmd = [
        "g++", *opts, "-std=c++17", "-shared", "-fPIC",
        "-pthread", str(_SRC), "-o", str(tmp),
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(tmp, out)
    return out


def get_native():
    """Return the loaded ctypes library or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("LAC_TPU_NO_NATIVE") == "1":
            return None
        try:
            path = _build_library()
            lib = ctypes.CDLL(str(path))
        except Exception:
            return None
        u64p = ctypes.POINTER(ctypes.c_uint64)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.lac_decode_v3_blocks.restype = ctypes.c_int
        lib.lac_decode_v3_blocks.argtypes = [
            u8p, u64p, u64p, u32p, u64p,
            ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32,
            i32p, i32p, ctypes.c_int32,
        ]
        lib.lac_decode_v3_to_pcm.restype = ctypes.c_int
        lib.lac_decode_v3_to_pcm.argtypes = [
            u8p, u64p, u64p, u32p, u64p,
            ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32,
            u8p, ctypes.c_int32,
        ]
        lib.lac_decode_v2_stream.restype = ctypes.c_int
        lib.lac_decode_v2_stream.argtypes = [
            u8p, ctypes.c_uint64, u32p, u64p,
            ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32,
            i32p, i32p,
        ]
        lib.lac_pack_bits.restype = ctypes.c_uint64
        lib.lac_pack_bits.argtypes = [u64p, u8p, ctypes.c_uint64]
        lib.lac_pack_stream.restype = ctypes.c_uint64
        lib.lac_pack_stream.argtypes = [u64p, u64p, u8p, ctypes.c_uint64, u8p, ctypes.c_uint64]
        i16p = ctypes.POINTER(ctypes.c_int16)
        lib.lac_emit_blocks.restype = ctypes.c_int
        lib.lac_emit_blocks.argtypes = [
            i32p, ctypes.c_uint32, ctypes.c_uint32,
            u8p, u8p, i16p, u8p, u8p, u8p,
            u8p, ctypes.c_uint64, u64p, ctypes.c_int32,
        ]
        vp = ctypes.c_void_p
        lib.lac_emit_blocks_planes.restype = ctypes.c_int
        lib.lac_emit_blocks_planes.argtypes = [
            vp, vp, ctypes.c_uint32, ctypes.c_uint32,
            i32p, u8p, u8p, u32p,
            ctypes.c_uint32, ctypes.c_uint32,
            u8p, u8p, i16p, u8p, u8p, u8p,
            u8p, ctypes.c_uint64, u64p, ctypes.c_int32,
        ]
        lib.lac_tokenize_v3_blocks.restype = ctypes.c_int
        lib.lac_tokenize_v3_blocks.argtypes = [
            u8p, u64p, u64p, u32p, u64p,
            ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32,
            i32p, ctypes.c_uint64, u8p, u8p, i16p, u8p, ctypes.c_int32,
        ]
        lib.lac_pack_streams_sizes.restype = None
        lib.lac_pack_streams_sizes.argtypes = [u32p, u8p, u64p, ctypes.c_uint32, u64p]
        lib.lac_pack_streams.restype = None
        lib.lac_pack_streams.argtypes = [u32p, u32p, u8p, u64p, ctypes.c_uint32, u8p, u64p, ctypes.c_int32]
        lib.lac_stereo_estimate.restype = None
        lib.lac_stereo_estimate.argtypes = [
            i32p, i32p, ctypes.c_uint32, ctypes.c_uint32, u8p, u8p, ctypes.c_int32,
        ]
        i8p = ctypes.POINTER(ctypes.c_int8)
        lib.lac_plan_blocks.restype = ctypes.c_int
        lib.lac_plan_blocks.argtypes = [
            i32p, ctypes.c_uint32, ctypes.c_uint32,
            i16p, u8p, ctypes.c_uint32, ctypes.c_uint32,
            i8p, ctypes.c_int32,
        ]
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.lac_autocorr.restype = ctypes.c_int
        lib.lac_autocorr.argtypes = [
            i32p, ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32,
            i64p, ctypes.c_int32,
        ]
        lib.lac_thread_collector_reset.restype = None
        lib.lac_thread_collector_reset.argtypes = []
        lib.lac_thread_collector_count.restype = ctypes.c_uint64
        lib.lac_thread_collector_count.argtypes = []
        lib.lac_tokenize_static_rice.restype = ctypes.c_int
        lib.lac_tokenize_static_rice.argtypes = [
            u8p, ctypes.c_uint64, u32p, u64p,
            ctypes.c_uint32, ctypes.c_uint32, i32p,
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return get_native() is not None


def thread_collector_reset() -> None:
    """Clear the native pools' measured worker-id set (reference
    ThreadCollector analog, thread_collector.hpp:8-23)."""
    lib = get_native()
    if lib is not None:
        lib.lac_thread_collector_reset()


def thread_collector_count() -> int:
    """Distinct worker threads observed by native pools since the last
    reset; 0 when no native pool ran (callers treat that as 1 serial
    host worker)."""
    lib = get_native()
    return int(lib.lac_thread_collector_count()) if lib is not None else 0


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def pack_stream_native(unary, field_val, field_len):
    """Native element-stream packer; returns bytes or None if unavailable."""
    lib = get_native()
    if lib is None:
        return None
    unary = np.ascontiguousarray(unary, dtype=np.uint64)
    field_val = np.ascontiguousarray(field_val, dtype=np.uint64)
    field_len = np.ascontiguousarray(field_len, dtype=np.uint8)
    count = len(unary)
    if count == 0:
        return b""
    total_bits = lib.lac_pack_bits(_ptr(unary, ctypes.c_uint64), _ptr(field_len, ctypes.c_uint8), count)
    nbytes = (int(total_bits) + 7) // 8
    out = np.zeros(nbytes, dtype=np.uint8)
    wrote = lib.lac_pack_stream(
        _ptr(unary, ctypes.c_uint64),
        _ptr(field_val, ctypes.c_uint64),
        _ptr(field_len, ctypes.c_uint8),
        count,
        _ptr(out, ctypes.c_uint8),
        nbytes,
    )
    if int(wrote) != nbytes:
        return None
    return out.tobytes()


def pack_streams_native(unary, field_val, field_len, elem_offsets, num_threads=0):
    """Pack a batch of element streams; returns list of bytes or None.

    ``unary``/``field_val``: uint32, ``field_len``: uint8, concatenated
    across streams; ``elem_offsets``: (S+1,) uint64 element boundaries.
    """
    lib = get_native()
    if lib is None:
        return None
    unary = np.ascontiguousarray(unary, dtype=np.uint32)
    field_val = np.ascontiguousarray(field_val, dtype=np.uint32)
    field_len = np.ascontiguousarray(field_len, dtype=np.uint8)
    elem_offsets = np.ascontiguousarray(elem_offsets, dtype=np.uint64)
    S = len(elem_offsets) - 1
    sizes = np.zeros(S, dtype=np.uint64)
    lib.lac_pack_streams_sizes(
        _ptr(unary, ctypes.c_uint32), _ptr(field_len, ctypes.c_uint8),
        _ptr(elem_offsets, ctypes.c_uint64), S, _ptr(sizes, ctypes.c_uint64),
    )
    out_offsets = np.zeros(S + 1, dtype=np.uint64)
    np.cumsum(sizes, out=out_offsets[1:])
    out = np.zeros(int(out_offsets[-1]), dtype=np.uint8)
    lib.lac_pack_streams(
        _ptr(unary, ctypes.c_uint32), _ptr(field_val, ctypes.c_uint32),
        _ptr(field_len, ctypes.c_uint8), _ptr(elem_offsets, ctypes.c_uint64),
        S, _ptr(out, ctypes.c_uint8), _ptr(out_offsets, ctypes.c_uint64), num_threads,
    )
    raw = out.tobytes()
    return [raw[int(out_offsets[i]) : int(out_offsets[i + 1])] for i in range(S)]


def emit_blocks_native(pcm, ptype, order, coeffs, best_p, modes, ks, num_threads=0):
    """Replay a chosen encode plan to per-lane wire payloads.

    ``pcm``: (B, n) int32; plan arrays as produced by the planner (modes
    and ks padded to 256 columns). Returns list of payload bytes or None
    when the native library is unavailable.
    """
    lib = get_native()
    if lib is None:
        return None
    pcm = np.ascontiguousarray(pcm, dtype=np.int32)
    B, n = pcm.shape
    ptype = np.ascontiguousarray(ptype, dtype=np.uint8)
    order = np.ascontiguousarray(order, dtype=np.uint8)
    coeffs = np.ascontiguousarray(coeffs, dtype=np.int16)
    best_p = np.ascontiguousarray(best_p, dtype=np.uint8)
    modes = np.ascontiguousarray(modes, dtype=np.uint8)
    ks = np.ascontiguousarray(ks, dtype=np.uint8)
    lane_cap = n * 6 + 4096
    while True:
        out = np.zeros((B, lane_cap), dtype=np.uint8)
        sizes = np.zeros(B, dtype=np.uint64)
        status = lib.lac_emit_blocks(
            _ptr(pcm, ctypes.c_int32), B, n,
            _ptr(ptype, ctypes.c_uint8), _ptr(order, ctypes.c_uint8), _ptr(coeffs, ctypes.c_int16),
            _ptr(best_p, ctypes.c_uint8), _ptr(modes, ctypes.c_uint8), _ptr(ks, ctypes.c_uint8),
            _ptr(out, ctypes.c_uint8), lane_cap, _ptr(sizes, ctypes.c_uint64), num_threads,
        )
        if status == 0:
            return [out[b, : int(sizes[b])].tobytes() for b in range(B)]
        lane_cap *= 4  # pathological unary runs: retry with more room
        if lane_cap > (1 << 31):
            return None


def stereo_estimate_native(left, right, num_threads=0):
    """Per-block stereo proxy decisions for full-valid (B, n) planes
    (ops/stereo.estimate_stereo_mode semantics). Returns
    (choose_ms, uncertain) bool arrays or None when unavailable."""
    lib = get_native()
    if lib is None:
        return None
    left = np.ascontiguousarray(left, dtype=np.int32)
    right = np.ascontiguousarray(right, dtype=np.int32)
    B, n = left.shape
    cm = np.zeros(B, np.uint8)
    un = np.zeros(B, np.uint8)
    lib.lac_stereo_estimate(
        _ptr(left, ctypes.c_int32), _ptr(right, ctypes.c_int32), B, n,
        _ptr(cm, ctypes.c_uint8), _ptr(un, ctypes.c_uint8), num_threads,
    )
    return cm.astype(bool), un.astype(bool)


def plan_blocks_native(pcm, lpc_coeffs, lpc_valid, zero_run_enabled,
                       partitioning_enabled, num_threads=0):
    """Native block planner: (B, n) pcm + LPC candidates -> compact meta
    rows identical to ``encoder.plan_group(emit_fields=False)["meta"]``
    ((B, 3 + 2*max_parts) int8). Returns None when unavailable."""
    from ..format.partitions import max_partition_order_for_block
    from ..format import constants as C

    lib = get_native()
    if lib is None:
        return None
    pcm = np.ascontiguousarray(pcm, dtype=np.int32)
    B, n = pcm.shape
    lpc_coeffs = np.ascontiguousarray(lpc_coeffs, dtype=np.int16)
    lpc_valid = np.ascontiguousarray(lpc_valid, dtype=np.uint8)
    max_p = (
        max_partition_order_for_block(n)
        if (partitioning_enabled and n >= C.MIN_PARTITION_SIZE)
        else 0
    )
    meta = np.zeros((B, 3 + 2 * (1 << max_p)), dtype=np.int8)
    status = lib.lac_plan_blocks(
        _ptr(pcm, ctypes.c_int32), B, n,
        _ptr(lpc_coeffs, ctypes.c_int16), _ptr(lpc_valid, ctypes.c_uint8),
        1 if zero_run_enabled else 0, 1 if partitioning_enabled else 0,
        _ptr(meta, ctypes.c_int8), num_threads,
    )
    if status != 0:
        return None
    return meta


def autocorr_native(pcm, max_order=12, num_threads=0):
    """Exact int64 autocorrelation lags 0..max_order per lane, AVX-512
    8-wide MACs (the host twin of ops/lpc.py autocorrelation; reference
    lpc.cpp:80-96). Avoids numpy's (B, n) int64 temporaries on the
    one-shot CLI path. Returns (B, max_order+1) int64, or None when the
    native runtime is unavailable."""
    lib = get_native()
    if lib is None:
        return None
    pcm = np.ascontiguousarray(pcm, dtype=np.int32)
    B, n = pcm.shape
    out = np.empty((B, max_order + 1), dtype=np.int64)
    status = lib.lac_autocorr(
        _ptr(pcm, ctypes.c_int32), B, n, max_order,
        _ptr(out, ctypes.c_int64), num_threads,
    )
    if status != 0:
        return None
    return out


def emit_blocks_planes_native(lview, rview, rows, variants, slots, starts, n,
                              ptype, order, coeffs, best_p, modes, ks, num_threads=0):
    """Plane-derived plan replay: lanes are (row, variant, slot, start)
    views into the resident channel planes; M/S derivation happens
    in-cache in C++. Returns list of payload bytes or None."""
    lib = get_native()
    if lib is None:
        return None
    lview = np.ascontiguousarray(lview)
    assert lview.dtype in (np.int16, np.int32)
    rview = np.ascontiguousarray(rview) if rview is not None else lview
    B = len(rows)
    rows = np.ascontiguousarray(rows, dtype=np.int32)
    variants = np.ascontiguousarray(variants, dtype=np.uint8)
    slots = np.ascontiguousarray(slots, dtype=np.uint8)
    starts = np.ascontiguousarray(starts, dtype=np.uint32)
    ptype = np.ascontiguousarray(ptype, dtype=np.uint8)
    order = np.ascontiguousarray(order, dtype=np.uint8)
    coeffs = np.ascontiguousarray(coeffs, dtype=np.int16)
    best_p = np.ascontiguousarray(best_p, dtype=np.uint8)
    modes = np.ascontiguousarray(modes, dtype=np.uint8)
    ks = np.ascontiguousarray(ks, dtype=np.uint8)
    lane_cap = n * 6 + 4096
    while True:
        out = np.zeros((B, lane_cap), dtype=np.uint8)
        sizes = np.zeros(B, dtype=np.uint64)
        status = lib.lac_emit_blocks_planes(
            lview.ctypes.data_as(ctypes.c_void_p),
            rview.ctypes.data_as(ctypes.c_void_p),
            lview.dtype.itemsize, lview.shape[-1],
            _ptr(rows, ctypes.c_int32), _ptr(variants, ctypes.c_uint8),
            _ptr(slots, ctypes.c_uint8), _ptr(starts, ctypes.c_uint32),
            B, n,
            _ptr(ptype, ctypes.c_uint8), _ptr(order, ctypes.c_uint8), _ptr(coeffs, ctypes.c_int16),
            _ptr(best_p, ctypes.c_uint8), _ptr(modes, ctypes.c_uint8), _ptr(ks, ctypes.c_uint8),
            _ptr(out, ctypes.c_uint8), lane_cap, _ptr(sizes, ctypes.c_uint64), num_threads,
        )
        if status == 0:
            return [out[b, : int(sizes[b])].tobytes() for b in range(B)]
        lane_cap *= 4
        if lane_cap > (1 << 31):
            return None


def tokenize_v3_blocks_native(payload, payload_offsets, payload_sizes, block_sizes,
                              sample_offsets, channels, stereo_mode, total_samples,
                              num_threads=0):
    """Tokenize v3 blocks -> (residual planes (C, total), ptype, order,
    coeffs, ms_flags). Raises ValueError on a bad block; None if the
    native library is unavailable."""
    lib = get_native()
    if lib is None:
        return None
    payload = np.frombuffer(payload, dtype=np.uint8)
    po = np.ascontiguousarray(payload_offsets, dtype=np.uint64)
    ps = np.ascontiguousarray(payload_sizes, dtype=np.uint64)
    bs = np.ascontiguousarray(block_sizes, dtype=np.uint32)
    so = np.ascontiguousarray(sample_offsets, dtype=np.uint64)
    nb = len(bs)
    res = np.zeros((channels, total_samples), dtype=np.int32)
    ptype = np.zeros(nb * channels, dtype=np.uint8)
    order = np.zeros(nb * channels, dtype=np.uint8)
    coeffs = np.zeros((nb * channels, 33), dtype=np.int16)
    msflag = np.zeros(nb, dtype=np.uint8)
    status = lib.lac_tokenize_v3_blocks(
        _ptr(payload, ctypes.c_uint8), _ptr(po, ctypes.c_uint64), _ptr(ps, ctypes.c_uint64),
        _ptr(bs, ctypes.c_uint32), _ptr(so, ctypes.c_uint64),
        nb, channels, stereo_mode,
        _ptr(res, ctypes.c_int32), total_samples,
        _ptr(ptype, ctypes.c_uint8), _ptr(order, ctypes.c_uint8),
        _ptr(coeffs, ctypes.c_int16), _ptr(msflag, ctypes.c_uint8), num_threads,
    )
    if status != 0:
        raise ValueError(f"block={-status - 1}")
    return res, ptype.reshape(nb, channels), order.reshape(nb, channels), coeffs.reshape(nb, channels, 33), msflag


def decode_v3_blocks_native(payload, payload_offsets, payload_sizes, block_sizes,
                            sample_offsets, channels, stereo_mode, bit_depth,
                            total_samples, num_threads=0):
    """Native parallel v3 block decode.

    Returns (left, right) int32 arrays, raises ValueError on a bad block,
    or returns None when the native library is unavailable.
    """
    lib = get_native()
    if lib is None:
        return None
    payload = np.frombuffer(payload, dtype=np.uint8)
    po = np.ascontiguousarray(payload_offsets, dtype=np.uint64)
    ps = np.ascontiguousarray(payload_sizes, dtype=np.uint64)
    bs = np.ascontiguousarray(block_sizes, dtype=np.uint32)
    so = np.ascontiguousarray(sample_offsets, dtype=np.uint64)
    left = np.zeros(total_samples, dtype=np.int32)
    right = np.zeros(total_samples if channels == 2 else 0, dtype=np.int32)
    status = lib.lac_decode_v3_blocks(
        _ptr(payload, ctypes.c_uint8),
        _ptr(po, ctypes.c_uint64),
        _ptr(ps, ctypes.c_uint64),
        _ptr(bs, ctypes.c_uint32),
        _ptr(so, ctypes.c_uint64),
        len(bs), channels, stereo_mode, bit_depth,
        _ptr(left, ctypes.c_int32),
        _ptr(right, ctypes.c_int32) if channels == 2 else _ptr(left, ctypes.c_int32),
        num_threads,
    )
    if status != 0:
        raise ValueError(f"block={-status - 1}")
    return left, right


def decode_v3_to_pcm_native(payload, payload_offsets, payload_sizes, block_sizes,
                            sample_offsets, channels, stereo_mode, bit_depth,
                            total_samples, num_threads=0):
    """Native parallel v3 decode straight into interleaved little-endian
    WAV PCM bytes (the reference CLI's mmap fast-path analog,
    main.cpp:184-430): blocks pack cache-hot inside the decode workers,
    skipping the whole-file int32 planes and the host interleave pass.

    Returns a uint8 array of ``total_samples * block_align`` bytes,
    raises ValueError on a bad block, or returns None when the native
    library is unavailable.
    """
    lib = get_native()
    if lib is None:
        return None
    payload = np.frombuffer(payload, dtype=np.uint8)
    po = np.ascontiguousarray(payload_offsets, dtype=np.uint64)
    ps = np.ascontiguousarray(payload_sizes, dtype=np.uint64)
    bs = np.ascontiguousarray(block_sizes, dtype=np.uint32)
    so = np.ascontiguousarray(sample_offsets, dtype=np.uint64)
    out = np.empty(total_samples * channels * (bit_depth // 8), dtype=np.uint8)
    status = lib.lac_decode_v3_to_pcm(
        _ptr(payload, ctypes.c_uint8),
        _ptr(po, ctypes.c_uint64),
        _ptr(ps, ctypes.c_uint64),
        _ptr(bs, ctypes.c_uint32),
        _ptr(so, ctypes.c_uint64),
        len(bs), channels, stereo_mode, bit_depth,
        _ptr(out, ctypes.c_uint8),
        num_threads,
    )
    if status != 0:
        raise ValueError(f"block={-status - 1}")
    return out


def decode_v2_stream_native(payload, block_sizes, sample_offsets, channels,
                            stereo_mode, bit_depth, total_samples):
    """Native serial v2 legacy-stream decode (lac/decoder.cpp:209-218).

    Returns (left, right) int32 arrays, raises ValueError with
    ``block=<i>`` on a bad block or ``trailing`` on leftover payload, or
    returns None when the native library is unavailable.
    """
    lib = get_native()
    if lib is None:
        return None
    payload = np.frombuffer(payload, dtype=np.uint8)
    bs = np.ascontiguousarray(block_sizes, dtype=np.uint32)
    so = np.ascontiguousarray(sample_offsets, dtype=np.uint64)
    left = np.zeros(total_samples, dtype=np.int32)
    right = np.zeros(total_samples if channels == 2 else 0, dtype=np.int32)
    status = lib.lac_decode_v2_stream(
        _ptr(payload, ctypes.c_uint8), len(payload),
        _ptr(bs, ctypes.c_uint32), _ptr(so, ctypes.c_uint64),
        len(bs), channels, stereo_mode, bit_depth,
        _ptr(left, ctypes.c_int32),
        _ptr(right, ctypes.c_int32) if channels == 2 else _ptr(left, ctypes.c_int32),
    )
    if status > 0:
        raise ValueError("trailing")
    if status != 0:
        raise ValueError(f"block={-status - 1}")
    return left, right


def tokenize_static_rice_native(payloads, ks, nbits, count):
    """Parse ``count`` static-k Rice tokens per lane with the product
    reader (benchmark twin for ops/device_reader.py). ``payloads``:
    (L, NBY) uint8; returns (L, count) int32 residuals, or None when
    the native library is unavailable. Raises ValueError on a short or
    malformed lane."""
    lib = get_native()
    if lib is None:
        return None
    pay = np.ascontiguousarray(payloads, dtype=np.uint8)
    ks = np.ascontiguousarray(ks, dtype=np.uint32)
    nb = np.ascontiguousarray(nbits, dtype=np.uint64)
    L = pay.shape[0]
    out = np.empty((L, int(count)), dtype=np.int32)
    status = lib.lac_tokenize_static_rice(
        _ptr(pay, ctypes.c_uint8), pay.shape[1], _ptr(ks, ctypes.c_uint32),
        _ptr(nb, ctypes.c_uint64), L, int(count), _ptr(out, ctypes.c_int32),
    )
    if status != 0:
        raise ValueError(f"lane={-status - 1}")
    return out

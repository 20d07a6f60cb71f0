"""Env-gated debug tracing (reference utils/logger.hpp:5-53).

``LAC_TRACE``, ``LAC_DEBUG_ZR``, ``LAC_DEBUG_PART`` enable stderr
diagnostics; all checks collapse to constant False when unset so the
hot path pays nothing. The CLI's ``--debug-*`` flags additionally route
per-stage summaries through :func:`debug_log`.
"""

import contextlib
import os
import sys
import time

_TRACE = os.environ.get("LAC_TRACE") not in (None, "", "0")
_DEBUG_ZR = os.environ.get("LAC_DEBUG_ZR") not in (None, "", "0")
_DEBUG_PART = os.environ.get("LAC_DEBUG_PART") not in (None, "", "0")
_TIMING = os.environ.get("LAC_TPU_TIMING") not in (None, "", "0")


def trace_enabled() -> bool:
    return _TRACE


def debug_zr_enabled() -> bool:
    return _DEBUG_ZR


def debug_part_enabled() -> bool:
    return _DEBUG_PART


def debug_log(msg: str) -> None:
    sys.stderr.write(msg if msg.endswith("\n") else msg + "\n")


def trace(msg: str) -> None:
    if _TRACE:
        debug_log("[lac-trace] " + msg)


# --------------------------------------------------------------- phase timing
# LAC_TPU_TIMING=1 accumulates wall-clock per encode pipeline phase and
# prints one summary line per frame encode. Zero cost when unset.

_phase_acc = {}


def timing_enabled() -> bool:
    return _TIMING


def timing_reset() -> None:
    _phase_acc.clear()


@contextlib.contextmanager
def phase(name: str):
    if not _TIMING:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _phase_acc[name] = _phase_acc.get(name, 0.0) + time.perf_counter() - t0


def timing_report(label: str) -> None:
    if _TIMING and _phase_acc:
        parts = " ".join(
            f"{k}={v:.2f}s" for k, v in sorted(_phase_acc.items(), key=lambda kv: -kv[1])
        )
        debug_log(f"[lac-timing] {label}: {parts} (sum {sum(_phase_acc.values()):.2f}s)")


# ------------------------------------------------------------ jax profiler
# LAC_TPU_PROFILE=<dir> wraps each frame encode/decode in a
# jax.profiler trace (viewable with tensorboard / xprof). The SURVEY §5
# tracing plan: keep the reference's env-gated flags, add device-level
# profiling the reference never had.

_PROFILE_DIR = os.environ.get("LAC_TPU_PROFILE") or ""


@contextlib.contextmanager
def device_trace():
    if not _PROFILE_DIR:
        yield
        return
    import jax

    with jax.profiler.trace(_PROFILE_DIR):
        yield

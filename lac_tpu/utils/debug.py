"""Env-gated debug tracing (reference utils/logger.hpp:5-53).

``LAC_TRACE``, ``LAC_DEBUG_ZR``, ``LAC_DEBUG_PART`` enable stderr
diagnostics; all checks collapse to constant False when unset so the
hot path pays nothing. The CLI's ``--debug-*`` flags additionally route
per-stage summaries through :func:`debug_log`.
"""

import os
import sys

_TRACE = os.environ.get("LAC_TRACE") not in (None, "", "0")
_DEBUG_ZR = os.environ.get("LAC_DEBUG_ZR") not in (None, "", "0")
_DEBUG_PART = os.environ.get("LAC_DEBUG_PART") not in (None, "", "0")


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

"""lac_tpu — TPU-native batch lossless audio codec.

A ground-up JAX/XLA/Pallas re-architecture of the LAC codec
(reference: audexdev/Lossless-Audio-Codec, C++20 CLI). Produces
byte-identical ``.lac`` v3 bitstreams while replacing the reference's
per-sample serial algorithms with batched TPU array programs:

* all candidate residuals, cost models, and Rice k-adaptation are
  computed as prefix-sum / sliding-window closed forms over thousands
  of blocks in flight (no per-sample feedback loop exists in the
  format's adaptation rule — see ``lac_tpu.ops.adapt``);
* bit emission is a prefix-sum + scatter bitpack over token arrays,
  or a native plan-replay when the C++ runtime is available;
* decode parses independent v3 block payloads in parallel and
  reconstructs PCM with batched restores.

Wire-format behavior is cited into the reference as ``file:line`` so
parity can be audited (e.g. docs/format.md, src/codec/block/encoder.cpp).

JAX is configured lazily (``configure_jax``) so pure-host paths — the
CLI decoder, WAV tools — never pay backend initialization.
"""

import os

__version__ = "0.2.1"

_JAX_CONFIGURED = False


def configure_jax():
    """Enable x64 (the codec is exact 64-bit integer arithmetic) and the
    persistent compilation cache. Called by every module that touches
    JAX, before any array is created."""
    global _JAX_CONFIGURED
    if _JAX_CONFIGURED:
        return
    import jax

    jax.config.update("jax_enable_x64", True)
    # honor JAX_PLATFORMS even under out-of-tree PJRT plugins that
    # register unconditionally (the sandbox's TPU plugin ignores the
    # env var alone): a subprocess launched with JAX_PLATFORMS=cpu must
    # never initialize an accelerator tunnel behind the caller's back
    platforms = os.environ.get("JAX_PLATFORMS")
    if platforms:
        try:
            jax.config.update("jax_platforms", platforms)
        except Exception:  # pragma: no cover - backend already locked in
            pass
    if os.environ.get("LAC_TPU_NO_CACHE") != "1":
        cache_dir = os.environ.get(
            "LAC_TPU_CACHE_DIR", os.path.expanduser("~/.cache/lac_tpu/xla")
        )
        try:
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:  # pragma: no cover - cache is best-effort
            pass
    _JAX_CONFIGURED = True

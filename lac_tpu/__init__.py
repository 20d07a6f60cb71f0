"""lac_tpu — TPU-native batch lossless audio codec.

A ground-up JAX/XLA/Pallas re-architecture of the LAC codec
(reference: audexdev/Lossless-Audio-Codec, C++20 CLI). Produces
byte-identical ``.lac`` v3 bitstreams while replacing the reference's
per-sample serial algorithms with batched TPU array programs:

* all candidate residuals, cost models, and Rice k-adaptation are
  computed as prefix-sum / sliding-window closed forms over thousands
  of blocks in flight (no per-sample feedback loop exists in the
  format's adaptation rule — see ``lac_tpu.ops.adapt``);
* bit emission is a prefix-sum + scatter bitpack over token arrays;
* decode parses independent v3 block payloads in parallel and
  reconstructs PCM with batched scans.

Wire-format behavior is cited into the reference as ``file:line`` so
parity can be audited (e.g. docs/format.md, src/codec/block/encoder.cpp).
"""

import os

import jax

# The codec is exact-integer arithmetic end to end: uint64 prefix sums of
# 32-bit zigzag residuals and int64 autocorrelation lags require x64.
jax.config.update("jax_enable_x64", True)

# plan_group compiles one executable per block length; persist them so
# repeated CLI invocations skip recompilation.
if os.environ.get("LAC_TPU_NO_CACHE") != "1":
    _cache_dir = os.environ.get(
        "LAC_TPU_CACHE_DIR", os.path.expanduser("~/.cache/lac_tpu/xla")
    )
    try:
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass

__version__ = "0.1.0"

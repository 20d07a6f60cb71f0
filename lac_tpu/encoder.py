"""Batched channel-block encoder + frame encoder.

The reference encodes one block at a time with per-sample loops
(block/encoder.cpp:313-838); here every stage is an array program over a
*group* of equal-length channel blocks (thousands in flight on TPU):

1. candidate residuals: fixed 0-4, FIR, LPC {4,6,8,10,12} — stencils and
   Q15 dots (predictors.py); exact autocorrelation runs on device, the
   tiny 80-bit Levinson-Durbin recursion on host (lpc.py);
2. exact cost models: shared adapted k-sequence per candidate (adapt.py)
   + rice/zr/bin/static reductions (costs.py);
3. selection: argmin with the reference's exact tie-breaks
   (encoder.cpp:352-359, 441-456);
4. partition sweep p=1..8 with stateless adaptation and the 5%
   decode-speed margins (encoder.cpp:486-552);
5. compact token codes / plan metadata for emission.

Stages 1 (sans LD), 2-5 compose into one jittable function
(`plan_group`). The host runs Levinson-Durbin (80-bit), bit emission —
either the native plan replay (lac_emit_blocks: recompute the winning
residual and emit serially per lane, thread-parallel) or the compact
token codes + prefix-sum/scatter packer — and frame assembly. Groups
are keyed by block length, so XLA sees static shapes and no masking is
needed; batch sizes bucket to powers of two.
"""

import functools
import os as _os

import numpy as np

from .bitio.pack import pack_stream
from .format import constants as C
from .format.partitions import control_byte, max_partition_order_for_block
from .format.zigzag import zigzag_encode
from .ops import adapt, lpc, predictors, runs
from .ops._backend import is_jax, shift_right
from .utils import debug as _dbg


def _cold_route(nblocks):
    """True when a cold process should encode a short input on the native
    host path instead of initializing the accelerator (one-shot CLI
    contract, reference main.cpp:600-709: millisecond-class startup).

    Applies only when (a) the resolved JAX backend is an accelerator —
    CPU-JAX processes (the test suite) have no executable-load problem,
    (b) the process has not already paid the load (device_pipeline
    warmth), (c) the input is at most LAC_TPU_COLD_BLOCKS blocks
    (default 256 ~= 95 s of 44.1 kHz audio; 0 disables routing), and
    (d) the native runtime is available to plan at C++ speed.
    """
    try:
        thr = int(_os.environ.get("LAC_TPU_COLD_BLOCKS", "256"))
    except ValueError:
        thr = 256
    if thr <= 0 or nblocks > thr:
        return False
    from . import device_pipeline as _dp
    from .runtime.native import native_available

    if _dp.process_warm() or not native_available():
        return False
    platforms = _os.environ.get("JAX_PLATFORMS", "")
    if platforms:
        return "cpu" not in platforms.split(",")
    try:
        import jax

        return jax.default_backend() != "cpu"
    except Exception:
        return False


def _repeat_cols(a, sizes_np, n, xp):
    """Repeat columns of (B, S) by static per-column counts -> (B, n)."""
    if is_jax(xp):
        return xp.repeat(a, xp.asarray(sizes_np), axis=-1, total_repeat_length=n)
    return np.repeat(a, sizes_np, axis=-1)

# candidate table: (predictor_type, order_param), in consideration order
_CANDIDATES = (
    [(C.PREDICTOR_FIXED, o) for o in range(5)]
    + [(C.PREDICTOR_FIR, C.FIR_ORDER)]
    + [(C.PREDICTOR_LPC, o) for o in C.LPC_ORDER_CANDIDATES]
)
_NCAND = len(_CANDIDATES)
_LPC_BASE = 6  # index of the first LPC candidate

# compact token classes shipped device->host (see plan_group emission)
CLS_RICE = 0  # rice/static/bin-fallback: unary=q, tail=(rem, k+1)
CLS_HEAD_ONLY = 1  # bin direct tokens: head bits only
CLS_RUN = 2  # zero-run token: payload = run length
CLS_ESCAPE = 3  # 32-bit zigzag escape: tail = (payload, 32)
CLS_SILENT = 4  # inside a run: emits nothing


def _pad_to_byte(bits, xp):
    return bits + ((xp.uint64(8) - (bits & xp.uint64(7))) & xp.uint64(7))


def _rice_cost(u, k_used, xp):
    # shift in native u32 (u < 2^32); only the +1+k sum needs u64
    # headroom (q can be 2^32 - 1 at k = 0)
    q = xp.where(
        k_used >= xp.int32(C.MAX_RICE_K),
        xp.uint32(0),
        u.astype(xp.uint32) >> k_used.astype(xp.uint32),
    )
    return q.astype(xp.uint64) + xp.uint64(1) + k_used.astype(xp.uint64)


def _mode_cost_fields(v, u, k_used, run_len, long_run, run_start, xp):
    """Per-sample bit costs for rice / zr / bin (encoder.cpp:201-263)."""
    rice_per = _rice_cost(u, k_used, xp)
    absv = xp.abs(v.astype(xp.int64))
    bin_per = xp.where(absv == 0, xp.uint64(2), xp.where(absv <= 2, xp.uint64(3), xp.uint64(2) + rice_per))
    esc_shift = xp.minimum(k_used + C.ESCAPE_K_OFFSET, xp.int32(C.ESCAPE_K_CAP))
    esc = xp.uint32(1) << esc_shift.astype(xp.uint32)  # <= 2^24: u32-exact
    token_per = xp.uint64(2) + xp.where(u.astype(xp.uint32) > esc, xp.uint64(32), rice_per)
    run_per = (
        xp.uint64(2)
        + ((run_len - C.ZERO_RUN_MIN_LENGTH).astype(xp.uint64) >> xp.uint64(C.ZERO_RUN_LENGTH_K))
        + xp.uint64(1 + C.ZERO_RUN_LENGTH_K)
    )
    zr_per = xp.where(run_start, run_per, xp.where(long_run, xp.uint64(0), token_per))
    return rice_per, bin_per, zr_per


def _use_pallas_kcosts():
    """Gridded Pallas k-cost reduction: default ON for the TPU backend
    (measured at parity-or-better vs the 17-pass XLA formulation:
    29.0ms vs 31.1ms min on (1408, 16384); fuses 17 passes into one),
    OFF elsewhere (no Mosaic on CPU). LAC_TPU_PALLAS=0/1 forces."""
    from .ops.pallas_kernels import pallas_default

    return pallas_default()


def _k_costs_stack(u, k_max, xp, count=None):
    """Rice-cost sums for k in [0, k_max]: (..., k_max+1) uint64.

    16-bit-split trick: for k <= 16, ``u >> k = (u_hi << (16-k)) +
    (u_lo >> k)`` exactly (u_hi = u >> 16), so every big reduction stays
    in native uint32 (partial sums <= 2^30 for <= 16384 samples of
    16-bit halves) and only the tiny per-(lane, k) combination uses
    64-bit math. Emulated u64 reductions are ~5x slower on TPU.

    On the TPU backend the 17 shift+reduce passes fuse into one gridded
    Pallas kernel pass (ops/pallas_kernels.py) by default; see
    :func:`_use_pallas_kcosts`.
    """
    assert k_max <= 16
    nsamp = u.shape[-1] if count is None else count
    karr = xp.asarray(np.arange(k_max + 1, dtype=np.uint64))
    if is_jax(xp) and _use_pallas_kcosts():
        from .ops import pallas_kernels as _pk

        lead = u.shape[:-1]
        rows = int(np.prod(lead))
        n = u.shape[-1]
        if _pk.pallas_available() and _pk.supported_shape(rows, n):
            sums = _pk.k_cost_sums(u.astype(xp.uint32).reshape(rows, n)).astype(xp.uint64)
            sums = sums.reshape(lead + (17,))
            shi, slo = sums[..., 0], sums[..., 1 : k_max + 2]
            return (shi[..., None] << (xp.uint64(16) - karr)) + slo + (karr + xp.uint64(1)) * xp.uint64(nsamp)
    u32v = u.astype(xp.uint32)
    uhi = u32v >> xp.uint32(16)
    ulo = u32v & xp.uint32(0xFFFF)
    shi = xp.sum(uhi, axis=-1).astype(xp.uint64)  # (..., )
    cols = []
    t = ulo
    for k in range(k_max + 1):
        slo = xp.sum(t, axis=-1).astype(xp.uint64)
        cols.append((shi << xp.uint64(16 - k)) + slo + xp.uint64((1 + k)) * xp.uint64(nsamp))
        t = t >> xp.uint32(1)
    return xp.stack(cols, axis=-1)


def plan_group(pcm, lpc_coeffs, lpc_valid, n, zero_run_enabled, partitioning_enabled, xp,
               emit_fields=True):
    """Pure array program: pcm (B, n) + LPC analysis -> full encode plan.

    ``lpc_coeffs``: (5, B, 13) int16 Q15 candidate coefficient sets;
    ``lpc_valid``: (5, B) bool (stable, achieved order > 0, order fits).

    Returns a dict of plan arrays (see end of function). Jittable.
    """
    B = pcm.shape[0]
    pcm = pcm.astype(xp.int32)
    idx = xp.arange(n, dtype=xp.int64)

    # ---- candidate residuals (B, ncand, n)
    res_list = [predictors.fixed_residual(pcm, o, xp=xp) for o in range(5)]
    res_list.append(predictors.fir_residual(pcm, xp=xp))
    lpc_ok = []
    for li in range(len(C.LPC_ORDER_CANDIDATES)):
        r, in_range = predictors.lpc_residual(pcm, lpc_coeffs[li], 12, xp=xp)
        res_list.append(r)
        lpc_ok.append(in_range)
    residuals = xp.stack(res_list, axis=1)
    lpc_in_range = xp.stack(lpc_ok, axis=0)  # (5, B) — overflow fallback flag
    valid = xp.concatenate([xp.ones((B, _LPC_BASE), dtype=bool), (lpc_valid & lpc_in_range).T], axis=1)

    # ---- whole-block stateful scoring per candidate
    # u stays uint32 (zigzag codes are u32 by construction): every HBM
    # pass over the (B, ncand, n) stack moves half the bytes of the old
    # u64 layout, and all shifts/compares run native instead of emulated
    u = zigzag_encode(residuals)
    scan = min(C.INITIAL_SCAN_COUNT, n)
    head_costs = _k_costs_stack(u[..., :scan], C.INITIAL_MAX_K, xp)
    initial_k = xp.argmin(head_costs, axis=-1).astype(xp.int32)

    k_after = adapt.k_after_stateful(u, xp=xp)
    k_used = adapt.k_used_from_after(k_after, initial_k, xp=xp)

    z = residuals == 0
    run_len, long_run, run_start = runs.zero_run_info(z, idx, xp.int64(n), xp=xp)
    rice_per, bin_per, zr_per = _mode_cost_fields(residuals, u, k_used, run_len, long_run, run_start, xp)
    rice_bits = xp.sum(rice_per, axis=-1)
    bin_bits = xp.sum(bin_per, axis=-1)
    zr_bits = xp.sum(zr_per, axis=-1)
    has_run = xp.any(run_start, axis=-1)

    static_costs = _k_costs_stack(u, C.MAX_STATIC_K, xp)
    static_k = xp.argmin(static_costs, axis=-1).astype(xp.int32)
    static_bits = xp.min(static_costs, axis=-1)

    # ---- candidate selection (tie-break: lower predictor_type, then
    # earliest in consideration order) as one lexicographic argmin:
    # key = bits * 4 + predictor_type (bits <= 2^46 for valid PCM, so the
    # key fits uint64 losslessly; invalid candidates get the max key)
    zr_eff = xp.where(has_run, zr_bits, rice_bits) if zero_run_enabled else rice_bits
    best_bits_all = xp.minimum(xp.minimum(rice_bits, static_bits), xp.minimum(zr_eff, bin_bits))
    ptype_tab = xp.asarray(np.asarray([t for t, _ in _CANDIDATES], dtype=np.uint64))
    UMAX = xp.uint64(0xFFFFFFFFFFFFFFFF)
    key = xp.where(valid, best_bits_all * xp.uint64(4) + ptype_tab[None, :], UMAX)
    sel_idx = xp.argmin(key, axis=-1).astype(xp.int32)

    # winner extraction: one-hot masked sums (a dynamic gather along the
    # candidate axis costs ~100x more than an elementwise pass on TPU)
    onehot = (sel_idx[:, None] == xp.arange(_NCAND, dtype=xp.int32)[None, :])
    oh3 = onehot[:, :, None]
    g2 = lambda a: xp.take_along_axis(a, sel_idx[:, None], axis=1)[:, 0]  # (B, ncand): tiny
    v_w = xp.sum(xp.where(oh3, residuals, xp.int32(0)), axis=1)
    u_w = xp.sum(xp.where(oh3, u, xp.uint32(0)), axis=1)
    k_after_w = xp.sum(xp.where(oh3, k_after, xp.int32(0)), axis=1)
    initial_k_w = g2(initial_k)
    static_k_w = g2(static_k)

    # ---- whole-block residual-mode choice (encoder.cpp:441-456)
    rice_w, zr_w, bin_w, static_w = g2(rice_bits), g2(zr_eff), g2(bin_bits), g2(static_bits)
    has_run_w = g2(has_run)
    allow_zr = has_run_w if zero_run_enabled else xp.zeros((B,), dtype=bool)
    best = rice_w
    base_mode = xp.zeros((B,), dtype=xp.int32)
    take = allow_zr & (zr_w <= best)
    best = xp.where(take, zr_w, best)
    base_mode = xp.where(take, xp.int32(C.MODE_ZERO_RUN), base_mode)
    take = bin_w < best
    best = xp.where(take, bin_w, best)
    base_mode = xp.where(take, xp.int32(C.MODE_BIN), base_mode)
    take_static = static_w < best
    best = xp.where(take_static, static_w, best)
    base_mode = xp.where(take_static, xp.int32(C.MODE_STATIC), base_mode)
    base_k = xp.where(take_static, static_k_w, initial_k_w)

    # ---- partition sweep
    max_p = max_partition_order_for_block(n) if (partitioning_enabled and n >= C.MIN_PARTITION_SIZE) else 0
    max_parts = 1 << max_p
    # chosen plan storage: [p stages] — filled progressively
    best_p = xp.zeros((B,), dtype=xp.int32)
    best_total = _pad_to_byte(best + xp.uint64(8 + 7), xp)
    sel_modes = xp.zeros((B, max_parts), dtype=xp.int32)
    sel_ks = xp.zeros((B, max_parts), dtype=xp.int32)
    sel_modes = sel_modes.at[:, 0].set(base_mode) if is_jax(xp) else _np_setcol(sel_modes, 0, base_mode)
    sel_ks = sel_ks.at[:, 0].set(base_k) if is_jax(xp) else _np_setcol(sel_ks, 0, base_k)

    # whole-block run geometry + emission state (p = 0 defaults). The
    # emission state is overwritten whenever the sweep accepts a finer
    # partitioning, so no per-lane dynamic gathers are ever needed.
    zw0 = v_w == 0
    last_nz, next_nz = runs.zero_breaks(zw0, xp=xp)
    rl0, long0, start0 = runs.run_geometry(zw0, last_nz, next_nz, idx, xp.int64(n), xp=xp)
    e_k_adapt = adapt.k_used_from_after(k_after_w, initial_k_w, xp=xp)
    e_mode = xp.broadcast_to(base_mode[:, None], (B, n))
    e_kfield = xp.broadcast_to(base_k[:, None], (B, n))
    e_rl, e_long, e_start = rl0, long0, start0

    # p-independent precomputations, reused by every sweep iteration.
    # All big accumulations use the 16-bit-split trick (u = uhi<<16+ulo)
    # so cumsums run in native uint32; 64-bit math only touches the tiny
    # (B, nparts) boundary combinations.
    any_unequal = any(n % (1 << p) for p in range(1, max_p + 1))
    if max_p > 0:
        u32v = u_w.astype(xp.uint32)
        uhi = u32v >> xp.uint32(16)
        ulo = u32v & xp.uint32(0xFFFF)
        zero1 = xp.zeros((B, 1), dtype=xp.uint32)
        csz_hi = xp.concatenate([zero1, xp.cumsum(uhi, axis=-1)], axis=-1)  # (B, n+1)
        csz_lo = xp.concatenate([zero1, xp.cumsum(ulo, axis=-1)], axis=-1)
        karr_u64 = xp.asarray(np.arange(C.MAX_STATIC_K + 1, dtype=np.uint64))
    if max_p > 0 and any_unequal:
        # per-k shifted-low cost cumsums: (B, n+1, 17). Only built for
        # odd block sizes whose sweep has unequal partitions — on the
        # hot power-of-two shapes the table (and its ~2.7 GB of HBM
        # traffic at (128, 16384)) never exists; equal partitions get
        # their per-k segment sums from one reshape-reduce/Pallas pass
        # over u instead (bit-identical: exact integer sums either way).
        lo_k = xp.stack([ulo >> xp.uint32(k) for k in range(C.MAX_STATIC_K + 1)], axis=-1)
        csz_lok = xp.concatenate(
            [xp.zeros((B, 1, C.MAX_STATIC_K + 1), dtype=xp.uint32), xp.cumsum(lo_k, axis=-2)], axis=-2
        )

    def _k_cost_seg(starts_1d, ends_1d, seg_sizes_u64, kmax):
        """Per-partition rice-cost stack for k in [0, kmax] from the
        split cumsums: (B, nparts, kmax+1) uint64."""
        hi_seg = (csz_hi[:, ends_1d] - csz_hi[:, starts_1d]).astype(xp.uint64)
        lo_seg = (csz_lok[:, ends_1d, : kmax + 1] - csz_lok[:, starts_1d, : kmax + 1]).astype(xp.uint64)
        ka = karr_u64[: kmax + 1]
        return (hi_seg[..., None] << (xp.uint64(16) - ka)) + lo_seg + (ka + xp.uint64(1)) * seg_sizes_u64[..., None]

    for p in range(1, max_p + 1):
        base = n >> p
        nparts = 1 << p
        starts_1d = np.minimum(np.arange(nparts, dtype=np.int64) * base, n)
        ends_1d = np.concatenate([starts_1d[1:], [n]])
        sizes_np = (ends_1d - starts_1d).astype(np.int64)
        head_ends_1d = np.minimum(starts_1d + C.INITIAL_SCAN_COUNT, ends_1d)
        head_sizes = np.minimum(sizes_np, C.INITIAL_SCAN_COUNT)
        pos_np = np.concatenate([np.arange(sz, dtype=np.int64) for sz in sizes_np])
        seg_end_np = np.repeat(ends_1d, sizes_np)

        def rep(a):
            return _repeat_cols(a, sizes_np, n, xp)

        equal = n % nparts == 0
        if equal:
            # equal partitions: per-partition k-cost stacks come straight
            # from the (B, nparts, base) view of u — the same Pallas
            # reduction (or split reshape-reduce) as the whole-block
            # costs, no boundary cumsum table
            u3 = u_w.reshape(B, nparts, base)
            head = min(C.INITIAL_SCAN_COUNT, base)
            hc = _k_costs_stack(u3[..., :head], C.INITIAL_MAX_K, xp)
        else:
            hc = _k_cost_seg(starts_1d, head_ends_1d, xp.asarray(head_sizes.astype(np.uint64)), C.INITIAL_MAX_K)
        init_k_seg = xp.argmin(hc, axis=-1).astype(xp.int32)  # (B, nparts)

        # stateless per-sample k from split segment sums (no gathers:
        # partition geometry is static, so bases broadcast by repeat)
        seg_hi = (csz_hi[:, 1:] - rep(csz_hi[:, starts_1d])).astype(xp.uint64)
        seg_lo = (csz_lo[:, 1:] - rep(csz_lo[:, starts_1d])).astype(xp.uint64)
        seg_sum = (seg_hi << xp.uint64(16)) + seg_lo
        k_after_sl = adapt.k_after_stateless(seg_sum, pos_np, xp=xp)
        k_used_p = xp.where(pos_np == 0, rep(init_k_seg), shift_right(k_after_sl, 1, xp=xp)).astype(xp.int32)

        rl_p, long_p, start_p = runs.run_geometry(zw0, last_nz, next_nz, pos_np, seg_end_np, xp=xp)
        rice_pp, bin_pp, zr_pp = _mode_cost_fields(v_w, u_w, k_used_p, rl_p, long_p, start_p, xp)
        # per-partition sums of the three mode costs + run counter.
        # Values are <= 2^33, so lo16/hi17 halves keep everything in u32
        # (lo sums <= 8192*0xFFFF < 2^29, hi sums <= 8192*2^17 = 2^30).
        if n & (nparts - 1) == 0:
            # equal partitions (every power-of-two n, i.e. the hot 16384
            # and 256 shapes): one reshape-reduce per half — no (B, n, 7)
            # cumsum materialization, no boundary gathers
            def _seg_sum_u64(f):
                fl = (f & xp.uint64(0xFFFF)).astype(xp.uint32).reshape(B, nparts, base)
                fh = (f >> xp.uint64(16)).astype(xp.uint32).reshape(B, nparts, base)
                return (xp.sum(fh, axis=-1).astype(xp.uint64) << xp.uint64(16)) + xp.sum(fl, axis=-1).astype(xp.uint64)

            rice_s = _seg_sum_u64(rice_pp)
            bin_s = _seg_sum_u64(bin_pp)
            zr_s = _seg_sum_u64(zr_pp)
            has_run_s = xp.any(start_p.reshape(B, nparts, base), axis=-1)
        else:
            costs3 = xp.stack([rice_pp, bin_pp, zr_pp], axis=-1).astype(xp.uint64)
            lo3 = (costs3 & xp.uint64(0xFFFF)).astype(xp.uint32)
            hi3 = (costs3 >> xp.uint64(16)).astype(xp.uint32)
            stacked = xp.concatenate([lo3, hi3, start_p.astype(xp.uint32)[..., None]], axis=-1)  # (B,n,7)
            cs7 = xp.concatenate(
                [xp.zeros((B, 1, 7), dtype=xp.uint32), xp.cumsum(stacked, axis=-2)], axis=-2
            )
            seg7 = (cs7[:, ends_1d, :] - cs7[:, starts_1d, :]).astype(xp.uint64)
            rice_s = (seg7[..., 3] << xp.uint64(16)) + seg7[..., 0]
            bin_s = (seg7[..., 4] << xp.uint64(16)) + seg7[..., 1]
            zr_s = (seg7[..., 5] << xp.uint64(16)) + seg7[..., 2]
            has_run_s = seg7[..., 6] > 0

        if equal:
            sc = _k_costs_stack(u3, C.MAX_STATIC_K, xp)
        else:
            sc = _k_cost_seg(starts_1d, ends_1d, xp.asarray(sizes_np.astype(np.uint64)), C.MAX_STATIC_K)
        static_k_s = xp.argmin(sc, axis=-1).astype(xp.int32)
        static_s = xp.min(sc, axis=-1)

        allow_zr_s = has_run_s if zero_run_enabled else xp.zeros_like(has_run_s)
        mode_s = xp.zeros((B, nparts), dtype=xp.int32)
        bits_s = rice_s
        k_s = init_k_seg
        tk = allow_zr_s & (zr_s < bits_s)
        bits_s = xp.where(tk, zr_s, bits_s)
        mode_s = xp.where(tk, xp.int32(C.MODE_ZERO_RUN), mode_s)
        tk = bin_s < bits_s
        bits_s = xp.where(tk, bin_s, bits_s)
        mode_s = xp.where(tk, xp.int32(C.MODE_BIN), mode_s)
        tk = (static_s < bits_s) | (static_s <= bits_s + bits_s // xp.uint64(C.DECODE_SPEED_MARGIN_DIVISOR))
        bits_s = xp.where(tk, static_s, bits_s)
        mode_s = xp.where(tk, xp.int32(C.MODE_STATIC), mode_s)
        k_s = xp.where(tk, static_k_s, k_s)

        total = _pad_to_byte(xp.sum(bits_s, axis=-1) + xp.uint64(8 + 7 * nparts), xp)
        margin = best_total // xp.uint64(C.DECODE_SPEED_MARGIN_DIVISOR)
        accept = (total < best_total) | ((total <= best_total + margin) & (best_p == 0)) | ((total == best_total) & (xp.int32(p) < best_p))
        best_total = xp.where(accept, total, best_total)
        best_p = xp.where(accept, xp.int32(p), best_p)
        pad_cols = max_parts - nparts
        mode_pad = xp.concatenate([mode_s, xp.zeros((B, pad_cols), dtype=xp.int32)], axis=1) if pad_cols else mode_s
        k_pad = xp.concatenate([k_s, xp.zeros((B, pad_cols), dtype=xp.int32)], axis=1) if pad_cols else k_s
        sel_modes = xp.where(accept[:, None], mode_pad, sel_modes)
        sel_ks = xp.where(accept[:, None], k_pad, sel_ks)
        # emission state for accepted lanes (overwrites coarser plans)
        am = accept[:, None]
        e_k_adapt = xp.where(am, k_used_p, e_k_adapt)
        e_mode = xp.where(am, rep(mode_s), e_mode)
        e_kfield = xp.where(am, rep(k_s), e_kfield)
        e_rl = xp.where(am, rl_p, e_rl)
        e_long = xp.where(am, long_p, e_long)
        e_start = xp.where(am, start_p, e_start)

    # ---- emission fields for the chosen plan (selected during sweep)
    mode_smp = e_mode
    kfield_smp = e_kfield
    k_eff = xp.where(mode_smp == C.MODE_STATIC, kfield_smp, e_k_adapt).astype(xp.int32)
    run_len_e, long_e, start_e = e_rl, e_long, e_start

    # ---- compact token codes for the device->host hop (6 bytes/sample:
    # u32 payload + headcode u8 + k u8). The host expands these to
    # (head, unary, tail) fields with a handful of vectorized ops — the
    # dev tunnel's D2H bandwidth makes every byte count. Skipped when the
    # native plan-replay emitter is available (only the tiny metadata
    # leaves the device then).
    if not emit_fields:
        ship = xp.zeros((B, 0), dtype=xp.uint8)
        # overflow only matters for candidates actually under consideration:
        # the reference skips unstable/zero-order candidates before ever
        # computing a residual (block/encoder.cpp:395-398)
        lane_in_range = xp.all(lpc_in_range | ~lpc_valid, axis=0).astype(xp.int8)
        meta = xp.concatenate(
            [
                sel_idx.astype(xp.int8)[:, None],
                best_p.astype(xp.int8)[:, None],
                lane_in_range[:, None],
                sel_modes.astype(xp.int8),
                sel_ks.astype(xp.int8),
            ],
            axis=-1,
        )
        return {"ship": ship, "meta": meta}

    is_bin = mode_smp == C.MODE_BIN
    is_zr = mode_smp == C.MODE_ZERO_RUN
    absv = xp.abs(v_w.astype(xp.int64))
    sign = (v_w < 0).astype(xp.uint8)
    esc_shift = xp.minimum(k_eff + C.ESCAPE_K_OFFSET, xp.int32(C.ESCAPE_K_CAP))
    escape = is_zr & ~long_e & (u_w > (xp.uint32(1) << esc_shift.astype(xp.uint32)))
    zr_run = is_zr & start_e
    silent = is_zr & long_e & ~start_e
    zr_normal = is_zr & ~long_e & ~escape

    cls = xp.zeros((B, n), dtype=xp.uint8)  # CLS_RICE default
    head_val = xp.zeros((B, n), dtype=xp.uint8)
    head_len = xp.zeros((B, n), dtype=xp.uint8)

    b_direct = is_bin & (absv <= 2)
    cls = xp.where(b_direct, xp.uint8(CLS_HEAD_ONLY), cls)
    head_val = xp.where(is_bin & (absv == 0), xp.uint8(C.BIN_TAG_ZERO), head_val)
    head_len = xp.where(is_bin & (absv == 0), xp.uint8(2), head_len)
    head_val = xp.where(is_bin & (absv == 1), xp.uint8(C.BIN_TAG_ONE << 1) | sign, head_val)
    head_len = xp.where(is_bin & (absv == 1), xp.uint8(3), head_len)
    head_val = xp.where(is_bin & (absv == 2), xp.uint8(C.BIN_TAG_TWO << 1) | sign, head_val)
    head_len = xp.where(is_bin & (absv == 2), xp.uint8(3), head_len)
    head_val = xp.where(is_bin & (absv > 2), xp.uint8(C.BIN_TAG_FALLBACK), head_val)
    head_len = xp.where(is_bin & (absv > 2), xp.uint8(2), head_len)
    head_val = xp.where(zr_normal, xp.uint8(C.ZR_TAG_NORMAL), head_val)
    head_len = xp.where(zr_normal, xp.uint8(2), head_len)
    cls = xp.where(zr_run, xp.uint8(CLS_RUN), cls)
    head_val = xp.where(zr_run, xp.uint8(C.ZR_TAG_RUN), head_val)
    head_len = xp.where(zr_run, xp.uint8(2), head_len)
    cls = xp.where(escape, xp.uint8(CLS_ESCAPE), cls)
    head_val = xp.where(escape, xp.uint8(C.ZR_TAG_ESCAPE), head_val)
    head_len = xp.where(escape, xp.uint8(2), head_len)
    cls = xp.where(silent, xp.uint8(CLS_SILENT), cls)
    head_val = xp.where(silent, xp.uint8(0), head_val)
    head_len = xp.where(silent, xp.uint8(0), head_len)

    headcode = cls | (head_val << xp.uint8(3)) | (head_len << xp.uint8(6))
    payload = xp.where(zr_run, run_len_e.astype(xp.uint32), u_w.astype(xp.uint32))

    # one contiguous u8 ship buffer: payload LE bytes, headcode, k
    pb = [(payload >> xp.uint32(8 * i)).astype(xp.uint8) for i in range(4)]
    ship = xp.stack(pb + [headcode, k_eff.astype(xp.uint8)], axis=-1)  # (B, n, 6)

    # compact per-lane metadata (int8): sel_idx, best_p, in_range flag,
    # then partition modes and ks
    # overflow only matters for candidates actually under consideration:
    # the reference skips unstable/zero-order candidates before ever
    # computing a residual (block/encoder.cpp:395-398)
    lane_in_range = xp.all(lpc_in_range | ~lpc_valid, axis=0).astype(xp.int8)
    meta = xp.concatenate(
        [
            sel_idx.astype(xp.int8)[:, None],
            best_p.astype(xp.int8)[:, None],
            lane_in_range[:, None],
            sel_modes.astype(xp.int8),
            sel_ks.astype(xp.int8),
        ],
        axis=-1,
    )
    return {"ship": ship.reshape(B, n * 6), "meta": meta}


def _np_setcol(a, col, vals):
    a = a.copy()
    a[:, col] = vals
    return a


@functools.lru_cache(maxsize=64)
def _jitted_plan(n, zero_run_enabled, partitioning_enabled, emit_fields=True):
    import jax
    import jax.numpy as jnp

    def f(pcm, lpc_coeffs, lpc_valid):
        return plan_group(
            pcm, lpc_coeffs, lpc_valid, n, zero_run_enabled, partitioning_enabled, jnp,
            emit_fields=emit_fields,
        )

    return jax.jit(f)


@functools.lru_cache(maxsize=16)
def _jitted_autocorr(order, nlimbs=0):
    """``nlimbs > 0``: exact 5-bit-limb MXU Gram path (bit-identical for
    ``|x| < 2^(5*nlimbs - 1)``, ops/lpc.py); 0: emulated-int64 VPU path
    (out-of-24-bit-domain inputs only)."""
    import jax
    import jax.numpy as jnp

    if nlimbs:
        return jax.jit(lambda x: lpc.autocorrelation_limbs(x, order, nlimbs, xp=jnp))
    return jax.jit(lambda x: lpc.autocorrelation(x, order, xp=jnp))


def lpc_candidates_from_lags(R, n):
    """Host 80-bit Levinson-Durbin from exact int64 lags (B, 13) ->
    candidate arrays (coeffs (5,B,13) i16, used (5,B) i32, valid (5,B)
    bool, max_valid_order). One order-12 recursion yields every
    candidate order as a snapshot (reference lpc.cpp:98-186)."""
    B = R.shape[0]
    ncl = len(C.LPC_ORDER_CANDIDATES)
    coeffs = np.zeros((ncl, B, 13), dtype=np.int16)
    used = np.zeros((ncl, B), dtype=np.int32)
    valid = np.zeros((ncl, B), dtype=bool)
    max_valid_order = min(32, n - 1) if n > 1 else 0
    Rld = np.asarray(R, dtype=np.longdouble)
    Rld[:, 0] = np.maximum(Rld[:, 0], np.longdouble(1))
    A, break_step = lpc.levinson_durbin_snapshots(Rld, 12)
    analysis = {"A": A, "break_step": break_step}
    for li, cand in enumerate(C.LPC_ORDER_CANDIDATES):
        if cand > max_valid_order:
            continue
        cc, ach, stable = lpc.candidate_coeffs_q15(analysis, cand)
        coeffs[li, :, : cand + 1] = cc
        used[li] = ach
        valid[li] = stable
    return coeffs, used, valid, max_valid_order


def expand_plan(meta, coeffs, used, mvo, n, partitioning_enabled):
    """Expand compact plan metadata to the per-lane replay arrays:
    (ptype u8, order u8, coeffs_lane (B,33) i16, best_p u8, modes (B,256)
    u8, ks (B,256) u8)."""
    B = meta.shape[0]
    sel = meta[:, 0].astype(np.int32)
    best_p = meta[:, 1].astype(np.int32)
    assert np.all(meta[:, 2] != 0), "in-range lanes only (ladder lanes replan on host)"
    max_p0 = (
        max_partition_order_for_block(n)
        if (partitioning_enabled and n >= C.MIN_PARTITION_SIZE)
        else 0
    )
    max_parts = 1 << max_p0
    modes = np.zeros((B, 256), np.uint8)
    ks = np.zeros((B, 256), np.uint8)
    modes[:, :max_parts] = meta[:, 3 : 3 + max_parts]
    ks[:, :max_parts] = meta[:, 3 + max_parts : 3 + 2 * max_parts]

    pt_tab = np.asarray([t for t, _ in _CANDIDATES], np.uint8)
    op_tab = np.asarray([o for _, o in _CANDIDATES], np.uint8)
    ptype = pt_tab[sel]
    order = op_tab[sel].astype(np.int32)
    lanes = np.arange(B)
    lpc_mask = sel >= _LPC_BASE
    li = np.clip(sel - _LPC_BASE, 0, len(C.LPC_ORDER_CANDIDATES) - 1)
    used_sel = used[li, lanes]
    order = np.where(lpc_mask, np.clip(used_sel, 1, mvo), order).astype(np.uint8)
    coeffs_lane = np.zeros((B, 33), np.int16)
    coeffs_lane[:, :13] = np.where(lpc_mask[:, None], coeffs[li, lanes, :], np.int16(0))
    return ptype, order, coeffs_lane, best_p.astype(np.uint8), modes, ks


def replay_payloads(pcm, meta, coeffs, used, mvo, n, partitioning_enabled, thread_count):
    """Native plan replay: expand plan metadata to per-lane arrays and
    emit the wire payloads in one C++ pass (lac_emit_blocks)."""
    from .runtime.native import emit_blocks_native

    ptype, order, coeffs_lane, best_p, modes, ks = expand_plan(
        meta, coeffs, used, mvo, n, partitioning_enabled
    )
    payloads = emit_blocks_native(
        pcm, ptype, order, coeffs_lane, best_p, modes, ks, thread_count
    )
    if payloads is None:  # native vanished mid-flight: no replay data
        raise RuntimeError("native emitter unavailable")
    return payloads


class _GroupJob:
    """Pipelined encode of one device batch, split into three phases so
    the frame encoder can overlap H2D uploads, device compute, D2H
    copies (started asynchronously), and host packing across groups:

    1. ``dispatch_autocorr`` — upload PCM once (int16 when the signal is
       16-bit-domain), dispatch autocorrelation, start the async host
       copy of the lags;
    2. ``dispatch_plan`` — run the tiny 80-bit Levinson-Durbin on the
       (by now local) lags, dispatch the planner, start async copies of
       its compact outputs;
    3. ``finish`` — expand token fields and pack payload bytes.
    """

    # device-path shapes: the two fixed hot shapes compile once and are
    # persistently cached; odd lengths (final file blocks, small dual
    # encodes) take the numpy planner + native replay, avoiding a fresh
    # ~minutes XLA compile per novel tail length.
    _HOT_SHAPES = (C.MAX_BLOCK_SIZE, C.STEREO_PROBE_SIZE)
    _MIN_DEVICE_ELEMS = 1 << 22

    def __init__(self, enc, pcm_np):
        self.enc = enc
        self.pcm_np = pcm_np
        self.B, self.n = pcm_np.shape
        self.is_jax = is_jax(enc.xp) and (
            self.n in self._HOT_SHAPES or self.B * self.n >= self._MIN_DEVICE_ELEMS
        )

    def dispatch_autocorr(self):
        if not self.is_jax:
            return
        import jax

        B, n = self.B, self.n
        Bp = 1 << max(0, (B - 1).bit_length())
        enc = self.enc
        if enc.mesh is not None:
            msize = int(np.prod(enc.mesh.devices.shape))
            while Bp % msize:
                Bp *= 2
        mn = int(self.pcm_np.min(initial=0))
        mx = int(self.pcm_np.max(initial=0))
        small = mn >= -32768 and mx <= 32767
        # exact-MXU autocorr limb count, bucketed to two executable
        # variants (int16 content -> 4, anything within the 24-bit+side
        # frame domain -> 5); out-of-domain int32 keeps the i64 path
        self.nlimbs = 4 if small else (5 if max(-mn, mx) < (1 << 24) else 0)
        with _dbg.phase("h2d_upload"):
            pcm_pad = np.zeros((Bp, n), np.int16 if small else np.int32)
            pcm_pad[:B] = self.pcm_np
            self.pcm_dev = jax.device_put(pcm_pad)
        if enc.mesh is not None:
            self.pcm_pad_host = pcm_pad
        self.Bp = Bp
        max_valid_order = min(32, n - 1) if n > 1 else 0
        self.need_lpc = any(c <= max_valid_order for c in C.LPC_ORDER_CANDIDATES)
        if self.need_lpc:
            # materialize the (tiny) lags immediately: it paces the
            # upload stream — the tunnel runs ~5x faster on synchronized
            # modest transfers than on one deep deferred flush
            with _dbg.phase("autocorr_fetch"):
                self.R_np = np.asarray(_jitted_autocorr(12, self.nlimbs)(self.pcm_dev))[: self.B]
        from . import device_pipeline as _dp

        _dp.mark_warm()  # this process now owns loaded device executables

    def dispatch_plan(self):
        from .runtime.native import native_available

        enc = self.enc
        B, n = self.B, self.n
        self.replay = native_available()
        if not self.is_jax:
            with _dbg.phase("plan_numpy"):
                coeffs, used, lvalid, mvo = enc._lpc_analysis(self.pcm_np, n)
                meta = None
                if self.replay:
                    # native planner: same meta rows as plan_group, at
                    # C++ scan speed and O(n) footprint (the numpy array
                    # program's first-touch allocations cost ~1s/group)
                    from .runtime.native import plan_blocks_native

                    meta = plan_blocks_native(
                        self.pcm_np, coeffs, lvalid,
                        enc.zero_run_enabled, enc.partitioning_enabled,
                        enc.thread_count,
                    )
                if meta is not None:
                    ship = np.zeros((self.pcm_np.shape[0], 0), np.uint8)
                else:
                    plan = plan_group(
                        self.pcm_np, coeffs, lvalid, n, enc.zero_run_enabled,
                        enc.partitioning_enabled, np, emit_fields=not self.replay,
                    )
                    ship, meta = np.asarray(plan["ship"]), np.asarray(plan["meta"])
                self._result = (ship, meta, coeffs, used, lvalid, mvo)
            return
        R = self.R_np if self.need_lpc else None
        with _dbg.phase("host_ld"):
            coeffs, used, lvalid, mvo = enc._lpc_analysis(self.pcm_np, n, precomputed_R=R)
        self.coeffs, self.used, self.lvalid, self.mvo = coeffs, used, lvalid, mvo
        with _dbg.phase("plan_dispatch"):
            coeffs_pad = np.zeros((coeffs.shape[0], self.Bp, 13), np.int16)
            coeffs_pad[:, :B] = coeffs
            lvalid_pad = np.zeros((lvalid.shape[0], self.Bp), bool)
            lvalid_pad[:, :B] = lvalid
            if enc.mesh is not None:
                from .parallel.mesh import plan_group_sharded

                self.fut = plan_group_sharded(
                    enc.mesh, self.pcm_pad_host, coeffs_pad, lvalid_pad, n,
                    enc.zero_run_enabled, enc.partitioning_enabled,
                    emit_fields=not self.replay,
                )
            else:
                self.fut = _jitted_plan(n, enc.zero_run_enabled, enc.partitioning_enabled, not self.replay)(
                    self.pcm_dev, enc.xp.asarray(coeffs_pad), enc.xp.asarray(lvalid_pad)
                )
            keys = ("meta",) if self.replay else ("ship", "meta")
            for key in keys:
                try:
                    self.fut[key].copy_to_host_async()
                except AttributeError:
                    pass

    def _finish_replay(self, pcm, meta, coeffs, used, mvo):
        enc = self.enc
        return replay_payloads(
            pcm, meta, coeffs, used, mvo, self.n, enc.partitioning_enabled, enc.thread_count
        )

    def _ladder_replan(self, pcm_rows, coeffs_rows, used_rows, lvalid_rows, mvo):
        """Per-lane LPC residual-overflow fallback (lpc.cpp:188-229).

        Lanes whose open-loop residual left int32 at some candidate order
        replan on host: each candidate's coefficient set is truncated to
        the highest ladder order that stays in range (0 -> candidate
        dropped, block/encoder.cpp:401-403), then the numpy planner
        rescores everything with reference-exact selection.
        """
        enc, n = self.enc, self.n
        Bb = pcm_rows.shape[0]
        coeffs2 = coeffs_rows.copy()
        used2 = used_rows.copy()
        lvalid2 = lvalid_rows.copy()
        for li, cand in enumerate(C.LPC_ORDER_CANDIDATES):
            for row in range(Bb):
                if not lvalid2[li, row]:
                    continue
                o = predictors.lpc_ladder_order(
                    pcm_rows[row], coeffs2[li, row], used2[li, row], cand
                )
                if o == 0:
                    lvalid2[li, row] = False
                else:
                    used2[li, row] = o
                    coeffs2[li, row, o + 1 :] = 0
        plan = plan_group(
            pcm_rows, coeffs2, lvalid2, n, enc.zero_run_enabled, enc.partitioning_enabled,
            np, emit_fields=not self.replay,
        )
        meta2 = np.asarray(plan["meta"])
        assert np.all(meta2[:, 2] != 0), "ladder-truncated lanes must be in range"
        if self.replay:
            return self._finish_replay(pcm_rows, meta2, coeffs2, used2, mvo)
        return enc._emit(np.asarray(plan["ship"]), meta2, coeffs2, used2, mvo, Bb, n)

    def _payloads(self, pcm, ship, meta, coeffs, used, lvalid, mvo):
        """Emit payloads for all lanes, routing residual-overflow lanes
        (meta[:,2] == 0) through the host fallback-ladder replan."""
        enc, B = self.enc, pcm.shape[0]
        bad = meta[:, 2] == 0
        if not bad.any():
            if self.replay:
                with _dbg.phase("native_emit"):
                    return self._finish_replay(pcm, meta, coeffs, used, mvo)
            with _dbg.phase("host_emit"):
                return enc._emit(ship, meta, coeffs, used, mvo, B, self.n)
        out = [None] * B
        good = ~bad
        if good.any():
            sub_ship = ship[good] if (ship is not None and ship.size) else ship
            if self.replay:
                with _dbg.phase("native_emit"):
                    sub = self._finish_replay(pcm[good], meta[good], coeffs[:, good], used[:, good], mvo)
            else:
                with _dbg.phase("host_emit"):
                    sub = enc._emit(sub_ship, meta[good], coeffs[:, good], used[:, good], mvo,
                                    int(good.sum()), self.n)
            for i, pb in zip(np.nonzero(good)[0], sub):
                out[i] = pb
        with _dbg.phase("ladder_replan"):
            sub = self._ladder_replan(pcm[bad], coeffs[:, bad], used[:, bad], lvalid[:, bad], mvo)
        for i, pb in zip(np.nonzero(bad)[0], sub):
            out[i] = pb
        return out

    def finish(self):
        if not self.is_jax:
            ship, meta, coeffs, used, lvalid, mvo = self._result
            return self._payloads(self.pcm_np, ship, meta, coeffs, used, lvalid, mvo)
        with _dbg.phase("meta_fetch"):
            meta = np.asarray(self.fut["meta"])[: self.B]
        ship = None
        if not self.replay:
            with _dbg.phase("ship_fetch"):
                ship = np.asarray(self.fut["ship"])[: self.B]
        return self._payloads(
            self.pcm_np, ship, meta, self.coeffs, self.used, self.lvalid, self.mvo
        )


class ChannelBlockEncoder:
    """Encodes groups of equal-length channel blocks to wire payloads."""

    def __init__(self, zero_run_enabled=True, partitioning_enabled=True, xp=np, thread_count=0,
                 mesh=None):
        self.zero_run_enabled = bool(zero_run_enabled)
        self.partitioning_enabled = bool(partitioning_enabled)
        self.thread_count = int(thread_count)  # host worker cap (0 = auto)
        self.mesh = mesh
        self.xp = xp
        if is_jax(xp):
            from . import configure_jax

            configure_jax()

    def _lpc_analysis(self, pcm_np, n, precomputed_R=None):
        """Autocorrelation (device or host) + host 80-bit LD -> candidate
        arrays. ``precomputed_R`` skips the lag computation (pipelined
        jobs fetch it asynchronously)."""
        B = pcm_np.shape[0]
        max_valid_order = min(32, n - 1) if n > 1 else 0
        if not any(c <= max_valid_order for c in C.LPC_ORDER_CANDIDATES):
            ncl = len(C.LPC_ORDER_CANDIDATES)
            return (np.zeros((ncl, B, 13), np.int16), np.zeros((ncl, B), np.int32),
                    np.zeros((ncl, B), bool), max_valid_order)
        if precomputed_R is not None:
            R = precomputed_R
        elif is_jax(self.xp):
            R = np.asarray(_jitted_autocorr(12)(self.xp.asarray(pcm_np)))[:B]
        else:
            from .runtime.native import autocorr_native

            R = autocorr_native(pcm_np, 12)
            if R is None:
                R = lpc.autocorrelation(pcm_np, 12)
        return lpc_candidates_from_lags(R, n)

    # device batch buckets: groups are padded up to the next power of two
    # (and chunked above a ~2M-element cap) so XLA compiles one
    # executable per (block length, bucket) pair.
    MAX_DEVICE_ELEMS = 128 * 16384

    def _batch_cap(self, n):
        if is_jax(self.xp):
            cap = max(1, self.MAX_DEVICE_ELEMS // max(n, 1))
            return min(1 << (cap.bit_length() - 1), 1024)
        # host path: keep the (B, 11, n) uint64 working set cache-friendly
        return max(1, (self.MAX_DEVICE_ELEMS // 8) // max(n, 1))

    def encode_group(self, pcm):
        """Encode a (B, n) int32 group; returns list of payload bytes."""
        return self.encode_group_async(pcm)()

    def make_jobs(self, pcm):
        """Split a group into device-batch jobs (see _GroupJob phases)."""
        pcm_np = np.ascontiguousarray(pcm, dtype=np.int32)
        B, n = pcm_np.shape
        step = self._batch_cap(n)
        return [
            _GroupJob(self, pcm_np[lo : lo + step])
            for lo in range(0, max(B, 1), max(step, 1))
        ]

    def encode_group_async(self, pcm):
        """Dispatch all device work for a group; returns a finisher."""
        jobs = self.make_jobs(pcm)
        for j in jobs:
            j.dispatch_autocorr()
        for j in jobs:
            j.dispatch_plan()
        return lambda: [pb for j in jobs for pb in j.finish()]

    def _emit(self, ship, meta, coeffs, used, max_valid_order, B, n):
        """Expand compact token codes and pack per-lane payload bytes.

        The token body is interleaved vectorized across lanes; per-lane
        wire prefixes (predictor header, coeffs, control, partition
        metadata) are tiny python lists. Packing fans out across lanes
        in the native runtime (pure-numpy fallback below).
        """
        sel = meta[:, 0].astype(np.int32)
        best_p = meta[:, 1].astype(np.int32)
        if np.any(meta[:, 2] == 0):
            # open-loop int32 overflow: impossible for validated PCM input;
            # `_payloads` routes such lanes through the host ladder path, so
            # reaching `_emit` with any overflow lane is a caller bug.
            raise ValueError(
                "LPC residual overflow lane reached _emit — such lanes must "
                "take the host fallback-ladder path (see _payloads)"
            )
        max_p0 = (
            max_partition_order_for_block(n)
            if (self.partitioning_enabled and n >= C.MIN_PARTITION_SIZE)
            else 0
        )
        max_parts = 1 << max_p0
        sel_modes = meta[:, 3 : 3 + max_parts]
        sel_ks = meta[:, 3 + max_parts : 3 + 2 * max_parts]

        # expand compact codes -> (head, unary, tail) token fields
        shipv = ship.reshape(B, n, 6)
        payload = (
            shipv[..., 0].astype(np.uint32)
            | (shipv[..., 1].astype(np.uint32) << np.uint32(8))
            | (shipv[..., 2].astype(np.uint32) << np.uint32(16))
            | (shipv[..., 3].astype(np.uint32) << np.uint32(24))
        )
        headcode = shipv[..., 4]
        k = shipv[..., 5].astype(np.uint32)
        cls = headcode & 7
        head_val = (headcode >> 3) & 7
        head_len = headcode >> 6
        rice_like = cls == CLS_RICE
        q = payload >> k
        rem = payload & ((np.uint32(1) << k) - np.uint32(1))
        rl = payload - np.uint32(C.ZERO_RUN_MIN_LENGTH)
        is_run = cls == CLS_RUN
        is_esc = cls == CLS_ESCAPE
        unary = np.where(rice_like, q, np.where(is_run, rl >> np.uint32(C.ZERO_RUN_LENGTH_K), np.uint32(0)))
        tail_val = np.where(rice_like, rem, np.where(is_run, rl & np.uint32(3), np.where(is_esc, payload, np.uint32(0))))
        tail_len = np.where(
            rice_like, (k + 1).astype(np.uint8),
            np.where(is_run, np.uint8(1 + C.ZERO_RUN_LENGTH_K), np.where(is_esc, np.uint8(32), np.uint8(0))),
        ).astype(np.uint8)

        # vectorized interleave of (head, unary+tail) element pairs
        body_u = np.zeros((B, 2 * n), dtype=np.uint32)
        body_v = np.zeros((B, 2 * n), dtype=np.uint32)
        body_l = np.zeros((B, 2 * n), dtype=np.uint8)
        body_v[:, 0::2] = head_val
        body_l[:, 0::2] = head_len
        body_u[:, 1::2] = unary
        body_v[:, 1::2] = tail_val
        body_l[:, 1::2] = tail_len

        pieces_u, pieces_v, pieces_l = [], [], []
        counts = []
        for row in range(B):
            ci = int(sel[row])
            ptype, oparam = _CANDIDATES[ci]
            pre_vals = [ptype]
            pre_lens = [8]
            if ptype == C.PREDICTOR_LPC:
                li = ci - _LPC_BASE
                chosen_order = max(1, min(int(used[li, row]), max_valid_order))
                pre_vals.append(chosen_order)
                pre_lens.append(8)
                for i in range(1, chosen_order + 1):
                    pre_vals.append(int(np.uint16(coeffs[li, row, i])))
                    pre_lens.append(16)
            else:
                pre_vals.append(oparam)
                pre_lens.append(8)
            p = int(best_p[row])
            nparts = 1 << p
            modes = sel_modes[row, :nparts]
            ks = sel_ks[row, :nparts]
            pre_vals.append(control_byte(int(modes[0]), p))
            pre_lens.append(8)
            pre_vals.extend(((int(m) << 5) | int(k)) for m, k in zip(modes, ks))
            pre_lens.extend([7] * nparts)

            npre = len(pre_vals)
            pieces_u.append(np.zeros(npre, dtype=np.uint32))
            pieces_v.append(np.asarray(pre_vals, dtype=np.uint32))
            pieces_l.append(np.asarray(pre_lens, dtype=np.uint8))
            pieces_u.append(body_u[row])
            pieces_v.append(body_v[row])
            pieces_l.append(body_l[row])
            counts.append(npre + 2 * n)

        eu = np.concatenate(pieces_u)
        ev = np.concatenate(pieces_v)
        el = np.concatenate(pieces_l)
        offsets = np.zeros(B + 1, dtype=np.uint64)
        np.cumsum(counts, out=offsets[1:])

        from .runtime.native import pack_streams_native

        packed = pack_streams_native(eu, ev, el, offsets)
        if packed is not None:
            return packed
        return [
            pack_stream(
                eu[int(offsets[i]) : int(offsets[i + 1])],
                ev[int(offsets[i]) : int(offsets[i + 1])],
                el[int(offsets[i]) : int(offsets[i + 1])],
            )
            for i in range(B)
        ]


# ======================================================================= frame


class FrameEncoder:
    """Whole-file encoder: block planning, per-block stereo decisions,
    v3 table assembly (lac/encoder.cpp:215-466).

    The reference's thread pool becomes the batch dimension: channel
    blocks are grouped by length and encoded as arrays; the uncertain
    per-block stereo decision runs as a second wave.
    """

    def __init__(self, order=12, stereo_mode=C.STEREO_PER_BLOCK, sample_rate=44100,
                 bit_depth=16, xp=np, mesh=None):
        self.order = order
        self.stereo_mode = stereo_mode
        self.sample_rate = sample_rate
        self.bit_depth = bit_depth
        self.mesh = mesh  # optional jax.sharding.Mesh: shard plan batches
        self.zero_run_enabled = True
        self.partitioning_enabled = True
        self.thread_count = 0
        self.debug_lpc = False
        self.debug_stereo_est = False
        self.debug_partitions = False
        # suppress one-shot cold-start routing for this encoder (serve
        # warm jobs: sending the warm encode to the native planner is
        # exactly what warming exists to avoid; an instance flag instead
        # of env mutation keeps concurrent jobs' routing deterministic)
        self.suppress_cold_route = False
        # cross-file pooled serving (lac_tpu.pool): precomputed plane
        # results ({block: {slot: bytes}}, {block: flag}, {block: bool})
        # consumed once by the next encode() instead of running the
        # device plane pipeline for this file alone
        self._injected_planes = None
        self.xp = xp

    def set_zero_run_enabled(self, enabled):
        self.zero_run_enabled = enabled

    def set_partitioning_enabled(self, enabled):
        self.partitioning_enabled = enabled

    def set_thread_count(self, n):
        self.thread_count = n

    def set_debug_lpc(self, enabled):
        self.debug_lpc = enabled

    def set_debug_stereo_est(self, enabled):
        self.debug_stereo_est = enabled

    def set_debug_partitions(self, enabled):
        self.debug_partitions = enabled

    def set_mesh(self, mesh):
        """Shard every plan batch over ``mesh`` (1-D device mesh, block
        axis = data parallelism). Output bytes are identical to the
        single-device path — sharding must never change the stream."""
        self.mesh = mesh

    def _validate(self, left, right):
        if len(left) == 0:
            raise ValueError("left channel must not be empty")
        if len(right) and len(right) != len(left):
            raise ValueError(
                f"right channel size ({len(right)}) must match left channel size ({len(left)})"
            )
        if self.sample_rate not in C.SUPPORTED_SAMPLE_RATES:
            raise ValueError(f"unsupported sample rate: {self.sample_rate}")
        if self.bit_depth not in C.SUPPORTED_BIT_DEPTHS:
            raise ValueError(f"unsupported bit depth: {self.bit_depth}")
        if self.stereo_mode > 2:
            raise ValueError(f"unsupported stereo mode: {self.stereo_mode}")
        lo, hi = C.pcm_range(self.bit_depth)
        for name, ch in (("left", left), ("right", right)):
            if len(ch) and (int(ch.min()) < lo or int(ch.max()) > hi):
                raise ValueError(f"{name} sample is outside the configured PCM bit depth")

    def encode(self, left, right=()):
        """Encode PCM channel vectors to a complete .lac frame (bytes)."""
        with _dbg.device_trace():
            return self._encode_impl(left, right)

    def _encode_impl(self, left, right=()):
        from .ops.stereo import estimate_stereo_mode, ms_transform

        xp = self.xp
        _dbg.timing_reset()
        left = np.ascontiguousarray(left, dtype=np.int32)
        right = np.ascontiguousarray(right, dtype=np.int32) if len(right) else np.empty(0, np.int32)
        self._validate(left, right)

        is_stereo = len(right) > 0
        stereo_mode = self.stereo_mode if is_stereo else 0
        force_ms = is_stereo and stereo_mode == C.STEREO_MS
        per_block = is_stereo and stereo_mode == C.STEREO_PER_BLOCK

        # block plan: fixed 16384-sample windows
        n = len(left)
        starts = list(range(0, n, C.MAX_BLOCK_SIZE))
        sizes = [min(C.MAX_BLOCK_SIZE, n - s) for s in starts]
        nblocks = len(starts)

        # device-resident plane pipeline for the full-size block prefix:
        # planes (L/R/M/S), stereo decisions, probes, and plans all stay
        # on device; only flags/lags/plan metadata cross the tunnel.
        plane_payloads, plane_flags, plane_uncertain = {}, {}, {}
        nfull = nblocks - (1 if sizes[-1] != C.MAX_BLOCK_SIZE else 0)
        from . import device_pipeline as _dp

        # one-shot cold-start routing: in a process that has not yet
        # loaded the device executables, short inputs take the native
        # host planner — executable loading costs many seconds, which a
        # one-shot CLI encode of a short file can never amortize. The
        # first long encode (or LAC_TPU_COLD_BLOCKS=0) warms the process
        # and every later encode uses the device path regardless of size.
        if is_jax(xp) and not self.suppress_cold_route and _cold_route(nblocks):
            xp = np

        injected, self._injected_planes = self._injected_planes, None
        if injected is not None:
            # cross-file pooled serving: this file's full blocks were
            # planned inside a shared device wave (lac_tpu.pool);
            # per-block bytes are independent of batching, so the result
            # is identical to running the plane pipeline for this file
            plane_payloads, plane_flags, plane_uncertain = injected
            assert all(0 <= b < nfull for b in plane_payloads), "injected planes out of range"
        elif nfull >= 1 and is_jax(xp) and _dp.applicable(self, nfull):
            kind = (
                "mono" if not is_stereo
                else ("ms" if force_ms else ("auto" if per_block else "lr"))
            )
            with _dbg.phase("plane_pipeline"):
                plane_payloads, plane_flags, plane_uncertain = _dp.encode_full_blocks(
                    self, left, right, nfull, kind
                )

        # ---------------- lane planning
        # each lane: (block_idx, slot, start, size, data_kind)
        # slots order the channel payloads inside a block.
        lanes = []  # (length, array) to encode
        lane_meta = []  # (block_idx, slot)
        block_flags = [None] * nblocks  # per-block stereo flag (mode 2)
        deferred = []  # blocks needing wave B (probe-resolved)

        def add_lane(block_idx, slot, data):
            lanes.append(np.asarray(data, dtype=np.int32))
            lane_meta.append((block_idx, slot))

        def lr_channels(s, sz):
            if is_stereo:
                return [left[s : s + sz], right[s : s + sz]]
            return [left[s : s + sz]]

        def ms_channels(s, sz):
            m, sd = ms_transform(left[s : s + sz], right[s : s + sz])
            return [np.asarray(m), np.asarray(sd)]

        probe_lanes = []  # (block_idx, variant, data) for uncertain big blocks
        dual_lanes = []  # (block_idx, variant, slot, data) for uncertain small blocks
        spec_lanes = []  # (block_idx, variant, slot, data): speculative fulls

        _stereo_phase = _dbg.phase("stereo_estimate")
        _stereo_phase.__enter__()
        if per_block:
            # proxy decision for every block: full blocks in batched
            # chunks fanned over a thread pool (numpy releases the GIL
            # on the big elementwise passes), odd-sized tail separately
            decisions = [None] * nblocks
            full = [
                bi for bi, sz in enumerate(sizes)
                if sz == C.MAX_BLOCK_SIZE and bi not in plane_payloads
            ]
            if full:
                nfull = len(full)
                lmat = left[: nfull * C.MAX_BLOCK_SIZE].reshape(nfull, C.MAX_BLOCK_SIZE)
                rmat = right[: nfull * C.MAX_BLOCK_SIZE].reshape(nfull, C.MAX_BLOCK_SIZE)

                from .runtime.native import stereo_estimate_native

                nat = stereo_estimate_native(lmat, rmat, self.thread_count)
                if nat is not None:  # one native pass: ~100x the numpy path
                    cm_all, un_all = nat
                    results = [(cm_all, un_all)]
                    bounds = [(0, nfull)]
                else:
                    def _decide(lo, hi):
                        return estimate_stereo_mode(
                            lmat[lo:hi], rmat[lo:hi], np.ones((hi - lo, C.MAX_BLOCK_SIZE), bool)
                        )

                    chunk = 64
                    bounds = [(lo, min(lo + chunk, nfull)) for lo in range(0, nfull, chunk)]
                    if len(bounds) > 1:
                        from concurrent.futures import ThreadPoolExecutor

                        workers = self.thread_count or (_os.cpu_count() or 4)
                        with ThreadPoolExecutor(max_workers=min(workers, len(bounds))) as ex:
                            results = list(ex.map(lambda b: _decide(*b), bounds))
                    else:
                        results = [_decide(*b) for b in bounds]
                for (lo, hi), (cm, un) in zip(bounds, results):
                    for j in range(lo, hi):
                        decisions[full[j]] = (bool(cm[j - lo]), bool(un[j - lo]))
            for bi, (s, sz) in enumerate(zip(starts, sizes)):
                if decisions[bi] is None and bi not in plane_payloads:
                    cm, un = estimate_stereo_mode(
                        left[s : s + sz][None, :], right[s : s + sz][None, :], np.ones((1, sz), bool)
                    )
                    decisions[bi] = (bool(np.asarray(cm)[0]), bool(np.asarray(un)[0]))
        _stereo_phase.__exit__(None, None, None)
        _lane_phase = _dbg.phase("lane_build")
        _lane_phase.__enter__()
        for bi, (s, sz) in enumerate(zip(starts, sizes)):
            if bi in plane_payloads:
                if per_block:
                    block_flags[bi] = plane_flags[bi]
                continue
            if not is_stereo:
                add_lane(bi, 0, left[s : s + sz])
            elif force_ms or (per_block and not decisions[bi][1] and decisions[bi][0]):
                chans = ms_channels(s, sz)
                if per_block:
                    block_flags[bi] = 1
                for slot, chd in enumerate(chans):
                    add_lane(bi, slot, chd)
            elif (not per_block) or (per_block and not decisions[bi][1] and not decisions[bi][0]):
                chans = lr_channels(s, sz)
                if per_block:
                    block_flags[bi] = 0
                for slot, chd in enumerate(chans):
                    add_lane(bi, slot, chd)
            else:
                # uncertain
                if sz <= C.STEREO_FULL_COMPARISON_LIMIT:
                    for slot, chd in enumerate(lr_channels(s, sz)):
                        dual_lanes.append((bi, "lr", slot, chd))
                    for slot, chd in enumerate(ms_channels(s, sz)):
                        dual_lanes.append((bi, "ms", slot, chd))
                else:
                    probe_starts = (s, s + (sz - C.STEREO_PROBE_SIZE) // 2, s + sz - C.STEREO_PROBE_SIZE)
                    for ps in probe_starts:
                        for slot, chd in enumerate(lr_channels(ps, C.STEREO_PROBE_SIZE)):
                            probe_lanes.append((bi, "lr", chd))
                        for slot, chd in enumerate(ms_channels(ps, C.STEREO_PROBE_SIZE)):
                            probe_lanes.append((bi, "ms", chd))
                    # speculate both full variants in wave A: the probe
                    # comparison only picks which payload to keep, and a
                    # second device round trip costs more than the extra
                    # lanes (the reference instead pays a second serial
                    # CPU encode, lac/encoder.cpp:366-372)
                    for slot, chd in enumerate(lr_channels(s, sz)):
                        spec_lanes.append((bi, "lr", slot, chd))
                    for slot, chd in enumerate(ms_channels(s, sz)):
                        spec_lanes.append((bi, "ms", slot, chd))
                    deferred.append(bi)
        _lane_phase.__exit__(None, None, None)

        enc = ChannelBlockEncoder(
            self.zero_run_enabled, self.partitioning_enabled, xp=xp,
            thread_count=self.thread_count, mesh=self.mesh
        )

        def encode_lanes(data_list):
            """Group by length, run all jobs through the three pipeline
            phases globally — uploads, device compute, async D2H copies,
            and host packing overlap across every group."""
            out = [None] * len(data_list)
            by_len = {}
            for i, d in enumerate(data_list):
                by_len.setdefault(len(d), []).append(i)
            staged = []
            with _dbg.phase("group_stage"):
                for length, idxs in by_len.items():
                    group = np.stack([data_list[i] for i in idxs])
                    staged.append((idxs, enc.make_jobs(group)))
            for _, jobs in staged:
                for j in jobs:
                    j.dispatch_autocorr()
            for _, jobs in staged:
                for j in jobs:
                    j.dispatch_plan()
            for idxs, jobs in staged:
                payloads = [pb for j in jobs for pb in j.finish()]
                for i, pb in zip(idxs, payloads):
                    out[i] = pb
            return out

        # single wave: certain lanes + probes + dual/speculative fulls
        wave_a = (
            [d for d in lanes]
            + [d for (_, _, d) in probe_lanes]
            + [d for (_, _, _, d) in dual_lanes]
            + [d for (_, _, _, d) in spec_lanes]
        )
        payloads_a = encode_lanes(wave_a)
        lane_payloads = payloads_a[: len(lanes)]
        off = len(lanes)
        probe_payloads = payloads_a[off : off + len(probe_lanes)]
        off += len(probe_lanes)
        dual_payloads = payloads_a[off : off + len(dual_lanes)]
        spec_payloads = payloads_a[off + len(dual_lanes) :]

        # resolve uncertain-small blocks: full dual comparison by bytes
        block_channel_payloads = {}
        for bi in range(nblocks):
            block_channel_payloads[bi] = {}
        for bi, chans in plane_payloads.items():
            block_channel_payloads[bi].update(chans)
        for (bi, slot), pb in zip(lane_meta, lane_payloads):
            block_channel_payloads[bi][slot] = pb

        dual_by_block = {}
        for (bi, variant, slot, _), pb in zip(dual_lanes, dual_payloads):
            dual_by_block.setdefault(bi, {}).setdefault(variant, {})[slot] = pb
        for bi, variants in dual_by_block.items():
            lr_bytes = b"".join(variants["lr"][s] for s in sorted(variants["lr"]))
            ms_bytes = b"".join(variants["ms"][s] for s in sorted(variants["ms"]))
            choose_ms = len(ms_bytes) < len(lr_bytes)
            block_flags[bi] = 1 if choose_ms else 0
            chosen = variants["ms"] if choose_ms else variants["lr"]
            for slot, pb in chosen.items():
                block_channel_payloads[bi][slot] = pb

        # resolve uncertain-big blocks: probe byte totals pick which
        # speculated full payload to keep (the loser is discarded)
        probe_by_block = {}
        for (bi, variant, _), pb in zip(probe_lanes, probe_payloads):
            probe_by_block.setdefault(bi, {"lr": 0, "ms": 0})
            probe_by_block[bi][variant] += len(pb)
        spec_by_block = {}
        for (bi, variant, slot, _), pb in zip(spec_lanes, spec_payloads):
            spec_by_block.setdefault(bi, {}).setdefault(variant, {})[slot] = pb
        for bi in deferred:
            choose_ms = probe_by_block[bi]["ms"] < probe_by_block[bi]["lr"]
            block_flags[bi] = 1 if choose_ms else 0
            for slot, pb in spec_by_block[bi]["ms" if choose_ms else "lr"].items():
                block_channel_payloads[bi][slot] = pb

        # ---------------- debug observability (reference debug-build
        # analogs: [stereo-est] lac/encoder.cpp:356-380; [debug-lpc]
        # block/encoder.cpp:824-835; [part-plan] block/encoder.cpp:558-582).
        # Everything printed is actual wire data / measured decisions.
        if self.debug_stereo_est and is_stereo:
            for bi in range(nblocks):
                flag = block_flags[bi]
                chosen = "MS" if (force_ms or flag == 1) else "LR"
                if per_block:
                    if bi in plane_uncertain:
                        un_flag = int(plane_uncertain[bi])
                    else:
                        un_flag = int(decisions[bi][1]) if decisions[bi] else 0
                    _dbg.debug_log(
                        f"[stereo-est] block={bi} uncertain={un_flag} chosen={chosen}"
                    )
                _dbg.debug_log(
                    f"[stereo-mode] global={stereo_mode} block={bi} mode_used={chosen}"
                )
        if self.debug_lpc or self.debug_partitions:
            from .format.inspect import parse_block_header

            for bi in range(nblocks):
                chans = block_channel_payloads[bi]
                for slot in sorted(chans):
                    info = parse_block_header(chans[slot], sizes[bi])
                    if info is None:
                        continue
                    if self.debug_lpc:
                        _dbg.debug_log(
                            f"[debug-lpc] block={sizes[bi]}"
                            f" chosen_order={info['order']}"
                            f" predictor={info['ptype']}"
                            f" part_order={info['partition_order']}"
                            f" bytes={len(chans[slot])}"
                        )
                    if self.debug_partitions:
                        parts = " ".join(
                            f"[{i} mode={m} k={k} len={ln}]"
                            for i, (m, k, ln) in enumerate(info["partitions"])
                        )
                        _dbg.debug_log(
                            f"[part-plan] block={bi} ch={slot}"
                            f" order={info['partition_order']}"
                            f" parts={len(info['partitions'])} {parts}"
                        )

        # ---------------- assembly
        from .format.header import FrameHeader

        hdr = FrameHeader(
            channels=2 if is_stereo else 1,
            stereo_mode=stereo_mode,
            sample_rate=self.sample_rate,
            bit_depth=self.bit_depth,
            version=C.FORMAT_VERSION,
        )
        with _dbg.phase("assembly"):
            # one flat parts list + vectorized big-endian table (the
            # wire table is byte-aligned 32-bit fields, BitWriter-
            # equivalent; the scalar writer is the readable spec)
            parts = []
            block_lens = np.empty(nblocks, np.int64)
            for bi in range(nblocks):
                blen = 0
                if per_block:
                    parts.append(bytes([block_flags[bi]]))
                    blen += 1
                chans = block_channel_payloads[bi]
                for slot in sorted(chans):
                    parts.append(chans[slot])
                    blen += len(chans[slot])
                block_lens[bi] = blen
            if block_lens.min() == 0 or block_lens.max() > 0xFFFFFFFF:
                raise RuntimeError("encoded block size is outside format limits")
            table = np.empty((nblocks, 2), dtype=">u4")
            table[:, 0] = np.asarray(sizes, np.int64)
            table[:, 1] = block_lens
            head = hdr.pack() + nblocks.to_bytes(4, "big") + table.tobytes()
            out = head + b"".join(parts)
        _dbg.timing_report(f"encode {n} frames x{2 if is_stereo else 1}ch")
        return out

"""Batched channel-block encoder + frame encoder.

The reference encodes one block at a time with per-sample loops
(block/encoder.cpp:313-838); here every stage is an array program over a
*group* of equal-length channel blocks (thousands in flight on TPU):

1. candidate residuals: fixed 0-4, FIR, LPC {4,6,8,10,12} — stencils and
   Q15 dots (predictors.py), one Levinson-Durbin recursion per block
   yielding all candidate orders (lpc.py);
2. exact cost models: shared adapted k-sequence per candidate (adapt.py)
   + rice/zr/bin/static reductions (costs.py);
3. selection: argmin with the reference's exact tie-breaks
   (encoder.cpp:352-359, 441-456);
4. partition sweep p=1..8 with stateless adaptation and the 5%
   decode-speed margins (encoder.cpp:486-552);
5. emission: per-token (head, unary, tail) arrays -> prefix-sum/scatter
   bit packing (bitio.pack).

Groups are keyed by block length, so no masking is needed inside a
group and XLA sees static shapes.
"""

import numpy as np

from .bitio.pack import pack_stream
from .format import constants as C
from .format.zigzag import zigzag_encode
from .ops import adapt, costs, lpc, predictors, runs
from .ops._backend import shift_right


def _pad_to_byte(bits, xp=np):
    return bits + ((xp.uint64(8) - (bits & xp.uint64(7))) & xp.uint64(7))


# candidate table: (predictor_type, order_param), in consideration order
_CANDIDATES = (
    [(C.PREDICTOR_FIXED, o) for o in range(5)]
    + [(C.PREDICTOR_FIR, C.FIR_ORDER)]
    + [(C.PREDICTOR_LPC, o) for o in C.LPC_ORDER_CANDIDATES]
)


class ChannelBlockEncoder:
    """Encodes groups of equal-length channel blocks to wire payloads."""

    def __init__(self, zero_run_enabled=True, partitioning_enabled=True, xp=np):
        self.zero_run_enabled = zero_run_enabled
        self.partitioning_enabled = partitioning_enabled
        self.xp = xp

    # ------------------------------------------------------------ candidates
    def _candidates(self, pcm):
        """Residuals + validity for every candidate.

        Returns (residuals (B, ncand, n) int32, valid (B, ncand) bool,
        coeffs (B, 13) int16 — the winning-order snapshot per LPC cand is
        stored per candidate in ``lpc_coeffs`` (ncand_lpc, B, 13),
        used_orders (ncand_lpc, B) int32).
        """
        xp = self.xp
        B, n = pcm.shape
        res_list, valid_list = [], []
        max_valid_order = min(32, n - 1) if n > 1 else 0

        for o in range(5):
            res_list.append(predictors.fixed_residual(pcm, o, xp=xp))
            valid_list.append(xp.ones(B, dtype=bool))
        res_list.append(predictors.fir_residual(pcm, xp=xp))
        valid_list.append(xp.ones(B, dtype=bool))

        lpc_coeffs = []
        lpc_used = []
        need_lpc = any(c <= max_valid_order for c in C.LPC_ORDER_CANDIDATES)
        analysis = lpc.analyze_blocks(np.asarray(pcm), max_order=12, xp=xp) if need_lpc else None
        for cand in C.LPC_ORDER_CANDIDATES:
            if cand > max_valid_order:
                res_list.append(xp.zeros((B, n), dtype=xp.int32))
                valid_list.append(xp.zeros(B, dtype=bool))
                lpc_coeffs.append(np.zeros((B, 13), np.int16))
                lpc_used.append(np.zeros(B, np.int32))
                continue
            coeffs, ach, stable = lpc.candidate_coeffs_q15(analysis, cand)
            cfull = np.zeros((B, 13), np.int16)
            cfull[:, : cand + 1] = coeffs
            residual, in_range = predictors.lpc_residual(pcm, xp.asarray(cfull), 12, xp=xp)
            used = np.asarray(ach).copy()
            ok = np.asarray(in_range)
            if not ok.all():
                # fallback order ladder (lpc.cpp:188-229) — unreachable for
                # validated PCM input; handled per-lane on the host.
                for row in np.nonzero(~ok)[0]:
                    used[row], residual_row = self._ladder_fallback(
                        np.asarray(pcm[row]), cfull[row], int(used[row])
                    )
                    residual = residual.at[row].set(residual_row) if hasattr(residual, "at") else residual
                    if not hasattr(residual, "at"):
                        residual[row] = residual_row
                    cfull[row, used[row] + 1 :] = 0
            res_list.append(residual)
            valid_list.append(xp.asarray(stable & (used > 0)))
            lpc_coeffs.append(cfull)
            lpc_used.append(used.astype(np.int32))

        residuals = xp.stack(res_list, axis=1)
        valid = xp.stack(valid_list, axis=1)
        return residuals, valid, lpc_coeffs, lpc_used, max_valid_order

    @staticmethod
    def _ladder_fallback(x, coeffs, start_order):
        """Host-side residual fallback ladder for int32-range overflow."""
        attempts = [start_order]
        for cand in C.LPC_FALLBACK_ORDERS:
            if cand < start_order and cand not in attempts:
                attempts.append(cand)
        if 0 not in attempts:
            attempts.append(0)
        for o in attempts:
            if o <= 0:
                return 0, x.astype(np.int32)
            c = coeffs.copy()
            c[o + 1 :] = 0
            r, ok = predictors.lpc_residual(x[None, :], c[None, :], 12)
            if bool(np.asarray(ok)[0]):
                return o, np.asarray(r)[0]
        return 0, x.astype(np.int32)

    # ------------------------------------------------------------- scoring
    def _score_whole_block(self, residuals):
        """Whole-block stateful scores for (B, ncand, n) residuals."""
        xp = self.xp
        n = residuals.shape[-1]
        u = zigzag_encode(residuals).astype(xp.uint64)

        # initial k: argmin over k<=12 of cost on the first min(256, n)
        scan = min(C.INITIAL_SCAN_COUNT, n)
        u_head = u[..., :scan]
        head_costs = xp.stack(
            [xp.sum((u_head >> xp.uint64(k)) + xp.uint64(1 + k), axis=-1) for k in range(C.INITIAL_MAX_K + 1)],
            axis=-1,
        )
        initial_k = xp.argmin(head_costs, axis=-1).astype(xp.int32)

        k_after = adapt.k_after_stateful(u, xp=xp)
        k_used = adapt.k_used_from_after(k_after, initial_k, xp=xp)

        pos = xp.arange(n, dtype=xp.int64)
        z = residuals == 0
        run_len, long_run, run_start = runs.zero_run_info(z, pos, xp.int64(n), xp=xp)

        rice_per = costs.rice_cost_per_sample(u, k_used, xp=xp)
        rice_bits = xp.sum(rice_per, axis=-1)

        absv = xp.abs(residuals.astype(xp.int64))
        bin_per = xp.where(absv == 0, xp.uint64(2), xp.where(absv <= 2, xp.uint64(3), xp.uint64(2) + rice_per))
        bin_bits = xp.sum(bin_per, axis=-1)

        esc_shift = xp.minimum(k_used + C.ESCAPE_K_OFFSET, xp.int32(C.ESCAPE_K_CAP))
        esc = xp.uint64(1) << esc_shift.astype(xp.uint64)
        token_per = xp.uint64(2) + xp.where(u > esc, xp.uint64(32), rice_per)
        run_per = xp.uint64(2) + ((run_len - C.ZERO_RUN_MIN_LENGTH).astype(xp.uint64) >> xp.uint64(C.ZERO_RUN_LENGTH_K)) + xp.uint64(1 + C.ZERO_RUN_LENGTH_K)
        zr_per = xp.where(run_start, run_per, xp.where(long_run, xp.uint64(0), token_per))
        zr_bits = xp.sum(zr_per, axis=-1)
        has_run = xp.any(run_start, axis=-1)

        static_costs = xp.stack(
            [xp.sum((u >> xp.uint64(k)) + xp.uint64(1 + k), axis=-1) for k in range(C.MAX_STATIC_K + 1)],
            axis=-1,
        )
        static_k = xp.argmin(static_costs, axis=-1).astype(xp.int32)
        static_bits = xp.min(static_costs, axis=-1)

        return {
            "u": u,
            "initial_k": initial_k,
            "k_used": k_used,
            "rice": rice_bits,
            "zr": zr_bits,
            "bin": bin_bits,
            "has_run": has_run,
            "static_k": static_k,
            "static": static_bits,
        }

    # ------------------------------------------------------------ selection
    def _select_candidate(self, scores, valid):
        """Reference consideration order + tie-breaks (encoder.cpp:337-419)."""
        xp = self.xp
        zr_eff = xp.where(
            xp.asarray(self.zero_run_enabled) & scores["has_run"], scores["zr"], scores["rice"]
        )
        best_bits_all = xp.minimum(
            xp.minimum(scores["rice"], scores["static"]), xp.minimum(zr_eff, scores["bin"])
        )  # (B, ncand)
        ptype = xp.asarray([t for t, _ in _CANDIDATES], dtype=xp.int32)

        B = best_bits_all.shape[0]
        UMAX = xp.uint64(0xFFFFFFFFFFFFFFFF)
        sel_bits = xp.full((B,), UMAX, dtype=xp.uint64)
        sel_type = xp.full((B,), xp.int32(127), dtype=xp.int32)
        sel_idx = xp.zeros((B,), dtype=xp.int32)
        have = xp.zeros((B,), dtype=bool)
        for ci in range(len(_CANDIDATES)):
            bits = best_bits_all[:, ci]
            ok = valid[:, ci]
            better = ok & (~have | (bits < sel_bits) | ((bits == sel_bits) & (ptype[ci] < sel_type)))
            sel_bits = xp.where(better, bits, sel_bits)
            sel_type = xp.where(better, ptype[ci], sel_type)
            sel_idx = xp.where(better, xp.int32(ci), sel_idx)
            have = have | ok
        return sel_idx, have, zr_eff

    # ----------------------------------------------------- base mode choice
    def _base_mode(self, rice, zr_eff, bin_, static_, has_run, initial_k, static_k):
        """Whole-block residual-mode choice (encoder.cpp:441-456)."""
        xp = self.xp
        allow_zr = xp.asarray(self.zero_run_enabled) & has_run
        best = rice
        mode = xp.zeros(rice.shape, dtype=xp.int32)
        take_zr = allow_zr & (zr_eff <= best)
        best = xp.where(take_zr, zr_eff, best)
        mode = xp.where(take_zr, xp.int32(C.MODE_ZERO_RUN), mode)
        take_bin = bin_ < best
        best = xp.where(take_bin, bin_, best)
        mode = xp.where(take_bin, xp.int32(C.MODE_BIN), mode)
        take_static = static_ < best
        best = xp.where(take_static, static_, best)
        mode = xp.where(take_static, xp.int32(C.MODE_STATIC), mode)
        k = xp.where(take_static, static_k, initial_k)
        return mode, k, best

    # ------------------------------------------------------ partition sweep
    def _partition_geometry(self, n, p):
        xp = self.xp
        base = n >> p
        nparts = 1 << p
        idx = xp.arange(n, dtype=xp.int64)
        seg_idx = xp.minimum(idx // base, xp.int64(nparts - 1))
        seg_start = seg_idx * base
        pos = idx - seg_start
        seg_end = xp.where(seg_idx == nparts - 1, xp.int64(n), seg_start + base)
        starts_1d = xp.minimum(xp.arange(nparts, dtype=xp.int64) * base, xp.int64(n))
        ends_1d = xp.concatenate([starts_1d[1:], xp.asarray([n], dtype=xp.int64)])
        return base, nparts, seg_idx, pos, seg_end, starts_1d, ends_1d

    def _segsum(self, per_sample, starts_1d, ends_1d):
        """Per-segment sums from an inclusive cumsum (B, n) -> (B, S)."""
        xp = self.xp
        cs = xp.cumsum(per_sample, axis=-1)
        csz = xp.concatenate([xp.zeros(per_sample.shape[:-1] + (1,), dtype=per_sample.dtype), cs], axis=-1)
        return csz[..., ends_1d] - csz[..., starts_1d]

    def _partition_choices(self, v, u, p, n):
        """Per-partition (mode, k, bits) for partition order p
        (encoder.cpp:495-526)."""
        xp = self.xp
        base, nparts, seg_idx, pos, seg_end, starts_1d, ends_1d = self._partition_geometry(n, p)

        # per-partition initial k: first min(256, len) samples
        head_mask = (pos < C.INITIAL_SCAN_COUNT).astype(xp.uint64)
        head_costs = xp.stack(
            [self._segsum(((u >> xp.uint64(k)) + xp.uint64(1 + k)) * head_mask, starts_1d, ends_1d) for k in range(C.INITIAL_MAX_K + 1)],
            axis=-1,
        )
        init_k_seg = xp.argmin(head_costs, axis=-1).astype(xp.int32)  # (B, S)

        init_k_per_sample = init_k_seg[..., seg_idx] if init_k_seg.ndim == 2 else init_k_seg[seg_idx]
        k_used = adapt.k_used_stateless_segmented(u, pos, init_k_per_sample, xp=xp)

        z = v == 0
        run_len, long_run, run_start = runs.zero_run_info(z, pos, seg_end, xp=xp)

        rice_per = costs.rice_cost_per_sample(u, k_used, xp=xp)
        rice_bits = self._segsum(rice_per, starts_1d, ends_1d)

        absv = xp.abs(v.astype(xp.int64))
        bin_per = xp.where(absv == 0, xp.uint64(2), xp.where(absv <= 2, xp.uint64(3), xp.uint64(2) + rice_per))
        bin_bits = self._segsum(bin_per, starts_1d, ends_1d)

        esc_shift = xp.minimum(k_used + C.ESCAPE_K_OFFSET, xp.int32(C.ESCAPE_K_CAP))
        esc = xp.uint64(1) << esc_shift.astype(xp.uint64)
        token_per = xp.uint64(2) + xp.where(u > esc, xp.uint64(32), rice_per)
        run_per = xp.uint64(2) + ((run_len - C.ZERO_RUN_MIN_LENGTH).astype(xp.uint64) >> xp.uint64(C.ZERO_RUN_LENGTH_K)) + xp.uint64(1 + C.ZERO_RUN_LENGTH_K)
        zr_per = xp.where(run_start, run_per, xp.where(long_run, xp.uint64(0), token_per))
        zr_bits = self._segsum(zr_per, starts_1d, ends_1d)
        has_run = self._segsum(run_start.astype(xp.uint64), starts_1d, ends_1d) > 0

        static_costs = xp.stack(
            [self._segsum((u >> xp.uint64(k)) + xp.uint64(1 + k), starts_1d, ends_1d) for k in range(C.MAX_STATIC_K + 1)],
            axis=-1,
        )
        static_k = xp.argmin(static_costs, axis=-1).astype(xp.int32)
        static_bits = xp.min(static_costs, axis=-1)

        # per-partition mode choice (strict < for zr/bin; static wins
        # within the 5% decode-speed margin)
        allow_zr = xp.asarray(self.zero_run_enabled) & has_run
        mode = xp.zeros(rice_bits.shape, dtype=xp.int32)
        bits = rice_bits
        kk = init_k_seg
        take_zr = allow_zr & (zr_bits < bits)
        bits = xp.where(take_zr, zr_bits, bits)
        mode = xp.where(take_zr, xp.int32(C.MODE_ZERO_RUN), mode)
        take_bin = bin_bits < bits
        bits = xp.where(take_bin, bin_bits, bits)
        mode = xp.where(take_bin, xp.int32(C.MODE_BIN), mode)
        take_static = (static_bits < bits) | (static_bits <= bits + bits // xp.uint64(C.DECODE_SPEED_MARGIN_DIVISOR))
        bits = xp.where(take_static, static_bits, bits)
        mode = xp.where(take_static, xp.int32(C.MODE_STATIC), mode)
        kk = xp.where(take_static, static_k, kk)
        return mode, kk, bits

    # ------------------------------------------------------------ public API
    def encode_group(self, pcm):
        """Encode a (B, n) int32 group; returns list of payload bytes."""
        xp = self.xp
        pcm = xp.asarray(pcm, dtype=xp.int32)
        B, n = pcm.shape

        residuals, valid, lpc_coeffs, lpc_used, max_valid_order = self._candidates(pcm)
        scores = self._score_whole_block(residuals)
        sel_idx, _, zr_eff = self._select_candidate(scores, valid)

        gather = lambda a: xp.take_along_axis(a, sel_idx[:, None], axis=1)[:, 0] if a.ndim == 2 else xp.take_along_axis(a, sel_idx[:, None, None], axis=1)[:, 0]
        v_w = gather(residuals)
        u_w = gather(scores["u"])
        initial_k_w = gather(scores["initial_k"])
        static_k_w = gather(scores["static_k"])
        rice_w = gather(scores["rice"])
        zr_w = gather(zr_eff)
        bin_w = gather(scores["bin"])
        static_w = gather(scores["static"])
        has_run_w = gather(scores["has_run"])

        base_mode, base_k, base_best = self._base_mode(
            rice_w, zr_w, bin_w, static_w, has_run_w, initial_k_w, static_k_w
        )

        # ---- partition sweep
        best_p = xp.zeros(B, dtype=xp.int32)
        legacy_total = _pad_to_byte(base_best + xp.uint64(8 + 7), xp=xp)
        best_total = legacy_total
        max_p = 0
        if self.partitioning_enabled and n >= C.MIN_PARTITION_SIZE:
            from .format.partitions import max_partition_order_for_block

            max_p = max_partition_order_for_block(n)
        all_modes, all_ks = {}, {}
        for p in range(1, max_p + 1):
            mode_p, k_p, bits_p = self._partition_choices(v_w, u_w, p, n)
            all_modes[p], all_ks[p] = mode_p, k_p
            nparts = 1 << p
            total = _pad_to_byte(xp.sum(bits_p, axis=-1) + xp.uint64(8 + 7 * nparts), xp=xp)
            margin = best_total // xp.uint64(C.DECODE_SPEED_MARGIN_DIVISOR)
            accept = (total < best_total) | ((total <= best_total + margin) & (best_p == 0)) | ((total == best_total) & (p < best_p))
            best_total = xp.where(accept, total, best_total)
            best_p = xp.where(accept, xp.int32(p), best_p)

        # ---- emission (host)
        v_np = np.asarray(v_w)
        u_np = np.asarray(u_w)
        sel_np = np.asarray(sel_idx)
        base_mode_np = np.asarray(base_mode)
        base_k_np = np.asarray(base_k)
        init_k_np = np.asarray(initial_k_w)
        best_p_np = np.asarray(best_p)
        modes_np = {p: np.asarray(m) for p, m in all_modes.items()}
        ks_np = {p: np.asarray(k) for p, k in all_ks.items()}

        out = []
        for row in range(B):
            ci = int(sel_np[row])
            ptype, oparam = _CANDIDATES[ci]
            if ptype == C.PREDICTOR_LPC:
                li = ci - 6
                used = int(lpc_used[li][row])
                chosen_order = max(1, min(used, max_valid_order))
                coeffs = lpc_coeffs[li][row]
            else:
                chosen_order = oparam
                coeffs = None
            p = int(best_p_np[row])
            if p == 0:
                part_modes = [int(base_mode_np[row])]
                part_ks = [int(base_k_np[row])]
                part_sizes = [n]
                init_k = int(init_k_np[row])
            else:
                nparts = 1 << p
                part_modes = [int(m) for m in modes_np[p][row, :nparts]]
                part_ks = [int(k) for k in ks_np[p][row, :nparts]]
                base = n >> p
                part_sizes = [base] * (nparts - 1) + [n - base * (nparts - 1)]
                init_k = None
            out.append(
                _emit_channel_payload(
                    v_np[row], u_np[row], ptype, chosen_order, coeffs,
                    p, part_modes, part_ks, part_sizes, init_k,
                )
            )
        return out


def _emit_channel_payload(v, u, ptype, order, coeffs, p, part_modes, part_ks, part_sizes, base_init_k):
    """Build the channel-block byte payload (encoder.cpp:773-822)."""
    n = len(v)
    # ---- header elements
    pre_vals = [ptype, order]
    pre_lens = [8, 8]
    if ptype == C.PREDICTOR_LPC:
        for i in range(1, order + 1):
            pre_vals.append(int(np.uint16(coeffs[i])))
            pre_lens.append(16)
    from .format.partitions import control_byte

    pre_vals.append(control_byte(part_modes[0], p))
    pre_lens.append(8)
    for m, k in zip(part_modes, part_ks):
        pre_vals.append((m << 5) | k)
        pre_lens.append(7)

    # ---- per-sample k sequence for the chosen plan
    if p == 0:
        k_after = adapt.k_after_stateful(u[None, :])[0]
        k_used = np.asarray(adapt.k_used_from_after(k_after[None, :], base_init_k)[0])
        pos = np.arange(n, dtype=np.int64)
        seg_idx = np.zeros(n, dtype=np.int64)
        seg_end = np.full(n, n, dtype=np.int64)
    else:
        base = n >> p
        nparts = 1 << p
        idx = np.arange(n, dtype=np.int64)
        seg_idx = np.minimum(idx // base, nparts - 1)
        pos = idx - seg_idx * base
        seg_end = np.where(seg_idx == nparts - 1, n, (seg_idx + 1) * base)
        init_per_sample = np.asarray(part_ks, dtype=np.int32)[seg_idx]
        k_used = np.asarray(
            adapt.k_used_stateless_segmented(u[None, :], pos[None, :], init_per_sample[None, :])[0]
        )

    mode_per_sample = np.asarray(part_modes, dtype=np.int32)[seg_idx]
    k_field = np.asarray(part_ks, dtype=np.int32)[seg_idx]
    # static partitions use the fixed k for every token
    k_eff = np.where(mode_per_sample == C.MODE_STATIC, k_field, k_used).astype(np.uint64)

    z = v == 0
    run_len, long_run, run_start = runs.zero_run_info(z, pos, seg_end)

    q = np.where(k_eff >= 32, np.uint64(0), u >> k_eff)
    r_mask = np.where(k_eff >= 64, np.uint64(0), (np.uint64(1) << k_eff) - np.uint64(1))
    rem = u & r_mask

    head_val = np.zeros(n, dtype=np.uint64)
    head_len = np.zeros(n, dtype=np.int64)
    unary = np.zeros(n, dtype=np.int64)
    tail_val = np.zeros(n, dtype=np.uint64)
    tail_len = np.zeros(n, dtype=np.int64)

    is_rice = (mode_per_sample == C.MODE_RICE) | (mode_per_sample == C.MODE_STATIC)
    unary = np.where(is_rice, q.astype(np.int64), unary)
    tail_val = np.where(is_rice, rem, tail_val)
    tail_len = np.where(is_rice, (k_eff + np.uint64(1)).astype(np.int64), tail_len)

    is_bin = mode_per_sample == C.MODE_BIN
    absv = np.abs(v.astype(np.int64))
    sign = (v < 0).astype(np.uint64)
    b0 = absv == 0
    b1 = absv == 1
    b2 = absv == 2
    bf = absv > 2
    head_val = np.where(is_bin & b0, np.uint64(C.BIN_TAG_ZERO), head_val)
    head_len = np.where(is_bin & b0, 2, head_len)
    head_val = np.where(is_bin & b1, (np.uint64(C.BIN_TAG_ONE) << np.uint64(1)) | sign, head_val)
    head_len = np.where(is_bin & b1, 3, head_len)
    head_val = np.where(is_bin & b2, (np.uint64(C.BIN_TAG_TWO) << np.uint64(1)) | sign, head_val)
    head_len = np.where(is_bin & b2, 3, head_len)
    head_val = np.where(is_bin & bf, np.uint64(C.BIN_TAG_FALLBACK), head_val)
    head_len = np.where(is_bin & bf, 2, head_len)
    unary = np.where(is_bin & bf, q.astype(np.int64), unary)
    tail_val = np.where(is_bin & bf, rem, tail_val)
    tail_len = np.where(is_bin & bf, (k_eff + np.uint64(1)).astype(np.int64), tail_len)

    is_zr = mode_per_sample == C.MODE_ZERO_RUN
    esc_shift = np.minimum(k_eff + np.uint64(C.ESCAPE_K_OFFSET), np.uint64(C.ESCAPE_K_CAP))
    escape = is_zr & ~long_run & (u > (np.uint64(1) << esc_shift))
    normal = is_zr & ~long_run & ~escape
    # run token at run starts
    rl = (run_len - C.ZERO_RUN_MIN_LENGTH).astype(np.uint64)
    zr_run = is_zr & run_start
    head_val = np.where(zr_run, np.uint64(C.ZR_TAG_RUN), head_val)
    head_len = np.where(zr_run, 2, head_len)
    unary = np.where(zr_run, (rl >> np.uint64(C.ZERO_RUN_LENGTH_K)).astype(np.int64), unary)
    tail_val = np.where(zr_run, rl & np.uint64(3), tail_val)
    tail_len = np.where(zr_run, 1 + C.ZERO_RUN_LENGTH_K, tail_len)
    # in-run non-start samples emit nothing
    silent = is_zr & long_run & ~run_start
    head_len = np.where(silent, 0, head_len)
    unary = np.where(silent, 0, unary)
    tail_len = np.where(silent, 0, tail_len)
    head_val = np.where(silent, np.uint64(0), head_val)
    # escape token
    head_val = np.where(escape, np.uint64(C.ZR_TAG_ESCAPE), head_val)
    head_len = np.where(escape, 2, head_len)
    unary = np.where(escape, 0, unary)
    tail_val = np.where(escape, u, tail_val)
    tail_len = np.where(escape, 32, tail_len)
    # normal token
    head_val = np.where(normal, np.uint64(C.ZR_TAG_NORMAL), head_val)
    head_len = np.where(normal, 2, head_len)
    unary = np.where(normal, q.astype(np.int64), unary)
    tail_val = np.where(normal, rem, tail_val)
    tail_len = np.where(normal, (k_eff + np.uint64(1)).astype(np.int64), tail_len)

    # interleave: prefix fields, then per-sample (head, unary+tail) pairs
    npre = len(pre_vals)
    total = npre + 2 * n
    eu = np.zeros(total, dtype=np.int64)
    ev = np.zeros(total, dtype=np.uint64)
    el = np.zeros(total, dtype=np.int64)
    ev[:npre] = np.asarray(pre_vals, dtype=np.uint64)
    el[:npre] = np.asarray(pre_lens, dtype=np.int64)
    ev[npre::2] = head_val
    el[npre::2] = head_len
    eu[npre + 1 :: 2] = unary
    ev[npre + 1 :: 2] = tail_val
    el[npre + 1 :: 2] = tail_len
    return pack_stream(eu, ev, el)


# ======================================================================= frame


class FrameEncoder:
    """Whole-file encoder: block planning, per-block stereo decisions,
    v3 table assembly (lac/encoder.cpp:215-466).

    The reference's thread pool becomes the batch dimension: channel
    blocks are grouped by length and encoded as arrays; the uncertain
    per-block stereo decision runs as a second wave.
    """

    def __init__(self, order=12, stereo_mode=C.STEREO_PER_BLOCK, sample_rate=44100,
                 bit_depth=16, xp=np):
        self.order = order
        self.stereo_mode = stereo_mode
        self.sample_rate = sample_rate
        self.bit_depth = bit_depth
        self.zero_run_enabled = True
        self.partitioning_enabled = True
        self.thread_count = 0
        self.xp = xp

    def set_zero_run_enabled(self, enabled):
        self.zero_run_enabled = enabled

    def set_partitioning_enabled(self, enabled):
        self.partitioning_enabled = enabled

    def set_thread_count(self, n):
        self.thread_count = n

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
        from .ops.stereo import estimate_stereo_mode, ms_transform

        xp = self.xp
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

        if per_block:
            # vectorized proxy decision for every block
            decisions = []
            for bi, (s, sz) in enumerate(zip(starts, sizes)):
                ch_l = left[s : s + sz][None, :]
                ch_r = right[s : s + sz][None, :]
                cm, un = estimate_stereo_mode(ch_l, ch_r, np.ones((1, sz), bool))
                decisions.append((bool(np.asarray(cm)[0]), bool(np.asarray(un)[0])))
        for bi, (s, sz) in enumerate(zip(starts, sizes)):
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
                    deferred.append(bi)

        enc = ChannelBlockEncoder(self.zero_run_enabled, self.partitioning_enabled, xp=xp)

        def encode_lanes(data_list):
            """Group by length, encode, return payloads in input order."""
            out = [None] * len(data_list)
            by_len = {}
            for i, d in enumerate(data_list):
                by_len.setdefault(len(d), []).append(i)
            for length, idxs in by_len.items():
                group = np.stack([data_list[i] for i in idxs])
                payloads = enc.encode_group(group)
                for i, pb in zip(idxs, payloads):
                    out[i] = pb
            return out

        # wave A
        wave_a = [d for d in lanes] + [d for (_, _, d) in probe_lanes] + [d for (_, _, _, d) in dual_lanes]
        payloads_a = encode_lanes(wave_a)
        lane_payloads = payloads_a[: len(lanes)]
        probe_payloads = payloads_a[len(lanes) : len(lanes) + len(probe_lanes)]
        dual_payloads = payloads_a[len(lanes) + len(probe_lanes) :]

        # resolve uncertain-small blocks: full dual comparison by bytes
        block_channel_payloads = {}
        for bi in range(nblocks):
            block_channel_payloads[bi] = {}
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

        # resolve uncertain-big blocks: probe byte totals, then wave B
        probe_by_block = {}
        for (bi, variant, _), pb in zip(probe_lanes, probe_payloads):
            probe_by_block.setdefault(bi, {"lr": 0, "ms": 0})
            probe_by_block[bi][variant] += len(pb)
        wave_b_data = []
        wave_b_meta = []
        for bi in deferred:
            choose_ms = probe_by_block[bi]["ms"] < probe_by_block[bi]["lr"]
            block_flags[bi] = 1 if choose_ms else 0
            s, sz = starts[bi], sizes[bi]
            chans = ms_channels(s, sz) if choose_ms else lr_channels(s, sz)
            for slot, chd in enumerate(chans):
                wave_b_data.append(chd)
                wave_b_meta.append((bi, slot))
        if wave_b_data:
            for (bi, slot), pb in zip(wave_b_meta, encode_lanes(wave_b_data)):
                block_channel_payloads[bi][slot] = pb

        # ---------------- assembly
        from .bitio import BitWriter
        from .format.header import FrameHeader

        hdr = FrameHeader(
            channels=2 if is_stereo else 1,
            stereo_mode=stereo_mode,
            sample_rate=self.sample_rate,
            bit_depth=self.bit_depth,
            version=C.FORMAT_VERSION,
        )
        block_bytes = []
        for bi in range(nblocks):
            parts = []
            if per_block:
                parts.append(bytes([block_flags[bi]]))
            chans = block_channel_payloads[bi]
            for slot in sorted(chans):
                parts.append(chans[slot])
            block_bytes.append(b"".join(parts))

        w = BitWriter()
        w.write_bytes(hdr.pack())
        w.write_bits(nblocks, 32)
        for sz, bb in zip(sizes, block_bytes):
            if len(bb) == 0 or len(bb) > 0xFFFFFFFF:
                raise RuntimeError("encoded block size is outside format limits")
            w.write_bits(sz, 32)
            w.write_bits(len(bb), 32)
        w.flush_to_byte()
        return w.getvalue() + b"".join(block_bytes)

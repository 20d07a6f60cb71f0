"""Measured dead end: device-side candidate pruning via sound lower bounds.

The native host planner's branch-and-bound (lac_runtime.cpp) scores only
~1.75 of the 11 predictor candidates fully because its exact per-sample
lower bound (one lzcnt pass) filters the rest against the running exact
best. The analogous device-side plan — score lb for all 11, keep only the
top-K lanes for the expensive stateful-adapter simulation, and prove the
drop sound per lane (host-replan the rare failures, like the LPC ladder
path) — does NOT pay: this study measures why.

For each lane it computes every candidate's exact best_bits_all (as
plan_group does) plus the sound lower bound
    lb = min(rice_lb, bin_lb, zr_lb_eff, static_exact)
with per-sample rice floor min(bit_width(u)+1, 32) (the exact per-sample
minimum over any k sequence), and reports for K in {3..8}: the
verify-fail rate (sorted_lb_key[K] <= winner_exact_key -> the lane would
need a host replan to guarantee byte parity) and the true-winner-missed
rate (winner not in top-K by lb).

Result (2026-08-18, 30 s corpus lanes + synthetic classes): the winner
is essentially always in the top-6 by lb (missed 0%), but the bound's
Jensen gap (~0.6-0.7 bits/sample between the per-sample-optimal k and
the actual windowed-adaptive k) exceeds the typical separation between
LPC-order candidates, so the soundness proof fails on 27-77% of lanes at
K=6 — the host replans would cost more than the pruned adapter saves.
Tighter sound bounds (chunk-level mean intervals + bias slack) still
leak ~1 bit on every zero/small sample through the +-1 bias uncertainty,
and bounding elementwise over all 11 candidates costs nearly as much as
scoring them. Conclusion: the full-stack stateful scoring stays; see
ROADMAP.md "device plan" notes.
"""
import sys
import numpy as np

sys.path.insert(0, "/root/repo")
import lac_tpu  # noqa
from lac_tpu import encoder as E
from lac_tpu.format import constants as C
from lac_tpu.ops import adapt, predictors, runs
from lac_tpu.ops._backend import bit_width
from lac_tpu.format.zigzag import zigzag_encode


def candidate_stats(pcm, coeffs, lvalid, n):
    xp = np
    B = pcm.shape[0]
    idx = np.arange(n, dtype=np.int64)
    res_list = [predictors.fixed_residual(pcm, o, xp=xp) for o in range(5)]
    res_list.append(predictors.fir_residual(pcm, xp=xp))
    lpc_ok = []
    for li in range(len(C.LPC_ORDER_CANDIDATES)):
        r, in_range = predictors.lpc_residual(pcm, coeffs[li], 12, xp=xp)
        res_list.append(r)
        lpc_ok.append(in_range)
    residuals = np.stack(res_list, axis=1)
    lpc_in_range = np.stack(lpc_ok, axis=0)
    valid = np.concatenate(
        [np.ones((B, E._LPC_BASE), dtype=bool), (lvalid & lpc_in_range).T], axis=1
    )

    u = zigzag_encode(residuals)
    scan = min(C.INITIAL_SCAN_COUNT, n)
    head_costs = E._k_costs_stack(u[..., :scan].astype(np.uint64), C.INITIAL_MAX_K, xp)
    initial_k = np.argmin(head_costs, axis=-1).astype(np.int32)
    k_after = adapt.k_after_stateful(u.astype(np.uint64), xp=xp)
    k_used = adapt.k_used_from_after(k_after, initial_k, xp=xp)

    z = residuals == 0
    run_len, long_run, run_start = runs.zero_run_info(z, idx, np.int64(n), xp=xp)
    rice_per, bin_per, zr_per = E._mode_cost_fields(
        residuals, u.astype(np.uint64), k_used, run_len, long_run, run_start, xp
    )
    rice_bits = rice_per.sum(axis=-1)
    bin_bits = bin_per.sum(axis=-1)
    zr_bits = zr_per.sum(axis=-1)
    has_run = run_start.any(axis=-1)
    static_costs = E._k_costs_stack(u.astype(np.uint64), C.MAX_STATIC_K, xp)
    static_bits = static_costs.min(axis=-1)

    zr_eff = np.where(has_run, zr_bits, rice_bits)
    best_bits_all = np.minimum(
        np.minimum(rice_bits, static_bits), np.minimum(zr_eff, bin_bits)
    )
    ptype_tab = np.asarray([t for t, _ in E._CANDIDATES], dtype=np.uint64)
    UMAX = np.uint64(0xFFFFFFFFFFFFFFFF)
    key = np.where(valid, best_bits_all * np.uint64(4) + ptype_tab[None, :], UMAX)
    sel_idx = np.argmin(key, axis=-1)
    winner_key = key[np.arange(B), sel_idx]

    # ---- lower bound
    bw = bit_width(u.astype(np.uint64), xp=np).astype(np.uint32)
    floor = np.minimum(bw + 1, 32).astype(np.uint64)  # per-sample rice floor
    rice_lb = floor.sum(axis=-1)
    absv = np.abs(residuals.astype(np.int64))
    bin_lb = np.where(
        absv == 0, np.uint64(2), np.where(absv <= 2, np.uint64(3), np.uint64(2) + floor)
    ).sum(axis=-1)
    run_per = (
        np.uint64(2)
        + ((run_len - C.ZERO_RUN_MIN_LENGTH).astype(np.uint64) >> np.uint64(C.ZERO_RUN_LENGTH_K))
        + np.uint64(1 + C.ZERO_RUN_LENGTH_K)
    )
    zr_lb = np.where(
        run_start, run_per, np.where(long_run, np.uint64(0), np.uint64(2) + floor)
    ).sum(axis=-1)
    zr_lb_eff = np.where(has_run, zr_lb, rice_lb)
    lb = np.minimum(np.minimum(rice_lb, bin_lb), np.minimum(zr_lb_eff, static_bits))
    lb_key = np.where(valid, lb * np.uint64(4) + ptype_tab[None, :], UMAX)

    # sanity: lb <= exact for valid candidates
    bad = valid & (lb > best_bits_all)
    assert not bad.any(), f"UNSOUND lb on {bad.sum()} lanes"

    order = np.argsort(lb_key, axis=-1, kind="stable")
    sorted_lb = np.take_along_axis(lb_key, order, axis=-1)
    out = {}
    for K in range(3, 9):
        fail = sorted_lb[:, K] <= winner_key if K < lb_key.shape[1] else np.zeros(B, bool)
        in_top = (order[:, :K] == sel_idx[:, None]).any(axis=1)
        out[K] = (fail.mean(), (~in_top).mean(), (fail & in_top).mean())
    # gap stats
    wl = lb[np.arange(B), sel_idx].astype(np.float64)
    we = best_bits_all[np.arange(B), sel_idx].astype(np.float64)
    out["gap_bits_per_sample"] = float(np.mean((we - wl) / n))
    return out


def lanes_from_corpus(seconds=20, seed=0):
    sys.path.insert(0, "/root/repo/scripts")
    from profile_planner import synth_corpus

    n = 16384
    left, right = synth_corpus(seconds=seconds, seed=seed)
    nb = len(left) // n
    l = left[: nb * n].reshape(nb, n)
    r = right[: nb * n].reshape(nb, n)
    m = (l + r) >> 1
    s = l - r
    return np.concatenate([l, r, m, s], axis=0)


def lanes_synthetic(seed=1):
    n = 16384
    rng = np.random.RandomState(seed)
    lanes = []
    lanes.append(rng.laplace(0, 300, (8, n)).astype(np.int32))
    lanes.append(rng.laplace(0, 5, (8, n)).astype(np.int32))
    lanes.append(rng.randint(-32768, 32768, (4, n)).astype(np.int32))  # noise
    t = np.arange(n)
    for f in (220.0, 997.0, 4000.1):
        lanes.append((8000 * np.sin(2 * np.pi * f * t / 44100))[None].astype(np.int32))
    ramp = (np.linspace(-20000, 20000, n))[None].astype(np.int32)
    lanes.append(ramp)
    sil = np.zeros((2, n), np.int32)
    sil[:, ::37] = rng.randint(-3, 4, (2, (n + 36) // 37))
    lanes.append(sil)
    return np.concatenate(lanes, axis=0)


def main():
    n = 16384
    for name, lanes in (
        ("corpus", lanes_from_corpus()),
        ("synthetic", lanes_synthetic()),
    ):
        R = lac_tpu.ops.lpc.autocorrelation(lanes, 12)
        coeffs, used, lvalid, mvo = E.lpc_candidates_from_lags(np.asarray(R), n)
        st = candidate_stats(lanes, coeffs, lvalid, n)
        print(f"== {name}: {lanes.shape[0]} lanes, winner gap "
              f"{st['gap_bits_per_sample']:.3f} bits/sample")
        for K in range(3, 9):
            fail, miss, fail_but_ok = st[K]
            print(f"  K={K}: verify-fail {fail*100:5.1f}%  winner-missed "
                  f"{miss*100:5.2f}%  (fail-yet-correct {fail_but_ok*100:5.1f}%)")


if __name__ == "__main__":
    import lac_tpu.ops.lpc  # noqa

    main()

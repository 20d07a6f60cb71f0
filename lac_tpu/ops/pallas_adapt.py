"""Fused Pallas kernel for the stateful Rice k-adaptation sequence.

STATUS: measured experiment, NOT a product path. On the v5e this fused
single-pass kernel runs 34-38 ms at (1408, 16384) vs ~27 ms for the
split XLA+Pallas chain in adapt.k_after_stateful (whose scans already
run as lean VMEM kernels): the in-kernel log-step ``pltpu.roll`` scans
are VPU-compute-bound, so fusing the elementwise middle into the same
kernel buys no traffic win that pays for the worse scan codegen.
Integrating it shrank the (128, 16384) plan's cost analysis to
12.8 GFLOP / 11.8 GB but RAISED warm time 47.0 -> 53.7 ms, so the hook
was reverted (git history has it). Kept because (a) it documents the
measured answer to "why not one big fused kernel?", (b) the limb
arithmetic library and window-reach-back pattern are reusable, and
(c) a future Mosaic with native multi-pass scan support could flip the
verdict cheaply.

``adapt.k_after_stateful`` as an XLA program is a chain of two prefix
scans with ~30 elementwise (often u64-emulated) ops between them; XLA
materializes every scan operand/result and several u64 intermediates in
HBM (~1.3 GB of the (128, 16384)-plan's traffic). This kernel computes
the whole sequence — split cumsums, drift window, division-free k_base,
drift/micro biases — in ONE pass over VMEM tiles: u32 codes in,
int32 k_after out.

Exactness: all arithmetic is integer-exact. 64-bit quantities (prefix
sums N <= 2^46, window products c*t <= 2^48) are represented as base-2^16
limb triples in i32 lanes; the only float op is an f32 divide-by-3 on a
value < 2^17 (exact: f32 division is correctly rounded and k+1/3 / k+2/3
never round across an integer below 2^23). Bit-equality against
``adapt.k_after_stateful`` is pinned in tests/test_pallas_adapt.py over
adversarial inputs (all-max codes, window boundaries, long zero runs).

Semantics oracle: /root/reference/src/codec/rice/rice.hpp:45-114 (the
serial adapter) via ops/adapt.py's closed form.

Tile layout mirrors pallas_kernels' scan kernels: (8, 2048) VMEM tiles,
left-to-right column grid, per-row carries in scratch; the drift (256)
and micro (96) windows reach into the previous tile through a saved
copy of its absolute prefix-sum planes (a modular ``pltpu.roll`` plus a
column select — negative roll amounts SIGABRT this Mosaic toolchain).
"""

import functools

from ..format import constants as C

_TR, _TC = 8, 2048  # TR=32 measured no better (37.9 vs 34.2 ms): the
# kernel is VPU-bound on the roll scans, not per-grid-step overhead

MASK16 = 0xFFFF


def shape_supported(rows, n):
    # n <= 16384 keeps count < 2^15, which bounds every limb product
    # below 2^31 (see the kernel's limb arithmetic)
    return rows % _TR == 0 and n % _TC == 0 and _TC <= n <= 16384


# --------------------------------------------------------------- limb ops
# A "triple" is (l2, l1, l0): value = l2*2^32 + l1*2^16 + l0, each limb
# an i32 plane in [0, 2^16) (canonical). Values < 2^48.


def _canon3(l2, l1, l0, jnp):
    c0 = l0 >> jnp.int32(16)
    l0 = l0 & jnp.int32(MASK16)
    l1 = l1 + c0
    c1 = l1 >> jnp.int32(16)
    l1 = l1 & jnp.int32(MASK16)
    l2 = l2 + c1
    return l2, l1, l0


def _ge3(a, b, jnp):
    """a >= b for canonical triples."""
    a2, a1, a0 = a
    b2, b1, b0 = b
    return (
        (a2 > b2)
        | ((a2 == b2) & (a1 > b1))
        | ((a2 == b2) & (a1 == b1) & (a0 >= b0))
    )


def _mulc3(c, t, jnp):
    """c * (t2,t1,t0) for c < 2^15 (i32 plane), canonical triple out.
    Product must fit 2^48 (caller guarantees)."""
    t2, t1, t0 = t
    return _canon3(c * t2, c * t1, c * t0, jnp)


def _shl3_small(x0, k, kmax, jnp):
    """(0,0,x0) << k for per-sample k in [0, kmax], x0 < 2^15.
    Branchless over limb placement; kmax <= 46."""
    zero = jnp.zeros_like(x0)
    l2, l1, l0 = zero, zero, zero
    # shift within 16: contributes to l0/l1; 16..31 -> l1/l2; 32..46 -> l2(+)
    kk = k
    s = kk & jnp.int32(15)
    part_lo = x0 << s            # < 2^31
    part = jnp.where(kk <= jnp.int32(46), part_lo, zero)
    sel0 = kk < jnp.int32(16)
    sel1 = (kk >= jnp.int32(16)) & (kk < jnp.int32(32))
    sel2 = kk >= jnp.int32(32)
    l0 = jnp.where(sel0, part & jnp.int32(MASK16), l0)
    l1 = jnp.where(sel0, part >> jnp.int32(16), l1)
    l1 = jnp.where(sel1, part & jnp.int32(MASK16), l1)
    l2 = jnp.where(sel1, part >> jnp.int32(16), l2)
    l2 = jnp.where(sel2, part, l2)  # hi limb may exceed 2^16; compare-only use
    return l2, l1, l0


def _bitwidth(v, maxbits, jnp):
    """bit_width(v) for i32 v in [0, 2^maxbits), branchless binary split.
    After the halving loop x is 1 iff v > 0, which is exactly the +1 of
    bit_width."""
    bw = jnp.zeros_like(v)
    x = v
    for step in (16, 8, 4, 2, 1):
        if step < maxbits:
            big = x >= (jnp.int32(1) << jnp.int32(step))
            bw = bw + jnp.where(big, jnp.int32(step), jnp.int32(0))
            x = jnp.where(big, x >> jnp.int32(step), x)
    return bw + x


def _tile_cumsum(x):
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    sh = 1
    while sh < x.shape[-1]:
        y = pltpu.roll(x, jnp.int32(sh), 1)
        x = x + jnp.where(col >= sh, y, jnp.zeros_like(x))
        sh *= 2
    return x


def _window_back(cur, prev, amount, col, jnp):
    """value[i - amount] of an absolute per-row sequence: in-tile roll for
    col >= amount, previous tile's tail below (prev rolled the same way).
    Caller guarantees the result is only consumed where the global index
    >= amount."""
    from jax.experimental.pallas import tpu as pltpu

    a = jnp.int32(amount)
    return jnp.where(
        col >= a,
        pltpu.roll(cur, a, 1),
        pltpu.roll(prev, a, 1),
    )


def _k_after_kernel(u_ref, o_ref, chi_ref, clo_ref, pshi_ref, pslo_ref,
                    cp_ref, pcp_ref):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        chi_ref[...] = jnp.zeros_like(chi_ref)
        clo_ref[...] = jnp.zeros_like(clo_ref)
        pshi_ref[...] = jnp.zeros_like(pshi_ref)
        pslo_ref[...] = jnp.zeros_like(pslo_ref)
        cp_ref[...] = jnp.zeros_like(cp_ref)
        pcp_ref[...] = jnp.zeros_like(pcp_ref)

    i32 = jnp.int32
    u = u_ref[:]  # i32 bitcast of u32
    col = jax.lax.broadcasted_iota(i32, u.shape, 1)
    gcol = col + j * i32(_TC)  # global sample index
    count = gcol + i32(1)      # <= 2^24 assumed (n bound)

    # ---- split prefix sums (absolute, with carries) ------------------
    shi = _tile_cumsum(jax.lax.shift_right_logical(u, i32(16))) + chi_ref[...]
    slo = _tile_cumsum(u & i32(MASK16)) + clo_ref[...]

    # ---- N = s + count//2 as a canonical triple ----------------------
    nlo_raw = slo + jax.lax.shift_right_logical(count, i32(1))
    n2, n1, n0 = _canon3(shi >> i32(16), (shi & i32(MASK16)) + (nlo_raw >> i32(16)),
                         nlo_raw & i32(MASK16), jnp)
    # mean <= 1 gate: N < 2*count (2c <= 2^25)
    two_c = count << i32(1)
    mean_le1 = ~_ge3((n2, n1, n0), (jnp.zeros_like(n2), two_c >> i32(16), two_c & i32(MASK16)), jnp)

    # ---- M = max(N - count, 1) and division-free k_base --------------
    m0 = n0 - (count & i32(MASK16))
    borrow0 = (m0 < 0).astype(i32)
    m0 = m0 + (borrow0 << i32(16))
    m1 = n1 - (count >> i32(16)) - borrow0
    borrow1 = (m1 < 0).astype(i32)
    m1 = m1 + (borrow1 << i32(16))
    m2 = n2 - borrow1
    neg_or_zero = (m2 < 0) | ((m2 == 0) & (m1 == 0) & (m0 == 0))
    m2 = jnp.where(neg_or_zero, i32(0), m2)
    m1 = jnp.where(neg_or_zero, i32(0), m1)
    m0 = jnp.where(neg_or_zero, i32(1), m0)

    bw_m = jnp.where(
        m2 > 0, i32(32) + _bitwidth(m2, 16, jnp),
        jnp.where(m1 > 0, i32(16) + _bitwidth(m1, 16, jnp), _bitwidth(m0, 16, jnp)),
    )
    bwc = _bitwidth(count, 25, jnp)
    k0 = jnp.maximum(bw_m - bwc, i32(0))
    # q0 >= c  <=>  M >= c << k0
    thr = _shl3_small(count, k0, 46, jnp)
    ge = _ge3((m2, m1, m0), thr, jnp)
    k_base = jnp.minimum(i32(C.MAX_RICE_K), k0 + ge.astype(i32))
    k_base = jnp.where(mean_le1, i32(0), k_base)

    # ---- drift window bias -------------------------------------------
    shi_m = _window_back(shi, pshi_ref[...], C.DRIFT_WINDOW, col, jnp)
    slo_m = _window_back(slo, pslo_ref[...], C.DRIFT_WINDOW, col, jnp)
    whi = shi - shi_m  # halves of the 256-sample window sum, < 2^24
    wlo = slo - slo_m
    wh = whi + (wlo >> i32(16))
    wl = wlo & i32(MASK16)
    t = wl + i32(C.DRIFT_WINDOW >> 1)
    # lm = (W + 128) >> 8 as a canonical (lmh, lml) pair, lm < 2^40/2^8
    lml_raw = ((wh & i32(0xFF)) << i32(8)) + (t >> i32(8))
    lmh = (wh >> i32(8)) + (lml_raw >> i32(16))
    lml = lml_raw & i32(MASK16)
    lm_pos = (lmh > 0) | (lml > 0)

    # t1 = ((3*lm - 1) >> 2) + 1 (lm >= 1): 3*lm then borrow-sub 1, >> 2, +1
    a1 = i32(3) * lml
    a2 = i32(3) * lmh + (a1 >> i32(16))
    a1 = a1 & i32(MASK16)
    # minus 1 with borrow
    a1m = a1 - i32(1)
    bor = (a1m < 0).astype(i32)
    a1m = a1m + (bor << i32(16))
    a2m = a2 - bor  # >= 0 when lm >= 1
    # >> 2: (a2m*2^16 + a1m) >> 2 = (a2m >> 2)*2^16 + ((a2m & 3) << 14) + (a1m >> 2)
    t1h = a2m >> i32(2)
    t1l = ((a2m & i32(3)) << i32(14)) + (a1m >> i32(2))
    # +1
    t1l = t1l + i32(1)
    t1h = t1h + (t1l >> i32(16))
    t1l = t1l & i32(MASK16)
    p1 = _mulc3(count & i32(MASK16), (jnp.zeros_like(t1h), t1h, t1l), jnp)
    cond_up = lm_pos & ~_ge3((n2, n1, n0), p1, jnp)

    # t2 = floor((4*lm + 3)/3) + 1 = floor((4*lm + 6)/3)
    # cond_down: N >= c*t2  <=>  3*N + c*r >= c*y, y = 4*lm + 6, r = y mod 3
    # (N >= c*floor(y/3) <=> 3N >= c*(y - r) since y - r = 3*floor(y/3))
    # y mod 3 == lm mod 3 (4=1, 6=0 mod 3); lm mod 3 == (lmh + lml) mod 3
    # (2^16 = 3*21845 + 1). msum < 2^17, so the f32 divide is exact-safe.
    msum = lmh + lml
    q3 = jnp.floor(msum.astype(jnp.float32) / jnp.float32(3.0)).astype(i32)
    r3 = msum - i32(3) * q3
    # c*lm (count < 2^15 by shape_supported) -> canonical triple, then
    # scale: 4*limb < 2^18 after canonicalization, no i32 overflow
    p2, p1, p0 = _canon3(jnp.zeros_like(count), count * lmh, count * lml, jnp)
    cy = _canon3(i32(4) * p2, i32(4) * p1, i32(4) * p0 + i32(6) * count, jnp)
    # 3*N + c*r
    lhs = _canon3(i32(3) * n2, i32(3) * n1, i32(3) * n0 + count * r3, jnp)
    cond_down = _ge3(lhs, cy, jnp)

    drift_on = (gcol >= i32(C.DRIFT_WINDOW)) & _ge3(
        (n2, n1, n0), (jnp.zeros_like(n2), count >> i32(16), count & i32(MASK16)), jnp
    )
    bias = jnp.where(
        drift_on & cond_up, i32(1),
        jnp.where(drift_on & ~cond_up & cond_down, i32(-1), i32(0)),
    )

    # ---- micro window ------------------------------------------------
    q_base = jnp.where(
        k_base >= i32(C.MAX_RICE_K),
        i32(0),
        jax.lax.shift_right_logical(u, k_base),
    )
    is_large = ((q_base < 0) | (q_base > i32(3))).astype(i32)  # unsigned > 3
    is_zero = (q_base == 0).astype(i32)
    packed = is_large + (is_zero << i32(16))
    cp = _tile_cumsum(packed) + cp_ref[...]
    cp_m = _window_back(cp, pcp_ref[...], C.MICRO_WINDOW, col, jnp)
    wp = cp - jnp.where(gcol >= i32(C.MICRO_WINDOW), cp_m, jnp.zeros_like(cp))
    large_cnt = wp & i32(MASK16)
    zero_cnt = jax.lax.shift_right_logical(wp, i32(16))
    trigger = count >= i32(C.MICRO_WINDOW)
    wsize = jnp.minimum(count, i32(C.MICRO_WINDOW))
    cond_large = large_cnt * i32(4) >= wsize * i32(3)
    cond_zero = zero_cnt * i32(5) >= wsize * i32(4)
    bias = jnp.where(
        trigger & cond_large, jnp.minimum(bias + i32(1), i32(1)),
        jnp.where(trigger & ~cond_large & cond_zero, jnp.maximum(bias - i32(1), i32(-1)), bias),
    )

    o_ref[:] = jnp.clip(k_base + bias, i32(0), i32(C.MAX_RICE_K))

    # ---- roll carries forward ----------------------------------------
    chi_ref[...] = shi[:, -1:]
    clo_ref[...] = slo[:, -1:]
    pshi_ref[...] = shi
    pslo_ref[...] = slo
    cp_ref[...] = cp[:, -1:]
    pcp_ref[...] = cp


@functools.lru_cache(maxsize=16)
def _build(rows, n, interpret=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return pl.pallas_call(
        _k_after_kernel,
        grid=(rows // _TR, n // _TC),
        in_specs=[pl.BlockSpec((_TR, _TC), lambda i, j: (i, j), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((_TR, _TC), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, n), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((_TR, 1), jnp.int32),    # chi
            pltpu.VMEM((_TR, 1), jnp.int32),    # clo
            pltpu.VMEM((_TR, _TC), jnp.int32),  # prev shi
            pltpu.VMEM((_TR, _TC), jnp.int32),  # prev slo
            pltpu.VMEM((_TR, 1), jnp.int32),    # cp carry
            pltpu.VMEM((_TR, _TC), jnp.int32),  # prev cp
        ],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )


def k_after_stateful_fused(u32_rows, interpret=False):
    """(rows, n) uint32 -> (rows, n) int32 k_after, one fused pass.

    Requires shape_supported(rows, n); bit-identical to
    adapt.k_after_stateful (tests/test_pallas_adapt.py).
    """
    import jax

    rows, n = u32_rows.shape
    as_i32 = jax.lax.bitcast_convert_type(u32_rows, "int32")
    return _build(rows, n, interpret)(as_i32)

"""Pin the optimized planner cost math against the readable spec in
ops/costs.py (and transitively against the reference semantics)."""

import numpy as np

from lac_tpu.format import constants as C
from lac_tpu.format.zigzag import zigzag_encode
from lac_tpu.ops import adapt, costs, runs

from .oracle import StatefulAdapt, adapt_stateless, rice_bits, zigzag
from .signals import lcg_noise


def scalar_mode_costs(residual, initial_k, stateless):
    """Direct per-sample transcription of block/encoder.cpp:201-263."""
    rice = zr = binb = 0
    has_run = False
    k = initial_k
    total = 0
    count = 0
    st = StatefulAdapt()

    def step(u):
        nonlocal total, count, k
        total += u
        count += 1
        k = adapt_stateless(total, count) if stateless else st.adapt(total, count)

    i = 0
    nres = len(residual)
    while i < nres:
        run = 0
        while i + run < nres and residual[i + run] == 0:
            run += 1
        if run >= C.ZERO_RUN_MIN_LENGTH:
            has_run = True
            zr += 2 + rice_bits(run - C.ZERO_RUN_MIN_LENGTH, C.ZERO_RUN_LENGTH_K)
            for _ in range(run):
                rice += rice_bits(0, k)
                binb += 2
                step(0)
            i += run
            continue
        v = int(residual[i])
        u = zigzag(v)
        rice += rice_bits(u, k)
        if v == 0:
            binb += 2
        elif abs(v) <= 2:
            binb += 3
        else:
            binb += 2 + rice_bits(u, k)
        thr = 1 << min(24, k + 3)
        zr += 2 + (32 if u > thr else rice_bits(u, k))
        step(u)
        i += 1
    return rice, zr, binb, has_run


def test_vector_costs_match_scalar_spec():
    rng_cases = [
        lcg_noise(700, 40, 1),
        lcg_noise(700, 5000, 2),
        np.concatenate([np.zeros(100, np.int32), lcg_noise(200, 3, 3), np.zeros(64, np.int32)]),
    ]
    for v in rng_cases:
        v = np.asarray(v, np.int32)
        n = len(v)
        u = zigzag_encode(v).astype(np.uint64)[None, :]
        pos = np.arange(n, dtype=np.int64)
        for stateless in (False, True):
            if stateless:
                k_used = adapt.k_used_stateless_segmented(u, pos[None, :], np.full((1, n), 5, np.int32))
            else:
                k_after = adapt.k_after_stateful(u)
                k_used = adapt.k_used_from_after(k_after, 5)
            rl, lr_, rs = runs.zero_run_info(v[None, :] == 0, pos, np.int64(n))
            got = costs.mode_costs(
                v[None, :], u, k_used, np.ones((1, n), bool), rl, lr_, rs,
                np.zeros(n, np.int64), 1,
            )
            want = scalar_mode_costs(v, 5, stateless)
            assert int(got["rice"][0, 0]) == want[0]
            assert int(got["zr"][0, 0]) == want[1]
            assert int(got["bin"][0, 0]) == want[2]
            assert bool(got["has_run"][0, 0]) == want[3]


def test_segment_estimators_match_reference_rules():
    v = lcg_noise(512, 900, 9)
    u = zigzag_encode(v).astype(np.uint64)[None, :]
    seg_id = (np.arange(512) // 128).astype(np.int64)
    pos = (np.arange(512) % 128).astype(np.int64)
    ik = costs.initial_k(u, pos[None, :], np.ones((1, 512), bool), seg_id, 4)
    sk, sb = costs.static_k_and_bits(u, np.ones((1, 512), bool), seg_id, 4)
    for s in range(4):
        seg = [zigzag(int(x)) for x in v[s * 128 : (s + 1) * 128]]
        # initial k: argmin over k<=12 of exact cost on first 256 samples
        cost = [sum((uu >> k) + 1 + k for uu in seg) for k in range(13)]
        assert int(ik[0, s]) == int(np.argmin(cost))
        cost16 = [sum((uu >> k) + 1 + k for uu in seg) for k in range(16)]
        assert int(sk[0, s]) == int(np.argmin(cost16))
        assert int(sb[0, s]) == min(cost16)

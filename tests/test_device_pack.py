"""Device bitpack prototype vs the scalar/vector host packers.

pack_elements must be bit-identical to bitio.pack.pack_stream (which is
itself pinned against the scalar BitWriter oracle and the native
BitSink) on any element stream. Covers long unary runs spanning many
words, zero-length fields, word-boundary alignments, and real Rice
token streams under both adapters.
"""

import numpy as np
import pytest

from lac_tpu.bitio.pack import pack_stream
from lac_tpu.ops import device_pack as dp


def words_to_bytes(words, total_bits):
    nb = (int(total_bits) + 7) // 8
    return np.asarray(words).astype(">u4").tobytes()[:nb]


def check(unary, fv, fl, xp=np):
    unary = np.asarray(unary, np.int64)
    fv = np.asarray(fv, np.uint32)
    fl = np.asarray(fl, np.int64)
    ref = pack_stream(unary, fv.astype(np.uint64), fl)
    W = dp.words_capacity(int((unary + fl).sum()))
    if W == 0:
        W = 1
    words, tb = dp.pack_elements(
        xp.asarray(unary), xp.asarray(fv), xp.asarray(fl), W, xp=xp
    )
    assert int(tb) == int((unary + fl).sum())
    got = words_to_bytes(words, tb)
    assert got == ref
    return got


def test_simple_elements():
    check([0, 3, 0], [0b101, 0b0, 0b11], [3, 1, 2])


def test_empty_and_zero_len():
    check([0, 0, 0], [0, 0, 0], [0, 0, 0])
    check([5], [0], [0])  # pure unary, no field


def test_long_unary_runs():
    # runs crossing many words, ending at/inside word boundaries
    check([100, 0, 64, 31, 33], [0, 1, 2, 3, 0], [0, 1, 2, 5, 0])
    check([32], [0], [0])
    check([31], [1], [1])  # run + stop bit exactly one word


def test_word_alignment_sweep():
    # every starting alignment for a 32-bit field
    for pre in range(33):
        check([0, 0], [0x5A5A5A5A & ((1 << pre) - 1) if pre else 0, 0xDEADBEEF],
              [pre, 32])


def test_random_streams():
    rng = np.random.RandomState(7)
    for trial in range(20):
        m = rng.randint(1, 200)
        unary = rng.geometric(0.3, m).astype(np.int64) - 1
        unary[rng.rand(m) < 0.1] += rng.randint(30, 90)
        fl = rng.randint(0, 33, m).astype(np.int64)
        fv = (rng.randint(0, 1 << 30, m).astype(np.uint64) |
              (rng.randint(0, 4, m).astype(np.uint64) << 30))
        fv = (fv & ((np.uint64(1) << fl.astype(np.uint64)) - np.uint64(1))).astype(np.uint32)
        check(unary, fv, fl)


def test_batched_matches_per_lane():
    rng = np.random.RandomState(11)
    B, M = 5, 64
    unary = (rng.geometric(0.4, (B, M)) - 1).astype(np.int64)
    fl = rng.randint(0, 17, (B, M)).astype(np.int64)
    fv = (rng.randint(0, 1 << 16, (B, M)).astype(np.uint64)
          & ((np.uint64(1) << fl.astype(np.uint64)) - np.uint64(1))).astype(np.uint32)
    W = dp.words_capacity(int((unary + fl).sum(axis=1).max()))
    words, tb = dp.pack_elements(unary, fv, fl, W, xp=np)
    for b in range(B):
        ref = pack_stream(unary[b], fv[b].astype(np.uint64), fl[b])
        assert words_to_bytes(words[b], tb[b]) == ref


def test_rice_lanes_vs_pack_stream():
    from lac_tpu.ops import adapt

    rng = np.random.RandomState(3)
    res = (rng.laplace(0, 40, 512)).astype(np.int64).astype(np.int32)
    u = dp.zigzag(res, xp=np)
    k_after = adapt.k_after_stateful(u[None], xp=np)[0]
    k_used = adapt.k_used_from_after(k_after[None], 4, xp=np)[0]
    unary, fv, fl = dp.rice_elements(u, k_used, xp=np)
    ref = pack_stream(unary, fv.astype(np.uint64), fl)
    W = dp.words_capacity(int((unary + fl).sum()))
    words, tb = dp.pack_rice_lanes(u[None], k_used[None], W, xp=np)
    assert words_to_bytes(words[0], tb[0]) == ref


@pytest.mark.parametrize("seed", [0, 1])
def test_jax_cpu_matches_numpy(seed):
    import jax.numpy as jnp

    rng = np.random.RandomState(seed)
    B, M = 3, 128
    unary = (rng.geometric(0.35, (B, M)) - 1).astype(np.int64)
    unary[rng.rand(B, M) < 0.05] += 70
    fl = rng.randint(0, 33, (B, M)).astype(np.int64)
    fv = (rng.randint(0, 1 << 31, (B, M)).astype(np.uint64)
          & ((np.uint64(1) << fl.astype(np.uint64)) - np.uint64(1))).astype(np.uint32)
    W = dp.words_capacity(int((unary + fl).sum(axis=1).max()))
    wn, tn = dp.pack_elements(unary, fv, fl, W, xp=np)
    import jax

    wj, tj = jax.jit(
        lambda a, b, c: dp.pack_elements(a, b, c, W, xp=jnp)
    )(unary, fv, fl)
    assert np.array_equal(wn, np.asarray(wj))
    assert np.array_equal(tn, np.asarray(tj))

"""The batched device bit-reader (ops/device_reader.py) must parse
static-k Rice streams bit-exactly: device == scalar spec twin == the
values that were encoded. This is the decode-side accelerator==scalar
contract (reference neon.cpp:22-28 analog)."""

import jax.numpy as jnp
import numpy as np
import pytest

from lac_tpu.ops.device_reader import (
    encode_static_rice_np,
    tokenize_static_rice,
)


def _lane(rng, n, k, spread):
    vals = rng.randint(-spread, spread + 1, n).astype(np.int32)
    payload, nbits = encode_static_rice_np(vals, k)
    return vals, payload, nbits


@pytest.mark.parametrize("seed", [0, 1])
def test_device_reader_matches_spec(seed):
    rng = np.random.RandomState(seed)
    T = 256
    lanes = []
    for k in (0, 1, 3, 7, 11, 15):
        spread = max(1, (1 << k) * 2)
        lanes.append((k, *_lane(rng, T, k, spread)))
    # edge lanes: all zeros (q=0 runs) and spiky values (long unary)
    lanes.append((2, *_lane(rng, T, 2, 0)))
    spiky = rng.randint(-2000, 2000, T).astype(np.int32)
    payload, nbits = encode_static_rice_np(spiky, 0)
    lanes.append((0, spiky, payload, nbits))

    NBY = max(len(p) for _, _, p, _ in lanes) + 8
    L = len(lanes)
    pay = np.zeros((L, NBY), np.uint8)
    ks = np.zeros(L, np.int32)
    nb = np.zeros(L, np.int32)
    for i, (k, _vals, p, nbits) in enumerate(lanes):
        pay[i, : len(p)] = p
        ks[i] = k
        nb[i] = nbits

    res_np, starts_np, valid_np = tokenize_static_rice(pay, ks, nb, T, xp=np)
    res_j, starts_j, valid_j = tokenize_static_rice(
        jnp.asarray(pay), jnp.asarray(ks), jnp.asarray(nb), T, xp=jnp
    )
    np.testing.assert_array_equal(np.asarray(valid_j), valid_np)
    np.testing.assert_array_equal(
        np.asarray(starts_j)[valid_np], starts_np[valid_np]
    )
    np.testing.assert_array_equal(np.asarray(res_j)[valid_np], res_np[valid_np])
    for i, (_k, vals, _p, _nb) in enumerate(lanes):
        assert valid_np[i].all()
        np.testing.assert_array_equal(res_np[i], vals)


def test_device_reader_matches_native_tokenizer():
    """Parse a real static-mode partition: craft values, Rice-encode at
    fixed k, and check the device parse against the encoded truth with
    token counts past the valid region masked off."""
    rng = np.random.RandomState(7)
    T = 1024
    k = 5
    vals = rng.randint(-40, 40, T).astype(np.int32)
    payload, nbits = encode_static_rice_np(vals, k)
    pay = np.zeros((1, len(payload) + 8), np.uint8)
    pay[0, : len(payload)] = payload
    res, starts, valid = tokenize_static_rice(
        jnp.asarray(pay), jnp.asarray([k], dtype=np.int32),
        jnp.asarray([nbits], dtype=np.int32), T, xp=jnp,
    )
    assert np.asarray(valid)[0].all()
    np.testing.assert_array_equal(np.asarray(res)[0], vals)


def test_scan_reader_matches_spec():
    from lac_tpu.ops.device_reader import tokenize_static_rice_scan

    rng = np.random.RandomState(3)
    T = 200
    lanes = []
    for k in (0, 2, 5, 9, 15):
        spread = max(1, (1 << k))
        vals = rng.randint(-spread, spread + 1, T).astype(np.int32)
        payload, nbits = encode_static_rice_np(vals, k)
        lanes.append((k, vals, payload, nbits))
    NBY = max(len(p) for _, _, p, _ in lanes) + 8
    pay = np.zeros((len(lanes), NBY), np.uint8)
    ks = np.asarray([k for k, *_ in lanes], np.int32)
    nb = np.asarray([nbits for *_, nbits in lanes], np.int32)
    for i, (_k, _v, p, _nb) in enumerate(lanes):
        pay[i, : len(p)] = p

    res, valid = tokenize_static_rice_scan(jnp.asarray(pay), ks, nb, T)
    res, valid = np.asarray(res), np.asarray(valid)
    assert valid.all()
    for i, (_k, vals, _p, _nb) in enumerate(lanes):
        np.testing.assert_array_equal(res[i], vals)
